"""Schema system tests — mirror of SchemaUtilsTest.java:97-316 (type matrix,
inference matrix, update accumulation) and the partition-spec DSL parsing."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.schema import (
    SchemaUpdate,
    connect_to_spark_type,
    diff_schemas,
    infer_spark_type,
)
from iceberg_kafka_connect_spark.sinks.spec import PartitionField, parse_partition_spec


def test_connect_type_matrix():
    assert connect_to_spark_type("INT8") == T.IntegerType()
    assert connect_to_spark_type("INT16") == T.IntegerType()
    assert connect_to_spark_type("INT32") == T.IntegerType()
    assert connect_to_spark_type(
        "INT32", "org.apache.kafka.connect.data.Date"
    ) == T.DateType()
    assert connect_to_spark_type(
        "INT32", "org.apache.kafka.connect.data.Time"
    ) == T.LongType()
    assert connect_to_spark_type("INT64") == T.LongType()
    assert connect_to_spark_type(
        "INT64", "org.apache.kafka.connect.data.Timestamp"
    ) == T.TimestampType()
    assert connect_to_spark_type("FLOAT32") == T.FloatType()
    assert connect_to_spark_type("FLOAT64") == T.DoubleType()
    assert connect_to_spark_type("BOOLEAN") == T.BooleanType()
    assert connect_to_spark_type("BYTES") == T.BinaryType()
    assert connect_to_spark_type(
        "BYTES", "org.apache.kafka.connect.data.Decimal", {"scale": "2"}
    ) == T.DecimalType(38, 2)
    # unknown → string fallback (SchemaUtils.java:285-287)
    assert connect_to_spark_type("WEIRD") == T.StringType()


def test_value_inference_matrix():
    """SchemaUtils.java:291-352: long/double widening, map→struct,
    empties skipped."""
    assert infer_spark_type("x") == T.StringType()
    assert infer_spark_type(True) == T.BooleanType()
    assert infer_spark_type(3) == T.LongType()  # integral → long
    assert infer_spark_type(3.5) == T.DoubleType()  # fractional → double
    assert infer_spark_type(Decimal("1.23")) == T.DecimalType(38, 2)
    assert infer_spark_type(datetime.date(2024, 1, 1)) == T.DateType()
    assert infer_spark_type(datetime.datetime(2024, 1, 1)) == T.TimestampType()
    assert infer_spark_type(b"x") == T.BinaryType()
    assert infer_spark_type([1, 2]) == T.ArrayType(T.LongType())
    assert infer_spark_type([]) is None  # empty skipped
    assert infer_spark_type({}) is None
    assert infer_spark_type(None) is None
    st = infer_spark_type({"a": 1, "b": "x", "skip": None})
    assert st == T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )


def test_diff_schemas_updates():
    cur = T.StructType(
        [
            T.StructField("id", T.IntegerType(), nullable=False),
            T.StructField("f", T.FloatType()),
            T.StructField("keep", T.StringType()),
        ]
    )
    inc = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=True),
            T.StructField("f", T.DoubleType()),
            T.StructField("keep", T.StringType()),
            T.StructField("new_col", T.StringType()),
        ]
    )
    updates = diff_schemas(cur, inc)
    kinds = {(u.kind, u.column) for u in updates}
    assert ("update_type", "id") in kinds  # int → long widen
    assert ("update_type", "f") in kinds  # float → double widen
    assert ("make_optional", "id") in kinds
    assert ("add_column", "new_col") in kinds
    assert not any(u.column == "keep" for u in updates)


def test_partition_spec_dsl():
    """SchemaUtils.createPartitionSpec string parsing
    (SchemaUtils.java:150-199)."""
    spec = parse_partition_spec(
        ["year(a)", "month(b)", "day(c)", "hour(d)", "bucket(id, 16)",
         "truncate(s, 4)", "plain"]
    )
    assert spec[0] == PartitionField("a", "year")
    assert spec[4] == PartitionField("id", "bucket", 16)
    assert spec[5] == PartitionField("s", "truncate", 4)
    assert spec[6] == PartitionField("plain", "identity")
    # reversed arg order accepted too
    assert parse_partition_spec("bucket(16, id)")[0] == PartitionField(
        "id", "bucket", 16
    )
    assert parse_partition_spec(None) == []


def test_partition_field_names():
    assert PartitionField("ts", "day").name == "ts_day"
    assert PartitionField("id", "bucket", 16).name == "id_bucket16"
    assert PartitionField("x", "identity").name == "x"


# ---------------------------------------------------------------- column DDL
def _ddl_table(spark, tmp_path, name="ddl"):
    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.LongType()),
            T.StructField("note", T.StringType()),
        ]
    )
    t = LakehouseTable.create(str(tmp_path / name), schema)
    t.append(
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], schema)
    )
    return t


def test_rename_column_reads_old_files(spark, tmp_path):
    t = _ddl_table(spark, tmp_path)
    t.rename_column("amount", "value")
    rows = sorted((r.id, r.value, r.note) for r in t.read(spark).collect())
    assert rows == [(1, 10, "a"), (2, 20, "b")]
    # new writes land under the new name and union cleanly with old files
    t.append(
        spark.createDataFrame(
            [(3, 30, "c")], "id long, value long, note string"
        )
    )
    rows = sorted((r.id, r.value) for r in t.read(spark).collect())
    assert rows == [(1, 10), (2, 20), (3, 30)]


def test_rename_column_twice_chains_mapping(spark, tmp_path):
    t = _ddl_table(spark, tmp_path)
    t.rename_column("amount", "value")
    t.rename_column("value", "total")
    rows = sorted((r.id, r.total) for r in t.read(spark).collect())
    assert rows == [(1, 10), (2, 20)]


def test_drop_column_projected_away(spark, tmp_path):
    t = _ddl_table(spark, tmp_path)
    t.drop_column("note")
    df = t.read(spark)
    assert "note" not in df.columns
    assert sorted((r.id, r.amount) for r in df.collect()) == [(1, 10), (2, 20)]


def test_rename_guard_identifier_and_partition(spark, tmp_path):
    import pytest as _pytest

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = LakehouseTable.create(
        str(tmp_path / "g"),
        schema,
        partition_by="bucket(4, id)",
        identifier_fields=["id"],
    )
    with _pytest.raises(ValueError, match="partition source"):
        t.rename_column("id", "id2")
    with _pytest.raises(ValueError, match="no such column"):
        t.drop_column("nope")


def test_rename_then_upsert_delete_keys_resolve(spark, tmp_path):
    """Delete files written pre-rename still anti-join post-rename reads."""
    t = _ddl_table(spark, tmp_path)
    t.upsert(
        spark.createDataFrame(
            [(2, 99, "b2")], "id long, amount long, note string"
        ),
        key_cols=["amount"],
    )
    t.rename_column("amount", "value")
    rows = sorted((r.id, r.value) for r in t.read(spark).collect())
    assert (2, 99) in rows


def test_rename_to_retired_name_refused(spark, tmp_path):
    """A physical name retired by an earlier rename must not be reused:
    files on disk still carry it, so the name mapping would remap a LIVE
    column's delete keys onto the old canonical column (silent wrong
    anti-joins)."""
    import pytest as _pytest

    t = _ddl_table(spark, tmp_path)
    t.rename_column("amount", "value")
    with _pytest.raises(ValueError, match="retired"):
        t.rename_column("note", "amount")
    # the live data is untouched and still resolves
    rows = sorted((r.id, r.value, r.note) for r in t.read(spark).collect())
    assert rows == [(1, 10, "a"), (2, 20, "b")]
