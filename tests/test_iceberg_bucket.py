"""Iceberg-spec murmur3 bucket transform: hash test vectors straight from
the public table-spec Appendix B, Spark-expression agreement with the
scalar serializer, faithful (non-void) export of bucket partition specs,
and import-side preservation. Reference partitions through Iceberg's own
transform (data/SchemaUtils.java:150-199)."""

from __future__ import annotations

import datetime as dt
import decimal
import struct
import uuid as uuidmod

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.functions.murmur3 import (
    iceberg_bucket_value,
    murmur3_32,
    murmur3_32_long,
)
from iceberg_kafka_connect_spark.sinks.spec import (
    PartitionField,
    parse_partition_spec,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable


# ------------------------------------------------ spec Appendix B vectors
@pytest.mark.parametrize(
    "raw,expect",
    [
        (struct.pack("<q", 34), 2017239379),  # int and long 34
        (b"iceberg", 1210000089),  # string
        (struct.pack("<q", 17486), -653330422),  # date 2017-11-16
        (struct.pack("<q", 81068000000), -662762989),  # time 22:31:08
        (struct.pack("<q", 1510871468000000), -2047944441),  # timestamp
        (int(1420).to_bytes(2, "big", signed=True), -500754589),  # 14.20
        (
            uuidmod.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7").bytes,
            1488055340,
        ),
        (b"\x00\x01\x02\x03", -188683207),  # fixed/binary
    ],
)
def test_spec_appendix_b_hashes(raw, expect):
    assert murmur3_32(raw) == expect


def test_vectorized_long_path_matches_scalar():
    vals = np.array([34, -1, 0, 17486, 1510871468000000, 2**62], np.int64)
    vec = murmur3_32_long(vals)
    for v, h in zip(vals.tolist(), vec.tolist()):
        assert h == murmur3_32(struct.pack("<q", v))


def test_scalar_bucket_values():
    assert iceberg_bucket_value(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert iceberg_bucket_value("iceberg", 8) == (1210000089 & 0x7FFFFFFF) % 8
    assert iceberg_bucket_value(None, 8) is None
    assert (
        iceberg_bucket_value(decimal.Decimal("14.20"), 32)
        == (-500754589 & 0x7FFFFFFF) % 32
    )
    assert (
        iceberg_bucket_value(dt.date(2017, 11, 16), 32)
        == (-653330422 & 0x7FFFFFFF) % 32
    )
    assert (
        iceberg_bucket_value(dt.datetime(2017, 11, 16, 22, 31, 8), 32)
        == (-2047944441 & 0x7FFFFFFF) % 32
    )
    with pytest.raises(ValueError):
        iceberg_bucket_value(True, 4)


def test_parse_and_expr(spark):
    fields = parse_partition_spec("iceberg_bucket(id, 16)")
    assert fields == [PartitionField("id", "iceberg_bucket", 16)]
    df = spark.createDataFrame(
        [(34,), (0,), (None,), (2**40,)], "id long"
    ).withColumn("b", fields[0].expr())
    got = {r.id: r.b for r in df.collect()}
    assert got[34] == (2017239379 & 0x7FFFFFFF) % 16
    assert got[None] is None
    assert got[0] == iceberg_bucket_value(0, 16)
    assert got[2**40] == iceberg_bucket_value(2**40, 16)


def test_expr_string_column(spark):
    f = PartitionField("s", "iceberg_bucket", 8)
    df = spark.createDataFrame(
        [("iceberg",), (None,)], "s string"
    ).withColumn("b", f.expr())
    got = {r.s: r.b for r in df.collect()}
    assert got["iceberg"] == (1210000089 & 0x7FFFFFFF) % 8
    assert got[None] is None


SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_bucket_spec_exports_non_void_and_roundtrips(spark, tmp_path):
    """Verdict item: a bucket-partitioned table's spec exports as a real
    ``bucket[N]`` (not void) and per-file partition tuples carry the
    correct bucket ids that round-trip through read_exported."""
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
        read_exported,
    )

    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, partition_by=["iceberg_bucket(k, 4)"]
    )
    t.append(
        spark.createDataFrame([(i, f"r{i}") for i in range(40)], SCHEMA)
    )
    info = read_exported(export_iceberg_metadata(t))
    spec_fields = info["partition_spec"]["fields"]
    assert [f["transform"] for f in spec_fields] == ["bucket[4]"]
    assert spec_fields[0]["field-id"] == 1000
    # every file's recorded tuple matches recomputing the bucket from the
    # rows actually inside that file
    name = spec_fields[0]["name"]
    for path, part in zip(info["file_paths"], info["partitions"]):
        rows = spark.read.parquet(path).select("k").collect()
        expect = {iceberg_bucket_value(r.k, 4) for r in rows}
        assert expect == {part[name]}
    # all four buckets materialized for 40 keys
    assert {p[name] for p in info["partitions"]} == {0, 1, 2, 3}


def test_bucket_spec_survives_import(spark, tmp_path):
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
    )
    from iceberg_kafka_connect_spark.sinks.iceberg_import import (
        import_iceberg_table,
    )

    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, partition_by=["iceberg_bucket(k, 4)"]
    )
    t.append(spark.createDataFrame([(i, "x") for i in range(20)], SCHEMA))
    imp = import_iceberg_table(
        export_iceberg_metadata(t), str(tmp_path / "dst")
    )
    assert [(p.source, p.transform, p.param) for p in imp.partition_spec()] == [
        ("k", "iceberg_bucket", 4)
    ]
    assert sorted(r.k for r in imp.read(spark).collect()) == list(range(20))
    # further writes keep bucketing identically
    imp.append(spark.createDataFrame([(100, "y")], SCHEMA))
    assert imp.read(spark).count() == 21


def test_bucket_partition_pruning(spark, tmp_path):
    """A point lookup on a bucket-partitioned table opens only the target
    bucket's files — the pruning min/max stats can't provide (every bucket
    spans the full key range)."""
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, partition_by=["iceberg_bucket(k, 8)"]
    )
    t.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(400)], SCHEMA)
    )
    kept, total = t.scan_files("k = 34")
    assert total >= 8  # at least one file per materialized bucket
    target = iceberg_bucket_value(34, 8)
    assert kept, "the target bucket's file must survive"
    assert all(f"k_iceberg_bucket8={target}" in f["path"] for f in kept)
    assert len(kept) < total
    # correctness unchanged
    got = t.read(spark, where="k = 34").collect()
    assert [(r.k, r.v) for r in got] == [(34, "v34")]
    # string-typed bucket keys prune the same way
    t2 = LakehouseTable.create(
        str(tmp_path / "t2"), SCHEMA, partition_by=["iceberg_bucket(v, 4)"]
    )
    t2.append(
        spark.createDataFrame([(i, f"s{i}") for i in range(100)], SCHEMA)
    )
    kept2, total2 = t2.scan_files("v = 's7' AND k >= 0")
    assert len(kept2) < total2
    assert t2.read(spark, where="v = 's7'").count() == 1


def test_bucket_pruning_is_conservative(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, partition_by=["iceberg_bucket(k, 4)"]
    )
    t.append(spark.createDataFrame([(i, "x") for i in range(50)], SCHEMA))
    # OR disables bucket pruning entirely (a disjunct could rescue rows)
    kept_or, total = t.scan_files("k = 3 OR k = 40")
    assert len(kept_or) == total
    # range conjuncts never trigger the bucket rule (min/max stats may
    # still prune legitimately) — correctness is the invariant
    assert t.read(spark, where="k >= 10").count() == 40
    assert t.read(spark, where="k = 3 OR k = 40").count() == 2


def test_timestamp_micros_integer_arithmetic():
    """Float total_seconds() truncates micros (epoch+1.000001s floats to
    1_000_000); the serializer must use integer arithmetic."""
    v = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=1_000_001)
    want = (murmur3_32(struct.pack("<q", 1_000_001)) & 0x7FFFFFFF) % 1024
    assert iceberg_bucket_value(v, 1024) == want


def test_decimal_minimal_twos_complement():
    """Java BigInteger.toByteArray() minimal form: -128 is ONE byte 0x80,
    not 0xFF80 — boundary negatives must hash the minimal serialization."""
    cases = [(-128, b"\x80"), (255, b"\x00\xff"), (-1, b"\xff"),
             (0, b"\x00"), (-32768, b"\x80\x00")]
    for unscaled, raw in cases:
        want = (murmur3_32(raw) & 0x7FFFFFFF) % 1000
        assert (
            iceberg_bucket_value(decimal.Decimal(unscaled), 1000) == want
        ), unscaled


def test_nullable_long_batch(spark):
    """A batch mixing NULL and non-NULL long keys arrives as float64 in
    the pandas UDF — it must bucket the longs and null the nulls, not
    crash."""
    f = PartitionField("k", "iceberg_bucket", 16)
    df = spark.createDataFrame(
        [(None,), (34,), (None,), (2**40,)], "k long"
    ).coalesce(1)
    got = [r.b for r in df.select(f.expr().alias("b")).collect()]
    assert got == [
        None,
        iceberg_bucket_value(34, 16),
        None,
        iceberg_bucket_value(2**40, 16),
    ]


def test_bucket_pruning_hashes_by_column_type(spark, tmp_path):
    """Pruning must hash the literal AS THE SOURCE COLUMN's type: a quoted
    date on a date-bucketed table hashes epoch-days (not the utf-8
    string), and a quoted number on a long-bucketed table hashes the long
    — otherwise the point lookup prunes to the wrong bucket and silently
    returns no rows."""
    dsch = T.StructType(
        [T.StructField("d", T.DateType()), T.StructField("x", T.LongType())]
    )
    t = LakehouseTable.create(
        str(tmp_path / "td"), dsch, partition_by=["iceberg_bucket(d, 8)"]
    )
    t.append(
        spark.createDataFrame(
            [(dt.date(2020, 6, 1) + dt.timedelta(days=i), i) for i in range(64)],
            dsch,
        )
    )
    kept, total = t.scan_files("d = '2020-06-10'")
    target = iceberg_bucket_value(dt.date(2020, 6, 10), 8)
    assert kept and all(f"d_iceberg_bucket8={target}" in f["path"] for f in kept)
    assert t.read(spark, where="d = '2020-06-10'").count() == 1
    # quoted number on a long bucket column
    t2 = LakehouseTable.create(
        str(tmp_path / "tl"),
        T.StructType([T.StructField("k", T.LongType())]),
        partition_by=["iceberg_bucket(k, 8)"],
    )
    t2.append(spark.createDataFrame([(i,) for i in range(64)], "k long"))
    kept2, _ = t2.scan_files("k = '34'")
    tgt2 = iceberg_bucket_value(34, 8)
    assert kept2 and all(f"k_iceberg_bucket8={tgt2}" in f["path"] for f in kept2)
    assert t2.read(spark, where="k = '34'").count() == 1
    # bare number on a STRING bucket column must NOT prune (Spark casts the
    # column, so '034' = 34 matches outside the literal's bucket)
    t3 = LakehouseTable.create(
        str(tmp_path / "ts"),
        T.StructType([T.StructField("s", T.StringType())]),
        partition_by=["iceberg_bucket(s, 4)"],
    )
    t3.append(spark.createDataFrame([("034",), ("34",)], "s string"))
    kept3, total3 = t3.scan_files("s = 34")
    assert len(kept3) == total3
    assert t3.read(spark, where="s = 34").count() == 2


def test_bucket_pruning_in_list(spark, tmp_path):
    """IN-list point lookups prune to the UNION of the listed values'
    buckets; unparsable atoms and subqueries keep everything."""
    t = LakehouseTable.create(
        str(tmp_path / "tin"), SCHEMA, partition_by=["iceberg_bucket(k, 8)"]
    )
    t.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(400)], SCHEMA)
    )
    kept, total = t.scan_files("k IN (34, 35, 36)")
    allowed = {iceberg_bucket_value(v, 8) for v in (34, 35, 36)}
    assert kept and len(kept) < total
    for f in kept:
        assert any(f"k_iceberg_bucket8={b}" in f["path"] for b in allowed)
    got = sorted(r.k for r in t.read(spark, where="k IN (34, 35, 36)").collect())
    assert got == [34, 35, 36]
    # string atoms participate; an eq on the same column wins over IN
    kept2, total2 = t.scan_files("k IN (34, 35) AND k = 34")
    assert all(
        f"k_iceberg_bucket8={iceberg_bucket_value(34, 8)}" in f["path"]
        for f in kept2
    )
    # non-literal items (subquery / expression): conservative, keep all
    kept3, total3 = t.scan_files("k IN (SELECT x FROM y)")
    assert len(kept3) == total3
    # string literal containing a comma must not split into phantom atoms
    t2 = LakehouseTable.create(
        str(tmp_path / "tin2"), SCHEMA, partition_by=["iceberg_bucket(v, 4)"]
    )
    t2.append(
        spark.createDataFrame([(i, f"s{i}") for i in range(100)], SCHEMA)
    )
    kept4, total4 = t2.scan_files("v IN ('s7', 's9')")
    assert len(kept4) < total4
    assert t2.read(spark, where="v IN ('s7', 's9')").count() == 2
