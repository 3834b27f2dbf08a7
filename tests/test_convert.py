"""Conversion/coercion unit tests — the PySpark mirror of the reference's
RecordConverterTest.java (~800 LoC, SURVEY.md §5.1) over the F2 `alltypes`
coercion matrix (FIXTURES.md)."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.convert import (
    project_keys,
    project_to_schema,
)


def _one(spark, data, schema, target):
    df = spark.createDataFrame([data], schema)
    return project_to_schema(df, target).collect()[0]


F2_TARGET = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("l", T.LongType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("fl", T.FloatType()),
        T.StructField("do", T.DoubleType()),
        T.StructField("dec", T.DecimalType(9, 2)),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("li", T.ArrayType(T.StringType())),
        T.StructField("ma", T.MapType(T.StringType(), T.StringType())),
        T.StructField("extra", T.StringType()),
    ]
)


def test_string_coercion_matrix(spark):
    """Every primitive accepted in string form (RecordConverterTest:393-505)."""
    row = _one(
        spark,
        ("123", "123", "2023-05-18", "2023-05-18T07:14:21", "1.1", "2.2",
         "12.345", "str", "AQID", ["hello", "world"], {"one": "1"}, "junk"),
        "i string, l string, d string, ts string, fl string, do string, "
        "dec string, s string, b string, li array<string>, "
        "ma map<string,string>, junkcol string",
        F2_TARGET,
    )
    assert row.i == 123 and row.l == 123
    assert row.d == datetime.date(2023, 5, 18)
    assert row.ts == datetime.datetime(2023, 5, 18, 7, 14, 21)
    assert row.fl == pytest.approx(1.1) and row.do == 2.2
    # decimal rescale HALF_UP (RecordConverter.java:338-357)
    assert row.dec == Decimal("12.35")
    assert row.b == b"\x01\x02\x03"  # base64 "AQID"
    assert row.li == ["hello", "world"] and row.ma == {"one": "1"}
    assert row.extra is None  # missing target column → NULL
    assert "junkcol" not in row.asDict()  # unknown input column → dropped


def test_numeric_epoch_coercions(spark):
    """date from epoch-days, timestamp from epoch-millis
    (RecordConverter.java:407-420,471-495)."""
    target = T.StructType(
        [
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tsn", T.TimestampNTZType()),
        ]
    )
    row = _one(spark, (19495, 1684394061000, 1684394061000),
               "d int, ts long, tsn long", target)
    assert row.d == datetime.date(2023, 5, 18)
    assert row.ts == datetime.datetime(2023, 5, 18, 7, 14, 21)
    assert row.tsn == datetime.datetime(2023, 5, 18, 7, 14, 21)


def test_timestamp_space_separator(spark):
    """Lenient ISO parsing: space separator accepted
    (RecordConverter.java:497-506)."""
    target = T.StructType([T.StructField("ts", T.TimestampNTZType())])
    row = _one(spark, ("2023-05-18 07:14:21",), "ts string", target)
    assert row.ts == datetime.datetime(2023, 5, 18, 7, 14, 21)


def test_struct_serialized_to_json_string(spark):
    """Struct/map/list values for a STRING column serialize to JSON
    (RecordConverter.java:368-385)."""
    target = T.StructType([T.StructField("s", T.StringType())])
    df = spark.createDataFrame(
        [((1, "x"),)], "s struct<a: int, b: string>"
    )
    row = project_to_schema(df, target).collect()[0]
    assert row.s == '{"a":1,"b":"x"}'


def test_nested_struct_recursive_conversion(spark):
    """F3 nesting: structs in structs, unknown nested fields dropped,
    missing nested fields null-filled (RecordConverterTest:506-700)."""
    target = T.StructType(
        [
            T.StructField("ii", T.IntegerType()),
            T.StructField(
                "st",
                T.StructType(
                    [
                        T.StructField("x", T.LongType()),
                        T.StructField("missing", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(7, (5, "dropme"))], "ii int, st struct<x: int, unknown: string>"
    )
    row = project_to_schema(df, target).collect()[0]
    assert row.st.x == 5 and row.st.missing is None
    assert "unknown" not in row.st.asDict()


def test_null_struct_stays_null(spark):
    target = T.StructType(
        [T.StructField("st", T.StructType([T.StructField("x", T.LongType())]))]
    )
    df = spark.createDataFrame([(None,)], "st struct<x: int>")
    assert project_to_schema(df, target).collect()[0].st is None


def test_array_and_map_element_coercion(spark):
    """Recursive element conversion (RecordConverter.java:273-300)."""
    target = T.StructType(
        [
            T.StructField("li", T.ArrayType(T.LongType())),
            T.StructField("ma", T.MapType(T.StringType(), T.IntegerType())),
        ]
    )
    df = spark.createDataFrame(
        [((["1", "2"]), {"k": "3"})],
        "li array<string>, ma map<string,string>",
    )
    row = project_to_schema(df, target).collect()[0]
    assert row.li == [1, 2] and row.ma == {"k": 3}


def test_case_insensitive_resolution(spark):
    """iceberg.tables.schema-case-insensitive
    (RecordConverterTest:369-392)."""
    target = T.StructType([T.StructField("EventId", T.LongType())])
    df = spark.createDataFrame([(5,)], "eventid long")
    assert project_to_schema(df, target).collect()[0].EventId is None
    assert (
        project_to_schema(df, target, case_insensitive=True).collect()[0].EventId
        == 5
    )


def test_name_mapping_resolution(spark):
    """schema.name-mapping.default table property
    (RecordConverter.java:245-271)."""
    target = T.StructType([T.StructField("id", T.LongType())])
    df = spark.createDataFrame([(9,)], "legacy_id long")
    out = project_to_schema(df, target, name_mapping={"id": "legacy_id"})
    assert out.collect()[0].id == 9


def test_key_projection_nested(spark):
    """P4: RecordProjection onto nested id fields
    (RecordProjection.java:46-164)."""
    df = spark.createDataFrame(
        [((1, ("k1", "x")), "payload")],
        "row struct<id: long, nested: struct<key: string, other: string>>, p string",
    )
    out = project_keys(df, ["row.id", "row.nested.key"])
    r = out.collect()[0]
    assert r.id == 1 and r.key == "k1"
    assert out.columns == ["id", "key"]


def test_widening_and_narrowing_casts(spark):
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.DoubleType()),
            T.StructField("c", T.IntegerType()),
        ]
    )
    row = _one(spark, (1, 2.5, 7), "a int, b float, c long", target)
    assert row.a == 1 and abs(row.b - 2.5) < 1e-9 and row.c == 7


def test_bool_from_string(spark):
    target = T.StructType([T.StructField("b", T.BooleanType())])
    assert _one(spark, ("true",), "b string", target).b is True
    assert _one(spark, ("false",), "b string", target).b is False
