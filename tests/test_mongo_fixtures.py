"""Mongo Debezium SMT driven by the reference's own JSON resource fixtures.

Test vectors are the reference's test resources
(kafka-connect-transforms/src/test/resources/mongo_{create,update,delete}_
event_*.json, restaurants5.json) and the expectations mirror
MongoDebeziumTransformTest.java:211-567 / MongoDataConverterTest.java:48-90 —
create/delete/full-update extraction, the three partial-update
reconstructions (with before, with removedFields, without before), the
malformed-envelope failure, and nested-document conversion with extended
JSON scalars."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.transforms.mongo import (
    mongo_debezium_transform,
    normalize_extended_json,
)

# ---- fixtures: byte-for-byte the reference's test resources ----
CREATE_AFTER = (
    '{"_id" : {"$numberLong" : "1004"},"first_name" : "Anne",'
    '"last_name" : "Kretchmar","email" : "annek@noanswer.org"}'
)
UPDATE_AFTER = (
    '{"_id": {"$numberLong": "1004"},"first_name": "Anne Marie",'
    '"last_name": "Kretchmar","email": "annek@noanswer.org"}'
)
UPDATE_BEFORE = (
    '{"_id": {"$numberLong": "1004"},"first_name": "unknown",'
    '"last_name": "Kretchmar","email": "annek@noanswer.org"}'
)
UPDATED_FIELDS = '{"first_name": "Anne Marie"}'
DELETE_BEFORE = UPDATE_BEFORE

DOC_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("after", T.StringType()),
        T.StructField("before", T.StringType()),
        T.StructField(
            "updateDescription",
            T.StructType(
                [
                    T.StructField("updatedFields", T.StringType()),
                    T.StructField("removedFields", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField("documentKey", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

TS_MS = 1558965515240  # DEFAULT_TS_MS in the reference test
KEY = '{"_id": 1004}'


def _unwrap(spark, rows, strict=False):
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    df = df.withColumn("after", normalize_extended_json(F.col("after")))
    df = df.withColumn("before", normalize_extended_json(F.col("before")))
    return df.transform(
        mongo_debezium_transform(DOC_SCHEMA, strict=strict)
    ).collect()


def test_create_event(spark):
    """MongoDebeziumTransformTest 'create events are converted'."""
    out = _unwrap(
        spark, [Row("c", CREATE_AFTER, None, None, KEY, TS_MS)]
    )
    assert len(out) == 1
    r = out[0]
    assert (r._id, r.first_name, r.last_name, r.email) == (
        1004,
        "Anne",
        "Kretchmar",
        "annek@noanswer.org",
    )
    assert r._cdc.op == "I" and r._cdc.key == "1004"


def test_delete_event_with_before(spark):
    out = _unwrap(spark, [Row("d", None, DELETE_BEFORE, None, KEY, TS_MS)])
    r = out[0]
    assert (r._id, r.first_name) == (1004, "unknown")
    assert r._cdc.op == "D"


def test_fully_specified_update(spark):
    out = _unwrap(
        spark, [Row("u", UPDATE_AFTER, UPDATE_BEFORE, None, KEY, TS_MS)]
    )
    r = out[0]
    assert (r._id, r.first_name, r.last_name, r.email) == (
        1004,
        "Anne Marie",
        "Kretchmar",
        "annek@noanswer.org",
    )
    assert r._cdc.op == "U"


def test_partial_update_merges_before_values(spark):
    """'partial updates with before values should merge updatedFields with
    before values': unchanged fields come from before, not NULL."""
    upd = Row(updatedFields=UPDATED_FIELDS, removedFields=None)
    out = _unwrap(spark, [Row("u", None, UPDATE_BEFORE, upd, KEY, TS_MS)])
    r = out[0]
    assert (r._id, r.first_name, r.last_name, r.email) == (
        1004,
        "Anne Marie",
        "Kretchmar",
        "annek@noanswer.org",
    )


def test_partial_update_removed_fields_absent(spark):
    upd = Row(
        updatedFields=UPDATED_FIELDS, removedFields=["last_name", "email"]
    )
    out = _unwrap(spark, [Row("u", None, UPDATE_BEFORE, upd, KEY, TS_MS)])
    r = out[0]
    assert (r._id, r.first_name) == (1004, "Anne Marie")
    assert r.last_name is None and r.email is None


def test_partial_update_without_before_bumps_key(spark):
    """'partial updates without before/after values should include
    updateFields and id column' — _id comes from documentKey."""
    upd = Row(updatedFields=UPDATED_FIELDS, removedFields=None)
    out = _unwrap(spark, [Row("u", None, None, upd, KEY, TS_MS)])
    r = out[0]
    assert (r._id, r.first_name) == (1004, "Anne Marie")
    assert r.last_name is None and r.email is None


def test_missing_all_payloads_raises_in_strict_mode(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        _unwrap(spark, [Row("u", None, None, None, KEY, TS_MS)], strict=True)


def test_missing_all_payloads_dropped_when_not_strict(spark):
    assert _unwrap(spark, [Row("u", None, None, None, KEY, TS_MS)]) == []


def test_tombstones_pass_untouched_upstream(spark):
    """The reference returns tombstones as-is before unwrapping; in the
    pipeline that's the tombstone filter stage — here the SMT simply never
    sees a row, and a null-valued envelope yields no output row."""
    out = _unwrap(spark, [Row(None, None, None, None, None, None)])
    assert out == []


# ---- restaurants5.json: nested documents, arrays of structs, $date ----
RESTAURANT = """
{
  "address": {
    "building": "1007",
    "floor" : { "level" : 17, "description" : "level 17" },
    "coord": [ -73.856077, 40.848447 ],
    "street": "Morris Park Ave",
    "zipcode": "10462"
  },
  "borough": "Bronx",
  "cuisine": "Bakery",
  "grades": [
    { "date": { "$date": 1393804800000 }, "grade": "A", "score": 2 },
    { "date": { "$date": 1378857600000 }, "grade": "A", "score": 6 },
    { "date": { "$date": 1358985600000 }, "grade": "A", "score": 10 },
    { "date": { "$date": 1322006400000 }, "grade": "A", "score": 9 },
    { "date": { "$date": 1299715200000 }, "grade": "B", "score": 14 }
  ],
  "name": "Morris Park Bake Shop",
  "restaurant_id": "30075445"
}
"""

RESTAURANT_SCHEMA = T.StructType(
    [
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("building", T.StringType()),
                    T.StructField(
                        "floor",
                        T.StructType(
                            [
                                T.StructField("level", T.IntegerType()),
                                T.StructField("description", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("coord", T.ArrayType(T.DoubleType())),
                    T.StructField("street", T.StringType()),
                    T.StructField("zipcode", T.StringType()),
                ]
            ),
        ),
        T.StructField("borough", T.StringType()),
        T.StructField("cuisine", T.StringType()),
        T.StructField(
            "grades",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("date", T.LongType()),
                        T.StructField("grade", T.StringType()),
                        T.StructField("score", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("name", T.StringType()),
        T.StructField("restaurant_id", T.StringType()),
    ]
)


def test_restaurants_nested_document_conversion(spark):
    """MongoDataConverterTest.shouldCreateCorrectStructFromInsertJson: the
    nested-document fixture converts with every field typed and $date
    resolved to the epoch instant."""
    df = spark.createDataFrame([(RESTAURANT,)], "doc string")
    parsed = df.select(
        F.from_json(
            normalize_extended_json(F.col("doc")), RESTAURANT_SCHEMA
        ).alias("r")
    ).select("r.*")
    r = parsed.collect()[0]
    assert r.address.building == "1007"
    assert r.address.floor.level == 17
    assert r.address.floor.description == "level 17"
    assert r.address.coord == [-73.856077, 40.848447]
    assert r.address.street == "Morris Park Ave"
    assert r.address.zipcode == "10462"
    assert (r.borough, r.cuisine) == ("Bronx", "Bakery")
    assert [g.grade for g in r.grades] == ["A", "A", "A", "A", "B"]
    assert [g.score for g in r.grades] == [2, 6, 10, 9, 14]
    # Mon Mar 03 00:00:00 UTC 2014 == 1393804800000 (reference asserts the
    # java.util.Date rendering; epoch millis is the same instant)
    assert r.grades[0].date == 1393804800000
    assert r.name == "Morris Park Bake Shop"
    assert r.restaurant_id == "30075445"


def test_extended_json_scalar_wrappers(spark):
    df = spark.createDataFrame(
        [
            (
                '{"a": {"$numberLong": "-7"}, "b": {"$numberDouble": "1.5"},'
                ' "c": {"$oid": "deadbeefcafe"},'
                ' "d": {"$date": {"$numberLong": "1393804800000"}},'
                ' "e": {"$numberDecimal": "2.25"}}',
            )
        ],
        "doc string",
    )
    out = df.select(
        F.from_json(
            normalize_extended_json(F.col("doc")),
            "a long, b double, c string, d long, e double",
        ).alias("r")
    ).collect()[0].r
    assert (out.a, out.b, out.c, out.d, out.e) == (
        -7,
        1.5,
        "deadbeefcafe",
        1393804800000,
        2.25,
    )
