"""Mongo ArrayEncoding modes — pytest mirror of the reference's
MongoDataConverterTest (restaurants5.json fixture, null/undefined
handling) plus the document-encoding and homogeneity behaviors of
ArrayEncoding.java / MongoDataConverter.java:134-300."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.transforms.mongo_arrays import (
    HeterogeneousArrayError,
    MongoShape,
    infer_mongo_shape,
    parse_mongo_json,
)

# the reference test fixture (restaurants5.json), verbatim shape
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


def _parse_one(spark, doc: str, encoding: str):
    df = spark.createDataFrame([(doc,)], "j string")
    out = df.select(
        parse_mongo_json("j", doc, array_encoding=encoding).alias("d")
    )
    return out.schema["d"].dataType, out.collect()[0].d


def test_restaurants_schema_array_mode(spark):
    """shouldCreateCorrectSchemaFromInsertJson: nested doc, homogeneous
    double array, array-of-documents with unioned fields, $date →
    timestamp, int32 scores."""
    shape = infer_mongo_shape(RESTAURANT, "array")
    t = shape.spark_type()
    addr = t["address"].dataType
    assert isinstance(addr, T.StructType)
    assert addr["building"].dataType == T.StringType()
    assert addr["floor"].dataType == T.StructType(
        [
            T.StructField("level", T.IntegerType()),
            T.StructField("description", T.StringType()),
        ]
    )
    assert addr["coord"].dataType == T.ArrayType(T.DoubleType())
    grades = t["grades"].dataType
    assert isinstance(grades, T.ArrayType)
    assert grades.elementType == T.StructType(
        [
            T.StructField("date", T.TimestampType()),
            T.StructField("grade", T.StringType()),
            T.StructField("score", T.IntegerType()),
        ]
    )
    assert t["restaurant_id"].dataType == T.StringType()


def test_restaurants_values_array_mode(spark):
    """shouldCreateCorrectStructFromInsertJson, value side."""
    _, d = _parse_one(spark, RESTAURANT, "array")
    assert d.address.building == "1007"
    assert d.address.floor.level == 17
    assert d.address.coord == [-73.856077, 40.848447]
    assert len(d.grades) == 5
    assert d.grades[0].date == dt.datetime(2014, 3, 3)  # Mon Mar 03 2014 UTC
    assert d.grades[4].grade == "B" and d.grades[4].score == 14
    assert d.name == "Morris Park Bake Shop"


def test_null_value_keeps_field_as_string(spark):
    """shouldProcessNullValue: null → optional string field, value
    null."""
    doc = (
        '{"_id": {"$oid": "51e5619ee4b01f9fbdfba9fc"},'
        ' "delivery": {"hour": null, "hourId": 10}}'
    )
    t, d = _parse_one(spark, doc, "array")
    assert t["delivery"].dataType["hour"].dataType == T.StringType()
    assert t["delivery"].dataType["hourId"].dataType == T.IntegerType()
    assert d._id == "51e5619ee4b01f9fbdfba9fc"
    assert d.delivery.hour is None and d.delivery.hourId == 10


def test_undefined_fields_dropped(spark):
    """shouldProcessUnsupportedValue: $undefined drops from schema and
    value, in document mode like the reference test."""
    doc = (
        '{"_id": {"$oid": "518cc94bc27cfa20d9693e5d"},'
        ' "name": {"$undefined": true},'
        ' "address": {"building": {"$undefined": true}, "floor": 10}}'
    )
    t, d = _parse_one(spark, doc, "document")
    assert list(t.fieldNames()) == ["_id", "address"]
    assert list(t["address"].dataType.fieldNames()) == ["floor"]
    assert d.address.floor == 10


def test_heterogeneous_array_raises_in_array_mode():
    doc = '{"a": [1, "x"]}'
    with pytest.raises(HeterogeneousArrayError, match="homogenous"):
        infer_mongo_shape(doc, "array")
    # int32 vs int64 are distinct BSON types → also heterogeneous
    with pytest.raises(HeterogeneousArrayError, match="homogenous"):
        infer_mongo_shape('{"a": [1, 99999999999]}', "array")


def test_union_conflict_raises_in_array_mode():
    doc = '{"a": [{"x": 1}, {"x": "s"}]}'
    with pytest.raises(HeterogeneousArrayError, match="not the same type"):
        infer_mongo_shape(doc, "array")


def test_union_null_upgrades_and_missing_fields_null(spark):
    """testArrayElementType: null merges to the non-null type; a field
    absent from one element reads NULL there."""
    doc = '{"a": [{"x": null, "y": 1}, {"x": "s"}]}'
    t, d = _parse_one(spark, doc, "array")
    el = t["a"].dataType.elementType
    assert el["x"].dataType == T.StringType()
    assert el["y"].dataType == T.IntegerType()
    assert d.a[0].x is None and d.a[0].y == 1
    assert d.a[1].x == "s" and d.a[1].y is None


def test_document_encoding_mixed_array(spark):
    """DOCUMENT mode: [a, b, c] → struct{_0, _1, _2}, each element its
    own type — the mixed-type escape hatch."""
    doc = '{"a": [1, "x", {"c": true}], "b": []}'
    t, d = _parse_one(spark, doc, "document")
    a = t["a"].dataType
    assert isinstance(a, T.StructType)
    assert a["_0"].dataType == T.IntegerType()
    assert a["_1"].dataType == T.StringType()
    assert a["_2"].dataType == T.StructType(
        [T.StructField("c", T.BooleanType())]
    )
    assert d.a._0 == 1 and d.a._1 == "x" and d.a._2.c is True
    # empty array → empty struct (reference: empty SchemaBuilder.struct)
    assert t["b"].dataType == T.StructType([])


def test_document_encoding_undefined_keeps_original_index(spark):
    """arrayElementStructName keys by ORIGINAL index even when an
    undefined element is dropped."""
    doc = '{"a": [1, {"$undefined": true}, "z"]}'
    t, d = _parse_one(spark, doc, "document")
    assert list(t["a"].dataType.fieldNames()) == ["_0", "_2"]
    assert d.a._0 == 1 and d.a._2 == "z"


def test_nested_homogeneous_arrays_array_mode(spark):
    doc = '{"m": [[1, 2], [3]]}'
    t, d = _parse_one(spark, doc, "array")
    assert t["m"].dataType == T.ArrayType(T.ArrayType(T.IntegerType()))
    assert d.m == [[1, 2], [3]]


def test_empty_array_is_string_array_in_array_mode(spark):
    t, d = _parse_one(spark, '{"a": [], "b": 1}', "array")
    assert t["a"].dataType == T.ArrayType(T.StringType())
    assert d.a == [] and d.b == 1


def test_extended_scalars_roundtrip(spark):
    """$numberLong/$numberDecimal/$timestamp/$binary/$regularExpression
    map per the reference's BsonType switch."""
    doc = (
        '{"big": {"$numberLong": "9999999999"},'
        ' "dec": {"$numberDecimal": "1.5"},'
        ' "ts": {"$timestamp": {"t": 100, "i": 1}},'
        ' "bin": {"$binary": {"base64": "aGk=", "subType": "00"}},'
        ' "rex": {"$regularExpression": {"pattern": "^x", "options": "i"}}}'
    )
    t, d = _parse_one(spark, doc, "array")
    assert t["big"].dataType == T.LongType() and d.big == 9999999999
    assert t["dec"].dataType == T.StringType() and d.dec == "1.5"
    assert t["ts"].dataType == T.TimestampType()
    assert d.ts == dt.datetime(1970, 1, 1, 0, 1, 40)
    assert t["bin"].dataType == T.BinaryType() and bytes(d.bin) == b"hi"
    assert d.rex.regex == "^x" and d.rex.options == "i"


def test_empty_documents_skipped_then_consulted():
    """subSchema's emptyChecker: empty sub-docs skipped when other
    elements define fields; consulted only when nothing else does."""
    s = infer_mongo_shape('{"a": [{"x": {}}, {"x": {"k": 1}}]}', "array")
    el = s.fields["a"].element
    assert el.fields["x"].fields["k"].kind == "int"
    s2 = infer_mongo_shape('{"a": [{"x": {}}]}', "array")
    assert s2.fields["a"].element.fields["x"].fields == {}


def test_multi_sample_union():
    shape = infer_mongo_shape(
        ['{"a": 1}', '{"b": "x"}', '{"a": 2, "c": true}'], "array"
    )
    assert {k: s.kind for k, s in shape.fields.items()} == {
        "a": "int",
        "b": "string",
        "c": "boolean",
    }


def test_shape_reuse_and_column_input(spark):
    shape = infer_mongo_shape(RESTAURANT, "array")
    assert isinstance(shape, MongoShape)
    df = spark.createDataFrame([(RESTAURANT,), (None,)], "j string")
    out = df.select(parse_mongo_json(F.col("j"), shape).alias("d"))
    rows = out.collect()
    assert rows[0].d.borough == "Bronx"
    assert rows[1].d is None


def test_transform_with_document_encoding_end_to_end(spark):
    """mongo_debezium_transform(shape=...): create + partial update over
    a document whose mixed-type array needs DOCUMENT encoding."""
    from iceberg_kafka_connect_spark.transforms.mongo import (
        mongo_debezium_transform,
    )

    sample = '{"_id": {"$oid": "aa"}, "tags": [1, "x"], "n": 2}'
    shape = infer_mongo_shape(sample, "document")
    rows = [
        # create
        ("c", None, '{"_id":{"$oid":"aa"},"tags":[1,"x"],"n":2}',
         None, '{"_id":{"$oid":"aa"}}', 1000),
        # partial update: n bumped, tags untouched, no full document
        ("u", None, None,
         ('{"updatedFields": "{\\"n\\": 5}", "removedFields": []}'),
         '{"_id":{"$oid":"aa"}}', 2000),
    ]
    df = spark.createDataFrame(
        rows,
        "op string, before string, after string, "
        "updateDescription_json string, documentKey string, ts_ms long",
    ).withColumn(
        "updateDescription",
        F.from_json(
            "updateDescription_json",
            "updatedFields string, removedFields array<string>",
        ),
    )
    out = mongo_debezium_transform(shape=shape)(df).orderBy("_cdc.ts")
    got = out.collect()
    assert got[0].tags._0 == 1 and got[0].tags._1 == "x"
    assert got[0].n == 2 and got[0]._cdc.op == "I"
    # the partial update reconstructs: n overlaid, key from documentKey
    assert got[1].n == 5 and got[1]._id == "aa" and got[1]._cdc.op == "U"
