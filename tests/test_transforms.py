"""SMT transform tests — mirror of the reference's transforms test layer
(DebeziumTransformTest, DmsTransformTest, MongoDebeziumTransformTest,
JsonToMapTransformTest, KafkaMetadataTransformTest, CopyValueTest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.transforms import (
    copy_value,
    debezium_transform,
    dms_transform,
    json_to_map,
    kafka_metadata,
    mongo_debezium_transform,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.LongType()),
    ]
)


def test_copy_value(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    out = df.transform(copy_value("v", "v2")).collect()[0]
    assert out.v2 == "a"


def test_debezium_create_update_delete(spark):
    rows = [
        # op, before, after
        ("c", None, (1, "new")),
        ("u", (2, "old"), (2, "upd")),
        ("d", (3, "gone"), None),
        ("r", None, (4, "snap")),  # snapshot read → I
    ]
    df = spark.createDataFrame(
        [
            (op, b, a, ("db1", None, "tbl"), 1700000000000)
            for op, b, a in rows
        ],
        "op string, before struct<id: long, data: string>, "
        "after struct<id: long, data: string>, "
        "source struct<db: string, schema: string, table: string>, ts_ms long",
    )
    out = df.transform(debezium_transform()).orderBy("id").collect()
    assert [(r.id, r.data, r._cdc.op) for r in out] == [
        (1, "new", "I"),
        (2, "upd", "U"),
        (3, "gone", "D"),  # delete row sourced from before
        (4, "snap", "I"),
    ]
    assert out[0]._cdc.source == "db1.tbl"
    assert out[0]._cdc.target == "db1.tbl"


def test_debezium_postgres_schema_source_and_pattern(spark):
    df = spark.createDataFrame(
        [("c", None, (1, "x"), (None, "public", "users"), 1700000000000)],
        "op string, before struct<id: long, data: string>, "
        "after struct<id: long, data: string>, "
        "source struct<db: string, schema: string, table: string>, ts_ms long",
    )
    out = df.transform(
        debezium_transform(target_pattern="ice_{db}.{table}_sink")
    ).collect()[0]
    assert out._cdc.source == "public.users"
    assert out._cdc.target == "ice_public.users_sink"


def test_dms_unwrap(spark):
    df = spark.createDataFrame(
        [
            ((1, "a"), ("insert", "2024-01-01 00:00:00", "s1", "t1")),
            ((2, "b"), ("update", "2024-01-01 00:00:00", "s1", "t1")),
            ((3, "c"), ("delete", "2024-01-01 00:00:00", "s1", "t1")),
        ],
        "data struct<id: long, v: string>, "
        "metadata struct<operation: string, timestamp: string, "
        "`schema-name`: string, `table-name`: string>",
    )
    out = df.transform(dms_transform()).orderBy("id").collect()
    assert [(r.id, r._cdc.op) for r in out] == [(1, "I"), (2, "U"), (3, "D")]
    assert out[0]._cdc.source == "s1.t1"


def test_mongo_create_full_update_delete(spark):
    """mongo_{create,update,delete}_event test-resource parity."""
    df = spark.createDataFrame(
        [
            ("c", None, '{"_id": 1, "name": "a", "qty": 5}', None, '{"_id": 1}', 1700000000000),
            ("u", None, '{"_id": 1, "name": "a2", "qty": 6}', None, '{"_id": 1}', 1700000000001),
            ("d", '{"_id": 1, "name": "a2", "qty": 6}', None, None, '{"_id": 1}', 1700000000002),
        ],
        "op string, before string, after string, "
        "updateDescription struct<updatedFields: string, removedFields: array<string>>, "
        "documentKey string, ts_ms long",
    )
    out = df.transform(mongo_debezium_transform(DOC_SCHEMA)).collect()
    assert [(r._id, r.name, r._cdc.op) for r in out] == [
        (1, "a", "I"),
        (1, "a2", "U"),
        (1, "a2", "D"),
    ]
    assert out[0]._cdc.key == "1"


def test_mongo_partial_update_reconstruction(spark):
    """updateDescription path: updatedFields applied, removedFields → NULL
    (MongoDebeziumTransform.java:120-189)."""
    df = spark.createDataFrame(
        [
            (
                "u",
                None,
                None,
                ('{"qty": 9}', ["name"]),
                '{"_id": 42}',
                1700000000000,
            )
        ],
        "op string, before string, after string, "
        "updateDescription struct<updatedFields: string, removedFields: array<string>>, "
        "documentKey string, ts_ms long",
    )
    out = df.transform(mongo_debezium_transform(DOC_SCHEMA)).collect()[0]
    assert out._id == 42 and out.qty == 9 and out.name is None
    assert out._cdc.op == "U"


def test_json_to_map_root_mode(spark):
    """F6 json.root=true → single payload map<string,string>."""
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": 2}, "d": [1, "two"]}',)], "value string"
    )
    out = df.transform(json_to_map("value", root=True)).collect()[0]
    assert out.payload["a"] == "1"
    # nested object survives as serialized JSON text
    assert "2" in out.payload["b"]


def test_json_to_map_inferred_schema_chaotic(spark):
    """F6 drifting keys: one unified schema per batch, missing keys null,
    integral values widen to long."""
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2, "c": 3.5}',), ("{}",)],
        "value string",
    )
    out = df.transform(json_to_map("value"))
    fields = {f.name: f.dataType for f in out.schema["payload"].dataType.fields}
    assert fields["a"] == T.LongType()
    assert fields["c"] == T.DoubleType()
    rows = out.select("payload.a", "payload.b", "payload.c").collect()
    assert {(r[0], r[1], r[2]) for r in rows} == {
        (1, "x", None),
        (2, None, 3.5),
        (None, None, None),
    }


def test_kafka_metadata_nested_and_flat(spark):
    df = spark.createDataFrame(
        [("t", 0, 5, "k")], "topic string, partition int, offset long, key string"
    )
    nested = df.transform(kafka_metadata(nested=True)).collect()[0]
    assert nested._kafka_metadata.topic == "t"
    assert nested._kafka_metadata.offset == 5
    flat = df.transform(kafka_metadata(nested=False, key_prefix="_km")).collect()[0]
    assert flat._km_topic == "t" and flat._km_offset == 5


def test_kafka_metadata_external_field(spark):
    df = spark.createDataFrame([("t", 0, 5)], "topic string, partition int, offset long")
    out = df.transform(
        kafka_metadata(nested=True, external_field=("cluster", "c1"))
    ).collect()[0]
    assert out._kafka_metadata.cluster == "c1"


# ------------------------------------------- Kafka Connect SMT chain config
def test_parse_transform_chain_reference_properties(spark):
    """The connector-JSON SMT surface: transforms= + transforms.<n>.type
    with the reference's verbatim config key names."""
    from pyspark.sql import functions as F

    from iceberg_kafka_connect_spark.config import parse_transform_chain

    chain = parse_transform_chain(
        {
            "transforms": "cv, meta",
            "transforms.cv.type": (
                "io.tabular.iceberg.connect.transforms.CopyValue$Value"
            ),
            "transforms.cv.source.field": "a",
            "transforms.cv.target.field": "b",
            "transforms.meta.type": (
                "io.tabular.iceberg.connect.transforms.KafkaMetadataTransform"
            ),
            "transforms.meta.nested": "true",
            "transforms.meta.field_name": "_meta",
            "transforms.meta.external_field": "cluster,c1",
        }
    )
    assert len(chain) == 2
    df = spark.createDataFrame(
        [("x", "t", 0, 5, None)],
        "a string, topic string, partition int, offset long, timestamp timestamp",
    )
    out = df
    for t in chain:
        out = t(out)
    row = out.first()
    assert row.b == "x"  # CopyValue
    assert row._meta.cluster == "c1" and row._meta.topic == "t"


def test_parse_transform_chain_unknown_type_raises():
    import pytest as _pytest

    from iceberg_kafka_connect_spark.config import parse_transform_chain

    with _pytest.raises(ValueError, match="unknown transform"):
        parse_transform_chain(
            {"transforms": "x", "transforms.x.type": "com.example.Nope"}
        )
    with _pytest.raises(ValueError, match="type is required"):
        parse_transform_chain({"transforms": "x"})


def test_parse_transform_chain_mongo_schema(spark):
    """MongoDebeziumTransform is constructible from flat properties via a
    doc.schema DDL string; omitting the schema raises a named error."""
    import pytest as _pytest

    from iceberg_kafka_connect_spark.config import parse_transform_chain

    chain = parse_transform_chain(
        {
            "transforms": "mongo",
            "transforms.mongo.type": (
                "io.tabular.iceberg.connect.transforms.MongoDebeziumTransform"
            ),
            "transforms.mongo.doc.schema": "_id BIGINT, name STRING",
        }
    )
    assert len(chain) == 1
    df = spark.createDataFrame(
        [
            (
                "c",
                None,
                '{"_id": 1, "name": "a"}',
                None,
                '{"_id": 1}',
                1000,
            )
        ],
        "op string, before string, after string, "
        "updateDescription struct<updatedFields string, "
        "removedFields array<string>>, documentKey string, ts_ms long",
    )
    row = chain[0](df).first()
    assert row._id == 1 and row.name == "a"

    with _pytest.raises(ValueError, match="doc.schema is required"):
        parse_transform_chain(
            {
                "transforms": "m",
                "transforms.m.type": (
                    "io.tabular.iceberg.connect.transforms."
                    "MongoDebeziumTransform"
                ),
            }
        )
    with _pytest.raises(ValueError, match="invalid DDL"):
        parse_transform_chain(
            {
                "transforms": "m",
                "transforms.m.type": (
                    "io.tabular.iceberg.connect.transforms."
                    "MongoDebeziumTransform"
                ),
                "transforms.m.doc.schema": "this is (not ddl",
            }
        )


# ---------------------------------------------------------------- extensions
def _chain(props):
    from iceberg_kafka_connect_spark.config import parse_transform_chain

    return parse_transform_chain(props)


def test_extension_smt_chain_scrub_score_split(spark):
    """LLM-pipeline operators compose through the same transforms.<name>
    config slot as the reference SMT ports."""
    df = spark.createDataFrame(
        [(1, "contact me at bob@example.com please"), (2, "the of and plain text here")],
        "doc_id long, text string",
    )
    chain = _chain(
        {
            "transforms": "scrub,lang,split",
            "transforms.scrub.type": "PiiScrubTransform",
            "transforms.lang.type": "LanguageIdTransform",
            "transforms.split.type": "SplitAssignTransform",
            "transforms.split.key.field": "doc_id",
        }
    )
    out = df
    for t in chain:
        out = t(out)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert "bob@example.com" not in rows[1]["text"]
    assert rows[2]["lang_pred"] == "en"
    assert set(out.columns) >= {"text", "lang_pred", "split"}
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())


def test_extension_smt_token_stats_and_sample(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("three word text").alias("text")
    )
    chain = _chain(
        {
            "transforms": "tok,samp",
            "transforms.tok.type": "TokenStatsTransform",
            "transforms.samp.type": "HashSampleTransform",
            "transforms.samp.key.field": "doc_id",
            "transforms.samp.hex.threshold": "4",  # ~1/4 keep rate
        }
    )
    out = df
    for t in chain:
        out = t(out)
    n = out.count()
    assert 150 < n < 350  # ~250 expected, deterministic per key
    assert out.filter(F.col("n_words") != 3).count() == 0
    # deterministic: same chain, same rows
    out2 = df
    for t in chain:
        out2 = t(out2)
    assert out2.exceptAll(out).count() == 0


def test_extension_smt_bad_splits_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="splits"):
        _chain(
            {
                "transforms": "s",
                "transforms.s.type": "SplitAssignTransform",
                "transforms.s.key.field": "doc_id",
                "transforms.s.splits": "train-0.8",
            }
        )


def test_json_variant_columns_typed_paths(spark):
    from iceberg_kafka_connect_spark.transforms.json_to_map import (
        json_variant_columns,
    )

    df = spark.createDataFrame(
        [
            ('{"k": 7, "tags": ["x", "y"], "meta": {"depth": 2}}',),
            ('{"k": "8"}',),          # variant_get casts string → bigint
            ('{"other": true}',),     # missing path → NULL
            ("not json {",),          # malformed payload → NULL, not error
            (None,),                   # null payload → NULL
        ],
        ["props"],
    )
    out = json_variant_columns(
        "props",
        {
            "k": ("$.k", "bigint"),
            "first_tag": ("$.tags[0]", "string"),
            "depth": ("$.meta.depth", "int"),
        },
    )(df)
    rows = out.select("k", "first_tag", "depth").collect()
    assert [tuple(r) for r in rows] == [
        (7, "x", 2),
        (8, None, None),
        (None, None, None),
        (None, None, None),
        (None, None, None),
    ]
    # stays JVM-side: no Python evaluation in the plan
    from iceberg_kafka_connect_spark.plans import assert_plan

    assert_plan(out, absent=["BatchEvalPython", "ArrowEvalPython"])
