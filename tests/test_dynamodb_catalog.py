"""DynamoDB catalog (SigV4-signed client + verifying stub service):
pointer round-trips, version-conditional CAS, signature verification."""

from __future__ import annotations

import json

import pytest

from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.dynamodb_catalog import (
    DynamoDbCatalog,
)
from iceberg_kafka_connect_spark.sinks.dynamodb_server import (
    DynamoDbServer,
    sigv4_signature,
)
from iceberg_kafka_connect_spark.sinks.table import CommitConflict

AK, SK = "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


@pytest.fixture()
def srv():
    with DynamoDbServer(access_key=AK, secret_key=SK) as s:
        yield s


def _cat(srv, tmp_path):
    return DynamoDbCatalog(
        srv.uri,
        warehouse=str(tmp_path / "wh"),
        access_key=AK,
        secret_key=SK,
    )


def test_sigv4_known_answer():
    """AWS's published SigV4 derived-key example (public docs,
    'Signature Version 4 signing process — Example: signing key')."""
    sts = (
        "AWS4-HMAC-SHA256\n20150830T123600Z\n"
        "20150830/us-east-1/iam/aws4_request\n"
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"
    )
    got = sigv4_signature(SK, "20150830", "us-east-1", "iam", sts)
    assert got == (
        "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_signature_is_verified(tmp_path):
    with DynamoDbServer(access_key=AK, secret_key=SK) as s:
        with pytest.raises(RuntimeError, match="403"):
            DynamoDbCatalog(
                s.uri,
                warehouse=str(tmp_path / "w"),
                access_key=AK,
                secret_key="wrong-secret",
            )
        with pytest.raises(RuntimeError, match="403"):
            DynamoDbCatalog(s.uri, warehouse=str(tmp_path / "w"))
        DynamoDbCatalog(
            s.uri, warehouse=str(tmp_path / "w"),
            access_key=AK, secret_key=SK,
        )


def test_catalog_roundtrip(spark, srv, tmp_path):
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 80).selectExpr("id", "id % 4 v")
    t = cat.create_table("db.t", df.schema)
    t.append(df)
    assert cat.table_exists("db.t")
    assert cat.load_table("db.t").read(spark).count() == 80
    loc, meta = cat.load_table_metadata("db.t")
    assert meta["properties"]["export.source-version"] == str(
        t.current_version()
    )
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.t", df.schema)
    assert cat.list_tables("db") == ["db.t"]
    cat.rename_table("db.t", "db.t2")
    assert cat.list_tables("db") == ["db.t2"]
    cat.drop_table("db.t2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.t2")


def test_version_conditional_cas(spark, srv, tmp_path):
    """The optimistic lock: a swap conditioned on a stale version UUID
    fails the conditional check, exactly like Iceberg's DynamoDbCatalog."""
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 10).selectExpr("id")
    t = cat.create_table("db.c", df.schema)
    ns, tn = "db", "c"
    old = cat._pointer(ns, tn)
    t.append(df)
    cat.load_table("db.c")  # sync-on-read swaps the pointer (new v)
    with pytest.raises(CommitConflict):
        cat._swap_pointer(ns, tn, old[0], old[1], "file:///stale")


def test_connector_config_path(spark, srv, tmp_path):
    """The reference's route: catalog-impl=...DynamoDbCatalog resolves to
    the executable leg."""
    cat = catalog_from_properties(
        {
            "iceberg.catalog.catalog-impl": (
                "org.apache.iceberg.aws.dynamodb.DynamoDbCatalog"
            ),
            "iceberg.catalog.uri": srv.uri,
            "iceberg.catalog.warehouse": str(tmp_path / "wh"),
            "iceberg.catalog.s3.access-key-id": AK,
            "iceberg.catalog.s3.secret-access-key": SK,
        }
    )
    assert isinstance(cat, DynamoDbCatalog)
    df = spark.range(0, 5).selectExpr("id")
    cat.create_table("default.cfg", df.schema)
    assert cat.table_exists("default.cfg")


def test_pipeline_through_dynamodb_catalog(spark, srv, tmp_path):
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.config import SinkConfig, TableConfig
    from iceberg_kafka_connect_spark.sources.stream import (
        file_stream_source,
    )
    from iceberg_kafka_connect_spark.streaming import SinkPipeline

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    cat = _cat(srv, tmp_path)
    cfg = SinkConfig(
        tables=[TableConfig("default.events_sink")], auto_create=True
    )
    pipe = SinkPipeline(cat, cfg, "p-ddb", value_schema=schema)
    src = tmp_path / "src"
    src.mkdir(parents=True, exist_ok=True)
    with open(src / "c0.json", "w") as f:
        for i in range(8):
            f.write(
                json.dumps(
                    {
                        "key": str(i),
                        "value": json.dumps({"id": i, "payload": f"p{i}"}),
                        "topic": "events",
                        "partition": 0,
                        "offset": i,
                        "timestamp": "2024-01-01T00:00:00.000Z",
                    }
                )
                + "\n"
            )
    stream = file_stream_source(spark, str(src))
    q = pipe.start(stream, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    t = cat.load_table("default.events_sink")
    assert t.read(spark).count() == 8
    offs = json.loads(
        t.current_snapshot()["summary"]["kafka.connect.offsets"]
    )
    assert offs == {"events-0": 8}
