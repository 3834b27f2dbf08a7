"""Glue catalog (SigV4-signed client + verifying stub): pointer
round-trips, VersionId optimistic locking, connector-config path."""

from __future__ import annotations

import pytest

from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
    UnsupportedCatalogError,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.glue_catalog import GlueCatalog
from iceberg_kafka_connect_spark.sinks.glue_server import GlueServer
from iceberg_kafka_connect_spark.sinks.table import CommitConflict

AK, SK = "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


@pytest.fixture()
def srv():
    with GlueServer(access_key=AK, secret_key=SK) as s:
        yield s


def _cat(srv, tmp_path):
    return GlueCatalog(
        srv.uri,
        warehouse=str(tmp_path / "wh"),
        access_key=AK,
        secret_key=SK,
    )


def test_roundtrip_and_version_lock(spark, srv, tmp_path):
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 60).selectExpr("id", "id % 3 v")
    t = cat.create_table("db.g", df.schema)
    t.append(df)
    assert cat.load_table("db.g").read(spark).count() == 60
    loc, meta = cat.load_table_metadata("db.g")
    assert meta["properties"]["export.source-version"] == str(
        t.current_version()
    )
    # VersionId optimistic lock: a commit carrying the pre-append
    # version must fail with ConcurrentModificationException
    stale = cat._get("db", "g")
    t.append(spark.range(100, 110).selectExpr("id", "id % 3 v"))
    cat.load_table("db.g")  # republish bumps the version
    with pytest.raises(CommitConflict):
        cat._publish(t, "db", "g", stale)
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.g", df.schema)
    assert cat.list_tables("db") == ["db.g"]
    cat.rename_table("db.g", "db.g2")
    assert cat.list_tables("db") == ["db.g2"]
    cat.drop_table("db.g2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.g2")


def test_signature_verified(tmp_path):
    with GlueServer(access_key=AK, secret_key=SK) as s:
        bad = GlueCatalog(
            s.uri, warehouse=str(tmp_path / "w"),
            access_key=AK, secret_key="nope",
        )
        with pytest.raises(RuntimeError, match="403"):
            bad._call("GetDatabase", {"Name": "default"})


def test_connector_config_path(spark, srv, tmp_path):
    cat = catalog_from_properties(
        {
            "iceberg.catalog.type": "glue",
            "iceberg.catalog.uri": srv.uri,
            "iceberg.catalog.warehouse": str(tmp_path / "wh"),
            "iceberg.catalog.s3.access-key-id": AK,
            "iceberg.catalog.s3.secret-access-key": SK,
        }
    )
    assert isinstance(cat, GlueCatalog)
    df = spark.range(0, 5).selectExpr("id")
    cat.create_table("default.cfg", df.schema)
    assert cat.table_exists("default.cfg")
    # without a uri the missing-runtime contract still holds
    with pytest.raises(UnsupportedCatalogError, match="endpoint"):
        catalog_from_properties({"iceberg.catalog.type": "glue"})
