"""Catalog.registerTable parity across all three executable catalogs:
adopt an existing Iceberg metadata tree — directory, REST (spec
/register endpoint), and JDBC. Zero data copy: files referenced in
place (iceberg_import)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.catalog import (
    Catalog,
    TableAlreadyExistsError,
)
from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.jdbc_catalog import JdbcCatalog
from iceberg_kafka_connect_spark.sinks.rest_catalog import RestCatalog
from iceberg_kafka_connect_spark.sinks.rest_server import IcebergRestServer
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture()
def exported(spark, tmp_path):
    """An external table + its exported metadata tree (with a delete, so
    merge-on-read must survive adoption)."""
    t = LakehouseTable.create(str(tmp_path / "external"), SCHEMA)
    t.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], SCHEMA)
    )
    t.delete_where(spark, "id >= 8", ["id"])
    return export_iceberg_metadata(t)


def _check(spark, table):
    assert {r.id for r in table.read(spark).collect()} == set(range(8))


def test_register_into_directory_catalog(spark, tmp_path, exported):
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.register_table("db.adopted", exported)
    _check(spark, t)
    _check(spark, cat.load_table("db.adopted"))
    with pytest.raises(TableAlreadyExistsError):
        cat.register_table("db.adopted", exported)


def test_register_over_rest(spark, tmp_path, exported):
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        cat = RestCatalog(srv.uri)
        t = cat.register_table("db.adopted", exported)
        _check(spark, t)
        # adopted table is fully catalog-managed: served metadata current
        _, meta = cat.load_table_metadata("db.adopted")
        assert meta["current-snapshot-id"] is not None
        with pytest.raises(TableAlreadyExistsError):
            cat.register_table("db.adopted", exported)


def test_register_over_jdbc(spark, tmp_path, exported):
    cat = JdbcCatalog(
        str(tmp_path / "cat.sqlite"), warehouse=str(tmp_path / "wh")
    )
    t = cat.register_table("db.adopted", exported)
    _check(spark, t)
    _check(spark, cat.load_table("db.adopted"))
    with pytest.raises(TableAlreadyExistsError):
        cat.register_table("db.adopted", exported)
