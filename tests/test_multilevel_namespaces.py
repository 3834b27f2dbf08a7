"""Multi-level namespaces (Iceberg SupportsNamespaces): a.b.c.table works
across the directory, REST (0x1F-separated URL segments), and JDBC
(dotted table_namespace, as JdbcUtil stores it) catalogs."""

from __future__ import annotations

from urllib.parse import quote

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.catalog import Catalog
from iceberg_kafka_connect_spark.sinks.jdbc_catalog import JdbcCatalog
from iceberg_kafka_connect_spark.sinks.rest_catalog import RestCatalog
from iceberg_kafka_connect_spark.sinks.rest_server import IcebergRestServer

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, n=5):
    return spark.createDataFrame([(i, f"v{i}") for i in range(n)], SCHEMA)


def test_directory_catalog_nested(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("prod.eu.sales.orders", SCHEMA)
    t.append(_df(spark))
    assert cat.table_exists("prod.eu.sales.orders")
    assert cat.list_tables() == ["prod.eu.sales.orders"]
    assert cat.load_table("prod.eu.sales.orders").read(spark).count() == 5
    moved = cat.rename_table("prod.eu.sales.orders", "prod.us.orders")
    assert moved.read(spark).count() == 5
    assert cat.list_tables() == ["prod.us.orders"]
    cat.drop_table("prod.us.orders")
    assert cat.list_tables() == []


def test_rest_nested_namespaces(spark, tmp_path):
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        cat = RestCatalog(srv.uri)
        t = cat.create_table("prod.eu.orders", SCHEMA)
        t.append(_df(spark))
        # namespace listing includes both levels; identifiers carry the
        # level list
        assert ["prod"] in srv._state.list_namespaces()
        assert ["prod", "eu"] in srv._state.list_namespaces()
        out = cat._request(
            "GET", f"/v1/namespaces/{quote('prod' + chr(0x1F) + 'eu')}/tables"
        )
        assert out["identifiers"] == [
            {"namespace": ["prod", "eu"], "name": "orders"}
        ]
        # a parent's listing does NOT claim the child's tables
        cat._request("POST", "/v1/namespaces", {"namespace": ["prod2"]})
        out = cat._request("GET", "/v1/namespaces/prod2/tables")
        assert out["identifiers"] == []
        assert cat.load_table("prod.eu.orders").read(spark).count() == 5
        assert cat.list_tables() == ["prod.eu.orders"]
        moved = cat.rename_table("prod.eu.orders", "prod2.orders")
        assert moved.read(spark).count() == 5


def test_jdbc_nested_namespaces(spark, tmp_path):
    import sqlite3

    cat = JdbcCatalog(
        str(tmp_path / "cat.sqlite"), warehouse=str(tmp_path / "wh")
    )
    t = cat.create_table("prod.eu.orders", SCHEMA)
    t.append(_df(spark))
    assert cat.load_table("prod.eu.orders").read(spark).count() == 5
    assert cat.list_tables() == ["prod.eu.orders"]
    con = sqlite3.connect(cat.db_path)
    ns = con.execute(
        "SELECT table_namespace FROM iceberg_tables"
    ).fetchone()[0]
    con.close()
    assert ns == "prod.eu"  # JdbcUtil's dotted storage form
