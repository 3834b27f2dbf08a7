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


def test_rest_namespace_listing_is_level_scoped(tmp_path):
    """Spec semantics: GET /v1/namespaces returns top-level only;
    ?parent= returns direct children; deleting a namespace holding an
    empty CHILD namespace is a 409, not a recursive rmtree."""
    from iceberg_kafka_connect_spark.sinks.rest_catalog import (
        RestCatalogError,
    )

    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        cat = RestCatalog(srv.uri)
        cat._ensure_namespace("prod")
        cat._ensure_namespace("prod.eu")
        cat._ensure_namespace("prod.eu.sales")
        cat._ensure_namespace("dev")
        assert cat.list_namespaces() == ["dev", "prod"]
        assert cat.list_namespaces("prod") == ["prod.eu"]
        assert cat.list_namespaces("prod.eu") == ["prod.eu.sales"]
        assert cat.all_namespaces() == [
            "dev",
            "prod",
            "prod.eu",
            "prod.eu.sales",
        ]
        with pytest.raises(RestCatalogError) as ei:
            cat._request("GET", "/v1/namespaces?parent=nope")
        assert ei.value.code == 404
        # parent with children refuses deletion; leaf deletes fine
        with pytest.raises(RestCatalogError) as ei:
            cat._request("DELETE", "/v1/namespaces/prod.eu")
        assert ei.value.code == 409
        cat._request("DELETE", "/v1/namespaces/prod.eu.sales")
        cat._request("DELETE", "/v1/namespaces/prod.eu")
        assert cat.all_namespaces() == ["dev", "prod"]


def test_update_schema_nested_column_gets_unique_ids(spark, tmp_path):
    """A newly added struct column's NESTED field ids must not collide
    with served ids (the positional draft numbering would)."""
    from pyspark.sql import types as T

    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        cat = RestCatalog(srv.uri)
        cat.create_table("db.n", SCHEMA)
        wider = T.StructType(
            list(SCHEMA.fields)
            + [
                T.StructField(
                    "meta",
                    T.StructType(
                        [
                            T.StructField("k", T.StringType()),
                            T.StructField("w", T.LongType()),
                        ]
                    ),
                )
            ]
        )
        cat.update_schema("db.n", wider)
        _, meta = cat.load_table_metadata("db.n")
        sch = next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )

        ids = []

        def walk(node):
            if isinstance(node, dict):
                for k in ("id", "element-id", "key-id", "value-id"):
                    if isinstance(node.get(k), int):
                        ids.append(node[k])
                for k in ("fields", "element", "key", "value", "type"):
                    v = node.get(k)
                    if isinstance(v, list):
                        for c in v:
                            walk(c)
                    elif isinstance(v, dict):
                        walk(v)

        walk(sch)
        assert len(ids) == len(set(ids)), f"duplicate field ids: {ids}"
        assert "meta" in [f["name"] for f in sch["fields"]]
        # evolution INSIDE the existing struct also lands: add meta.extra
        wider2 = T.StructType(
            list(SCHEMA.fields)
            + [
                T.StructField(
                    "meta",
                    T.StructType(
                        [
                            T.StructField("k", T.StringType()),
                            T.StructField("w", T.LongType()),
                            T.StructField("extra", T.DoubleType()),
                        ]
                    ),
                )
            ]
        )
        cat.update_schema("db.n", wider2)
        t = cat.load_table("db.n")
        meta_f = next(
            f for f in t.schema().fields if f.name == "meta"
        )
        assert "extra" in [c.name for c in meta_f.dataType.fields]
        # nested ids still unique after the nested addition
        _, meta2 = cat.load_table_metadata("db.n")
        sch2 = next(
            s
            for s in meta2["schemas"]
            if s["schema-id"] == meta2["current-schema-id"]
        )
        ids.clear()
        walk(sch2)
        assert len(ids) == len(set(ids)), f"dup ids after nested add: {ids}"
