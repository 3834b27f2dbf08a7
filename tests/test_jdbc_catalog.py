"""JDBC catalog: Iceberg's SQL-pointer protocol on sqlite3.

Reference parity: ``iceberg.catalog.type=jdbc`` →
CatalogUtil.buildIcebergCatalog → JdbcCatalog (data/Utilities.java:68-121);
the protocol is the public two-table schema from apache/iceberg
``jdbc/JdbcUtil.java`` and a single-UPDATE compare-and-swap per commit."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
    UnsupportedCatalogError,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.jdbc_catalog import (
    JdbcCatalog,
    parse_jdbc_uri,
)
from iceberg_kafka_connect_spark.sinks.table import CommitConflict

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture()
def cat(tmp_path):
    return JdbcCatalog(
        str(tmp_path / "catalog.sqlite"), warehouse=str(tmp_path / "wh")
    )


def _rows(n, base=0):
    return [(base + i, f"v{base + i}") for i in range(n)]


def test_parse_jdbc_uri_variants(tmp_path):
    p = str(tmp_path / "db.sqlite")
    assert parse_jdbc_uri(f"jdbc:sqlite:{p}") == p
    assert parse_jdbc_uri(f"jdbc:sqlite:file:{p}") == p
    assert parse_jdbc_uri(f"sqlite:{p}") == p
    assert parse_jdbc_uri(p) == p
    with pytest.raises(UnsupportedCatalogError, match="postgresql"):
        parse_jdbc_uri("jdbc:postgresql://host/db")


def test_lifecycle_and_pointer_schema(spark, cat):
    t = cat.create_table("db.t", SCHEMA, properties={"owner": "jdbc"})
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    assert cat.table_exists("db.t")
    assert cat.list_tables() == ["db.t"]
    assert cat.list_namespaces() == ["db"]
    loaded = cat.load_table("db.t")
    assert loaded.properties()["owner"] == "jdbc"
    assert {r.id for r in loaded.read(spark).collect()} == set(range(10))
    # the stored row is the PUBLIC JdbcUtil schema, readable by raw SQL
    con = sqlite3.connect(cat.db_path)
    rows = con.execute(
        "SELECT catalog_name, table_namespace, table_name, "
        "metadata_location FROM iceberg_tables"
    ).fetchall()
    con.close()
    assert len(rows) == 1
    cname, ns, tname, loc = rows[0]
    assert (cname, ns, tname) == ("iceberg", "db", "t")
    assert loc.endswith(".metadata.json")
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.t", SCHEMA)
    cat.drop_table("db.t")
    assert not cat.table_exists("db.t")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.t")


def test_pointer_tracks_table_version(spark, cat):
    t = cat.create_table("db.v", SCHEMA)
    loc0, meta0 = cat.load_table_metadata("db.v")
    t.append(spark.createDataFrame(_rows(5), SCHEMA))
    # load_table republishes: the pointer now names NEW metadata whose
    # snapshot reflects the append
    loc1, meta1 = cat.load_table_metadata("db.v")
    assert loc1 != loc0
    assert meta1["current-snapshot-id"] != meta0.get("current-snapshot-id")
    # steady state: no table movement -> pointer stays put
    loc2, _ = cat.load_table_metadata("db.v")
    assert loc2 == loc1


def test_cas_swap_detects_racing_writer(spark, cat):
    t = cat.create_table("db.cas", SCHEMA)
    t.append(spark.createDataFrame(_rows(3), SCHEMA))
    ns_t = ("db", "cas")
    old = cat._pointer(*ns_t)
    # writer A publishes fresh metadata
    cat.publish("db.cas")
    # writer B still holds the OLD pointer — its swap must fail cleanly
    with pytest.raises(CommitConflict):
        cat._swap_pointer(*ns_t, old, "file:///stale/own.metadata.json")


def test_rename_moves_dir_and_republishes(spark, cat):
    t = cat.create_table("db.old", SCHEMA)
    t.append(spark.createDataFrame(_rows(4), SCHEMA))
    moved = cat.rename_table("db.old", "db2.new")
    assert moved.read(spark).count() == 4
    assert cat.list_tables() == ["db2.new"]
    # republished metadata points inside the NEW root (absolute URIs moved)
    loc, meta = cat.load_table_metadata("db2.new")
    assert "db2/new" in meta["location"]
    with pytest.raises(NoSuchTableError):
        cat.rename_table("db.old", "db2.other")


def test_namespace_properties(cat):
    cat.create_namespace("raw", {"owner": "ingest"})
    assert "raw" in cat.list_namespaces()
    assert cat.namespace_properties("raw") == {"owner": "ingest"}


def test_catalog_from_properties_jdbc_executable(spark, tmp_path):
    cat = catalog_from_properties(
        {
            "iceberg.catalog": "mycat",
            "iceberg.catalog.type": "jdbc",
            "iceberg.catalog.uri": f"jdbc:sqlite:{tmp_path}/cat.sqlite",
            "iceberg.catalog.warehouse": f"file://{tmp_path}/wh",
        }
    )
    assert isinstance(cat, JdbcCatalog)
    assert cat.name == "mycat"
    t = cat.create_table_if_not_exists("db.w", SCHEMA)
    t.append(spark.createDataFrame(_rows(6), SCHEMA))
    assert cat.load_table("db.w").read(spark).count() == 6


def test_missing_driver_stays_unsupported():
    with pytest.raises(UnsupportedCatalogError, match="mysql"):
        catalog_from_properties(
            {
                "iceberg.catalog.type": "jdbc",
                "iceberg.catalog.uri": "jdbc:mysql://host/db",
            }
        )


def test_external_engine_view_is_importable(spark, cat, tmp_path):
    """An engine that only follows the sqlite pointer (metadata_location)
    reconstructs the same rows via iceberg_import — the published
    metadata is self-sufficient."""
    from iceberg_kafka_connect_spark.sinks.iceberg_import import (
        import_iceberg_table,
    )

    t = cat.create_table("db.x", SCHEMA)
    t.append(spark.createDataFrame(_rows(8), SCHEMA))
    t.delete_where(spark, "id >= 6", ["id"])
    loc, _ = cat.load_table_metadata("db.x")
    imported = import_iceberg_table(loc, str(tmp_path / "imp"))
    assert {r.id for r in imported.read(spark).collect()} == set(range(6))


def test_rename_rolls_back_move_on_concurrent_change(
    spark, tmp_path, monkeypatch
):
    """r4 advice: if the pointer CAS loses (a concurrent publish moved the
    pointer between the directory move and the row UPDATE), the move must
    roll back — no dangling catalog row pointing at a moved-away
    location."""
    import os
    import shutil

    from iceberg_kafka_connect_spark.sinks import jdbc_catalog as jmod

    cat = JdbcCatalog(
        str(tmp_path / "cat.db"), warehouse=str(tmp_path / "wh")
    )
    t = cat.create_table("db.mv", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    old_root = t.root
    loc = cat._pointer("db", "mv")
    # a second, equally valid metadata file the "concurrent publisher"
    # points the row at mid-rename
    loc2_path = loc.removeprefix("file://") + ".racer"
    shutil.copyfile(loc.removeprefix("file://"), loc2_path)

    real_rename = os.rename

    def racing_rename(a, b):
        real_rename(a, b)
        if os.path.basename(b) != os.path.basename(old_root):
            # inject the race only on the FORWARD move, not the rollback
            con = sqlite3.connect(str(tmp_path / "cat.db"))
            con.execute(
                "UPDATE iceberg_tables SET metadata_location=? "
                "WHERE table_name='mv'",
                ("file://" + loc2_path,),
            )
            con.commit()
            con.close()

    monkeypatch.setattr(jmod.os, "rename", racing_rename)
    with pytest.raises(CommitConflict):
        cat.rename_table("db.mv", "db.mv2")
    monkeypatch.undo()
    # the data directory is back where the winning pointer expects it,
    # and the row still carries the concurrent publisher's location
    assert os.path.isdir(old_root)
    assert not os.path.isdir(os.path.join(str(tmp_path / "wh"), "db", "mv2"))
    assert cat._pointer("db", "mv") == "file://" + loc2_path


def test_rename_rollback_restores_version_hint(
    spark, tmp_path, monkeypatch
):
    """r5 advice: the aborted rename's export had already rewritten
    version-hint.text to the new_root metadata path (unlinked by the
    rollback) and left its tree-* subdirectory behind — the rollback must
    restore the hint to the previous metadata path and drop the aborted
    tree, so hint-based readers of the moved-back table keep working."""
    import os
    import re
    import shutil

    from iceberg_kafka_connect_spark.sinks import jdbc_catalog as jmod

    cat = JdbcCatalog(
        str(tmp_path / "cat.db"), warehouse=str(tmp_path / "wh")
    )
    t = cat.create_table("db.hv", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    old_root = t.root
    # materialize an export at the OLD location so a prior hint exists
    loc = cat._pointer("db", "hv")
    hint = os.path.join(old_root, "iceberg-metadata", "version-hint.text")
    with open(hint) as f:
        prev_hint = f.read()
    assert prev_hint == loc.removeprefix("file://")
    loc2_path = loc.removeprefix("file://") + ".racer"
    shutil.copyfile(loc.removeprefix("file://"), loc2_path)

    real_rename = os.rename

    def racing_rename(a, b):
        real_rename(a, b)
        if os.path.basename(b) != os.path.basename(old_root):
            con = sqlite3.connect(str(tmp_path / "cat.db"))
            con.execute(
                "UPDATE iceberg_tables SET metadata_location=? "
                "WHERE table_name='hv'",
                ("file://" + loc2_path,),
            )
            con.commit()
            con.close()

    monkeypatch.setattr(jmod.os, "rename", racing_rename)
    with pytest.raises(CommitConflict):
        cat.rename_table("db.hv", "db.hv2")
    monkeypatch.undo()
    # hint points at the pre-rename metadata path again (valid file)
    with open(hint) as f:
        restored = f.read()
    assert restored == prev_hint
    assert os.path.isfile(restored)
    # no aborted-export leftovers: every tree-* dir pairs with a
    # surviving metadata.json of the same version
    meta_dir = os.path.join(old_root, "iceberg-metadata")
    vers = {
        m.group(1)
        for p in os.listdir(meta_dir)
        if (m := re.match(r"(\d+)-[0-9a-f]+\.metadata\.json$", p))
    }
    for p in os.listdir(meta_dir):
        if m := re.match(r"tree-(\d+)-[0-9a-f]+$", p):
            assert m.group(1) in vers, f"orphan tree dir {p}"
