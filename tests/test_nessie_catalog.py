"""Nessie catalog (client + in-process REST v2 service): pointer
round-trips, key-level CAS, catalog-level branches/tags/merge."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.nessie_catalog import NessieCatalog
from iceberg_kafka_connect_spark.sinks.nessie_server import (
    NessieConflict,
    NessieServer,
    _Store,
)
from iceberg_kafka_connect_spark.sinks.table import CommitConflict


@pytest.fixture()
def srv():
    with NessieServer() as s:
        yield s


def _cat(srv, tmp_path, ref="main"):
    return NessieCatalog(srv.uri, warehouse=str(tmp_path / "wh"), ref=ref)


# ------------------------------------------------------------------- store
def test_store_key_level_cas():
    s = _Store()
    h0 = s.ref("main")["hash"]
    s.commit("main", h0, {"db.a": {"v": 1}}, {})
    # a commit expecting h0 but touching a DIFFERENT key rebases fine
    s.commit("main", h0, {"db.b": {"v": 2}}, {})
    # …but touching the SAME key conflicts
    with pytest.raises(NessieConflict, match="db.a"):
        s.commit("main", h0, {"db.a": {"v": 9}}, {})


def test_store_merge_takes_source_changes_and_conflicts():
    s = _Store()
    h0 = s.ref("main")["hash"]
    s.commit("main", h0, {"db.a": {"v": 1}, "db.b": {"v": 1}}, {})
    base = s.ref("main")["hash"]
    s.create_ref("dev", "BRANCH", base)
    s.commit("dev", None, {"db.a": {"v": 2}}, {})
    s.commit("main", None, {"db.b": {"v": 3}}, {})
    s.merge("main", "dev", None)
    state = s._resolve(s.ref("main")["hash"])
    assert state["db.a"] == {"v": 2} and state["db.b"] == {"v": 3}
    # both sides touching db.a since base → conflict
    s.create_ref("dev2", "BRANCH", s.ref("main")["hash"])
    s.commit("dev2", None, {"db.a": {"v": 7}}, {})
    s.commit("main", None, {"db.a": {"v": 8}}, {})
    with pytest.raises(NessieConflict, match="db.a"):
        s.merge("main", "dev2", None)


def test_commit_to_tag_rejected():
    s = _Store()
    s.create_ref("rel", "TAG", s.ref("main")["hash"])
    with pytest.raises(ValueError, match="not a branch"):
        s.commit("rel", None, {"k": {"v": 1}}, {})


# ----------------------------------------------------------------- catalog
def test_catalog_roundtrip_via_properties(spark, srv, tmp_path):
    cat = catalog_from_properties(
        {
            "iceberg.catalog.type": "nessie",
            "iceberg.catalog.uri": srv.uri,
            "iceberg.catalog.warehouse": str(tmp_path / "wh"),
        }
    )
    assert isinstance(cat, NessieCatalog)
    df = spark.range(0, 100).selectExpr("id", "id % 5 v")
    t = cat.create_table("db.t", df.schema)
    t.append(df)
    assert cat.table_exists("db.t")
    got = cat.load_table("db.t").read(spark)
    assert got.count() == 100
    # the published pointer is a real metadata.json with the data state
    loc, meta = cat.load_table_metadata("db.t")
    assert meta["format-version"] in (2, 3)
    assert meta["properties"]["export.source-version"]
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.t", df.schema)
    assert cat.list_tables() == ["db.t"]
    cat.rename_table("db.t", "db.t2")
    assert cat.list_tables() == ["db.t2"]
    cat.drop_table("db.t2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.t2")


def test_sync_on_read_republish(spark, srv, tmp_path):
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 50).selectExpr("id", "id v")
    t = cat.create_table("db.s", df.schema)
    loc1 = cat._content("db.s")["metadataLocation"]
    t.append(df)  # live table moves past the published pointer
    cat.load_table("db.s")  # sync-on-read republishes
    loc2 = cat._content("db.s")["metadataLocation"]
    assert loc1 != loc2
    with open(loc2.removeprefix("file://")) as f:
        meta = json.load(f)
    assert meta["properties"]["export.source-version"] == str(
        t.current_version()
    )


def test_branch_isolation_and_merge(spark, srv, tmp_path):
    """The versioned-catalog value: a branch freezes EVERY table pointer;
    merge publishes the branch's moves atomically on main."""
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 30).selectExpr("id", "id v")
    t = cat.create_table("db.m", df.schema)
    t.append(df)
    cat.load_table("db.m")  # publish the appended state on main
    cat.create_branch("audit")
    audit = cat.on_ref("audit")
    # branch work: more data published only on the audit ref
    t.append(spark.range(100, 130).selectExpr("id", "id v"))
    audit.load_table("db.m")  # republish lands on audit
    # main still serves the frozen pointer
    main_loc = cat._content("db.m")["metadataLocation"]
    audit_loc = audit._content("db.m")["metadataLocation"]
    assert main_loc != audit_loc
    cat.merge("audit")
    assert cat._content("db.m")["metadataLocation"] == audit_loc


def test_concurrent_disjoint_commits_land(spark, srv, tmp_path):
    """Two writers on DIFFERENT tables never contend (key-level CAS)."""
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 10).selectExpr("id", "id v")
    cat.create_table("db.a", df.schema)
    head = cat._head()
    # both commits claim the same expectedHash but touch disjoint keys
    cat._commit(
        [cat._put_op("db.x", {"type": "ICEBERG_TABLE", "id": "1",
                              "metadataLocation": "file:///x"})],
        "x",
        expected=head,
    )
    cat._commit(
        [cat._put_op("db.y", {"type": "ICEBERG_TABLE", "id": "2",
                              "metadataLocation": "file:///y"})],
        "y",
        expected=head,
    )
    assert set(cat.list_tables()) >= {"db.x", "db.y"}
    # same key from the stale hash → CommitConflict
    with pytest.raises(CommitConflict):
        cat._commit(
            [cat._put_op("db.x", {"type": "ICEBERG_TABLE", "id": "3",
                                  "metadataLocation": "file:///z"})],
            "stale",
            expected=head,
        )


def test_register_table_adopts_external_tree(spark, srv, tmp_path):
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
    )
    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    src = LakehouseTable.create(
        str(tmp_path / "ext"), spark.range(1).selectExpr("id").schema
    )
    src.append(spark.range(0, 40).selectExpr("id"))
    out = export_iceberg_metadata(src)
    cat = _cat(srv, tmp_path)
    t = cat.register_table("db.adopted", out)
    assert t.read(spark).count() == 40
    assert cat.list_tables() == ["db.adopted"]


def test_bearer_token_auth(tmp_path):
    with NessieServer(token="s3cr3t") as s:
        with pytest.raises(RuntimeError, match="401"):
            NessieCatalog(s.uri, warehouse=str(tmp_path / "w"))
        NessieCatalog(s.uri, warehouse=str(tmp_path / "w"), token="s3cr3t")


def test_history_records_operations(spark, srv, tmp_path):
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 5).selectExpr("id")
    cat.create_table("db.h", df.schema)
    cat.drop_table("db.h")
    log = cat.history()
    ops = [(o["type"], ".".join(o["key"]["elements"]))
           for e in log for o in e["operations"]]
    assert ("PUT", "db.h") in ops and ("DELETE", "db.h") in ops


def test_store_remerge_is_idempotent():
    """Re-merging the same branch (and merging content-identical keys)
    is a no-op, never a conflict — Nessie's content-aware merge."""
    s = _Store()
    s.commit("main", None, {"db.a": {"v": 1}}, {})
    s.create_ref("dev", "BRANCH", s.ref("main")["hash"])
    s.commit("dev", None, {"db.a": {"v": 2}}, {})
    h1 = s.merge("main", "dev", None)["hash"]
    h2 = s.merge("main", "dev", None)["hash"]  # no-op, no conflict
    assert h1 == h2
    assert s._resolve(h2)["db.a"] == {"v": 2}
    # new work on dev after the merge still lands
    s.commit("dev", None, {"db.b": {"v": 9}}, {})
    s.merge("main", "dev", None)
    assert s._resolve(s.ref("main")["hash"])["db.b"] == {"v": 9}


def test_published_snapshot_id_matches_exported_metadata(
    spark, srv, tmp_path
):
    """The ICEBERG_TABLE content's snapshotId must equal the published
    metadata.json's current-snapshot-id — a Nessie-aware reader
    cross-checks the two (internal sequence numbers are NOT what the
    exporter writes as snapshot ids)."""
    cat = _cat(srv, tmp_path)
    t = cat.create_table(
        "db.snapid", spark.range(3).selectExpr("id", "id v").schema
    )
    t.append(spark.range(3).selectExpr("id", "id v"))
    cat.load_table("db.snapid")  # republish after the append
    content = cat._content(cat._key("db.snapid"))
    loc, meta = cat.load_table_metadata("db.snapid")
    assert content["snapshotId"] == meta["current-snapshot-id"]
    assert content["snapshotId"] in {
        s["snapshot-id"] for s in meta["snapshots"]
    }
