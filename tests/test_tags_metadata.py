"""Tags (immutable named refs), history/partitions metadata tables, and
catalog drop/rename — Iceberg surface parity."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _df(spark, lo, hi):
    return spark.createDataFrame([(i, f"v{i}") for i in range(lo, hi)], SCHEMA)


def test_tag_create_read_immutability(spark, catalog):
    t = catalog.create_table("default.tags", SCHEMA)
    s1 = t.append(_df(spark, 0, 10))
    t.create_tag("v1.0")
    t.append(_df(spark, 10, 20))
    assert t.read(spark).count() == 20
    assert t.read(spark, tag="v1.0").count() == 10
    assert t.tags() == {"v1.0": s1["snapshot_id"]}
    # immutable: re-tagging a different snapshot fails
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("v1.0")
    with pytest.raises(ValueError, match="no such tag"):
        t.read(spark, tag="nope")
    t.drop_tag("v1.0")
    assert t.tags() == {}


def test_tag_survives_snapshot_expiry(spark, catalog):
    t = catalog.create_table("default.tagexp", SCHEMA)
    t.append(_df(spark, 0, 5))
    t.create_tag("first")
    for i in range(1, 6):
        t.append(_df(spark, i * 5, i * 5 + 5))
    expired = t.expire_snapshots(keep_last=2)
    assert expired > 0
    # the tagged snapshot is retained and still readable (sealed if needed)
    assert t.read(spark, tag="first").count() == 5
    assert t.read(spark).count() == 30


def test_history_df(spark, catalog):
    t = catalog.create_table("default.hist", SCHEMA)
    s1 = t.append(_df(spark, 0, 5))
    s2 = t.append(_df(spark, 5, 10))
    t.rollback(s1["snapshot_id"])
    h = {r.snapshot_id: r for r in t.history_df(spark).collect()}
    assert h[s1["snapshot_id"]].is_current_ancestor
    assert not h[s2["snapshot_id"]].is_current_ancestor


def test_partitions_df(spark, catalog):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("b", T.LongType())]
    )
    t = catalog.create_table(
        "default.parts",
        schema,
        partition_by="b",
        properties={"write.distribution-mode": "hash"},
    )
    t.append(
        spark.createDataFrame([(i, i % 3) for i in range(90)], schema)
    )
    rows = {r.partition: r for r in t.partitions_df(spark).collect()}
    assert set(rows) == {"b=0", "b=1", "b=2"}
    assert all(r.n_files == 1 for r in rows.values())
    assert sum(r.n_rows for r in rows.values()) == 90


def test_catalog_drop_and_rename(spark, catalog):
    t = catalog.create_table("default.old", SCHEMA)
    t.append(_df(spark, 0, 7))
    t2 = catalog.rename_table("default.old", "default.new")
    assert t2.read(spark).count() == 7
    assert not catalog.table_exists("default.old")
    with pytest.raises(NoSuchTableError):
        catalog.rename_table("default.old", "default.x")
    catalog.create_table("default.other", SCHEMA)
    with pytest.raises(TableAlreadyExistsError):
        catalog.rename_table("default.new", "default.other")
    catalog.drop_table("default.new")
    assert not catalog.table_exists("default.new")
    with pytest.raises(NoSuchTableError):
        catalog.drop_table("default.new")


def test_source_mix_flattens_shares(spark):
    from iceberg_kafka_connect_spark.operators.text import source_mix_resample

    rows = [(i, "big") for i in range(2000)] + [
        (i + 10_000, "small") for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = source_mix_resample(docs, temperature=0.5)
    counts = {r.source: r.n for r in mixed.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # smallest source keeps everything
    assert counts["small"] == 200
    # big source thins toward sqrt ratio: expected keep ~ 2000*sqrt(200/2000)
    expected_big = 2000 * (200 / 2000) ** 0.5
    assert abs(counts["big"] - expected_big) / expected_big < 0.15
    # natural ratio 10:1 flattens to ~sqrt(10):1
    ratio = counts["big"] / counts["small"]
    assert 2.0 < ratio < 4.5


def test_expire_older_than_retains_recent(spark, catalog):
    import time as _time

    t = catalog.create_table("default.age", SCHEMA)
    for i in range(4):
        t.append(_df(spark, i * 5, i * 5 + 5))
    # cutoff before every snapshot: nothing beyond keep_last is old enough
    cutoff_past = int(_time.time() * 1000) - 3_600_000
    assert t.expire_snapshots(keep_last=1, older_than_ms=cutoff_past) == 0
    assert len(t.snapshots()) == 4
    # cutoff in the future: pure keep_last behavior
    cutoff_future = int(_time.time() * 1000) + 3_600_000
    assert t.expire_snapshots(keep_last=1, older_than_ms=cutoff_future) == 3
    assert t.read(spark).count() == 20


def test_refs_df(spark, catalog):
    t = catalog.create_table("default.refsmeta", SCHEMA)
    s1 = t.append(_df(spark, 0, 5))
    t.create_tag("v1")
    t.create_branch("audit")
    t.append(_df(spark, 5, 10))
    rows = {r.name: r for r in t.refs_df(spark).collect()}
    assert rows["main"].type == "BRANCH"
    assert rows["audit"].type == "BRANCH"
    assert rows["v1"].type == "TAG"
    # tag and branch stay at the first snapshot; main moved on
    assert rows["v1"].snapshot_id == s1["snapshot_id"]
    assert rows["audit"].snapshot_id == s1["snapshot_id"]
    assert rows["main"].snapshot_id != s1["snapshot_id"]
    assert rows["main"].sequence_number == 2


def test_all_files_df(spark, catalog):
    t = catalog.create_table("default.allfiles", SCHEMA)
    t.append(_df(spark, 0, 5))
    t.append(_df(spark, 5, 10))
    t.delete_where(spark, "id = 1", key_cols=["id"])
    af = t.all_files_df(spark)
    by_content = {
        r["content"]: r["n"]
        for r in af.groupBy("content").count().withColumnRenamed("count", "n").collect()
    }
    assert by_content["data"] >= 2
    assert by_content["equality-deletes"] >= 1
    # every adding snapshot is a real snapshot
    sids = {s["snapshot_id"] for s in t.snapshots()}
    assert {r.snapshot_id for r in af.collect()} <= sids


def test_metadata_log_df(spark, catalog):
    t = catalog.create_table("default.mlog", SCHEMA)
    t.append(_df(spark, 0, 5))
    t.append(_df(spark, 5, 10))
    log = t.metadata_log_df(spark).collect()
    assert [r.version for r in log] == sorted(r.version for r in log)
    assert len(log) == t.current_version() + 1 - log[0].version
    import os as _os

    assert all(_os.path.isfile(r.file) for r in log)


def test_delete_files_df(spark, catalog):
    t = catalog.create_table(
        "default.delfiles", SCHEMA, identifier_fields=["id"]
    )
    t.append(_df(spark, 0, 20))
    t.delete_where(spark, "id < 3", ["id"])          # equality deletes
    t.delete_where_positions(spark, "id >= 18")      # position deletes
    df = t.delete_files_df(spark).collect()
    kinds = {r.content for r in df}
    assert kinds == {"equality-deletes", "position-deletes"}
    eq = [r for r in df if r.content == "equality-deletes"]
    assert all(r.key_cols == ["id"] for r in eq)
    assert all(r.seq is not None and r.path for r in df)
    # compaction folds merge-on-read state -> no live delete files
    t.compact(spark)
    assert t.delete_files_df(spark).count() == 0
    assert t.read(spark).count() == 15


def test_entries_df_statuses(spark, catalog):
    t = catalog.create_table("default.entries", SCHEMA)
    t.append(_df(spark, 0, 10))
    t.append(_df(spark, 10, 20))
    before = {
        r.path for r in t.entries_df(spark).collect() if r.status == "added"
    }
    assert len(before) >= 2
    t.compact(spark)
    ent = t.entries_df(spark).collect()
    # the replace snapshot's own listing: rewritten output is `added` at
    # the new sequence; nothing in this history is carried with an older
    # seq unless compaction kept it
    latest_seq = max(r.snapshot_sequence for r in ent)
    latest = [r for r in ent if r.snapshot_sequence == latest_seq]
    assert latest and all(r.status in ("added", "existing") for r in latest)
    added_latest = [r for r in latest if r.status == "added"]
    assert added_latest, "replace snapshot lists its rewritten files"
    # every original append's rows remain visible as their own snapshots
    assert {r.status for r in ent} <= {"added", "existing"}
    assert t.read(spark).count() == 20


def test_position_deletes_df(spark, catalog):
    t = catalog.create_table("default.posdel", SCHEMA)
    t.append(_df(spark, 0, 20))
    t.delete_where_positions(spark, "id % 4 = 0")
    pd_rows = t.position_deletes_df(spark).collect()
    assert len(pd_rows) == 5  # ids 0,4,8,12,16
    assert all(r.file_path.startswith("/") and r.pos >= 0 for r in pd_rows)
    assert t.read(spark).count() == 15
    # the (file, pos) pairs are exactly the rows the scan now skips
    assert t.position_deletes_df(spark).count() == 20 - t.read(spark).count()
    # empty cases
    t2 = catalog.create_table("default.posdel2", SCHEMA)
    assert t2.position_deletes_df(spark).count() == 0


def test_manifests_df(spark, catalog):
    t = catalog.create_table("default.mfs", SCHEMA)
    t.append(_df(spark, 0, 30).repartition(2))
    t.append(_df(spark, 30, 40).coalesce(1))
    t.delete_where(spark, "id = 5", key_cols=["id"])
    df = t.manifests_df(spark)
    rows = df.collect()
    assert len(rows) == 3  # one per snapshot
    by_snap = {r.added_snapshot_id: r for r in rows}
    sids = [s["snapshot_id"] for s in t.metadata()["snapshots"]]
    assert set(by_snap) == set(sids)
    assert by_snap[sids[0]].added_data_files_count == 2
    assert by_snap[sids[1]].added_data_files_count == 1
    assert by_snap[sids[2]].added_delete_files_count >= 1
    assert all(r.length > 0 for r in rows if r.path)
