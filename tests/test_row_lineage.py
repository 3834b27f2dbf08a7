"""Iceberg v3 row lineage: commit-time first_row_id ranges, read-time
derivation, stability across deletes and rewrites (materialization)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

V3 = {"format-version": "3"}  # lineage is a v3 feature

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _ordered_append(spark, t, lo, hi):
    t.append(
        spark.range(lo, hi)
        .coalesce(1)
        .sortWithinPartitions("id")
        .select("id", (F.col("id") * 10).alias("v"))
    )


def test_row_ids_are_dense_and_stable(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 100)
    _ordered_append(spark, t, 100, 250)
    got = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    # single sorted file per append → _row_id == id here
    assert got == {i: i for i in range(250)}
    # manifests record the claimed ranges; the counter only grows
    files, _ = t.live_files()
    assert sorted(f["first_row_id"] for f in files) == [0, 100]
    assert t.metadata()["next-row-id"] == 250


def test_row_ids_survive_deletes_and_new_rows_get_fresh_ids(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t2"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 200)
    t.delete_where_positions(spark, "id % 7 = 0")
    # survivors keep their ids; the deleted ids are never reused
    got = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    assert got == {i: i for i in range(200) if i % 7 != 0}
    _ordered_append(spark, t, 200, 260)
    got2 = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    assert all(got2[i] == i for i in range(200, 260))


def test_row_ids_survive_compaction_materialized(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t3"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 120)
    _ordered_append(spark, t, 120, 300)
    t.delete_where_positions(spark, "id % 5 = 1")
    before = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in t.read_with_lineage(spark).collect()
    }
    t.compact(spark)
    after = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in t.read_with_lineage(spark).collect()
    }
    assert after == before  # ids AND update-seq preserved across rewrite
    # plain reads never see the materialized lineage columns
    assert t.read(spark).columns == ["id", "v"]


def test_row_ids_survive_binpack(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t4"), SCHEMA, properties=V3)
    for lo in (0, 40, 80, 120):
        _ordered_append(spark, t, lo, lo + 40)
    before = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    assert t.rewrite_small_files(spark, min_file_size=10**9) is not None
    after = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    assert after == before


def test_lineage_seq_tracks_file_sequence(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t5"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 10)  # seq 1
    _ordered_append(spark, t, 10, 20)  # seq 2
    rows = t.read_with_lineage(spark).collect()
    seqs = {r.id: r._last_updated_sequence_number for r in rows}
    assert all(seqs[i] == 1 for i in range(10))
    assert all(seqs[i] == 2 for i in range(10, 20))


def test_appends_between_with_lineage(spark, tmp_path):
    """Incremental consumers get stable _row_id per polled increment: the
    second poll's ids continue exactly where the first left off."""
    t = LakehouseTable.create(str(tmp_path / "t6"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 50)
    s1 = t.current_snapshot()["snapshot_id"]
    _ordered_append(spark, t, 50, 90)
    inc1 = {
        r.id: r._row_id
        for r in t.appends_between(spark, None, s1, with_lineage=True).collect()
    }
    assert inc1 == {i: i for i in range(50)}
    inc2 = {
        r.id: r._row_id
        for r in t.appends_between(spark, s1, with_lineage=True).collect()
    }
    assert inc2 == {i: i for i in range(50, 90)}
    # default shape unchanged
    assert t.appends_between(spark, s1).columns == ["id", "v"]

def test_v2_default_has_no_lineage(spark, tmp_path):
    """format-version defaults to 2: no next-row-id claiming, no lineage
    columns materialized by rewrites, and lineage reads fail loudly."""
    import pytest

    t = LakehouseTable.create(str(tmp_path / "v2"), SCHEMA)
    _ordered_append(spark, t, 0, 40)
    _ordered_append(spark, t, 40, 80)
    assert "next-row-id" not in t.metadata()
    files, _ = t.live_files()
    assert all("first_row_id" not in f for f in files)
    with pytest.raises(ValueError, match="format-version 3"):
        t.read_with_lineage(spark)
    with pytest.raises(ValueError, match="format-version 3"):
        t.appends_between(spark, None, with_lineage=True)
    # the rewrite pays no lineage tax: output files carry only the schema
    t.compact(spark)
    out = spark.read.parquet(
        *[f["path"] if f["path"].startswith("/") else t.root + "/" + f["path"]
          for f in t.live_files()[0]]
    )
    assert sorted(out.columns) == ["id", "v"]
    assert out.count() == 80


def test_v2_to_v3_upgrade(spark, tmp_path):
    """Upgrading claims ranges for NEW files only; pre-upgrade rows read
    NULL ids (the spec's 'unknown')."""
    t = LakehouseTable.create(str(tmp_path / "up"), SCHEMA)
    _ordered_append(spark, t, 0, 30)
    t.set_properties({"format-version": "3"})
    _ordered_append(spark, t, 30, 60)
    got = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    assert all(got[i] is None for i in range(30))
    assert {i: got[i] for i in range(30, 60)} == {
        i: i - 30 for i in range(30, 60)
    }
    assert t.metadata()["next-row-id"] == 30


def test_changelog_with_lineage(spark, tmp_path):
    """changes_between(with_lineage=True): inserts carry the ids they
    create, position-delete rows the ids they kill, equality deletes
    stay key-only with NULL ids; v2 tables raise."""
    import pytest

    t = LakehouseTable.create(str(tmp_path / "cl"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 50)
    s1 = t.current_snapshot()["snapshot_id"]
    _ordered_append(spark, t, 50, 80)
    t.delete_where_positions(spark, "id % 7 = 0")
    rows = sorted(
        (r.id, r._change_type, r._row_id)
        for r in t.changes_between(spark, s1, with_lineage=True).collect()
    )
    ins = [(i, rid) for i, ct, rid in rows if ct == "insert"]
    dels = [(i, rid) for i, ct, rid in rows if ct == "delete"]
    assert ins == [(i, i) for i in range(50, 80)]
    assert dels == [(i, i) for i in range(80) if i % 7 == 0]
    # equality delete rows carry NULL lineage (key-only by design)
    t.delete_where(spark, "id = 55", key_cols=["id"])
    eq = [
        r
        for r in t.changes_between(spark, s1, with_lineage=True).collect()
        if r._change_type == "delete" and r.id == 55 and r.v is None
    ]
    assert len(eq) == 1 and eq[0]._row_id is None
    v2 = LakehouseTable.create(str(tmp_path / "clv2"), SCHEMA)
    _ordered_append(spark, v2, 0, 5)
    with pytest.raises(ValueError, match="format-version 3"):
        v2.changes_between(spark, None, with_lineage=True)


def test_changelog_stream_with_lineage(spark, tmp_path):
    """ChangelogStream(with_lineage=True) threads ids through batches and
    refuses to hop a rewrite via snapshot_diff."""
    import pytest

    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        ChangelogStream,
    )

    t = LakehouseTable.create(str(tmp_path / "cs"), SCHEMA, properties=V3)
    _ordered_append(spark, t, 0, 40)
    stream = ChangelogStream(
        t,
        str(tmp_path / "ckpt"),
        on_rewrite="diff",
        with_lineage=True,
    )
    [snap] = stream.pending()
    batch = stream._changes(spark, None, snap["snapshot_id"])
    got = sorted((r.id, r._row_id) for r in batch.collect())
    assert got == [(i, i) for i in range(40)]
    t.compact(spark)
    [rw] = stream.pending(since=snap["snapshot_id"])
    with pytest.raises(ValueError, match="change identity"):
        stream._changes(spark, snap["snapshot_id"], rw["snapshot_id"])


def test_pipeline_lineage_sync_keeps_dst_schema_clean(spark, tmp_path):
    """A lineage-enabled changelog sync never leaks _row_id columns into
    the destination table's data schema."""
    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        ChangelogStream,
    )

    src = LakehouseTable.create(
        str(tmp_path / "lsync_src"), SCHEMA, properties=V3
    )
    _ordered_append(spark, src, 0, 30)
    src.delete_where_positions(spark, "id % 5 = 0")
    dst = LakehouseTable.create(str(tmp_path / "lsync_dst"), SCHEMA)
    stream = ChangelogStream(
        src, str(tmp_path / "lsync_ck"), with_lineage=True
    )
    applied = stream.sync_to_table(spark, dst, key_cols=["id"])
    assert applied == 2
    assert sorted(dst.read(spark).columns) == ["id", "v"]
    assert {r.id for r in dst.read(spark).collect()} == {
        i for i in range(30) if i % 5 != 0
    }
