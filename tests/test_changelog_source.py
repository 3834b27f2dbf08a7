"""Streaming changelog source (streaming/changelog_source.py): resumable
per-snapshot CDC consumption with checkpointed resume — the read-side twin
of iceberg_sync_loop. The r5 verdict's bar: kill/restart mid-stream
replays no row and misses no row across append + delete snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable
from iceberg_kafka_connect_spark.streaming.changelog_source import (
    ChangelogStream,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk_src(spark, tmp_path):
    """3 snapshots: append, upsert (delete+insert), equality delete."""
    src = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    src.append(spark.createDataFrame([(i, f"a{i}") for i in range(6)], SCHEMA))
    src.upsert(
        spark.createDataFrame([(2, "B2"), (7, "B7")], SCHEMA),
        key_cols=["id"],
    )
    src.delete_where(spark, "id >= 4 AND id < 6", key_cols=["id"])
    return src


def test_per_snapshot_batches_and_generic_resume(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    stream = ChangelogStream(src, str(tmp_path / "ckpt"))
    assert [s["snapshot_id"] for s in stream.pending()] == [
        s["snapshot_id"] for s in src.snapshots()
    ]
    seen: list[tuple[str, list]] = []

    def on_batch(df, sid):
        seen.append(
            (sid, sorted((r.id, r._change_type) for r in df.collect()))
        )

    # consume one snapshot, then "restart" with a fresh stream object
    assert stream.process_available(spark, on_batch, max_snapshots=1) == 1
    stream2 = ChangelogStream(src, str(tmp_path / "ckpt"))
    assert stream2.process_available(spark, on_batch) == 2
    assert [s for s, _ in seen] == [
        s["snapshot_id"] for s in src.snapshots()
    ]
    # batch 1: the 6 inserts; batch 2: upsert = 2 deletes + 2 inserts;
    # batch 3: equality delete of ids 4,5
    assert seen[0][1] == [(i, "insert") for i in range(6)]
    assert seen[1][1] == [
        (2, "delete"),
        (2, "insert"),
        (7, "delete"),
        (7, "insert"),
    ]
    assert seen[2][1] == [(4, "delete"), (5, "delete")]
    # drained: nothing pending, a further poll is a no-op
    assert stream2.process_available(spark, on_batch) == 0


def test_kill_restart_table_sink_exactly_once(spark, tmp_path):
    """The worst-case crash window — AFTER the sink commit, BEFORE the
    local checkpoint write — must neither replay nor miss a row: the
    consumed snapshot id rides the sink commit itself, and resume trusts
    the sink's marker over the stale local file."""
    src = _mk_src(spark, tmp_path)
    dst = LakehouseTable.create(str(tmp_path / "dst"), SCHEMA)
    stream = ChangelogStream(src, str(tmp_path / "ckpt2"))

    real_commit = stream._commit_offset
    calls = {"n": 0}

    def crashing_commit(sid):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("killed between sink commit and checkpoint")
        real_commit(sid)

    stream._commit_offset = crashing_commit
    with pytest.raises(RuntimeError):
        stream.sync_to_table(spark, dst, key_cols=["id"])
    # crash landed after the 2nd sink commit: dst has the upsert applied
    # but the local checkpoint still points at snapshot 1
    assert len(dst.snapshots()) == 2
    ck = ChangelogStream(src, str(tmp_path / "ckpt2")).last_processed()
    assert ck == src.snapshots()[0]["snapshot_id"]
    # restart with a fresh stream: resumes from the SINK's marker
    stream3 = ChangelogStream(src, str(tmp_path / "ckpt2"))
    assert stream3.sync_to_table(spark, dst, key_cols=["id"]) == 1
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    assert got == want == [
        (0, "a0"),
        (1, "a1"),
        (2, "B2"),
        (3, "a3"),
        (7, "B7"),
    ]
    # one sink commit per source snapshot — no duplicate application
    assert len(dst.snapshots()) == len(src.snapshots())
    # drained
    assert stream3.sync_to_table(spark, dst, key_cols=["id"]) == 0


def test_callback_crash_replays_inflight_snapshot_only(spark, tmp_path):
    """Generic-callback mode is at-least-once: a crash INSIDE the callback
    replays exactly the in-flight snapshot (identical rows), never the
    already-checkpointed ones."""
    src = _mk_src(spark, tmp_path)
    stream = ChangelogStream(src, str(tmp_path / "ckpt3"))
    seen_first: list[str] = []

    def first(df, sid):
        df.collect()
        seen_first.append(sid)
        if len(seen_first) == 2:
            raise RuntimeError("consumer died mid-snapshot")

    with pytest.raises(RuntimeError):
        stream.process_available(spark, first)
    # restart: snapshot 2 replays (its callback never completed), 1 doesn't
    replayed: list[str] = []
    ChangelogStream(src, str(tmp_path / "ckpt3")).process_available(
        spark, lambda df, sid: replayed.append(sid)
    )
    sids = [s["snapshot_id"] for s in src.snapshots()]
    assert seen_first == sids[:2]
    assert replayed == sids[1:]


def test_history_rewrite_under_stream_is_detected(spark, tmp_path):
    """Compaction + expire rewrites ancestry; a checkpoint pointing at an
    expired snapshot must fail loudly, not silently re-deliver history."""
    src = _mk_src(spark, tmp_path)
    stream = ChangelogStream(src, str(tmp_path / "ckpt4"))
    stream.process_available(spark, lambda df, sid: df.collect(), max_snapshots=1)
    src.compact(spark)
    src.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="not an ancestor|rewritten"):
        ChangelogStream(src, str(tmp_path / "ckpt4")).pending()


def test_sync_replays_duplicate_key_appends_verbatim(spark, tmp_path):
    """An append can legitimately carry duplicate keys (appends never
    dedup); the sink must replay the snapshot verbatim — a per-key
    collapse would nondeterministically drop one of the rows."""
    src = LakehouseTable.create(str(tmp_path / "src2"), SCHEMA)
    src.append(
        spark.createDataFrame(
            [(5, "first"), (5, "second"), (6, "only")], SCHEMA
        )
    )
    dst = LakehouseTable.create(str(tmp_path / "dst2"), SCHEMA)
    stream = ChangelogStream(src, str(tmp_path / "ckpt5"))
    assert stream.sync_to_table(spark, dst, key_cols=["id"]) == 1
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    assert got == want == [(5, "first"), (5, "second"), (6, "only")]


def test_changelog_sync_loop_drains_and_stops(spark, tmp_path):
    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        changelog_sync_loop,
    )

    src = _mk_src(spark, tmp_path)
    dst = LakehouseTable.create(str(tmp_path / "dstL"), SCHEMA)
    stream = ChangelogStream(src, str(tmp_path / "ckptL"))
    out = changelog_sync_loop(
        stream,
        spark,
        dst,
        key_cols=["id"],
        poll_interval_s=0.01,
        stop_when_current=True,
    )
    assert out["synced"] == 3
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    assert got == want


def test_changelog_expresses_position_deletes_as_full_rows(spark, tmp_path):
    """Position-delete snapshots stream exactly: the changelog emits the
    FULL deleted rows (reconstructed from the referenced files by row
    identity), and sync_to_table applies them — previously these
    snapshots raised and CDC consumers had to full-diff."""
    src = LakehouseTable.create(str(tmp_path / "srcp"), SCHEMA)
    # duplicate keys on purpose — the case position deletes exist for
    src.append(
        spark.createDataFrame(
            [(1, "keep"), (2, "kill-a"), (2, "keep-b"), (3, "kill")],
            SCHEMA,
        )
    )
    src.delete_where_positions(spark, "v = 'kill-a' OR v = 'kill'")
    stream = ChangelogStream(src, str(tmp_path / "ckptp"))
    batches = []
    stream.process_available(
        spark,
        lambda df, sid: batches.append(
            sorted(
                (r.id, r.v, r._change_type) for r in df.collect()
            )
        ),
    )
    assert batches[0] == [
        (1, "keep", "insert"),
        (2, "keep-b", "insert"),
        (2, "kill-a", "insert"),
        (3, "kill", "insert"),
    ]
    # the position-delete snapshot emits the full deleted rows
    assert batches[1] == [(2, "kill-a", "delete"), (3, "kill", "delete")]


def test_stream_hops_over_compaction_with_snapshot_diff(spark, tmp_path):
    """A mid-history compaction no longer stalls the stream: with
    on_rewrite='diff' the replace snapshot's batch is the NET change
    across the rewrite (zero rows for a pure compaction) via
    snapshot_diff, and the synced table still converges to the source's
    final state. The default ('error') keeps the loud refusal."""
    src = LakehouseTable.create(str(tmp_path / "srk"), SCHEMA)
    src.append(spark.createDataFrame([(i, f"a{i}") for i in range(6)], SCHEMA))
    dst = LakehouseTable.create(str(tmp_path / "dstk"), SCHEMA)
    stream = ChangelogStream(
        src, str(tmp_path / "ckk"), on_rewrite="diff"
    )
    assert stream.sync_to_table(spark, dst, key_cols=["id"]) == 1
    # source history rewrites under the stream: delete + compact + append
    src.delete_where(spark, "id >= 4", key_cols=["id"])
    src.compact(spark)
    src.append(spark.createDataFrame([(10, "z")], SCHEMA))
    # default mode refuses at the replace snapshot
    strict = ChangelogStream(src, str(tmp_path / "ck_strict"))
    with pytest.raises(ValueError, match="rewrites history"):
        strict.process_available(spark, lambda df, sid: df.count())
    # diff mode hops it and converges
    assert stream.sync_to_table(spark, dst, key_cols=["id"]) == 3
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    assert got == want == [(0, "a0"), (1, "a1"), (2, "a2"), (3, "a3"), (10, "z")]
    # the compaction batch itself carried zero net changes
    sids = [s["snapshot_id"] for s in src.snapshots()]
    compaction_sid = sids[2]
    diff = src.snapshot_diff(spark, sids[1], compaction_sid)
    assert diff.count() == 0


def test_snapshot_diff_multiset_and_updates(spark, tmp_path):
    """snapshot_diff is a multiset diff: duplicate copies count, an
    update emits delete(old)+insert(new), and a from=None diff is the
    full insert set."""
    t = LakehouseTable.create(str(tmp_path / "sd"), SCHEMA)
    t.append(
        spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "x"), (2, "y")], SCHEMA
        )
    )
    a = t.current_snapshot()["snapshot_id"]
    # rewrite state across a compaction + upsert: one (1,x) copy survives
    t.delete_where_positions(spark, "id = 1")
    t.append(spark.createDataFrame([(1, "x")], SCHEMA))
    t.compact(spark)
    t.upsert(spark.createDataFrame([(2, "Y2")], SCHEMA), key_cols=["id"])
    changes = {
        (r.id, r.v, r._change_type)
        for r in t.snapshot_diff(spark, a).collect()
    }
    assert changes == {
        (1, "x", "delete"),  # 3 copies -> 1: net two delete rows (multiset)
        (2, "y", "delete"),
        (2, "Y2", "insert"),
    }
    n_del_1x = (
        t.snapshot_diff(spark, a)
        .filter("id = 1 AND _change_type = 'delete'")
        .count()
    )
    assert n_del_1x == 2
    # from=None: the whole current state as inserts
    full = t.snapshot_diff(spark, None)
    assert sorted((r.id, r.v, r._change_type) for r in full.collect()) == [
        (1, "x", "insert"),
        (2, "Y2", "insert"),
    ]


def test_config_driven_table_pipeline_kill_restart(spark, tmp_path):
    """A lakehouse table declared as the pipeline SOURCE via connector
    properties (ChangelogPipeline.from_properties): drain, kill, mutate
    the source (including a compaction with on-rewrite=diff), restart —
    exactly-once, same bar as the raw ChangelogStream tests."""
    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        ChangelogPipeline,
    )

    cat = Catalog(str(tmp_path / "wh"))
    src = cat.create_table("db.src", SCHEMA)
    src.append(spark.createDataFrame([(i, f"a{i}") for i in range(5)], SCHEMA))
    props = {
        "iceberg.source.table": "db.src",
        "iceberg.source.on-rewrite": "diff",
        "iceberg.tables": "db.dst",
        "iceberg.tables.default-id-columns": "id",
        "iceberg.tables.auto-create-enabled": "true",
        "iceberg.control.commit.interval-ms": "100",
    }
    ck = str(tmp_path / "ck")
    out = ChangelogPipeline.from_properties(cat, props, ck).run(
        spark, available_now=True
    )
    assert out["synced"] == 1
    dst = cat.load_table("db.dst")
    assert dst.read(spark).count() == 5
    # source mutates: upsert + delete + compaction (history rewrite)
    src.upsert(spark.createDataFrame([(1, "B1"), (9, "B9")], SCHEMA), key_cols=["id"])
    src.delete_where(spark, "id = 3", key_cols=["id"])
    src.compact(spark)
    # "restart": a FRESH pipeline object over the same checkpoint dir
    out2 = ChangelogPipeline.from_properties(cat, props, ck).run(
        spark, available_now=True
    )
    assert out2["synced"] == 3
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    assert got == want
    # idle restart: nothing replays (exactly-once)
    out3 = ChangelogPipeline.from_properties(cat, props, ck).run(
        spark, available_now=True
    )
    assert out3["synced"] == 0
    assert sorted((r.id, r.v) for r in dst.read(spark).collect()) == want
    # config validation is loud
    with pytest.raises(ValueError, match="iceberg.source.table"):
        ChangelogPipeline.from_properties(
            cat, {"iceberg.tables": "db.x"}, ck
        )
    with pytest.raises(ValueError, match="id columns"):
        ChangelogPipeline.from_properties(
            cat,
            {"iceberg.source.table": "db.src", "iceberg.tables": "db.x"},
            ck,
        )


def test_reconcile_repairs_after_expiry_breaks_resume(spark, tmp_path):
    """Snapshot expiry under the stream removes the checkpointed snapshot
    from history — pending() refuses with not-an-ancestor, and neither
    changes_between nor the on_rewrite hop can help (the snapshot is
    GONE). reconcile() computes the minimal current-state delta, applies
    it as one marker-carrying commit, and re-arms incremental sync."""
    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        reconcile,
    )

    src = LakehouseTable.create(str(tmp_path / "srcx"), SCHEMA)
    src.append(spark.createDataFrame([(i, f"a{i}") for i in range(4)], SCHEMA))
    dst = LakehouseTable.create(str(tmp_path / "dstx"), SCHEMA)
    stream = ChangelogStream(src, str(tmp_path / "ckx"), on_rewrite="diff")
    assert stream.sync_to_table(spark, dst, key_cols=["id"]) == 1
    # source moves on, then expires history past the checkpoint
    src.upsert(spark.createDataFrame([(1, "B1")], SCHEMA), key_cols=["id"])
    src.append(spark.createDataFrame([(7, "c7")], SCHEMA))
    src.delete_where(spark, "id = 0", key_cols=["id"])
    assert src.expire_snapshots(keep_last=1) > 0
    with pytest.raises(ValueError, match="not an ancestor"):
        stream.sync_to_table(spark, dst, key_cols=["id"])
    out = reconcile(stream, spark, dst, key_cols=["id"])
    assert out["deletes"] >= 1 and out["inserts"] >= 1
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    assert got == want
    # incremental sync is re-armed from the verified head
    src.append(spark.createDataFrame([(20, "z")], SCHEMA))
    assert stream.sync_to_table(spark, dst, key_cols=["id"]) == 1
    assert sorted(r.id for r in dst.read(spark).collect()) == sorted(
        r.id for r in src.read(spark).collect()
    )
    # agreeing states: reconcile is marker-stamp only, zero delta
    out2 = reconcile(stream, spark, dst, key_cols=["id"])
    assert out2["deletes"] == 0 and out2["inserts"] == 0
    assert stream.sync_to_table(spark, dst, key_cols=["id"]) == 0


# ---------------------------------------------------------------- X91
# Filtered changelog source: a tenant-sharded mirror
# ----------------------------------------------------------------
def test_filtered_changelog_pipeline_tenant_shard(spark, tmp_path):
    import json as _json

    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        ChangelogPipeline,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tenant", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    cat = Catalog(str(tmp_path / "wh"))
    src = cat.create_table("default.src", schema, identifier_fields=["id"])
    src.append(
        spark.createDataFrame(
            [(i, i % 3, "a") for i in range(30)], schema
        )
    )
    props = {
        "iceberg.source.table": "default.src",
        "iceberg.source.where": "tenant = 1",
        "iceberg.tables": "default.t1_mirror",
        "iceberg.tables.default-id-columns": "id",
        "iceberg.tables.auto-create-enabled": "true",
    }
    cp = ChangelogPipeline.from_properties(
        cat, props, str(tmp_path / "ck")
    )
    cp.run(spark, available_now=True)
    dst = cat.load_table("default.t1_mirror")
    got = {r.id for r in dst.read(spark).collect()}
    assert got == {i for i in range(30) if i % 3 == 1}
    # incremental poll: mixed append + key delete; only tenant 1 flows
    src.append(
        spark.createDataFrame([(100, 1, "new"), (101, 2, "new")], schema)
    )
    src.delete_where(spark, "id = 4 OR id = 5", key_cols=["id"])  # 4:t1 5:t2
    cp.run(spark, available_now=True)
    got = {r.id for r in dst.read(spark).collect()}
    assert got == ({i for i in range(30) if i % 3 == 1} | {100}) - {4}


def test_filtered_reconcile_repairs_only_the_shard(spark, tmp_path):
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks import Catalog
    from iceberg_kafka_connect_spark.streaming.changelog_source import (
        ChangelogStream,
        reconcile,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tenant", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    cat = Catalog(str(tmp_path / "wh"))
    src = cat.create_table("default.rsrc", schema, identifier_fields=["id"])
    src.append(
        spark.createDataFrame([(i, i % 2, "a") for i in range(10)], schema)
    )
    dst = cat.create_table("default.rdst", schema, identifier_fields=["id"])
    stream = ChangelogStream(
        src, str(tmp_path / "ck2"), where="tenant = 0"
    )
    out = reconcile(stream, spark, dst, key_cols=["id"])
    assert out["inserts"] == 5 and out["deletes"] == 0
    assert {r.id for r in dst.read(spark).collect()} == {0, 2, 4, 6, 8}
