"""Streaming read of the lakehouse (table_stream_source): each committed
data file surfaces exactly once across restarts, like Iceberg's streaming
read."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sources.stream import table_stream_source

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _rows(lo, hi):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return [(i, base + dt.timedelta(minutes=i), f"v{i}") for i in range(lo, hi)]


def _drain(spark, t, checkpoint, out_dir=None, name=None):
    src = table_stream_source(spark, t)
    if out_dir is not None:
        # parquet sink: supports checkpoint recovery (memory sink doesn't)
        q = (
            src.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.schema(src.schema).parquet(out_dir)
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_reads_appends_exactly_once(spark, catalog, tmp_path):
    t = catalog.create_table("default.s1", SCHEMA)
    t.append(spark.createDataFrame(_rows(0, 10), SCHEMA))
    t.append(spark.createDataFrame(_rows(10, 20), SCHEMA))
    cp, out_dir = str(tmp_path / "cp"), str(tmp_path / "out")
    out = _drain(spark, t, cp, out_dir)
    assert sorted(r.id for r in out.collect()) == list(range(20))
    # new commit, same checkpoint: only the new file's rows arrive — every
    # id appears exactly once in the cumulative sink output
    t.append(spark.createDataFrame(_rows(20, 30), SCHEMA))
    out2 = _drain(spark, t, cp, out_dir)
    assert sorted(r.id for r in out2.collect()) == list(range(30))


def test_stream_rederives_transform_partitions(spark, catalog, tmp_path):
    t = catalog.create_table(
        "default.s2", SCHEMA, partition_by="day(ts)"
    )
    t.append(spark.createDataFrame(_rows(0, 5), SCHEMA))
    out = _drain(spark, t, str(tmp_path / "cp2"), name="stream_t2")
    batch_cols = set(t.read(spark).columns)
    assert set(out.columns) == batch_cols
    assert out.count() == 5


def test_stream_rejects_identity_partitions(spark, catalog, tmp_path):
    t = catalog.create_table("default.s3", SCHEMA, partition_by="v")
    t.append(spark.createDataFrame(_rows(0, 3), SCHEMA))
    with pytest.raises(ValueError, match="identity partition"):
        table_stream_source(spark, t)


# ----------------------------------------------------------------- changelog
def test_changes_between_emits_inserts_and_deletes(spark, tmp_path):
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "cl"), schema)
    s1 = t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], schema), key_cols=["id"]
    )
    # full changelog from the beginning
    ch = t.changes_between(spark, None).collect()
    by = sorted((r._change_ordinal, r._change_type, r.id, r.v) for r in ch)
    assert by == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "delete", 2, None),  # equality-delete key, NULL elsewhere
        (1, "delete", 3, None),
        (1, "insert", 2, "B"),
        (1, "insert", 3, "c"),
    ]
    # incremental poll: only the upsert snapshot
    ch2 = t.changes_between(spark, s1["snapshot_id"]).collect()
    assert {(r._change_type, r.id) for r in ch2} == {
        ("delete", 2), ("delete", 3), ("insert", 2), ("insert", 3),
    }
    assert all(r._change_ordinal == 0 for r in ch2)


def test_changes_between_replay_reconstructs_table(spark, tmp_path):
    """Applying the changelog in (ordinal, delete-first) order reproduces
    the live table — the CDC-consumer contract."""
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "cl2"), schema)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(8)], schema))
    t.upsert(
        spark.createDataFrame([(2, "X"), (9, "Y")], schema), key_cols=["id"]
    )
    t.delete_where(spark, "id >= 6 and id <= 7", key_cols=["id"])
    state: dict[int, str] = {}
    rows = t.changes_between(spark, None).collect()
    for r in sorted(
        rows, key=lambda r: (r._change_ordinal, r._change_type != "delete")
    ):
        if r._change_type == "delete":
            state.pop(r.id, None)
        else:
            state[r.id] = r.v
    live = {r.id: r.v for r in t.read(spark).collect()}
    assert state == live


def test_changes_between_rejects_compaction(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "cl3"), schema)
    t.append(spark.createDataFrame([(1, "a")], schema))
    t.upsert(spark.createDataFrame([(1, "b")], schema), key_cols=["id"])
    t.compact(spark)
    with _pytest.raises(ValueError, match="changelog cannot express"):
        t.changes_between(spark, None)


def test_changelog_delete_keys_survive_rename(spark, tmp_path):
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "clr"), schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.upsert(spark.createDataFrame([(2, "B")], schema), key_cols=["id"])
    t.rename_column("id", "uid")
    dels = [
        r
        for r in t.changes_between(spark, None).collect()
        if r._change_type == "delete"
    ]
    assert [r.uid for r in dels] == [2]  # key survives the rename


# ---------------------------------------------------------------- mirroring
def _mk(spark, tmp_path, name):
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    return LakehouseTable.create(str(tmp_path / name), schema), schema


def _state(spark, t):
    return {r.id: r.v for r in t.read(spark).collect()}


def test_mirror_changes_incremental_and_idempotent(spark, tmp_path):
    from iceberg_kafka_connect_spark.streaming.replicate import mirror_changes

    src, schema = _mk(spark, tmp_path, "src")
    dst, _ = _mk(spark, tmp_path, "dst")
    src.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))
    snap = mirror_changes(spark, src, dst, key_cols=["id"])
    assert snap is not None
    assert _state(spark, dst) == _state(spark, src)
    # up-to-date poll is a no-op (no empty snapshots)
    assert mirror_changes(spark, src, dst, key_cols=["id"]) is None
    # incremental: upsert + delete on the source, one more poll
    src.upsert(spark.createDataFrame([(2, "B"), (4, "d")], schema), key_cols=["id"])
    src.delete_where(spark, "id = 1", key_cols=["id"])
    assert mirror_changes(spark, src, dst, key_cols=["id"]) is not None
    assert _state(spark, dst) == {2: "B", 3: "c", 4: "d"}
    assert _state(spark, dst) == _state(spark, src)


def test_mirror_changes_key_rewritten_twice_in_range(spark, tmp_path):
    """Several changes to one key inside a single poll range: only the net
    effect applies (last writer wins; delete-then-reinsert lands inserted)."""
    from iceberg_kafka_connect_spark.streaming.replicate import mirror_changes

    src, schema = _mk(spark, tmp_path, "src2")
    dst, _ = _mk(spark, tmp_path, "dst2")
    src.append(spark.createDataFrame([(1, "v1")], schema))
    src.upsert(spark.createDataFrame([(1, "v2")], schema), key_cols=["id"])
    src.delete_where(spark, "id = 1", key_cols=["id"])
    src.append(spark.createDataFrame([(1, "v3")], schema))
    mirror_changes(spark, src, dst, key_cols=["id"])
    assert _state(spark, dst) == {1: "v3"}


def test_mirror_rowless_range_advances_marker(spark, tmp_path):
    """Empty source snapshots must advance the mirror marker so later polls
    don't re-read the stale range."""
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.streaming.replicate import mirror_changes

    src, schema = _mk(spark, tmp_path, "src3")
    dst, _ = _mk(spark, tmp_path, "dst3")
    src.append(spark.createDataFrame([(1, "a")], schema))
    mirror_changes(spark, src, dst, key_cols=["id"])
    # a row-less source snapshot moves the head
    src.append(spark.createDataFrame([], schema))
    snap = mirror_changes(spark, src, dst, key_cols=["id"])
    assert snap is not None  # marker-only advance
    assert snap["summary"]["mirror.src-snapshot-id"] == (
        src.current_snapshot()["snapshot_id"]
    )
    # now truly up to date
    assert mirror_changes(spark, src, dst, key_cols=["id"]) is None
    assert _state(spark, dst) == {1: "a"}
