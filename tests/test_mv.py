"""Materialized-aggregate maintenance loop (streaming/mv.py): marker-driven
incremental refresh over a real LakehouseTable changelog."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.operators.incremental import aggregate_state
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable
from iceberg_kafka_connect_spark.streaming.mv import (
    MV_REFRESH_MODE_PROP,
    MV_SOURCE_SNAPSHOT_PROP,
    refresh_materialized_agg,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)
MV_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_v", T.LongType()),
    ]
)


def _tables(spark):
    src = LakehouseTable.create(
        tempfile.mkdtemp(prefix="mv_src_") + "/t", SRC_SCHEMA
    )
    mv = LakehouseTable.create(
        tempfile.mkdtemp(prefix="mv_mv_") + "/t", MV_SCHEMA
    )
    return src, mv


def _rows(spark, rows):
    return spark.createDataFrame(rows, SRC_SCHEMA)


def _assert_consistent(spark, src, mv):
    want = aggregate_state(src.read(spark), ["g"], ["v"])
    got = mv.read(spark)
    assert sorted(got.collect()) == sorted(want.collect())


def test_seed_then_incremental(spark):
    src, mv = _tables(spark)
    src.append(_rows(spark, [(1, "a", 10), (2, "b", 20)]))
    s = refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert s["summary"][MV_REFRESH_MODE_PROP] == "seed"
    _assert_consistent(spark, src, mv)

    src.upsert(_rows(spark, [(2, "b", 99), (3, "a", 7)]), key_cols=["k"])
    s = refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert s["summary"][MV_REFRESH_MODE_PROP] == "incremental"
    _assert_consistent(spark, src, mv)


def test_noop_when_current(spark):
    src, mv = _tables(spark)
    src.append(_rows(spark, [(1, "a", 1)]))
    assert refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"]) is None


def test_compaction_window_falls_back_to_full(spark):
    src, mv = _tables(spark)
    src.append(_rows(spark, [(1, "a", 1), (2, "b", 2)]))
    refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    src.upsert(_rows(spark, [(1, "a", 5)]), key_cols=["k"])
    src.compact(spark)  # history-rewriting snapshot inside the window
    s = refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert s["summary"][MV_REFRESH_MODE_PROP] == "full"
    _assert_consistent(spark, src, mv)
    # and the NEXT window is incremental again
    src.upsert(_rows(spark, [(9, "c", 3)]), key_cols=["k"])
    s = refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert s["summary"][MV_REFRESH_MODE_PROP] == "incremental"
    _assert_consistent(spark, src, mv)


def test_marker_tracks_source_snapshot(spark):
    src, mv = _tables(spark)
    src.append(_rows(spark, [(1, "a", 1)]))
    refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert (
        mv.last_summary_value(MV_SOURCE_SNAPSHOT_PROP)
        == src.current_snapshot()["snapshot_id"]
    )


def test_deletes_shrink_groups(spark):
    src, mv = _tables(spark)
    src.append(_rows(spark, [(1, "a", 1), (2, "a", 2), (3, "b", 3)]))
    refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    src.delete_where(spark, "g = 'b'", key_cols=["k"])
    refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    _assert_consistent(spark, src, mv)
    assert mv.read(spark).filter(F.col("g") == "b").count() == 0
