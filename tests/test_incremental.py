"""Incremental materialized-aggregate maintenance (operators/incremental.py):
the refreshed state must equal a full recompute of the post-image for every
churn pattern, and the maintenance plan must broadcast the touched keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators.incremental import (
    aggregate_state,
    incremental_agg_refresh,
)

SCHEMA = "k long, g string, v long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _check(spark, pre_rows, post_rows, touched):
    pre = _rows(spark, pre_rows)
    post = _rows(spark, post_rows)
    state0 = aggregate_state(pre, ["g"], ["v"])
    got = incremental_agg_refresh(
        state0,
        pre_image=pre,
        post_image=post,
        touched_keys=_rows(spark, [(k, "x", 0) for k in touched]).select("k"),
        key_cols=["k"],
        group_cols=["g"],
        sum_cols=["v"],
    )
    want = aggregate_state(post, ["g"], ["v"])
    assert sorted(got.collect()) == sorted(want.collect())


def test_pure_inserts(spark):
    pre = [(1, "a", 10), (2, "b", 20)]
    post = pre + [(3, "a", 5), (4, "c", 7)]
    _check(spark, pre, post, [3, 4])


def test_update_moves_row_between_groups(spark):
    pre = [(1, "a", 10), (2, "b", 20)]
    post = [(1, "b", 99), (2, "b", 20)]  # key 1: group a -> b, value change
    _check(spark, pre, post, [1])


def test_delete_empties_group(spark):
    pre = [(1, "a", 10), (2, "b", 20)]
    post = [(2, "b", 20)]
    _check(spark, pre, post, [1])  # group 'a' must vanish (n_rows=0 dropped)


def test_insert_then_delete_within_window_is_noop(spark):
    """A key present in NEITHER image contributes nothing even though the
    changelog mentioned it — the differencing form is churn-proof."""
    pre = [(1, "a", 10)]
    post = [(1, "a", 10)]
    _check(spark, pre, post, [7])  # key 7 inserted+deleted inside the window


def test_delete_then_reinsert_nets_to_value_change(spark):
    pre = [(1, "a", 10)]
    post = [(1, "a", 42)]
    _check(spark, pre, post, [1])


def test_untouched_keys_never_affect_delta(spark):
    """Rows absent from touched_keys are invisible to the refresh even if
    the images disagree on them — the contract is per-window keys only."""
    pre = [(1, "a", 10), (2, "b", 20)]
    post = [(1, "a", 10), (2, "b", 999), (3, "c", 5)]
    got = incremental_agg_refresh(
        aggregate_state(_rows(spark, pre), ["g"], ["v"]),
        pre_image=_rows(spark, pre),
        post_image=_rows(spark, post),
        touched_keys=_rows(spark, [(3, "x", 0)]).select("k"),
        key_cols=["k"],
        group_cols=["g"],
        sum_cols=["v"],
    )
    want = aggregate_state(
        _rows(spark, pre + [(3, "c", 5)]), ["g"], ["v"]
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_windows_compose(spark):
    """Advancing across two windows sequentially equals one full recompute."""
    w0 = [(1, "a", 1), (2, "a", 2)]
    w1 = [(1, "a", 1), (2, "b", 5), (3, "c", 3)]
    w2 = [(2, "b", 5), (3, "c", 4), (4, "a", 9)]
    s0 = aggregate_state(_rows(spark, w0), ["g"], ["v"])
    s1 = incremental_agg_refresh(
        s0, _rows(spark, w0), _rows(spark, w1),
        _rows(spark, [(2, "x", 0), (3, "x", 0)]).select("k"),
        ["k"], ["g"], ["v"],
    )
    s2 = incremental_agg_refresh(
        s1, _rows(spark, w1), _rows(spark, w2),
        _rows(spark, [(1, "x", 0), (3, "x", 0), (4, "x", 0)]).select("k"),
        ["k"], ["g"], ["v"],
    )
    want = aggregate_state(_rows(spark, w2), ["g"], ["v"])
    assert sorted(s2.collect()) == sorted(want.collect())


def test_touched_keys_broadcast_in_plan(spark):
    pre = _rows(spark, [(1, "a", 10)])
    post = _rows(spark, [(1, "a", 11)])
    out = incremental_agg_refresh(
        aggregate_state(pre, ["g"], ["v"]),
        pre, post,
        _rows(spark, [(1, "x", 0)]).select("k"),
        ["k"], ["g"], ["v"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # the big sides (images) must not shuffle for the semi joins
    assert plan.count("LeftSemi") == 2


# ---------------------------------------------------------------- X90
# Predicate pushdown into incremental scans: a selective CDC consumer
# opens only the new files that can match.
# ----------------------------------------------------------------
def test_appends_between_where_prunes_and_filters(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "incw"), schema)
    t.append(spark.createDataFrame([(i, "base") for i in range(10)], schema))
    mark = t.current_snapshot()["snapshot_id"]
    # two appends with disjoint id ranges → disjoint recorded bounds
    t.append(
        spark.createDataFrame([(i, "lo") for i in range(100, 110)], schema)
    )
    t.append(
        spark.createDataFrame([(i, "hi") for i in range(900, 910)], schema)
    )
    out = t.appends_between(spark, mark, where="id >= 900")
    assert {r.v for r in out.collect()} == {"hi"}
    assert out.count() == 10
    # planner proof: only the matching append's files survive pruning
    files = []
    meta = t.metadata()
    sid = meta["refs"]["main"]
    while sid != mark:
        snap = t._snapshot_by_id(meta, sid)
        d, _ = t._load_manifest(snap)
        files.extend(d)
        sid = snap["parent"]
    from iceberg_kafka_connect_spark.sinks.stats import file_may_match

    kept = [f for f in files if file_may_match(f, "id >= 900")]
    assert 0 < len(kept) < len(files)


def test_changes_between_where_filters_inserts_and_key_deletes(
    spark, tmp_path
):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(
        str(tmp_path / "chw"), schema, identifier_fields=["id"]
    )
    t.append(spark.createDataFrame([(i, "a") for i in range(10)], schema))
    mark = t.current_snapshot()["snapshot_id"]
    t.append(spark.createDataFrame([(100, "new"), (200, "new")], schema))
    t.delete_where(spark, "id = 3 OR id = 100", key_cols=["id"])
    ch = t.changes_between(spark, mark, where="id >= 100")
    rows = sorted((r.id, r._change_type) for r in ch.collect())
    # insert 100, insert 200, delete 100 — the id=3 delete is filtered out
    assert rows == [(100, "delete"), (100, "insert"), (200, "insert")]


def test_snapshot_diff_where_pushes_into_both_endpoints(spark, tmp_path):
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "sdw"), schema)
    t.append(spark.createDataFrame([(i, "a") for i in range(10)], schema))
    mark = t.current_snapshot()["snapshot_id"]
    t.append(spark.createDataFrame([(100, "b"), (900, "b")], schema))
    t.compact(spark)  # forces the diff path for the range
    t.delete_where(spark, "id = 3 OR id = 900", key_cols=["id"])
    diff = t.snapshot_diff(spark, mark, where="id >= 100")
    rows = sorted((r.id, r._change_type) for r in diff.collect())
    assert rows == [(100, "insert")]  # 900 inserted+deleted nets out; id<100 filtered
    unfiltered = t.snapshot_diff(spark, mark)
    assert (3, "delete") in {(r.id, r._change_type) for r in unfiltered.collect()}
