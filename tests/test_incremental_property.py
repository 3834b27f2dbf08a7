"""Property-based test: incremental aggregate maintenance by state
differencing must equal a full recompute for ARBITRARY churn — any
(pre-state, edit script) pair, where edits insert/update/delete keys and
may move rows between groups. A naive Python dict interpreter applies the
edits; the operator advances the aggregate from pre to post using only the
touched keys."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401

from iceberg_kafka_connect_spark.operators.incremental import (
    aggregate_state,
    incremental_agg_refresh,
)

KEYS = st.integers(min_value=0, max_value=7)
GROUPS = st.sampled_from(["a", "b", "c"])
VALS = st.integers(min_value=-50, max_value=50)
EDIT = st.tuples(KEYS, st.sampled_from(["I", "U", "D"]), GROUPS, VALS)


@settings(max_examples=15, deadline=None)
@given(
    base=st.dictionaries(KEYS, st.tuples(GROUPS, VALS), max_size=6),
    edits=st.lists(EDIT, max_size=10),
)
def test_refresh_equals_full_recompute(spark, base, edits):
    post = dict(base)
    touched = set()
    for k, op, g, v in edits:
        touched.add(k)
        if op == "D":
            post.pop(k, None)
        else:  # I/U: upsert semantics (last value wins)
            post[k] = (g, v)

    def df_of(state):
        rows = [(k, g, v) for k, (g, v) in state.items()]
        return spark.createDataFrame(rows, "k long, g string, v long")

    pre_df, post_df = df_of(base), df_of(post)
    got = incremental_agg_refresh(
        aggregate_state(pre_df, ["g"], ["v"]),
        pre_image=pre_df,
        post_image=post_df,
        touched_keys=spark.createDataFrame(
            [(k,) for k in touched] or [(None,)], "k long"
        ).filter(F.col("k").isNotNull()),
        key_cols=["k"],
        group_cols=["g"],
        sum_cols=["v"],
    )
    want = aggregate_state(post_df, ["g"], ["v"])
    assert sorted(got.collect()) == sorted(want.collect())
