"""Property: for ANY sequence of append/upsert/delete_where operations, the
changelog replay reconstructs the live table exactly, and mirroring via the
changelog produces a byte-identical replica.

Hypothesis drives random op sequences over a tiny key space (heavy key
collisions → every delete/last-wins path exercised). A sequential dict is
the reference implementation.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable
from iceberg_kafka_connect_spark.streaming.replicate import mirror_changes

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)

# an op is ("append"|"upsert", [(id, v), ...]) or ("delete", id)
_rows = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 99)),
    min_size=1,
    max_size=4,
    unique_by=lambda r: r[0],
)
_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("upsert"), _rows),
    st.tuples(st.just("delete"), st.integers(0, 6)),
)


def _apply_reference(state: dict, seen: set, op) -> None:
    kind, arg = op
    if kind == "append":
        for k, v in arg:
            # appends of an existing key create duplicates; the generator
            # below only appends UNSEEN keys to keep row identity unique
            state[k] = v
            seen.add(k)
    elif kind == "upsert":
        for k, v in arg:
            state[k] = v
            seen.add(k)
    else:
        state.pop(arg, None)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_changelog_replay_and_mirror_match_reference(spark, tmp_path_factory, ops):
    base = tmp_path_factory.mktemp("clprop")
    src = LakehouseTable.create(str(base / "src"), SCHEMA)
    dst = LakehouseTable.create(str(base / "dst"), SCHEMA)
    state: dict[int, int] = {}
    seen: set[int] = set()
    for op in ops:
        kind, arg = op
        if kind == "append":
            fresh = [(k, v) for k, v in arg if k not in seen]
            if not fresh:
                continue
            src.append(spark.createDataFrame(fresh, SCHEMA))
            _apply_reference(state, seen, ("append", fresh))
        elif kind == "upsert":
            src.upsert(spark.createDataFrame(arg, SCHEMA), key_cols=["id"])
            _apply_reference(state, seen, op)
        else:
            src.delete_where(spark, f"id = {arg}", key_cols=["id"])
            _apply_reference(state, seen, op)

    live = {r.id: r.v for r in src.read(spark).collect()}
    assert live == state

    # changelog replay reconstructs the live table
    replay: dict[int, int] = {}
    for r in sorted(
        src.changes_between(spark, None).collect(),
        key=lambda r: (r._change_ordinal, r._change_type != "delete"),
    ):
        if r._change_type == "delete":
            replay.pop(r.id, None)
        else:
            replay[r.id] = r.v
    assert replay == state

    # mirroring lands the identical final state
    mirror_changes(spark, src, dst, key_cols=["id"])
    assert {r.id: r.v for r in dst.read(spark).collect()} == state
