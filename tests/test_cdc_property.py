"""Property-based test: the engine's set-oriented CDC apply must equal the
reference's *sequential* per-record apply (BaseDeltaTaskWriter.java:71-84)
for arbitrary op streams.

The reference processes each record in order: UPDATE/DELETE drop the key via
equality delete, then INSERT/UPDATE append the row. The engine collapses a
batch last-wins and applies one anti-join+union. Hypothesis generates random
op sequences; a naive Python interpreter of the reference semantics is the
oracle."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from iceberg_kafka_connect_spark.operators.cdc import apply_cdc_batch

KEYS = st.integers(min_value=0, max_value=5)
OPS = st.sampled_from(["I", "U", "D"])


def _reference_apply(base: dict[int, str], ops: list[tuple[int, str, str]]):
    """Sequential equality-delete + append, exactly like the reference."""
    state = dict(base)
    for key, op, val in ops:
        state.pop(key, None)  # equality delete for I/U/D alike (delete+append)
        if op in ("I", "U"):
            state[key] = val
    return state


@settings(max_examples=20, deadline=None)
@given(
    base_keys=st.lists(KEYS, unique=True, max_size=4),
    ops=st.lists(st.tuples(KEYS, OPS), max_size=8),
)
def test_batch_apply_equals_sequential_apply(spark, base_keys, ops):
    base_rows = [(k, f"base{k}") for k in base_keys]
    op_rows = [
        (k, op, f"v{i}", i) for i, (k, op) in enumerate(ops)
    ]  # offset = arrival order
    expected = _reference_apply(
        {k: v for k, v in base_rows},
        [(k, op, v) for k, op, v, _ in op_rows],
    )

    base = spark.createDataFrame(
        base_rows or [(None, None)], "id long, val string"
    ).filter("id is not null")
    batch = spark.createDataFrame(
        op_rows or [(None, None, None, None)],
        "id long, _cdc_op string, val string, offset long",
    ).filter("id is not null")
    out = apply_cdc_batch(
        base, batch, key_cols=["id"], order_cols=["offset"]
    )
    got = {r.id: r.val for r in out.collect()}
    assert got == expected
