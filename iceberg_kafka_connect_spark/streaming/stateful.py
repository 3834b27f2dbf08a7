"""Stateful streaming operators: watermarked window rollups and custom
session state.

The reference has no stateful stream processing (its only 'aggregate' is the
commit-cycle VTTS, SURVEY.md §2.4) — but its *output* tables feed exactly
these queries, and a Spark-native engine should run them on the stream
directly instead of on landed files:

- windowed_rollup: tumbling-window counts/sums with a watermark for late
  data. Watermark semantics generalize the reference's VTTS: "all
  partitions have reported through T" becomes "no event older than T-δ will
  be accepted".
- sessionize_stream: gap-based sessions via applyInPandasWithState — the
  escape hatch for stateful logic Spark's built-ins can't express. State is
  one (last_ts, session_count, event_count) triple per user: O(users)
  state, Arrow-batched updates, timeout-driven finalization.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def windowed_rollup(
    stream: DataFrame,
    ts_col: str = "timestamp",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = (),
    agg_col: str | None = None,
) -> DataFrame:
    """Tumbling-window rollup with late-data tolerance. In append output
    mode a window finalizes when the watermark passes — the streaming
    analogue of the events_hourly_rollup batch query."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if agg_col is not None:
        aggs.append(F.sum(agg_col).alias(f"sum_{agg_col}"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            *([f"sum_{agg_col}"] if agg_col is not None else []),
        )
    )


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "timestamp",
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session counting per user with applyInPandasWithState.

    Emits the running (n_sessions, n_events) per user each batch. State per
    key is three longs — at 100 TB the state store scales with |users|, not
    |events|, and updates arrive Arrow-batched per key group.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col])
            )
        for t in sorted(ts_all):
            if last_ts is None or (t - last_ts) > gap_us:
                n_sessions += 1
            last_ts = t
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_stream(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "timestamp",
    type_col: str = "event_type",
    within_us: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ordered funnel — the incremental twin of
    ``operators/relational.window_funnel``: per user, the earliest
    event-time each step completed (step k counts only strictly after
    step k−1's earliest completion, and within ``within_us`` of step
    1's when set), updated per micro-batch via applyInPandasWithState.

    State per user is ONE row of k timestamps — O(users · steps), never
    O(events) — and it is MONOTONE: a step's earliest completion only
    ever moves earlier within a batch (events sort by event time before
    applying), never retroactively across batches. An event arriving
    later than the watermark that would have completed a step earlier
    is the documented streaming approximation; the batch operator is
    the exact form.

    Emits (user, depth) in update mode whenever a user's state changes.
    """
    if not steps:
        raise ValueError("funnel_stream needs at least one step")
    k = len(steps)
    # the output key column keeps the INPUT's name and type (a long
    # user_id stays long — hardcoding string would fail the Arrow
    # conversion for the events-table shape the batch twin handles)
    user_field = stream.schema[user_col]
    out_schema = T.StructType(
        [
            T.StructField(user_col, user_field.dataType),
            T.StructField("depth", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("step_ts_us", T.ArrayType(T.LongType()))]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts_steps: list = (
            list(state.get[0]) if state.exists else [None] * k
        )
        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            ).tolist()
            rows.extend(zip(ts_us, pdf[type_col].tolist()))
        for t, ty in sorted(rows):
            for i in range(k):
                if steps[i] != ty or ts_steps[i] is not None:
                    continue
                if i > 0 and (
                    ts_steps[i - 1] is None or t <= ts_steps[i - 1]
                ):
                    continue
                if (
                    within_us is not None
                    and i > 0
                    and t > ts_steps[0] + within_us
                ):
                    continue
                ts_steps[i] = t
        state.update((ts_steps,))
        depth = 0
        for v in ts_steps:
            if v is None:
                break
            depth += 1
        yield pd.DataFrame({user_col: [key[0]], "depth": [depth]})

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
