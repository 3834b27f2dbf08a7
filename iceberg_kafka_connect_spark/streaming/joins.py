"""Stream-stream time-interval join.

The batch engine's bucketed interval join (operators/relational.py) exists
to keep Catalyst off the nested-loop path; in Structured Streaming the
engine's symmetric-hash stream-stream join already keys state by the
equality columns, and the explicit time-range predicate is what lets the
state store EVICT: each side's watermark plus the range condition bounds
how long a row can still find partners, so state is dropped as event time
advances instead of growing with the stream (the quadratic risk in
streaming is unbounded state, not join fan-out).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join each streaming point to every streaming interval containing it
    (``start <= point_ts < end``) with matching ``on`` keys.

    Both sides are watermarked; the range condition on event-time columns
    gives the state store its eviction bound (Spark requires exactly this
    combination for unbounded-free stream-stream inner joins). Interval
    columns must not collide with point columns (keys excepted).
    """
    overlap = set(points.columns) & {
        c for c in intervals.columns if c not in on
    }
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    p = points.withWatermark(point_ts, watermark)
    iv = intervals.withWatermark(start_col, watermark)
    key_eq = [p[k] == iv[k] for k in on]
    cond: Column = reduce(
        lambda a, b: a & b,
        key_eq
        + [
            p[point_ts] >= iv[start_col],
            p[point_ts] < iv[end_col],
        ],
    )
    joined = p.join(iv, cond, "inner")
    # drop the duplicated key columns from the interval side
    return joined.drop(*[iv[k] for k in on])
