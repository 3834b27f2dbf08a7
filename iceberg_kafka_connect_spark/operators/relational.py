"""Time-relational operators Spark lacks as built-ins: as-of join and
interval (range) join.

Both avoid the naive quadratic shapes:

- ``as_of_join`` is the union+window formulation: tag both sides, union,
  and carry the latest right-side row forward with ``last(..., ignorenulls)``
  over a (keys)-partitioned window. ONE shuffle on the join keys, no join
  fan-out at all — each left row costs O(1) regardless of how many right
  rows precede it. The sort-merge-join + filter alternative explodes on
  keys with many right rows; this shape is linear and skew-bounded by the
  per-key row count (same bound as any windowed op).

- ``interval_join`` is the bucketed range join: intervals explode into the
  fixed-width time buckets they cover, points map to their single bucket,
  and the match becomes an equi-join on (keys, bucket) + a residual range
  filter. Each (point, interval) match is produced exactly once (a point
  lives in one bucket), so no distinct pass is needed. Bucket width trades
  interval duplication against join selectivity; the equi-join keeps
  Catalyst on the hash/sort-merge fast path instead of a broadcast
  nested-loop over an inequality predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward', inclusive) or the least
    ``right_ts >= left_ts`` ('forward'), matching on the ``on`` keys —
    pandas.merge_asof semantics, DuckDB ASOF JOIN semantics, distributed.

    Left rows with no match (or a match farther than ``tolerance_s``
    seconds) keep NULL right columns. Right-side ties on (keys, ts) resolve
    deterministically to the greatest remaining struct value.

    Output: all left columns, then each non-key non-ts right column (name
    suffixed only on collision with a left column), then the matched right
    timestamp as ``<right_ts><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts
    rcols = [c for c in right.columns if c not in on and c != right_ts]

    r_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
    )
    r_type = right.select(r_struct.alias("__r")).schema[0].dataType

    l_tag = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    l_type = l_tag.schema["__l"].dataType
    r_tag = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    tagged = l_tag.unionByName(r_tag)

    # At equal ts the right row must be visible to the left row (inclusive
    # match) → right (__is_left=0) sorts first on the traversal axis. The
    # trailing __r key only breaks ties among right rows.
    ts_axis = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_axis, F.col("__is_left").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = tagged.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)

    if tolerance_s is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
        ) / F.lit(1_000_000.0)
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance_s), F.col("__m"))
        )

    left_names = set(left.columns)
    out_cols: list[Column] = [
        F.col(f"__l.{c}").alias(c) for c in left.columns
    ]
    for c in rcols:
        out_cols.append(
            F.col(f"__m.{c}").alias(c + suffix if c in left_names else c)
        )
    out_cols.append(F.col("__m.__rts").alias(right_ts + suffix))
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts < end`` (end-exclusive) sharing the ``on`` keys.

    Scale shape: intervals explode into the ``bucket_s``-second buckets they
    cover; points carry their single bucket; the match is an equi-join on
    (keys, bucket) plus the residual range filter. Pick ``bucket_s`` near
    the typical interval length so each interval lands in O(1) buckets.

    Output: all point columns + all non-key interval columns (interval
    column names must not collide with point columns).
    """
    if how not in ("inner",):
        raise ValueError("interval_join supports how='inner'")
    overlap = set(points.columns) & {
        c for c in intervals.columns if c not in on
    }
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    b = F.lit(int(bucket_s) * 1_000_000)
    iv = intervals.filter(F.col(start_col) < F.col(end_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / b),
                # end-exclusive: the last covered bucket holds end - 1µs
                F.floor((F.unix_micros(F.col(end_col)) - F.lit(1)) / b),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / b)
    )
    joined = pt.join(iv, on=on + ["__bucket"]).filter(
        (F.col(start_col) <= F.col(point_ts))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__bucket")


def window_funnel(
    events: DataFrame,
    steps: list[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel depth per user — ClickHouse ``windowFunnel``
    semantics re-expressed as layered running-min windows: the deepest
    step ``k`` such that step-1 … step-k events occur in order, each
    strictly after the previous step's earliest completion (sort order:
    (ts, tiebreak)), and — when ``within_us`` is set — all within that
    many microseconds of the FIRST step's earliest event.

    ``steps`` are boolean Columns over the event row (e.g.
    ``[F.col("event_type") == "view", ...]``), so a step can be any
    predicate, not just a type match.

    Scale shape: ONE shuffle (the per-user window partition), k window
    passes over the same partitioning — Catalyst collapses them into a
    single sort — no joins, no per-user collect, no UDF. The naive
    alternative (k-way self-join on user with ts inequalities) fans out
    quadratically per step; this is linear in events for any k.

    Returns (user, depth): depth 0 = user emitted events but none
    matched step 1. Users with no events don't appear (no rows to scan).
    """
    if not steps:
        raise ValueError("window_funnel needs at least one step")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events
    us = F.unix_micros(F.col(ts_col))
    prev: list[str] = []  # running earliest-completion column per step
    hits: list[str] = []  # per-row "this row completes step k" flags
    for k, pred in enumerate(steps, start=1):
        cond = pred
        if k > 1:
            cond = cond & F.col(prev[-1]).isNotNull()
        if within_us is not None and k > 1:
            cond = cond & (
                us <= F.unix_micros(F.col(prev[0])) + F.lit(within_us)
            )
        hcol = f"__h{k}"
        df = df.withColumn(hcol, cond)
        hits.append(hcol)
        if k < len(steps):
            # later steps look back at this step's running earliest hit
            tcol = f"__t{k}"
            df = df.withColumn(
                tcol,
                F.min(F.when(F.col(hcol), F.col(ts_col))).over(w),
            )
            prev.append(tcol)
    depth = F.greatest(
        *[
            F.when(F.col(c), F.lit(i))
            for i, c in enumerate(hits, start=1)
        ],
        F.lit(0),
    )
    return df.groupBy(user_col).agg(
        F.max(depth).cast("int").alias("depth")
    )
