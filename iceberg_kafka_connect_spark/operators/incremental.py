"""Incremental materialized-aggregate maintenance from a changelog window.

The lakehouse write path already exposes exactly-what-changed between two
snapshots (``LakehouseTable.changes_between`` — Iceberg changelog parity);
this operator closes the loop: keep a grouped aggregate (COUNT/SUM, AVG
derived) in sync with a table WITHOUT rescanning it, at cost proportional
to the keys touched in the window, not to the table or the aggregate.

Reference parity: the reference ships changed rows downstream and leaves
aggregation to the warehouse (SinkWriter/Coordinator keep no query state);
an incrementally-maintained aggregate is the natural Spark-side extension
of its CDC stream (same role as Flink's retract-stream aggregations or a
warehouse incremental materialized view).

Method — state differencing, not changelog-value replay:

1. ``touched_keys``: the distinct key tuples the window's changelog rows
   mention (insert OR delete). Only their ids are used; equality-delete
   rows carry key columns only, and that is all we need.
2. pre-image rows  = snapshot-at-window-start  ⋉ touched_keys
   post-image rows = snapshot-at-window-end    ⋉ touched_keys
3. delta per group = agg(post-image) − agg(pre-image)
4. new aggregate   = old aggregate ⊕ delta, dropping groups whose row
   count reaches zero.

Differencing makes intra-window churn a non-problem by construction: a key
inserted then deleted inside the window appears in neither image and
contributes zero; delete-then-reinsert contributes only its net effect.
Replaying changelog VALUES would need every intermediate ordinal ordered
correctly and full pre-images attached to deletes — strictly more data
and more failure modes for the same answer.

Scale shape:
- both image scans are ``left_semi`` against a broadcast of
  ``touched_keys`` — the big side never shuffles, and with key-range
  manifest stats (sinks/table.py stats-pruned scan) files outside the
  touched key range are never opened;
- the delta is two partial-aggregated groupBys over O(touched) rows;
- the ⊕ merge shuffles the aggregate by group key — O(groups), never
  O(rows) — and AQE broadcasts it instead when the delta is tiny.

Only self-maintainable aggregates are offered: COUNT and SUM (AVG =
SUM/COUNT at read time). MIN/MAX are deliberately absent — a delete of
the current extremum requires rescanning its group, which breaks the
"never rescan" contract; callers needing bounds keep them per-file in
manifest stats instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    rows: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Full-recompute form of the maintained state: one row per group with
    ``n_rows`` + ``sum_<c>`` columns. Used to seed the aggregate and as the
    property-test oracle for the incremental path."""
    return rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def incremental_agg_refresh(
    state: DataFrame,
    pre_image: DataFrame,
    post_image: DataFrame,
    touched_keys: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Return the maintained aggregate advanced across one changelog window.

    ``state``        — current aggregate (``aggregate_state`` schema);
    ``pre_image``    — table rows as of the window start;
    ``post_image``   — table rows as of the window end;
    ``touched_keys`` — distinct key tuples changed in the window (from
                       ``changes_between``'s key columns).

    Equivalent by algebra to ``aggregate_state(post_image_full)`` — the
    merge is associative and commutative, so windows can also be advanced
    out of several deltas union'd together before one merge.
    """
    keys = F.broadcast(touched_keys.select(*key_cols).distinct())
    neg = aggregate_state(
        pre_image.join(keys, key_cols, "left_semi"), group_cols, sum_cols
    ).select(
        *group_cols,
        (-F.col("n_rows")).alias("n_rows"),
        *[(-F.col(f"sum_{c}")).alias(f"sum_{c}") for c in sum_cols],
    )
    pos = aggregate_state(
        post_image.join(keys, key_cols, "left_semi"), group_cols, sum_cols
    )
    merged = state.unionByName(pos).unionByName(neg)
    return (
        merged.groupBy(*group_cols)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        .filter(F.col("n_rows") > 0)
    )
