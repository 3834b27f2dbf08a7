"""Per-group cumulative sums (token budgets) without a per-group serial
sort.

``SUM(v) OVER (PARTITION BY source ORDER BY doc_id)`` is the semantic
target, but its physical plan sorts EACH source inside one task — at
corpus scale a dominant source becomes a single giant sorted window
partition. This operator produces identical cumulative sums with the
shard-partial-sums + broadcast-prefix-offsets shape of
``operators/ids.py`` (the same idea behind ``zipWithIndex``), generalized
to grouped sums:

1. range-partition by ``(group, *order_cols)`` — a big group spans
   several consecutive shards, each shard locally sorted and bounded;
2. per-(shard, group) partial sums: one map-side-combined aggregation —
   range partitioning makes each group a contiguous shard run, so the
   partials frame is bounded by ``#groups + #shards`` rows, never O(rows);
3. prefix-sum the partials into per-(shard, group) starting offsets
   DISTRIBUTIVELY — a window over the partials frame partitioned by
   group (each partition is just that group's few shard rows; nothing
   is collected to the driver, so millions of fine-grained groups cost
   a tiny shuffle, not driver memory) — and broadcast them back;
4. per-shard windows (``partitionBy(shard, group)``) add the local
   running sum to the shard's offset.

With a ``budget``, whole (shard, group) blocks whose starting offset
already exceeds the budget are dropped BEFORE the window — the tail of a
huge source is never sorted at all.

Reference analogue: none (the reference ships records; it doesn't curate
mixtures) — this is the LLM-pipeline allocator step between source
weighting (``docs_source_mix``) and shard export. The oracle-verification
twin is the plain window form (``suite/text.py::docs_token_budget``'s
DuckDB SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_cumulative_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    cum_col: str = "cum",
    budget: int | None = None,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Add ``cum_col`` = running sum of ``value_col`` within ``group_col``
    ordered by ``order_cols`` — semantically ``SUM(value) OVER (PARTITION
    BY group ORDER BY order)`` — without ever sorting a whole group in one
    task. With ``budget``, rows whose cumulative sum exceeds it are
    dropped (and unreachable blocks are pruned before the window runs).

    ``(group_col, *order_cols)`` must be unique per row (the window-form
    contract too: ties would share a cumulative value).

    ``materialize=False`` skips the persist/checkpoint pair so plan tests
    can inspect the live plan; production callers keep the default, which
    pins the sampled range partitioning across the two passes.
    """
    keys = [group_col, *order_cols]
    ordered = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    ).sortWithinPartitions(*keys)
    shard = ordered.withColumn("__shard", F.spark_partition_id())
    if materialize:
        # the partial-sum pass and the window pass must see the SAME
        # sampled range boundaries (ids.py's determinism note)
        shard = shard.persist()
    partials = shard.groupBy("__shard", group_col).agg(
        F.sum(value_col).alias("__sum")
    )
    # prefix offsets per group across its (sorted) shard span, computed
    # as a window over the PARTIALS frame — each window partition holds
    # one group's handful of shard rows, so no task ever sorts more than
    # a group's shard count and the driver materializes nothing
    wp = (
        Window.partitionBy(group_col)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = F.broadcast(
        partials.select(
            F.col("__shard").alias("__oshard"),
            F.col(group_col).alias("__g"),
            F.coalesce(F.sum("__sum").over(wp), F.lit(0))
            .cast("long")
            .alias("__offset"),
        )
    )
    joined = shard.join(
        off_df,
        (F.col("__shard") == F.col("__oshard"))
        & F.col(group_col).eqNullSafe(F.col("__g")),
    ).drop("__oshard", "__g")
    if budget is not None:
        # prune whole blocks the budget can never reach — the tail of a
        # dominant group is filtered before any sorting work
        joined = joined.filter(F.col("__offset") <= F.lit(budget))
    w = Window.partitionBy("__shard", group_col).orderBy(*order_cols)
    out = (
        joined.withColumn(
            cum_col,
            (F.sum(value_col).over(w) + F.col("__offset")).cast("long"),
        )
        .drop("__shard", "__offset")
    )
    if budget is not None:
        out = out.filter(F.col(cum_col) <= F.lit(budget))
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    shard.unpersist()
    return out
