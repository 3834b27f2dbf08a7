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
2. per-(shard, group) partial sums: one map-side-combined aggregation,
   collecting one row per (shard, group) pair to the driver — bounded by
   ``#shards + #group boundaries``, never O(rows);
3. prefix-sum the partials into per-(shard, group) starting offsets,
   broadcast them back;
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
from pyspark.sql import types as T
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
    spark = df.sparkSession
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
    partials = (
        shard.groupBy("__shard", group_col)
        .agg(F.sum(value_col).alias("__sum"))
        .collect()
    )
    # prefix offsets per group across its (sorted) shard span
    acc: dict = {}
    offs = []
    for r in sorted(partials, key=lambda r: r["__shard"]):
        g = r[group_col]
        offs.append((r["__shard"], g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + (r["__sum"] or 0)
    off_df = F.broadcast(
        spark.createDataFrame(
            offs,
            T.StructType(
                [
                    T.StructField("__oshard", T.IntegerType()),
                    T.StructField("__g", df.schema[group_col].dataType),
                    T.StructField("__offset", T.LongType()),
                ]
            ),
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
