"""Contiguous global ID assignment without a global sort.

``ROW_NUMBER() OVER (ORDER BY ...)`` is the semantic target, but its
physical plan funnels every row through ONE task (a single-partition
window) — a non-starter at corpus scale. This operator produces the
identical numbering with a two-phase plan that never serializes:

1. range-partition by the order key (``repartitionByRange`` samples the key
   distribution, so partitions are both sorted BETWEEN and balanced),
   sort within each partition;
2. count rows per partition (a metadata-sized aggregation, one row per
   partition collected to the driver), prefix-sum the counts into per-
   partition starting offsets, broadcast them back;
3. per-partition windows (partitionBy shard) add the local row number to
   the shard's offset.

Every phase is O(rows/partitions) per task; driver state is one long per
partition. The same shape backs Spark's own ``zipWithIndex`` — expressed
here in DataFrame terms so Catalyst keeps codegen and column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import local_df


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "global_id",
    start: int = 1,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Add ``id_col`` = contiguous rank of the row under ``order_cols``
    (ties broken by the full column tuple must be unique — same contract
    as deterministic ROW_NUMBER).

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY order_cols) + start - 1``
    but without the single-task global sort.
    """
    spark = df.sparkSession
    ordered = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    ).sortWithinPartitions(*order_cols)
    shard = ordered.withColumn("__shard", F.spark_partition_id())
    # persist so the count pass and the numbering pass see the same
    # partitioning (repartitionByRange re-samples per action otherwise,
    # which could move boundary rows between shards between the two jobs).
    # materialize=False skips BOTH the persist and the final checkpoint:
    # nothing is left cached (plan tests inspect the live plan), but the
    # two passes then rely on the input being deterministic — production
    # callers keep the default.
    if materialize:
        shard = shard.persist()
    counts = {
        r["__shard"]: r["n"]
        for r in shard.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, start
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    off_df = F.broadcast(
        local_df(spark, 
            [(s, o) for s, o in offsets.items()], "__shard int, __offset long"
        )
    )
    w = Window.partitionBy("__shard").orderBy(*order_cols)
    out = (
        shard.join(off_df, "__shard")
        .withColumn(
            id_col, (F.row_number().over(w) - 1 + F.col("__offset")).cast("long")
        )
        .drop("__shard", "__offset")
    )
    if not materialize:
        return out
    # materialize eagerly so the intermediate persist can be released here
    # instead of leaking for the session lifetime (same persist→checkpoint→
    # unpersist discipline as semantic_dedup); storage cost is the same
    # O(rows) class either way
    out = out.localCheckpoint(eager=True)
    shard.unpersist()
    return out


def split_thresholds(
    splits: tuple[tuple[str, float], ...], precision: int = 6
) -> list[tuple[str, str]]:
    """Cumulative md5-prefix thresholds for :func:`split_assign` — one
    ``(name, hex_threshold)`` per non-final split, as ``precision``-char
    lowercase hex strings. Exposed so oracle SQL can inline the SAME
    constants (the assignment is then engine-independent by construction)."""
    total = sum(f for _, f in splits)
    space = 16**precision
    out, acc = [], 0.0
    for name, frac in splits[:-1]:
        acc += frac / total
        out.append((name, format(int(acc * space), f"0{precision}x")))
    return out


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    ``split`` = the bucket of ``md5(seed ':' id)``'s first 6 hex chars
    under the cumulative split fractions. Properties that matter for a
    training corpus and that a random ``rand()`` split lacks:

    - stable: the same (seed, id) lands in the same split on every run,
      engine, cluster size, and row order — no RNG state, no shuffle;
    - append-consistent: adding new documents never reassigns old ones
      (each doc's split depends only on its own key), so a held-out set
      stays held out across corpus versions;
    - leakage-resistant across pipelines: keying on a stable document id
      (or a content digest) keeps all derived rows of one document —
      chunks, augmentations — in the same split when they inherit the key.

    Scale: a pure stateless projection — no shuffle, no driver state; the
    plan is one whole-stage-codegen'd CASE over an md5. Changing ``seed``
    produces an independent re-split (new holdout draw) without touching
    any stored data.
    """
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    bucket = F.substring(key, 1, 6)
    expr = F.lit(splits[-1][0])
    for name, thresh in reversed(split_thresholds(splits)):
        expr = F.when(bucket < F.lit(thresh), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
