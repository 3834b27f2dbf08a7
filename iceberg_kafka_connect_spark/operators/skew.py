"""Skew-aware joins: key salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the *plan-time*
tool for the pathological case AQE can't fix: one join key so hot that even a
split partition floods a task, or skewed aggregations.

``salted_join`` explodes the small side S ways and salts the large side's
key with pmod(hash(row-identity), S) — each hot key's rows spread over S
tasks. Cost: the small side is replicated S times, so use it for
moderate-size right sides (or combine with broadcast thresholds).

``salted_agg_count`` shows the two-phase aggregation shape: partial agg on
(key, salt), final agg on key — the same trick Spark's partial aggregation
performs automatically for algebraic aggregates, made explicit for
non-algebraic ones (e.g. collect_set under skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` ⋈ ``small`` on column ``on`` with the large side's hot
    keys spread across ``salt_buckets`` shuffle partitions per key."""
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_large.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe count per key: (key, salt) partial → key final."""
    partial = (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
        )
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").cast("bigint").alias("n"))


def skew_profile(
    df: DataFrame,
    key: str,
    heavy_factor: float = 4.0,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> DataFrame:
    """The DIAGNOSIS half of skew handling: profile a join/agg key and
    recommend per-key salt bucket counts (``salted_join``/AQE are the
    remedy). A key is flagged heavy when its row count exceeds
    ``heavy_factor`` × the mean rows-per-key; the recommended salt is
    ceil(n_rows / mean) — enough buckets that each salted task carries
    roughly an average key's load.

    Scale shape: one groupBy(key) count (map-side combine), the global
    mean rides a broadcast 1-row crossJoin (never a driver collect), and
    the output is only the heavy tail — tiny by definition. At 100 TB
    profile a SAMPLE: ``sample_fraction`` pushes a Bernoulli sample into
    the scan before any shuffle; counts and the mean scale together, so
    skew factors are unbiased (exact path when None — the oracle-checked
    mode).

    Output: (key, n_rows, skew_factor, salt_buckets) ordered by n_rows
    DESC then key.
    """
    src = df
    if sample_fraction is not None:
        src = src.sample(fraction=sample_fraction, seed=seed)
    counts = src.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    stats = counts.agg(
        (F.sum("n_rows") / F.count(F.lit(1)))
        .cast("double")
        .alias("__mean")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.col("n_rows") > F.lit(heavy_factor) * F.col("__mean"))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows") / F.col("__mean")).alias("skew_factor"),
            F.ceil(F.col("n_rows") / F.col("__mean"))
            .cast("bigint")
            .alias("salt_buckets"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
    )
