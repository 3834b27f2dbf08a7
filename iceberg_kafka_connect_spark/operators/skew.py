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
