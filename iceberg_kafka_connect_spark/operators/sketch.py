"""Exact frequent-item mining with bounded memory (Misra-Gries candidates
+ exact recount).

``GROUP BY term HAVING count >= support`` over an exploded 100 TB token
stream shuffles EVERY distinct term — billions of groups for a handful
of survivors. The classic two-pass fix (Misra-Gries 1982; mergeable-
summaries form, Agarwal et al. PODS'12):

1. **Candidates**: each partition streams its items through a
   Misra-Gries summary with capacity ``k = floor(N / support) + 1``.
   MG's guarantee (undercount ≤ n_p/(k+1) per partition) plus
   pigeonhole (an item with global count ≥ support has local count
   ≥ support/P somewhere) make the union of partition survivors a
   SUPERSET of every globally-frequent item — memory is O(N/support)
   per partition (the max possible number of frequent items),
   independent of the distinct-item count.
2. **Recount**: broadcast the candidate set (≤ partitions × k strings),
   semi-join-filter the stream, and exactly count ONLY candidates. The
   shuffle now carries candidate items only.

Output is EXACT (pass 2 recounts), so the operator is oracle-checkable
against plain SQL. The per-partition MG runs inside ``mapInPandas``
batch-wise: each Arrow batch is first collapsed with ``value_counts``
(vectorized) and only the batch's UNIQUE items touch the Python dict —
the mergeable-summaries composition of an exact batch summary into MG.

Reference analogue: none (LLM-pipeline extension) — hot-token /
boilerplate-phrase / hot-key detection at corpus scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import local_df


def _mg_candidates(col: str, capacity: int):
    def run(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, cnt in vc.items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > capacity:
                # mergeable-summaries eviction: subtract the (k+1)-th
                # largest count from everything, drop the non-positive
                vals = sorted(counters.values(), reverse=True)
                cut = vals[capacity]
                counters = {
                    i: c - cut for i, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return run


def frequent_items(
    df: DataFrame,
    col: str,
    support: int,
    total: int | None = None,
    count_col: str = "n",
    slack: int = 4,
) -> DataFrame:
    """All items of ``df[col]`` occurring at least ``support`` times, with
    EXACT counts — equivalent to ``GROUP BY col HAVING count >= support``
    but with per-task memory bounded by O(total/support) instead of the
    distinct-item count, and a shuffle carrying only candidate items.

    ``support`` must be positive; ``total`` (the row count) is counted
    with one cheap pass when not provided. The input should be one item
    per row (explode upstream); NULL items are ignored (they are not a
    countable item — filter upstream if NULL frequency matters).

    ``slack`` over-provisions the MG capacity: the no-false-negative
    guarantee needs the undercount bound ``n_p/(k+1)`` to stay below the
    pigeonhole floor ``support/P``, which holds for any partition up to
    ``slack``× the balanced size — eviction memory is tiny, so the
    default absorbs heavy input skew.
    """
    if support <= 0:
        raise ValueError(f"support must be positive, got {support}")
    spark = df.sparkSession
    items = df.select(F.col(col).alias(col))
    if total is None:
        total = items.count()
    if total == 0:
        return local_df(spark, 
            [],
            T.StructType(
                [
                    T.StructField(col, df.schema[col].dataType),
                    T.StructField(count_col, T.LongType()),
                ]
            ),
        )
    capacity = slack * math.floor(total / support) + 1
    schema = T.StructType([df.schema[col]])
    candidates = (
        items.mapInPandas(_mg_candidates(col, capacity), schema)
        .distinct()
    )
    return (
        items.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) >= support)
    )


def kmv_ndv(
    df: DataFrame,
    columns: list[str],
    k: int = 4096,
) -> dict[str, int]:
    """Distinct-count per column via the KMV (k-minimum-values) bottom-k
    sketch (Bar-Yossef et al., RANDOM'02) — INTEGER-EXACT and therefore
    oracle-checkable, unlike HLL:

    - h(v) = the first 15 hex chars of md5(v) as a 60-bit integer (the
      same deterministic hash the shard-shuffle/epoch operators use);
    - fewer than k distinct hashes → the sketch IS the distinct set and
      the count is exact;
    - otherwise ndv ≈ (k−1) · 2^60 / m_k where m_k is the k-th smallest
      distinct hash — evaluated in pure integer arithmetic, so Spark and
      an ANSI-SQL twin (ORDER BY hash LIMIT k) agree bit-for-bit.

    Scale shape: ``distinct().orderBy(h).limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps only its bottom-k
    hashes and the driver merges P·k values — the textbook mergeable
    bottom-k execution, never a global sort, never a full distinct
    collect. NULLs don't count (SQL NDV convention).
    """
    return {c: kmv_estimate(kmv_sketch(df, c, k), k) for c in columns}


def kmv_sketch(df: DataFrame, column: str, k: int = 4096) -> list[int]:
    """The bottom-k distinct 60-bit hashes of ``column`` (the KMV sketch
    state), ascending. Mergeable: union two sketches' values and
    re-truncate to the k smallest."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col(column).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return [
        r[0]
        for r in df.select(h.alias("__h"))
        .filter(F.col(column).isNotNull())
        .distinct()
        .orderBy("__h")
        .limit(k)
        .collect()
    ]


def kmv_estimate(bottom: list[int], k: int) -> int:
    """NDV from a sketch state: exact when the state holds fewer than k
    values (the state IS the distinct hash set), else the integer KMV
    estimator (k−1)·2^60 / m_k."""
    if len(bottom) < k:
        return len(bottom)
    return (k - 1) * (1 << 60) // bottom[-1]


def kmv_serialize(bottom: list[int], k: int) -> bytes:
    """Sketch wire form: big-endian uint32 k, uint32 count, then the
    ascending uint64 hash values — enough for a reader to merge or
    re-estimate without rescanning."""
    import struct

    return struct.pack(">II", k, len(bottom)) + struct.pack(
        f">{len(bottom)}Q", *bottom
    )


def kmv_deserialize(blob: bytes) -> tuple[list[int], int]:
    """Inverse of :func:`kmv_serialize`; returns (values, k)."""
    import struct

    k, n = struct.unpack(">II", blob[:8])
    return list(struct.unpack(f">{n}Q", blob[8 : 8 + 8 * n])), k
