"""Scale-safe top-K per group (bounded two-level aggregation, no windows).

``ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...) <= K`` is the semantic
target (per-domain caps, best-K-per-source sampling), but its physical
plan sorts EACH group inside one task — a dominant group (a mega-domain
in a crawl, a giant source) becomes a single giant sorted window
partition. This operator produces the identical rows with bounded state
everywhere:

1. each row gets a sub-shard id (hash of the tiebreaker column), so one
   group spans ``shards`` sub-groups;
2. level 1: ``groupBy(group, shard)`` keeps only its local top-K via
   ``slice(array_sort(collect_list(key-struct)), 1, K)`` — partial
   aggregation combines map-side, and no aggregation buffer ever holds
   more than a sub-shard;
3. level 2: ``groupBy(group)`` merges the ``shards`` arrays of ≤K —
   bounded by ``shards × K`` per group — re-sorts, slices K, and
   ``posexplode`` assigns the final rank.

The ordering struct sorts ascending; descending keys are rewritten into
ascending encodings: numerics negate (the standard struct-sort idiom,
with an explicit NaN pre-key on float/double so NaN ranks first exactly
like ``ORDER BY col DESC``), and strings byte-complement through a hex
``translate`` (pure Catalyst, no UDF) with a terminator character so
prefix pairs invert correctly. The LAST order column must be a unique
tiebreaker (same contract as the window form — ties would make ranks
nondeterministic).

Same family as ``operators/ids.py`` (global ids) and
``operators/budget.py`` (grouped cumulative sums): replace a per-group
serial pass with shard-partials + bounded merge. Reference analogue:
none — LLM-pipeline extension (per-domain caps are RefinedWeb §3.1 /
Gopher-style curation steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[tuple[str, str]],
    k: int,
    rank_col: str = "rk",
    shards: int = 64,
) -> DataFrame:
    """Rows ranked ``1..k`` per group — exactly ``ROW_NUMBER() OVER
    (PARTITION BY group_cols ORDER BY order_by) <= k`` — without sorting
    any whole group in one task.

    ``order_by`` is ``[(col, "asc"|"desc"), ...]``; descending columns
    may be numeric (negated into the ascending struct sort; float/double
    get an explicit NaN pre-key so NaN ranks FIRST under desc, matching
    ``ORDER BY col DESC``) or string (byte-complemented via a hex
    ``translate`` so "newest first" / "z before a" caps stay on the
    bounded path). The last entry must be a unique tiebreaker. Order
    keys must be non-null: ``array_sort`` and the window form place
    struct-field nulls differently, so null keys would diverge from the
    window twin — filter or coalesce them upstream. Output: the input
    columns plus ``rank_col`` (INT, 1-based).
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    schema = {f.name: f.dataType for f in df.schema.fields}
    keys = []
    for i, (name, direction) in enumerate(order_by):
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        col = F.col(name)
        if direction == "desc":
            dt = schema[name]
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                # -NaN is still NaN (sorts LAST ascending), but ORDER BY
                # col DESC puts NaN FIRST — a 0/1 pre-key restores that,
                # and NaN's negated value is zeroed so NaN rows tie
                # exactly (the tiebreaker then decides, as in the window)
                keys.append(
                    F.when(F.isnan(col), F.lit(0))
                    .otherwise(F.lit(1))
                    .alias(f"__k{i}n")
                )
                col = F.when(F.isnan(col), F.lit(0.0)).otherwise(-col)
            elif isinstance(dt, _NUMERIC):
                col = -col
            elif isinstance(dt, T.StringType):
                # order-reversing string encoding, pure Catalyst: hex the
                # UTF-8 bytes (hex-char order == unsigned byte order),
                # complement every hex digit, append a terminator that
                # sorts AFTER any hex char ('~' > 'F') so a prefix pair
                # ("ab" vs "abc") inverts correctly
                col = F.concat(
                    F.translate(
                        F.hex(F.encode(col, "UTF-8")),
                        "0123456789ABCDEF",
                        "FEDCBA9876543210",
                    ),
                    F.lit("~"),
                )
            else:
                raise ValueError(
                    f"desc order on column {name!r} of type {dt} is not "
                    "supported (numeric negation / string byte-complement "
                    "idioms); map it to a sortable numeric or string first"
                )
        keys.append(col.alias(f"__k{i}"))
    tiebreak = order_by[-1][0]
    payload = F.struct(*[F.col(c) for c in df.columns]).alias("__row")
    entry = F.struct(*keys, payload)
    level1 = (
        df.withColumn(
            "__shard", F.pmod(F.xxhash64(F.col(tiebreak)), F.lit(shards))
        )
        .groupBy(*group_cols, "__shard")
        .agg(
            F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("__top")
        )
    )
    merged = level1.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__top"))), 1, k
        ).alias("__top")
    )
    exploded = merged.select(
        *group_cols, F.posexplode("__top").alias("__pos", "__e")
    )
    return exploded.select(
        F.col("__e.__row.*"),
        (F.col("__pos") + 1).cast("int").alias(rank_col),
    )
