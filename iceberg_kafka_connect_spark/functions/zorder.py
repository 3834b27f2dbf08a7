"""Z-order (Morton) interleaving as a pure Catalyst expression.

Iceberg's rewrite_data_files supports strategy=sort with a z-order sort
expression (the reference delegates to that runtime; Spark's own
RewriteDataFilesSparkAction ships ZOrderByteUtils). The point of z-order
over a lexicographic sort: a lexicographic sort on (x, y) makes file bounds
sharp on x but useless on y; interleaving the bits of x and y gives every
indexed column locality, so predicate file-pruning works on ANY of them.

This implementation is expression-only (no UDF, no shuffle of its own):

1. each column is normalized to an integer bucket in [0, 2^bits) using the
   column's global [min, max] — rank-free, one multiply per row;
2. buckets are bit-interleaved into one long; sorting by that long is the
   space-filling curve order.

``bits = 63 // n_cols`` capped at 16 — 16 bits per dimension ≈ 65k distinct
cells per column, far finer than any practical file count, so the curve
order is never the pruning bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(df: DataFrame, name: str) -> Column:
    """Numeric/date/timestamp column → double for range normalization."""
    dt = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        return c.cast("double")  # seconds since epoch (fractional)
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    raise ValueError(
        f"z-order column {name!r} has non-orderable-numeric type {dt}"
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    ranges: dict[str, tuple[float, float]],
) -> Column:
    """The interleaved z-value for ``cols`` given per-column global
    ``ranges`` (min, max). Null values sort first (bucket 0), matching
    NULLS FIRST of a plain sort."""
    if len(cols) < 2:
        raise ValueError("z-order needs at least 2 columns")
    n = len(cols)
    bits = min(16, 63 // n)
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, name in enumerate(cols):
        lo, hi = ranges[name]
        v = _as_double(df, name)
        if hi > lo:
            frac = (v - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
            bucket = F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(frac * F.lit(float(top + 1))).cast("long"),
                ),
            )
        else:  # constant column: every row in bucket 0
            bucket = F.lit(0).cast("long")
        bucket = F.coalesce(bucket, F.lit(0).cast("long"))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z
