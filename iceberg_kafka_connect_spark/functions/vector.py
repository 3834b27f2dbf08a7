"""Vector math over array<float> embedding columns — pure Catalyst
expressions (zip_with/aggregate fold), no Python in the hot path.

Engine-parity detail: elements are cast float→double (exact) before the
multiply, and the sum is a *sequential left fold* — the oracle SQL mirrors it
with list_reduce, so both engines add the same doubles in the same order and
produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _fold_sum(terms: Column) -> Column:
    """Sequential left-to-right double fold. Order-fixed, so any engine doing
    the same left fold over the same doubles is bit-identical (the oracle SQL
    uses list_reduce, also a left fold)."""
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _fold_sum(prods)


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Bit-identical to ``dot()`` for ``dim``-length arrays — same double
    products, same left-to-right addition order (``(t0 + t1) + t2 …``
    equals the fold's ``((0.0 + t0) + t1) + t2 …`` bitwise) — but as an
    UNROLLED ``getItem`` expression chain. Why it exists: Spark's
    higher-order functions (zip_with / aggregate) are interpreted per
    element and never enter whole-stage codegen, so in a pairwise join
    the fold dominates; the unrolled chain compiles into the generated
    code. Rows whose arrays are shorter than ``dim`` yield NULL (getItem
    out of range), matching the fold's NULL propagation on
    length-mismatched zips."""
    terms = [
        a.getItem(i).cast("double") * b.getItem(i).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_unrolled_named(a: str, b: str, dim: int) -> Column:
    """``dot()`` as ONE parsed, codegen-friendly SQL expression over column
    NAMES. Bitwise-identical to the fold for every input:

    - the chain starts with an explicit ``0.0 +`` so the addition sequence
      is exactly the fold's ``((0.0 + t0) + t1) + …`` (same signed-zero
      behavior, not just "mathematically equal");
    - ``try_element_at`` (1-based) yields NULL out-of-range under ANSI, so
      any row whose arrays are shorter than ``dim`` yields NULL — pair it
      with ``F.coalesce(dot_unrolled_named(...), dot(...))`` and such rows
      fall back to the fold, which computes whatever the fold semantics say.

    Why it exists: Spark's higher-order functions (zip_with/aggregate) are
    interpreted per element and keep the surrounding projection out of
    whole-stage codegen, so in a pairwise join the fold dominates; this
    form compiles. Building it as one expr string keeps driver-side
    construction at one py4j round-trip (the composed ``getItem`` chain
    costs ~0.6s of py4j time at dim=64)."""
    terms = " + ".join(
        f"CAST(try_element_at({a}, {i}) AS DOUBLE) * "
        f"CAST(try_element_at({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return F.expr(f"(CAST(0.0 AS DOUBLE) + {terms})")


# Unroll ceiling for cosine_with_norms_fast. Above it the unrolled chain
# is a pure liability: janino refuses the 256+-term Add chain (measured:
# dims 256-512 all log "Failed to compile" and run interpreted anyway),
# and Catalyst's own genCode recursion over the chain can overflow an
# executor task thread's stack — a java.lang.StackOverflowError outside
# janino's try/catch reaches SparkUncaughtExceptionHandler and KILLS the
# local JVM (reproduced at dim=512 via IVFIndex search + brute_force_topk,
# tests/test_ivf.py::test_high_dim_build_and_search). 128 is measured
# safe (compiles, and matches the widest agg chains elsewhere in the
# repo, e.g. the 128-hash MinHash sketch).
_UNROLL_MAX_DIM = 128


def cosine_with_norms_fast(
    a: str, b: str, na: Column, nb: Column, dim: int | None
) -> Column:
    """``cosine_with_norms`` with the dot product unrolled for codegen when
    the embedding dimensionality is known (bit-identical either way; see
    dot_unrolled_named). ``dim=None`` — or dim beyond the codegen-safe
    unroll ceiling — falls back to the fold form."""
    if not dim or dim > _UNROLL_MAX_DIM:
        return cosine_with_norms(F.col(a), F.col(b), na, nb)
    num = F.coalesce(dot_unrolled_named(a, b, dim), dot(F.col(a), F.col(b)))
    return num / (na * nb)


def infer_dim(df, vec_col: str) -> int | None:
    """Embedding dimensionality from the first row (one LIMIT-1 job);
    None when the frame is empty or the first vector is NULL/empty."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row and row["d"] and row["d"] > 0 else None


def norm2(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_fold_sum(sq))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine() with the row norms precomputed. Bit-identical to cosine()
    (same expression tree: dot / (norm_a * norm_b)) but the O(dim) norm
    folds run once per ROW instead of once per PAIR — in a pairwise join
    that's 3× less fold work, and the saving grows with pair fan-out."""
    return dot(a, b) / (na * nb)


# DuckDB SQL shapes computing the identical values (same double products,
# same left-fold order). Used by the suite's oracle strings.
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def sql_norm2(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"(x, y) -> x + y))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm2(a)} * {sql_norm2(b)}))"
