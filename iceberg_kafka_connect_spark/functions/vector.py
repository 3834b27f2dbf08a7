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
