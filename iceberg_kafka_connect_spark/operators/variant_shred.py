"""Variant shredding: typed_value columns alongside a variant column.

Iceberg v3 adds the ``variant`` type and the Parquet Variant Shredding
spec stores a ``typed_value`` tree next to the opaque ``value`` binary so
engines scan/filter hot paths as plain typed columns. Spark's parquet
writer owns the physical VARIANT group layout; what this module
implements is the spec's SEMANTIC contract at the table level:

- ``shred_variant`` extracts the declared shred fields with
  ``variant_get`` — pure JVM, whole-stage codegen — into a
  ``<col>_typed`` struct column. Written to parquet, those become real
  typed columns with min/max stats: filters on them push down to the
  scan and prune row groups, and a query touching only shredded fields
  never reads the variant binary at all (column pruning drops it).
  ``keep_value=True`` (default) keeps the full variant beside the typed
  struct — the spec's "value + typed_value both present" state, needed
  when readers may ask for fields outside the shred set.
- ``unshred_variant`` reassembles a single variant column, preferring
  the residual ``value`` when present (it is authoritative: the full
  document), else rebuilding from the typed struct via
  ``parse_json(to_json(struct))`` — the spec's reassembly rule for
  fully-shredded columns.

Scale: both directions are expression-only (no shuffle, no Python); a
100 TB shredded table pays one projection at write and gets
stats-pruned typed scans forever after. Plan shape (PushedFilters on
``<col>_typed.<field>``, variant column absent from ReadSchema) is
pinned in tests/test_variant.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _variant_get(col: str | Column, field: str, dtype: T.DataType) -> Column:
    """Spec extraction rule: a shredded field materializes as its
    declared type; a value of a DIFFERENT type stays in the residual
    (typed_value null) — Spark's try_variant_get gives exactly that
    null-on-mismatch behavior."""
    return F.try_variant_get(col, f"$.{field}", dtype.simpleString())


def shred_variant(
    df: DataFrame,
    col: str,
    shred_schema: T.StructType,
    keep_value: bool = True,
    typed_col: str | None = None,
) -> DataFrame:
    """Materialize ``shred_schema``'s fields from variant column ``col``
    into a ``<col>_typed`` struct (spec: the typed_value tree).

    Field names containing dots address nested paths (``"geo.lat"``
    shreds ``$.geo.lat`` into a field named ``geo_lat``).
    """
    typed_name = typed_col or f"{col}_typed"
    members = []
    for f in shred_schema.fields:
        alias = f.name.replace(".", "_")
        members.append(_variant_get(col, f.name, f.dataType).alias(alias))
    out = df.withColumn(typed_name, F.struct(*members))
    if not keep_value:
        out = out.drop(col)
    return out


def unshred_variant(
    df: DataFrame,
    col: str,
    typed_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Reassemble one variant column from a shredded pair.

    With the residual present it wins (full-document authority); a
    fully-shredded table (typed struct only) rebuilds the variant from
    the typed fields. Output replaces ``col`` (or lands in
    ``out_col``)."""
    typed_name = typed_col or f"{col}_typed"
    target = out_col or col
    if typed_name not in df.columns:
        raise ValueError(f"no shredded struct column {typed_name!r}")
    rebuilt = F.parse_json(F.to_json(F.col(typed_name)))
    src = (
        F.coalesce(F.col(col), rebuilt) if col in df.columns else rebuilt
    )
    out = df.withColumn(target, src)
    return out.drop(typed_name) if typed_name != target else out


def shredded_filter_plan(df: DataFrame) -> str:
    """Executed-plan text for pushdown/pruning assertions in tests."""
    return df._jdf.queryExecution().executedPlan().toString()
