"""Debezium envelope normalization SMT (P7).

Reference: transforms/DebeziumTransform.java:64-242 + CdcConstants.java:21-33.
Semantics:
- payload row = ``after`` (or ``before`` when op is delete)
- op mapping: c/r → I, u → U, d → D (DebeziumTransform.java:151-167)
- a ``_cdc`` struct is attached: {op, ts, offset?, source, target, key?}
- target table name derived from source {db}.{table}, optionally rewritten
  via ``cdc.target.pattern`` with {db}/{table} placeholders
  (DebeziumTransform.java:209-231)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _op_from_debezium(op: Column) -> Column:
    return (
        F.when(op == "u", F.lit("U"))
        .when(op == "d", F.lit("D"))
        .otherwise(F.lit("I"))  # c, r and anything else → insert
    )


def debezium_target_name(source: Column, pattern: str | None = None) -> Column:
    """``{db}.{table}`` from the source struct; Debezium puts the db name in
    ``db`` for MySQL-family and ``schema`` for Postgres-family connectors
    (DebeziumTransform.java:209-231)."""
    db = F.coalesce(source.getField("db"), source.getField("schema"))
    tbl = source.getField("table")
    if pattern is None:
        return F.concat_ws(".", db, tbl)
    # rewrite with placeholders, e.g. "ice_{db}.{table}_sink"
    out = F.lit(pattern)
    out = F.replace(out, F.lit("{db}"), db)
    out = F.replace(out, F.lit("{table}"), tbl)
    return out


def debezium_transform(
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
    source_col: str = "source",
    ts_col: str = "ts_ms",
    target_pattern: str | None = None,
    keep_offset_cols: tuple[str, str] | None = None,
):
    """Unwrap a Debezium envelope DataFrame into flat rows + ``_cdc`` struct.

    Input columns: op, before, after (same struct type), source struct, ts_ms.
    Output: the row fields of after/before flattened, plus ``_cdc`` struct
    with fields (op, ts, source, target[, offset]).
    """

    def _apply(df: DataFrame) -> DataFrame:
        op = F.col(op_col)
        row = F.when(op == "d", F.col(before_col)).otherwise(F.col(after_col))
        cdc_fields = [
            _op_from_debezium(op).alias("op"),
            F.timestamp_millis(F.col(ts_col)).alias("ts"),
            debezium_target_name(F.col(source_col)).alias("source"),
            debezium_target_name(F.col(source_col), target_pattern).alias("target"),
        ]
        if keep_offset_cols is not None:
            part, off = keep_offset_cols
            cdc_fields.append(F.col(off).alias("offset"))
        # kafka metadata columns pass through so downstream offset tracking
        # and arrival ordering keep working after the unwrap
        passthrough = [
            c for c in ("topic", "partition", "offset", "timestamp") if c in df.columns
        ]
        out = df.select(
            row.alias("__row"), F.struct(*cdc_fields).alias("_cdc"), *passthrough
        )
        return out.filter(F.col("__row").isNotNull()).select(
            "__row.*", "_cdc", *passthrough
        )

    return _apply
