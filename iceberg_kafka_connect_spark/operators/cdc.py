"""CDC semantics: op extraction, last-wins collapse, and merge application.

Reference parity:
- op extraction (P5): data/IcebergWriter.java:109-131, data/Operation.java:21-25 —
  first char of the cdc field, case-insensitive, I/U/D, default INSERT.
- delta write (S5): data/BaseDeltaTaskWriter.java:71-84 — for UPDATE/DELETE an
  equality delete on the id columns is written, then for INSERT/UPDATE the row
  is appended. Records apply strictly in arrival order, so for duplicate keys
  within a batch the LAST operation wins.

Spark-first: arrival order inside a micro-batch is (partition, offset). The
reference's sequential per-record apply collapses to a window `row_number`
keeping the last record per key, after which the batch can be applied with a
single MERGE-shaped join. This is the mandatory pre-MERGE dedup called out in
SURVEY.md §7 step 5.

Scale: one shuffle on the id columns for the window; the merge join shuffles
on the same columns so the exchange is reused. Skewed keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

INSERT, UPDATE, DELETE = "I", "U", "D"


def cdc_op_col(cdc_field: str, default: str = INSERT) -> Column:
    """First char of the cdc field, uppercased; I/U/D else default
    (IcebergWriter.java:117-129)."""
    first = F.upper(F.substring(F.col(cdc_field).cast("string"), 1, 1))
    return (
        F.when(first.isin(INSERT, UPDATE, DELETE), first)
        .otherwise(F.lit(default))
        .alias("_cdc_op")
    )


def collapse_last_wins(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "_cdc_op",
) -> DataFrame:
    """Keep only the final operation per key, in ``order_cols`` arrival order.

    Mirrors the reference's sequential apply: intermediate ops for a key have
    no effect on the end state of the batch (delete then re-insert ≡ upsert;
    anything then delete ≡ delete).
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    base: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "_cdc_op",
) -> DataFrame:
    """Apply a CDC batch to a base relation: the read-side semantics of the
    reference's equality-delete + append (BaseDeltaTaskWriter.java:58-84),
    expressed as one anti-join + one union:

      result = (base ANTI JOIN batch_keys) ∪ (batch last-wins WHERE op != D)

    Equality deletes drop *every* base row matching the key — including rows
    the batch never saw — exactly like the reference; MERGE INTO has the same
    effect here because the collapsed batch has unique keys.
    """
    last = collapse_last_wins(batch, key_cols, order_cols, op_col)
    keys = last.select(*key_cols)
    survivors = base.join(keys, on=key_cols, how="left_anti")
    upserts = last.filter(F.col(op_col) != DELETE).select(*base.columns)
    return survivors.unionByName(upserts)


def compute_updates(changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Iceberg ``create_changelog_view(..., identifier_columns=...)``
    parity: within one change ordinal, a key carrying EXACTLY one delete
    and one insert is an update — the pair relabels to ``update_before``
    / ``update_after``. Other shapes (pure insert, pure delete, duplicate
    copies of a key) pass through unchanged, exactly as Iceberg's
    changelog procedure leaves non-pairable rows as insert/delete.

    Note the equality-delete caveat shared with Iceberg: an upsert's
    delete file records keys whether or not a row existed, so a
    first-time key still pairs into an update (the net apply semantics
    are identical); and an ``update_before`` carries only the key columns
    (equality deletes record keys, not pre-images).

    Scale: one window shuffle on (ordinal, key) — the same key
    distribution the downstream merge/apply shuffles on, so the exchange
    is reused."""
    w = Window.partitionBy("_change_ordinal", *key_cols)
    n_del = F.sum(
        F.when(F.col("_change_type") == "delete", 1).otherwise(0)
    ).over(w)
    n_ins = F.sum(
        F.when(F.col("_change_type") == "insert", 1).otherwise(0)
    ).over(w)
    pair = (n_del == F.lit(1)) & (n_ins == F.lit(1))
    return changes.withColumn(
        "_change_type",
        F.when(
            pair & (F.col("_change_type") == "delete"),
            F.lit("update_before"),
        )
        .when(
            pair & (F.col("_change_type") == "insert"),
            F.lit("update_after"),
        )
        .otherwise(F.col("_change_type")),
    )
