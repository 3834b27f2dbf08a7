"""CopyValue SMT (P6): duplicate one field into a new field.

Reference: transforms/CopyValue.java:37-131. The reference rebuilds the
Connect schema and caches it per-schema (LRU); in Spark the schema is
plan-time so the whole operator is a single withColumn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copy_value(source_field: str, target_field: str):
    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(target_field, F.col(source_field))

    return _apply
