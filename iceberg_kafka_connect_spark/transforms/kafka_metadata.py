"""Kafka metadata SMT (P11): append topic/partition/offset/timestamp.

Reference: transforms/KafkaMetadataTransform.java:90-294. Options: nested
(one struct field) vs flat (prefixed columns), plus an optional static
``external_field`` constant (e.g. cluster id).

Spark's kafka source already exposes topic/partition/offset/timestamp columns
on every record, so this transform just re-shapes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METADATA_COLS = ("topic", "partition", "offset", "timestamp")


def kafka_metadata(
    nested: bool = True,
    key_prefix: str = "_kafka_metadata",
    external_field: tuple[str, str] | None = None,
):
    def _apply(df: DataFrame) -> DataFrame:
        fields = [F.col(c).alias(c) for c in _METADATA_COLS if c in df.columns]
        if external_field is not None:
            name, value = external_field
            fields.append(F.lit(value).alias(name))
        if nested:
            return df.withColumn(key_prefix, F.struct(*fields))
        out = df
        for fld in fields:
            # flat mode prefixes each column (KafkaMetadataTransform.java:118-139)
            meta = fld._jc.toString().split(" AS ")[-1].strip("`")
            out = out.withColumn(f"{key_prefix}_{meta}", fld)
        return out

    return _apply
