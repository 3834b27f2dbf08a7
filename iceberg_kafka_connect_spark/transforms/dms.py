"""AWS DMS envelope normalization SMT (P8).

Reference: transforms/DmsTransform.java:36-105. DMS wraps the row in
``data`` and puts operation metadata in ``metadata``:
- payload row = ``data.*``
- op from metadata.operation: insert/load → I, update → U, delete → D
- ``_cdc`` struct {op, ts, source} where source = "{schema-name}.{table-name}"
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dms_transform(data_col: str = "data", metadata_col: str = "metadata"):
    def _apply(df: DataFrame) -> DataFrame:
        md = F.col(metadata_col)
        op_raw = F.lower(md.getField("operation"))
        op = (
            F.when(op_raw == "update", F.lit("U"))
            .when(op_raw == "delete", F.lit("D"))
            .otherwise(F.lit("I"))  # insert, load
        )
        source = F.concat_ws(
            ".", md.getField("schema-name"), md.getField("table-name")
        )
        cdc = F.struct(
            op.alias("op"),
            F.to_timestamp(md.getField("timestamp")).alias("ts"),
            source.alias("source"),
        ).alias("_cdc")
        passthrough = [
            c for c in ("topic", "partition", "offset", "timestamp") if c in df.columns
        ]
        out = df.select(F.col(data_col).alias("__row"), cdc, *passthrough)
        return out.filter(F.col("__row").isNotNull()).select(
            "__row.*", "_cdc", *passthrough
        )

    return _apply
