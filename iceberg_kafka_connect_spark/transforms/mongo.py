"""Mongo Debezium SMT (P9): normalize MongoDB change-stream envelopes.

Reference: transforms/MongoDebeziumTransform.java:84-189 +
io/debezium/connector/mongodb/transforms/MongoDataConverter.java (~870 LoC of
per-record BSON walking). Debezium's Mongo connector ships ``before``/
``after`` as *extended-JSON strings*, and partial updates arrive as
``updateDescription{updatedFields(json), removedFields(array)}`` plus the
``documentKey``.

Spark-first re-expression: the BSON walk becomes plan-time schema + one
vectorized from_json per column:
- create/read/full-update → row parsed from ``after``
- delete → row parsed from ``before`` (or just the key)
- partial update (no full document) → row reconstructed as
  key ⊕ updatedFields, with removedFields → NULL — exactly the reference's
  updateDescription reconstruction (MongoDebeziumTransform.java:120-189)

The document schema is supplied (or inferred from a sample via
schema_of_json); extended-JSON wrappers like {"$numberLong": "5"} should be
normalized upstream or handled by string-typed fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _op_col(op: Column) -> Column:
    return (
        F.when(op == "u", F.lit("U"))
        .when(op == "d", F.lit("D"))
        .otherwise(F.lit("I"))
    )


def mongo_debezium_transform(
    doc_schema: T.StructType,
    key_field: str = "_id",
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
    update_desc_col: str = "updateDescription",
    document_key_col: str = "documentKey",
    ts_col: str = "ts_ms",
):
    """Returns a transform producing one flat row per change event with a
    ``_cdc`` struct, from string-JSON envelope columns."""

    def _apply(df: DataFrame) -> DataFrame:
        op = F.col(op_col)
        after = F.from_json(F.col(after_col), doc_schema)
        before = F.from_json(F.col(before_col), doc_schema)
        key = F.from_json(
            F.col(document_key_col),
            T.StructType([T.StructField(key_field, doc_schema[key_field].dataType)]),
        )
        upd = F.col(update_desc_col)
        updated = F.from_json(upd.getField("updatedFields"), doc_schema)
        removed = upd.getField("removedFields")

        # partial-update reconstruction: key ⊕ updatedFields, removed → NULL
        patched_fields = []
        for f in doc_schema.fields:
            if f.name == key_field:
                patched_fields.append(key.getField(key_field).alias(f.name))
            else:
                val = F.when(
                    removed.isNotNull() & F.array_contains(removed, f.name),
                    F.lit(None).cast(f.dataType),
                ).otherwise(updated.getField(f.name))
                patched_fields.append(val.alias(f.name))
        patched = F.struct(*patched_fields)

        # key-only row (delete with no before document)
        key_row = F.struct(
            *[
                key.getField(f.name).alias(f.name)
                if f.name == key_field
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in doc_schema.fields
            ]
        )

        row = (
            F.when(op == "d", F.coalesce(before, key_row))
            .when((op == "u") & F.col(after_col).isNotNull(), after)
            .when(op == "u", patched)
            .otherwise(after)
        )
        cdc = F.struct(
            _op_col(op).alias("op"),
            F.timestamp_millis(F.col(ts_col)).alias("ts"),
            key.getField(key_field).cast("string").alias("key"),
        ).alias("_cdc")
        passthrough = [
            c for c in ("topic", "partition", "offset", "timestamp") if c in df.columns
        ]
        out = df.select(row.alias("__row"), cdc, *passthrough)
        return out.filter(F.col("__row").isNotNull()).select(
            "__row.*", "_cdc", *passthrough
        )

    return _apply
