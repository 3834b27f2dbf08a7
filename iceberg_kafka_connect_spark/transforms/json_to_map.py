"""JSON-to-Map SMT (P10): parse schemaless JSON strings.

Reference: transforms/JsonToMapTransform.java:62-129 + JsonToMapUtils.java:83-307.
Inference rules:
- scalars keep their JSON type (string/long/double/boolean, bigint→decimal)
- nested objects with consistent shape → struct; chaotic objects →
  ``map<string,string>`` (the reference's escape hatch for shape drift)
- mixed-type arrays → ``array<string>``; empty arrays/objects dropped
- ``json.root=true`` → don't descend at all: single column
  ``payload map<string,string>``

Spark-first: schema inference happens once per batch (sample → unified
schema via ``schema_of_json`` on a merged sample, or the map escape hatch),
then parsing is one JVM-side ``from_json`` — per-record Java inference in
the reference becomes plan-time inference + vectorized parse.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_batch_schema(spark, json_sample: list[str]) -> T.StructType:
    """Infer one schema for a batch of JSON documents, with the reference's
    long/double widening defaults (SchemaUtils.java:306-313: integral → long,
    fractional → double). Uses Spark's JSON reader on the sample so
    conflicting shapes merge the same way the full read will."""
    sdf = spark.read.json(
        spark.sparkContext.parallelize(json_sample),
        primitivesAsString=False,
    )
    return sdf.schema


def json_to_map(
    column: str = "value",
    root: bool = False,
    schema: T.StructType | None = None,
    sample_rows: int = 1000,
):
    """Returns a transform parsing ``column`` (a JSON string).

    root=True  → single ``payload map<string,string>`` column
                 (JsonToMapTransform.java "json.root" mode)
    root=False → struct with inferred (or provided) schema; nested chaos is
                 handled by the caller passing a schema with MapType members.
    """

    def _apply(df: DataFrame) -> DataFrame:
        if root:
            parsed = F.from_json(
                F.col(column), T.MapType(T.StringType(), T.StringType())
            )
            return df.withColumn("payload", parsed)
        use_schema = schema
        if use_schema is None:
            sample = [
                r[0]
                for r in df.select(column).filter(F.col(column).isNotNull())
                .limit(sample_rows).collect()
            ]
            if not sample:
                return df.withColumn(
                    "payload",
                    F.lit(None).cast(T.MapType(T.StringType(), T.StringType())),
                )
            use_schema = infer_batch_schema(df.sparkSession, sample)
        return df.withColumn("payload", F.from_json(F.col(column), use_schema))

    return _apply


def json_keys_as_strings(column: str):
    """The reference's chaotic-object escape hatch as a standalone transform:
    every JSON object becomes map<string,string> where nested values are
    re-serialized JSON text (JsonToMapUtils.java:112-178)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(
            f"{column}_map",
            F.from_json(F.col(column), T.MapType(T.StringType(), T.StringType())),
        )

    return _apply


def json_variant_columns(column: str, fields: dict[str, tuple[str, str]]):
    """The VARIANT lane of the JSON transforms (Spark 4 native): parse the
    JSON payload ONCE into a VariantType value and extract the requested
    fields as typed columns via ``variant_get`` paths.

    ``fields`` maps output column name → (variant path, spark type), e.g.
    ``{"k": ("$.k", "bigint"), "first_tag": ("$.tags[0]", "string")}``.

    Versus the two existing lanes (JsonToMapTransform parity,
    transforms/json_to_map.py): schema inference needs a sample pass and
    locks a schema; map<string,string> stringifies everything. Variant
    parses once into a binary-encoded value, keeps the full structure, and
    extraction is codegen'd path access with per-field typed casts — the
    right schemaless lane at 100 TB (no inference job, no per-query
    re-parse when the variant column is materialized upstream).
    """

    def _apply(df: DataFrame) -> DataFrame:
        # try_parse_json: malformed payloads are routine on a kafka topic —
        # they extract as NULLs instead of failing the batch (the same
        # tolerance the reference's JSON transforms have)
        v = F.try_parse_json(F.col(column))
        out = df
        for name, (path, dtype) in fields.items():
            out = out.withColumn(name, F.variant_get(v, path, dtype))
        return out

    return _apply
