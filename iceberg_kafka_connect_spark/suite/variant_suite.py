"""Variant-type gates: Iceberg v3 ``variant`` columns in the lakehouse
and the shredding read path.

The v3 spec adds ``variant`` for semi-structured data; the Parquet
Variant Shredding spec makes hot fields scannable as typed columns.
Gates here prove both value-level: a variant column commits to a v3
table, round-trips the exporter (schema type ``variant``, validator
green), and a SHREDDED scan — filter + aggregate on typed_value columns
only — matches DuckDB recomputing from the raw JSON strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register
from .core import table


@register(
    "variant_lakehouse_roundtrip",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 7 AS k_mod,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    WHERE event_id < 4000
    GROUP BY 1, 2
    """,
    tags=("lakehouse", "variant"),
)
def variant_lakehouse_roundtrip(spark, sf_dir):
    """JSON props parse to a VARIANT column, commit to a v3 lakehouse
    table, export through the Iceberg v3 tree (schema type ``variant``,
    spec-validated), and read back for a typed aggregation. Scale: the
    variant parse and every extraction are JVM expressions; the table
    write/read is the ordinary parquet path."""
    import tempfile

    from ..sinks.iceberg_export import export_iceberg_metadata
    from ..sinks.spec_validator import validate_exported_tree
    from ..sinks.table import LakehouseTable

    e = (
        table(spark, sf_dir, "events", fan=False)  # commit gate
        .where(F.col("event_id") < 4000)
        .select(
            "event_id",
            "event_type",
            F.parse_json("props").alias("payload"),
        )
    )
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="variant_gate_"),
        e.schema,
        properties={"format-version": "3"},
    )
    t.append(e)
    out = export_iceberg_metadata(t)
    errs = validate_exported_tree(out)
    assert not errs, errs[:3]
    back = t.read(spark)
    k = F.variant_get("payload", "$.k", "long")
    return back.groupBy(
        (k % 7).alias("k_mod"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
    )


@register(
    "variant_shredded_scan",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    WHERE k >= 50
    GROUP BY event_type
    """,
    tags=("lakehouse", "variant"),
)
def variant_shredded_scan(spark, sf_dir):
    """Shredded scan: the variant's hot field materializes as a typed
    column at write (Parquet Variant Shredding semantics); the reading
    query filters and aggregates ONLY typed_value columns, so the scan
    prunes the variant binary entirely and the ``k >= 50`` predicate
    pushes down to parquet row-group stats (plan pinned in
    tests/test_variant.py). At 100 TB this is the difference between
    decoding every variant document and a stats-pruned long-column
    scan."""
    import tempfile

    from ..operators.variant_shred import shred_variant

    e = table(spark, sf_dir, "events", fan=False).select(
        "event_type", F.parse_json("props").alias("payload")
    )
    shredded = shred_variant(
        e,
        "payload",
        T.StructType([T.StructField("k", T.LongType())]),
        keep_value=True,
    )
    path = tempfile.mkdtemp(prefix="variant_shred_") + "/t"
    shredded.write.parquet(path)
    back = spark.read.parquet(path)
    return (
        back.where(F.col("payload_typed.k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("payload_typed.k").cast("bigint").alias("sum_k"),
        )
    )
