"""Shared helpers for the query suite: table loading and engine-parity
numeric idioms.

Floating-point sums are not associative, so a parallel Spark aggregation and
a DuckDB aggregation over the same doubles can differ in the last ULP and
fail a value-hash comparison. Every money/measure aggregation in this suite
therefore casts to DECIMAL first (exact, order-independent), aggregates, and
casts the final value back to DOUBLE. Both engines then produce bit-identical
doubles. The same SQL shape is used in the oracle strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Force-broadcast only the FIXED-cardinality dimensions (region: 5 rows,
# nation: 25 rows — constant at any scale factor). Everything else —
# supplier, part, customer — grows with SF and would eventually blow past
# executor memory as a forced broadcast; parquet size estimates + AQE
# broadcast them while small and fall back to shuffle joins beyond the
# threshold (the plan tests pin that the local-SF plans stay broadcast).
BROADCAST_DIMS = {"region", "nation"}


# Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as long
# nanos (legacy conf) and we truncate to micros, matching DuckDB's floor
# behavior for TIMESTAMP_NS → TIMESTAMP.
NANOS_COLS = {"events": ("ts",)}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in NANOS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in NANOS_COLS[name]:
            if dict(df.dtypes).get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A dimension table, hinted for broadcast join."""
    df = table(spark, sf_dir, name)
    return F.broadcast(df) if name in BROADCAST_DIMS else df


def dsum(col, scale: int = 4, alias: str | None = None):
    """Order-independent double sum: DOUBLE -> DECIMAL(27,scale) -> SUM -> DOUBLE."""
    c = F.sum(col.cast(f"decimal(27,{scale})")).cast("double")
    return c.alias(alias) if alias else c


def davg(col, scale: int = 4, alias: str | None = None):
    """Order-independent double mean: decimal sum / count, IEEE division."""
    c = (
        F.sum(col.cast(f"decimal(27,{scale})")).cast("double")
        / F.count(col).cast("double")
    )
    return c.alias(alias) if alias else c


# The matching SQL shapes for DuckDB oracles.
def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE))"
    )
