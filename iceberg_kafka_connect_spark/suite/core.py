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


# Shared DuckDB CTE rendering the per-doc text profile (quality score,
# language id, counts) — the exact SQL mirror of operators/text.profile().
# Lives here so multiple suite modules can embed it in oracles without
# importing each other (which would perturb query registration order).
from ..operators import text as _tx  # noqa: E402

_STOP_SQL = {
    lang: "(" + ", ".join(f"'{w}'" for w in words) + ")"
    for lang, words in _tx.STOPWORDS.items()
}

# lowered word list / raw word list / per-language hit counts
PROFILE_CTE = rf"""
    base AS (
        SELECT doc_id, text,
               string_split_regex(trim(lower(text)), '\s+') AS lw,
               string_split_regex(trim(text), '\s+') AS rw
        FROM documents
    ),
    hits AS (
        SELECT *,
               len(list_filter(lw, x -> x IN {_STOP_SQL['de']})) AS h_de,
               len(list_filter(lw, x -> x IN {_STOP_SQL['en']})) AS h_en,
               len(list_filter(lw, x -> x IN {_STOP_SQL['es']})) AS h_es,
               len(list_filter(lw, x -> x IN {_STOP_SQL['fr']})) AS h_fr
        FROM base
    ),
    metrics AS (
        SELECT doc_id,
               CAST(len(rw) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred,
               (CAST(h_en AS DOUBLE) / CAST(len(lw) AS DOUBLE)) AS stopword_ratio,
               (CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
                          / CAST(length(text) AS DOUBLE)
                     ELSE 0.0 END) AS punct_ratio,
               (CAST(list_sum(list_transform(rw, x -> length(x))) AS DOUBLE)
                / CAST(len(rw) AS DOUBLE)) AS mean_word_len,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        FROM hits
    ),
    profile AS (
        SELECT *,
               (((least(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.3
                  + least(stopword_ratio * 5.0, 1.0) * 0.3)
                 + greatest(1.0 - punct_ratio * 4.0, 0.0) * 0.2)
                + (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
                        THEN 1.0 ELSE 0.5 END) * 0.2) AS quality
        FROM metrics
    )
"""
