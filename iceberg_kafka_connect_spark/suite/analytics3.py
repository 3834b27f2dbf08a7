"""Third analytics batch: operator classes not yet covered — multi-dim
aggregation (ROLLUP), PIVOT, and set operations (INTERSECT/EXCEPT)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .core import dsum, sql_dsum, table


# --------------------------------------------------------------------------
# ROLLUP: hierarchical totals in one pass (year → priority → grand total).
# Spark expands grouping sets map-side; one shuffle covers all levels.
# --------------------------------------------------------------------------
@register(
    "orders_rollup",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 2)} AS total_price
    FROM orders
    GROUP BY ROLLUP(order_year, o_orderpriority)
    ORDER BY order_year NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("analytics", "bench"),
)
def orders_rollup(spark, sf_dir):
    o = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return (
        o.rollup("order_year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2, "total_price"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# PIVOT: return-flag columns per line status — conditional aggregation
# materialized as columns (Spark pivot ≡ SQL FILTERed aggregates).
# --------------------------------------------------------------------------
@register(
    "lineitem_pivot_returnflag",
    oracle=f"""
    SELECT l_linestatus,
           {sql_dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE NULL END", 2)} AS qty_A,
           {sql_dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE NULL END", 2)} AS qty_N,
           {sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE NULL END", 2)} AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("analytics", "bench"),
)
def lineitem_pivot_returnflag(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    pivoted = (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double"))
    )
    return pivoted.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    ).orderBy("l_linestatus")


# --------------------------------------------------------------------------
# Funnel: signup → purchase conversion per user. One shuffle on user_id;
# the conditional mins collapse each user to two timestamps before the
# conversion predicate.
# --------------------------------------------------------------------------
@register(
    "events_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(COUNT(first_signup) AS BIGINT) AS n_signed_up,
           CAST(SUM(CASE WHEN first_purchase > first_signup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM per_user
    """,
    tags=("analytics", "bench"),
)
def events_funnel(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.73x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    e = table(spark, sf_dir, "events", fan=False)
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").cast("bigint").alias("n_signed_up"),
        F.sum(
            F.when(F.col("first_purchase") > F.col("first_signup"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_converted"),
    )


# --------------------------------------------------------------------------
# Corpus term frequencies: explode → count → top-k. The canonical text
# pipeline shape; partial aggregation absorbs the explode fan-out before
# the shuffle.
# --------------------------------------------------------------------------
@register(
    "docs_top_terms",
    oracle=r"""
    SELECT term, n FROM (
        SELECT u.term AS term, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, u.term) AS rnk
        FROM documents,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS u(term)
        GROUP BY u.term
    ) WHERE rnk <= 20
    ORDER BY n DESC, term
    """,
    tags=("analytics", "bench"),
)
def docs_top_terms(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.57x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    terms = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    counted = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    return (
        counted.orderBy(F.col("n").desc(), F.col("term"))
        .limit(20)
        .select("term", "n")
        .orderBy(F.col("n").desc(), F.col("term"))
    )


# --------------------------------------------------------------------------
# Cohort retention: users active in the first week still active in the
# last week — two filtered distinct sets, one semi join.
# --------------------------------------------------------------------------
@register(
    "events_retention",
    oracle="""
    WITH week1 AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-08'
    ),
    week4 AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-22'
    )
    SELECT CAST((SELECT COUNT(*) FROM week1) AS BIGINT) AS cohort_size,
           CAST((SELECT COUNT(*) FROM week1 WHERE user_id IN
                 (SELECT user_id FROM week4)) AS BIGINT) AS retained
    """,
    tags=("analytics",),
)
def events_retention(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    week1 = (
        e.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        .select("user_id")
        .distinct()
    )
    week4 = (
        e.filter(F.col("ts") >= F.lit("2024-01-22").cast("timestamp"))
        .select("user_id")
        .distinct()
    )
    cohort = week1.agg(F.count(F.lit(1)).cast("bigint").alias("cohort_size"))
    retained = (
        week1.join(week4, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained"))
    )
    return cohort.crossJoin(retained)


# --------------------------------------------------------------------------
# Histogram: document-length distribution in fixed-width buckets — the
# bucketize-and-count shape (one scan, one tiny shuffle).
# --------------------------------------------------------------------------
@register(
    "docs_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100) AS BIGINT) * 100 AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("analytics",),
)
def docs_length_histogram(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 100).cast("bigint") * 100).alias(
        "bucket_lo"
    )
    return (
        docs.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("bucket_lo")
    )


# --------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT with distinct semantics.
# Buyers who never hit an error event, and error-only users, via set algebra
# across two event-type projections.
# --------------------------------------------------------------------------
@register(
    "events_set_ops",
    oracle="""
    WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         errorers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
         both_u AS (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errorers),
         clean_buyers AS (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errorers)
    SELECT 'both' AS cohort, COUNT(*) AS n FROM both_u
    UNION ALL
    SELECT 'clean_buyers', COUNT(*) FROM clean_buyers
    ORDER BY cohort
    """,
    tags=("analytics",),
)
def events_set_ops(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    errorers = e.filter(F.col("event_type") == "error").select("user_id").distinct()
    both_u = buyers.intersect(errorers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    clean = buyers.exceptAll(errorers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("clean_buyers").alias("cohort"), "n"
    )
    return both_u.unionByName(clean).orderBy("cohort")
