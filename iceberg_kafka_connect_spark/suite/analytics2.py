"""Second analytics batch: join-shape coverage (outer, semi with HAVING,
anti, disjunctive pushdown, per-group min via window) in TPC-H shapes
adapted to the available columns."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register
from .core import davg, dim, dsum, sql_davg, sql_dsum, table


# --------------------------------------------------------------------------
# Q7 shape: shipping volume between two nation pairs by year. Both nation
# sides broadcast; the fact join shuffles once on orderkey.
# --------------------------------------------------------------------------
@register(
    "tpch_q7",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("analytics", "bench"),
)
def tpch_q7(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    s = dim(spark, sf_dir, "supplier")
    c = dim(spark, sf_dir, "customer")
    ns = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(ns), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("c_nk") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — LEFT OUTER join preserved
# through two aggregations.
# --------------------------------------------------------------------------
@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("analytics", "bench"),
)
def tpch_q13(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.78x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders", fan=False)
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q18 shape: large-quantity orders — aggregate-HAVING semi join back onto
# the fact, then customer broadcast.
# --------------------------------------------------------------------------
@register(
    "tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,2))) > 120
    )
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           {sql_dsum('l.l_quantity', 2)} AS total_qty
    FROM orders o
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_name, o.o_orderkey, orderdate
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("analytics", "bench"),
)
def tpch_q18(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = dim(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(dsum(F.col("l_quantity"), 2, "total_qty"))
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("c_name", "o_orderkey", "orderdate", "total_qty")
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicates across a broadcast join
# — exercises OR-predicate pushdown and constant folding.
# --------------------------------------------------------------------------
@register(
    "tpch_q19",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("analytics", "bench"),
)
def tpch_q19(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.55x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    l = table(spark, sf_dir, "lineitem", fan=False)
    p = dim(spark, sf_dir, "part")
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(c1 | c2 | c3)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q22 shape: above-average-balance customers with NO orders — scalar
# subquery + anti join.
# --------------------------------------------------------------------------
@register(
    "tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {sql_davg('c_acctbal', 2)} AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           {sql_dsum('c.c_acctbal', 2)} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("analytics", "bench"),
)
def tpch_q22(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.78x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders", fan=False)
    # scalar subquery as a broadcast cross-join (one row) — single job, no
    # driver-side collect blocking the plan (same pattern as q15's max_rev)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg(F.col("c_acctbal"), 2, "a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2, "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue — correlated average per part
# (decorrelated into an agg + self-join; Spark and DuckDB both plan the
# aggregate once and broadcast it).
# --------------------------------------------------------------------------
@register(
    "tpch_q17",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, {sql_davg('l_quantity', 4)} AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l.l_extendedprice', 2)} AS total_price,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND l.l_quantity < 0.4 * a.avg_qty
    """,
    tags=("analytics", "bench"),
)
def tpch_q17(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.55x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    l = table(spark, sf_dir, "lineitem", fan=False)
    p = dim(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    # per-part averages grow with |part| — no broadcast hint; the planner
    # broadcasts while the aggregate is small and shuffle-joins at scale
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg(F.col("l_quantity"), 4, "avg_qty")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice"), 2, "total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier(s) by revenue — scalar subquery over an aggregate.
# --------------------------------------------------------------------------
@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("analytics", "bench"),
)
def tpch_q15(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.43x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    l = table(spark, sf_dir, "lineitem", fan=False).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = dim(spark, sf_dir, "supplier")
    revenue = l.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("m"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Cheapest part per type (Q2's min-per-group shape via window, no partsupp
# table in this dataset).
# --------------------------------------------------------------------------
@register(
    "cheapest_part_per_type",
    oracle="""
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY p_type ORDER BY p_retailprice, p_partkey
        ) AS rn
        FROM part
    )
    WHERE rn = 1
    ORDER BY p_type
    """,
    tags=("analytics",),
)
def cheapest_part_per_type(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type")
    )
