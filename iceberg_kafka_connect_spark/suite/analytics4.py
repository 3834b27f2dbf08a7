"""TPC-H shapes Q4 / Q8 / Q16 / Q21 adapted to the synthetic schema.

The synthetic lineitem has no commitdate/receiptdate/shipmode and there is
no partsupp table, so the queries keep the SHAPE that matters for the plan
— semi joins (EXISTS), anti joins (NOT EXISTS / NOT IN), conditional-ratio
aggregation over an 8-table join — with "late shipment" redefined as
l_shipdate > o_orderdate + N days on the available columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .core import dim, dsum, sql_dsum, table


# --------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join — orders in a window having at least one late
# line. The semi join never duplicates orders regardless of how many lines
# match; plan must show LeftSemi, not an inner join + distinct.
# --------------------------------------------------------------------------
@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("analytics", "bench"),
)
def tpch_q4(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.73x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    o = table(spark, sf_dir, "orders", fan=False).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    l = table(spark, sf_dir, "lineitem", fan=False).select("l_orderkey", "l_shipdate")
    sel = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")),
        "left_semi",
    )
    return (
        sel.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q16 shape: NOT IN anti-join + COUNT DISTINCT — supplier variety per
# (brand, size) through the lineitem relation, excluding blacklisted
# (negative-balance) suppliers. Plan: LeftAnti against the tiny supplier
# subquery (broadcast), distinct-agg on (brand, size, suppkey).
# --------------------------------------------------------------------------
@register(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 4, 7, 10, 13)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
    tags=("analytics",),
)
def tpch_q16(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.43x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    p = dim(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3") & F.col("p_size").isin(1, 4, 7, 10, 13)
    )
    l = table(spark, sf_dir, "lineitem", fan=False).select("l_partkey", "l_suppkey")
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


# --------------------------------------------------------------------------
# Q21 shape: semi + anti in one query — suppliers whose late line (shipdate
# > orderdate + 60d) is the ONLY late line of a multi-supplier order. The
# classic "who alone kept the order waiting" double-correlation.
# --------------------------------------------------------------------------
@register(
    "tpch_q21",
    oracle="""
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lo l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (
          SELECT 1 FROM lo l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lo l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    tags=("analytics", "bench"),
)
def tpch_q21(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = dim(spark, sf_dir, "supplier")
    lo = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    l1 = lo.filter(F.col("late")).alias("l1")
    l2 = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = (
        lo.filter(F.col("late"))
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
        .alias("l3")
    )
    sel = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("k2")) & (F.col("l1.l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("k3")) & (F.col("l1.l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        sel.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share — conditional-ratio aggregation at the top
# of an 8-table join (part, lineitem, supplier, orders, customer, customer
# nation, region, supplier nation). Fixed-cardinality dims broadcast; the
# ratio is decimal-sum / decimal-sum, bit-exact in both engines.
# --------------------------------------------------------------------------
@register(
    "tpch_q8",
    oracle=f"""
    WITH flat AS (
        SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = nc.n_regionkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT o_year,
           ({sql_dsum("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END", 4)}
            / {sql_dsum('volume', 4)}) AS mkt_share
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
    tags=("analytics", "bench"),
)
def tpch_q8(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    p = dim(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = dim(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    nc = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    r = dim(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    flat = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(nc, F.col("nc_key") == F.col("c_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("nc_region"))
        .join(ns, F.col("ns_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    num = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0)
    )
    return (
        flat.groupBy("o_year")
        .agg(
            (
                F.sum(num.cast("decimal(27,4)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(27,4)")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping_id: one pass producing three aggregation
# granularities — Spark expands to a single Expand + hash-agg, not three
# scans. Deterministic: grouping columns rendered with explicit markers.
# --------------------------------------------------------------------------
@register(
    "lineitem_grouping_sets",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
               AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, returnflag, linestatus
    """,
    tags=("analytics",),
)
def lineitem_grouping_sets(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("li_gs")
    return l.sparkSession.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
                   AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, returnflag, linestatus
        """
    )


# --------------------------------------------------------------------------
# Rank-statistics window battery: percent_rank and cume_dist per customer
# order value within market segment — both SQL-standard, both deterministic
# with the doc-id tiebreak, shuffle keyed by segment only.
# --------------------------------------------------------------------------
@register(
    "orders_rank_stats",
    oracle="""
    SELECT c.c_mktsegment, o.o_orderkey,
           PERCENT_RANK() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice, o.o_orderkey
           ) AS pct_rank,
           CUME_DIST() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice, o.o_orderkey
           ) AS cume
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 400000
    """,
    tags=("analytics",),
)
def orders_rank_stats(spark, sf_dir):
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, F.col("c_custkey") == F.col("o_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return j.select(
        "c_mktsegment",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
