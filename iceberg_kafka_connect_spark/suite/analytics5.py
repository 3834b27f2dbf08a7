"""TPC-H shapes Q2 / Q9 / Q11 / Q12 / Q20 adapted to the synthetic schema.

These five complete the TPC-H battery (the rest live in analytics*.py).
The synthetic schema has no partsupp table and lineitem lacks
commitdate/receiptdate/shipmode, so each query keeps the SHAPE that drives
the plan — correlated scalar-min subquery (Q2), multi-table profit rollup
(Q9), group-vs-global-total HAVING (Q11), conditional priority counts
(Q12), nested correlated-threshold semi-join (Q20) — re-expressed on the
available columns:

- "supply cost" → the minimum l_extendedprice a part was ever sold at by a
  supplier in the region (Q2) / a retailprice-derived unit cost (Q9);
- "available quantity" → the per-(supplier, part) shipped quantity (Q20);
- "ship mode" → l_returnflag (Q12).

Plan notes (the 100 TB question):
- Q2's correlated `= (SELECT MIN ...)` becomes a groupBy on the SAME key
  the join uses (l_partkey), so the aggregate and the re-join share one
  shuffle partitioning — no extra exchange between them.
- Q11's global total is a 1-row aggregate joined via crossJoin(broadcast()),
  never a driver-side .collect() scalar (the q15 max_rev pattern).
- Q20's per-part average threshold joins aggregate-to-aggregate on
  l_partkey; both sides are post-aggregation (small) relations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .core import dim, dsum, sql_dsum, table


# --------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier — correlated scalar MIN subquery. For each
# STANDARD part of size 5, the EUROPE supplier(s) that sold it at its lowest
# observed price. The correlation becomes a window MIN over l_partkey + a
# same-row filter — ONE lineitem scan and one shuffle (a groupBy-then-rejoin
# would scan and aggregate the fact table twice; Spark never reuses the
# subplan). Ties keep all suppliers (exact double equality is engine-stable
# because both read identical parquet doubles and never sum them).
# --------------------------------------------------------------------------
@register(
    "tpch_q2",
    oracle="""
    WITH eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    li AS (
        SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size = 5 AND p.p_type = 'STANDARD'
          AND l.l_suppkey IN (SELECT s_suppkey FROM eu)
    ),
    mc AS (
        SELECT l_partkey, MIN(l_extendedprice) AS min_price
        FROM li GROUP BY l_partkey
    )
    SELECT DISTINCT eu.s_acctbal, eu.s_name, eu.n_name,
           li.l_partkey AS p_partkey, li.l_extendedprice AS supply_price
    FROM li
    JOIN mc ON mc.l_partkey = li.l_partkey
           AND li.l_extendedprice = mc.min_price
    JOIN eu ON eu.s_suppkey = li.l_suppkey
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("analytics",),
)
def tpch_q2(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    n = dim(spark, sf_dir, "nation")
    r = dim(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = dim(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(p.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .join(eu.select("s_suppkey"), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .drop("p_partkey")
    )
    from pyspark.sql.window import Window

    w_part = Window.partitionBy("l_partkey")
    return (
        li.withColumn("min_price", F.min("l_extendedprice").over(w_part))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(eu, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_extendedprice").alias("supply_price"),
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit — nation×year rollup over a 5-table join
# with a LIKE filter on part name. Profit = revenue − retailprice-derived
# cost; decimal-summed for engine parity.
# --------------------------------------------------------------------------
@register(
    "tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)"
                     " - 0.1 * p.p_retailprice * l.l_quantity", 4)} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("analytics", "bench"),
)
def tpch_q9(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.52x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    l = table(spark, sf_dir, "lineitem", fan=False)
    p = dim(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders", fan=False).select("o_orderkey", "o_orderdate")
    n = dim(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p.select("p_partkey", "p_retailprice"), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, 4, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11 shape: important stock — per-part value for suppliers of one nation,
# kept only when it exceeds a fraction of the GLOBAL total over the same
# set. The global scalar rides a crossJoin(broadcast(1-row agg)) — one job,
# no driver-side collect (the anti-pattern Q22 used to have). The per-part
# aggregate is locally checkpointed so the total and the filter share one
# lineitem scan (Spark won't reuse the subplan otherwise), and the total re-sums
# through DECIMAL so it is order-independent — the threshold compare must
# see the same total in both engines to the last ULP.
# --------------------------------------------------------------------------
@register(
    "tpch_q11",
    oracle=f"""
    WITH pv AS (
        SELECT l.l_partkey AS p_partkey,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l.l_partkey
    )
    SELECT pv.p_partkey, pv.part_value
    FROM pv CROSS JOIN (
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(27,4))) AS DOUBLE) AS total
        FROM pv
    ) t
    WHERE pv.part_value > 0.001 * t.total
    ORDER BY pv.part_value DESC, pv.p_partkey
    """,
    tags=("analytics",),
)
def tpch_q11(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.34x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    l = table(spark, sf_dir, "lineitem", fan=False)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = dim(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    pv = (
        l.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "part_value"))
        # localCheckpoint, not persist: the total and the filter share one
        # lineitem pass, and the blocks are released with the RDD instead of
        # pinning executor storage for the whole session
        .localCheckpoint(eager=True)
    )
    total = pv.agg(dsum(F.col("part_value"), 4, "total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("total"))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q12 shape: priority counts per class — l_returnflag stands in for
# l_shipmode, "late" is shipdate > orderdate + 90 days. One join + one
# conditional aggregation; counts are exact integers so no decimal dance.
# --------------------------------------------------------------------------
@register(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("analytics",),
)
def tpch_q12(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q20 shape: excess-stock suppliers — nested correlated threshold. A
# (supplier, part) pair qualifies when its 1996 shipped quantity of a
# 'large…' part exceeds half the per-part average across suppliers; the
# supplier list is then the semi-join of AMERICA suppliers against the
# qualifying pairs. The per-part average is a window over the (supplier,
# part) aggregate — the groupBy and the window share one shuffle keying
# (l_partkey is in both), so lineitem is scanned and aggregated once.
# --------------------------------------------------------------------------
@register(
    "tpch_q20",
    oracle=f"""
    WITH sp AS (
        SELECT l.l_suppkey, l.l_partkey,
               {sql_dsum('l.l_quantity', 2)} AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'large%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(qty AS DECIMAL(27,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        FROM sp GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN sp ON sp.l_suppkey = s.s_suppkey
    JOIN pa ON pa.l_partkey = sp.l_partkey
    WHERE r.r_name = 'AMERICA' AND sp.qty > 0.5 * pa.avg_qty
    ORDER BY s.s_name, s.s_acctbal
    """,
    tags=("analytics",),
)
def tpch_q20(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.59x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    p = dim(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    sp = (
        table(spark, sf_dir, "lineitem", fan=False)
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(p.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity"), 2, "qty"))
    )
    from pyspark.sql.window import Window

    w_part = Window.partitionBy("l_partkey")
    qualifying = (
        sp.withColumn(
            "avg_qty",
            F.sum(F.col("qty").cast("decimal(27,2)")).over(w_part).cast("double")
            / F.count(F.lit(1)).over(w_part).cast("double"),
        )
        .filter(F.col("qty") > 0.5 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = dim(spark, sf_dir, "nation")
    r = dim(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(qualifying, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name", "s_acctbal")
    )
