"""Time-relational queries: as-of join and interval (range) join over the
`events` table.

DuckDB has a native ASOF JOIN, which makes it a strong oracle for the
distributed union+window implementation in operators/relational.py. All
timestamp comparisons happen at microsecond precision on both sides (the
parquet column is TIMESTAMP(NANOS); Spark's loader truncates ns→µs, so the
oracle CASTs to TIMESTAMP before comparing), and timestamps are output as
epoch-microsecond BIGINTs — exact integers, no rendering ambiguity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.relational import as_of_join, interval_join
from . import register
from .core import sql_dsum, table, dsum


# --------------------------------------------------------------------------
# As-of join: each click event attaches the latest prior (or simultaneous)
# purchase of the same user — pandas.merge_asof / DuckDB ASOF semantics,
# implemented as ONE shuffle on user_id with no join fan-out.
# --------------------------------------------------------------------------
@register(
    "asof_join_purchase",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'click'
    ),
    r AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id,
           l.user_id,
           epoch_us(l.ts) AS click_us,
           r.value AS purchase_value,
           epoch_us(r.ts) AS purchase_us,
           epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("relational",),
)
def asof_join_purchase(spark, sf_dir):
    # fan=False: the as-of union+window shape already establishes its ONE
    # hash exchange on user_id (pinned in test_plans); a scan fan-out
    # would add a per-branch exchange and double the scan subplans
    e = table(spark, sf_dir, "events", fan=False)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = as_of_join(clicks, purchases, on=["user_id"], left_ts="ts")
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_us"),
        F.col("value").alias("purchase_value"),
        F.unix_micros("ts_r").alias("purchase_us"),
        (F.unix_micros("ts") - F.unix_micros("ts_r")).alias("gap_us"),
    )


# --------------------------------------------------------------------------
# Interval (range) join: views landing inside each purchase's 2-hour
# attribution window, per user. The bucketed equi-join shape — intervals
# explode into covered time buckets, points probe their own bucket — keeps
# Catalyst off the broadcast-nested-loop path an inequality join would take.
# --------------------------------------------------------------------------
@register(
    "range_join_attribution",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(ts AS TIMESTAMP) AS w_start,
               CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS w_end
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'view'
    )
    SELECT p.purchase_id,
           CAST(COUNT(*) AS BIGINT) AS n_views,
           {sql_dsum('v.value', 4)} AS sum_view_value
    FROM p JOIN v
      ON v.user_id = p.user_id AND v.ts >= p.w_start AND v.ts < p.w_end
    GROUP BY p.purchase_id
    """,
    tags=("relational",),
)
def range_join_attribution(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.62x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    e = table(spark, sf_dir, "events", fan=False)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    j = interval_join(
        views,
        purchases,
        on=["user_id"],
        point_ts="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_s=7200,
    )
    return j.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views"),
        dsum(F.col("value"), 4, "sum_view_value"),
    )


# --------------------------------------------------------------------------
# Skew-safe salted join (operators/skew.py): the fact side's hot keys are
# spread across salt buckets (small side replicated per bucket), so one
# pathological key can't flood a single shuffle task — the plan-time tool
# for skew AQE's runtime splitting can't fix. Semantically a plain inner
# join: the oracle is exactly that, so the gate proves salting changes the
# execution shape and nothing else.
# --------------------------------------------------------------------------
@register(
    "skew_salted_join",
    oracle="""
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(d.type_code) AS BIGINT) AS sum_code
    FROM events e
    JOIN (
        SELECT event_type, CAST(LENGTH(event_type) AS BIGINT) AS type_code
        FROM (SELECT DISTINCT event_type FROM events)
    ) d USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    tags=("relational",),
)
def skew_salted_join(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.70x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators.skew import salted_join

    e = table(spark, sf_dir, "events", fan=False).select("event_id", "event_type")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_code", F.length("event_type").cast("bigint"))
    )
    joined = salted_join(e, dim, on="event_type", salt_buckets=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("type_code").cast("bigint").alias("sum_code"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Skew profiling: the DIAGNOSIS half of skew handling (skew_salted_join
# above is the remedy). One groupBy(key) count; the global mean rides a
# broadcast 1-row crossJoin. Exact integer counts; the two double columns
# derive from one exact integer division identically in both engines. The
# suite uses a LOW heavy_factor so several languages clear the bar and the
# check covers multiple rows (production use: 4.0 → only true hot keys).
# --------------------------------------------------------------------------
@register(
    "docs_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT lang AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM documents GROUP BY 1
    ),
    stats AS (
        SELECT CAST(SUM(n_rows) AS DOUBLE) / COUNT(*) AS m FROM counts
    )
    SELECT key, n_rows,
           n_rows / s.m AS skew_factor,
           CAST(CEIL(n_rows / s.m) AS BIGINT) AS salt_buckets
    FROM counts, stats s
    WHERE n_rows > 0.5 * s.m
    ORDER BY n_rows DESC, key
    """,
    tags=("relational", "skew"),
)
def docs_skew_profile(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.79x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    """operators/skew.skew_profile over documents.lang: flags keys above
    heavy_factor × mean rows-per-key and recommends per-key salt bucket
    counts for salted_join."""
    from ..operators.skew import skew_profile

    docs = table(spark, sf_dir, "documents", fan=False)
    return skew_profile(docs, "lang", heavy_factor=0.5)
