"""The reference's ingestion-operator surface as oracle-checked queries.

Each query exercises real engine code (convert.py, routing.py, transforms/,
operators/cdc.py) over the driver's `events` table, with a DuckDB oracle
computing the same semantics in ANSI SQL. SURVEY.md §2 operator IDs are cited
per query.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import convert
from ..routing import RouteSpec, RoutingConfig, plan_routes
from ..transforms import (
    copy_value,
    debezium_transform,
    dms_transform,
    json_to_map,
    kafka_metadata,
)
from ..operators import cdc
from ..functions import local_df
from . import register
from .core import table


def commit_src(spark, sf_dir, name):
    """Fact loader for lakehouse COMMIT-workflow gates (fan=False).

    These gates measure the commit protocol - append/upsert/delete/clone/
    export - over small filtered slices; their map side is trivial. The
    scan fan-out would turn each tiny commit into defaultParallelism
    micro-files (guide SS6's small-files problem in miniature: more footer
    reads, fatter manifests, slower subsequent reads) - measured A/B on six
    commit gates: fan 31.1s/25.6s vs no-fan 23.8s/22.5s per pass."""
    return table(spark, sf_dir, name, fan=False)


_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# --------------------------------------------------------------------------
# P1 — record conversion / coercion (RecordConverter.java:89-300).
# A fully stringly-typed input is projected onto a typed target schema:
# string→long/int/double/timestamp coercion, missing column → NULL, unknown
# column dropped. The conversion is a pure Catalyst projection (convert.py).
# --------------------------------------------------------------------------
@register(
    "record_convert_coerce",
    oracle=f"""
    SELECT CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS event_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_str,
           CAST(CAST(user_id AS VARCHAR) AS INTEGER) AS user_id,
           CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value,
           CAST(NULL AS VARCHAR) AS extra
    FROM events
    """,
    tags=("ingestion",),
)
def record_convert_coerce(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    stringly = e.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("ts").cast("string").alias("ts"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("value").cast("string").alias("value"),
        F.col("event_type"),  # unknown to the target schema → dropped
        F.col("props"),
    )
    target = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.IntegerType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("extra", T.StringType()),  # missing in input → NULL
        ]
    )
    out = convert.project_to_schema(stringly, target)
    return out.select(
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
        "user_id",
        "value",
        "extra",
    )


# --------------------------------------------------------------------------
# P2 — tombstone filter (IcebergWriter.java:66-76): records whose value is
# null are skipped. Simulated tombstones: props == '{"k": 0}' → NULL.
# --------------------------------------------------------------------------
@register(
    "tombstone_filter",
    oracle="""
    SELECT event_id, props
    FROM events
    WHERE nullif(props, '{"k": 0}') IS NOT NULL
    """,
    tags=("ingestion",),
)
def tombstone_filter(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    as_kafka = e.withColumn("kvalue", F.nullif(F.col("props"), F.lit('{"k": 0}')))
    return as_kafka.filter(F.col("kvalue").isNotNull()).select("event_id", "props")


# --------------------------------------------------------------------------
# P3 — dotted-path field extraction (Utilities.java:123-155): `a.b.c`
# traversal into structs, plus JSON-path extraction for string payloads.
# --------------------------------------------------------------------------
@register(
    "field_extract_dotted",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS k,
           user_id AS nested_user
    FROM events
    """,
    tags=("ingestion",),
)
def field_extract_dotted(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    nested = e.withColumn("a", F.struct(F.struct(F.col("user_id").alias("c")).alias("b")))
    return nested.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.col("a.b.c").alias("nested_user"),  # dotted-path traversal
    )


# --------------------------------------------------------------------------
# P4 — key projection (RecordProjection.java:46-164): project the full row
# onto the identifier-field subschema (incl. nested struct keys) for
# equality deletes.
# --------------------------------------------------------------------------
@register(
    "key_projection",
    oracle="""
    SELECT event_id, user_id AS uid FROM events
    """,
    tags=("ingestion",),
)
def key_projection(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    nested = e.select(
        F.struct(
            F.col("event_id"),
            F.struct(F.col("user_id").alias("uid")).alias("ids"),
            F.col("event_type"),
            F.col("value"),
        ).alias("row")
    )
    return convert.project_keys(nested, ["row.event_id", "row.ids.uid"])


# --------------------------------------------------------------------------
# P5 — CDC op extraction (IcebergWriter.java:109-131): first char of the cdc
# field, case-insensitive, I/U/D, anything else defaults to INSERT.
# --------------------------------------------------------------------------
@register(
    "cdc_op_extract",
    oracle="""
    WITH src AS (
        SELECT event_id,
               CASE event_type WHEN 'purchase' THEN 'update'
                               WHEN 'error' THEN 'Delete'
                               WHEN 'view' THEN 'x-unknown'
                               ELSE 'insert' END AS op_field
        FROM events
    )
    SELECT event_id, op_field,
           CASE WHEN upper(substr(op_field, 1, 1)) IN ('I','U','D')
                THEN upper(substr(op_field, 1, 1)) ELSE 'I' END AS cdc_op
    FROM src
    """,
    tags=("ingestion",),
)
def cdc_op_extract(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    src = e.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "update")
        .when(F.col("event_type") == "error", "Delete")
        .when(F.col("event_type") == "view", "x-unknown")
        .otherwise("insert")
        .alias("op_field"),
    )
    return src.select(
        "event_id", "op_field", cdc.cdc_op_col("op_field").alias("cdc_op")
    )


# --------------------------------------------------------------------------
# S5a — last-wins collapse (BaseDeltaTaskWriter.java:71-84 applies records
# sequentially → last op per key defines the batch's effect).
# --------------------------------------------------------------------------
@register(
    "cdc_last_wins",
    oracle="""
    SELECT user_id, event_type AS last_type, value AS last_value,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    tags=("ingestion",),
)
def cdc_last_wins(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    last = cdc.collapse_last_wins(e, ["user_id"], ["ts", "event_id"])
    return last.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.date_format("ts", _TS_FMT_SPARK).alias("last_ts"),
    )


# --------------------------------------------------------------------------
# S5b — full CDC apply (equality-delete + append read semantics,
# BaseDeltaTaskWriter.java:58-84): base state ⊕ batch of I/U/D ops.
# --------------------------------------------------------------------------
@register(
    "cdc_apply",
    oracle="""
    WITH base AS (
        SELECT user_id, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-15'
        ) WHERE rn = 1
    ),
    batch AS (
        SELECT user_id, event_type, value,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS _cdc_op
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        ) WHERE rn = 1
    )
    SELECT user_id, event_type, value
    FROM base WHERE user_id NOT IN (SELECT user_id FROM batch)
    UNION ALL
    SELECT user_id, event_type, value
    FROM batch WHERE _cdc_op <> 'D'
    """,
    tags=("ingestion",),
)
def cdc_apply(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    base = cdc.collapse_last_wins(
        e.filter(F.col("ts") < cutoff), ["user_id"], ["ts", "event_id"]
    ).select("user_id", "event_type", "value")
    batch = e.filter(F.col("ts") >= cutoff).withColumn(
        "_cdc_op",
        F.when(F.col("event_type") == "error", "D").otherwise("U"),
    )
    applied = cdc.apply_cdc_batch(
        base,
        batch.select("user_id", "event_type", "value", "_cdc_op", "ts", "event_id"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    return applied.select("user_id", "event_type", "value")


# --------------------------------------------------------------------------
# R2 — static regex routing (Worker.java:115-132): anchored match on the
# route field per table; non-matching records dropped.
# --------------------------------------------------------------------------
@register(
    "route_static",
    oracle="""
    SELECT 'events_web' AS target_table, event_id FROM events
    WHERE event_type IS NOT NULL AND regexp_full_match(event_type, 'click|view')
    UNION ALL
    SELECT 'events_purchase', event_id FROM events
    WHERE event_type IS NOT NULL AND regexp_full_match(event_type, 'purchase')
    UNION ALL
    SELECT 'events_account', event_id FROM events
    WHERE event_type IS NOT NULL AND regexp_full_match(event_type, 'signup|login')
    """,
    tags=("ingestion",),
)
def route_static(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.71x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    e = table(spark, sf_dir, "events", fan=False)
    cfg = RoutingConfig(
        tables=[
            RouteSpec("events_web", "click|view"),
            RouteSpec("events_purchase", "purchase"),
            RouteSpec("events_account", "signup|login"),
        ],
        route_field="event_type",
    )
    routed = plan_routes(e, cfg)
    parts = [
        df.select(F.lit(t).alias("target_table"), "event_id")
        for t, df in routed.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# R3 — dynamic routing (Worker.java:135-144): target table name is the
# lowercased route-field value; unknown targets are skipped.
# --------------------------------------------------------------------------
@register(
    "route_dynamic",
    oracle="""
    SELECT lower(event_type) AS target_table, event_id
    FROM events
    WHERE lower(event_type) IN ('click', 'purchase', 'signup')
    """,
    tags=("ingestion",),
)
def route_dynamic(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    cfg = RoutingConfig(
        tables=[RouteSpec("click"), RouteSpec("purchase"), RouteSpec("signup")],
        route_field="event_type",
        dynamic=True,
    )
    routed = plan_routes(e, cfg)
    parts = [
        df.select(F.lit(t).alias("target_table"), "event_id")
        for t, df in routed.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# R1 — broadcast routing (Worker.java:103-113): no route field → every
# record to every configured table.
# --------------------------------------------------------------------------
@register(
    "route_broadcast",
    oracle="""
    SELECT t.target_table, COUNT(*) AS n_rows
    FROM events e
    CROSS JOIN (VALUES ('t_a'), ('t_b'), ('t_c')) AS t(target_table)
    GROUP BY t.target_table
    ORDER BY t.target_table
    """,
    tags=("ingestion",),
)
def route_broadcast(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    cfg = RoutingConfig(tables=[RouteSpec("t_a"), RouteSpec("t_b"), RouteSpec("t_c")])
    routed = plan_routes(e, cfg)
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("target_table"), "n_rows"
        )
        for t, df in routed.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("target_table")


# --------------------------------------------------------------------------
# P6 — CopyValue SMT (transforms/CopyValue.java:37-131).
# --------------------------------------------------------------------------
@register(
    "smt_copy_value",
    oracle="SELECT event_id, value, value AS value_copy FROM events",
    tags=("ingestion",),
)
def smt_copy_value(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.transform(copy_value("value", "value_copy")).select(
        "event_id", "value", "value_copy"
    )


# --------------------------------------------------------------------------
# P11 — Kafka metadata SMT (KafkaMetadataTransform.java:90-294): the kafka
# source columns reshaped into a nested struct + an external static field.
# --------------------------------------------------------------------------
@register(
    "smt_kafka_metadata",
    oracle="""
    SELECT event_id,
           'events' AS meta_topic,
           CAST(user_id % 4 AS INTEGER) AS meta_partition,
           event_id AS meta_offset,
           'cluster-1' AS meta_cluster
    FROM events
    """,
    tags=("ingestion",),
)
def smt_kafka_metadata(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    as_kafka = e.select(
        "event_id",
        F.lit("events").alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
    )
    out = as_kafka.transform(
        kafka_metadata(nested=True, external_field=("cluster_id", "cluster-1"))
    )
    return out.select(
        "event_id",
        F.col("_kafka_metadata.topic").alias("meta_topic"),
        F.col("_kafka_metadata.partition").alias("meta_partition"),
        F.col("_kafka_metadata.offset").alias("meta_offset"),
        F.col("_kafka_metadata.cluster_id").alias("meta_cluster"),
    )


# --------------------------------------------------------------------------
# P7 — Debezium envelope unwrap (DebeziumTransform.java:64-242): row from
# after (before on delete), op c/r→I u→U d→D, `_cdc` struct, target name
# from {db}.{table} pattern.
# --------------------------------------------------------------------------
@register(
    "smt_debezium_unwrap",
    oracle="""
    WITH env AS (
        SELECT event_id,
               CASE event_type WHEN 'error' THEN 'd'
                               WHEN 'purchase' THEN 'u' ELSE 'c' END AS op,
               epoch_ms(ts) AS ts_ms
        FROM events
    )
    SELECT event_id AS id,
           CASE WHEN op = 'd' THEN 'old' ELSE 'new' END AS data,
           CASE op WHEN 'u' THEN 'U' WHEN 'd' THEN 'D' ELSE 'I' END AS cdc_op,
           ts_ms AS cdc_ts_ms,
           'appdb.events' AS cdc_source,
           'ice_appdb.events_sink' AS cdc_target
    FROM env
    """,
    tags=("ingestion",),
)
def smt_debezium_unwrap(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "d")
        .when(F.col("event_type") == "purchase", "u")
        .otherwise("c")
    )
    row_new = F.struct(F.col("event_id").alias("id"), F.lit("new").alias("data"))
    row_old = F.struct(F.col("event_id").alias("id"), F.lit("old").alias("data"))
    envelope = e.select(
        op.alias("op"),
        F.when(op != "c", row_old).alias("before"),
        F.when(op != "d", row_new).alias("after"),
        F.struct(
            F.lit("appdb").alias("db"),
            F.lit(None).cast("string").alias("schema"),
            F.lit("events").alias("table"),
        ).alias("source"),
        F.unix_millis("ts").alias("ts_ms"),
    )
    out = envelope.transform(
        debezium_transform(target_pattern="ice_{db}.{table}_sink")
    )
    return out.select(
        "id",
        "data",
        F.col("_cdc.op").alias("cdc_op"),
        F.unix_millis("_cdc.ts").alias("cdc_ts_ms"),
        F.col("_cdc.source").alias("cdc_source"),
        F.col("_cdc.target").alias("cdc_target"),
    )


# --------------------------------------------------------------------------
# P8 — DMS envelope unwrap (DmsTransform.java:36-105).
# --------------------------------------------------------------------------
@register(
    "smt_dms_unwrap",
    oracle="""
    SELECT event_id AS id, event_type, value,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'purchase' THEN 'U' ELSE 'I' END AS cdc_op,
           'public.events' AS cdc_source
    FROM events
    """,
    tags=("ingestion",),
)
def smt_dms_unwrap(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    op_str = (
        F.when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "purchase", "update")
        .otherwise("insert")
    )
    envelope = e.select(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type"),
            F.col("value"),
        ).alias("data"),
        F.struct(
            op_str.alias("operation"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
            F.lit("public").alias("schema-name"),
            F.lit("events").alias("table-name"),
        ).alias("metadata"),
    )
    out = envelope.transform(dms_transform())
    return out.select(
        "id",
        "event_type",
        "value",
        F.col("_cdc.op").alias("cdc_op"),
        F.col("_cdc.source").alias("cdc_source"),
    )


# --------------------------------------------------------------------------
# P10 — JSON-to-Map SMT, root mode (JsonToMapTransform.java "json.root"):
# whole document as map<string,string>.
# --------------------------------------------------------------------------
@register(
    "smt_json_to_map_root",
    oracle="""
    SELECT event_id, props->>'k' AS k_str FROM events
    """,
    tags=("ingestion",),
)
def smt_json_to_map_root(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    out = e.transform(json_to_map(column="props", root=True))
    return out.select("event_id", F.col("payload").getItem("k").alias("k_str"))


# --------------------------------------------------------------------------
# P10/§1.3 — JSON parse with inferred schema (integral → long widening,
# SchemaUtils.java:306-313).
# --------------------------------------------------------------------------
@register(
    "smt_json_infer_parse",
    oracle="""
    SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events
    """,
    tags=("ingestion",),
)
def smt_json_infer_parse(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    out = e.transform(json_to_map(column="props", root=False))
    return out.select("event_id", F.col("payload.k").cast("bigint").alias("k"))


# --------------------------------------------------------------------------
# P10/F6 — chaotic JSON: drifting keys, nested objects, mixed-type arrays.
# Mixed arrays read back as array<string>; nested objects survive as
# serialized JSON inside the root map (JsonToMapUtils.java:112-178 rules).
# --------------------------------------------------------------------------
@register(
    "smt_json_chaotic",
    oracle="""
    WITH chaotic AS (
        SELECT event_id,
               '{"k": ' || CAST(user_id AS VARCHAR) ||
               ', "arr": [1, "two", ' || CAST(event_id % 7 AS VARCHAR) ||
               '], "nested": {"a": ' || CAST(event_id % 3 AS VARCHAR) || '}}'
               AS value
        FROM events
    )
    SELECT event_id,
           CAST(value->>'k' AS BIGINT) AS k,
           CAST(value->'arr'->>1 AS VARCHAR) AS arr_1,
           CAST(value->'nested'->>'a' AS BIGINT) AS nested_a
    FROM chaotic
    """,
    tags=("ingestion",),
)
def smt_json_chaotic(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    chaotic = e.select(
        "event_id",
        F.concat(
            F.lit('{"k": '),
            F.col("user_id").cast("string"),
            F.lit(', "arr": [1, "two", '),
            (F.col("event_id") % 7).cast("string"),
            F.lit('], "nested": {"a": '),
            (F.col("event_id") % 3).cast("string"),
            F.lit("}}"),
        ).alias("value"),
    )
    parsed = chaotic.transform(json_to_map(column="value", root=False))
    # inferred schema: k long, arr array<string> (mixed types), nested struct
    return parsed.select(
        "event_id",
        F.col("payload.k").cast("bigint").alias("k"),
        F.element_at("payload.arr", 2).cast("string").alias("arr_1"),
        F.col("payload.nested.a").cast("bigint").alias("nested_a"),
    )


# --------------------------------------------------------------------------
# Sketch-based rollup: approximate distinct + approximate quantiles — the
# sub-linear-memory shapes used when exact per-group state is too big at
# 100 TB. Values are estimator-specific (HLL++/KLL differ per engine) →
# rows-only check; exactness-vs-approx tested in pytest.
# --------------------------------------------------------------------------
@register("events_rollup_sketch", oracle=None, tags=("ingestion",))
def events_rollup_sketch(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95], 10_000).alias("value_q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_q").getItem(0).alias("p50_approx"),
            F.col("value_q").getItem(1).alias("p95_approx"),
            "n",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Exact twin of events_rollup_sketch (the dedup_simhash_md5 pattern: the
# approximate operator keeps its rows-only row, the twin pins the SAME
# rollup shape value-exactly). Quantiles are rank-picked — the value at
# row_number ceil(p*n) under a TOTAL order (value, event_id) — so both
# engines select the identical element: no interpolation, no estimator.
# One window partitioning serves rank and group size; distinct users stay
# an exact COUNT(DISTINCT). This is also the exact-quantile form that
# scales: rank-by-window, never a per-group sort collected anywhere.
# --------------------------------------------------------------------------
@register(
    "events_rollup_exact",
    oracle="""
    WITH ranked AS (
      SELECT event_type, user_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(CASE WHEN r = CAST(CEIL(0.5 * n) AS BIGINT)
                    THEN value END) AS p50,
           MAX(CASE WHEN r = CAST(CEIL(0.95 * n) AS BIGINT)
                    THEN value END) AS p95
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    tags=("ingestion",),
)
def events_rollup_exact(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.75x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events", fan=False)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "user_id",
        "value",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(F.lit(0.5) * F.col("n")),
                    F.col("value"),
                )
            ).alias("p50"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(F.lit(0.95) * F.col("n")),
                    F.col("value"),
                )
            ).alias("p95"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A1 — partition fan-out (PartitionedAppendWriter.java:50-54): rows grouped
# by the table's partition transform (day(ts) here) — the write-side
# hash-distribution expressed as a group-by.
# --------------------------------------------------------------------------
@register(
    "partition_fanout",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS n_rows
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("ingestion",),
)
def partition_fanout(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# A2 — VTTS: min over source partitions of max record timestamp
# (CommitState.java:155-178).
# --------------------------------------------------------------------------
@register(
    "vtts",
    oracle="""
    SELECT strftime(MIN(max_ts), '%Y-%m-%d %H:%M:%S.%f') AS vtts
    FROM (
        SELECT user_id % 4 AS part, MAX(ts) AS max_ts
        FROM events GROUP BY 1
    )
    """,
    tags=("ingestion",),
)
def vtts(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    per_part = e.groupBy((F.col("user_id") % 4).alias("part")).agg(
        F.max("ts").alias("max_ts")
    )
    return per_part.agg(
        F.date_format(F.min("max_ts"), _TS_FMT_SPARK).alias("vtts")
    )


# --------------------------------------------------------------------------
# S2 — offset tracking: (max offset + 1, max timestamp) per source partition
# (Worker.java:89-94, Offset.java:27-48).
# --------------------------------------------------------------------------
@register(
    "offset_tracking",
    oracle="""
    SELECT CAST(user_id % 4 AS BIGINT) AS part,
           MAX(event_id) + 1 AS next_offset,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("ingestion",),
)
def offset_tracking(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy((F.col("user_id") % 4).cast("bigint").alias("part"))
        .agg(
            (F.max("event_id") + 1).alias("next_offset"),
            F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("max_ts"),
        )
        .orderBy("part")
    )


# --------------------------------------------------------------------------
# A3 — file dedup by path (Deduplicated.java:79-168): duplicate file entries
# across commit events collapse to one (deterministic winner).
# --------------------------------------------------------------------------
@register(
    "dedup_files_by_path",
    oracle="""
    SELECT concat('data/p', CAST(user_id % 4 AS VARCHAR), '/f',
                  CAST(event_id % 500 AS VARCHAR), '.parquet') AS path,
           MIN(event_id) AS first_event,
           COUNT(*) AS n_dups
    FROM events GROUP BY 1
    """,
    tags=("ingestion",),
)
def dedup_files_by_path(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    path = F.concat(
        F.lit("data/p"),
        (F.col("user_id") % 4).cast("string"),
        F.lit("/f"),
        (F.col("event_id") % 500).cast("string"),
        F.lit(".parquet"),
    )
    return (
        e.select(path.alias("path"), "event_id")
        .groupBy("path")
        .agg(
            F.min("event_id").alias("first_event"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --------------------------------------------------------------------------
# §1.2 special types — uuid (string form), binary via base64 roundtrip,
# Iceberg `time` as micros-since-midnight (no Spark TimeType).
# (RecordConverter.java:387-435: uuid from string, binary from base64,
# time from ISO string.)
# --------------------------------------------------------------------------
@register(
    "convert_special_types",
    oracle="""
    SELECT event_id,
           concat(substr(md5(props), 1, 8), '-', substr(md5(props), 9, 4), '-',
                  substr(md5(props), 13, 4), '-', substr(md5(props), 17, 4), '-',
                  substr(md5(props), 21, 12)) AS uuid_str,
           to_base64(encode(event_type)) AS payload_b64,
           octet_length(from_base64(to_base64(encode(event_type)))) AS decoded_len,
           CAST((hour(ts) * 3600 + minute(ts) * 60
                 + CAST(floor(second(ts)) AS BIGINT)) AS BIGINT) * 1000000
             AS time_micros
    FROM events
    """,
    tags=("ingestion",),
)
def convert_special_types(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    h = F.md5("props")
    uuid_str = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    b64 = F.base64(F.encode("event_type", "utf-8"))
    time_micros = (
        (
            F.hour("ts") * 3600
            + F.minute("ts") * 60
            + F.floor(F.second("ts")).cast("bigint")
        ).cast("bigint")
        * 1_000_000
    )
    return e.select(
        "event_id",
        uuid_str.alias("uuid_str"),
        b64.alias("payload_b64"),
        F.length(F.unbase64(b64)).alias("decoded_len"),
        time_micros.alias("time_micros"),
    )


# --------------------------------------------------------------------------
# §1.3 evolution — union of two schema generations: old batch lacks `value`
# (NULL-filled), `event_id` widened int→bigint (SchemaUpdate add/widen).
# --------------------------------------------------------------------------
@register(
    "schema_evolution_union",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
           CAST(NULL AS DOUBLE) AS value
    FROM events WHERE ts < TIMESTAMP '2024-01-15'
    UNION ALL
    SELECT event_id, event_type, value
    FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    """,
    tags=("ingestion",),
)
def schema_evolution_union(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    gen1 = e.filter(F.col("ts") < cutoff).select(
        F.col("event_id").cast("int").alias("event_id"), "event_type"
    )
    gen2 = e.filter(F.col("ts") >= cutoff).select("event_id", "event_type", "value")
    # evolution read: old files projected onto the evolved schema
    evolved = gen1.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "event_type",
        F.lit(None).cast("double").alias("value"),
    )
    return evolved.unionByName(gen2)


# --------------------------------------------------------------------------
# Column DDL: rename + drop with pre-DDL files resolved through the table's
# name mapping (Iceberg updateSchema().renameColumn/deleteColumn — metadata
# only, no file rewrite). Half the rows are written BEFORE the DDL under
# the old column name, half after; the read must stitch them.
# --------------------------------------------------------------------------
@register(
    "schema_rename_drop",
    oracle="""
    SELECT event_id, value AS amount
    FROM events WHERE event_id < 1200
    ORDER BY event_id
    """,
    tags=("ingestion", "lakehouse"),
)
def schema_rename_drop(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "value", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="ddl_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 600))
    t.rename_column("value", "amount")
    t.drop_column("event_type")
    t.append(
        e.filter((F.col("event_id") >= 600) & (F.col("event_id") < 1200))
        .select("event_id", F.col("value").alias("amount"))
    )
    return t.read(spark).orderBy("event_id")


# --------------------------------------------------------------------------
# §1.2 — decimal target coercion: rescale with HALF_UP from doubles AND from
# strings (RecordConverter.java:338-357; convert.coerce_expr's decimal leg).
# --------------------------------------------------------------------------
@register(
    "convert_decimal_rescale",
    oracle="""
    SELECT event_id,
           CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS amount_dec,
           CAST(CAST(concat(CAST(event_id % 1000 AS VARCHAR), '.005')
                AS DECIMAL(10,2)) AS VARCHAR) AS half_up_pos,
           CAST(CAST(concat('-', CAST(event_id % 100 AS VARCHAR), '.125')
                AS DECIMAL(10,2)) AS VARCHAR) AS half_up_neg
    FROM events
    """,
    tags=("ingestion",),
)
def convert_decimal_rescale(spark, sf_dir):
    # decimals rendered as strings in BOTH engines: exact comparison of the
    # HALF_UP rescale without decimal-vs-float dtype ambiguity in the gate
    e = table(spark, sf_dir, "events")
    pos_str = F.concat((F.col("event_id") % 1000).cast("string"), F.lit(".005"))
    neg_str = F.concat(
        F.lit("-"), (F.col("event_id") % 100).cast("string"), F.lit(".125")
    )
    return e.select(
        "event_id",
        convert.coerce_expr(F.col("value"), T.DoubleType(), T.DecimalType(12, 2))
        .cast("string")
        .alias("amount_dec"),
        convert.coerce_expr(pos_str, T.StringType(), T.DecimalType(10, 2))
        .cast("string")
        .alias("half_up_pos"),
        convert.coerce_expr(neg_str, T.StringType(), T.DecimalType(10, 2))
        .cast("string")
        .alias("half_up_neg"),
    )


# --------------------------------------------------------------------------
# §1.3 — name-mapping + case-insensitive field resolution
# (RecordConverter.java:100-103,245-271): a renamed / case-shifted source
# resolves onto the target schema via schema.name-mapping.default aliases,
# then case-insensitively; unknown target fields NULL-fill.
# --------------------------------------------------------------------------
@register(
    "name_mapping_resolve",
    oracle="""
    SELECT event_id, user_id, event_type AS etype,
           CAST(NULL AS VARCHAR) AS missing_col
    FROM events
    """,
    tags=("ingestion",),
)
def name_mapping_resolve(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.73x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    e = table(spark, sf_dir, "events", fan=False)
    src = e.select(
        F.col("event_id").alias("evt"),  # resolved via name mapping
        F.col("user_id").alias("USER_ID"),  # resolved case-insensitively
        F.col("event_type").alias("kind"),  # resolved via name mapping
    )
    target = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("etype", T.StringType()),
            T.StructField("missing_col", T.StringType()),
        ]
    )
    return convert.project_to_schema(
        src,
        target,
        case_insensitive=True,
        name_mapping={"event_id": ["evt"], "etype": ["no_such", "kind"]},
    )


# --------------------------------------------------------------------------
# T9/T15 — exactly-once duplicate-batch replay (Coordinator.java:193-202):
# the SAME batch id committed twice through the real pipeline + lakehouse
# lands exactly once (snapshot-ancestry batch-id walk). Batch-expressible
# proof of the most safety-critical streaming property.
# --------------------------------------------------------------------------
@register(
    "exactly_once_replay",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events WHERE event_id < 500
    """,
    tags=("ingestion",),
)
def exactly_once_replay(spark, sf_dir):
    import tempfile

    from ..config import SinkConfig, TableConfig
    from ..sinks.catalog import Catalog
    from ..streaming import SinkPipeline

    e = commit_src(spark, sf_dir, "events")
    kafka_shaped = e.filter(F.col("event_id") < 500).select(
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value")
        ).alias("value"),
        F.lit("events").alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
    )
    value_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    cat = Catalog(tempfile.mkdtemp(prefix="eo_replay_gate_"))
    cfg = SinkConfig(tables=[TableConfig("default.eo")], auto_create=True)
    pipe = SinkPipeline(cat, cfg, "eo-gate", value_schema=value_schema)
    pipe.process_batch(kafka_shaped, batch_id=7)
    # duplicate replay of the SAME batch id — must be skipped (T9/T15)
    pipe.process_batch(kafka_shaped, batch_id=7)
    landed = cat.load_table("default.eo").read(spark)
    return landed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
        F.count_distinct(F.col("event_id")).cast("bigint").alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# P9 — Mongo Debezium SMT (MongoDebeziumTransform.java:84-189): extended-
# JSON change-stream envelopes — create / full update / partial update
# (key ⊕ updatedFields, removedFields → NULL) / delete (before doc or
# key-only) — normalized to flat rows, entirely via plan-time schema +
# vectorized from_json.
# --------------------------------------------------------------------------
@register(
    "smt_mongo_unwrap",
    oracle="""
    SELECT event_id AS _id,
           CASE WHEN event_type = 'view' THEN NULL            -- removedFields
                WHEN event_type = 'error' AND user_id % 2 = 0 THEN NULL
                ELSE event_type END AS name,
           CASE WHEN event_type = 'view' THEN value * 2       -- updatedFields
                WHEN event_type = 'error' AND user_id % 2 = 0 THEN NULL
                WHEN event_type = 'error' THEN value
                ELSE value END AS score,
           CASE WHEN event_type = 'purchase' THEN 'U'
                WHEN event_type = 'view' THEN 'U'
                WHEN event_type = 'error' THEN 'D'
                ELSE 'I' END AS cdc_op,
           CAST(event_id AS VARCHAR) AS cdc_key
    FROM events
    """,
    tags=("ingestion",),
)
def smt_mongo_unwrap(spark, sf_dir):
    from ..transforms.mongo import mongo_debezium_transform

    e = table(spark, sf_dir, "events")
    doc_json = F.to_json(
        F.struct(
            F.col("event_id").alias("_id"),
            F.col("event_type").alias("name"),
            F.col("value").alias("score"),
        )
    )
    op = (
        F.when(F.col("event_type") == "purchase", "u")  # full-document update
        .when(F.col("event_type") == "view", "u")  # partial update
        .when(F.col("event_type") == "error", "d")
        .otherwise("c")
    )
    envelopes = e.select(
        op.alias("op"),
        # full-update and create carry the after document; partial doesn't
        F.when(
            (op == "c") | (F.col("event_type") == "purchase"), doc_json
        ).alias("after"),
        # deletes carry before only for odd user_ids (even → key-only path)
        F.when(
            (op == "d") & (F.col("user_id") % 2 == 1), doc_json
        ).alias("before"),
        F.when(
            F.col("event_type") == "view",
            F.struct(
                F.to_json(F.struct((F.col("value") * 2).alias("score"))).alias(
                    "updatedFields"
                ),
                F.array(F.lit("name")).alias("removedFields"),
            ),
        ).alias("updateDescription"),
        F.to_json(F.struct(F.col("event_id").alias("_id"))).alias("documentKey"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    doc_schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    out = envelopes.transform(mongo_debezium_transform(doc_schema))
    return out.select(
        "_id",
        "name",
        "score",
        F.col("_cdc.op").alias("cdc_op"),
        F.col("_cdc.key").alias("cdc_key"),
    )


# --------------------------------------------------------------------------
# S8 — commit branch targeting (IcebergSinkConfig commit-branch /
# SnapshotUpdate.toBranch): snapshots land on a named ref; the branch sees
# its ancestry, main doesn't see branch-only commits.
# --------------------------------------------------------------------------
@register(
    "branch_commits",
    oracle="""
    SELECT 'audit' AS branch,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 400
    UNION ALL
    SELECT 'main' AS branch,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 300
    ORDER BY branch
    """,
    tags=("ingestion",),
)
def branch_commits(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="branch_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 300))
    t.create_branch("audit")
    t.append(
        e.filter((F.col("event_id") >= 300) & (F.col("event_id") < 400)),
        branch="audit",
    )
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ]
    audit = t.read(spark, branch="audit").agg(*agg).select(
        F.lit("audit").alias("branch"), "n_rows", "sum_ids"
    )
    main = t.read(spark).agg(*agg).select(
        F.lit("main").alias("branch"), "n_rows", "sum_ids"
    )
    return audit.unionByName(main).orderBy("branch")


# --------------------------------------------------------------------------
# A4 — last-committed-offset lookup (Coordinator.java:193-202,286-303): the
# snapshot-ancestry summary walk returns the LATEST offsets entry even when
# later snapshots (e.g. a compaction) carry no offsets property.
# --------------------------------------------------------------------------
@register(
    "offset_lookup",
    oracle="""
    SELECT concat('{"events-0": ', CAST(MAX(event_id) + 1 AS VARCHAR), '}')
             AS offsets,
           CAST(3 AS BIGINT) AS n_snapshots
    FROM events WHERE event_id < 350
    """,
    tags=("ingestion",),
)
def offset_lookup(spark, sf_dir):
    import json as _json
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="offset_gate_") + "/t", e.schema
    )
    b1 = e.filter(F.col("event_id") < 200)
    b2 = e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 350))
    for batch in (b1, b2):
        hi = batch.agg(F.max("event_id").alias("m")).collect()[0]["m"]
        t.append(
            batch,
            snapshot_props={
                "kafka.connect.offsets": _json.dumps({"events-0": hi + 1})
            },
        )
    # a snapshot WITHOUT offsets (maintenance compaction) — the walk must
    # skip over it and surface batch 2's offsets
    t.compact(spark)
    offsets = t.last_summary_value("kafka.connect.offsets")
    n_snaps = len(t.snapshots())
    return local_df(spark, 
        [(offsets, n_snaps)], "offsets string, n_snapshots bigint"
    )

# --------------------------------------------------------------------------
# Incremental append scan (Iceberg appendsBetween; the read-side complement
# of the reference's per-commit appends, Coordinator.java:217-257): a
# consumer polls only the files added since the snapshot it last saw, never
# rescanning the table. Three interleaved appends; the scan starts after the
# first, so exactly batches 2 and 3 flow.
# --------------------------------------------------------------------------
@register(
    "incremental_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
             AS sum_price
    FROM orders WHERE o_orderkey % 3 IN (1, 2)
    """,
    tags=("ingestion", "lakehouse"),
)
def incremental_scan(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    o = commit_src(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="incr_gate_") + "/t", o.schema
    )
    first = None
    for r in (0, 1, 2):
        snap = t.append(o.filter(F.col("o_orderkey") % 3 == r))
        first = first or snap
    inc = t.appends_between(spark, first["snapshot_id"])
    return inc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
        F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_price"),
    )


# --------------------------------------------------------------------------
# Stats-based file pruning (Iceberg scan planning: manifest column bounds
# skip files a predicate can't match). The table is rewritten range-sorted
# on l_orderkey, so the narrow key-range read opens only the files whose
# bounds intersect it — `files_pruned` asserts the planner really skipped
# files, and the aggregates prove pruning changed nothing.
# --------------------------------------------------------------------------
@register(
    "stats_pruned_scan",
    oracle="""
    SELECT TRUE AS files_pruned,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
             AS sum_price
    FROM lineitem WHERE l_orderkey >= 5000 AND l_orderkey < 10000
    """,
    tags=("ingestion", "lakehouse"),
)
def stats_pruned_scan(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    li = commit_src(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="prune_gate_") + "/t", li.schema
    )
    t.append(li)
    t.compact(spark, sort_by=["l_orderkey"])
    where = "l_orderkey >= 5000 AND l_orderkey < 10000"
    kept, total = t.scan_files(where)
    pruned = len(kept) < total
    return t.read(spark, where=where).agg(
        F.lit(pruned).alias("files_pruned"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_price"),
    )

# --------------------------------------------------------------------------
# MERGE INTO (general form: WHEN MATCHED THEN DELETE / WHEN NOT MATCHED THEN
# INSERT — the clauses the blind upsert path can't express, exercised over
# the same equality-delete machinery as S5). Target: orders with key < 1000;
# source: keys 500..1499. Matched keys (500..999) are deleted, unmatched
# (1000..1499) inserted.
# --------------------------------------------------------------------------
@register(
    "merge_into",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
    FROM orders
    WHERE o_orderkey < 500 OR (o_orderkey >= 1000 AND o_orderkey < 1500)
    """,
    tags=("ingestion", "lakehouse"),
)
def merge_into(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    o = commit_src(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="merge_gate_") + "/t", o.schema
    )
    t.append(o.filter(F.col("o_orderkey") < 1000))
    src = o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1500))
    t.merge(spark, src, on=["o_orderkey"], when_matched="delete")
    return t.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
    )

# --------------------------------------------------------------------------
# Row-level DML: UPDATE ... WHERE then DELETE ... WHERE as merge-on-read
# equality-delete snapshots (Iceberg MoR DML; the reference's delta writer
# is the streaming specialization, BaseDeltaTaskWriter.java:71-84). The
# oracle expresses the same final state with plain SQL over the source.
# --------------------------------------------------------------------------
@register(
    "dml_delete_update",
    oracle="""
    WITH upd AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus
        FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
    FROM upd WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("ingestion", "lakehouse"),
)
def dml_delete_update(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    o = commit_src(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="dml_gate_") + "/t", o.schema
    )
    t.append(o.filter(F.col("o_orderkey") < 2000))
    t.update_where(
        spark,
        "o_orderstatus = 'P'",
        {"o_orderstatus": "'X'"},
        key_cols=["o_orderkey"],
    )
    t.delete_where(spark, "o_orderstatus = 'F'", key_cols=["o_orderkey"])
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Changelog read (Iceberg create_changelog_view parity): append then upsert,
# then consume the change stream — per (ordinal, change_type) row counts and
# key sums. The upsert snapshot must yield its equality-delete keys AND its
# inserts at one ordinal.
# --------------------------------------------------------------------------
@register(
    "changelog_read",
    oracle="""
    SELECT 0 AS ordinal, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 400
    UNION ALL
    SELECT 1 AS ordinal, 'delete' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id >= 200 AND event_id < 500
    UNION ALL
    SELECT 1 AS ordinal, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id >= 200 AND event_id < 500
    ORDER BY ordinal, change_type
    """,
    tags=("ingestion", "lakehouse"),
)
def changelog_read(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="cl_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 400))
    t.upsert(
        e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 500)),
        key_cols=["event_id"],
    )
    return (
        t.changes_between(spark, None)
        .groupBy(
            F.col("_change_ordinal").cast("int").alias("ordinal"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("ordinal", "change_type")
    )


# --------------------------------------------------------------------------
# Metadata-only aggregates: COUNT(*)/MIN/MAX answered from manifest stats
# without opening a data file (Iceberg scan-planning parity). The oracle is
# the real aggregation — the metadata math must match it exactly.
# --------------------------------------------------------------------------
@register(
    "metadata_count_bounds",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders WHERE o_orderkey < 3000
    """,
    tags=("ingestion", "lakehouse"),
)
def metadata_count_bounds(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    o = commit_src(spark, sf_dir, "orders").select("o_orderkey")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="meta_gate_") + "/t", o.schema
    )
    scoped = o.filter(F.col("o_orderkey") < 3000)
    t.append(scoped.filter(F.col("o_orderkey") % 2 == 0))
    t.append(scoped.filter(F.col("o_orderkey") % 2 == 1))
    n = t.count_rows()
    lo, hi = t.column_bounds("o_orderkey")
    # one-row result assembled from pure metadata — no data file was read
    return local_df(spark, 
        [(int(n), int(lo), int(hi))], "n_rows long, min_key long, max_key long"
    )


# --------------------------------------------------------------------------
# CDC mirroring: append/upsert/delete on a source table, then replicate to
# an empty table via the changelog (streaming/replicate.mirror_changes).
# The oracle is the source's expected final state — the mirror must land
# byte-identical rows.
# --------------------------------------------------------------------------
@register(
    "cdc_mirror",
    oracle="""
    SELECT event_id, value * 2 AS value
    FROM events WHERE event_id >= 200 AND event_id < 700
    UNION ALL
    SELECT event_id, value
    FROM events WHERE event_id >= 100 AND event_id < 200
    ORDER BY event_id
    """,
    tags=("ingestion", "lakehouse"),
)
def cdc_mirror(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable
    from ..streaming.replicate import mirror_changes

    e = commit_src(spark, sf_dir, "events").select("event_id", "value")
    base = tempfile.mkdtemp(prefix="mirror_gate_")
    src = LakehouseTable.create(base + "/src", e.schema)
    dst = LakehouseTable.create(base + "/dst", e.schema)
    src.append(e.filter(F.col("event_id") < 500))
    src.upsert(
        e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 700))
        .withColumn("value", F.col("value") * 2),
        key_cols=["event_id"],
    )
    src.delete_where(spark, "event_id < 100", key_cols=["event_id"])
    mirror_changes(spark, src, dst, key_cols=["event_id"])
    return dst.read(spark).orderBy("event_id")


# --------------------------------------------------------------------------
# Write-audit-publish: stage commits on an audit branch, validate, publish
# by fast-forwarding main (Iceberg fastForwardBranch). The result reads
# main BEFORE and AFTER the publish — proving staged rows are invisible
# until the atomic ref advance.
# --------------------------------------------------------------------------
@register(
    "wap_publish",
    oracle="""
    SELECT 'before' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 300
    UNION ALL
    SELECT 'after' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 700
    ORDER BY stage
    """,
    tags=("ingestion", "lakehouse"),
)
def wap_publish(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="wap_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 300))
    t.create_branch("audit")
    t.append(
        e.filter((F.col("event_id") >= 300) & (F.col("event_id") < 700)),
        branch="audit",
    )
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ]
    before = t.read(spark).agg(*agg).select(
        F.lit("before").alias("stage"), "n_rows", "sum_ids"
    )
    t.fast_forward("main", "audit")
    after = t.read(spark).agg(*agg).select(
        F.lit("after").alias("stage"), "n_rows", "sum_ids"
    )
    return before.unionAll(after).orderBy("stage")


# --------------------------------------------------------------------------
# Time travel: read the table as of an earlier snapshot while the head has
# moved on (Iceberg snapshot-id read; tests cover tags/branches — this is
# the gate-visible flavor).
# --------------------------------------------------------------------------
@register(
    "time_travel_read",
    oracle="""
    SELECT 'past' AS view,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 250
    UNION ALL
    SELECT 'head' AS view,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 600
    ORDER BY view
    """,
    tags=("ingestion", "lakehouse"),
)
def time_travel_read(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="tt_gate_") + "/t", e.schema
    )
    s1 = t.append(e.filter(F.col("event_id") < 250))
    t.append(e.filter((F.col("event_id") >= 250) & (F.col("event_id") < 600)))
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ]
    past = t.read(spark, snapshot_id=s1["snapshot_id"]).agg(*agg).select(
        F.lit("past").alias("view"), "n_rows", "sum_ids"
    )
    head = t.read(spark).agg(*agg).select(
        F.lit("head").alias("view"), "n_rows", "sum_ids"
    )
    return head.unionByName(past).orderBy("view")


# --------------------------------------------------------------------------
# Partition-spec evolution (Iceberg updateSpec(); reference parses specs
# per-table, SchemaUtils.java:150-199, and groups commit appends by spec id,
# Coordinator.java:221-245): the new spec applies to FUTURE writes only —
# files written under the old spec stay valid, keep their stats, and still
# prune under predicates after evolution. Two appends per era are key-range
# batched so every file carries tight o_orderkey bounds; the narrow read
# spans both eras, and `files_pruned` asserts scan planning really skipped
# old- AND new-spec files it could rule out.
# --------------------------------------------------------------------------
@register(
    "spec_evolution",
    oracle="""
    SELECT TRUE AS files_pruned,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderkey >= 1000 AND o_orderkey < 4000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("ingestion", "lakehouse"),
)
def spec_evolution(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    o = commit_src(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="spec_gate_") + "/t",
        o.schema,
        partition_by="o_orderstatus",  # era 1: identity spec
    )
    # era 1 (identity on status): two key-range appends → tight file bounds.
    # The [0,1000) batch is fully below the read predicate, so it must be
    # pruned even though it predates the spec change.
    t.append(o.filter(F.col("o_orderkey") < 1000))
    t.append(o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2500)))
    # evolve: future writes bucket on the key; old files untouched
    t.update_partition_spec("bucket(o_orderkey, 8)")
    # era 2 (bucket spec): the [4000,∞) batch is fully above the predicate
    t.append(o.filter((F.col("o_orderkey") >= 2500) & (F.col("o_orderkey") < 4000)))
    t.append(o.filter(F.col("o_orderkey") >= 4000))
    where = "o_orderkey >= 1000 AND o_orderkey < 4000"
    kept, total = t.scan_files(where)
    pruned = len(kept) < total
    return (
        t.read(spark, where=where)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
            F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.lit(pruned).alias("files_pruned"),
            "o_orderstatus",
            "n_rows",
            "sum_keys",
            "sum_price",
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Incremental materialized-aggregate maintenance: seed an aggregate from
# the initial snapshot, advance it across an upsert's changelog window by
# state differencing (pre/post images semi-joined to the window's touched
# keys — operators/incremental.py), and return the maintained state. The
# oracle is the full recompute over the FINAL table state: incremental ⊕
# must land exactly there. Upsert 200..499 over initial <400 rewrites
# 200..399 (same rows, zero net effect) and adds 400..499 — so the delta
# work is O(touched keys) while 0..199 is never rescanned.
# --------------------------------------------------------------------------
@register(
    "incremental_agg_refresh",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events WHERE event_id < 500
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("ingestion", "lakehouse"),
)
def incremental_agg_refresh(spark, sf_dir):
    import tempfile

    from ..operators.incremental import (
        aggregate_state,
        incremental_agg_refresh as refresh,
    )
    from ..sinks.table import LakehouseTable

    # decimal measure: the incremental path sums in a different order than
    # the oracle's one flat SUM; decimals make both exact (core.py idiom)
    e = commit_src(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(27,4)").alias("value"),
    )
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="mv_gate_") + "/t", e.schema
    )
    s1 = t.append(e.filter(F.col("event_id") < 400))
    state0 = aggregate_state(
        t.read(spark, snapshot_id=s1["snapshot_id"]),
        ["event_type"],
        ["value"],
    )
    t.upsert(
        e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 500)),
        key_cols=["event_id"],
    )
    changes = t.changes_between(spark, s1["snapshot_id"])
    state1 = refresh(
        state0,
        pre_image=t.read(spark, snapshot_id=s1["snapshot_id"]),
        post_image=t.read(spark),
        touched_keys=changes.select("event_id"),
        key_cols=["event_id"],
        group_cols=["event_type"],
        sum_cols=["value"],
    )
    return state1.select(
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Materialized-view refresh loop (streaming/mv.py): seed refresh, then an
# upsert window advanced incrementally (marker-driven; the REPLACE commit
# stamps the source snapshot the state equals). Long measure → exact sums.
# Oracle = aggregate over the FINAL table state; the loop must land there
# through seed + incremental modes, touching only the changed keys.
# --------------------------------------------------------------------------
@register(
    "mv_refresh",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE event_id < 500
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("ingestion", "lakehouse"),
)
def mv_refresh(spark, sf_dir):
    import tempfile

    from pyspark.sql import types as T

    from ..sinks.table import LakehouseTable
    from ..streaming.mv import refresh_materialized_agg

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    src = LakehouseTable.create(
        tempfile.mkdtemp(prefix="mvq_src_") + "/t", e.schema
    )
    mv = LakehouseTable.create(
        tempfile.mkdtemp(prefix="mvq_mv_") + "/t",
        T.StructType(
            [
                T.StructField("event_type", T.StringType()),
                T.StructField("n_rows", T.LongType()),
                T.StructField("sum_event_id", T.LongType()),
            ]
        ),
    )

    def refresh():
        refresh_materialized_agg(
            spark, src, mv, ["event_id"], ["event_type"], ["event_id"]
        )

    src.append(e.filter(F.col("event_id") < 400))
    refresh()  # seed
    src.upsert(
        e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 500)),
        key_cols=["event_id"],
    )
    refresh()  # incremental
    return (
        mv.read(spark)
        .select(
            "event_type",
            "n_rows",
            F.col("sum_event_id").cast("bigint").alias("sum_event_id"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Position deletes (Iceberg v2's second delete representation): the table
# holds every event TWICE (no unique key exists — an equality delete on any
# column set would be forced to take all copies of unrelated rows too);
# DELETE WHERE by (file, row-ordinal) still removes exactly the matching
# rows. Oracle = plain SQL DELETE semantics over the doubled relation.
# --------------------------------------------------------------------------
@register(
    "dml_position_delete",
    oracle="""
    WITH doubled AS (
        SELECT event_id, event_type FROM events WHERE event_id < 400
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_id < 400
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM doubled
    WHERE NOT (event_id % 3 = 0)
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("ingestion", "lakehouse"),
)
def dml_position_delete(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").filter(F.col("event_id") < 400).select(
        "event_id", "event_type"
    )
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="posdel_gate_") + "/t", e.schema
    )
    t.append(e.unionAll(e))  # every row twice: no unique key exists
    t.delete_where_positions(spark, "event_id % 3 = 0")
    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Iceberg interop round-trip: export the table as a spec-conformant v2
# metadata tree (sinks/iceberg_export.py), re-import it purely from that
# tree (sinks/iceberg_import.py — the reference instead loads existing
# tables through a real catalog, data/Utilities.java:68-121), and read the
# imported copy. Exercises murmur3 bucket partitioning, equality deletes,
# and position deletes across the boundary; the oracle recomputes the
# surviving rows straight from the source parquet.
# --------------------------------------------------------------------------
@register(
    "iceberg_interop_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    WHERE event_id < 500
      AND event_id % 7 != 0
      AND event_id % 11 != 3
    """,
    tags=("ingestion", "lakehouse"),
)
def iceberg_interop_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.iceberg_export import export_iceberg_metadata
    from ..sinks.iceberg_import import import_iceberg_table
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="interop_gate_")
    t = LakehouseTable.create(
        base + "/src",
        e.schema,
        partition_by=["iceberg_bucket(event_id, 4)"],
    )
    t.append(e.filter(F.col("event_id") < 500))
    t.delete_where(spark, "event_id % 7 = 0", key_cols=["event_id"])
    t.delete_where_positions(spark, "event_id % 11 = 3")
    imp = import_iceberg_table(export_iceberg_metadata(t), base + "/dst")
    return imp.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


# --------------------------------------------------------------------------
# Iceberg mirror refresh (read direction, continuous): import an external
# tree, let the external writer commit more (append + equality delete),
# re-export, refresh_from_iceberg — the imported copy converges on the
# source without a re-import. The reference keeps reading live tables
# through its catalog (data/Utilities.java:68-121); this is that loop over
# metadata trees. Oracle recomputes the final surviving rows from parquet.
# --------------------------------------------------------------------------
@register(
    "iceberg_mirror_refresh",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 600
      AND event_id % 5 != 2
    """,
    tags=("ingestion", "lakehouse"),
)
def iceberg_mirror_refresh(spark, sf_dir):
    import tempfile

    from ..sinks.iceberg_export import export_iceberg_metadata
    from ..sinks.iceberg_import import (
        import_iceberg_table,
        refresh_from_iceberg,
    )
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="mirror_refresh_gate_")
    src = LakehouseTable.create(base + "/src", e.schema)
    src.append(e.filter(F.col("event_id") < 300))
    imp = import_iceberg_table(
        export_iceberg_metadata(src), base + "/dst"
    )
    # external writer moves on: append + equality delete, then re-export
    src.append(e.filter((F.col("event_id") >= 300) & (F.col("event_id") < 600)))
    src.delete_where(spark, "event_id % 5 = 2", key_cols=["event_id"])
    export_iceberg_metadata(src)
    refresh_from_iceberg(imp)
    return imp.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


# --------------------------------------------------------------------------
# Zero-copy migration: register the driver's events parquet IN PLACE as a
# lakehouse table (Iceberg's add_files procedure / snapshot-table
# migration — SparkActions.migrateTable/snapshotTable; the reference
# instead auto-creates and rewrites through the connector,
# IcebergWriterFactory.java:69-117) and query it with merge-on-read DML on
# top. The oracle recomputes the surviving aggregate straight from the
# source parquet.
# --------------------------------------------------------------------------
@register(
    "add_files_migrate",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id % 13 != 4
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("ingestion", "lakehouse"),
)
def add_files_migrate(spark, sf_dir):
    import os
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="add_files_gate_") + "/t",
        e.schema,
    )
    t.add_files([os.path.join(sf_dir, "events.parquet")])
    t.delete_where(spark, "event_id % 13 = 4", key_cols=["event_id"])
    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# REST catalog round-trip: serve the warehouse over the public Iceberg
# REST catalog protocol (sinks/rest_server.py), drive the full lifecycle
# through the HTTP client (sinks/rest_catalog.py) — create a
# bucket-partitioned table, ingest, merge-on-read delete, commit
# properties and a tag through the catalog's CAS endpoint — then read the
# catalog-loaded table. The reference resolves iceberg.catalog.type=rest
# to Iceberg's RESTCatalog (data/Utilities.java:68-121); here both halves
# run in-process. The oracle recomputes the surviving rows from parquet.
# --------------------------------------------------------------------------
@register(
    "rest_catalog_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    WHERE event_id < 400
      AND event_id % 6 != 1
    """,
    tags=("ingestion", "lakehouse"),
)
def rest_catalog_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties
    from ..sinks.iceberg_export import _snapshot_id_int
    from ..sinks.rest_server import IcebergRestServer

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    wh = tempfile.mkdtemp(prefix="rest_gate_")
    with IcebergRestServer(wh) as srv:
        # the connector-config path: iceberg.catalog.* -> live REST client
        cat = catalog_from_properties(
            {
                "iceberg.catalog.type": "rest",
                "iceberg.catalog.uri": srv.uri,
            }
        )
        t = cat.create_table(
            "db.events",
            e.schema,
            partition_by=["iceberg_bucket(4, event_id)"],
        )
        t.append(e.filter(F.col("event_id") < 400))
        t.delete_where(spark, "event_id % 6 = 1", key_cols=["event_id"])
        # catalog-side commits: properties + a tag on the head, both CAS'd
        cat.set_properties("db.events", {"owner": "rest-gate"})
        head = t.current_snapshot()["snapshot_id"]
        cat.set_ref(
            "db.events", "audited", _snapshot_id_int(head), ref_type="tag"
        )
        loaded = cat.load_table("db.events")
        assert loaded.properties().get("owner") == "rest-gate"
        assert loaded.tags().get("audited") == head
        df = loaded.read(spark)
    # the server only arbitrates metadata — the scan below goes straight
    # to storage, so it stays valid after the catalog is gone
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


# --------------------------------------------------------------------------
# JDBC catalog round-trip: Iceberg's SQL-pointer catalog protocol
# (public two-table schema + single-UPDATE CAS, apache/iceberg
# jdbc/JdbcUtil.java) executable on stdlib sqlite3
# (sinks/jdbc_catalog.py). The connector-config path resolves
# iceberg.catalog.type=jdbc (data/Utilities.java:68-121), the table is
# created and loaded through the catalog, and the pointer republishes as
# the table moves. The oracle recomputes surviving rows from parquet.
# --------------------------------------------------------------------------
@register(
    "jdbc_catalog_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 500
      AND event_id % 9 != 2
    """,
    tags=("ingestion", "lakehouse"),
)
def jdbc_catalog_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="jdbc_gate_")
    cat = catalog_from_properties(
        {
            "iceberg.catalog.type": "jdbc",
            "iceberg.catalog.uri": f"jdbc:sqlite:{base}/catalog.sqlite",
            "iceberg.catalog.warehouse": f"{base}/wh",
        }
    )
    t = cat.create_table("db.events", e.schema)
    t.append(e.filter(F.col("event_id") < 500))
    t.delete_where(spark, "event_id % 9 = 2", key_cols=["event_id"])
    # the pointer republishes on load: the catalog-loaded view sees the
    # delete without any explicit publish step
    loaded = cat.load_table("db.events")
    return loaded.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


# --------------------------------------------------------------------------
# Multi-spec interop round-trip: write under identity(event_type), evolve
# to iceberg_bucket(event_id), write more, equality-delete across both
# eras, export (one manifest per spec generation —
# sinks/iceberg_export.py), re-import, and read. The identity era's
# event_type column only exists as partition directories — a wrong-spec
# tuple read would null it — so grouping on it IS the correctness check.
# Oracle recomputes from the source parquet.
# --------------------------------------------------------------------------
@register(
    "iceberg_multispec_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 600
      AND event_id % 7 != 5
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("ingestion", "lakehouse"),
)
def iceberg_multispec_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.iceberg_export import export_iceberg_metadata
    from ..sinks.iceberg_import import import_iceberg_table
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="multispec_gate_")
    t = LakehouseTable.create(
        base + "/src", e.schema, partition_by=["event_type"]
    )
    t.append(e.filter(F.col("event_id") < 300))
    t.update_partition_spec(["iceberg_bucket(4, event_id)"])
    t.append(e.filter((F.col("event_id") >= 300) & (F.col("event_id") < 600)))
    t.delete_where(spark, "event_id % 7 = 5", key_cols=["event_id"])
    imp = import_iceberg_table(export_iceberg_metadata(t), base + "/dst")
    return (
        imp.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Orphan-file sweep (Iceberg remove_orphan_files; the one maintenance action
# the r5 verdict flagged for gate-adjacent evidence): appends + an in-place
# external registration + compact + expire manufacture real orphans, the
# sweep removes them, and the result frame proves (a) reads are unaffected,
# (b) a second sweep finds nothing, (c) externally-registered source files
# survive (the add_files safety rule). Booleans are computed driver-side
# from the sweep; row counts/sums come from the swept table itself.
# --------------------------------------------------------------------------
@register(
    "maintenance_orphan_sweep",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           TRUE AS orphans_found,
           TRUE AS swept_clean,
           TRUE AS external_safe
    FROM events WHERE event_id < 650
    """,
    tags=("ingestion", "lakehouse", "maintenance"),
)
def maintenance_orphan_sweep(spark, sf_dir):
    import os
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="orphan_gate_")
    t = LakehouseTable.create(base + "/t", e.schema)
    t.append(e.filter(F.col("event_id") < 200))
    t.append(e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 400)))
    t.append(e.filter((F.col("event_id") >= 400) & (F.col("event_id") < 600)))
    # external in-place registration (zero-copy migration path)
    ext = base + "/ext"
    e.filter(
        (F.col("event_id") >= 600) & (F.col("event_id") < 650)
    ).coalesce(1).write.parquet(ext)
    t.add_files(ext)
    # compact rewrites the live set; expiring history strands the
    # pre-compaction internal files and delta manifests as true orphans
    t.compact(spark)
    t.expire_snapshots(keep_last=1)
    removed = t.remove_orphan_files(older_than_ms=0)
    swept_clean = (
        t.remove_orphan_files(older_than_ms=0, dry_run=True) == []
    )
    external_safe = any(
        p.endswith(".parquet") for p in os.listdir(ext)
    )
    return t.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ).select(
        "n_rows",
        "sum_ids",
        F.lit(len(removed) > 0).alias("orphans_found"),
        F.lit(swept_clean).alias("swept_clean"),
        F.lit(external_safe).alias("external_safe"),
    )


# --------------------------------------------------------------------------
# WAP publish by cherry-pick (Iceberg cherrypickSnapshot): stage on an audit
# branch, let main MOVE ON (fast_forward now refuses — diverged), then
# publish the staged snapshot by replaying its files as a new commit on the
# moved head. 'before' reads main post-divergence pre-publish; 'after'
# proves the staged rows landed without losing the divergent ones.
# --------------------------------------------------------------------------
@register(
    "wap_cherry_pick",
    oracle="""
    SELECT 'before' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 300 OR (event_id >= 500 AND event_id < 600)
    UNION ALL
    SELECT 'after' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 600
    ORDER BY stage
    """,
    tags=("ingestion", "lakehouse"),
)
def wap_cherry_pick(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="cpk_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 300))
    t.create_branch("audit")
    staged = t.append(
        e.filter((F.col("event_id") >= 300) & (F.col("event_id") < 500)),
        branch="audit",
    )
    # main diverges while the audit runs
    t.append(e.filter((F.col("event_id") >= 500) & (F.col("event_id") < 600)))
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ]
    before = t.read(spark).agg(*agg).select(
        F.lit("before").alias("stage"), "n_rows", "sum_ids"
    )
    t.cherry_pick(staged["snapshot_id"])
    after = t.read(spark).agg(*agg).select(
        F.lit("after").alias("stage"), "n_rows", "sum_ids"
    )
    return before.unionAll(after).orderBy("stage")


# --------------------------------------------------------------------------
# SQL view over the lakehouse (Iceberg view spec + catalog view surface):
# create a view whose SQL aggregates a warehouse table, read it, replace
# it, read again — the result proves version selection (current-version-id)
# drives execution.
# --------------------------------------------------------------------------
@register(
    "lakehouse_view_read",
    oracle="""
    SELECT 'v1' AS version, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events WHERE event_id < 400
    GROUP BY event_type
    UNION ALL
    SELECT 'v2' AS version, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events WHERE event_id < 150
    GROUP BY event_type
    ORDER BY version, event_type
    """,
    tags=("ingestion", "lakehouse", "views"),
)
def lakehouse_view_read(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import Catalog

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    cat = Catalog(tempfile.mkdtemp(prefix="view_gate_"))
    t = cat.create_table("db.ev", e.schema)
    t.append(e.filter(F.col("event_id") < 400))
    cat.create_view(
        "db.by_type",
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows "
        "FROM db_ev GROUP BY event_type",
        spark=spark,
    )
    v1 = cat.read_view(spark, "db.by_type").select(
        F.lit("v1").alias("version"), "event_type", "n_rows"
    )
    r1 = v1.collect()  # materialize BEFORE the replace flips the SQL
    # v2 is a LAYERED view: its SQL references another view (db.narrow),
    # which references the table — the resolver must register the chain
    # in dependency order (views.py register_relations)
    cat.create_view(
        "db.narrow",
        "SELECT event_type, event_id FROM db_ev WHERE event_id < 150",
        spark=spark,
    )
    cat.views.add_version(
        "db.by_type",
        {
            "representations": [
                {
                    "type": "sql",
                    "sql": "SELECT event_type, CAST(COUNT(*) AS BIGINT) "
                    "AS n_rows FROM db_narrow GROUP BY event_type",
                    "dialect": "spark",
                }
            ]
        },
    )
    v2 = cat.read_view(spark, "db.by_type").select(
        F.lit("v2").alias("version"), "event_type", "n_rows"
    )
    v1_frozen = local_df(spark, r1, v2.schema)
    return v1_frozen.unionAll(v2).orderBy("version", "event_type")


# --------------------------------------------------------------------------
# Storage-partitioned join (operators/spj.py; Spark SPARK-37375's SPJ shape
# at the table layer): fact and dim land bucket-co-partitioned on the join
# key, and the join is a union of per-bucket broadcast joins — no join-key
# shuffle of either table (plan-pinned in tests/test_spj.py). Oracle: the
# plain SQL join.
# --------------------------------------------------------------------------
@register(
    "spj_bucket_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST(c.n AS BIGINT) AS n_events
    FROM events e
    JOIN (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ) c USING (user_id)
    WHERE e.event_id < 2000
    """,
    tags=("ingestion", "lakehouse", "join"),
)
def spj_bucket_join(spark, sf_dir):
    import tempfile

    from ..operators.spj import storage_partitioned_join
    from ..sinks.catalog import Catalog

    e = commit_src(spark, sf_dir, "events")
    cat = Catalog(tempfile.mkdtemp(prefix="spj_gate_"))
    fact = cat.create_table(
        "db.fact",
        e.select("event_id", "user_id").filter(F.col("event_id") < 2000).schema,
        partition_by=["iceberg_bucket(8, user_id)"],
    )
    fact.append(
        e.select("event_id", "user_id").filter(F.col("event_id") < 2000)
    )
    dim_df = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    dim = cat.create_table(
        "db.dim", dim_df.schema, partition_by=["iceberg_bucket(8, user_id)"]
    )
    dim.append(dim_df)
    return storage_partitioned_join(spark, fact, dim, key="user_id").select(
        "event_id", "user_id", "n_events"
    )


# --------------------------------------------------------------------------
# Streaming changelog source (streaming/changelog_source.py): a second
# table consumes the first's committed snapshots per micro-batch with a
# checkpointed offset, surviving a simulated restart between batches —
# the read-side twin of the mirror. The result reads the SINK after the
# stream drains; the oracle is the source's expected final state.
# --------------------------------------------------------------------------
@register(
    "changelog_stream_sync",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_id < 400 AND NOT (event_id >= 100 AND event_id < 200)
    UNION ALL
    SELECT event_id, 'patched' AS event_type
    FROM events
    WHERE event_id >= 500 AND event_id < 600
    ORDER BY event_id
    """,
    tags=("ingestion", "streaming", "cdc"),
)
def changelog_stream_sync(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable
    from ..streaming.changelog_source import ChangelogStream

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="clsync_gate_")
    src = LakehouseTable.create(base + "/src", e.schema)
    src.append(e.filter(F.col("event_id") < 400))
    src.upsert(
        e.filter((F.col("event_id") >= 500) & (F.col("event_id") < 600))
        .withColumn("event_type", F.lit("patched")),
        key_cols=["event_id"],
    )
    src.delete_where(
        spark,
        "event_id >= 100 AND event_id < 200",
        key_cols=["event_id"],
    )
    dst = LakehouseTable.create(base + "/dst", e.schema)
    # consume the first snapshot, then "restart" with a fresh stream
    # object (stale local checkpoint — resume trusts the sink's marker)
    ChangelogStream(src, base + "/ckpt").sync_to_table(
        spark, dst, key_cols=["event_id"], max_snapshots=1
    )
    ChangelogStream(src, base + "/ckpt").sync_to_table(
        spark, dst, key_cols=["event_id"]
    )
    return dst.read(spark).orderBy("event_id")


# --------------------------------------------------------------------------
# OAuth2 + REST views end-to-end: the client exchanges client-credentials
# at /v1/oauth/tokens (iceberg.catalog.credential passthrough), creates a
# table and a SQL view through the authenticated catalog, reads the view,
# replaces its SQL (the spec's add-view-version + set-current -1 commit),
# and reads again — the result proves both the handshake and view
# versioning drive real execution.
# --------------------------------------------------------------------------
@register(
    "rest_view_oauth_roundtrip",
    oracle="""
    SELECT 'v1' AS version, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events WHERE event_id < 300
    GROUP BY event_type
    UNION ALL
    SELECT 'v2' AS version, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events WHERE event_id >= 300 AND event_id < 450
    GROUP BY event_type
    ORDER BY version, event_type
    """,
    tags=("ingestion", "lakehouse", "views"),
)
def rest_view_oauth_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties
    from ..sinks.rest_server import IcebergRestServer

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    wh = tempfile.mkdtemp(prefix="oauth_view_gate_")
    with IcebergRestServer(
        wh, credentials={"gate": "s3cr3t"}, token_ttl_s=3600
    ) as srv:
        cat = catalog_from_properties(
            {
                "iceberg.catalog.type": "rest",
                "iceberg.catalog.uri": srv.uri,
                "iceberg.catalog.credential": "gate:s3cr3t",
            }
        )
        t = cat.create_table("db.ev", e.schema)
        t.append(e.filter(F.col("event_id") < 450))
        cat.create_view(
            "db.by_type",
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM db_ev WHERE event_id < 300 GROUP BY event_type",
        )
        v1_rows = cat.read_view(spark, "db.by_type").select(
            F.lit("v1").alias("version"), "event_type", "n_rows"
        )
        r1 = v1_rows.collect()
        cat.replace_view(
            "db.by_type",
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM db_ev WHERE event_id >= 300 AND event_id < 450 "
            "GROUP BY event_type",
        )
        v2 = cat.read_view(spark, "db.by_type").select(
            F.lit("v2").alias("version"), "event_type", "n_rows"
        )
        v1_frozen = local_df(spark, r1, v2.schema)
        out = v1_frozen.unionAll(v2).orderBy("version", "event_type")
        # force execution while the server lives (view SQL resolution
        # needs the catalog; the underlying scans are plain storage)
        rows = out.collect()
    return local_df(spark, rows, out.schema)


# --------------------------------------------------------------------------
# Full-snapshot diff across a history rewrite (sinks/table.py
# snapshot_diff): changes_between refuses replace/compaction snapshots —
# the net change between the endpoint STATES is still well-defined, and
# this is the fallback it points at (plus ChangelogStream's
# on_rewrite="diff" hop). The scenario compacts mid-history, so the diffed
# range contains a rewrite by construction. Oracle: the net change
# computed directly from the predicates.
# --------------------------------------------------------------------------
@register(
    "snapshot_diff_changes",
    oracle="""
    SELECT event_id, event_type, 'delete' AS _change_type
    FROM events WHERE event_id < 300 AND event_id % 7 = 0
    UNION ALL
    SELECT event_id, event_type, 'insert' AS _change_type
    FROM events
    WHERE event_id >= 300 AND event_id < 500 AND event_id % 7 <> 0
    ORDER BY _change_type, event_id
    """,
    tags=("ingestion", "lakehouse", "cdc"),
)
def snapshot_diff_changes(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="sdiff_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 300))
    from_sid = t.current_snapshot()["snapshot_id"]
    t.append(e.filter((F.col("event_id") >= 300) & (F.col("event_id") < 500)))
    t.compact(spark)  # the rewrite changes_between cannot cross
    t.delete_where(spark, "event_id % 7 = 0", key_cols=["event_id"])
    return (
        t.snapshot_diff(spark, from_sid)
        .select("event_id", "event_type", "_change_type")
        .orderBy("_change_type", "event_id")
    )


# --------------------------------------------------------------------------
# Changelog compute-updates (operators/cdc.py compute_updates; Iceberg's
# create_changelog_view(..., identifier_columns)): within one ordinal a
# key with exactly one delete + one insert relabels to update_before /
# update_after; pure inserts and pure deletes pass through. The oracle
# encodes the engine-independent expectation directly: the upsert ordinal
# pairs every incoming key (equality deletes record keys whether or not a
# row existed — Iceberg's caveat too), the append ordinal stays insert,
# the delete ordinal stays delete with key-only rows.
# --------------------------------------------------------------------------
@register(
    "changelog_compute_updates",
    oracle="""
    SELECT event_id, event_type, 'insert' AS _change_type,
           0 AS _change_ordinal
    FROM events WHERE event_id < 300
    UNION ALL
    SELECT event_id, CAST(NULL AS VARCHAR) AS event_type,
           'update_before' AS _change_type, 1 AS _change_ordinal
    FROM events
    WHERE (event_id >= 100 AND event_id < 200)
       OR (event_id >= 500 AND event_id < 550)
    UNION ALL
    SELECT event_id, 'patched' AS event_type,
           'update_after' AS _change_type, 1 AS _change_ordinal
    FROM events
    WHERE (event_id >= 100 AND event_id < 200)
       OR (event_id >= 500 AND event_id < 550)
    UNION ALL
    SELECT event_id, CAST(NULL AS VARCHAR) AS event_type,
           'delete' AS _change_type, 2 AS _change_ordinal
    FROM events WHERE event_id < 50
    ORDER BY _change_ordinal, _change_type, event_id
    """,
    tags=("ingestion", "lakehouse", "cdc"),
)
def changelog_compute_updates(spark, sf_dir):
    import tempfile

    from ..operators.cdc import compute_updates
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="cupd_gate_") + "/t", e.schema
    )
    t.append(e.filter(F.col("event_id") < 300))
    t.upsert(
        e.filter(
            ((F.col("event_id") >= 100) & (F.col("event_id") < 200))
            | ((F.col("event_id") >= 500) & (F.col("event_id") < 550))
        ).withColumn("event_type", F.lit("patched")),
        key_cols=["event_id"],
    )
    t.delete_where(spark, "event_id < 50", key_cols=["event_id"])
    ch = t.changes_between(spark, None)
    return (
        compute_updates(ch, ["event_id"])
        .select("event_id", "event_type", "_change_type", "_change_ordinal")
        .orderBy("_change_ordinal", "_change_type", "event_id")
    )


# --------------------------------------------------------------------------
# Changelog reconcile (streaming/changelog_source.py reconcile): full-state
# repair when snapshot EXPIRY removed the checkpointed snapshot from source
# history — the one stall neither incremental scan nor the on_rewrite=diff
# hop can cross (the snapshot is gone). The minimal current-state delta
# applies as one marker-carrying commit and incremental sync re-arms.
# Oracle: the source's expected final state.
# --------------------------------------------------------------------------
@register(
    "changelog_reconcile",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_id < 300 AND event_id % 5 <> 0
    UNION ALL
    SELECT event_id, 'patched' AS event_type
    FROM events
    WHERE event_id >= 400 AND event_id < 450 AND event_id % 5 <> 0
    ORDER BY event_id
    """,
    tags=("ingestion", "streaming", "cdc"),
)
def changelog_reconcile(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable
    from ..streaming.changelog_source import ChangelogStream, reconcile

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="recon_gate_")
    src = LakehouseTable.create(base + "/src", e.schema)
    src.append(e.filter(F.col("event_id") < 300))
    dst = LakehouseTable.create(base + "/dst", e.schema)
    stream = ChangelogStream(src, base + "/ckpt")
    stream.sync_to_table(spark, dst, key_cols=["event_id"])
    # source evolves, then expires the checkpointed snapshot from history
    src.upsert(
        e.filter((F.col("event_id") >= 400) & (F.col("event_id") < 450))
        .withColumn("event_type", F.lit("patched")),
        key_cols=["event_id"],
    )
    src.delete_where(spark, "event_id % 5 = 0", key_cols=["event_id"])
    src.expire_snapshots(keep_last=1)
    reconcile(stream, spark, dst, key_cols=["event_id"])
    return dst.read(spark).orderBy("event_id")


# --------------------------------------------------------------------------
# rewrite_manifests (Iceberg's metadata-only rewrite_manifests procedure):
# squash the per-snapshot manifest walk into one full manifest WITHOUT
# touching data files. The gate proves (a) reads are bit-identical, (b) the
# data plane is untouched (identical file paths), (c) the metadata walk
# collapses to depth 1, and (d) incremental/changelog consumers stream
# straight across the squash snapshot. Row facts come from the table itself;
# the metadata facts are literal booleans.
# --------------------------------------------------------------------------
@register(
    "maintenance_rewrite_manifests",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           TRUE AS squash_metadata_only,
           TRUE AS walk_collapsed,
           TRUE AS incremental_transparent,
           TRUE AS history_intact
    FROM events WHERE event_id < 900
    """,
    tags=("ingestion", "lakehouse", "maintenance"),
)
def maintenance_rewrite_manifests(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="rwm_gate_")
    t = LakehouseTable.create(base + "/t", e.schema)
    for lo in (0, 200, 400, 600):
        t.append(
            e.filter((F.col("event_id") >= lo) & (F.col("event_id") < lo + 200))
        )
    mark = t.current_snapshot()["snapshot_id"]
    paths_before = sorted(f["path"] for f in t.live_files()[0])
    n_snaps_before = len(t.snapshots())
    snap = t.rewrite_manifests()
    squash_metadata_only = (
        snap is not None
        and snap["operation"] == "rewrite-manifests"
        and sorted(f["path"] for f in t.live_files()[0]) == paths_before
    )
    # the ancestry walk now terminates at the squash snapshot
    walk_collapsed = t.current_snapshot().get("replace") is True
    history_intact = len(t.snapshots()) == n_snaps_before + 1
    # a post-squash append streams across the squash: incremental scan
    # from the pre-squash head sees ONLY the new rows
    t.append(e.filter((F.col("event_id") >= 800) & (F.col("event_id") < 900)))
    inc = t.appends_between(spark, mark)
    ch = t.changes_between(spark, mark)
    incremental_transparent = (
        inc.count() == ch.count()
        and inc.agg(F.min("event_id")).first()[0] >= 800
    )
    return t.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ).select(
        "n_rows",
        "sum_ids",
        F.lit(bool(squash_metadata_only)).alias("squash_metadata_only"),
        F.lit(bool(walk_collapsed)).alias("walk_collapsed"),
        F.lit(bool(incremental_transparent)).alias("incremental_transparent"),
        F.lit(bool(history_intact)).alias("history_intact"),
    )


# --------------------------------------------------------------------------
# analyze / compute_table_stats (Iceberg's ANALYZE + puffin NDV statistics):
# one column-pruned pass computes per-column NDV / null-count / bounds and
# persists them as a snapshot-keyed statistics file referenced from the
# version metadata. Gate runs mode="exact" (the verification twin of the
# production HLL mode, same single-pass plan shape) and checks the stats
# themselves against DuckDB aggregates; the double column's bounds are
# nulled on both sides (float-to-string rendering is engine-specific).
# --------------------------------------------------------------------------
@register(
    "table_column_stats",
    oracle="""
    WITH e AS (
        SELECT event_id, event_type, value FROM events WHERE event_id < 700
    )
    SELECT 'event_id' AS column_name,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS ndv,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_count,
           CAST(MIN(event_id) AS VARCHAR) AS lower_bound,
           CAST(MAX(event_id) AS VARCHAR) AS upper_bound,
           CAST(COUNT(*) AS BIGINT) AS row_count
    FROM e
    UNION ALL
    SELECT 'event_type',
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           MIN(event_type), MAX(event_type), CAST(COUNT(*) AS BIGINT)
    FROM e
    UNION ALL
    SELECT 'value',
           CAST(COUNT(DISTINCT value) AS BIGINT),
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           NULL, NULL, CAST(COUNT(*) AS BIGINT)
    FROM e
    """,
    tags=("ingestion", "lakehouse", "maintenance"),
)
def table_column_stats(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base = tempfile.mkdtemp(prefix="stats_gate_")
    t = LakehouseTable.create(base + "/t", e.schema)
    t.append(e.filter(F.col("event_id") < 400))
    t.append(e.filter((F.col("event_id") >= 400) & (F.col("event_id") < 700)))
    t.analyze(spark, mode="exact")
    s = t.stats_df(spark)
    return s.select(
        "column_name",
        "ndv",
        "null_count",
        F.when(F.col("column_name") != "value", F.col("lower_bound")).alias(
            "lower_bound"
        ),
        F.when(F.col("column_name") != "value", F.col("upper_bound")).alias(
            "upper_bound"
        ),
        "row_count",
    )


# --------------------------------------------------------------------------
# Zero-copy clone (Iceberg `snapshot` procedure / Delta shallow clone): a
# staging twin referencing the source's live files in place. The gate builds
# a source with merge-on-read state (equality deletes), clones it, diverges
# BOTH sides, and checks: clone reads = source state at clone time (deletes
# still masking), divergence is isolated, and the clone root holds zero data
# files of its own.
# --------------------------------------------------------------------------
@register(
    "table_zero_copy_clone",
    oracle="""
    WITH base AS (
        SELECT event_id,
               CASE WHEN event_id >= 100 AND event_id < 150
                    THEN 'patched' ELSE event_type END AS event_type
        FROM events WHERE event_id < 500
    )
    SELECT 'clone' AS side,
           CAST(COUNT(*) + 50 AS BIGINT) AS n_rows,
           CAST(SUM(event_id)
                + (SELECT SUM(event_id) FROM events
                   WHERE event_id >= 500 AND event_id < 550)
                AS BIGINT) AS sum_ids,
           CAST(SUM(CASE WHEN event_type = 'patched' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_patched,
           TRUE AS zero_copy, TRUE AS isolated
    FROM base
    UNION ALL
    SELECT 'src',
           CAST(COUNT(*) + 50 AS BIGINT),
           CAST(SUM(event_id)
                + (SELECT SUM(event_id) FROM events
                   WHERE event_id >= 600 AND event_id < 650)
                AS BIGINT),
           CAST(SUM(CASE WHEN event_type = 'patched' THEN 1 ELSE 0 END)
                AS BIGINT),
           TRUE, TRUE
    FROM base
    """,
    tags=("ingestion", "lakehouse", "maintenance"),
)
def table_zero_copy_clone(spark, sf_dir):
    import glob as globmod
    import os
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="clone_gate_")
    src = LakehouseTable.create(
        base + "/src", e.schema, identifier_fields=["event_id"]
    )
    src.append(e.filter(F.col("event_id") < 500))
    src.upsert(
        e.filter((F.col("event_id") >= 100) & (F.col("event_id") < 150))
        .withColumn("event_type", F.lit("patched"))
    )
    clone = src.clone_to(base + "/clone")
    zero_copy = (
        globmod.glob(
            os.path.join(clone.root, "data", "**", "*.parquet"), recursive=True
        )
        == []
    )
    # diverge both sides; neither sees the other's rows
    clone.append(
        e.filter((F.col("event_id") >= 500) & (F.col("event_id") < 550))
    )
    src.append(
        e.filter((F.col("event_id") >= 600) & (F.col("event_id") < 650))
    )
    isolated = (
        clone.read(spark).filter(F.col("event_id") >= 600).count() == 0
        and src.read(spark).filter(
            (F.col("event_id") >= 500) & (F.col("event_id") < 600)
        ).count() == 0
    )

    def _agg(t, side):
        return t.read(spark).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
            F.sum(
                F.when(F.col("event_type") == "patched", 1).otherwise(0)
            ).cast("bigint").alias("n_patched"),
        ).select(
            F.lit(side).alias("side"),
            "n_rows",
            "sum_ids",
            "n_patched",
            F.lit(bool(zero_copy)).alias("zero_copy"),
            F.lit(bool(isolated)).alias("isolated"),
        )

    return _agg(clone, "clone").unionByName(_agg(src, "src"))


# --------------------------------------------------------------------------
# Statistics-driven join planning: the consumer side of analyze()/manifest
# byte counts — strategy decided from table METADATA before any task runs
# (broadcast here: the dim side's live bytes are under threshold). The gate
# checks both the join result and that the planner actually chose broadcast.
# --------------------------------------------------------------------------
@register(
    "stats_planned_join",
    oracle="""
    WITH e AS (
        SELECT event_id, event_type FROM events WHERE event_id < 2000
    ),
    d AS (
        SELECT DISTINCT event_type, upper(event_type) AS category FROM events
    )
    SELECT d.category,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(e.event_id) AS BIGINT) AS sum_ids,
           TRUE AS broadcast_planned
    FROM e JOIN d USING (event_type)
    GROUP BY d.category
    """,
    tags=("ingestion", "lakehouse", "analytics"),
)
def stats_planned_join(spark, sf_dir):
    import tempfile

    from ..operators.joinplan import stats_join
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="joinplan_gate_")
    big = LakehouseTable.create(base + "/big", e.schema)
    big.append(e.filter(F.col("event_id") < 2000))
    dim_df = (
        commit_src(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("category", F.upper("event_type"))
    )
    dim = LakehouseTable.create(base + "/dim", dim_df.schema)
    dim.append(dim_df)
    joined, decision = stats_join(spark, big, dim, "event_type")
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    ).select(
        "category",
        "n_rows",
        "sum_ids",
        F.lit(decision["strategy"] == "broadcast").alias("broadcast_planned"),
    )


# --------------------------------------------------------------------------
# remove_dangling_deletes (Iceberg RewriteDataFiles removeDanglingDeletes):
# after a binpack rewrote every data file to the top sequence, the upsert's
# equality-delete files mask nothing but are still loaded by every scan.
# The gate proves the prune is metadata-only and read-neutral: rows after =
# rows before = the upsert-patched state, with the delete files gone.
# --------------------------------------------------------------------------
@register(
    "maintenance_dangling_deletes",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_type = 'patched' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_patched,
           TRUE AS deletes_pruned,
           TRUE AS reads_unchanged
    FROM (
        SELECT event_id,
               CASE WHEN event_id >= 100 AND event_id < 150
                    THEN 'patched' ELSE event_type END AS event_type
        FROM events WHERE event_id < 400
    )
    """,
    tags=("ingestion", "lakehouse", "maintenance"),
)
def maintenance_dangling_deletes(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="dangle_gate_")
    t = LakehouseTable.create(
        base + "/t", e.schema, identifier_fields=["event_id"]
    )
    t.append(e.filter(F.col("event_id") < 400))
    t.upsert(
        e.filter((F.col("event_id") >= 100) & (F.col("event_id") < 150))
        .withColumn("event_type", F.lit("patched"))
    )
    t.rewrite_small_files(spark, min_file_size=1 << 40)  # all → top seq
    had_deletes = len(t.live_files()[1]) >= 1
    before = t.read(spark).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.crc32("event_type")).alias("h")
    ).first()
    snap = t.remove_dangling_deletes()
    after = t.read(spark).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.crc32("event_type")).alias("h")
    ).first()
    deletes_pruned = (
        had_deletes and snap is not None and t.live_files()[1] == []
    )
    reads_unchanged = (before.n, before.h) == (after.n, after.h)
    return t.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("event_type") == "patched", 1).otherwise(0)
        ).cast("bigint").alias("n_patched"),
    ).select(
        "n_rows",
        "n_patched",
        F.lit(bool(deletes_pruned)).alias("deletes_pruned"),
        F.lit(bool(reads_unchanged)).alias("reads_unchanged"),
    )


# --------------------------------------------------------------------------
# VARIANT extraction (Spark 4's native schemaless-JSON lane, the modern
# sibling of the JsonToMap SMT family): events.props parses once into a
# VariantType value; typed fields come out via variant_get paths. The
# oracle is DuckDB's json_extract on the same payloads.
# --------------------------------------------------------------------------
@register(
    "smt_json_variant_extract",
    oracle="""
    SELECT CAST(k % 10 AS BIGINT) AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
    )
    WHERE k IS NOT NULL
    GROUP BY k % 10
    """,
    tags=("ingestion", "smt"),
)
def smt_json_variant_extract(spark, sf_dir):
    from ..transforms.json_to_map import json_variant_columns

    e = table(spark, sf_dir, "events").select("event_id", "props")
    extracted = json_variant_columns("props", {"k": ("$.k", "bigint")})(e)
    return (
        extracted.filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).cast("bigint").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


# --------------------------------------------------------------------------
# MERGE ... WHEN NOT MATCHED BY SOURCE (SQL:2023, Spark 3.4+): the full-sync
# statement — one atomic commit makes the target equal the source, deletes
# included. Target starts as events<300, the source is events 100-400 with
# patched types; after the merge the target must BE the source.
# --------------------------------------------------------------------------
@register(
    "merge_full_sync",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           'patched' AS event_type
    FROM events WHERE event_id >= 100 AND event_id < 400
    """,
    tags=("ingestion", "dml"),
)
def merge_full_sync(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="fullsync_gate_")
    t = LakehouseTable.create(base + "/t", e.schema)
    t.append(e.filter(F.col("event_id") < 300))
    src = (
        e.filter((F.col("event_id") >= 100) & (F.col("event_id") < 400))
        .withColumn("event_type", F.lit("patched"))
    )
    t.merge(
        spark, src, on=["event_id"],
        when_matched="update", when_not_matched="insert",
        when_not_matched_by_source="delete",
    )
    return t.read(spark).select(
        F.col("event_id").cast("bigint").alias("event_id"), "event_type"
    )


# --------------------------------------------------------------------------
# X97: Iceberg v3 deletion vectors. Position deletes accumulate one file
# per DELETE; rewrite_position_deletes consolidates them into ONE portable
# 64-bit roaring bitmap per referenced data file, stored as
# deletion-vector-v1 blobs of a single Puffin file — then a second DELETE
# lands on top and a second rewrite folds the old vectors in. The read
# both before and after must equal the plain SQL twin; the bitmaps decode
# executor-side (mapInPandas), never on the driver.
# --------------------------------------------------------------------------
@register(
    "dml_deletion_vectors",
    oracle="""
    WITH doubled AS (
        SELECT event_id, event_type FROM events WHERE event_id < 600
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_id < 600
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM doubled
    WHERE NOT (event_id % 3 = 0) AND NOT (event_id % 7 = 1)
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("ingestion", "lakehouse"),
)
def dml_deletion_vectors(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").filter(F.col("event_id") < 600).select(
        "event_id", "event_type"
    )
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="dv_gate_") + "/t", e.schema
    )
    t.append(e.unionAll(e))  # duplicates: only positional identity works
    t.delete_where_positions(spark, "event_id % 3 = 0")
    snap = t.rewrite_position_deletes(spark)
    assert snap is not None and snap["operation"] == "rewrite-deletes"
    # more deletes on top of the vectors, then fold those in too
    t.delete_where_positions(spark, "event_id % 7 = 1")
    t.rewrite_position_deletes(spark)
    _, deletes = t.live_files()
    assert {d.get("delete_type") for d in deletes} == {"dv"}
    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# X98: v3 default column values. A column added mid-history backfills
# files written before it existed with its initial-default AT READ TIME
# (zero data rewrite), while appends that omit it fill with the
# write-default and explicit values win — the oracle states the expected
# region per event_id range directly.
# --------------------------------------------------------------------------
@register(
    "schema_add_column_default",
    oracle="""
    SELECT CASE
             WHEN event_id < 250 THEN 'unassigned'
             WHEN event_id < 500 THEN 'web'
             ELSE event_type
           END AS region,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events WHERE event_id < 750
    GROUP BY 1 ORDER BY region
    """,
    tags=("ingestion", "lakehouse"),
)
def schema_add_column_default(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="coldef_gate_") + "/t",
        e.filter(F.col("event_id") < 0).schema,
    )
    t.append(e.filter(F.col("event_id") < 250))
    t.add_column(
        "region",
        T.StringType(),
        initial_default="unassigned",
        write_default="web",
    )
    t.append(e.filter((F.col("event_id") >= 250) & (F.col("event_id") < 500)))
    t.append(
        e.filter((F.col("event_id") >= 500) & (F.col("event_id") < 750))
        .withColumn("region", F.col("event_type"))
    )
    return (
        t.read(spark)
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("region")
    )


# --------------------------------------------------------------------------
# X100: v3 row lineage. Chunks append OUT of key order (so _row_id is a
# genuine insertion-order id, not the key), a positional DELETE removes
# rows (survivors keep their ids — deleted ids are never reused), and a
# compaction rewrites every file (ids survive because the rewrite
# materializes the lineage fields). The oracle states the expected id and
# last-updated sequence per event_id range directly.
# --------------------------------------------------------------------------
@register(
    "row_lineage_ids",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(CASE
             WHEN event_id >= 400 THEN event_id - 400
             WHEN event_id < 200 THEN event_id + 200
             ELSE event_id + 200
           END AS BIGINT) AS row_id,
           CAST(CASE
             WHEN event_id >= 400 THEN 1
             WHEN event_id < 200 THEN 2
             ELSE 3
           END AS BIGINT) AS last_seq
    FROM events
    WHERE event_id < 600 AND event_id % 7 != 0
    """,
    tags=("ingestion", "lakehouse"),
)
def row_lineage_ids(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="lineage_gate_") + "/t",
        e.filter(F.col("event_id") < 0).schema,
        properties={"format-version": "3"},  # lineage is a v3 feature
    )
    for lo, hi in ((400, 600), (0, 200), (200, 400)):
        t.append(
            e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .coalesce(1)
            .sortWithinPartitions("event_id")
        )
    t.delete_where_positions(spark, "event_id % 7 = 0")
    t.compact(spark)
    return t.read_with_lineage(spark).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("_row_id").cast("bigint").alias("row_id"),
        F.col("_last_updated_sequence_number").cast("bigint").alias("last_seq"),
    )


# --------------------------------------------------------------------------
# X100b: incremental poll WITH row lineage — the CDC-consumer pattern
# lineage exists for: poll only the appends since a snapshot and key
# downstream state on _row_id. Chunks land out of key order, so the ids
# prove insertion-order assignment; the poll covers chunks 2+3 only.
# --------------------------------------------------------------------------
@register(
    "appends_lineage_poll",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(CASE WHEN event_id < 150 THEN event_id + 300
                     ELSE event_id - 150 END AS BIGINT) AS row_id
    FROM events WHERE event_id < 450 AND event_id >= 300 OR event_id < 150
    """,
    tags=("ingestion", "lakehouse"),
)
def appends_lineage_poll(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="lineage_poll_") + "/t",
        e.filter(F.col("event_id") < 0).schema,
        properties={"format-version": "3"},  # lineage is a v3 feature
    )

    def chunk(lo, hi):
        return (
            e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .coalesce(1)
            .sortWithinPartitions("event_id")
        )

    t.append(chunk(150, 300))  # ids 0..149 — before the poll window
    s1 = t.current_snapshot()["snapshot_id"]
    t.append(chunk(300, 450))  # ids 150..299
    t.append(chunk(0, 150))  # ids 300..449
    return t.appends_between(spark, s1, with_lineage=True).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("_row_id").cast("bigint").alias("row_id"),
    )


# --------------------------------------------------------------------------
# X101: format-version-3 interop round-trip. A v3 table accumulates a
# deletion vector (position deletes consolidated into one Puffin blob),
# exports REAL Iceberg v3 metadata — the DV stays native: a content=1
# manifest entry with file_format PUFFIN and referenced_data_file/
# content_offset/content_size_in_bytes pointing into the blob, plus row
# lineage (next-row-id, per-file first_row_id field 142) — and an import
# of the exported tree preserves delete_type == "dv" (asserted in-query)
# and reads identical rows WITH identical _row_ids. One sorted chunk
# makes _row_id == ordinal == event_id, so the oracle states ids exactly.
# --------------------------------------------------------------------------
@register(
    "iceberg_v3_roundtrip",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(event_id AS BIGINT) AS row_id,
           CAST(1 AS BIGINT) AS n_dv
    FROM events
    WHERE event_id < 400 AND event_id % 6 != 1
    """,
    tags=("ingestion", "lakehouse", "interop"),
)
def iceberg_v3_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.iceberg_export import export_iceberg_metadata
    from ..sinks.iceberg_import import import_iceberg_table
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="v3_interop_gate_")
    t = LakehouseTable.create(
        base + "/src",
        e.schema,
        properties={"format-version": "3"},
    )
    t.append(
        e.filter(F.col("event_id") < 400)
        .coalesce(1)
        .sortWithinPartitions("event_id")
    )
    t.delete_where_positions(spark, "event_id % 6 = 1")
    t.rewrite_position_deletes(spark)
    imp = import_iceberg_table(export_iceberg_metadata(t), base + "/dst")
    _, dels = imp.live_files()
    n_dv = sum(1 for f in dels if f.get("delete_type") == "dv")
    if n_dv != 1 or len(dels) != 1:
        raise AssertionError(
            f"v3 round-trip lost the native DV: {dels}"
        )
    return imp.read_with_lineage(spark).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("_row_id").cast("bigint").alias("row_id"),
        F.lit(n_dv).cast("bigint").alias("n_dv"),
    )


# --------------------------------------------------------------------------
# X102: row lineage through the changelog — the CDC-consumer contract the
# v3 ids exist for. Chunks append out of key order (ids are insertion-
# order, not key-order), then a positional DELETE; the changelog from the
# first snapshot emits chunk-B inserts carrying the ids they CREATE and
# delete rows carrying the ids they KILL (full deleted rows, both chunks).
# The oracle states every (event_id, change_type, row_id) directly.
# --------------------------------------------------------------------------
@register(
    "changelog_lineage",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           'insert' AS change_type,
           CAST(event_id + 200 AS BIGINT) AS row_id
    FROM events WHERE event_id < 100
    UNION ALL
    SELECT CAST(event_id AS BIGINT) AS event_id,
           'delete' AS change_type,
           CAST(CASE WHEN event_id < 100 THEN event_id + 200
                     ELSE event_id - 100 END AS BIGINT) AS row_id
    FROM events WHERE event_id < 300 AND event_id % 9 = 4
    """,
    tags=("ingestion", "lakehouse", "cdc"),
)
def changelog_lineage(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    t = LakehouseTable.create(
        tempfile.mkdtemp(prefix="cl_lineage_gate_") + "/t",
        e.schema,
        properties={"format-version": "3"},
    )

    def chunk(lo, hi):
        return (
            e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .coalesce(1)
            .sortWithinPartitions("event_id")
        )

    t.append(chunk(100, 300))  # ids 0..199
    s1 = t.current_snapshot()["snapshot_id"]
    t.append(chunk(0, 100))  # ids 200..299 — out of key order
    t.delete_where_positions(spark, "event_id % 9 = 4")
    return t.changes_between(spark, s1, with_lineage=True).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("_change_type").alias("change_type"),
        F.col("_row_id").cast("bigint").alias("row_id"),
    )


# --------------------------------------------------------------------------
# X106: table statistics (Iceberg "Table statistics" parity): per-column
# NDV via the KMV bottom-k sketch — exact below k distinct, INTEGER-exact
# estimate above ((k-1)*2^60 // m_k, no floats) — written as blobs of a
# Puffin statistics file keyed by snapshot, exported into metadata.json
# `statistics` and re-imported; the query reads the NDVs back from the
# IMPORTED table, so the value crosses the interop boundary. k=256 makes
# event_id exercise the estimator while user_id/event_type stay exact.
# --------------------------------------------------------------------------
@register(
    "table_stats_ndv",
    oracle="""
    WITH h AS (
        SELECT DISTINCT CAST(concat('0x',
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
        FROM events WHERE event_id < 3000
    ),
    b AS (SELECT h FROM h ORDER BY h LIMIT 256),
    est AS (SELECT COUNT(*) AS n, MAX(h) AS m FROM b)
    SELECT 'event_id' AS col,
           CAST(CASE WHEN n < 256 THEN n
                     ELSE (255::HUGEINT * (1::HUGEINT << 60)) // m
                END AS BIGINT) AS ndv
    FROM est
    UNION ALL
    SELECT 'event_type' AS col,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv
    FROM events WHERE event_id < 3000
    UNION ALL
    SELECT 'user_id' AS col,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv
    FROM events WHERE event_id < 3000
    """,
    tags=("ingestion", "lakehouse", "stats"),
)
def table_stats_ndv(spark, sf_dir):
    import tempfile

    from ..sinks.iceberg_export import export_iceberg_metadata
    from ..sinks.iceberg_import import import_iceberg_table
    from ..sinks.table import LakehouseTable

    e = commit_src(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    base = tempfile.mkdtemp(prefix="stats_ndv_gate_")
    t = LakehouseTable.create(base + "/src", e.schema)
    t.append(e.filter(F.col("event_id") < 3000))
    t.compute_statistics(spark, k=256)
    imp = import_iceberg_table(export_iceberg_metadata(t), base + "/dst")
    stats = imp.statistics()
    if not stats:
        raise AssertionError("statistics did not survive the round-trip")
    return local_df(spark, 
        sorted((c, int(v)) for c, v in stats.items()), "col string, ndv long"
    )


# --------------------------------------------------------------------------
# X110: Nessie catalog round-trip — the reference's type=nessie leg
# (data/Utilities.java:68-121 loads NessieCatalog) executable end-to-end
# against an in-process implementation of the public Nessie REST API v2
# (sinks/nessie_server.py; client sinks/nessie_catalog.py). Exercises the
# versioned-catalog semantics a per-table catalog can't express: a branch
# freezes every table pointer, work publishes on the branch, ONE merge
# lands it on main — plus key-level CAS and pointer republish. The oracle
# recomputes surviving rows straight from parquet.
# --------------------------------------------------------------------------
@register(
    "nessie_catalog_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    WHERE event_id < 500 AND event_id % 8 != 3
    """,
    tags=("ingestion", "lakehouse", "catalog"),
)
def nessie_catalog_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties
    from ..sinks.nessie_server import NessieServer

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="nessie_gate_")
    with NessieServer() as srv:
        cat = catalog_from_properties(
            {
                "iceberg.catalog.type": "nessie",
                "iceberg.catalog.uri": srv.uri,
                "iceberg.catalog.warehouse": base + "/wh",
            }
        )
        t = cat.create_table("db.events", e.schema)
        t.append(e.filter(F.col("event_id") < 500))
        cat.load_table("db.events")  # publish the appended state on main
        # branch work: the delete publishes on 'cleanup', main stays
        # frozen until the merge lands the pointer move atomically
        cat.create_branch("cleanup")
        dev = cat.on_ref("cleanup")
        t.delete_where(spark, "event_id % 8 = 3", key_cols=["event_id"])
        dev.load_table("db.events")
        before_merge = cat._content("db.events")["metadataLocation"]
        after_branch = dev._content("db.events")["metadataLocation"]
        if before_merge == after_branch:
            raise AssertionError("branch failed to isolate the pointer")
        cat.merge("cleanup")
        if cat._content("db.events")["metadataLocation"] != after_branch:
            raise AssertionError("merge did not land the branch pointer")
        df = cat.load_table("db.events").read(spark)
    # the catalog only arbitrates pointers — the scan goes straight to
    # storage and stays valid after the service is gone
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


# --------------------------------------------------------------------------
# X111: DynamoDB catalog round-trip — the reference's
# catalog-impl=...DynamoDbCatalog leg executable end-to-end: SigV4-signed
# stdlib client (full canonical-request -> string-to-sign -> derived-key
# chain, pinned against AWS's published known-answer vector) against an
# in-process DynamoDB-API stub that VERIFIES every signature; Iceberg's
# identifier/namespace item layout with version-UUID conditional swaps
# (the optimistic lock). The oracle recomputes surviving rows from
# parquet.
# --------------------------------------------------------------------------
@register(
    "dynamodb_catalog_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 450 AND event_id % 10 != 4
    """,
    tags=("ingestion", "lakehouse", "catalog"),
)
def dynamodb_catalog_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties
    from ..sinks.dynamodb_server import DynamoDbServer

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="ddb_gate_")
    ak, sk = "AKIDGATE", "gate-secret-key"
    with DynamoDbServer(access_key=ak, secret_key=sk) as srv:
        cat = catalog_from_properties(
            {
                "iceberg.catalog.catalog-impl": (
                    "org.apache.iceberg.aws.dynamodb.DynamoDbCatalog"
                ),
                "iceberg.catalog.uri": srv.uri,
                "iceberg.catalog.warehouse": base + "/wh",
                "iceberg.catalog.s3.access-key-id": ak,
                "iceberg.catalog.s3.secret-access-key": sk,
            }
        )
        t = cat.create_table("db.events", e.schema)
        t.append(e.filter(F.col("event_id") < 450))
        t.delete_where(spark, "event_id % 10 = 4", key_cols=["event_id"])
        df = cat.load_table("db.events").read(spark)
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


# --------------------------------------------------------------------------
# X112: Glue catalog round-trip — the reference's type=glue leg executable
# end-to-end: the shared SigV4 signer over Glue JSON 1.1, Iceberg's
# EXTERNAL_TABLE/table_type=ICEBERG parameter layout, and Glue's VersionId
# optimistic locking (a stale version fails the UpdateTable — Iceberg's
# lock-free commit on Glue). Signature-verifying in-process stub. The
# oracle recomputes surviving rows from parquet.
# --------------------------------------------------------------------------
@register(
    "glue_catalog_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 420 AND event_id % 12 != 5
    """,
    tags=("ingestion", "lakehouse", "catalog"),
)
def glue_catalog_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties
    from ..sinks.glue_server import GlueServer

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="glue_gate_")
    ak, sk = "AKIDGATE", "gate-secret-key"
    with GlueServer(access_key=ak, secret_key=sk) as srv:
        cat = catalog_from_properties(
            {
                "iceberg.catalog.type": "glue",
                "iceberg.catalog.uri": srv.uri,
                "iceberg.catalog.warehouse": base + "/wh",
                "iceberg.catalog.s3.access-key-id": ak,
                "iceberg.catalog.s3.secret-access-key": sk,
            }
        )
        t = cat.create_table("db.events", e.schema)
        t.append(e.filter(F.col("event_id") < 420))
        t.delete_where(spark, "event_id % 12 = 5", key_cols=["event_id"])
        df = cat.load_table("db.events").read(spark)
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


# --------------------------------------------------------------------------
# X113: Hive Metastore catalog round-trip — the reference's DEFAULT
# catalog leg (data/Utilities.java:68-121 loads Iceberg's HiveCatalog
# when no type/catalog-impl is set) executable end-to-end: strict
# unframed thrift binary protocol from a stdlib codec, EXTERNAL_TABLE +
# table_type=ICEBERG parameters, and Iceberg's HiveTableOperations
# commit protocol — EXCLUSIVE table lock, re-read-and-compare
# metadata_location, alter_table_with_environment_context carrying the
# expected-parameter CAS (enforced server-side too). The in-process
# stub VERIFIES the wire protocol. Oracle recomputes surviving rows
# from parquet.
# --------------------------------------------------------------------------
@register(
    "hive_catalog_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 480 AND event_id % 11 != 3
    """,
    tags=("ingestion", "lakehouse", "catalog"),
)
def hive_catalog_roundtrip(spark, sf_dir):
    import tempfile

    from ..sinks.catalog import catalog_from_properties
    from ..sinks.hive_server import HiveMetastoreServer

    e = commit_src(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="hive_gate_")
    with HiveMetastoreServer() as srv:
        cat = catalog_from_properties(
            {
                # no type: hive IS the default (CatalogUtil semantics)
                "iceberg.catalog.uri": srv.uri,
                "iceberg.catalog.warehouse": base + "/wh",
            }
        )
        t = cat.create_table("db.events", e.schema)
        t.append(e.filter(F.col("event_id") < 480))
        t.delete_where(spark, "event_id % 11 = 3", key_cols=["event_id"])
        df = cat.load_table("db.events").read(spark)
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


# --------------------------------------------------------------------------
# X115: partition statistics files — Iceberg's persisted per-snapshot
# per-partition rollups (spec "Partition statistics"): a manifest-only
# walk (no data read — the refresh costs the same at any data scale with
# the same file count) producing one parquet stats file registered under
# metadata["partition-statistics"] with replace-by-snapshot, incremental
# refresh folding only appended manifests. The gate builds a
# day-partitioned table from events, computes stats, and the oracle
# recomputes the per-day record counts from the raw parquet.
# --------------------------------------------------------------------------
@register(
    "partition_stats_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS data_record_count
    FROM events WHERE event_id < 700
    GROUP BY 1 ORDER BY 1
    """,
    tags=("ingestion", "lakehouse", "statistics"),
)
def partition_stats_rollup(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = (
        commit_src(spark, sf_dir, "events")
        .filter(F.col("event_id") < 700)
        .select(
            "event_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            "value",
        )
    )
    root = tempfile.mkdtemp(prefix="pstats_gate_") + "/t"
    t = LakehouseTable.create(root, e.schema, partition_by=["day"])
    # two appends so the incremental path (fold only the second
    # append's manifest onto the recorded rows) is what's gated
    t.append(e.filter(F.col("event_id") < 350))
    t.compute_partition_statistics()
    t.append(e.filter(F.col("event_id") >= 350))
    rows = t.compute_partition_statistics(mode="incremental")
    return local_df(spark, 
        [(r["partition"]["day"], r["data_record_count"]) for r in rows],
        "day string, data_record_count long",
    ).orderBy("day")


# --------------------------------------------------------------------------
# X116 gate for the z-order rewrite (compact(zorder_by=...), Iceberg
# rewrite_data_files strategy=sort with a z-order expression): rows
# survive the Morton-interleave reclustering bit-exactly, and the
# rewritten files carry tight per-file bounds on BOTH listed columns
# (pruning sharpness itself is plan-pinned in test_scan_planning.py —
# a value gate can't see file pruning, so it pins the data instead).
# --------------------------------------------------------------------------
@register(
    "zorder_rewrite_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id < 800 AND user_id BETWEEN 100 AND 300
      AND value BETWEEN 10 AND 60
    """,
    tags=("ingestion", "lakehouse", "maintenance"),
)
def zorder_rewrite_scan(spark, sf_dir):
    import tempfile

    from ..sinks.table import LakehouseTable

    e = (
        commit_src(spark, sf_dir, "events")
        .filter(F.col("event_id") < 800)
        .select("event_id", "user_id", "value")
    )
    root = tempfile.mkdtemp(prefix="zorder_gate_") + "/t"
    t = LakehouseTable.create(root, e.schema)
    t.append(e.repartition(8))  # scatter first: the rewrite re-clusters
    t.compact(spark, zorder_by=["user_id", "value"])
    df = t.read(spark).filter(
        "user_id BETWEEN 100 AND 300 AND value BETWEEN 10 AND 60"
    )
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


# --------------------------------------------------------------------------
# X125: Delta Lake import — the OTHER common lakehouse format migrated
# zero-copy: a Delta transaction log (public PROTOCOL.md shape: JSON
# commits of protocol/metaData/add/remove, written here from the events
# parquet) replays to its live file set, registers via add_files (no
# data rewrite), and the imported table serves reads and row-level
# deletes. The log includes a remove+re-add compaction hop, so the
# replay semantics (not just a file listing) are what lands. Oracle
# recomputes from the same source rows.
# --------------------------------------------------------------------------
@register(
    "delta_import_migrate",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_id % 11 != 3
    GROUP BY event_type
    """,
    tags=("ingestion", "lakehouse", "interop"),
)
def delta_import_migrate(spark, sf_dir):
    import glob as _glob
    import json as _json
    import os
    import tempfile

    from ..sinks.delta_import import import_delta_table

    e = table(spark, sf_dir, "events")
    td = tempfile.mkdtemp(prefix="delta_src_")
    log = os.path.join(td, "_delta_log")
    os.makedirs(log)

    def _emit(name, df):
        staging = os.path.join(td, "_staging", name)
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        [src] = _glob.glob(os.path.join(staging, "*.parquet"))
        rel = f"part-{name}.parquet"
        os.replace(src, os.path.join(td, rel))
        return {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(td, rel)),
            "modificationTime": 1700000000000,
            "dataChange": True,
            "stats": _json.dumps({"numRecords": df.count()}),
        }

    half = e.where(F.col("event_id") % 2 == 0)
    other = e.where(F.col("event_id") % 2 == 1)
    a0, a1 = _emit("a", half), _emit("b", other)
    schema_string = e.schema.json()
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for act in (
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": "gate", "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": [], "configuration": {},
            }},
            {"add": a0},
            {"add": a1},
        ):
            f.write(_json.dumps(act) + "\n")
    # commit 1: compaction — b removed, rewritten as c (same rows)
    a2 = _emit("c", other)
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(_json.dumps({"remove": {"path": a1["path"],
                                        "dataChange": False}}) + "\n")
        f.write(_json.dumps({"add": a2}) + "\n")
    t = import_delta_table(td, tempfile.mkdtemp(prefix="delta_gate_") + "/t")
    t.delete_where(spark, "event_id % 11 = 3", key_cols=["event_id"])
    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
    )
