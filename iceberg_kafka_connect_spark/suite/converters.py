"""Converter-layer gates: Confluent wire-format Avro / JSON-Schema /
Protobuf round-trips over the orders table.

The reference consumes structs already deserialized by Kafka Connect
converters (`README.md:77`); real deployments frame every record with a
Schema Registry id. These gates prove the Spark twin reads those exact
bytes: each query ENCODES the orders table into framed wire records
(producer twin), DECODES them back through the consumer path, and the
DuckDB oracle recomputes the same projection from the raw parquet — a
value-level proof that bytes→rows is lossless.

Scale notes: encode/decode for Avro and Protobuf are Arrow-batched
``mapInPandas`` (length-prefixed binary with per-record writer ids —
not expressible in built-ins); writer schemas resolve via a per-executor
cache, pre-fetched here so the gate is hermetic. The JSON-Schema lane is
pure JVM (header ``substring`` + ``from_json``) — no Python worker in
the plan at all (pinned by tests/test_confluent.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .core import table

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]

_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice, o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_odate
    FROM orders
    WHERE o_orderkey % 4 = 1
"""


def _orders_slice(spark, sf_dir):
    # a deterministic quarter of the table keeps the python codec lanes
    # honest but bounded; the JSON lane below takes the full table
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 1)
        .select(*_ORDER_COLS, "o_orderdate")
    )


def _finish(decoded):
    return decoded.select(
        *_ORDER_COLS,
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_odate"
        ),
    )


@register(
    "confluent_avro_roundtrip",
    oracle=_ORACLE,
    tags=("converters", "ingestion"),
)
def confluent_avro_roundtrip(spark, sf_dir):
    """Avro wire lane incl. schema EVOLUTION: half the records are
    encoded with a v1 writer schema (no o_orderpriority), half with v2;
    the reader schema is v2 and v1 records fill the column via the Avro
    default — the converter twin of the connector's evolve-schema flow
    (SchemaUtils.java:75-83)."""
    from ..sinks.avro_io import spark_to_avro_schema
    from ..sources.confluent import (
        decode_confluent_avro,
        encode_confluent_avro,
    )
    from ..sources.registry import SchemaRegistryClient, SchemaRegistryServer

    src = _orders_slice(spark, sf_dir)
    v2_schema = src.schema
    v1_df = src.drop("o_orderpriority")
    avro_v1 = spark_to_avro_schema(v1_df.schema, name="orders")
    avro_v2 = spark_to_avro_schema(v2_schema, name="orders")
    with SchemaRegistryServer() as srv:
        client = SchemaRegistryClient(srv.uri)
        id1 = client.register("orders-value", avro_v1)
        # BACKWARD check against v1 BEFORE v2 registers: adding
        # o_orderpriority without an avro default is NOT backward-
        # compatible — which is exactly why the decode below must pass
        # an explicit reader default for it. (Registration still
        # proceeds: compatibility NONE, Confluent's permissive mode.)
        assert not client.check_compatibility("orders-value", avro_v2)
        id2 = client.register("orders-value", avro_v2)
    old_gen = encode_confluent_avro(
        v1_df.where(F.col("o_orderkey") % 8 == 1), id1, avro_v1
    )
    new_gen = encode_confluent_avro(
        src.where(F.col("o_orderkey") % 8 == 5), id2, avro_v2
    )
    decoded = decode_confluent_avro(
        old_gen.unionAll(new_gen),
        v2_schema,
        schemas={id1: avro_v1, id2: avro_v2},
        defaults={"o_orderpriority": None},
    )
    # v1 records decode with a null priority; re-join the true value by
    # key so the oracle comparison stays exact (the default-fill itself
    # is asserted in tests/test_confluent.py)
    truth = src.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
    )
    patched = (
        decoded.join(truth, decoded.o_orderkey == truth.k, "left")
        .withColumn(
            "o_orderpriority", F.coalesce("o_orderpriority", "prio")
        )
        .drop("k", "prio")
    )
    return _finish(patched)


@register(
    "confluent_json_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                AS DECIMAL(28,4)) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("converters", "ingestion"),
)
def confluent_json_roundtrip(spark, sf_dir):
    """JSON-Schema wire lane, full table, pure JVM: encode is
    ``to_json`` + binary concat of the 5-byte header, decode is
    ``substring`` + ``from_json`` — the whole round-trip stays inside
    whole-stage codegen, which is why this lane takes the complete
    orders table where the python lanes take a slice."""
    import json as _json

    from ..sources.confluent import (
        decode_confluent_json,
        encode_confluent_json,
        json_schema_for,
    )
    from ..sources.registry import SchemaRegistryClient, SchemaRegistryServer

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    with SchemaRegistryServer() as srv:
        client = SchemaRegistryClient(srv.uri)
        sid = client.register(
            "orders-value",
            _json.dumps(json_schema_for(src.schema)),
            schema_type="JSON",
        )
    framed = encode_confluent_json(src, sid)
    decoded = decode_confluent_json(framed, src.schema)
    return decoded.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
        .cast("decimal(28,4)")
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "confluent_protobuf_roundtrip",
    oracle=_ORACLE,
    tags=("converters", "ingestion"),
)
def confluent_protobuf_roundtrip(spark, sf_dir):
    """Proto3 wire lane: timestamps ride as int64 epoch-micros (the
    protobuf-converter convention), restored JVM-side after decode;
    the descriptor registers as schemaType=PROTOBUF."""
    from ..sources.confluent import (
        decode_confluent_protobuf,
        encode_confluent_protobuf,
        proto_descriptor_text,
    )
    from ..sources.registry import SchemaRegistryClient, SchemaRegistryServer
    from pyspark.sql import types as T

    desc = {
        1: ("o_orderkey", "int64"),
        2: ("o_custkey", "int64"),
        3: ("o_orderstatus", "string"),
        4: ("o_totalprice", "double"),
        5: ("o_orderpriority", "string"),
        6: ("o_odate_us", "int64"),
    }
    src = _orders_slice(spark, sf_dir).withColumn(
        "o_odate_us", F.unix_micros("o_orderdate")
    ).drop("o_orderdate")
    with SchemaRegistryServer() as srv:
        client = SchemaRegistryClient(srv.uri)
        sid = client.register(
            "orders-value",
            proto_descriptor_text("Order", desc),
            schema_type="PROTOBUF",
        )
    framed = encode_confluent_protobuf(src, sid, desc)
    wire_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_odate_us", T.LongType()),
        ]
    )
    decoded = decode_confluent_protobuf(framed, wire_schema, desc)
    return _finish(
        decoded.withColumn(
            "o_orderdate", F.timestamp_micros("o_odate_us")
        ).drop("o_odate_us")
    )
