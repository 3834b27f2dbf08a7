"""The reference's marquee scenario end-to-end: a Debezium CDC stream lands
as a correctly-merged lakehouse table.

Envelope JSON (op/before/after/source/ts_ms) → debezium_transform unwraps →
pipeline extracts the op from the _cdc struct → equality-delete upsert.
Mirrors IntegrationCdcTest (I/U/D mix → final row set)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.config import SinkConfig, TableConfig
from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sources.stream import file_stream_source
from iceberg_kafka_connect_spark.streaming import SinkPipeline
from iceberg_kafka_connect_spark.transforms import debezium_transform

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("data", T.StringType())]
)
ENVELOPE = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("before", ROW),
        T.StructField("after", ROW),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType()),
                    T.StructField("schema", T.StringType()),
                    T.StructField("table", T.StringType()),
                ]
            ),
        ),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _envelope(op, before, after, ts):
    return {
        "op": op,
        "before": before,
        "after": after,
        "source": {"db": "appdb", "schema": None, "table": "accounts"},
        "ts_ms": ts,
    }


def test_debezium_cdc_stream_to_table(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "wh"))
    cfg = SinkConfig(
        tables=[TableConfig("default.accounts", id_columns=["id"])],
        cdc_field="_cdc.op",
        auto_create=True,
    )
    pipe = SinkPipeline(
        catalog,
        cfg,
        "debz",
        value_schema=ENVELOPE,
        transforms=[debezium_transform()],
    )
    src = tmp_path / "src"
    src.mkdir()
    envelopes = [
        _envelope("c", None, {"id": 1, "data": "alice"}, 1000),
        _envelope("c", None, {"id": 2, "data": "bob"}, 2000),
        _envelope("u", {"id": 1, "data": "alice"}, {"id": 1, "data": "alice2"}, 3000),
        _envelope("d", {"id": 2, "data": "bob"}, None, 4000),
        _envelope("r", None, {"id": 3, "data": "carol"}, 5000),  # snapshot read
    ]
    with open(src / "a.json", "w") as f:
        for off, env in enumerate(envelopes):
            f.write(
                json.dumps(
                    {
                        "key": str(env.get("after", {}) or env.get("before", {})),
                        "value": json.dumps(env),
                        "topic": "appdb.accounts",
                        "partition": 0,
                        "offset": off,
                        "timestamp": "2024-01-01T00:00:00.000Z",
                    }
                )
                + "\n"
            )
    q = pipe.start(file_stream_source(spark, str(src)), str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(120)

    t = catalog.load_table("default.accounts")
    out = {r.id: r.data for r in t.read(spark).collect()}
    # create + update(1) + delete(2) + snapshot(3) → {1: alice2, 3: carol}
    assert out == {1: "alice2", 3: "carol"}
    # the _cdc metadata struct made it through parsing and transform
    snap = t.current_snapshot()
    assert snap["summary"]["pipeline-id"] == "debz"


def test_debezium_stream_second_batch_applies_incrementally(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "wh"))
    cfg = SinkConfig(
        tables=[TableConfig("default.acc2", id_columns=["id"])],
        cdc_field="_cdc.op",
        auto_create=True,
    )
    pipe = SinkPipeline(
        catalog, cfg, "debz2", value_schema=ENVELOPE, transforms=[debezium_transform()]
    )
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, envs, off0):
        with open(src / name, "w") as f:
            for off, env in enumerate(envs):
                f.write(
                    json.dumps(
                        {
                            "key": "k",
                            "value": json.dumps(env),
                            "topic": "t",
                            "partition": 0,
                            "offset": off0 + off,
                            "timestamp": "2024-01-01T00:00:00.000Z",
                        }
                    )
                    + "\n"
                )

    write_batch("a.json", [_envelope("c", None, {"id": 1, "data": "v1"}, 1000)], 0)
    q = pipe.start(file_stream_source(spark, str(src)), str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(120)
    write_batch("b.json", [
        _envelope("u", {"id": 1, "data": "v1"}, {"id": 1, "data": "v2"}, 2000),
        _envelope("c", None, {"id": 9, "data": "new"}, 3000),
    ], 1)
    q = pipe.start(file_stream_source(spark, str(src)), str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(120)
    t = catalog.load_table("default.acc2")
    assert {r.id: r.data for r in t.read(spark).collect()} == {1: "v2", 9: "new"}
