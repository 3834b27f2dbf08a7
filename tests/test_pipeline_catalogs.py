"""Connector pipeline over the network-catalog backends.

The reference's sink task runs unchanged whatever catalog
``iceberg.catalog.type`` resolves to (data/Utilities.java:68-121 hands
the built catalog to IcebergWriterFactory). Same here: ``SinkPipeline``
takes the catalog interface, so the REST and JDBC backends drop in —
these tests run the kafka-shaped stream end-to-end through each and
check the result through the catalog's own view."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.config import SinkConfig, TableConfig
from iceberg_kafka_connect_spark.sinks.jdbc_catalog import JdbcCatalog
from iceberg_kafka_connect_spark.sinks.rest_catalog import RestCatalog
from iceberg_kafka_connect_spark.sinks.rest_server import IcebergRestServer
from iceberg_kafka_connect_spark.sources.stream import file_stream_source
from iceberg_kafka_connect_spark.streaming import SinkPipeline

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("op", T.StringType()),
    ]
)


def _write_records(path, records, offset0=0, partition=0, topic="events"):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"chunk-{offset0}.json", "w") as f:
        for i, rec in enumerate(records):
            f.write(
                json.dumps(
                    {
                        "key": str(rec.get("id", i)),
                        "value": json.dumps(rec),
                        "topic": topic,
                        "partition": partition,
                        "offset": offset0 + i,
                        "timestamp": "2024-01-01T00:00:00.000Z",
                    }
                )
                + "\n"
            )


def _stream_through(spark, tmp_path, catalog, pipeline_id):
    cfg = SinkConfig(
        tables=[TableConfig("default.events_sink")], auto_create=True
    )
    pipe = SinkPipeline(catalog, cfg, pipeline_id, value_schema=VALUE_SCHEMA)
    src = tmp_path / "src"
    _write_records(
        src,
        [
            {"id": i, "type": "t", "payload": f"p{i}", "op": None}
            for i in range(10)
        ],
    )
    stream = file_stream_source(spark, str(src))
    q = pipe.start(stream, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)


def test_pipeline_through_rest_catalog(spark, tmp_path):
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        cat = RestCatalog(srv.uri)
        _stream_through(spark, tmp_path, cat, "p-rest")
        t = cat.load_table("default.events_sink")
        assert t.read(spark).count() == 10
        offs = json.loads(
            t.current_snapshot()["summary"]["kafka.connect.offsets"]
        )
        assert offs == {"events-0": 10}
        # the catalog's served Iceberg metadata reflects the stream commit
        _, meta = cat.load_table_metadata("default.events_sink")
        assert meta["current-snapshot-id"] is not None
        assert meta["refs"]["main"]["snapshot-id"] == meta[
            "current-snapshot-id"
        ]


def test_pipeline_through_jdbc_catalog(spark, tmp_path):
    cat = JdbcCatalog(
        str(tmp_path / "catalog.sqlite"), warehouse=str(tmp_path / "wh")
    )
    _stream_through(spark, tmp_path, cat, "p-jdbc")
    t = cat.load_table("default.events_sink")
    assert t.read(spark).count() == 10
    # published pointer names metadata whose snapshot is the stream commit
    _, meta = cat.load_table_metadata("default.events_sink")
    assert meta["current-snapshot-id"] is not None
    with pytest.raises(Exception):
        cat.create_table("default.events_sink", VALUE_SCHEMA)


# ------------------------------------------------ T9 through the catalogs
def _eo_kill_restart_with_cas_race(spark, tmp_path, cat, pid, monkeypatch):
    """Exactly-once recovery driven THROUGH a network catalog backend,
    with two failure injections (the coordination behaviors the reference
    tests hardest, CommitterImplTest.java:288-560):

    1. crash after table commit but before the checkpoint advanced —
       a fresh pipeline instance replays the SAME batch body and must
       skip it idempotently (batch-id ancestry walk);
    2. a lost CAS race mid-recovery — the first storage-side version
       write of the restart batch loses to a "concurrent writer"
       (injected CommitConflict); the commit loop must re-read and
       retry, landing the batch exactly once.
    """
    from iceberg_kafka_connect_spark.sinks.table import (
        CommitConflict,
        LakehouseTable,
    )
    from iceberg_kafka_connect_spark.sources.stream import (
        batch_file_source,
        file_stream_source,
    )

    cfg = SinkConfig(tables=[TableConfig("default.eo_sink")], auto_create=True)
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _write_records(
        src,
        [{"id": i, "type": "t", "payload": None, "op": None} for i in range(5)],
    )
    pipe = SinkPipeline(cat, cfg, pid, value_schema=VALUE_SCHEMA)
    q = pipe.start(file_stream_source(spark, str(src)), str(ckpt), available_now=True)
    q.awaitTermination(120)

    # (1) process "dies" post-commit, pre-checkpoint: a NEW pipeline
    # instance (fresh process state) replays batch 0 → idempotent skip
    pipe2 = SinkPipeline(cat, cfg, pid, value_schema=VALUE_SCHEMA)
    pipe2.process_batch(batch_file_source(spark, str(src)), batch_id=0)
    t = cat.load_table("default.eo_sink")
    assert t.read(spark).count() == 5

    # (2) restart with new data; first version-CAS of the recovery batch
    # loses to a concurrent writer
    _write_records(
        src,
        [
            {"id": 100 + i, "type": "t", "payload": None, "op": None}
            for i in range(3)
        ],
        offset0=5,
    )
    real = LakehouseTable._write_version
    state = {"injected": False}

    def flaky(self, version, meta):
        if not state["injected"]:
            state["injected"] = True
            raise CommitConflict("injected: concurrent writer won the CAS")
        return real(self, version, meta)

    monkeypatch.setattr(LakehouseTable, "_write_version", flaky)
    pipe3 = SinkPipeline(cat, cfg, pid, value_schema=VALUE_SCHEMA)
    q = pipe3.start(
        file_stream_source(spark, str(src)), str(ckpt), available_now=True
    )
    q.awaitTermination(120)
    monkeypatch.undo()
    assert state["injected"], "race injection never fired"

    t = cat.load_table("default.eo_sink")
    ids = sorted(r.id for r in t.read(spark).collect())
    assert ids == [0, 1, 2, 3, 4, 100, 101, 102]
    # offsets advanced exactly once through the catalog's view
    offs = json.loads(
        t.current_snapshot()["summary"]["kafka.connect.offsets"]
    )
    assert offs == {"events-0": 8}


def test_restart_cas_race_through_rest(spark, tmp_path, monkeypatch):
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        cat = RestCatalog(srv.uri)
        _eo_kill_restart_with_cas_race(
            spark, tmp_path, cat, "p-eo-rest", monkeypatch
        )
        # the REST-served metadata agrees after recovery
        _, meta = cat.load_table_metadata("default.eo_sink")
        assert meta["refs"]["main"]["snapshot-id"] == meta[
            "current-snapshot-id"
        ]


def test_restart_cas_race_through_jdbc(spark, tmp_path, monkeypatch):
    cat = JdbcCatalog(
        str(tmp_path / "catalog.sqlite"), warehouse=str(tmp_path / "wh")
    )
    _eo_kill_restart_with_cas_race(
        spark, tmp_path, cat, "p-eo-jdbc", monkeypatch
    )
    _, meta = cat.load_table_metadata("default.eo_sink")
    assert meta["current-snapshot-id"] is not None


def test_pipeline_through_nessie_catalog(spark, tmp_path):
    from iceberg_kafka_connect_spark.sinks.nessie_catalog import NessieCatalog
    from iceberg_kafka_connect_spark.sinks.nessie_server import NessieServer

    with NessieServer() as srv:
        cat = NessieCatalog(srv.uri, warehouse=str(tmp_path / "wh"))
        _stream_through(spark, tmp_path, cat, "p-nessie")
        t = cat.load_table("default.events_sink")
        assert t.read(spark).count() == 10
        offs = json.loads(
            t.current_snapshot()["summary"]["kafka.connect.offsets"]
        )
        assert offs == {"events-0": 10}
        # the published pointer reflects the stream commit
        _, meta = cat.load_table_metadata("default.events_sink")
        assert meta["current-snapshot-id"] is not None
        # the commit log shows the auto-create and republish history
        ops = [
            (o["type"], ".".join(o["key"]["elements"]))
            for e in cat.history()
            for o in e["operations"]
        ]
        assert ("PUT", "default.events_sink") in ops
