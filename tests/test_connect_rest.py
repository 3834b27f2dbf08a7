"""Kafka Connect REST worker twin: the deployment surface the reference
is operated through (README.md:213-225), served in-process.

Covers the quickstart shape (POST the reference's connector JSON →
records land), lifecycle (pause / resume with exactly-once across the
gap, update, delete, conflict), status/trace on failure, and the
config-validation endpoint.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from iceberg_kafka_connect_spark.connect_server import ConnectRestServer
from iceberg_kafka_connect_spark.connect_worker import ConnectWorker
from iceberg_kafka_connect_spark.sinks import Catalog


def _call(uri, method="GET", body=None):
    req = urllib.request.Request(
        uri, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def _write_chunk(topic_dir, ids, offset0=0):
    topic_dir.mkdir(parents=True, exist_ok=True)
    with open(topic_dir / f"c{offset0}.json", "w") as f:
        for i, rid in enumerate(ids):
            f.write(json.dumps({
                "key": str(rid),
                "value": json.dumps({"id": rid, "name": f"n{rid}"}),
                "topic": "events",
                "partition": 0,
                "offset": offset0 + i,
                "timestamp": "2024-01-01T00:00:00.000Z",
            }) + "\n")


def _poll(fn, timeout=60, interval=0.5):
    deadline = time.time() + timeout
    while time.time() < deadline:
        v = fn()
        if v:
            return v
        time.sleep(interval)
    raise AssertionError("condition not reached in time")


BASE_CONFIG = {
    "connector.class":
        "io.tabular.iceberg.connect.IcebergSinkConnector",
    "tasks.max": "2",
    "topics": "events",
    "iceberg.tables": "default.events",
    "iceberg.tables.auto-create-enabled": "true",
    "iceberg.control.commit.interval-ms": "500",
    "value.schema.ddl": "id long, name string",
}


@pytest.fixture()
def rig(spark, tmp_path):
    worker = ConnectWorker(
        spark,
        warehouse=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ck"),
        files_root=str(tmp_path / "topics"),
    )
    with ConnectRestServer(worker) as srv:
        yield srv, tmp_path


def test_connect_rest_quickstart_and_lifecycle(spark, rig):
    srv, tmp_path = rig
    _write_chunk(tmp_path / "topics" / "events", [1, 2, 3])
    code, info = _call(
        f"{srv.uri}/connectors", "POST",
        {"name": "events-sink", "config": BASE_CONFIG},
    )
    assert code == 201 and info["type"] == "sink"
    cat = Catalog(str(tmp_path / "wh"))

    def landed():
        try:
            return cat.load_table("default.events").read(spark).count() == 3
        except Exception:
            return False

    _poll(landed)
    _, names = _call(f"{srv.uri}/connectors")
    assert names == ["events-sink"]
    _, status = _call(f"{srv.uri}/connectors/events-sink/status")
    assert status["connector"]["state"] == "RUNNING"
    assert status["tasks"][0]["state"] == "RUNNING"
    _, topics = _call(f"{srv.uri}/connectors/events-sink/topics")
    assert topics == {"events-sink": {"topics": ["events"]}}

    # pause: new records do NOT land while paused
    code, _ = _call(f"{srv.uri}/connectors/events-sink/pause", "PUT")
    assert code == 202
    _, status = _call(f"{srv.uri}/connectors/events-sink/status")
    assert status["connector"]["state"] == "PAUSED"
    _write_chunk(tmp_path / "topics" / "events", [4, 5], offset0=3)
    time.sleep(2)
    assert cat.load_table("default.events").read(spark).count() == 3

    # resume: exactly-once across the gap
    code, _ = _call(f"{srv.uri}/connectors/events-sink/resume", "PUT")
    assert code == 202
    _poll(lambda: cat.load_table("default.events")
          .read(spark).count() == 5)
    rows = sorted(
        r.id for r in cat.load_table("default.events").read(spark)
        .select("id").collect()
    )
    assert rows == [1, 2, 3, 4, 5]

    # duplicate create conflicts; update via PUT config returns 200
    code404 = None
    try:
        _call(f"{srv.uri}/connectors", "POST",
              {"name": "events-sink", "config": BASE_CONFIG})
    except urllib.error.HTTPError as e:
        code404 = e.code
    assert code404 == 409
    code, _ = _call(
        f"{srv.uri}/connectors/events-sink/config", "PUT",
        {**BASE_CONFIG, "tasks.max": "4"},
    )
    assert code == 200
    _, got = _call(f"{srv.uri}/connectors/events-sink/config")
    assert got["tasks.max"] == "4"

    # restart + delete
    code, _ = _call(f"{srv.uri}/connectors/events-sink/restart", "POST")
    assert code == 204
    code, _ = _call(f"{srv.uri}/connectors/events-sink", "DELETE")
    assert code == 204
    with pytest.raises(urllib.error.HTTPError) as ei:
        _call(f"{srv.uri}/connectors/events-sink/status")
    assert ei.value.code == 404


def test_connect_validate_endpoint(rig):
    srv, _ = rig
    bad = {"connector.class": "com.example.Other"}
    _, out = _call(
        f"{srv.uri}/connector-plugins/IcebergSinkConnector/config/validate",
        "PUT", bad,
    )
    assert out["error_count"] >= 2  # wrong class + no topics + no tables
    _, out = _call(
        f"{srv.uri}/connector-plugins/IcebergSinkConnector/config/validate",
        "PUT", BASE_CONFIG,
    )
    assert out["error_count"] == 0
    _, plugins = _call(f"{srv.uri}/connector-plugins")
    assert plugins[0]["class"].endswith("IcebergSinkConnector")


def test_connect_create_rejects_bad_config(rig):
    srv, _ = rig
    with pytest.raises(urllib.error.HTTPError) as ei:
        _call(
            f"{srv.uri}/connectors", "POST",
            {"name": "bad", "config": {
                "connector.class": "com.example.Nope"}},
        )
    assert ei.value.code == 400
    _, names = _call(f"{srv.uri}/connectors")
    assert names == []


def test_connect_failed_state_carries_trace(spark, tmp_path):
    """A connector whose source cannot start surfaces FAILED + trace in
    /status instead of silently dying."""
    worker = ConnectWorker(
        spark,
        warehouse=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ck"),
        files_root=None,  # no source backing at all
    )
    with ConnectRestServer(worker) as srv:
        code, _ = _call(
            f"{srv.uri}/connectors", "POST",
            {"name": "doomed", "config": BASE_CONFIG},
        )
        assert code == 201  # build succeeded; start failed
        _, status = _call(f"{srv.uri}/connectors/doomed/status")
        assert status["connector"]["state"] == "FAILED"
        assert "files_root" in status["tasks"][0]["trace"]


def test_connect_offsets_endpoint(spark, rig):
    """GET /connectors/{name}/offsets (Connect 3.5+): committed offsets
    read back from the sink tables' snapshot summaries, in the public
    response shape."""
    srv, tmp_path = rig
    _write_chunk(tmp_path / "topics" / "events", [1, 2, 3])
    _call(f"{srv.uri}/connectors", "POST",
          {"name": "events-sink", "config": BASE_CONFIG})
    cat = Catalog(str(tmp_path / "wh"))

    def landed():
        try:
            return cat.load_table("default.events").read(spark).count() == 3
        except Exception:
            return False

    _poll(landed)
    _, out = _poll(lambda: (
        lambda r: r if r[1]["offsets"] else None
    )(_call(f"{srv.uri}/connectors/events-sink/offsets")))
    [entry] = out["offsets"]
    assert entry["partition"] == {"kafka_topic": "events",
                                  "kafka_partition": 0}
    assert entry["offset"] == {"kafka_offset": 3}


def test_connect_topics_regex_matches_dirs(spark, tmp_path):
    """topics.regex: the file twin matches topic DIRECTORIES by the
    regex, mirroring Connect's subscription semantics."""
    worker = ConnectWorker(
        spark,
        warehouse=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ck"),
        files_root=str(tmp_path / "topics"),
    )
    _write_chunk(tmp_path / "topics" / "events-a", [1, 2])
    _write_chunk(tmp_path / "topics" / "events-b", [3], offset0=2)
    _write_chunk(tmp_path / "topics" / "other", [9], offset0=3)
    cfg = {k: v for k, v in BASE_CONFIG.items() if k != "topics"}
    cfg["topics.regex"] = "events-.*"
    with ConnectRestServer(worker) as srv:
        _call(f"{srv.uri}/connectors", "POST",
              {"name": "regex-sink", "config": cfg})
        cat = Catalog(str(tmp_path / "wh"))

        def landed():
            try:
                return cat.load_table("default.events").read(
                    spark).count() == 3
            except Exception:
                return False

        _poll(landed)
        ids = sorted(r.id for r in cat.load_table("default.events")
                     .read(spark).select("id").collect())
        assert ids == [1, 2, 3]  # 'other' topic excluded
        _, topics = _call(f"{srv.uri}/connectors/regex-sink/topics")
        assert sorted(topics["regex-sink"]["topics"]) == [
            "events-a", "events-b"]


def test_worker_restart_restores_connectors_exactly_once(spark, tmp_path):
    """A new worker process on the same roots restores stored
    connectors and resumes their checkpoints: pre-restart records stay
    single, post-restart records land."""
    _write_chunk(tmp_path / "topics" / "events", [1, 2, 3])
    worker = ConnectWorker(
        spark, warehouse=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ck"),
        files_root=str(tmp_path / "topics"),
    )
    with ConnectRestServer(worker) as srv:
        _call(f"{srv.uri}/connectors", "POST",
              {"name": "events-sink", "config": BASE_CONFIG})
        cat = Catalog(str(tmp_path / "wh"))
        _poll(lambda: _count(cat, spark) == 3)
    # worker 1 gone (server close shuts queries down); new worker:
    _write_chunk(tmp_path / "topics" / "events", [4], offset0=3)
    worker2 = ConnectWorker(
        spark, warehouse=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ck"),
        files_root=str(tmp_path / "topics"),
    )
    with ConnectRestServer(worker2) as srv2:
        _, names = _call(f"{srv2.uri}/connectors")
        assert names == ["events-sink"]
        cat = Catalog(str(tmp_path / "wh"))
        _poll(lambda: _count(cat, spark) == 4)
        rows = sorted(r.id for r in cat.load_table("default.events")
                      .read(spark).select("id").collect())
        assert rows == [1, 2, 3, 4]  # no duplicates across the restart


def _count(cat, spark):
    try:
        return cat.load_table("default.events").read(spark).count()
    except Exception:
        return -1
