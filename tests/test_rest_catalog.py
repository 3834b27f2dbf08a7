"""REST catalog: server + client end-to-end over the public protocol.

Reference parity: ``iceberg.catalog.type=rest`` is the reference's most
common managed deployment (data/Utilities.java:68-121 →
CatalogUtil.buildIcebergCatalog → RESTCatalog). Here both halves run
in-process: ``IcebergRestServer`` fronts a directory warehouse,
``RestCatalog`` speaks HTTP to it, and loadTable responses carry real
Iceberg v2 metadata that ``iceberg_import`` can consume as an independent
client."""

from __future__ import annotations

import socket

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
    UnsupportedCatalogError,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.iceberg_export import _snapshot_id_int
from iceberg_kafka_connect_spark.sinks.rest_catalog import (
    RestCatalog,
    RestCatalogError,
    RestCommitFailed,
)
from iceberg_kafka_connect_spark.sinks.rest_server import IcebergRestServer

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


@pytest.fixture()
def server(tmp_path):
    srv = IcebergRestServer(str(tmp_path / "warehouse")).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return RestCatalog(server.uri)


def _rows(n, base=0):
    import datetime as dt

    return [
        (base + i, f"n{base + i}", dt.datetime(2024, 1, 1 + (i % 5)))
        for i in range(n)
    ]


# ----------------------------------------------------------------- namespaces
def test_config_and_namespaces(client):
    assert client.config == {"defaults": {}, "overrides": {}}
    client._request("POST", "/v1/namespaces", {"namespace": ["db1"]})
    assert "db1" in client.list_namespaces()
    out = client._request("GET", "/v1/namespaces/db1")
    assert out == {"namespace": ["db1"], "properties": {}}
    # duplicate create is a 409
    with pytest.raises(RestCatalogError) as ei:
        client._request("POST", "/v1/namespaces", {"namespace": ["db1"]})
    assert ei.value.code == 409
    # empty namespace deletes; missing namespace is a 404
    client._request("DELETE", "/v1/namespaces/db1")
    with pytest.raises(RestCatalogError) as ei:
        client._request("GET", "/v1/namespaces/db1")
    assert ei.value.code == 404


# --------------------------------------------------------------- lifecycle
def test_create_load_roundtrip(spark, client):
    t = client.create_table(
        "db.events",
        SCHEMA,
        partition_by=["iceberg_bucket(4, id)", "day(ts)"],
        properties={"owner": "rest-test"},
        identifier_fields=["id"],
    )
    t.append(spark.createDataFrame(_rows(20), SCHEMA))
    loaded = client.load_table("db.events")
    assert loaded.properties().get("owner") == "rest-test"
    assert loaded.identifier_fields() == ["id"]
    got = {r.id for r in loaded.read(spark).collect()}
    assert got == set(range(20))
    # served metadata is spec-shaped with the bucket transform intact
    _, meta = client.load_table_metadata("db.events")
    assert meta["format-version"] == 2
    transforms = {
        f["transform"] for f in meta["partition-specs"][0]["fields"]
    }
    assert "bucket[4]" in transforms and "day" in transforms
    assert client.list_tables() == ["db.events"]


def test_metadata_tracks_table_version(spark, client):
    t = client.create_table("db.t", SCHEMA)
    loc0, meta0 = client.load_table_metadata("db.t")
    assert meta0.get("current-snapshot-id", -1) in (-1, None)
    t.append(spark.createDataFrame(_rows(5), SCHEMA))
    loc1, meta1 = client.load_table_metadata("db.t")
    assert meta1["current-snapshot-id"] != meta0.get("current-snapshot-id")
    # unchanged table -> served metadata is the cached export, not a new one
    loc2, _ = client.load_table_metadata("db.t")
    assert loc2 == loc1 and loc1 != loc0


def test_create_conflicts_and_drop(client):
    client.create_table("db.c", SCHEMA)
    with pytest.raises(TableAlreadyExistsError):
        client.create_table("db.c", SCHEMA)
    again = client.create_table_if_not_exists("db.c", SCHEMA)
    assert again.root.endswith("db/c")
    assert client.table_exists("db.c")
    client.drop_table("db.c")
    assert not client.table_exists("db.c")
    with pytest.raises(NoSuchTableError):
        client.drop_table("db.c")
    with pytest.raises(NoSuchTableError):
        client.load_table("db.c")


def test_rename_across_namespaces(spark, client):
    t = client.create_table("db.old", SCHEMA)
    t.append(spark.createDataFrame(_rows(3), SCHEMA))
    moved = client.rename_table("db.old", "db2.new")
    assert moved.read(spark).count() == 3
    assert not client.table_exists("db.old")
    assert client.table_exists("db2.new")
    with pytest.raises(NoSuchTableError):
        client.rename_table("db.old", "db2.other")
    client.create_table("db2.other", SCHEMA)
    with pytest.raises(TableAlreadyExistsError):
        client.rename_table("db2.new", "db2.other")


# ------------------------------------------------------------ commit protocol
def test_commit_set_and_remove_properties(spark, server, client):
    client.create_table("db.p", SCHEMA)
    client.set_properties("db.p", {"a": "1", "b": "2"})
    # server-side view agrees (same warehouse)
    props = server.catalog.load_table("db.p").properties()
    assert props["a"] == "1" and props["b"] == "2"
    client.set_properties("db.p", {"a": None, "c": "3"})
    props = server.catalog.load_table("db.p").properties()
    assert "a" not in props and props["c"] == "3"


def test_set_ref_branch_and_tag_with_cas(spark, client):
    t = client.create_table("db.r", SCHEMA)
    t.append(spark.createDataFrame(_rows(5), SCHEMA))
    t.append(spark.createDataFrame(_rows(5, base=100), SCHEMA))
    snaps = t.snapshots()
    old_int = _snapshot_id_int(snaps[0]["snapshot_id"])
    head_int = _snapshot_id_int(snaps[1]["snapshot_id"])
    # tag the old snapshot through the catalog
    client.set_ref("db.r", "v1", old_int, ref_type="tag")
    assert t.tags()["v1"] == snaps[0]["snapshot_id"]
    # branch re-point with a correct CAS passes...
    client.set_ref(
        "db.r", "audit", head_int, expected_snapshot_id=None
    )
    client.set_ref(
        "db.r", "audit", old_int, expected_snapshot_id=head_int
    )
    assert {r.id for r in t.read(spark, branch="audit").collect()} == set(
        range(5)
    )
    # ...and a stale CAS is a clean commit failure, not a lost update
    with pytest.raises(RestCommitFailed):
        client.set_ref(
            "db.r", "audit", head_int, expected_snapshot_id=head_int
        )
    # served metadata exposes both refs in Iceberg form
    _, meta = client.load_table_metadata("db.r")
    assert meta["refs"]["v1"]["type"] == "tag"
    assert meta["refs"]["audit"]["type"] == "branch"
    # remove-snapshot-ref drops tag and branch alike; main is protected
    client._commit(
        "db.r", [{"action": "remove-snapshot-ref", "ref-name": "v1"}]
    )
    client._commit(
        "db.r", [{"action": "remove-snapshot-ref", "ref-name": "audit"}]
    )
    _, meta = client.load_table_metadata("db.r")
    assert set(meta["refs"]) == {"main"}
    with pytest.raises((RestCatalogError, RestCommitFailed)):
        client._commit(
            "db.r",
            [{"action": "remove-snapshot-ref", "ref-name": "main"}],
            retries=1,
        )


def test_unsupported_update_is_explicit(spark, client):
    client.create_table("db.u", SCHEMA)
    with pytest.raises(RestCatalogError) as ei:
        client._commit(
            "db.u", [{"action": "add-snapshot", "snapshot": {}}], retries=1
        )
    assert ei.value.code == 400


# ------------------------------------------------------------------- wiring
def test_catalog_from_properties_rest_executable(spark, server):
    cat = catalog_from_properties(
        {
            "iceberg.catalog": "mycat",
            "iceberg.catalog.type": "rest",
            "iceberg.catalog.uri": server.uri,
        }
    )
    assert isinstance(cat, RestCatalog)
    t = cat.create_table_if_not_exists("db.wired", SCHEMA)
    t.append(spark.createDataFrame(_rows(4), SCHEMA))
    assert cat.load_table("db.wired").read(spark).count() == 4


def test_unreachable_rest_uri_stays_unsupported():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # guaranteed-closed port
    with pytest.raises(UnsupportedCatalogError, match="rest"):
        catalog_from_properties(
            {
                "iceberg.catalog.type": "rest",
                "iceberg.catalog.uri": f"http://127.0.0.1:{port}",
            }
        )


def test_bearer_token_auth(tmp_path):
    with IcebergRestServer(
        str(tmp_path / "wh"), token="sekret"
    ) as srv:
        with pytest.raises(RestCatalogError) as ei:
            RestCatalog(srv.uri)  # no token -> 401 on the config handshake
        assert ei.value.code == 401
        cat = RestCatalog(srv.uri, token="sekret")
        assert cat.list_namespaces() == []
        # config-driven token passthrough (iceberg.catalog.token)
        cat2 = catalog_from_properties(
            {
                "iceberg.catalog.type": "rest",
                "iceberg.catalog.uri": srv.uri,
                "iceberg.catalog.token": "sekret",
            }
        )
        assert isinstance(cat2, RestCatalog)


# ------------------------------------------- independent-client conformance
def test_external_client_reads_served_metadata(spark, client, tmp_path):
    """A client that never opens the Lakehouse table — only the REST
    LoadTableResult — reconstructs the same rows via iceberg_import,
    proving the served metadata is self-sufficient spec metadata."""
    from iceberg_kafka_connect_spark.sinks.iceberg_import import (
        import_iceberg_table,
    )

    t = client.create_table("db.x", SCHEMA, partition_by=["day(ts)"])
    t.append(spark.createDataFrame(_rows(12), SCHEMA))
    t.delete_where(spark, "id < 2", ["id"])
    meta_loc, _ = client.load_table_metadata("db.x")
    imported = import_iceberg_table(meta_loc, str(tmp_path / "imported"))
    got = {r.id for r in imported.read(spark).collect()}
    assert got == set(range(2, 12))


# ------------------------------------------------------------- concurrency
def test_racing_cas_commits_serialize(spark, client):
    """Two writers race the same ref with the same expected snapshot:
    exactly one commit lands, the loser gets a clean 409 — the
    optimistic-concurrency contract a 1000-writer cluster relies on."""
    import threading

    t = client.create_table("db.race", SCHEMA)
    t.append(spark.createDataFrame(_rows(2), SCHEMA))
    t.append(spark.createDataFrame(_rows(2, base=10), SCHEMA))
    snaps = t.snapshots()
    a, b = (_snapshot_id_int(s["snapshot_id"]) for s in snaps[:2])
    client.set_ref("db.race", "ptr", a, expected_snapshot_id=None)

    results = []

    def mover(target):
        try:
            client.set_ref(
                "db.race", "ptr", target, expected_snapshot_id=a
            )
            results.append("ok")
        except RestCommitFailed:
            results.append("conflict")

    threads = [threading.Thread(target=mover, args=(b,)) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(results) == ["conflict", "ok"]
    _, meta = client.load_table_metadata("db.race")
    assert meta["refs"]["ptr"]["snapshot-id"] == b


def test_racing_creates_one_winner(client):
    """N concurrent create_table_if_not_exists calls on one name all
    return a handle to the SAME table (IcebergWriterFactory.java:69-117
    retry-on-race, over REST)."""
    import threading

    roots = []

    def creator():
        tbl = client.create_table_if_not_exists("db.ctr", SCHEMA)
        roots.append(tbl.root)

    threads = [threading.Thread(target=creator) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(set(roots)) == 1 and len(roots) == 4


def test_cli_serve_rest(tmp_path):
    """`cli serve-rest` binds, prints its uri, and serves a real client."""
    import json as jsonmod
    import subprocess
    import sys
    import time

    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "iceberg_kafka_connect_spark.cli",
            "serve-rest",
            "--warehouse",
            str(tmp_path / "wh"),
            "--port",
            "0",
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        uri = jsonmod.loads(line)["uri"]
        cat = RestCatalog(uri)
        cat.create_table("db.from_cli", SCHEMA)
        assert cat.table_exists("db.from_cli")
        time.sleep(0)  # (no extra wait needed; calls above are synchronous)
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_set_ref_carries_retention_fields(spark, client):
    t = client.create_table("db.ret", SCHEMA)
    t.append(spark.createDataFrame(_rows(4), SCHEMA))
    head = _snapshot_id_int(t.snapshots()[-1]["snapshot_id"])
    client.set_ref(
        "db.ret",
        "nightly",
        head,
        min_snapshots_to_keep=3,
        max_snapshot_age_ms=86_400_000,
    )
    client.set_ref(
        "db.ret", "v1", head, ref_type="tag", max_ref_age_ms=3_600_000
    )
    assert t.ref_retention() == {
        "nightly": {
            "min-snapshots-to-keep": 3,
            "max-snapshot-age-ms": 86_400_000,
        },
        "v1": {"max-ref-age-ms": 3_600_000},
    }
    # served Iceberg metadata exposes them on the ref objects
    _, meta = client.load_table_metadata("db.ret")
    assert meta["refs"]["nightly"]["min-snapshots-to-keep"] == 3
    assert meta["refs"]["v1"]["max-ref-age-ms"] == 3_600_000
    # main cannot age out -> clean 400, not a silent accept
    with pytest.raises((RestCatalogError, RestCommitFailed)):
        client.set_ref(
            "db.ret", "main", head, max_ref_age_ms=10, expected_snapshot_id=head
        )


def test_rest_ddl_schema_and_spec_evolution(spark, client):
    """add-schema / add-spec through the commit endpoint: REST-driven
    column adds and partition-spec evolution."""
    t = client.create_table("db.ddl", SCHEMA)
    t.append(spark.createDataFrame(_rows(4), SCHEMA))
    wider = T.StructType(
        list(SCHEMA.fields) + [T.StructField("score", T.DoubleType(), True)]
    )
    client.update_schema("db.ddl", wider)
    t2 = client.load_table("db.ddl")
    assert "score" in [f.name for f in t2.schema().fields]
    # pre-evolution rows read back with the new column null-filled
    rows = t2.read(spark).collect()
    assert len(rows) == 4 and all(r.score is None for r in rows)
    # a reduced schema is a legitimate UpdateSchema: ids absent from the
    # posted schema drop (Iceberg deleteColumn semantics) — on a separate
    # table so the spec-evolution block below keeps its columns
    reduced = client.create_table("db.ddl_red", wider)
    client.update_schema(
        "db.ddl_red",
        T.StructType([T.StructField("id", T.LongType(), False)]),
    )
    assert [f.name for f in client.load_table("db.ddl_red").schema().fields] == [
        "id"
    ]
    # spec evolution over LIVE data: old files keep their layout and the
    # served metadata represents them under a retired spec id
    # (multi-spec export) — loadTable keeps working, no compact needed
    client.update_spec("db.ddl", ["iceberg_bucket(4, id)"])
    t3 = client.load_table("db.ddl")
    assert [p.transform for p in t3.partition_spec()] == ["iceberg_bucket"]
    import datetime as dt

    t3.append(
        spark.createDataFrame(
            [(100, "n", dt.datetime(2024, 2, 1), 0.5)], wider
        )
    )
    assert t3.read(spark).count() == 5
    # served metadata's default spec carries the bucket transform
    _, meta = client.load_table_metadata("db.ddl")
    by_id = {s["spec-id"]: s for s in meta["partition-specs"]}
    spec = by_id[meta["default-spec-id"]]
    assert any(f["transform"] == "bucket[4]" for f in spec["fields"])


def test_rest_rename_and_drop_column(spark, client):
    """Rename and drop land through add-schema diffs keyed by field id —
    the full UpdateSchema surface over the wire."""
    t = client.create_table("db.cols", SCHEMA)
    t.append(spark.createDataFrame(_rows(4), SCHEMA))
    client.rename_column("db.cols", "name", "label")
    t2 = client.load_table("db.cols")
    assert [f.name for f in t2.schema().fields] == ["id", "label", "ts"]
    # pre-rename files resolve through the name mapping
    assert {r.label for r in t2.read(spark).collect()} == {
        f"n{i}" for i in range(4)
    }
    client.drop_column("db.cols", "ts")
    t3 = client.load_table("db.cols")
    assert [f.name for f in t3.schema().fields] == ["id", "label"]
    assert t3.read(spark).count() == 4
    # guards surface as clean errors: identifier/partition-source columns
    guarded = client.create_table(
        "db.cols2", SCHEMA, partition_by=["iceberg_bucket(4, id)"]
    )
    with pytest.raises((RestCatalogError, RestCommitFailed)):
        client.drop_column("db.cols2", "id")
    with pytest.raises(ValueError):
        client.rename_column("db.cols", "nope", "x")


def test_namespace_properties_endpoint(client):
    """POST /v1/namespaces/{ns}/properties: updates + removals with the
    spec's updated/removed/missing response and the both-lists 422."""
    client._request(
        "POST",
        "/v1/namespaces",
        {"namespace": ["nsp"], "properties": {"a": "1", "b": "2"}},
    )
    out = client._request(
        "POST",
        "/v1/namespaces/nsp/properties",
        {"updates": {"c": "3", "b": "20"}, "removals": ["a", "ghost"]},
    )
    assert out == {
        "updated": ["b", "c"],
        "removed": ["a"],
        "missing": ["ghost"],
    }
    got = client._request("GET", "/v1/namespaces/nsp")["properties"]
    assert got == {"b": "20", "c": "3"}
    with pytest.raises(RestCatalogError) as ei:
        client._request(
            "POST",
            "/v1/namespaces/nsp/properties",
            {"updates": {"x": "1"}, "removals": ["x"]},
        )
    assert ei.value.code == 422
    with pytest.raises(RestCatalogError) as ei:
        client._request(
            "POST", "/v1/namespaces/nope/properties", {"updates": {}}
        )
    assert ei.value.code == 404
