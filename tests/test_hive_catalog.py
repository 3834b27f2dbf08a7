"""Hive Metastore catalog (stdlib Thrift client + verifying stub):
pointer round-trips, the lock + expected-parameter CAS commit protocol,
strict binary-protocol behavior, connector-config path."""

from __future__ import annotations

import struct

import pytest

from iceberg_kafka_connect_spark.sinks import thrift_proto as tp
from iceberg_kafka_connect_spark.sinks.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
    UnsupportedCatalogError,
    catalog_from_properties,
)
from iceberg_kafka_connect_spark.sinks.hive_catalog import HiveCatalog
from iceberg_kafka_connect_spark.sinks.hive_server import (
    LOCK_ACQUIRED,
    LOCK_WAITING,
    HiveMetastoreServer,
)
from iceberg_kafka_connect_spark.sinks.table import CommitConflict


@pytest.fixture()
def srv():
    with HiveMetastoreServer() as s:
        yield s


def _cat(srv, tmp_path):
    return HiveCatalog(srv.uri, warehouse=str(tmp_path / "wh"))


# ------------------------------------------------------------ wire codec
def test_thrift_codec_roundtrip():
    msg = tp.encode_message(
        "get_table",
        tp.CALL,
        7,
        {
            1: tp.t_str("db"),
            2: tp.t_str("t"),
            3: (tp.LIST, (tp.I64, [1, 2, 3])),
            4: tp.t_map_ss({"a": "b"}),
            5: tp.t_struct({1: tp.t_bool(True), 2: (tp.DOUBLE, 1.5)}),
        },
    )
    import io

    name, mtype, seq, fields = tp.decode_message(io.BytesIO(msg))
    assert (name, mtype, seq) == ("get_table", tp.CALL, 7)
    assert fields[1] == "db" and fields[2] == "t"
    assert fields[3] == [1, 2, 3]
    assert fields[4] == {"a": "b"}
    assert fields[5] == {1: True, 2: 1.5}


def test_server_rejects_non_strict_version(srv):
    """Old-style (unversioned) framing violates the strict contract —
    the stub answers a TApplicationException and drops the
    connection."""
    s = srv.raw_socket()
    try:
        s.sendall(struct.pack("!i", 11) + b"hello retro")
        reply = s.recv(4096)
    finally:
        s.close()
    name, mtype, _, fields = tp.decode_message(
        __import__("io").BytesIO(reply)
    )
    assert mtype == tp.EXCEPTION
    assert "version" in fields[1]


def test_unknown_method_is_application_exception(srv):
    cat = HiveCatalog(srv.uri)
    from iceberg_kafka_connect_spark.sinks.hive_catalog import (
        HiveThriftError,
    )

    with pytest.raises(HiveThriftError, match="Invalid method name"):
        cat._client.call("get_partitions", {1: tp.t_str("db")})


# --------------------------------------------------------------- catalog
def test_roundtrip_and_cas_lock(spark, srv, tmp_path):
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 60).selectExpr("id", "id % 3 v")
    t = cat.create_table("db.h", df.schema)
    t.append(df)
    assert cat.load_table("db.h").read(spark).count() == 60
    loc, meta = cat.load_table_metadata("db.h")
    assert meta["properties"]["export.source-version"] == str(
        t.current_version()
    )
    # HMS table shape: EXTERNAL_TABLE + ICEBERG params + mirrored cols
    raw = cat._get("db", "h")
    assert raw[12] == "EXTERNAL_TABLE"
    assert raw[9]["table_type"] == "ICEBERG"
    assert [c[1] for c in raw[7][1]] == ["id", "v"]
    assert [c[2] for c in raw[7][1]] == ["bigint", "bigint"]
    # commit CAS: a commit whose base metadata_location is stale fails
    stale = cat._get("db", "h")
    t.append(spark.range(100, 110).selectExpr("id", "id % 3 v"))
    cat.load_table("db.h")  # republish moves the pointer
    with pytest.raises(CommitConflict):
        cat._publish(t, "db", "h", stale)
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.h", df.schema)
    assert cat.list_tables("db") == ["db.h"]
    cat.drop_table("db.h")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.h")


def test_lock_manager_exclusive_then_waiting(srv):
    """One EXCLUSIVE table lock at a time: the second request WAITING
    until the first unlocks, then check_lock promotes — the protocol
    Iceberg's MetastoreLock polls."""
    cat = HiveCatalog(srv.uri)
    c = cat._client
    lid1 = cat._acquire_lock("db", "t")
    resp = c.call(
        "lock",
        {
            1: tp.t_struct(
                {
                    1: tp.t_list_struct(
                        [
                            {
                                1: tp.t_i32(3),
                                2: tp.t_i32(2),
                                3: tp.t_str("db"),
                                4: tp.t_str("t"),
                            }
                        ]
                    ),
                    3: tp.t_str("u"),
                    4: tp.t_str("h"),
                }
            )
        },
    )
    lid2, state2 = resp[1], resp[2]
    assert state2 == LOCK_WAITING
    chk = c.call("check_lock", {1: tp.t_struct({1: tp.t_i64(lid2)})})
    assert chk[2] == LOCK_WAITING  # still held
    cat._unlock(lid1)
    chk = c.call("check_lock", {1: tp.t_struct({1: tp.t_i64(lid2)})})
    assert chk[2] == LOCK_ACQUIRED
    cat._unlock(lid2)


def test_server_side_expected_parameter_cas(spark, srv, tmp_path):
    """Even bypassing the client's read-compare, the stub's
    alter_table_with_environment_context enforces the HIVE-26882
    expected-parameter check."""
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 5).selectExpr("id")
    t = cat.create_table("db.cas", df.schema)
    with pytest.raises(CommitConflict, match="expected"):
        cat._client.call(
            "alter_table_with_environment_context",
            {
                1: tp.t_str("db"),
                2: tp.t_str("cas"),
                3: cat._table_struct(
                    "db", "cas", "file:///nope", None, None, t.root
                ),
                4: tp.t_struct(
                    {
                        1: tp.t_map_ss(
                            {
                                "expected_parameter_key":
                                    "metadata_location",
                                "expected_parameter_value": "file:///stale",
                            }
                        )
                    }
                ),
            },
        )


def test_connector_config_path(spark, srv, tmp_path):
    cat = catalog_from_properties(
        {
            "iceberg.catalog.type": "hive",
            "iceberg.catalog.uri": srv.uri,
            "iceberg.catalog.warehouse": str(tmp_path / "wh"),
        }
    )
    assert isinstance(cat, HiveCatalog)
    df = spark.range(0, 5).selectExpr("id")
    cat.create_table("default.cfg", df.schema)
    assert cat.table_exists("default.cfg")
    # hive is the DEFAULT type (Utilities.java:68-121 / CatalogUtil)
    cat2 = catalog_from_properties(
        {
            "iceberg.catalog.uri": srv.uri,
            "iceberg.catalog.warehouse": str(tmp_path / "wh2"),
        }
    )
    assert isinstance(cat2, HiveCatalog)
    assert cat2.table_exists("default.cfg")
    # without a uri the missing-runtime contract still holds
    with pytest.raises(UnsupportedCatalogError, match="hive"):
        catalog_from_properties({"iceberg.catalog.type": "hive"})


def test_pipeline_e2e_via_hive_catalog(spark, srv, tmp_path):
    """Append + upsert against a hive-cataloged table, reloaded through
    the catalog each hop."""
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 40).selectExpr("id", "id % 4 v")
    t = cat.create_table("db.e2e", df.schema, identifier_fields=["id"])
    t.append(df)
    t2 = cat.load_table("db.e2e")
    t2.upsert(spark.range(35, 45).selectExpr("id", "id % 7 v"), ["id"])
    got = cat.load_table("db.e2e").read(spark)
    assert got.count() == 45
    assert got.filter("id = 36").collect()[0].v == 36 % 7


def test_client_reconnects_after_dropped_connection(spark, srv, tmp_path):
    """A dropped socket must not poison the long-lived catalog handle:
    the next call transparently reconnects (a restarted HMS or a
    server-side protocol drop is routine in a streaming pipeline)."""
    cat = _cat(srv, tmp_path)
    df = spark.range(0, 5).selectExpr("id")
    cat.create_table("db.rc", df.schema)
    # kill the client's socket out from under it
    cat._client._sock.close()
    assert cat.table_exists("db.rc")  # reconnects and answers
    assert cat.list_tables("db") == ["db.rc"]
