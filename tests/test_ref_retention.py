"""Per-ref snapshot retention — Iceberg's snapshot-ref fields
(min-snapshots-to-keep / max-snapshot-age-ms / max-ref-age-ms) on
expire_snapshots, with spec-form export/import round-trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, lo, hi):
    return spark.createDataFrame([(i, f"v{i}") for i in range(lo, hi)], SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    for i in range(6):
        t.append(_df(spark, i * 5, i * 5 + 5))
    return t


def test_validation(table):
    with pytest.raises(ValueError, match="main"):
        table.set_ref_retention("main", max_ref_age_ms=10)
    with pytest.raises(ValueError, match="no such ref"):
        table.set_ref_retention("nope", min_snapshots_to_keep=1)
    # setting then clearing removes the entry entirely
    table.create_branch("dev")
    table.set_ref_retention("dev", min_snapshots_to_keep=3)
    assert table.ref_retention() == {"dev": {"min-snapshots-to-keep": 3}}
    table.set_ref_retention("dev", min_snapshots_to_keep=None)
    assert table.ref_retention() == {}


def test_min_snapshots_to_keep_is_a_floor(spark, table):
    """Iceberg semantics (r4 advice): min-snapshots-to-keep is a FLOOR on
    retention, not an exact depth — without max-snapshot-age-ms it can
    only deepen retention, never expire history below the global
    keep_last."""
    table.create_branch("dev")
    table.set_ref_retention("dev", min_snapshots_to_keep=1)
    table.set_ref_retention("main", min_snapshots_to_keep=2)
    # global depth 10 covers all 6 snapshots: the per-ref floors must NOT
    # shrink retention below it
    assert table.expire_snapshots(keep_last=10) == 0
    # global depth 1: the floors now deepen main's chain to 2
    expired = table.expire_snapshots(keep_last=1)
    assert expired == 4  # main keeps 2, dev keeps its (shared) head
    assert table.read(spark).count() == 30  # live data unaffected
    assert table.read(spark, branch="dev").count() == 30


def test_max_snapshot_age_extends_depth(spark, table):
    snaps = table.snapshots()
    oldest_ts = snaps[0]["timestamp_ms"]
    # age cap spans the whole history -> nothing expires despite depth 1
    table.set_ref_retention(
        "main", min_snapshots_to_keep=1, max_snapshot_age_ms=10**9
    )
    assert table.expire_snapshots(keep_last=1, now_ms=oldest_ts + 1000) == 0
    # a now far past the cap -> only the depth floor survives
    assert (
        table.expire_snapshots(
            keep_last=1, now_ms=oldest_ts + 2 * 10**9
        )
        == 5
    )
    assert table.read(spark).count() == 30


def test_max_ref_age_retires_refs(spark, table):
    head_ts = table.snapshots()[-1]["timestamp_ms"]
    table.create_tag("old-release")
    table.create_branch("stale-dev")
    table.set_ref_retention("old-release", max_ref_age_ms=1000)
    table.set_ref_retention("stale-dev", max_ref_age_ms=1000)
    # young refs survive an expire "now" within their age window
    table.expire_snapshots(keep_last=10, now_ms=head_ts + 500)
    assert "old-release" in table.tags()
    # past the window both retire; main never does
    table.expire_snapshots(keep_last=2, now_ms=head_ts + 10_000)
    assert "old-release" not in table.tags()
    assert "stale-dev" not in table.metadata()["refs"]
    assert "main" in table.metadata()["refs"]
    assert table.read(spark).count() == 30


def test_retention_round_trips_through_iceberg(spark, table, tmp_path):
    table.create_branch("dev")
    table.create_tag("v1")
    table.set_ref_retention(
        "dev", min_snapshots_to_keep=2, max_snapshot_age_ms=123456
    )
    table.set_ref_retention("v1", max_ref_age_ms=999999)
    meta_path = export_iceberg_metadata(table)
    with open(meta_path) as f:
        refs = json.load(f)["refs"]
    assert refs["dev"]["min-snapshots-to-keep"] == 2
    assert refs["dev"]["max-snapshot-age-ms"] == 123456
    assert refs["v1"]["max-ref-age-ms"] == 999999
    imported = import_iceberg_table(meta_path, str(tmp_path / "imp"))
    ret = imported.ref_retention()
    assert ret["dev"] == {
        "min-snapshots-to-keep": 2,
        "max-snapshot-age-ms": 123456,
    }
    assert ret["v1"] == {"max-ref-age-ms": 999999}
    assert imported.read(spark).count() == 30


def test_ref_retirement_persists_without_snapshot_expiry(spark, table):
    """An aged-out ref sharing a fully-kept chain must still retire —
    the early no-expiry return used to drop the in-memory retirement."""
    head_ts = table.snapshots()[-1]["timestamp_ms"]
    table.create_branch("stale-dev")  # shares main's head
    table.set_ref_retention("stale-dev", max_ref_age_ms=1000)
    # keep_last spans the whole history -> zero snapshots expire
    assert table.expire_snapshots(keep_last=100, now_ms=head_ts + 10_000) == 0
    assert "stale-dev" not in table.metadata()["refs"]


def test_tags_reject_branch_retention_fields(table):
    """Java's SnapshotRefParser throws on branch fields riding a tag —
    one mis-set tag would make the whole exported metadata unreadable,
    so the setter refuses up front."""
    table.create_tag("v9")
    with pytest.raises(ValueError, match="tag"):
        table.set_ref_retention("v9", min_snapshots_to_keep=3)
    with pytest.raises(ValueError, match="tag"):
        table.set_ref_retention("v9", max_snapshot_age_ms=1000)
    table.set_ref_retention("v9", max_ref_age_ms=5000)  # the legal field
    with open(export_iceberg_metadata(table)) as f:
        ref = json.load(f)["refs"]["v9"]
    assert ref["max-ref-age-ms"] == 5000
    assert "min-snapshots-to-keep" not in ref
    assert "max-snapshot-age-ms" not in ref
