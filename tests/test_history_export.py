"""Full snapshot-history export: every retained ancestor of every ref gets
its own manifest tree, parent-snapshot-id links the chain, snapshot-log
records the main ancestry, and carried-over files are EXISTING (status 0)
so external incremental consumers don't double-count.

Reference tables carry their full Iceberg history natively (every commit in
IcebergWriterFactory/Coordinator lands as a snapshot); this is the exported
equivalent for external VERSION AS OF / rollback.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
    read_exported,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)


def _mk(spark, tmp_path, eras=3, rows_per=10):
    t = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    for e in range(eras):
        t.append(
            spark.createDataFrame(
                [(e * rows_per + i, e) for i in range(rows_per)], SCHEMA
            )
        )
    return t


def test_all_ancestors_exported(spark, tmp_path):
    t = _mk(spark, tmp_path, eras=3)
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    assert len(md["snapshots"]) == 3
    # chain: exactly one root, each non-root links to an exported parent
    ids = {s["snapshot-id"] for s in md["snapshots"]}
    parents = [s.get("parent-snapshot-id") for s in md["snapshots"]]
    assert sum(1 for p in parents if p is None) == 1
    assert all(p in ids for p in parents if p is not None)
    # snapshot-log is the main ancestry oldest-first
    log = md["snapshot-log"]
    assert len(log) == 3
    assert [e["timestamp-ms"] for e in log] == sorted(
        e["timestamp-ms"] for e in log
    )
    assert log[-1]["snapshot-id"] == md["current-snapshot-id"]


def test_external_time_travel_row_counts(spark, tmp_path):
    """read_exported(snapshot_id=ancestor) sees exactly that era's state —
    the external VERSION AS OF."""
    t = _mk(spark, tmp_path, eras=3, rows_per=7)
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    by_count = sorted(
        (read_exported(path, snapshot_id=s["snapshot-id"])["total_rows"])
        for s in md["snapshots"]
    )
    assert by_count == [7, 14, 21]


def test_existing_vs_added_status(spark, tmp_path):
    """In a historical chain, each snapshot's manifest marks only its own
    files ADDED; carried-over files are EXISTING with the adder's id."""
    t = _mk(spark, tmp_path, eras=2, rows_per=5)
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    from iceberg_kafka_connect_spark.sinks.iceberg_export import _read_ocf

    snaps = sorted(md["snapshots"], key=lambda s: s["sequence-number"])
    first, second = snaps
    _, _, manifests = _read_ocf(
        second["manifest-list"].removeprefix("file://")
    )
    entries = []
    for m in manifests:
        _, _, es = _read_ocf(m["manifest_path"].removeprefix("file://"))
        entries.extend(es)
    added = [e for e in entries if e["status"] == 1]
    existing = [e for e in entries if e["status"] == 0]
    assert added and existing
    assert all(e["snapshot_id"] == second["snapshot-id"] for e in added)
    assert all(e["snapshot_id"] == first["snapshot-id"] for e in existing)
    # summary counts only this snapshot's additions; totals cover all
    assert second["summary"]["added-data-files"] == str(len(added))
    assert second["summary"]["total-data-files"] == str(len(entries))


def test_incremental_consumption_no_double_count(spark, tmp_path):
    """Replaying ADDED rows across the exported history reproduces the
    final row count exactly once — the external changelog contract."""
    t = _mk(spark, tmp_path, eras=3, rows_per=4)
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    from iceberg_kafka_connect_spark.sinks.iceberg_export import _read_ocf

    added_rows = 0
    for s in md["snapshots"]:
        _, _, manifests = _read_ocf(
            s["manifest-list"].removeprefix("file://")
        )
        for m in manifests:
            _, _, es = _read_ocf(m["manifest_path"].removeprefix("file://"))
            added_rows += sum(
                e["data_file"]["record_count"] for e in es if e["status"] == 1
            )
    assert added_rows == t.read(spark).count() == 12


def test_history_depth_cap(spark, tmp_path):
    t = _mk(spark, tmp_path, eras=4)
    t.set_properties({"export.history-depth": "2"})
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    assert len(md["snapshots"]) == 2
    # the depth-capped parent IS linked, dangling — Iceberg itself keeps
    # parent ids of expired snapshots, and refresh_from_iceberg needs the
    # link to prove ancestry against a heads-only mirror
    oldest = min(md["snapshots"], key=lambda s: s["sequence-number"])
    exported = {s["snapshot-id"] for s in md["snapshots"]}
    assert oldest.get("parent-snapshot-id") is not None
    assert oldest["parent-snapshot-id"] not in exported
    assert len(md["snapshot-log"]) == 2


def test_branch_history_and_shared_ancestors(spark, tmp_path):
    t = _mk(spark, tmp_path, eras=2, rows_per=5)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(100 + i, 9) for i in range(5)], SCHEMA))
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    # 3 distinct snapshots total: the shared 2-era chain + main's third
    assert len(md["snapshots"]) == 3
    main_info = read_exported(path, ref="main")
    audit_info = read_exported(path, ref="audit")
    assert main_info["total_rows"] == 15
    assert audit_info["total_rows"] == 10
    # audit's head IS main's parent (shared tree, no duplicate export)
    assert (
        main_info["snapshot_parents"][main_info["snapshot_id"]]
        == audit_info["snapshot_id"]
    )
    # snapshot-log stays main-only
    assert len(md["snapshot-log"]) == 3


def test_import_historical_snapshot(spark, tmp_path):
    """import_iceberg_table(snapshot_id=ancestor) materializes that era."""
    t = _mk(spark, tmp_path, eras=3, rows_per=6)
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    oldest = min(md["snapshots"], key=lambda s: s["sequence-number"])
    imp = import_iceberg_table(
        path, str(tmp_path / "dst"), snapshot_id=oldest["snapshot-id"]
    )
    assert imp.read(spark).count() == 6


def test_history_with_deletes_per_snapshot(spark, tmp_path):
    """A pre-delete ancestor still reads its full row set externally;
    the post-delete head applies the delete."""
    t = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    t.append(spark.createDataFrame([(i, 0) for i in range(10)], SCHEMA))
    t.delete_where(spark, "k >= 5", key_cols=["k"])
    path = export_iceberg_metadata(t)
    with open(path) as f:
        md = json.load(f)
    counts = set()
    for s in md["snapshots"]:
        info = read_exported(path, snapshot_id=s["snapshot-id"])
        live = info["total_rows"] - sum(
            d["record_count"] for d in info["delete_files"]
        )
        counts.add(live)
    assert counts == {10, 5}
