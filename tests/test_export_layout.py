"""Exporter layout + retention: versioned metadata names, per-export tree
subdirectories, pos-delete rewrite memoization, Iceberg's
write.metadata.delete-after-commit.enabled retention, and ref-name
collision handling."""

from __future__ import annotations

import glob
import json
import os
import re

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
    read_exported,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, a, b):
    return spark.createDataFrame([(i, f"v{i}") for i in range(a, b)], SCHEMA)


def test_versioned_metadata_names(spark, tmp_path):
    """Each export gets a monotonically increasing NNNNN- prefix, so a
    reader listing the directory (copied trees have a stale absolute-path
    version-hint) picks the true latest."""
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 5))
    p1 = export_iceberg_metadata(t)
    t.append(_df(spark, 5, 10))
    p2 = export_iceberg_metadata(t)
    v1 = int(os.path.basename(p1).split("-")[0])
    v2 = int(os.path.basename(p2).split("-")[0])
    assert v2 == v1 + 1
    # highest version is the latest state
    assert read_exported(p2)["total_rows"] == 10


def test_tree_files_live_in_per_export_subdir(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 5))
    p = export_iceberg_metadata(t)
    out = os.path.dirname(p)
    trees = [d for d in os.listdir(out) if d.startswith("tree-")]
    assert len(trees) == 1
    # no stray avro at the top level
    assert not glob.glob(os.path.join(out, "*.avro"))
    assert glob.glob(os.path.join(out, trees[0], "*.avro"))


def test_retention_drops_old_versions(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "t"),
        SCHEMA,
        properties={
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "1",
        },
    )
    paths = []
    for i in range(4):
        t.append(_df(spark, i * 5, i * 5 + 5))
        paths.append(export_iceberg_metadata(t))
    out = os.path.dirname(paths[-1])
    metas = sorted(
        p for p in os.listdir(out) if p.endswith(".metadata.json")
    )
    assert len(metas) == 2  # current + 1 previous
    assert os.path.basename(paths[-1]) in metas
    assert os.path.basename(paths[-2]) in metas
    # dropped versions' tree dirs are gone too; survivors' remain
    vers = {int(m.split("-")[0]) for m in metas}
    tree_vers = {
        int(d.split("-")[1])
        for d in os.listdir(out)
        if d.startswith("tree-")
    }
    assert tree_vers == vers
    # the surviving latest tree still reads
    assert read_exported(paths[-1])["total_rows"] == 20


def test_no_retention_by_default(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 5))
    p1 = export_iceberg_metadata(t)
    t.append(_df(spark, 5, 10))
    export_iceberg_metadata(t)
    assert os.path.exists(p1)


def test_pos_delete_rewrite_memoized_across_history(spark, tmp_path):
    """A position-delete carried over N exported ancestors is rewritten
    ONCE: EXISTING entries reference the same path as the ADDED entry."""
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 10))
    t.delete_where_positions(spark, "k = 3")
    t.append(_df(spark, 10, 15))
    t.append(_df(spark, 15, 20))
    p = export_iceberg_metadata(t)  # full history: 4 snapshots
    out = os.path.dirname(p)
    rewrites = glob.glob(os.path.join(out, "tree-*", "pos-delete-*.parquet"))
    assert len(rewrites) == 1
    with open(p) as f:
        md = json.load(f)
    assert len(md["snapshots"]) == 4
    # raw data record counts are unaffected (deletes apply at read time);
    # the single rewritten delete file is referenced by the head snapshot
    info = read_exported(p)
    assert info["total_rows"] == 20
    assert t.read(spark).count() == 19


def test_ref_collision_exports_no_orphan_tree(spark, tmp_path):
    """A tag whose name collides with a branch is skipped WITHOUT
    exporting an orphan snapshot tree."""
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 5))
    t.create_branch("audit")
    t.append(_df(spark, 5, 10))
    meta = t.metadata()
    # force a tag colliding with the branch name, pointing elsewhere
    meta.setdefault("tags", {})["audit"] = meta["refs"]["main"]
    t._write_version(meta["version"] + 1, meta)
    with open(export_iceberg_metadata(t, history_depth=1)) as f:
        md = json.load(f)
    ref_sids = {r["snapshot-id"] for r in md["refs"].values()}
    assert md["refs"]["audit"]["type"] == "branch"
    # every exported snapshot is reachable from some ref (depth 1)
    assert {s["snapshot-id"] for s in md["snapshots"]} == ref_sids


def test_metadata_log_records_previous_versions(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, 0, 5))
    p1 = export_iceberg_metadata(t)
    t.append(_df(spark, 5, 10))
    p2 = export_iceberg_metadata(t)
    with open(p1) as f:
        assert json.load(f)["metadata-log"] == []
    with open(p2) as f:
        log = json.load(f)["metadata-log"]
    assert [e["metadata-file"] for e in log] == ["file://" + p1]
    assert all(e["timestamp-ms"] > 0 for e in log)
