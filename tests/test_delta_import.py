"""Delta transaction-log reader + zero-copy import (sinks/delta_import).

The logs under test are written HERE, per the public Delta protocol
(PROTOCOL.md): ordered JSON commits of protocol/metaData/add/remove
actions, optional checkpoint parquet + _last_checkpoint pointer. The
library is a reader only — writing the fixture log in the tests keeps
that boundary explicit."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.sinks.delta_import import (
    DeltaImportError,
    DeltaImportUnsupported,
    import_delta_table,
    read_delta_log,
)


def _schema_string():
    return json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "grp", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })


def _meta_actions(part_cols=None):
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "0000-test", "format": {"provider": "parquet",
                                          "options": {}},
            "schemaString": _schema_string(),
            "partitionColumns": part_cols or [],
            "configuration": {}, "createdTime": 1700000000000,
        }},
    ]


def _write_commit(log_dir, version, actions):
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _data_file(spark, table_dir, name, lo, hi):
    """One parquet file with ids [lo, hi) -> (relpath, add action)."""
    staging = os.path.join(table_dir, "_staging", name)
    (spark.range(lo, hi)
     .select("id", F.format_string("g%d", F.col("id") % 3).alias("grp"))
     .coalesce(1).write.mode("overwrite").parquet(staging))
    [src] = glob.glob(os.path.join(staging, "*.parquet"))
    rel = f"part-{name}.parquet"
    os.replace(src, os.path.join(table_dir, rel))
    return rel, {
        "path": rel, "partitionValues": {},
        "size": os.path.getsize(os.path.join(table_dir, rel)),
        "modificationTime": 1700000000000, "dataChange": True,
        "stats": json.dumps({"numRecords": hi - lo}),
    }


@pytest.fixture()
def delta_table(spark, tmp_path):
    td = str(tmp_path / "delta")
    os.makedirs(td)
    log = os.path.join(td, "_delta_log")
    r0, a0 = _data_file(spark, td, "a", 0, 40)
    r1, a1 = _data_file(spark, td, "b", 40, 70)
    _write_commit(log, 0, _meta_actions() + [{"add": a0}, {"add": a1}])
    # commit 1: compaction shape — remove b, add c
    r2, a2 = _data_file(spark, td, "c", 40, 100)
    _write_commit(log, 1, [
        {"remove": {"path": r1, "deletionTimestamp": 1700000001000,
                    "dataChange": False}},
        {"add": a2},
        {"commitInfo": {"operation": "OPTIMIZE"}},
    ])
    return td, log, (r0, r1, r2)


def test_log_replay_live_set_and_import(spark, tmp_path, delta_table):
    td, _log, (r0, r1, r2) = delta_table
    state = read_delta_log(td)
    assert state["version"] == 1
    names = [os.path.basename(p) for p in state["files"]]
    assert sorted(names) == sorted([r0, r2])
    # version pinning: v0 still sees the pre-compaction pair
    v0 = read_delta_log(td, version=0)
    assert sorted(os.path.basename(p) for p in v0["files"]) == sorted(
        [r0, r1])
    t = import_delta_table(td, str(tmp_path / "lake"))
    got = t.read(spark)
    assert got.count() == 100
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(100))
    assert t.properties()["migrated.from"] == "delta"
    assert t.properties()["migrated.source-version"] == "1"


def test_checkpoint_is_the_replay_base(spark, tmp_path, delta_table):
    """With a checkpoint at v1 the JSON commits BEFORE it are not even
    read (deleted here to prove it); later commits apply on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    td, log, (r0, r1, r2) = delta_table
    state = read_delta_log(td)  # v1 state
    ckpt_schema = pa.schema([
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ])),
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ])),
        ("remove", pa.struct([("path", pa.string())])),
    ])
    rows = [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
             "metaData": None, "add": None, "remove": None},
            {"protocol": None,
             "metaData": {"id": "0000-test",
                          "format": {"provider": "parquet"},
                          "schemaString": _schema_string(),
                          "partitionColumns": []},
             "add": None, "remove": None}]
    for a in state["adds"].values():
        rows.append({"protocol": None, "metaData": None,
                     "add": {"path": a["path"],
                             "partitionValues": [],
                             "size": a["size"],
                             "modificationTime": a["modificationTime"],
                             "dataChange": True,
                             "stats": a.get("stats")},
                     "remove": None})
    pq.write_table(
        pa.Table.from_pylist(rows, schema=ckpt_schema),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(rows)}, f)
    # remove pre-checkpoint commits — replay MUST come from the parquet
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    r3, a3 = _data_file(spark, td, "d", 100, 120)
    _write_commit(log, 2, [{"add": a3}])
    state2 = read_delta_log(td)
    assert state2["version"] == 2
    assert sorted(os.path.basename(p) for p in state2["files"]) == sorted(
        [r0, r2, r3])
    t = import_delta_table(td, str(tmp_path / "lake2"))
    assert t.read(spark).count() == 120


def test_refusals_are_loud(spark, tmp_path):
    td = str(tmp_path / "d1")
    log = os.path.join(td, "_delta_log")
    os.makedirs(td)
    rel, add = _data_file(spark, td, "a", 0, 10)
    # deletion vector on an add
    dv_add = dict(add, deletionVector={"storageType": "u", "offset": 1})
    _write_commit(log, 0, _meta_actions() + [{"add": dv_add}])
    with pytest.raises(DeltaImportUnsupported, match="deletionVector"):
        read_delta_log(td)
    # partitioned table
    td2 = str(tmp_path / "d2")
    os.makedirs(td2)
    rel2, add2 = _data_file(spark, td2, "a", 0, 10)
    _write_commit(os.path.join(td2, "_delta_log"), 0,
                  _meta_actions(part_cols=["grp"]) + [{"add": add2}])
    with pytest.raises(DeltaImportUnsupported, match="partitioned"):
        read_delta_log(td2)
    # reader features beyond the supported set
    td3 = str(tmp_path / "d3")
    os.makedirs(td3)
    rel3, add3 = _data_file(spark, td3, "a", 0, 10)
    acts = _meta_actions()
    acts[0] = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                            "readerFeatures": ["deletionVectors"]}}
    _write_commit(os.path.join(td3, "_delta_log"), 0,
                  acts + [{"add": add3}])
    with pytest.raises(DeltaImportUnsupported, match="deletionVectors"):
        read_delta_log(td3)
    # missing data file
    td4 = str(tmp_path / "d4")
    os.makedirs(td4)
    rel4, add4 = _data_file(spark, td4, "a", 0, 10)
    os.remove(os.path.join(td4, rel4))
    _write_commit(os.path.join(td4, "_delta_log"), 0,
                  _meta_actions() + [{"add": add4}])
    with pytest.raises(DeltaImportError, match="missing"):
        read_delta_log(td4)


def test_stats_cross_check(spark, tmp_path):
    td = str(tmp_path / "d")
    os.makedirs(td)
    rel, add = _data_file(spark, td, "a", 0, 10)
    add["stats"] = json.dumps({"numRecords": 999})  # log lies
    _write_commit(os.path.join(td, "_delta_log"), 0,
                  _meta_actions() + [{"add": add}])
    with pytest.raises(DeltaImportError, match="row-count mismatch"):
        import_delta_table(td, str(tmp_path / "lake"))


def test_contiguity_and_version_bounds_refused(spark, tmp_path, delta_table):
    td, log, _ = delta_table
    # beyond-latest version
    with pytest.raises(DeltaImportError, match="beyond latest"):
        read_delta_log(td, version=99)
    # gap: drop commit 0's successor by adding commit 3 and removing 1
    r3, a3 = _data_file(spark, td, "d", 100, 110)
    _write_commit(log, 3, [{"add": a3}])
    os.remove(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(DeltaImportError, match="not contiguous"):
        read_delta_log(td)
