"""Spec-validator sweep: every export shape this engine produces passes
the independent Iceberg-spec re-check, and corrupted trees FAIL it (the
validator is proven non-vacuous)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.spec_validator import (
    validate_exported_tree,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)


def _df(spark, a, b):
    return spark.range(a, b).selectExpr("id", "id % 5 v")


def test_v2_tree_with_deletes_is_conformant(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, partition_by=["v"]
    )
    t.append(_df(spark, 0, 200))
    t.delete_where_positions(spark, "id % 13 = 0")
    t.delete_where(spark, "v = 4", key_cols=["id"])
    t.append(_df(spark, 200, 260))
    out = export_iceberg_metadata(t)
    assert validate_exported_tree(out) == []


def test_v3_tree_with_dvs_lineage_stats_is_conformant(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "t3"), SCHEMA,
        properties={"format-version": "3"},
    )
    t.append(_df(spark, 0, 150).coalesce(1))
    t.delete_where_positions(spark, "id % 11 = 0")
    t.rewrite_position_deletes(spark)  # → deletion vectors
    t.compute_statistics(spark, k=256)
    t.compute_partition_statistics()
    out = export_iceberg_metadata(t)
    assert validate_exported_tree(out) == []


def test_multispec_and_branches_conformant(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "ms"), SCHEMA, partition_by=["v"]
    )
    t.append(_df(spark, 0, 60))
    t.update_partition_spec(["bucket(id, 4)"])
    t.append(_df(spark, 60, 120))
    t.create_branch("audit")
    t.append(_df(spark, 120, 140), branch="audit")
    out = export_iceberg_metadata(t)
    assert validate_exported_tree(out) == []


@pytest.fixture()
def exported(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "c"), SCHEMA)
    t.append(_df(spark, 0, 100).coalesce(1))
    t.append(_df(spark, 100, 150).coalesce(1))
    return export_iceberg_metadata(t)


def _mutate(path, fn):
    md = json.loads(open(path).read())
    fn(md)
    with open(path, "w") as f:
        json.dump(md, f)


def test_validator_catches_bad_sequence_numbers(exported):
    _mutate(
        exported,
        lambda md: md["snapshots"][-1].update({"sequence-number": 0}),
    )
    errs = validate_exported_tree(exported)
    assert any("sequence-number" in e for e in errs)


def test_validator_catches_unresolved_current_snapshot(exported):
    _mutate(exported, lambda md: md.update({"current-snapshot-id": 42}))
    errs = validate_exported_tree(exported)
    assert any("current-snapshot-id" in e for e in errs)


def test_validator_catches_partition_field_id_floor(exported):
    def bad(md):
        md["partition-specs"][0]["fields"] = [
            {
                "name": "v",
                "transform": "identity",
                "source-id": 2,
                "field-id": 5,
            }
        ]

    _mutate(exported, bad)
    errs = validate_exported_tree(exported)
    assert any("1000 floor" in e for e in errs)


def test_validator_catches_record_count_lie(exported):
    """record_count must equal the parquet footer's row count — rewrite
    a manifest entry to lie and the validator must notice."""
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        _read_ocf,
        _write_ocf,
    )

    md = json.loads(open(exported).read())
    ml = md["snapshots"][0]["manifest-list"].removeprefix("file://")
    ml_meta, ml_schema, manifests = _read_ocf(ml)
    mp = manifests[0]["manifest_path"].removeprefix("file://")
    m_meta, m_schema, entries = _read_ocf(mp)
    entries[0]["data_file"]["record_count"] += 7
    new_len = _write_ocf(mp, m_schema, entries, m_meta)
    manifests[0]["manifest_length"] = new_len
    _write_ocf(ml, ml_schema, manifests, ml_meta)
    errs = validate_exported_tree(exported)
    assert any("record_count" in e and "parquet rows" in e for e in errs)


def test_validator_catches_truncated_data_file(exported):
    md = json.loads(open(exported).read())
    ml = md["snapshots"][0]["manifest-list"].removeprefix("file://")
    from iceberg_kafka_connect_spark.sinks.iceberg_export import _read_ocf

    _, _, manifests = _read_ocf(ml)
    mp = manifests[0]["manifest_path"].removeprefix("file://")
    _, _, entries = _read_ocf(mp)
    fp = entries[0]["data_file"]["file_path"].removeprefix("file://")
    with open(fp, "ab") as f:
        f.write(b"x")  # size no longer matches file_size_in_bytes
    errs = validate_exported_tree(exported)
    assert any("file_size_in_bytes" in e for e in errs)
    os.truncate(fp, os.path.getsize(fp) - 1)
    assert validate_exported_tree(exported) == []


def test_v3_delete_only_snapshot_first_row_id_monotone(spark, tmp_path):
    """A file-REMOVING v3 snapshot (rewrite dropping rows) must export a
    first-row-id >= its parent's (the next-row-id at commit), and the
    validator flags a decreasing one."""
    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    t = LakehouseTable.create(
        str(tmp_path / "mono"), SCHEMA,
        properties={"format-version": "3"},
    )
    t.append(_df(spark, 0, 100).coalesce(1))
    t.append(_df(spark, 100, 200).coalesce(1))
    t.delete_where(spark, "id >= 0", key_cols=["id"])  # delete-only snap
    out = export_iceberg_metadata(t)
    assert validate_exported_tree(out) == []
    md = json.loads(open(out).read())
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    frids = []
    for s in md["snapshots"]:
        frids.append(s["first-row-id"])
        p = s.get("parent-snapshot-id")
        if p in by_id:
            assert s["first-row-id"] >= by_id[p]["first-row-id"]
    # the delete-only head carries the high-water mark, not 0
    assert frids[-1] == 200
    # validator non-vacuous for this rule: lower the head's below parent
    _mutate(
        out,
        lambda m: m["snapshots"][-1].update({"first-row-id": 0}),
    )
    errs = validate_exported_tree(out)
    assert any("monotone" in e for e in errs)
