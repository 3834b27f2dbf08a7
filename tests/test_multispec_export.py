"""Partition-spec evolution across the Iceberg boundary: files written
under retired specs export with their OWN spec id (one manifest per
spec, Iceberg's native multi-spec representation) and import
reconstructs identity columns under the spec each file was written
with."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
    read_exported,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
    refresh_from_iceberg,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("region", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, ["amer", "emea", "apac"][i % 3], float(i)) for i in range(lo, hi)],
        SCHEMA,
    )


@pytest.fixture()
def evolved(spark, tmp_path):
    """identity(region) era → iceberg_bucket(id) era, both with live files."""
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, partition_by=["region"]
    )
    t.append(_df(spark, 0, 30))
    t.update_partition_spec(["iceberg_bucket(4, id)"])
    t.append(_df(spark, 30, 60))
    return t


def test_export_emits_one_manifest_per_spec(spark, evolved):
    meta_path = export_iceberg_metadata(evolved)
    with open(meta_path) as f:
        md = json.load(f)
    by_id = {s["spec-id"]: s for s in md["partition-specs"]}
    assert by_id[0]["fields"][0]["transform"] == "bucket[4]"
    retired = [
        s for sid, s in by_id.items() if sid >= 2
    ]
    assert len(retired) == 1
    assert retired[0]["fields"][0]["transform"] == "identity"
    out = read_exported(meta_path)
    # every live file is reachable; old files carry region tuples, new
    # files carry bucket tuples
    assert out["total_rows"] == 60
    shapes = {tuple(sorted(p)) for p in out["partitions"]}
    assert ("region",) in shapes
    assert any("iceberg_bucket" in k[0] for k in shapes if k != ("region",))


def test_import_reconstructs_identity_under_retired_spec(
    spark, evolved, tmp_path
):
    meta_path = export_iceberg_metadata(evolved)
    imp = import_iceberg_table(meta_path, str(tmp_path / "imp"))
    got = imp.read(spark).orderBy("id").collect()
    want = evolved.read(spark).orderBy("id").collect()
    assert len(got) == 60
    # the identity source column was dropped from old-era data files by
    # partitionBy — nulls here would mean the tuple was read under the
    # wrong spec
    assert all(r.region is not None for r in got)
    assert [(r.id, r.region, r.amount) for r in got] == [
        (r.id, r.region, r.amount) for r in want
    ]


def test_refresh_follows_multispec_source(spark, evolved, tmp_path):
    imp = import_iceberg_table(
        export_iceberg_metadata(evolved), str(tmp_path / "imp")
    )
    evolved.append(_df(spark, 60, 80))
    evolved.delete_where(spark, "id % 10 = 1", key_cols=["id"])
    export_iceberg_metadata(evolved)
    refresh_from_iceberg(imp)
    got = {(r.id, r.region) for r in imp.read(spark).collect()}
    want = {(r.id, r.region) for r in evolved.read(spark).collect()}
    assert got == want and len(got) == 72


def test_summary_counts_span_specs(spark, evolved):
    meta_path = export_iceberg_metadata(evolved)
    with open(meta_path) as f:
        md = json.load(f)
    head = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    # both eras' files are in the totals, not just the current spec's
    assert int(head["summary"]["total-records"]) == 60
    total_files = int(head["summary"]["total-data-files"])
    out = read_exported(meta_path)
    assert total_files == len(out["file_paths"])


def test_spec_narrowing_prefers_retired_superset(spark, tmp_path):
    """Narrowing [region, cat] → [region]: old-era files parse under BOTH
    specs' parsers, but the retired superset must claim them — the
    current spec would drop the cat dir and cat (removed from old files
    by partitionBy) would import as null."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("region", T.StringType(), True),
            T.StructField("cat", T.StringType(), True),
        ]
    )
    rows = [
        (i, ["amer", "emea"][i % 2], ["x", "y", "z"][i % 3], )
        for i in range(30)
    ]
    t = LakehouseTable.create(
        str(tmp_path / "t"), schema, partition_by=["region", "cat"]
    )
    t.append(spark.createDataFrame(rows, schema))
    t.update_partition_spec(["region"])
    t.append(
        spark.createDataFrame(
            [(100 + i, "apac", "w") for i in range(5)], schema
        )
    )
    meta_path = export_iceberg_metadata(t)
    imp = import_iceberg_table(meta_path, str(tmp_path / "imp"))
    got = imp.read(spark).collect()
    assert len(got) == 35
    assert all(r.cat is not None for r in got)
    assert {(r.id, r.region, r.cat) for r in got} == {
        (r.id, r.region, r.cat) for r in t.read(spark).collect()
    }


def test_partition_field_ids_follow_iceberg_rules(spark, evolved, tmp_path):
    """Iceberg v2, both directions: DIFFERENT fields never share a
    field-id across specs, and EQUIVALENT fields (same source +
    transform) in different spec generations REUSE theirs — engines
    union the partition type by id."""
    meta_path = export_iceberg_metadata(evolved)
    with open(meta_path) as f:
        md = json.load(f)
    seen = {}
    for s in md["partition-specs"]:
        ids_in_spec = [f["field-id"] for f in s["fields"]]
        assert len(ids_in_spec) == len(set(ids_in_spec))
        for f in s["fields"]:
            key = (f["source-id"], f["transform"])
            ident = f["field-id"]
            assert seen.get(key, ident) == ident, (
                f"equivalent field {key} got two ids"
            )
            for k2, id2 in seen.items():
                if k2 != key:
                    assert id2 != ident, (
                        f"field-id {ident} shared by {k2} and {key}"
                    )
            seen[key] = ident
    assert md["last-partition-id"] >= max(seen.values())
    # the shared-field case directly: [region, cat] -> [region] keeps
    # region's id identical in both generations
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("region", T.StringType(), True),
            T.StructField("cat", T.StringType(), True),
        ]
    )
    t = LakehouseTable.create(
        str(tmp_path / "shared"), schema, partition_by=["region", "cat"]
    )
    t.append(
        spark.createDataFrame([(1, "amer", "x"), (2, "emea", "y")], schema)
    )
    t.update_partition_spec(["region"])
    t.append(spark.createDataFrame([(3, "apac", "z")], schema))
    with open(export_iceberg_metadata(t)) as f:
        md2 = json.load(f)
    by_spec = {
        s["spec-id"]: {f["name"]: f["field-id"] for f in s["fields"]}
        for s in md2["partition-specs"]
    }
    retired_id = next(k for k in by_spec if k >= 2)
    assert by_spec[0]["region"] == by_spec[retired_id]["region"]
    assert by_spec[retired_id]["cat"] != by_spec[0]["region"]


def test_unplannable_generation_fails_loud(spark, tmp_path):
    """Files whose spec generation can no longer be planned (identity
    source column dropped AFTER the spec was retired) must raise the
    compact() error — an empty retired spec must not swallow them."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("x", T.StringType(), True),
            T.StructField("y", T.StringType(), True),
        ]
    )
    t = LakehouseTable.create(
        str(tmp_path / "t"), schema, partition_by=["x", "y"]
    )
    t.append(
        spark.createDataFrame([(1, "a", "p"), (2, "b", "q")], schema)
    )
    t.update_partition_spec(None)  # now unpartitioned; [x, y] retired
    t.append(spark.createDataFrame([(3, "c", "r")], schema))
    t.drop_column("y")  # retired spec's source gone -> its plan fails
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        IcebergExportUnsupported,
    )

    with pytest.raises(IcebergExportUnsupported, match="compact"):
        export_iceberg_metadata(t)
