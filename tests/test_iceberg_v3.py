"""Format-version-3 Iceberg export/import: deletion vectors cross the
interop boundary natively (Puffin-blob manifest entries, no
materialization) and row lineage survives (next-row-id, per-file
first_row_id field 142, per-snapshot first-row-id)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    export_iceberg_metadata,
    read_exported,
)
from iceberg_kafka_connect_spark.sinks.iceberg_import import (
    import_iceberg_table,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

V3 = {"format-version": "3"}


def _mk(spark, root):
    t = LakehouseTable.create(
        root,
        spark.range(0, 1).selectExpr(
            "id", "cast(id as string) grp", "id v"
        ).schema,
        properties=V3,
    )
    t.append(
        spark.range(0, 300)
        .selectExpr("id", "cast(id % 4 as string) grp", "id % 9 v")
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    t.delete_where_positions(spark, "v = 2")
    t.rewrite_position_deletes(spark)
    return t


def test_v3_export_keeps_dvs_native(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "src"))
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    assert md["format-version"] == 3
    assert md["next-row-id"] == 300
    # the append snapshot carries its starting row id
    assert min(
        s["first-row-id"] for s in md["snapshots"] if "first-row-id" in s
    ) == 0
    r = read_exported(out)
    [dv] = r["delete_files"]
    assert dv["file_format"] == "PUFFIN"
    assert dv["path"].endswith(".puffin")
    assert dv["content_offset"] >= 4
    assert dv["content_size_in_bytes"] > 0
    # referenced_data_file matches a data entry's file_path exactly
    assert dv["referenced_data_file"] in r["file_paths"]
    assert dv["record_count"] == 300 // 9 + (300 % 9 > 2)
    # per-file lineage claims exported (field 142)
    assert r["first_row_ids"] == {r["file_paths"][0]: 0}


def test_v3_import_roundtrip_rows_dvs_lineage(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "src"))
    out = export_iceberg_metadata(t)
    imp = import_iceberg_table(out, str(tmp_path / "dst"))
    # the DV survives as a DV (the done-criterion of the round)
    _, dels = imp.live_files()
    assert [f.get("delete_type") for f in dels] == ["dv"]
    want = sorted(map(tuple, t.read(spark).collect()))
    assert sorted(map(tuple, imp.read(spark).collect())) == want
    # row ids are identical across the boundary
    lw = {r.id: r._row_id for r in t.read_with_lineage(spark).collect()}
    lg = {r.id: r._row_id for r in imp.read_with_lineage(spark).collect()}
    assert lg == lw
    # fresh appends claim NEW ranges (the imported counter continues)
    assert imp.metadata()["next-row-id"] == 300
    imp.append(
        spark.range(1000, 1010)
        .selectExpr("id", "'x' grp", "id v")
        .coalesce(1)
    )
    lg2 = {r.id: r._row_id for r in imp.read_with_lineage(spark).collect()}
    assert sorted(lg2[i] for i in range(1000, 1010)) == list(range(300, 310))


def test_v2_tables_still_export_v2(spark, tmp_path):
    """The default path is byte-shape-stable: v2 tables export
    format-version 2 with DVs materialized to position-delete parquet."""
    t = LakehouseTable.create(
        str(tmp_path / "v2src"),
        spark.range(0, 1).selectExpr("id", "id v").schema,
    )
    t.append(spark.range(0, 100).selectExpr("id", "id % 7 v").coalesce(1))
    t.delete_where_positions(spark, "v = 3")
    t.rewrite_position_deletes(spark)
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    assert md["format-version"] == 2
    assert "next-row-id" not in md
    r = read_exported(out)
    assert all(
        d.get("file_format") != "PUFFIN" and d["path"].endswith(".parquet")
        for d in r["delete_files"]
    )
    imp = import_iceberg_table(out, str(tmp_path / "v2dst"))
    assert sorted(map(tuple, imp.read(spark).collect())) == sorted(
        map(tuple, t.read(spark).collect())
    )


def test_v3_reexport_of_imported_table(spark, tmp_path):
    """import → export round-trips again: the re-exported tree still
    carries the DV natively and the same lineage claims."""
    t = _mk(spark, str(tmp_path / "src"))
    out = export_iceberg_metadata(t)
    imp = import_iceberg_table(out, str(tmp_path / "dst"))
    out2 = export_iceberg_metadata(imp)
    md2 = json.load(open(out2))
    assert md2["format-version"] == 3
    assert md2["next-row-id"] == 300
    r2 = read_exported(out2)
    [dv] = r2["delete_files"]
    assert dv["file_format"] == "PUFFIN"
    imp2 = import_iceberg_table(out2, str(tmp_path / "dst2"))
    assert sorted(map(tuple, imp2.read(spark).collect())) == sorted(
        map(tuple, t.read(spark).collect())
    )


def test_v3_default_values_cross_the_boundary(spark, tmp_path):
    """initial-default / write-default export as v3 schema field keys and
    import back into field metadata, so reads on the imported table
    backfill pre-column files identically — zero rewrite on both sides."""
    t = LakehouseTable.create(
        str(tmp_path / "dsrc"),
        spark.range(0, 1).selectExpr("id", "id v").schema,
        properties=V3,
    )
    t.append(spark.range(0, 50).selectExpr("id", "id v").coalesce(1))
    t.add_column(
        "region",
        T.StringType(),
        initial_default="unassigned",
        write_default="eu",
    )
    t.append(spark.range(50, 80).selectExpr("id", "id v").coalesce(1))
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    [rf] = [
        f
        for f in md["schemas"][0]["fields"]
        if f["name"] == "region"
    ]
    assert rf["initial-default"] == "unassigned"
    assert rf["write-default"] == "eu"
    imp = import_iceberg_table(out, str(tmp_path / "ddst"))
    got = {r.id: r.region for r in imp.read(spark).collect()}
    assert all(got[i] == "unassigned" for i in range(50))
    assert all(got[i] == "eu" for i in range(50, 80))
    # the defaults keep working for writes AFTER the import
    imp.append(spark.range(100, 110).selectExpr("id", "id v").coalesce(1))
    got2 = {r.id: r.region for r in imp.read(spark).collect()}
    assert all(got2[i] == "eu" for i in range(100, 110))


def test_v3_import_inherits_manifest_first_row_id(spark, tmp_path):
    """Spec inheritance: real v3 writers commonly leave per-file
    first_row_id NULL and let ADDED files inherit manifest.first_row_id
    + preceding added record_counts. Rewrite our exported tree into that
    form and check the import derives identical row ids (not fresh
    ranges)."""
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        _read_ocf,
        _write_ocf,
    )

    t = LakehouseTable.create(
        str(tmp_path / "isrc"),
        spark.range(0, 1).selectExpr("id", "id v").schema,
        properties=V3,
    )
    t.append(
        spark.range(0, 120)
        .selectExpr("id", "id v")
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    [snap] = md["snapshots"]
    ml_path = snap["manifest-list"].removeprefix("file://")
    ml_meta, ml_schema, manifests = _read_ocf(ml_path)
    [mf] = manifests
    m_path = mf["manifest_path"].removeprefix("file://")
    m_meta, m_schema, entries = _read_ocf(m_path)
    assert entries[0]["data_file"]["first_row_id"] == 0  # explicit today
    # null the per-file value; move the base to the manifest level —
    # the inheritance-reliant writer shape
    entries[0]["data_file"]["first_row_id"] = None
    mf["manifest_length"] = _write_ocf(m_path, m_schema, entries, m_meta)
    mf["first_row_id"] = 0
    _write_ocf(ml_path, ml_schema, manifests, ml_meta)
    # the rewrite really took: per-file null, manifest-level 0
    _, _, ents2 = _read_ocf(m_path)
    assert ents2[0]["data_file"]["first_row_id"] is None
    _, _, mfs2 = _read_ocf(ml_path)
    assert mfs2[0]["first_row_id"] == 0
    imp = import_iceberg_table(out, str(tmp_path / "idst"))
    got = {r.id: r._row_id for r in imp.read_with_lineage(spark).collect()}
    assert got == {i: i for i in range(120)}


def test_v3_import_mixed_explicit_and_inherited_first_row_id(
    spark, tmp_path
):
    """Mixed manifest (v3 spec): only entries with a NULL first_row_id
    consume the manifest's first_row_id range. An entry carrying an
    explicit value keeps it and must NOT advance the inheritance cursor
    — otherwise the null entries after it get silently shifted ids."""
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        _read_ocf,
        _write_ocf,
    )

    t = LakehouseTable.create(
        str(tmp_path / "msrc"),
        spark.range(0, 1).selectExpr("id", "id v").schema,
        properties=V3,
    )
    # three data files in ONE append → one manifest with three entries
    t.append(
        spark.range(0, 120)
        .selectExpr("id", "id v")
        .repartitionByRange(3, "id")
        .sortWithinPartitions("id")
    )
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    [snap] = md["snapshots"]
    ml_path = snap["manifest-list"].removeprefix("file://")
    ml_meta, ml_schema, manifests = _read_ocf(ml_path)
    [mf] = manifests
    m_path = mf["manifest_path"].removeprefix("file://")
    m_meta, m_schema, entries = _read_ocf(m_path)
    assert len(entries) == 3
    counts = [int(e["data_file"]["record_count"]) for e in entries]
    # entry 0 keeps an explicit (foreign) id; entries 1 and 2 go null
    # and rely on manifest-level inheritance from first_row_id = 0
    entries[0]["data_file"]["first_row_id"] = 1000
    entries[1]["data_file"]["first_row_id"] = None
    entries[2]["data_file"]["first_row_id"] = None
    mf["manifest_length"] = _write_ocf(m_path, m_schema, entries, m_meta)
    mf["first_row_id"] = 0
    _write_ocf(ml_path, ml_schema, manifests, ml_meta)
    imp = import_iceberg_table(out, str(tmp_path / "mdst"))
    got = sorted(
        r._row_id for r in imp.read_with_lineage(spark).collect()
    )
    want = sorted(
        list(range(1000, 1000 + counts[0]))  # explicit, untouched
        + list(range(0, counts[1]))  # first null entry: base 0
        + list(range(counts[1], counts[1] + counts[2]))  # second null
    )
    assert got == want
