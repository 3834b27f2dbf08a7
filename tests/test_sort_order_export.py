"""write.sort-order exports as a real Iceberg sort order; files stamp
sort_order_id only when their recorded in-file sort matches — external
engines then exploit sortedness (merge joins, range reads) on exactly the
files that have it."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.iceberg_export import (
    _read_ocf,
    export_iceberg_metadata,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)


def _entries(md, sid):
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    _, _, manifests = _read_ocf(
        snap["manifest-list"].removeprefix("file://")
    )
    out = []
    for m in manifests:
        if m["content"] == 0:
            _, _, es = _read_ocf(m["manifest_path"].removeprefix("file://"))
            out.extend(es)
    return out


def test_sorted_table_exports_order_and_file_ids(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, properties={"write.sort-order": "k"}
    )
    t.append(spark.createDataFrame([(i % 7, i) for i in range(50)], SCHEMA))
    with open(export_iceberg_metadata(t)) as f:
        md = json.load(f)
    assert md["default-sort-order-id"] == 1
    order = next(o for o in md["sort-orders"] if o["order-id"] == 1)
    kid = next(
        fld["id"] for fld in md["schemas"][0]["fields"] if fld["name"] == "k"
    )
    assert order["fields"] == [
        {
            "transform": "identity",
            "source-id": kid,
            "direction": "asc",
            "null-order": "nulls-first",
        }
    ]
    es = _entries(md, md["current-snapshot-id"])
    assert es and all(
        e["data_file"]["sort_order_id"] == 1 for e in es
    )


def test_presorted_files_not_claimed(spark, tmp_path):
    """Files written before the property existed must NOT claim the order
    (they were never sorted)."""
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(spark.createDataFrame([(i, i) for i in range(20)], SCHEMA))
    t.set_properties({"write.sort-order": "k"})
    t.append(spark.createDataFrame([(i, i) for i in range(20, 40)], SCHEMA))
    with open(export_iceberg_metadata(t)) as f:
        md = json.load(f)
    assert md["default-sort-order-id"] == 1
    es = _entries(md, md["current-snapshot-id"])
    ids = {e["data_file"]["sort_order_id"] for e in es}
    assert ids == {None, 1}


def test_unsorted_table_exports_order_zero(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.append(spark.createDataFrame([(1, 1)], SCHEMA))
    with open(export_iceberg_metadata(t)) as f:
        md = json.load(f)
    assert md["default-sort-order-id"] == 0
    assert md["sort-orders"] == [{"order-id": 0, "fields": []}]
    es = _entries(md, md["current-snapshot-id"])
    assert all(e["data_file"]["sort_order_id"] is None for e in es)


def test_dropped_sort_column_drops_claim(spark, tmp_path):
    """A sort order naming a column dropped from the schema must not be
    exported (dangling source-id)."""
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, properties={"write.sort-order": "v"}
    )
    t.append(spark.createDataFrame([(1, 1)], SCHEMA))
    t.drop_column("v")
    with open(export_iceberg_metadata(t)) as f:
        md = json.load(f)
    assert md["default-sort-order-id"] == 0


def test_renamed_sort_column_keeps_claim(spark, tmp_path):
    """rename_column keeps write.sort-order in sync, so the exported order
    follows the new name's field-id."""
    t = LakehouseTable.create(
        str(tmp_path / "t"), SCHEMA, properties={"write.sort-order": "k"}
    )
    t.append(spark.createDataFrame([(i, i) for i in range(10)], SCHEMA))
    t.rename_column("k", "kk")
    with open(export_iceberg_metadata(t)) as f:
        md = json.load(f)
    assert md["default-sort-order-id"] == 1
    kid = next(
        fld["id"] for fld in md["schemas"][0]["fields"] if fld["name"] == "kk"
    )
    order = next(o for o in md["sort-orders"] if o["order-id"] == 1)
    assert order["fields"][0]["source-id"] == kid
