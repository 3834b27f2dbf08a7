"""Iceberg partition-statistics files: per-snapshot per-partition
rollups persisted as parquet, registered in table metadata, refreshed
incrementally from appended manifests only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable


def _mk(spark, root, n=300):
    df = spark.range(0, n).selectExpr(
        "id", "cast(id % 5 as string) grp", "id % 7 v"
    )
    t = LakehouseTable.create(root, df.schema, partition_by=["grp"])
    t.append(df)
    return t


def test_full_compute_matches_data(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "ps"))
    rows = t.compute_partition_statistics()
    got = {
        r["partition"]["grp"]: (
            r["data_record_count"],
            r["data_file_count"],
        )
        for r in rows
    }
    want = {
        r.grp: r.n
        for r in t.read(spark).groupBy("grp").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] >= 1 for v in got.values())
    assert all(
        r["total_data_file_size_in_bytes"] > 0
        and r["last_updated_snapshot_id"]
        == t.current_snapshot()["snapshot_id"]
        for r in rows
    )
    # the accessor serves the persisted file, identical rows
    assert t.partition_statistics() == rows
    df = t.partition_statistics_df(spark)
    assert df.count() == len(rows)
    assert dict(df.dtypes)["partition"] == "map<string,string>"


def test_stale_entry_not_served(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "stale"))
    t.compute_partition_statistics()
    t.append(spark.range(500, 520).selectExpr(
        "id", "cast(id % 5 as string) grp", "id % 7 v"
    ))
    assert t.partition_statistics() is None  # head moved, stats stale


def test_incremental_equals_full(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "inc"))
    t.compute_partition_statistics()
    t.append(
        spark.range(300, 450).selectExpr(
            "id", "cast(id % 5 as string) grp", "id % 7 v"
        )
    )
    inc = t.compute_partition_statistics(mode="incremental")
    t2 = _mk(spark, str(tmp_path / "full"))
    t2.append(
        spark.range(300, 450).selectExpr(
            "id", "cast(id % 5 as string) grp", "id % 7 v"
        )
    )
    full = t2.compute_partition_statistics()
    strip = lambda rows: [  # noqa: E731 — snapshot ids/timestamps differ
        {
            k: v
            for k, v in r.items()
            if k not in ("last_updated_at", "last_updated_snapshot_id")
        }
        for r in rows
    ]
    assert strip(inc) == strip(full)
    # already-covered head → served from the recorded file, no rewrite
    n_entries = len(t.metadata()["partition-statistics"])
    assert t.compute_partition_statistics(mode="incremental") == inc
    assert len(t.metadata()["partition-statistics"]) == n_entries


def test_incremental_falls_back_across_deletes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "del"))
    t.compute_partition_statistics()
    t.delete_where(spark, "v = 3", key_cols=["id"])
    t.compact(spark)
    rows = t.compute_partition_statistics(mode="incremental")
    got = {
        r["partition"]["grp"]: r["data_record_count"] for r in rows
    }
    want = {
        r.grp: r.n
        for r in t.read(spark).groupBy("grp").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == want


def test_replace_by_snapshot(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "rep"))
    t.compute_partition_statistics()
    t.compute_partition_statistics()  # same snapshot: replaces, not appends
    assert len(t.metadata()["partition-statistics"]) == 1


def test_unpartitioned_table_single_row(spark, tmp_path):
    df = spark.range(0, 50).selectExpr("id", "id % 3 v")
    t = LakehouseTable.create(str(tmp_path / "unp"), df.schema)
    t.append(df)
    rows = t.compute_partition_statistics()
    assert len(rows) == 1 and rows[0]["partition"] == {}
    assert rows[0]["data_record_count"] == 50


def test_partition_stats_survive_export_import(spark, tmp_path):
    """Export rewrites the stats file into the spec shape (struct
    partition, int64 remapped snapshot id) under partition-statistics;
    import carries it back and the reader serves identical rollups."""
    import json
    import os

    import pyarrow.parquet as pq

    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
    )
    from iceberg_kafka_connect_spark.sinks.iceberg_import import (
        import_iceberg_table,
    )

    t = _mk(spark, str(tmp_path / "xsrc"))
    want = t.compute_partition_statistics()
    out = export_iceberg_metadata(t)
    md = json.load(open(out))
    [entry] = md["partition-statistics"]
    assert entry["snapshot-id"] == md["current-snapshot-id"]
    spath = entry["statistics-path"].removeprefix("file://")
    ext = pq.read_table(spath)
    # spec shape: struct partition, int64 last_updated_snapshot_id
    assert ext.schema.field("partition").type.num_fields == 1
    assert str(ext.schema.field("last_updated_snapshot_id").type) == "int64"
    assert entry["file-size-in-bytes"] == os.path.getsize(spath)
    imp = import_iceberg_table(out, str(tmp_path / "xdst"))
    got = imp.partition_statistics()
    key = lambda rows: {  # noqa: E731
        r["partition"]["grp"]: (
            r["data_record_count"],
            r["data_file_count"],
            r["total_data_file_size_in_bytes"],
        )
        for r in rows
    }
    assert key(got) == key(want)


def test_incremental_attribution_and_spec_ids(spark, tmp_path):
    """last_updated_* names the snapshot that last added files to THAT
    partition — untouched partitions keep their base attribution through
    an incremental refresh — and spec_id reflects the spec generation a
    partition's layout belongs to."""
    df0 = spark.range(0, 100).selectExpr(
        "id", "cast(id % 3 as string) grp", "id % 7 v"
    )
    t = LakehouseTable.create(
        str(tmp_path / "attr"), df0.schema, partition_by=["grp"]
    )
    t.append(df0)
    s1 = t.current_snapshot()["snapshot_id"]
    t.compute_partition_statistics()
    # second append touches ONLY grp=9 (new partition value)
    t.append(
        spark.range(1000, 1020).selectExpr(
            "id", "cast(9 as string) grp", "id % 7 v"
        )
    )
    s2 = t.current_snapshot()["snapshot_id"]
    rows = t.compute_partition_statistics(mode="incremental")
    by_grp = {r["partition"]["grp"]: r for r in rows}
    for g in ("0", "1", "2"):
        assert by_grp[g]["last_updated_snapshot_id"] == s1
    assert by_grp["9"]["last_updated_snapshot_id"] == s2
    # full rebuild attributes identically (from file seq numbers)
    full = {
        r["partition"]["grp"]: r["last_updated_snapshot_id"]
        for r in t.compute_partition_statistics()
    }
    assert full == {
        g: r["last_updated_snapshot_id"] for g, r in by_grp.items()
    }
    # spec evolution: files under the NEW layout carry a retired/current
    # spec id split per the exporter's convention (current=0, retired=2+)
    t.update_partition_spec(["bucket(id, 4)"])
    t.append(
        spark.range(2000, 2040).selectExpr(
            "id", "cast(id % 3 as string) grp", "id % 7 v"
        )
    )
    rows2 = t.compute_partition_statistics()
    sids = {
        tuple(sorted(r["partition"])): r["spec_id"] for r in rows2
    }
    assert any(v == 0 for k, v in sids.items() if "grp" not in k)
    assert all(v != 0 for k, v in sids.items() if k == ("grp",))
