"""add_files: register existing parquet in place (Iceberg's add_files
procedure / snapshot-table migration — zero rewrite, one metadata
commit)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def test_add_files_from_dir(spark, tmp_path):
    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], SCHEMA
    ).repartition(4).write.parquet(ext)
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    snap = t.add_files(ext)
    assert snap["summary"]["operation"] == "add-files"
    assert t.read(spark).count() == 100
    # data was NOT copied: the table references the external files
    data_f, _ = t.live_files()
    assert all(f["path"].startswith(ext) for f in data_f)
    # footer stats landed → min/max pruning works without a scan
    kept, total = t.scan_files("k >= 10000")
    assert kept == [] and total == len(data_f)
    # further DML composes
    t.delete_where(spark, "k < 10", key_cols=["k"])
    assert t.read(spark).count() == 90


def test_add_files_hive_partitioned_source(spark, tmp_path):
    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(30)], SCHEMA
    ).withColumnRenamed("v", "part").write.partitionBy("part").parquet(ext)
    sch = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("part", T.StringType())]
    )
    t = LakehouseTable.create(
        str(tmp_path / "t"), sch, partition_by=["part"]
    )
    t.add_files(ext)
    got = t.read(spark)
    assert got.count() == 30
    assert got.filter("part = 'p1'").count() == 10


def test_add_files_schema_mismatch_raises(spark, tmp_path):
    ext = str(tmp_path / "ext")
    spark.createDataFrame([(1,)], "other long").write.parquet(ext)
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    with pytest.raises(ValueError, match="lack table columns"):
        t.add_files(ext)
    assert t.read(spark).count() == 0


def test_add_files_explicit_paths_and_export(spark, tmp_path):
    """add_files composes with the Iceberg exporter: registered files
    export like any other data files."""
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
        read_exported,
    )

    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(i, "x") for i in range(20)], SCHEMA
    ).coalesce(1).write.parquet(ext)
    paths = [
        os.path.join(ext, p) for p in os.listdir(ext) if p.endswith(".parquet")
    ]
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.add_files(paths)
    info = read_exported(export_iceberg_metadata(t))
    assert info["total_rows"] == 20
    assert info["file_paths"] == paths


def test_maintenance_never_touches_external_files(spark, tmp_path):
    """expire_snapshots + remove_orphan_files operate under the table
    root; files registered in place from OUTSIDE stay untouched even
    after their snapshots expire."""
    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(i, "x") for i in range(10)], SCHEMA
    ).coalesce(1).write.parquet(ext)
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    t.add_files(ext)
    for lo in range(3):  # push the add-files snapshot off the chain
        t.append(
            spark.createDataFrame([(100 + lo, "y")], SCHEMA)
        )
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(older_than_ms=0)
    ext_files = [p for p in os.listdir(ext) if p.endswith(".parquet")]
    assert ext_files, "external source files must survive maintenance"
    # the sealed chain root still reads everything
    assert t.read(spark).count() == 13
