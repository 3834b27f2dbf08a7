"""MERGE INTO semantics and write-distribution-mode tests.

MERGE parity target: Spark SQL MERGE INTO over an Iceberg table (the
statement whose streaming specialization is the reference's delta writer,
BaseDeltaTaskWriter.java:37-102). Each case cross-checks against the
equivalent set algebra on plain DataFrames.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _ids(df):
    return sorted((r.id, r.v) for r in df.collect())


def test_merge_update_insert_is_upsert(spark, catalog):
    t = catalog.create_table("default.m1", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA))
    src = spark.createDataFrame([(2, "B"), (4, "D")], SCHEMA)
    t.merge(spark, src, on=["id"])
    assert _ids(t.read(spark)) == [(1, "a"), (2, "B"), (3, "c"), (4, "D")]


def test_merge_matched_update_only(spark, catalog):
    t = catalog.create_table("default.m2", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    src = spark.createDataFrame([(2, "B"), (9, "Z")], SCHEMA)
    t.merge(spark, src, on=["id"], when_not_matched=None)
    # 9 is NOT inserted; 2 is updated
    assert _ids(t.read(spark)) == [(1, "a"), (2, "B")]


def test_merge_not_matched_insert_only(spark, catalog):
    t = catalog.create_table("default.m3", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    src = spark.createDataFrame([(2, "B"), (9, "Z")], SCHEMA)
    t.merge(spark, src, on=["id"], when_matched=None)
    # 2 keeps its old value; 9 is inserted
    assert _ids(t.read(spark)) == [(1, "a"), (2, "b"), (9, "Z")]


def test_merge_matched_delete_with_insert(spark, catalog):
    t = catalog.create_table("default.m4", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA))
    src = spark.createDataFrame([(2, "x"), (9, "Z")], SCHEMA)
    t.merge(spark, src, on=["id"], when_matched="delete")
    # 2 deleted, 9 inserted — and the inserted rows of THIS commit are not
    # hit by this commit's delete keys (same sequence number)
    assert _ids(t.read(spark)) == [(1, "a"), (3, "c"), (9, "Z")]


def test_merge_matched_condition(spark, catalog):
    t = catalog.create_table("default.m5", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    src = spark.createDataFrame([(1, "KEEP"), (2, "APPLY")], SCHEMA)
    t.merge(
        spark, src, on=["id"], matched_condition="v = 'APPLY'",
        when_not_matched=None,
    )
    assert _ids(t.read(spark)) == [(1, "a"), (2, "APPLY")]


def test_merge_duplicate_source_keys_raise(spark, catalog):
    t = catalog.create_table("default.m6", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    src = spark.createDataFrame([(1, "x"), (1, "y")], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(spark, src, on=["id"])


def test_distribution_mode_hash_bounds_file_count(spark, catalog):
    part_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    rows = [(i, i % 4) for i in range(400)]
    df = spark.createDataFrame(rows, part_schema).repartition(8)

    t_none = catalog.create_table(
        "default.dnone", part_schema, partition_by="bucket"
    )
    t_none.append(df)
    t_hash = catalog.create_table(
        "default.dhash",
        part_schema,
        partition_by="bucket",
        properties={"write.distribution-mode": "hash"},
    )
    t_hash.append(df)

    files_none, _ = t_none.live_files()
    files_hash, _ = t_hash.live_files()
    # no distribution: up to tasks × partition-values files; hash: one file
    # per partition value
    assert len(files_hash) == 4
    assert len(files_none) > len(files_hash)
    # identical contents either way
    assert sorted(r.id for r in t_hash.read(spark).collect()) == sorted(
        r.id for r in t_none.read(spark).collect()
    )
    # partition directories still laid out for pruning
    paths = [f["path"] for f in files_hash]
    assert all("bucket=" in p for p in paths)


def test_distribution_mode_range_gives_disjoint_bounds(spark, catalog):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("day", T.LongType()),
        ]
    )
    rows = [(i, i // 100) for i in range(400)]
    df = spark.createDataFrame(rows, schema).repartition(8)
    t = catalog.create_table(
        "default.drange",
        schema,
        partition_by="day",
        properties={
            "write.distribution-mode": "range",
            "write.sort-order": "id",
        },
    )
    t.append(df)
    kept, total = t.scan_files("id >= 0 AND id < 100")
    assert len(kept) == 1 and total == 4


def test_distribution_mode_unpartitioned_is_noop(spark, catalog):
    t = catalog.create_table(
        "default.dflat", SCHEMA, properties={"write.distribution-mode": "hash"}
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    assert _ids(t.read(spark)) == [(1, "a"), (2, "b")]


def test_target_file_size_bytes_adaptive(spark, catalog):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = catalog.create_table(
        "default.fsize",
        schema,
        properties={"write.target-file-size-bytes": "4096"},
    )
    df = spark.createDataFrame(
        [(i, "x" * 64) for i in range(4000)], schema
    ).coalesce(1)
    # first commit: no observed history -> rolls by task output (1 file)
    t.append(df)
    first, _ = t.live_files()
    assert len(first) == 1 and first[0]["bytes"] > 0
    # second commit: history gives bytes/row, so the byte target becomes a
    # rows-per-file cap and the same data rolls into multiple files
    t.append(df)
    all_files, _ = t.live_files()
    second = [f for f in all_files if f["seq"] == 2]
    assert len(second) > 1
    # each rolled file is within a small multiple of the target (parquet
    # per-file overhead dominates at this tiny scale, so allow 3x)
    assert all(f["bytes"] < 3 * 4096 for f in second)


def test_rewrite_small_files_binpack(spark, catalog):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = catalog.create_table("default.binpack", schema)
    # one big file (incompressible payloads), then a tail of small ones
    import hashlib

    def blob(i):
        return hashlib.md5(str(i).encode()).hexdigest() * 6

    t.append(
        spark.createDataFrame(
            [(i, blob(i)) for i in range(5000)], schema
        ).coalesce(1)
    )
    for k in range(4):
        t.append(
            spark.createDataFrame(
                [(10_000 + k * 10 + j, "s") for j in range(10)], schema
            ).coalesce(1)
        )
    # a delete that hits BOTH a kept file's row and a small file's row
    t.upsert(spark.createDataFrame([(0, "DEL"), (10_000, "DEL")], schema), ["id"])
    before = sorted((r.id, r.v) for r in t.read(spark).collect())

    data_before, _ = t.live_files()
    big = [f for f in data_before if f["bytes"] >= 100_000]
    assert len(big) == 1
    big_seq = big[0]["seq"]

    snap = t.rewrite_small_files(spark, min_file_size=100_000)
    assert snap is not None and snap["summary"]["compaction"] == "binpack"
    data_after, deletes_after = t.live_files()
    # fewer files; the big file survives with its original path and seq
    assert len(data_after) < len(data_before)
    kept_big = [f for f in data_after if f["path"] == big[0]["path"]]
    assert kept_big and kept_big[0]["seq"] == big_seq
    # deletes remain in the manifest (they still guard the kept file)
    assert deletes_after
    # results identical, including both delete victims replaced not duplicated
    after = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert after == before
    assert (0, "DEL") in after and (10_000, "DEL") in after
    # idempotent-ish: a second pass has at most one small file left
    assert t.rewrite_small_files(spark, min_file_size=100_000) is None


# ---------------------------------------------------------------- X89
# WHEN NOT MATCHED BY SOURCE (SQL:2023 / Spark 3.4 MERGE extension)
# ----------------------------------------------------------------
def test_merge_not_matched_by_source_delete_full_sync(spark, catalog):
    """The mirror primitive: one MERGE makes target == source."""
    t = catalog.create_table("default.mbs1", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA))
    src = spark.createDataFrame([(2, "B"), (4, "D")], SCHEMA)
    t.merge(
        spark, src, on=["id"],
        when_matched="update", when_not_matched="insert",
        when_not_matched_by_source="delete",
    )
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == [
        (2, "B"),
        (4, "D"),
    ]


def test_merge_not_matched_by_source_conditional_delete(spark, catalog):
    t = catalog.create_table("default.mbs2", SCHEMA)
    t.append(
        spark.createDataFrame([(1, "stale"), (2, "b"), (3, "keep")], SCHEMA)
    )
    src = spark.createDataFrame([(2, "B")], SCHEMA)
    t.merge(
        spark, src, on=["id"],
        when_matched="update", when_not_matched=None,
        when_not_matched_by_source="delete",
        not_matched_by_source_condition="v = 'stale'",
    )
    # only the stale unmatched row deleted; id=3 survives untouched
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == [
        (2, "B"),
        (3, "keep"),
    ]


def test_merge_not_matched_by_source_update_set(spark, catalog):
    t = catalog.create_table("default.mbs3", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    src = spark.createDataFrame([(2, "B")], SCHEMA)
    t.merge(
        spark, src, on=["id"],
        when_matched="update", when_not_matched=None,
        when_not_matched_by_source="update",
        not_matched_by_source_set={"v": "concat(v, '-retired')"},
    )
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == [
        (1, "a-retired"),
        (2, "B"),
    ]


def test_merge_by_source_validation(spark, catalog):
    t = catalog.create_table("default.mbs4", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    src = spark.createDataFrame([(1, "A")], SCHEMA)
    with pytest.raises(ValueError, match="when_not_matched_by_source"):
        t.merge(spark, src, on=["id"], when_not_matched_by_source="nope")
    with pytest.raises(ValueError, match="needs\n?.*not_matched_by_source_set|needs"):
        t.merge(
            spark, src, on=["id"], when_not_matched_by_source="update"
        )
    with pytest.raises(ValueError, match="cannot SET key column"):
        t.merge(
            spark,
            spark.createDataFrame([(9, "Z")], SCHEMA),
            on=["id"],
            when_not_matched_by_source="update",
            not_matched_by_source_set={"id": "id + 1"},
        )


def test_merge_by_source_no_orphans_is_plain_merge(spark, catalog):
    """When every target key matches, the by-source clause is a no-op and
    the commit shape is unchanged."""
    t = catalog.create_table("default.mbs5", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    src = spark.createDataFrame([(1, "A"), (2, "B")], SCHEMA)
    t.merge(
        spark, src, on=["id"],
        when_not_matched_by_source="delete",
    )
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == [
        (1, "A"),
        (2, "B"),
    ]
