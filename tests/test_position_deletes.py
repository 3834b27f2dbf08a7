"""Position deletes (Iceberg v2's second delete representation): row
identity = (data file, row ordinal), exact regardless of key uniqueness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _table(spark, tmp_path, rows, name="t"):
    t = LakehouseTable.create(str(tmp_path / name), SCHEMA)
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_position_delete_exact_rows(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a", 10), (2, "b", 20), (3, "a", 30)])
    snap = t.delete_where_positions(spark, "g = 'a'")
    assert snap is not None
    got = sorted((r.k, r.g, r.v) for r in t.read(spark).collect())
    assert got == [(2, "b", 20)]


def test_position_delete_handles_duplicate_rows(spark, tmp_path):
    """THE reason this representation exists: byte-identical duplicate rows
    (no unique key) delete precisely — an equality delete on any column
    subset would be forced to take all copies or none."""
    t = _table(
        spark, tmp_path, [(1, "a", 10), (1, "a", 10), (1, "a", 10), (2, "b", 5)]
    )
    t.delete_where_positions(spark, "v = 10")
    assert t.read(spark).count() == 1  # every duplicate copy removed
    # and conversely: rows appended AFTER the delete are untouched even if
    # byte-identical to deleted ones (fresh files, fresh identities)
    t.append(spark.createDataFrame([(1, "a", 10)], SCHEMA))
    got = sorted((r.k, r.g, r.v) for r in t.read(spark).collect())
    assert got == [(1, "a", 10), (2, "b", 5)]


def test_position_delete_no_match_returns_none(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a", 10)])
    assert t.delete_where_positions(spark, "v > 99") is None
    # re-deleting already-dead rows is a no-op commit-wise
    t.delete_where_positions(spark, "v = 10")
    assert t.delete_where_positions(spark, "v = 10") is None


def test_position_and_equality_deletes_compose(spark, tmp_path):
    t = _table(
        spark, tmp_path, [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
    )
    t.delete_where(spark, "g = 'b'", key_cols=["k"])
    t.delete_where_positions(spark, "v >= 30")
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == [1]


def test_position_delete_survives_upsert_after(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    t.delete_where_positions(spark, "k = 1")
    t.upsert(spark.createDataFrame([(1, "z", 99)], SCHEMA), key_cols=["k"])
    got = sorted((r.k, r.g) for r in t.read(spark).collect())
    assert got == [(1, "z"), (2, "b")]


def test_compact_folds_position_deletes(spark, tmp_path):
    t = _table(spark, tmp_path, [(i, "g", i) for i in range(100)])
    t.delete_where_positions(spark, "k % 2 = 0")
    t.compact(spark)
    _, deletes = t.live_files()
    assert deletes == []  # folded away
    assert t.read(spark).count() == 50
    assert t.count_rows() == 50  # metadata count valid again


def test_binpack_folds_position_deletes_for_rewritten(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "bp"), SCHEMA)
    for lo in (0, 100):
        t.append(
            spark.createDataFrame([(i, "g", i) for i in range(lo, lo + 100)], SCHEMA)
        )
    t.delete_where_positions(spark, "k % 10 = 0")
    assert t.read(spark).count() == 180
    snap = t.rewrite_small_files(spark, min_file_size=1 << 30)
    assert snap is not None
    assert t.read(spark).count() == 180  # nothing resurrected


def test_changelog_expresses_position_deletes(spark, tmp_path):
    """Round 6: position-delete snapshots are changelog-expressible — the
    deleted ROWS are reconstructed exactly (full content, not key-only)
    from the referenced files by row identity."""
    t = _table(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    s1 = t.current_snapshot()
    t.delete_where_positions(spark, "k = 1")
    ch = t.changes_between(spark, s1["snapshot_id"]).collect()
    assert [(r.k, r.g, r.v, r._change_type) for r in ch] == [
        (1, "a", 10, "delete")
    ]


def test_mv_refresh_incremental_over_position_deletes(spark, tmp_path):
    """Round 6: with position deletes changelog-expressible, the MV
    refresh stays INCREMENTAL (it only needs the touched keys, which the
    reconstructed full delete rows carry) — and the values are exact."""
    from iceberg_kafka_connect_spark.streaming.mv import (
        MV_REFRESH_MODE_PROP,
        refresh_materialized_agg,
    )

    src = _table(spark, tmp_path, [(1, "a", 10), (2, "a", 20), (3, "b", 30)])
    mv = LakehouseTable.create(
        str(tmp_path / "mv"),
        T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("n_rows", T.LongType()),
                T.StructField("sum_v", T.LongType()),
            ]
        ),
    )
    refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    src.delete_where_positions(spark, "k = 2")
    s = refresh_materialized_agg(spark, src, mv, ["k"], ["g"], ["v"])
    assert s["summary"][MV_REFRESH_MODE_PROP] == "incremental"
    got = {r.g: (r.n_rows, r.sum_v) for r in mv.read(spark).collect()}
    assert got == {"a": (1, 10), "b": (1, 30)}


def test_export_rewrites_position_deletes_to_spec_form(spark, tmp_path):
    """Exported positional files carry the spec's reserved field-ids,
    absolute URIs matching the exported data entries, and (path, pos)
    ordering — and reconstructing the reachable state through them equals
    table.read()."""
    import pyarrow.parquet as pq

    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
        read_exported,
    )

    t = _table(
        spark, tmp_path, [(i, "g" + str(i % 2), i) for i in range(50)]
    )
    t.delete_where_positions(spark, "v % 5 = 0")
    info = read_exported(export_iceberg_metadata(t))
    pos_files = [d for d in info["delete_files"] if d["equality_ids"] is None]
    assert len(pos_files) >= 1
    deleted = set()
    for d in pos_files:
        pf = pq.read_table(d["path"])
        sch = pf.schema
        assert sch.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
        assert sch.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
        pairs = list(
            zip(pf.column("file_path").to_pylist(), pf.column("pos").to_pylist())
        )
        assert pairs == sorted(pairs)  # spec ordering
        assert all(fp.startswith("file://") for fp, _ in pairs)
        data_uris = {"file://" + p for p in info["file_paths"]}
        assert all(fp in data_uris for fp, _ in pairs)
        deleted |= set(pairs)
    # external-reader reconstruction: per data file, drop marked ordinals
    import pyarrow as pa

    parts = []
    for path in info["file_paths"]:
        tb = pq.read_table(path)
        uri = "file://" + path
        drop = {p for fp, p in deleted if fp == uri}
        keep = [i for i in range(tb.num_rows) if i not in drop]
        parts.append(tb.take(keep))
    got = pa.concat_tables(parts).num_rows
    assert got == t.read(spark).count() == 40


def test_position_delete_predicate_prunes_files(spark, tmp_path):
    """The delete scan must honor file bounds: only files whose recorded
    min/max admit the predicate are opened."""
    t = LakehouseTable.create(str(tmp_path / "pr"), SCHEMA)
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(i, "g", i) for i in range(lo, lo + 100)], SCHEMA
            ).coalesce(1)
        )
    kept, total = t.scan_files("k >= 250")
    assert total == 3 and len(kept) == 1
    t.delete_where_positions(spark, "k >= 250")
    assert t.read(spark).count() == 250


def test_update_where_positions_duplicate_rows(spark, tmp_path):
    """Keyless UPDATE: every duplicate copy updates, rows appended by the
    update itself are out of the deletes' reach (fresh file identities)."""
    t = _table(
        spark, tmp_path, [(1, "a", 10), (1, "a", 10), (2, "b", 20)], "u"
    )
    snap = t.update_where_positions(spark, "v = 10", {"v": "v + 1", "g": "'z'"})
    assert snap is not None
    got = sorted((r.k, r.g, r.v) for r in t.read(spark).collect())
    assert got == [(1, "z", 11), (1, "z", 11), (2, "b", 20)]


def test_update_where_positions_chained(spark, tmp_path):
    t = _table(spark, tmp_path, [(i, "g", i) for i in range(20)], "u2")
    t.update_where_positions(spark, "v < 5", {"v": "v + 100"})
    t.update_where_positions(spark, "v >= 100", {"g": "'hot'"})
    got = t.read(spark)
    assert got.filter("g = 'hot'").count() == 5
    assert got.count() == 20
    assert got.filter("v >= 100").count() == 5


def test_update_where_positions_no_match_and_bad_column(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a", 10)], "u3")
    assert t.update_where_positions(spark, "v > 99", {"v": "0"}) is None
    with pytest.raises(ValueError, match="unknown"):
        t.update_where_positions(spark, "k = 1", {"nope": "1"})


def test_position_delete_with_space_in_partition_value(spark, tmp_path):
    """Spark renders `_metadata.file_path` percent-encoded (space → %20)
    while the table root / fentry paths are raw strings; without URL
    decoding in _fp_norm the prefix strip misaligns and the anti-join
    silently resurrects deleted rows (round-3 ADVICE, table.py)."""
    t = LakehouseTable.create(
        str(tmp_path / "t sp"), SCHEMA, partition_by=["g"]
    )
    rows = [(1, "a b", 10), (2, "a b", 20), (3, "c%d", 30), (4, "e", 40)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    snap = t.delete_where_positions(spark, "v <= 20")
    assert snap is not None
    got = sorted((r.k, r.g, r.v) for r in t.read(spark).collect())
    assert got == [(3, "c%d", 30), (4, "e", 40)]
    # UPDATE path goes through the same reconstruction
    t.update_where_positions(spark, "g = 'c%d'", {"v": "v + 1"})
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(3, 31), (4, 40)]


def test_position_delete_space_partition_exports(spark, tmp_path):
    """The exported position-delete URIs must match the exported data-entry
    URIs byte-for-byte even when partition dirs contain spaces."""
    pq = pytest.importorskip("pyarrow.parquet")
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
        read_exported,
    )

    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA, partition_by=["g"])
    t.append(
        spark.createDataFrame(
            [(1, "a b", 10), (2, "a b", 20), (3, "x", 30)], SCHEMA
        )
    )
    t.delete_where_positions(spark, "k = 1")
    out = export_iceberg_metadata(t)
    info = read_exported(out)
    data_uris = {"file://" + p for p in info["file_paths"]}
    pos_files = [d for d in info["delete_files"] if d["equality_ids"] is None]
    assert pos_files
    marked = set()
    for d in pos_files:
        pf = pq.read_table(d["path"])
        for fp, pos in zip(
            pf.column("file_path").to_pylist(), pf.column("pos").to_pylist()
        ):
            assert fp in data_uris
            marked.add((fp, pos))
    assert len(marked) == 1  # exactly the one deleted row
