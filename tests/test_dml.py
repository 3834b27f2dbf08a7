"""Row-level DELETE WHERE / UPDATE WHERE over the lakehouse.

Parity target: Iceberg merge-on-read DELETE/UPDATE with identifier-keyed
equality deletes — the same delete representation the reference's delta
writer emits (BaseDeltaTaskWriter.java:71-84). Each case cross-checks
against the equivalent filter/select algebra on plain DataFrames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

ROWS = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "c", 50)]


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _rows(df):
    return sorted((r.id, r.grp, r.v) for r in df.collect())


def _table(spark, catalog, name):
    t = catalog.create_table(f"default.{name}", SCHEMA)
    t.append(spark.createDataFrame(ROWS, SCHEMA))
    return t


def test_delete_where(spark, catalog):
    t = _table(spark, catalog, "d1")
    snap = t.delete_where(spark, "grp = 'a'", key_cols=["id"])
    assert snap is not None and snap["operation"] == "overwrite"
    assert _rows(t.read(spark)) == [(3, "b", 30), (4, "b", 40), (5, "c", 50)]


def test_delete_where_no_match_is_noop(spark, catalog):
    t = _table(spark, catalog, "d2")
    head = t.current_snapshot()["snapshot_id"]
    assert t.delete_where(spark, "grp = 'z'", key_cols=["id"]) is None
    assert t.current_snapshot()["snapshot_id"] == head
    assert _rows(t.read(spark)) == sorted(ROWS)


def test_delete_where_prunes_files(spark, catalog):
    """The DELETE's scan must plan against file bounds, not open the table."""
    t = catalog.create_table("default.d3", SCHEMA)
    t.append(spark.createDataFrame([r for r in ROWS if r[0] <= 2], SCHEMA))
    t.append(spark.createDataFrame([r for r in ROWS if r[0] > 2], SCHEMA))
    kept, total = t.scan_files("id >= 5")
    assert total >= 2 and len(kept) < total
    t.delete_where(spark, "id >= 5", key_cols=["id"])
    assert _rows(t.read(spark)) == sorted(r for r in ROWS if r[0] < 5)


def test_update_where(spark, catalog):
    t = _table(spark, catalog, "u1")
    snap = t.update_where(
        spark, "grp = 'b'", {"v": "v * 100", "grp": "upper(grp)"},
        key_cols=["id"],
    )
    assert snap is not None and snap["operation"] == "overwrite"
    assert _rows(t.read(spark)) == [
        (1, "a", 10), (2, "a", 20), (3, "B", 3000), (4, "B", 4000),
        (5, "c", 50),
    ]


def test_update_where_no_match_is_noop(spark, catalog):
    t = _table(spark, catalog, "u2")
    assert t.update_where(spark, "v > 999", {"v": "0"}, key_cols=["id"]) is None
    assert _rows(t.read(spark)) == sorted(ROWS)


def test_update_where_unknown_column_raises(spark, catalog):
    t = _table(spark, catalog, "u3")
    with pytest.raises(ValueError, match="unknown"):
        t.update_where(spark, "v > 0", {"nope": "1"}, key_cols=["id"])


def test_update_then_delete_chain(spark, catalog):
    """DML snapshots stack like any CDC history (merge-on-read applies the
    latest-sequence delete keys)."""
    t = _table(spark, catalog, "u4")
    t.update_where(spark, "id = 1", {"v": "11"}, key_cols=["id"])
    t.delete_where(spark, "v = 11", key_cols=["id"])
    assert _rows(t.read(spark)) == sorted(r for r in ROWS if r[0] != 1)


def test_update_moving_key_column(spark, catalog):
    """Rewriting a key column behaves as delete(old key) + insert(new)."""
    t = _table(spark, catalog, "u5")
    t.update_where(spark, "id = 5", {"id": "id + 100"}, key_cols=["id"])
    assert _rows(t.read(spark)) == [
        (1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40),
        (105, "c", 50),
    ]


def test_time_travel_sees_pre_dml_state(spark, catalog):
    t = _table(spark, catalog, "u6")
    before = t.current_snapshot()["snapshot_id"]
    t.delete_where(spark, "grp = 'a'", key_cols=["id"])
    assert _rows(t.read(spark, snapshot_id=before)) == sorted(ROWS)


def test_drop_column_refused_while_delete_files_key_on_it(spark, catalog):
    """Dropping a column that live equality-delete files anti-join on would
    brick every read; the DDL must refuse until compaction folds them."""
    t = _table(spark, catalog, "g1")
    t.upsert(
        spark.createDataFrame([(9, "z", 90)], SCHEMA), key_cols=["v"]
    )
    with pytest.raises(ValueError, match="compact"):
        t.drop_column("v")
    t.compact(spark)
    t.drop_column("v")  # delete state folded — now safe
    assert "v" not in t.read(spark).columns


def test_delete_where_no_match_leaves_no_stray_files(spark, catalog):
    """The write-first empty guard must discard its uuid dir: a no-match
    DELETE leaves the deletes/ area exactly as it found it."""
    import os

    t = _table(spark, catalog, "d_nostray")
    t.delete_where(spark, "grp = 'a'", key_cols=["id"])  # one real delete
    deletes_dir = os.path.join(t.root, "deletes")
    before = set(os.listdir(deletes_dir))
    assert t.delete_where(spark, "grp = 'zz'", key_cols=["id"]) is None
    assert set(os.listdir(deletes_dir)) == before
    assert t.update_where(
        spark, "grp = 'zz'", {"v": "v + 1"}, key_cols=["id"]
    ) is None
    assert set(os.listdir(deletes_dir)) == before
