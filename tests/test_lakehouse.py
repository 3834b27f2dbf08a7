"""LakehouseTable semantics: append, merge-on-read upsert/CDC, schema
evolution, branches, time travel, snapshot props, concurrency, compaction.

Mirrors the reference's writer/coordinator test layers (SURVEY.md §5:
writer tests against an in-memory table; CoordinatorTest commit semantics)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog, LakehouseTable
from iceberg_kafka_connect_spark.sinks.table import CommitConflict

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "warehouse"))


def test_append_and_read_back(spark, catalog):
    t = catalog.create_table("default.events_sink", SCHEMA)
    df = _rows(spark, [(1, "a", None, "x"), (2, "b", None, "y")])
    snap = t.append(df, snapshot_props={"k": "v"})
    assert snap["operation"] == "append"
    assert snap["summary"]["k"] == "v"
    assert "commit-uuid" in snap["summary"]
    out = t.read(spark).orderBy("id").collect()
    assert [(r.id, r.type) for r in out] == [(1, "a"), (2, "b")]


def test_append_coerces_to_table_schema(spark, catalog):
    """P1: unknown columns dropped, missing null-filled, strings coerced."""
    t = catalog.create_table("default.coerce", SCHEMA)
    incoming = spark.createDataFrame(
        [("7", "x", "extra-col")], "id string, type string, junk string"
    )
    t.append(incoming)
    row = t.read(spark).collect()[0]
    assert row.id == 7 and row.type == "x" and row.payload is None


def test_partitioned_append_prunes(spark, catalog):
    t = catalog.create_table("default.part", SCHEMA, partition_by=["day(ts)"])
    df = _rows(
        spark,
        [
            (1, "a", None, None),
            (2, "b", None, None),
        ],
    ).withColumn(
        "ts",
        F.when(F.col("id") == 1, F.lit("2024-01-01 10:00:00")).otherwise(
            F.lit("2024-01-02 10:00:00")
        ).cast("timestamp"),
    )
    t.append(df)
    out = t.read(spark)
    # derived partition column present and usable as a pruning predicate
    assert "ts_day" in out.columns
    pruned = out.filter(F.col("ts_day") == "2024-01-01")
    assert [r.id for r in pruned.collect()] == [1]
    # partition value directories actually exist on disk
    files = t.live_files()[0]
    assert any("ts_day=2024-01-01" in f["path"] for f in files)


def test_upsert_last_wins_and_delete(spark, catalog):
    """S5: equality-delete + append; within-batch duplicate keys last-wins;
    op=D removes rows, including rows from earlier snapshots."""
    t = catalog.create_table("default.cdc", SCHEMA)
    t.append(_rows(spark, [(1, "orig", None, None), (2, "orig", None, None)]))

    batch = spark.createDataFrame(
        [
            (1, "v1", "U", 10),
            (1, "v2", "U", 20),  # later offset wins
            (2, "x", "D", 30),
            (3, "new", "I", 40),
        ],
        "id long, type string, _cdc_op string, offset long",
    )
    t.upsert(batch, key_cols=["id"], op_col="_cdc_op", order_cols=["offset"])
    out = {r.id: r.type for r in t.read(spark).collect()}
    assert out == {1: "v2", 3: "new"}


def test_upsert_multiple_batches(spark, catalog):
    t = catalog.create_table("default.multi", SCHEMA)
    b1 = spark.createDataFrame(
        [(1, "a", "I", 1), (2, "b", "I", 2)],
        "id long, type string, _cdc_op string, offset long",
    )
    b2 = spark.createDataFrame(
        [(2, "b2", "U", 3), (1, "x", "D", 4)],
        "id long, type string, _cdc_op string, offset long",
    )
    t.upsert(b1, ["id"], "_cdc_op", ["offset"])
    t.upsert(b2, ["id"], "_cdc_op", ["offset"])
    out = {r.id: r.type for r in t.read(spark).collect()}
    assert out == {2: "b2"}
    # time travel to after batch 1
    first = t.snapshots()[0]["snapshot_id"]
    old = {r.id: r.type for r in t.read(spark, snapshot_id=first).collect()}
    assert old == {1: "a", 2: "b"}


def test_upsert_on_partitioned_table(spark, catalog):
    """Regression: delete-key files carry only key columns and must not be
    partitioned by the table spec (the spec's source cols aren't in them)."""
    t = catalog.create_table("default.pcdc", SCHEMA, partition_by=["day(ts)"])
    b = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00", "I", 1), (2, "b", "2024-01-02 10:00:00", "I", 2)],
        "id long, type string, ts string, _cdc_op string, offset long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.upsert(b, ["id"], "_cdc_op", ["offset"])
    b2 = spark.createDataFrame(
        [(1, None, None, "D", 3)],
        "id long, type string, ts timestamp, _cdc_op string, offset long",
    )
    t.upsert(b2, ["id"], "_cdc_op", ["offset"])
    assert {r.id for r in t.read(spark).collect()} == {2}


def test_schema_evolution_add_and_widen(spark, catalog):
    narrow = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("type", T.StringType())]
    )
    t = catalog.create_table("default.evolve", narrow)
    t.append(spark.createDataFrame([(1, "a")], narrow))
    incoming = T.StructType(
        [
            T.StructField("id", T.LongType()),  # widen int→long
            T.StructField("type", T.StringType()),
            T.StructField("payload", T.StringType()),  # new column
        ]
    )
    assert t.evolve_schema(incoming) is True
    t.append(
        spark.createDataFrame([(2, "b", "p")], incoming)
    )
    out = t.read(spark).orderBy("id")
    assert dict(out.dtypes)["id"] == "bigint"
    rows = out.collect()
    assert rows[0].payload is None and rows[1].payload == "p"
    # idempotent: same schema again → no change
    assert t.evolve_schema(incoming) is False


def test_nested_schema_evolution(spark, catalog):
    """Nested struct fields evolve too (RecordConverter.java:166-229):
    add a field inside a struct, widen one inside an array element."""
    narrow = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "meta", T.StructType([T.StructField("a", T.StringType())])
            ),
            T.StructField(
                "items",
                T.ArrayType(T.StructType([T.StructField("n", T.IntegerType())])),
            ),
        ]
    )
    wide = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("a", T.StringType()),
                        T.StructField("b", T.LongType()),  # nested add
                    ]
                ),
            ),
            T.StructField(
                "items",
                T.ArrayType(
                    T.StructType([T.StructField("n", T.LongType())])  # widen
                ),
            ),
        ]
    )
    t = catalog.create_table("default.nested_ev", narrow)
    t.append(spark.createDataFrame([(1, ("x",), [(5,)])], narrow))
    assert t.evolve_schema(wide) is True
    t.append(spark.createDataFrame([(2, ("y", 9), [(6,)])], wide))
    out = {r.id: r for r in t.read(spark).collect()}
    assert out[1].meta.b is None and out[2].meta.b == 9
    assert out[1].items[0].n == 5 and out[2].items[0].n == 6
    assert t.evolve_schema(wide) is False  # idempotent


def test_branch_commits(spark, catalog):
    """S8: commit-branch targeting — snapshots land on a named branch."""
    t = catalog.create_table("default.branching", SCHEMA)
    t.append(_rows(spark, [(1, "main", None, None)]))
    t.create_branch("audit")
    t.append(_rows(spark, [(2, "audit-only", None, None)]), branch="audit")
    main_ids = {r.id for r in t.read(spark).collect()}
    audit_ids = {r.id for r in t.read(spark, branch="audit").collect()}
    assert main_ids == {1}
    assert audit_ids == {1, 2}


def test_commit_conflict_detection(spark, catalog):
    t = catalog.create_table("default.conflict", SCHEMA)
    meta = t.metadata()
    # simulate a concurrent writer stealing the next version
    t._write_version(meta["version"] + 1, dict(meta))
    # append still succeeds by retrying onto the next free version
    t.append(_rows(spark, [(1, "a", None, None)]))
    assert t.current_version() >= 2
    # but a direct conflicting write raises
    with pytest.raises(CommitConflict):
        t._write_version(t.current_version(), t.metadata())


def test_auto_create_race(catalog):
    a = catalog.create_table_if_not_exists("default.race", SCHEMA)
    b = catalog.create_table_if_not_exists("default.race", SCHEMA)
    assert a.metadata()["table_uuid"] == b.metadata()["table_uuid"]


def test_compaction_preserves_state(spark, catalog):
    t = catalog.create_table("default.compact", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, None), (2, "b", None, None)]))
    b = spark.createDataFrame(
        [(1, "a2", "U", 1), (2, "x", "D", 2)],
        "id long, type string, _cdc_op string, offset long",
    )
    t.upsert(b, ["id"], "_cdc_op", ["offset"])
    before = {r.id: r.type for r in t.read(spark).collect()}
    snap = t.compact(spark)
    assert snap["operation"] == "replace"
    assert not t.live_files(snap)[1]
    after = {r.id: r.type for r in t.read(spark).collect()}
    assert before == after == {1: "a2"}


def test_orc_write_format_property(spark, catalog):
    """S6: file format from table property write.format.default
    (Utilities.java:160-167)."""
    t = catalog.create_table(
        "default.orc_t", SCHEMA, properties={"write.format.default": "orc"}
    )
    t.append(_rows(spark, [(1, "a", None, None)]))
    files = t.live_files()[0]
    assert all(f["format"] == "orc" and f["path"].endswith(".orc") for f in files)
    assert [r.id for r in t.read(spark).collect()] == [1]
    # upsert path also writes orc
    b = spark.createDataFrame(
        [(1, "a2", "U", 1)], "id long, type string, _cdc_op string, offset long"
    )
    t.upsert(b, ["id"], "_cdc_op", ["offset"])
    assert {r.type for r in t.read(spark).collect()} == {"a2"}


def test_target_file_rows_rolls_files(spark, catalog):
    """write.target-file-rows caps rows per data file (the reference's
    target-file-size rolling, Utilities.java:165-167)."""
    t = catalog.create_table(
        "default.rolling", SCHEMA, properties={"write.target-file-rows": "10"}
    )
    df = spark.range(0, 35).select(
        F.col("id"),
        F.lit("x").alias("type"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("payload"),
    ).coalesce(1)
    t.append(df)
    files = t.live_files()[0]
    assert len(files) >= 4  # 35 rows / 10 per file
    assert t.read(spark).count() == 35


def test_write_sort_order_clusters_rows(spark, catalog):
    """write.sort-order sorts rows within files → parquet min/max stats
    prune row groups for range predicates on the sort column."""
    t = catalog.create_table(
        "default.sorted", SCHEMA, properties={"write.sort-order": "id"}
    )
    import random

    rng = random.Random(7)
    ids = list(range(100))
    rng.shuffle(ids)
    df = spark.createDataFrame(
        [(i, "x", None, None) for i in ids], SCHEMA
    ).coalesce(1)
    t.append(df)
    # rows inside the file are sorted even though the input wasn't
    import pyarrow.parquet as pq
    import os

    fpath = os.path.join(t.root, t.live_files()[0][0]["path"])
    col = pq.read_table(fpath, columns=["id"]).column("id").to_pylist()
    assert col == sorted(col)


def test_sketch_rollup_close_to_exact(spark, sf_dir):
    from iceberg_kafka_connect_spark.suite import load_all

    approx = {
        r.event_type: (r.approx_users, r.p50_approx)
        for r in load_all()["events_rollup_sketch"].fn(spark, sf_dir).collect()
    }
    from iceberg_kafka_connect_spark.suite.core import table as load_table
    from pyspark.sql import functions as FF

    exact = {
        r.event_type: (r.users, r.p50)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            FF.countDistinct("user_id").alias("users"),
            FF.percentile("value", FF.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    for et, (au, ap50) in approx.items():
        eu, ep50 = exact[et]
        assert abs(au - eu) / eu < 0.1
        assert abs(ap50 - ep50) < max(5.0, 0.1 * ep50)


def test_unsupported_format_rejected(catalog):
    t = catalog.create_table(
        "default.bad_fmt", SCHEMA, properties={"write.format.default": "csvx"}
    )
    with pytest.raises(ValueError, match="unsupported"):
        t.file_format()


def test_avro_write_format_property(spark, catalog):
    """S6: write.format.default=avro lands Avro OCF data files
    (Utilities.java:160-167); append + upsert + merge-on-read + compact all
    run on the avro codec (sinks/avro_io.py)."""
    t = catalog.create_table(
        "default.avro_t",
        SCHEMA,
        properties={"write.format.default": "avro"},
    )
    t.append(_rows(spark, [(1, "a", None, None), (2, "b", None, None)]))
    files = t.live_files()[0]
    assert files and all(
        f["format"] == "avro" and f["path"].endswith(".avro") for f in files
    )
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # raw files are real Avro Object Container Files (magic + schema header)
    import os as _os

    from iceberg_kafka_connect_spark.sinks import avro_io

    raw = open(_os.path.join(t.root, files[0]["path"]), "rb").read(4)
    assert raw == b"Obj\x01"
    hdr_schema = avro_io.read_header_schema(
        _os.path.join(t.root, files[0]["path"])
    )
    assert "id" in [f.name for f in hdr_schema.fields]
    # upsert path writes avro delete + data files; merge-on-read applies
    t.upsert(_rows(spark, [(2, "b2", None, None)]), ["id"])
    out = {r.id: r.type for r in t.read(spark).collect()}
    assert out == {1: "a", 2: "b2"}
    # compact folds merge-on-read state, still avro
    snap = t.compact(spark)
    assert snap["operation"] == "replace"
    assert {r.id: r.type for r in t.read(spark).collect()} == out
    assert all(f["format"] == "avro" for f in t.live_files()[0])


def test_time_travel_to_expired_snapshot_errors_cleanly(spark, catalog):
    t = catalog.create_table("default.expired_tt", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, None)]))
    old = t.current_snapshot()["snapshot_id"]
    t.append(_rows(spark, [(2, "b", None, None)]))
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read(spark, snapshot_id=old)


def test_snapshot_ancestry_summary_walk(spark, catalog):
    t = catalog.create_table("default.walk", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, None)]), snapshot_props={"off": "5"})
    t.append(_rows(spark, [(2, "b", None, None)]))
    # latest snapshot lacks "off"; the walk finds it on the parent
    assert t.last_summary_value("off") == "5"


def test_per_op_upsert_insert_appends_blindly(spark, catalog):
    """ADVICE fix: with a cdc op column and upsert_mode OFF, INSERT ops
    append without writing an equality delete (BaseDeltaTaskWriter.java:72-84)
    — duplicate in-batch INSERTs each land, and an INSERT for an existing key
    does NOT replace the prior row."""
    op_schema = T.StructType(
        SCHEMA.fields + [T.StructField("_cdc_op", T.StringType()),
                         T.StructField("offset", T.LongType())]
    )

    def rows(data):
        return spark.createDataFrame(data, op_schema)

    t = catalog.create_table("default.per_op", SCHEMA)
    t.upsert(
        rows([(1, "a", None, None, "I", 0)]),
        ["id"], op_col="_cdc_op", order_cols=["offset"], upsert_mode=False,
    )
    # INSERT for the existing key: appends, does not replace
    t.upsert(
        rows([(1, "a2", None, None, "I", 1), (2, "b", None, None, "I", 2)]),
        ["id"], op_col="_cdc_op", order_cols=["offset"], upsert_mode=False,
    )
    got = sorted((r.id, r.type) for r in t.read(spark).collect())
    assert got == [(1, "a"), (1, "a2"), (2, "b")]
    # duplicate in-batch INSERTs both land
    t.upsert(
        rows([(3, "c1", None, None, "I", 3), (3, "c2", None, None, "I", 4)]),
        ["id"], op_col="_cdc_op", order_cols=["offset"], upsert_mode=False,
    )
    got = sorted((r.id, r.type) for r in t.read(spark).collect() if r.id == 3)
    assert got == [(3, "c1"), (3, "c2")]
    # UPDATE wipes every earlier row for the key, then its row lands;
    # trailing INSERTs after the U also land
    t.upsert(
        rows([(1, "u", None, None, "U", 5), (1, "i-after", None, None, "I", 6)]),
        ["id"], op_col="_cdc_op", order_cols=["offset"], upsert_mode=False,
    )
    got = sorted((r.id, r.type) for r in t.read(spark).collect() if r.id == 1)
    assert got == [(1, "i-after"), (1, "u")]
    # DELETE wipes the key entirely
    t.upsert(
        rows([(3, None, None, None, "D", 7)]),
        ["id"], op_col="_cdc_op", order_cols=["offset"], upsert_mode=False,
    )
    assert [r.id for r in t.read(spark).collect() if r.id == 3] == []
    # an INSERT before the final U/D is superseded (sequential-apply parity)
    t.upsert(
        rows([(4, "x1", None, None, "I", 8), (4, "x2", None, None, "U", 9)]),
        ["id"], op_col="_cdc_op", order_cols=["offset"], upsert_mode=False,
    )
    got = sorted((r.id, r.type) for r in t.read(spark).collect() if r.id == 4)
    assert got == [(4, "x2")]


def test_upsert_key_columns_change_between_batches(spark, catalog):
    """ADVICE fix: delete files record their key-column set; a table whose
    id-columns change between batches stays readable (each key-set applies
    as its own merge-on-read anti-join)."""
    t = catalog.create_table("default.keychange", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, "p1"), (2, "b", None, "p2")]))
    t.upsert(_rows(spark, [(1, "a9", None, "p1")]), ["id"])
    # second batch keyed by a DIFFERENT column set
    t.upsert(_rows(spark, [(9, "b", None, "pb")]), ["type"])
    out = sorted((r.id, r.type) for r in t.read(spark).collect())
    # key-set ["id"]: id=1 replaced; key-set ["type"]: type='b' replaced
    assert out == [(1, "a9"), (9, "b")]


def test_wap_fast_forward_publish(spark, catalog):
    """Write-audit-publish: stage on a branch, validate, fast-forward main."""
    t = catalog.create_table("default.wap", SCHEMA)
    t.append(_rows(spark, [(1, "base", None, None)]))
    t.create_branch("staging")
    t.append(_rows(spark, [(2, "staged", None, None)]), branch="staging")
    t.append(_rows(spark, [(3, "staged", None, None)]), branch="staging")
    # main unchanged while the audit runs
    assert {r.id for r in t.read(spark).collect()} == {1}
    snap = t.fast_forward("main", "staging")
    assert snap["snapshot_id"] == t.current_snapshot("staging")["snapshot_id"]
    assert {r.id for r in t.read(spark).collect()} == {1, 2, 3}


def test_fast_forward_rejects_diverged_branch(spark, catalog):
    t = catalog.create_table("default.wap2", SCHEMA)
    t.append(_rows(spark, [(1, "base", None, None)]))
    t.create_branch("staging")
    t.append(_rows(spark, [(2, "staged", None, None)]), branch="staging")
    t.append(_rows(spark, [(9, "diverged", None, None)]))  # main moved on
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("main", "staging")


def test_fast_forward_noop_when_equal(spark, catalog):
    t = catalog.create_table("default.wap3", SCHEMA)
    t.append(_rows(spark, [(1, "base", None, None)]))
    t.create_branch("staging")
    v = t.current_version()
    t.fast_forward("main", "staging")
    assert t.current_version() == v  # no metadata write for a no-op


def test_fast_forward_creates_missing_branch(spark, catalog):
    t = catalog.create_table("default.wap4", SCHEMA)
    t.append(_rows(spark, [(1, "base", None, None)]))
    t.create_branch("staging")
    t.append(_rows(spark, [(2, "s", None, None)]), branch="staging")
    t.fast_forward("release", "staging")
    assert {r.id for r in t.read(spark, branch="release").collect()} == {1, 2}


def test_partition_spec_evolution(spark, catalog):
    """New spec partitions future writes; old files read back with the
    derived partition column recomputed from source values."""
    t = catalog.create_table("default.specevo", SCHEMA)
    t.append(
        _rows(spark, [(1, "a", None, None), (2, "b", None, None)])
    )  # unpartitioned era
    t.update_partition_spec("bucket(4, id)")
    t.append(_rows(spark, [(3, "c", None, None), (4, "d", None, None)]))
    df = t.read(spark)
    assert "id_bucket4" in df.columns
    rows = {r.id: r.id_bucket4 for r in df.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # derived value must be consistent whether it came from a directory
    # (new files) or was recomputed (old files)
    from pyspark.sql import functions as F

    expect = {
        r.id: r.b
        for r in spark.createDataFrame([(i,) for i in rows], "id long")
        .select("id", F.pmod(F.xxhash64("id"), F.lit(4)).alias("b"))
        .collect()
    }
    assert rows == expect
    # new-spec files actually landed in partition directories
    data_files, _ = t.live_files()
    assert any("id_bucket4=" in f["path"] for f in data_files)
    assert any("id_bucket4=" not in f["path"] for f in data_files)


def test_partition_spec_evolution_requires_known_source(spark, catalog):
    t = catalog.create_table("default.specevo2", SCHEMA)
    with pytest.raises(ValueError, match="not in schema"):
        t.update_partition_spec("day(nope)")


def test_cherry_pick_publishes_staged_after_divergence(spark, catalog):
    """Iceberg cherrypickSnapshot: the WAP publish path once main has
    moved past the staged snapshot's parent (where fast_forward refuses).
    The staged changes replay as a NEW commit on the moved head."""
    t = catalog.create_table("default.cp", SCHEMA)
    t.append(_rows(spark, [(1, "base", None, None)]))
    t.create_branch("staging")
    staged = t.append(
        _rows(spark, [(2, "staged", None, None)]), branch="staging"
    )
    t.append(_rows(spark, [(9, "diverged", None, None)]))  # main moved on
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("main", "staging")
    out = t.cherry_pick(staged["snapshot_id"])
    assert out["summary"]["cherry-pick.snapshot-id"] == staged["snapshot_id"]
    assert {r.id for r in t.read(spark).collect()} == {1, 2, 9}
    # staging branch itself is untouched
    assert {r.id for r in t.read(spark, branch="staging").collect()} == {1, 2}
    # duplicate publication is refused (Iceberg's check)
    with pytest.raises(ValueError, match="already published"):
        t.cherry_pick(staged["snapshot_id"])


def test_cherry_pick_replays_equality_deletes_on_new_head(spark, catalog):
    """A cherry-picked delete snapshot re-commits its delete files with a
    FRESH sequence number: the deletes apply to everything on the target
    head, including rows the branch gained after the staging point."""
    t = catalog.create_table("default.cpd", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, None), (2, "b", None, None)]))
    t.create_branch("fix")
    staged = t.delete_where(
        spark, "id = 2", key_cols=["id"], branch="fix"
    )
    # main gains ANOTHER row with id=2 after the staging point
    t.append(_rows(spark, [(2, "b-respawned", None, None)]))
    assert {r.type for r in t.read(spark).collect()} == {
        "a", "b", "b-respawned"
    }
    t.cherry_pick(staged["snapshot_id"])
    # the replayed equality delete kills BOTH id=2 rows on main
    assert sorted(r.id for r in t.read(spark).collect()) == [1]


def test_cherry_pick_refuses_history_rewrites_and_ancestors(spark, catalog):
    t = catalog.create_table("default.cpr", SCHEMA)
    head = t.append(_rows(spark, [(1, "a", None, None)]))
    t.append(_rows(spark, [(2, "b", None, None)]))
    # a snapshot already in the branch ancestry
    with pytest.raises(ValueError, match="already published"):
        t.cherry_pick(head["snapshot_id"])
    t.compact(spark)
    replace = t.current_snapshot()
    t.append(_rows(spark, [(3, "c", None, None)]))
    with pytest.raises(ValueError, match="rewrites history"):
        t.cherry_pick(replace["snapshot_id"])


def test_publish_wap_by_id(spark, catalog):
    """spark.wap.id flow: stage with a wap.id summary on an audit branch,
    publish by id — even after main diverged. Duplicate/unknown ids fail
    loudly."""
    t = catalog.create_table("default.wapid", SCHEMA)
    t.append(_rows(spark, [(1, "base", None, None)]))
    t.create_branch("audit")
    t.append(
        _rows(spark, [(2, "staged", None, None)]),
        branch="audit",
        snapshot_props={"wap.id": "batch-42"},
    )
    t.append(_rows(spark, [(9, "diverged", None, None)]))
    out = t.publish_wap("batch-42")
    # Iceberg records the published copy's origin as published-wap-id;
    # wap.id stays unique to the staged snapshot
    assert out["summary"]["published-wap-id"] == "batch-42"
    assert "wap.id" not in out["summary"]
    assert {r.id for r in t.read(spark).collect()} == {1, 2, 9}
    with pytest.raises(ValueError, match="already published"):
        t.publish_wap("batch-42")
    with pytest.raises(ValueError, match="no staged snapshot"):
        t.publish_wap("nope")
    # ambiguous wap ids are refused
    t.append(
        _rows(spark, [(3, "s3", None, None)]),
        branch="audit",
        snapshot_props={"wap.id": "dup"},
    )
    t.append(
        _rows(spark, [(4, "s4", None, None)]),
        branch="audit",
        snapshot_props={"wap.id": "dup"},
    )
    with pytest.raises(ValueError, match="ambiguous"):
        t.publish_wap("dup")


def test_cherry_pick_position_deletes_live_refs_ok(spark, catalog):
    """A position-delete snapshot cherry-picks fine when every referenced
    data file is still live on the target head — the (file, pos) identities
    resolve and the delete applies."""
    t = catalog.create_table("default.cppd_ok", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, None), (2, "b", None, None)]))
    t.create_branch("fix")
    staged = t.delete_where_positions(spark, "id = 2", branch="fix")
    t.append(_rows(spark, [(3, "c", None, None)]))  # main moves on
    t.cherry_pick(staged["snapshot_id"])
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 3]


def test_cherry_pick_refuses_dangling_position_deletes(spark, catalog):
    """Iceberg's cherrypickSnapshot restricts itself to appends/WAP
    overwrites because replayed (file, pos) references can dangle; here the
    target head COMPACTED after staging, so the staged position deletes
    reference files no longer live — replaying would silently drop them."""
    t = catalog.create_table("default.cppd_bad", SCHEMA)
    t.append(_rows(spark, [(1, "a", None, None), (2, "b", None, None)]))
    t.create_branch("fix")
    staged = t.delete_where_positions(spark, "id = 2", branch="fix")
    t.compact(spark)  # main rewrote the referenced data file
    t.append(_rows(spark, [(3, "c", None, None)]))
    with pytest.raises(ValueError, match="position deletes reference"):
        t.cherry_pick(staged["snapshot_id"])
    # nothing was committed: both rows still visible on main
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_read_as_of_timestamp(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF: latest snapshot at or before the instant."""
    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakehouseTable.create(str(tmp_path / "asof"), schema)
    t.append(spark.createDataFrame([(1, "a")], schema))
    ts1 = t.current_snapshot()["timestamp_ms"]
    t.append(spark.createDataFrame([(2, "b")], schema))
    ts2 = t.current_snapshot()["timestamp_ms"]
    assert {r.id for r in t.read(spark, as_of_ms=ts1).collect()} == {1}
    assert {r.id for r in t.read(spark, as_of_ms=ts2 + 10).collect()} == {1, 2}
    # exact boundary is inclusive
    assert {r.id for r in t.read(spark, as_of_ms=ts2).collect()} == {1, 2}
    import pytest as _pt

    with _pt.raises(ValueError, match="no snapshot at or before"):
        t.read(spark, as_of_ms=ts1 - 100000)
    with _pt.raises(ValueError, match="mutually exclusive"):
        t.read(spark, as_of_ms=ts1, snapshot_id="x")


def test_manifest_entries_record_write_schema(spark, catalog):
    """r10: every written file entry carries the writer's exact schema
    (spark_schema) and read() passes it back as the user-specified schema —
    no footer inference, writer column order preserved, partition-directory
    column typed from the schema rather than re-inferred from dir strings."""
    t = catalog.create_table("default.sch", SCHEMA, partition_by=["type"])
    t.append(_rows(spark, [(1, "a", None, "x"), (2, "b", None, "y")]))
    data_files, _ = t.live_files()
    assert data_files, "append landed no files"
    for e in data_files:
        sj = e.get("spark_schema")
        assert sj, "entry missing recorded write schema"
        rec = T.StructType.fromJson(json.loads(sj))
        assert "type" in rec.fieldNames()  # partition col included
    out = t.read(spark)
    # read-back schema matches the table schema in name+type (order is
    # project_to_schema's job; the raw group read must not break it)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in SCHEMA.fields
    ]
    assert {(r.id, r.type) for r in out.collect()} == {(1, "a"), (2, "b")}
    # upsert exercises the concurrent delete+data write pair
    t.upsert(_rows(spark, [(2, "b", None, "y2"), (3, "c", None, "z")]),
             key_cols=["id"])
    got = {(r.id, r.payload) for r in t.read(spark).collect()}
    assert got == {(1, "x"), (2, "y2"), (3, "z")}
    _, dels = t.live_files()
    assert dels and all(e.get("spark_schema") for e in dels)
