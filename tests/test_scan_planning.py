"""Scan planning: per-file column bounds, predicate file-pruning, sorted
rewrite, and incremental append scans.

Iceberg's planner skips data files whose manifest-recorded bounds can't
satisfy the scan predicate; `appendsBetween` reads only files added after a
snapshot. These tests pin the same semantics on LakehouseTable — and that
pruning never changes results (the predicate is always re-applied to rows).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks import Catalog
from iceberg_kafka_connect_spark.sinks.stats import file_may_match

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _rows(lo, hi, grp):
    base = dt.datetime(2024, 1, 1)
    return [
        (i, grp, base + dt.timedelta(hours=i), float(i) / 2) for i in range(lo, hi)
    ]


def test_append_records_column_bounds(spark, catalog):
    t = catalog.create_table("default.stats", SCHEMA)
    t.append(spark.createDataFrame(_rows(0, 100, "a"), SCHEMA).coalesce(1))
    data, _ = t.live_files()
    assert len(data) == 1
    cols = data[0]["stats"]["cols"]
    assert cols["id"]["min"] == 0 and cols["id"]["max"] == 99
    assert cols["grp"]["min"] == "a" and cols["grp"]["max"] == "a"
    assert cols["ts"]["t"] == "ts"
    assert data[0]["stats"]["rows"] == 100


def test_predicate_prunes_files_and_preserves_results(spark, catalog):
    t = catalog.create_table("default.prune", SCHEMA)
    # three appends with disjoint id ranges -> three files with disjoint bounds
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(_rows(lo, lo + 100, "g"), SCHEMA).coalesce(1)
        )
    kept, total = t.scan_files("id >= 150 AND id < 250")
    assert total == 3 and len(kept) == 2
    kept, _ = t.scan_files("id = 42")
    assert len(kept) == 1
    # timestamp range: second file covers 2024-01-05T04 .. 2024-01-09T07
    kept, _ = t.scan_files("ts >= TIMESTAMP '2024-01-09 10:00:00'")
    assert len(kept) == 1
    # pruned read == unpruned filtered read
    where = "id >= 150 AND id < 250"
    got = sorted(r.id for r in t.read(spark, where=where).collect())
    want = sorted(
        r.id for r in t.read(spark).filter(where).collect()
    )
    assert got == want == list(range(150, 250))


def test_pruning_is_conservative(spark, catalog):
    t = catalog.create_table("default.cons", SCHEMA)
    t.append(spark.createDataFrame(_rows(0, 50, "a"), SCHEMA).coalesce(1))
    t.append(spark.createDataFrame(_rows(50, 100, "b"), SCHEMA).coalesce(1))
    # OR disables pruning entirely (a disjunct could rescue rows)
    kept, total = t.scan_files("id < 10 OR grp = 'b'")
    assert len(kept) == total == 2
    # unparseable / unsupported shapes keep everything
    kept, _ = t.scan_files("id BETWEEN 10 AND 20")
    assert len(kept) == 2
    kept, _ = t.scan_files("length(grp) = 1")
    assert len(kept) == 2
    # IS NOT NULL never prunes (bounds say nothing about nulls)
    kept, _ = t.scan_files("v IS NOT NULL")
    assert len(kept) == 2
    # but results always match the full filter regardless
    assert t.read(spark, where="id < 10 OR grp = 'b'").count() == 60


def test_in_list_and_string_pruning(spark, catalog):
    t = catalog.create_table("default.inlist", SCHEMA)
    t.append(spark.createDataFrame(_rows(0, 50, "aa"), SCHEMA).coalesce(1))
    t.append(spark.createDataFrame(_rows(50, 100, "zz"), SCHEMA).coalesce(1))
    kept, _ = t.scan_files("grp = 'zz'")
    assert len(kept) == 1
    kept, _ = t.scan_files("id IN (3, 7)")
    assert len(kept) == 1
    kept, _ = t.scan_files("grp IN ('mm', 'nn')")
    assert len(kept) == 0
    assert t.read(spark, where="grp IN ('mm','nn')").count() == 0


def test_sorted_compaction_sharpens_pruning(spark, catalog):
    t = catalog.create_table("default.sorted", SCHEMA)
    # interleaved appends: every file spans nearly the full id range, so a
    # narrow range predicate can prune nothing
    import random

    rng = random.Random(7)
    ids = list(range(1000))
    rng.shuffle(ids)
    base = dt.datetime(2024, 1, 1)
    for c in range(4):
        chunk = ids[c * 250 : (c + 1) * 250]
        rows = [
            (i, "g", base + dt.timedelta(hours=i), float(i)) for i in chunk
        ]
        t.append(spark.createDataFrame(rows, SCHEMA).coalesce(1))
    where = "id >= 100 AND id < 150"
    kept_before, total_before = t.scan_files(where)
    assert len(kept_before) == total_before == 4
    t.compact(spark, sort_by=["id"])
    kept_after, total_after = t.scan_files(where)
    assert total_after > 1  # range partitioning produced multiple files
    assert len(kept_after) < total_after  # and the range predicate prunes
    assert t.read(spark, where=where).count() == 50


def test_appends_between(spark, catalog):
    t = catalog.create_table("default.incr", SCHEMA)
    snaps = []
    for lo in (0, 100, 200):
        snaps.append(
            t.append(
                spark.createDataFrame(_rows(lo, lo + 100, "g"), SCHEMA)
            )
        )
    # from the first snapshot -> only batches 2 and 3
    inc = t.appends_between(spark, snaps[0]["snapshot_id"])
    assert sorted(r.id for r in inc.collect()) == list(range(100, 300))
    # bounded range (from snap1 to snap2]
    inc = t.appends_between(
        spark, snaps[0]["snapshot_id"], snaps[1]["snapshot_id"]
    )
    assert sorted(r.id for r in inc.collect()) == list(range(100, 200))
    # from=None reads everything
    inc = t.appends_between(spark, None)
    assert inc.count() == 300
    # a non-ancestor "from" raises
    with pytest.raises(ValueError, match="not an ancestor"):
        t.appends_between(
            spark, snaps[2]["snapshot_id"], snaps[0]["snapshot_id"]
        )


def test_appends_between_rejects_rewrites(spark, catalog):
    t = catalog.create_table("default.incr2", SCHEMA)
    s1 = t.append(spark.createDataFrame(_rows(0, 10, "g"), SCHEMA))
    t.compact(spark)
    t.append(spark.createDataFrame(_rows(10, 20, "g"), SCHEMA))
    with pytest.raises(ValueError, match="not an append"):
        t.appends_between(spark, s1["snapshot_id"])


def test_file_may_match_unit():
    entry = {
        "stats": {
            "rows": 10,
            "cols": {
                "id": {"t": "i", "min": 10, "max": 20},
                "name": {"t": "s", "min": "alpha", "max": "beta"},
            },
        }
    }
    assert file_may_match(entry, "id >= 20")
    assert not file_may_match(entry, "id > 20")
    assert not file_may_match(entry, "id < 10")
    assert file_may_match(entry, "id <= 10")
    assert not file_may_match(entry, "id = 9")
    assert file_may_match(entry, "id != 15")
    assert not file_may_match(entry, "name = 'zeta'")
    assert file_may_match(entry, "name = 'azure'")
    # mixed int/float domains compare numerically
    assert file_may_match(entry, "id = 15.0")
    assert not file_may_match(entry, "id > 20.5")
    # unknown column: keep
    assert file_may_match(entry, "other = 1")
    # stats-less entry: keep
    assert file_may_match({}, "id = 999")


def test_span_dedup_semantics(spark):
    from iceberg_kafka_connect_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d x y"),   # spans: "a b", "c d", "x y"
            (2, "a b c d p q"),   # "a b" and "c d" are repeats
            (3, "p q r s"),       # "p q" here differs from doc2's ("p q" span)
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in span_dedup(
            docs, span_words=2, min_df=2
        ).collect()
    }
    # doc 1 is the first occurrence of "a b" and "c d": keeps everything
    assert out[1].text_dedup == "a b c d x y"
    assert out[1].n_spans == 3 and out[1].n_spans_kept == 3
    # doc 2 loses both repeated spans, keeps its unique tail
    assert out[2].text_dedup == "p q"
    assert out[2].n_spans == 3 and out[2].n_spans_kept == 1
    # doc 3's spans are "p q" (second occurrence -> dropped) and "r s"
    assert out[3].text_dedup == "r s"


def test_tz_offset_timestamp_literal_prunes_correctly():
    entry = {
        "stats": {
            "rows": 5,
            "cols": {
                "ts": {
                    "t": "ts",
                    "min": "2024-01-01T09:00:00",
                    "max": "2024-01-01T10:00:00",
                }
            },
        }
    }
    # +02:00 literal == 09:00 UTC: inside the bounds -> must KEEP
    assert file_may_match(entry, "ts >= TIMESTAMP '2024-01-01 11:00:00+02:00'")
    # +02:00 literal == 11:00 UTC: above the bounds -> prune
    assert not file_may_match(
        entry, "ts >= TIMESTAMP '2024-01-01 13:00:00+02:00'"
    )


def test_nan_bounds_never_prune():
    entry = {
        "stats": {
            "rows": 5,
            "cols": {"v": {"t": "f", "min": 1.0, "max": float("nan")}},
        }
    }
    # NaN bound: column must not participate in pruning at all
    assert file_may_match(entry, "v > 5.0")
    assert file_may_match(entry, "v < 0.0")


def test_appends_between_rejects_sealed_snapshots(spark, catalog):
    t = catalog.create_table("default.sealshield", SCHEMA)
    t.append(spark.createDataFrame(_rows(0, 10, "g"), SCHEMA))
    t.append(spark.createDataFrame(_rows(10, 20, "g"), SCHEMA))
    # an upsert whose deletes would be invisible to an incremental scan
    t.upsert(
        spark.createDataFrame(
            [(0, "g", dt.datetime(2024, 6, 1), 0.0)], SCHEMA
        ),
        ["id"],
    )
    t.append(spark.createDataFrame(_rows(20, 30, "g"), SCHEMA))
    t.append(spark.createDataFrame(_rows(30, 40, "g"), SCHEMA))
    t.expire_snapshots(keep_last=2)
    # the oldest kept snapshot was sealed to the full live set; a scan from
    # the beginning must refuse rather than resurrect deleted rows
    with pytest.raises(ValueError, match="sealed|delete files"):
        t.appends_between(spark, None)


def test_merge_insert_only_outcome_commits_append(spark, catalog):
    from pyspark.sql import types as TT

    schema = TT.StructType(
        [TT.StructField("id", TT.LongType()), TT.StructField("v", TT.StringType())]
    )
    t = catalog.create_table("default.m_noop", schema)
    s0 = t.append(spark.createDataFrame([(1, "a")], schema))
    # matched clause present but matches nothing -> append commit, no
    # delete file, incremental consumers unaffected
    t.merge(
        spark,
        spark.createDataFrame([(9, "z")], schema),
        on=["id"],
        when_matched="delete",
    )
    head = t.current_snapshot()
    assert head["operation"] == "append"
    _, deletes = t.live_files()
    assert deletes == []
    inc = t.appends_between(spark, s0["snapshot_id"])
    assert [r.id for r in inc.collect()] == [9]


def test_range_distribution_unpartitioned_sorts_files(spark, catalog):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    t = Catalog.create_table(
        catalog, "default.rangeflat", schema,
        properties={
            "write.distribution-mode": "range",
            "write.sort-order": "id",
        },
    )
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], schema
    ).repartition(8)
    # at toy scale AQE coalesces the range shuffle to one partition (files
    # are target-sized, which is correct); disable coalescing to observe
    # the range clustering itself
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(df)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    kept, total = t.scan_files("id < 100")
    assert total > 1 and len(kept) < total


def test_source_mix_keeps_null_source(spark):
    from iceberg_kafka_connect_spark.operators.text import source_mix_resample

    rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = source_mix_resample(docs, temperature=0.5)
    by_src = {
        r.source: r.n
        for r in mixed.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    # equal-sized groups: both keep everything, incl. the NULL-source group
    assert by_src.get(None) == 50 and by_src.get("a") == 50


def test_zorder_rewrite_prunes_on_every_listed_column(spark, catalog):
    """Z-order compaction (Iceberg rewrite strategy=sort + z-order
    expression): after clustering on the Morton interleave of (id, v2),
    a range predicate on EITHER column prunes files — a lexicographic sort
    only ever prunes on its leading column — and results are unchanged."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v2", T.LongType()),
        ]
    )
    # two independent uniform dimensions, appended in shuffled order so the
    # incoming files have useless bounds on both
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(4096)) for i in range(4096)]
    rng.shuffle(rows)
    t = catalog.create_table("default.zorder", schema)
    for k in range(4):
        t.append(
            spark.createDataFrame(rows[k * 1024 : (k + 1) * 1024], schema)
            .coalesce(1)
        )
    before_id, total0 = t.scan_files("id < 256")
    before_v2, _ = t.scan_files("v2 < 256")
    assert len(before_id) == total0 and len(before_v2) == total0  # no help

    t.compact(spark, zorder_by=["id", "v2"])
    kept_id, total = t.scan_files("id < 256")
    kept_v2, _ = t.scan_files("v2 < 256")
    assert total >= 8
    # both dimensions must prune meaningfully (the curve guarantees each
    # file covers a small square in (id, v2) space). The ideal curve split
    # keeps exactly total//2 files for a 1/16 slab at 8-file granularity;
    # repartitionByRange picks file boundaries by SAMPLING (seeded from
    # rdd.id, i.e. session history), so one boundary may straddle a curve
    # transition and drag one extra file into the slab — tolerate that
    # single straddle, not more.
    assert len(kept_id) <= total // 2 + 1, (len(kept_id), total)
    assert len(kept_v2) <= total // 2 + 1, (len(kept_v2), total)
    # correctness unchanged
    got = sorted(
        (r.id, r.v2) for r in t.read(spark, where="id < 256").collect()
    )
    assert got == sorted((i, v) for i, v in rows if i < 256)


def test_zorder_rejects_bad_args(spark, catalog):
    schema = T.StructType([T.StructField("id", T.LongType())])
    t = catalog.create_table("default.zbad", schema)
    t.append(spark.createDataFrame([(1,)], schema))
    with pytest.raises(ValueError):
        t.compact(spark, sort_by=["id"], zorder_by=["id", "id"])
    with pytest.raises(ValueError):
        t.compact(spark, zorder_by=["id"])  # needs 2+ columns


def test_quoted_literals_do_not_yield_phantom_conjuncts():
    """r4 advice: a naive AND-split extracted ``id = 9`` from INSIDE a
    quoted string literal and wrongly pruned files (stats here prove
    id=9 impossible, but the real predicate never asserts it). The
    quote-aware split keeps the file."""
    from iceberg_kafka_connect_spark.sinks.stats import split_conjuncts

    entry = {
        "stats": {
            "rows": 10,
            "cols": {
                "id": {"t": "i", "min": 10, "max": 20},
                "name": {"t": "s", "min": "alpha", "max": "beta"},
            },
        }
    }
    # the whole thing is ONE conjunct: name = '<literal containing AND>';
    # the literal sorts inside [alpha, beta], so only a phantom id=9
    # conjunct could prune it
    assert file_may_match(entry, "name = 'b AND id = 9 AND c'")
    # real conjunct outside quotes still prunes
    assert not file_may_match(entry, "name = 'x AND y' AND id = 9")
    # top-level OR disables pruning even when quotes are present
    assert file_may_match(entry, "name = 'q' OR id = 9")
    # OR inside quotes does NOT disable the other conjunct's pruning
    assert not file_may_match(entry, "name = 'a OR b' AND id = 9")
    # doubled-quote escape stays inside the literal
    assert file_may_match(entry, "name = 'b''s AND id = 9'")
    # splitter unit behavior
    assert split_conjuncts("a = 1 AND b = 'x AND c = 2'") == [
        "a = 1 ",
        " b = 'x AND c = 2'",
    ]
    assert split_conjuncts("a = 1 OR b = 2") is None
    assert split_conjuncts("a = 'unbalanced") is None
    # ANDrew is a column name, not a conjunction boundary
    assert split_conjuncts("ANDrew = 1 AND banda = 2") == [
        "ANDrew = 1 ",
        " banda = 2",
    ]


def test_bucket_prune_ignores_quoted_and(spark, catalog):
    """A bucket-partitioned table must not prune to a phantom bucket when
    an equality appears inside a string literal (r4 advice: silent wrong
    bucket in read/delete_where/update)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("note", T.StringType(), True),
        ]
    )
    t = catalog.create_table(
        "db.bq", schema, partition_by=["iceberg_bucket(4, event_id)"]
    )
    # every file carries note bounds [a, zz], so column stats never
    # prune — only the bucket transform (or a phantom conjunct) could
    rows = [(i, n) for i in range(16) for n in ("a", "zz")]
    t.append(spark.createDataFrame(rows, schema))
    # literal contains an equality on the bucket source column: the scan
    # must keep every bucket (no phantom event_id=3 extraction)
    kept, total = t.scan_files("note = 'b AND event_id = 3 AND c'")
    assert len(kept) == total
    # a REAL equality still prunes to ~1/4 of the files
    kept2, total2 = t.scan_files("event_id = 3")
    assert len(kept2) < total2
    got = {r.event_id for r in t.read(spark, where="event_id = 3").collect()}
    assert got == {3}
