"""Operator-level tests for as_of_join / interval_join / contamination /
repetition metrics — the edge cases the gate queries don't exercise."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators.relational import (
    as_of_join,
    interval_join,
)
from iceberg_kafka_connect_spark.operators.dedup import contamination_scores
from iceberg_kafka_connect_spark.operators import text as tx


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1.0),
            ("A", _ts("2024-01-01 10:05:00"), 2.0),
            ("A", _ts("2024-01-01 10:10:00"), 3.0),
            ("B", _ts("2024-01-01 10:02:00"), 10.0),
        ],
        "sym string, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:00"), 100),  # before any quote
            ("A", _ts("2024-01-01 10:05:00"), 200),  # exactly on a quote
            ("A", _ts("2024-01-01 10:07:00"), 300),  # between quotes
            ("B", _ts("2024-01-01 10:30:00"), 400),  # far after B's quote
            ("C", _ts("2024-01-01 10:00:00"), 500),  # key with no right rows
        ],
        "sym string, ts timestamp, qty int",
    )


def _asof_map(df):
    return {r["qty"]: r["px"] for r in df.collect()}


def test_asof_backward(quotes, trades):
    out = as_of_join(trades, quotes, on=["sym"], left_ts="ts")
    assert _asof_map(out) == {100: None, 200: 2.0, 300: 2.0, 400: 10.0, 500: None}
    # left row count preserved (left-join semantics)
    assert out.count() == 5


def test_asof_forward(quotes, trades):
    out = as_of_join(trades, quotes, on=["sym"], left_ts="ts", direction="forward")
    # 10:05 trade matches the 10:05 quote (inclusive), 09:59 → 10:00 quote,
    # 10:07 → 10:10, B's 10:30 has nothing after it
    assert _asof_map(out) == {100: 1.0, 200: 2.0, 300: 3.0, 400: None, 500: None}


def test_asof_tolerance(quotes, trades):
    out = as_of_join(
        trades, quotes, on=["sym"], left_ts="ts", tolerance_s=120.0
    )
    # 10:07 trade is 120s after the 10:05 quote — inside; B's 10:30 trade is
    # 28 min after its quote — nulled out by tolerance
    assert _asof_map(out) == {100: None, 200: 2.0, 300: 2.0, 400: None, 500: None}


def test_asof_right_tie_deterministic(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:01:00"))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), 1),
            ("k", _ts("2024-01-01 10:00:00"), 2),
        ],
        "k string, ts timestamp, v int",
    )
    vals = {
        as_of_join(left, right, on=["k"]).collect()[0]["v"] for _ in range(3)
    }
    assert vals == {2}  # greatest struct wins, every run


def test_asof_column_collision_suffix(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:01:00"), 7)], "k string, ts timestamp, v int"
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 8)], "k string, ts timestamp, v int"
    )
    out = as_of_join(left, right, on=["k"])
    row = out.collect()[0]
    assert row["v"] == 7 and row["v_r"] == 8 and row["ts_r"] is not None


def test_interval_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), 1),  # == start: in
            ("k", _ts("2024-01-01 10:59:59"), 2),  # just inside
            ("k", _ts("2024-01-01 11:00:00"), 3),  # == end: out (exclusive)
            ("k", _ts("2024-01-01 09:59:59"), 4),  # before: out
        ],
        "k string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "iv")],
        "k string, start timestamp, end timestamp, name string",
    )
    out = interval_join(points, intervals, on=["k"])
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_interval_join_small_buckets_no_dups(spark):
    # interval spans many buckets — each matching point must appear ONCE
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:30:00"), 1)], "k string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"), "iv")],
        "k string, start timestamp, end timestamp, name string",
    )
    out = interval_join(points, intervals, on=["k"], bucket_s=60)
    assert out.count() == 1


def test_interval_join_empty_and_inverted_intervals(spark):
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 1)], "k string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:00:00"), "empty"),
            ("k", _ts("2024-01-01 11:00:00"), _ts("2024-01-01 10:00:00"), "inverted"),
        ],
        "k string, start timestamp, end timestamp, name string",
    )
    assert interval_join(points, intervals, on=["k"]).count() == 0


def test_interval_join_rejects_collisions(spark, quotes):
    with pytest.raises(ValueError, match="collision"):
        interval_join(quotes, quotes, on=["sym"], start_col="ts", end_col="ts")


def test_contamination_no_benchmark_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    benchmark = spark.createDataFrame(
        [(9, "z y x w v u t")], "doc_id long, text string"
    )
    out = contamination_scores(corpus, benchmark, n=5).collect()
    assert {r["doc_id"]: r["n_contaminated"] for r in out} == {1: 0, 2: 0}
    assert all(r["contamination"] == 0.0 for r in out)


def test_contamination_full_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "p q r s t u")], "doc_id long, text string"
    )
    benchmark = spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r for r in contamination_scores(corpus, benchmark, n=5).collect()
    }
    assert rows[1]["n_shingles"] == 2 and rows[1]["n_contaminated"] == 2
    assert rows[1]["contamination"] == 1.0
    assert rows[2]["n_contaminated"] == 0


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # pure repetition
            (2, "one two three four five six"),  # clean
            (3, "a b"),  # below min_words, too short for 3-grams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            tx.top_word_ratio(F.col("text")).alias("twr"),
            tx.dup_ngram_ratio(F.col("text"), 2).alias("d2"),
            tx.repetition_filter(F.col("text")).alias("passes"),
        ).collect()
    }
    assert out[1]["twr"] == 1.0 and out[1]["d2"] == 0.75 and not out[1]["passes"]
    assert out[2]["twr"] == pytest.approx(1 / 6) and out[2]["d2"] == 0.0
    assert not out[3]["passes"]  # min_words gate
    assert out[3]["d2"] == 0.0  # no 2-grams of 2 words → 1 gram... still defined


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3 — forces multiple propagation rounds),
    # pair 10-11, isolated 99 (no edges → absent from output)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    from iceberg_kafka_connect_spark.operators.dedup import connected_components

    out = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_merging_clusters(spark):
    # two clusters joined by a late bridge edge; min label must win globally
    pairs = spark.createDataFrame(
        [(5, 6), (7, 8), (6, 7)], "id_a long, id_b long"
    )
    from iceberg_kafka_connect_spark.operators.dedup import connected_components

    out = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {5: 5, 6: 5, 7: 5, 8: 5}


def test_connected_components_fused_init_shapes(spark):
    # r10: the first propagation round is fused into initialization
    # (label₀ = min(id, min neighbor)) and convergence is read via
    # observe() off the checkpoint action. Shapes that stress both:
    # a star already converged AT init (immediate-fixpoint exit), a
    # diameter-5 chain (multiple post-init rounds), and string ids
    # (the fingerprint must not assume numeric labels).
    from iceberg_kafka_connect_spark.operators.dedup import connected_components

    star = spark.createDataFrame(
        [(1, 7), (1, 8), (1, 9)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component"] for r in connected_components(star).collect()}
    assert out == {1: 1, 7: 1, 8: 1, 9: 1}

    chain = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5), (5, 6), (6, 7)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component"] for r in connected_components(chain).collect()}
    assert out == {i: 2 for i in range(2, 8)}

    strs = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "id_a string, id_b string"
    )
    out = {r["id"]: r["component"] for r in connected_components(strs).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_incremental_dedup_all_reasons(spark):
    from iceberg_kafka_connect_spark.operators.dedup import incremental_dedup

    history = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "uno dos tres cuatro cinco seis siete"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "Alpha  beta gamma delta epsilon"),  # normalized == hist 1
            (15, "zeta eta theta iota kappa"),
            (20, "zeta eta theta iota kappa"),  # dup of 15 in batch
            (25, "uno dos tres cuatro cinco seis OTRO"),  # j=4/6 vs hist 2
            (30, "red green blue purple orange pink"),
            (35, "red green blue purple orange OTHER"),  # j=3/5 vs 30
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["kept"], r["drop_reason"])
        for r in incremental_dedup(batch, history).collect()
    }
    assert out == {
        10: (False, "exact_history"),
        15: (True, None),
        20: (False, "exact_batch"),
        25: (False, "near_history"),
        30: (True, None),
        35: (False, "near_batch"),
    }


def test_incremental_dedup_cached_equals_uncached(spark, sf_dir):
    """The signature-store path must produce verdicts identical to the
    text-path incremental_dedup on the same split."""
    from iceberg_kafka_connect_spark.operators.dedup import (
        doc_signatures,
        incremental_dedup,
        incremental_dedup_cached,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    history = docs.filter(F.col("doc_id") % 3 != 0)
    want = {
        (r.doc_id, r.kept, r.drop_reason)
        for r in incremental_dedup(batch, history).collect()
    }
    got = {
        (r.doc_id, r.kept, r.drop_reason)
        for r in incremental_dedup_cached(
            doc_signatures(batch), doc_signatures(history)
        ).collect()
    }
    assert got == want and len(got) == batch.count()


def test_doc_signatures_short_docs_null_bands(spark):
    from iceberg_kafka_connect_spark.operators.dedup import doc_signatures

    df = spark.createDataFrame(
        [(1, "only two"), (2, "three word doc here now")],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in doc_signatures(df, n=3).collect()}
    assert rows[1].bands is None and rows[1].shingle_hashes is None
    assert rows[1].digest is not None
    assert len(rows[2].bands) == 64 and len(rows[2].shingle_hashes) == 3


# ------------------------------------------------------------- window funnel
def _funnel_events(spark, rows):
    """rows: (user, seconds-offset, type) triples."""
    return spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{s:02d}", i, t) for i, (u, s, t) in enumerate(rows)],
        "user_id int, ts_s string, event_id int, event_type string",
    ).selectExpr("user_id", "cast(ts_s as timestamp) ts", "event_id", "event_type")


def test_window_funnel_depths(spark):
    from iceberg_kafka_connect_spark.operators.relational import window_funnel

    import pyspark.sql.functions as F

    e = _funnel_events(
        spark,
        [
            # u1: full ordered chain
            (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
            # u2: purchase BEFORE click — depth stops at 2
            (2, 1, "view"), (2, 2, "purchase"), (2, 3, "click"),
            # u3: click with no prior view — depth 0
            (3, 1, "click"), (3, 2, "purchase"),
            # u4: only views
            (4, 1, "view"), (4, 2, "view"),
            # u5: no step-1 match at all
            (5, 1, "error"),
        ],
    )
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            e,
            [F.col("event_type") == s for s in ("view", "click", "purchase")],
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 0}


def test_window_funnel_within_window(spark):
    from iceberg_kafka_connect_spark.operators.relational import window_funnel

    import pyspark.sql.functions as F

    e = _funnel_events(
        spark,
        [
            (1, 1, "view"), (1, 2, "click"), (1, 50, "purchase"),
            (2, 1, "view"), (2, 40, "click"),
        ],
    )
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            e,
            [F.col("event_type") == s for s in ("view", "click", "purchase")],
            within_us=10_000_000,  # 10 s of the first view
        ).collect()
    }
    # u1's purchase and u2's click fall outside the 10 s window
    assert got == {1: 2, 2: 1}


def test_window_funnel_same_ts_ordering(spark):
    """Same-timestamp events resolve by the tiebreak column: a click at
    the same ts as the view counts only if its tiebreak sorts AFTER."""
    from iceberg_kafka_connect_spark.operators.relational import window_funnel

    import pyspark.sql.functions as F

    e = _funnel_events(
        spark,
        [(1, 1, "view"), (1, 1, "click"), (2, 1, "click"), (2, 1, "view")],
    )
    # event_ids increase with list order: u1 view(0) then click(1) → 2;
    # u2 click(2) sorts before view(3) → depth 1
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            e, [F.col("event_type") == s for s in ("view", "click")]
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_window_funnel_predicate_steps(spark):
    """Steps are arbitrary predicates, not just type matches."""
    from iceberg_kafka_connect_spark.operators.relational import window_funnel

    import pyspark.sql.functions as F

    e = _funnel_events(spark, [(1, 1, "view"), (1, 2, "purchase")])
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            e,
            [
                F.col("event_type").isin("view", "click"),
                F.col("event_type") == "purchase",
            ],
        ).collect()
    }
    assert got == {1: 2}


def test_window_funnel_plan_single_exchange(spark, sf_dir):
    """The scale contract: layered running-min windows + the final
    groupBy all reuse ONE per-user hash partitioning — a 3-step funnel
    costs exactly one shuffle, not one per step and not a self-join."""
    import re

    import pyspark.sql.functions as F

    from iceberg_kafka_connect_spark.operators.relational import window_funnel
    from iceberg_kafka_connect_spark.plans.inspect import plan_string

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = window_funnel(
        e, [F.col("event_type") == s for s in ("view", "click", "purchase")]
    )
    p = plan_string(out, mode="simple")
    assert p.count("Exchange") == 1, p
    assert set(re.findall(r"hashpartitioning\((\w+)#", p)) == {"user_id"}
