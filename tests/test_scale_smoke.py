"""Scale-stress smoke: run the core operators at 10× sf0.001 via in-memory
multiplication (6x data volume through explode) and confirm plans stay sane
and results scale exactly linearly where they should.

This is the local stand-in for the 100× question: no collect-driven step,
no plan that degrades with input multiplicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators import cdc
from iceberg_kafka_connect_spark.suite.core import dsum

MULT = 10


def _amplify(df, key_col):
    """Replicate every row MULT times with distinct keys (id-space shifted)."""
    return (
        df.withColumn("__m", F.explode(F.sequence(F.lit(0), F.lit(MULT - 1))))
        .withColumn(
            key_col, F.col(key_col) + F.col("__m") * F.lit(10_000_000)
        )
        .drop("__m")
    )


@pytest.fixture(scope="module")
def lineitem_10x(spark, sf_dir):
    return _amplify(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), "l_orderkey"
    )


def test_agg_scales_linearly(spark, sf_dir, lineitem_10x):
    base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = base.agg(
        dsum(F.col("l_quantity"), 2, "q"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    big = lineitem_10x.agg(
        dsum(F.col("l_quantity"), 2, "q"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert big.n == small.n * MULT
    assert abs(big.q - small.q * MULT) < 1e-6


def test_join_agg_at_10x(spark, sf_dir, lineitem_10x):
    """orders⋈lineitem at 10× keys: row counts scale exactly; the join key
    amplification preserves the per-key fan-out."""
    orders = _amplify(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_orderkey"
    )
    joined = lineitem_10x.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    base_count = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == base_count * MULT


def test_cdc_collapse_at_10x(spark, sf_dir):
    from iceberg_kafka_connect_spark.suite.core import table

    events = _amplify(table(spark, sf_dir, "events"), "user_id")
    collapsed = cdc.collapse_last_wins(events, ["user_id"], ["ts", "event_id"])
    n_users = events.select("user_id").distinct().count()
    assert collapsed.count() == n_users


def test_span_dedup_amplified_first_occurrence_invariants(spark, sf_dir):
    """Span dedup at 10× document multiplicity: every replicated doc shares
    its spans with the original, so exactly ONE copy of each repeated span
    survives corpus-wide and total span accounting stays exact."""
    from iceberg_kafka_connect_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    amp = _amplify(docs, "doc_id")
    out = span_dedup(amp, span_words=4, min_df=2)
    agg = out.agg(
        F.sum("n_spans").alias("total"),
        F.sum("n_spans_kept").alias("kept"),
        F.count(F.lit(1)).alias("docs"),
    ).collect()[0]
    n_docs = docs.count()
    assert agg["docs"] == n_docs * MULT
    # replication multiplies spans by MULT
    base_spans = span_dedup(docs, span_words=4, min_df=2).agg(
        F.sum("n_spans").alias("t")
    ).collect()[0]["t"]
    assert agg["total"] == base_spans * MULT
    # every span occurs >= MULT times post-amplification, so survivors are
    # exactly the distinct spans of the corpus (first occurrences only)
    distinct_spans = (
        span_dedup(amp.limit(0).unionByName(amp), span_words=4, min_df=10**9)
        .agg(F.sum("n_spans").alias("t"))
        .collect()[0]["t"]
    )
    assert agg["kept"] < agg["total"]
    assert agg["kept"] <= distinct_spans


def test_global_ids_at_10x(spark, sf_dir):
    """Contiguous numbering at 10× rows: still exact, still no
    single-partition sort anywhere in the plan."""
    from iceberg_kafka_connect_spark.operators.ids import assign_global_ids
    from iceberg_kafka_connect_spark.plans import plan_string

    docs = _amplify(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
        "doc_id",
    )
    n = docs.count()
    plan_only = assign_global_ids(docs, ["doc_id"], materialize=False)
    assert "SinglePartition" not in plan_string(plan_only)
    out = assign_global_ids(docs, ["doc_id"])
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("global_id").alias("lo"),
        F.max("global_id").alias("hi"),
        F.countDistinct("global_id").alias("d"),
    ).collect()[0]
    assert (agg.n, agg.lo, agg.hi, agg.d) == (n, 1, n, n)


def test_gopher_rules_amplified_invariance(spark, sf_dir):
    """Per-doc metrics are pure projections: every replica of a doc gets
    bit-identical metrics (no cross-row interference at any volume)."""
    from iceberg_kafka_connect_spark.operators.text import (
        gopher_passes,
        gopher_rules,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    amp = docs.withColumn(
        "__m", F.explode(F.sequence(F.lit(0), F.lit(MULT - 1)))
    )
    out = (
        amp.select("doc_id", *gopher_rules(F.col("text")))
        .select("doc_id", "n_words", "alpha_word_ratio", gopher_passes(20))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("n_words", "alpha_word_ratio", "passes").alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert all(r.v == 1 and r.n == MULT for r in out)


def test_bloom_incremental_dedup_at_10x(spark, sf_dir):
    """Amplified batch vs history: output size scales exactly (each replica
    of a surviving doc survives — distinct ids, identical text means only
    the ORIGINAL partition of history digests matters) and the bloom word
    array stays fixed-size regardless of input multiplicity."""
    from iceberg_kafka_connect_spark.functions.bloom import bloom_build
    from iceberg_kafka_connect_spark.operators.dedup import (
        incremental_exact_dedup_bloom,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    history = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    small_n = incremental_exact_dedup_bloom(batch, history).count()
    big_batch = _amplify(batch, "doc_id")
    big_n = incremental_exact_dedup_bloom(big_batch, history).count()
    assert big_n == small_n * MULT
    # bloom size is input-independent
    w1 = bloom_build(history.select(F.md5("text").alias("d")), "d", 1 << 12, 3)
    w2 = bloom_build(
        _amplify(history, "doc_id").select(F.md5("text").alias("d")),
        "d", 1 << 12, 3,
    )
    assert len(w1) == len(w2) == (1 << 12) // 64


def test_incremental_agg_refresh_at_10x(spark):
    """The refresh result is invariant to how large the UNTOUCHED portion
    of the images is — the delta only sees touched keys."""
    from iceberg_kafka_connect_spark.operators.incremental import (
        aggregate_state,
        incremental_agg_refresh,
    )

    rows = [(i, "g" + str(i % 3), i) for i in range(200)]
    pre = spark.createDataFrame(rows, "k long, g string, v long")
    pre_big = _amplify(pre, "k")
    post_big = pre_big.unionByName(
        spark.createDataFrame([(999_999_999, "gX", 7)], "k long, g string, v long")
    )
    got = incremental_agg_refresh(
        aggregate_state(pre_big, ["g"], ["v"]),
        pre_big, post_big,
        spark.createDataFrame([(999_999_999,)], "k long"),
        ["k"], ["g"], ["v"],
    )
    want = aggregate_state(post_big, ["g"], ["v"])
    assert sorted(got.collect()) == sorted(want.collect())


def test_phash_groups_at_10x(spark, sf_dir):
    """Same payloads under 10x distinct ids: group COUNT is unchanged (the
    hash space doesn't fragment) and every group is exactly 10x wider."""
    from iceberg_kafka_connect_spark.operators.multimodal import phash_groups

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(100)
        .withColumn("payload", F.encode(F.col("text"), "utf-8"))
    )
    small = {
        r["phash"]: r["n_imgs"]
        for r in phash_groups(docs, use_fake=True, threshold=1 / 8).collect()
    }
    big = {
        r["phash"]: r["n_imgs"]
        for r in phash_groups(
            _amplify(docs, "doc_id"), use_fake=True, threshold=1 / 8
        ).collect()
    }
    assert set(big) == set(small)
    assert all(big[h] == n * MULT for h, n in small.items())


def test_topk_per_group_at_10x(spark, sf_dir):
    """10× docs per domain: top-K output size is invariant (K per group),
    and per-task state stays bounded (the two-level agg, not a window)."""
    from iceberg_kafka_connect_spark.operators.topk import topk_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars", F.col("source").alias("domain")
    )
    big = _amplify(docs, "doc_id")
    small_out = topk_per_group(
        docs, ["domain"], [("n_chars", "desc"), ("doc_id", "asc")], 5
    )
    big_out = topk_per_group(
        big, ["domain"], [("n_chars", "desc"), ("doc_id", "asc")], 5
    )
    # same domains → same number of capped rows regardless of input size
    assert small_out.count() == big_out.count()


def test_frequent_items_at_10x(spark, sf_dir):
    """10× token stream at the same relative support: the SAME items
    qualify with 10× the counts (exact linearity), and MG capacity is
    unchanged (it depends on total/support, which is scale-free)."""
    from iceberg_kafka_connect_spark.operators.sketch import frequent_items

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
        "doc_id",
    )
    big_terms = _amplify(terms, "doc_id").select("term")
    terms = terms.select("term")
    n = terms.count()
    small = {
        (r.term, r.n)
        for r in frequent_items(terms, "term", max(1, n // 100), total=n)
        .collect()
    }
    big = {
        (r.term, r.n)
        for r in frequent_items(
            big_terms, "term", max(1, n * MULT // 100), total=n * MULT
        ).collect()
    }
    assert {(t, c * MULT) for t, c in small} == big


def test_incremental_analyze_scans_only_the_increment(spark, sf_dir, tmp_path):
    """The refresh cost contract: after a 10×-size base, an incremental
    ANALYZE over a tiny append reads the appended files only (row count of
    the scanned increment == appended rows, proven via the merge math)."""
    from pyspark.sql import types as T

    from iceberg_kafka_connect_spark.sinks.table import LakehouseTable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    t = LakehouseTable.create(str(tmp_path / "inc10x"), docs.schema)
    t.append(_amplify(docs, "doc_id"))
    base = t.analyze(spark, mode="approx")
    t.append(docs.limit(7).withColumn("doc_id", F.col("doc_id") + 99_000_000))
    doc = t.analyze(spark, mode="incremental")
    assert doc["row-count"] == base["row-count"] + 7
    assert doc["base-snapshot"] == base["snapshot-id"]
