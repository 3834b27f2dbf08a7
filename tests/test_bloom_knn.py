"""Unit tests for the distributed Bloom filter (functions/bloom.py), the
Bloom-prefiltered incremental exact dedup, and the block-pair exact k-NN
graph (operators/similarity.py::knn_graph_blocked)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.functions.bloom import (
    bloom_build,
    bloom_contains,
)
from iceberg_kafka_connect_spark.operators import similarity
from iceberg_kafka_connect_spark.operators.dedup import (
    exact_dedup,
    incremental_exact_dedup_bloom,
)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    words = bloom_build(keys, "k", num_bits=1 << 14, num_hashes=5)
    hits = keys.filter(bloom_contains(F.col("k"), words, 5)).count()
    assert hits == 500  # every inserted key MUST probe positive


def test_bloom_false_positive_rate_bounded(spark):
    keys = spark.range(0, 500).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    words = bloom_build(keys, "k", num_bits=1 << 14, num_hashes=5)
    probe = spark.range(10_000, 15_000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    fp = probe.filter(bloom_contains(F.col("k"), words, 5)).count()
    # m/n = 32.8 bits/key, k=5 → theoretical fp ~ 1e-4; allow a wide margin
    assert fp < 50


def test_bloom_word_bound(spark):
    """Filter size is num_bits/64 words regardless of input size."""
    keys = spark.range(0, 5_000).select(F.col("id").cast("string").alias("k"))
    words = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=3)
    assert len(words) == (1 << 12) // 64


def test_incremental_bloom_matches_plain_anti_join(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    history = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    got = {
        r["doc_id"]
        for r in incremental_exact_dedup_bloom(batch, history).collect()
    }
    # oracle: plain digest anti-join (no bloom)
    dg = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    want = {
        r["doc_id"]
        for r in batch.select("doc_id", dg.alias("d"))
        .join(history.select(dg.alias("d")).distinct(), "d", "left_anti")
        .collect()
    }
    assert got == want


def test_incremental_bloom_tiny_filter_still_exact(spark):
    """Even with a saturated (tiny) filter — everything probes positive —
    output stays bit-identical: the anti-join catches all false positives."""
    history = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, f"doc {i % 60}") for i in range(60)],
        "doc_id long, text string",
    )
    out = incremental_exact_dedup_bloom(
        batch, history, num_bits=64, num_hashes=2
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # docs 0..49 exist in history → batch rows with i%60 < 50 drop
    assert got == sorted(100 + i for i in range(60) if i % 60 >= 50)


def _rand_emb(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_knn_graph_matches_exact_numpy(spark):
    emb = _rand_emb(spark)
    out = similarity.knn_graph_blocked(emb, k=3, num_blocks=4).collect()
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
        )
    assert set(got) == {r["vec_id"] for r in rows}
    for q, triples in got.items():
        triples.sort()
        # ties: score desc then neighbor id asc — same rule as the operator
        order = sorted(
            range(len(rows)), key=lambda j: (-sims[q, j], j)
        )[:3]
        assert [t[1] for t in triples] == order
        for t, j in zip(triples, order):
            assert abs(t[2] - sims[q, j]) < 1e-9


def test_knn_graph_block_count_invariance(spark):
    emb = _rand_emb(spark, n=30, seed=11)
    a = similarity.knn_graph_blocked(emb, k=4, num_blocks=2)
    b = similarity.knn_graph_blocked(emb, k=4, num_blocks=7)
    ka = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in a.collect())
    kb = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in b.collect())
    assert ka == kb


def test_knn_graph_excludes_self(spark):
    emb = _rand_emb(spark, n=12, seed=3)
    out = similarity.knn_graph_blocked(emb, k=5, num_blocks=3).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_cosine_fast_unroll_cap_matches_fold(spark):
    """Above _UNROLL_MAX_DIM the fast cosine must take the fold path (the
    unrolled Add chain stops compiling around 256 terms and can fatally
    overflow codegen's recursion) and stay bit-identical to the fold."""
    from iceberg_kafka_connect_spark.functions.vector import (
        _UNROLL_MAX_DIM,
        cosine_with_norms,
        cosine_with_norms_fast,
        norm2,
    )

    rng = np.random.default_rng(7)
    for dim in (_UNROLL_MAX_DIM, _UNROLL_MAX_DIM + 1, 512):
        rows = [
            (
                [float(x) for x in rng.standard_normal(dim)],
                [float(x) for x in rng.standard_normal(dim)],
            )
            for _ in range(20)
        ]
        df = spark.createDataFrame(rows, "a array<double>, b array<double>").select(
            "a", "b", norm2(F.col("a")).alias("na"), norm2(F.col("b")).alias("nb")
        )
        got = [
            r.c
            for r in df.select(
                cosine_with_norms_fast("a", "b", F.col("na"), F.col("nb"), dim).alias("c")
            ).collect()
        ]
        want = [
            r.c
            for r in df.select(
                cosine_with_norms(
                    F.col("a"), F.col("b"), F.col("na"), F.col("nb")
                ).alias("c")
            ).collect()
        ]
        assert got == want  # exact — both are the same left-fold doubles
