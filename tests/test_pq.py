"""Product quantization: compression shape, determinism, and ADC recall
vs exact brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators import similarity
from iceberg_kafka_connect_spark.operators.pq import PQIndex, _train_codebooks


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(emb):
    return PQIndex.build(emb, m=8, nbits=8, iters=5)


def test_codes_shape_and_range(index, emb):
    rows = index.codes.collect()
    assert len(rows) == emb.count()
    m, k, _ = index.codebooks.shape
    for r in rows[:50]:
        assert len(r.code) == m
        assert all(0 <= c < k for c in r.code)


def test_train_deterministic():
    rng = np.random.RandomState(7)
    sample = rng.randn(512, 64)
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    a = _train_codebooks(sample, m=8, k=16, iters=3)
    b = _train_codebooks(sample.copy(), m=8, k=16, iters=3)
    assert np.array_equal(a, b)


def test_adc_recall_vs_exact(spark, emb, index):
    """Flat-PQ recall@10 against exact cosine top-10 — quantization loses
    some neighbors but must keep the majority, and self-matches are
    excluded like every other ANN operator here."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(queries, emb, k=10).collect()
    approx = index.search(queries, k=10).collect()
    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets: dict[int, set] = {}
    for r in approx:
        assert r.query_id != r.neighbor_id
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx_sets) == set(exact_sets)
    hits = sum(
        len(exact_sets[q] & approx_sets[q]) for q in exact_sets
    )
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.5, f"PQ recall@10 too low: {recall:.2f}"


def test_adc_scores_approximate_cosine(spark, emb, index):
    """ADC score = Σ subvector·codeword ≈ the true cosine: for the returned
    pairs the absolute error is bounded by quantization, not noise."""
    queries = emb.filter(F.col("vec_id") < 5)
    approx = index.search(queries, k=5)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.filter(F.col("vec_id") < 600).collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    errs = []
    for r in approx.collect():
        if r.neighbor_id in vecs:
            errs.append(
                abs(r.pq_score - cos(vecs[r.query_id], vecs[r.neighbor_id]))
            )
    assert errs and float(np.mean(errs)) < 0.15


def test_compression_stats(index):
    stats = index.compression_stats(dim=64)
    assert stats["bytes_coded"] == 8
    assert stats["ratio"] == 32.0
