"""IVF index tests: build determinism, pruning factor, recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators.ivf import IVFIndex
from iceberg_kafka_connect_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(emb):
    return IVFIndex.build(emb, nlist=8, iters=2)


def test_build_deterministic(emb, index):
    again = IVFIndex.build(emb, nlist=8, iters=2)
    assert index.centroids == again.centroids


def test_every_vector_assigned_one_cell(emb, index):
    n = emb.count()
    assert index.assigned.count() == n
    cells = index.assigned.select("cell").distinct().count()
    assert 1 < cells <= 8


def test_search_shape_and_pruning(spark, emb, index):
    queries = emb.filter(F.col("vec_id") < 10)
    out = index.search(queries, k=5, nprobe=2)
    rows = out.collect()
    assert len(rows) == 10 * 5
    assert {(r.query_id, r.rank) for r in rows} == {
        (q, r) for q in range(10) for r in range(1, 6)
    }


def test_recall_vs_bruteforce(spark, emb, index):
    """nprobe=all cells ⇒ exhaustive ⇒ identical neighbor ids to brute
    force; nprobe=4/8 keeps recall reasonable on random data."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in index.search(queries, k=5, nprobe=8).collect()
    }
    assert full == exact  # all cells probed = exhaustive
    probed = {
        (r.query_id, r.neighbor_id)
        for r in index.search(queries, k=5, nprobe=4).collect()
    }
    recall = len(probed & exact) / len(exact)
    assert recall >= 0.4, f"IVF nprobe=4 recall too low: {recall}"


def test_high_dim_build_and_search(spark):
    """Production embedding sizes: dim=512 build+search must work and stay
    fast — the assignment/probe path is an Arrow-batched GEMM, not an
    O(nlist×dim) Catalyst expression tree (which stops compiling here)."""
    import time

    import numpy as np

    dim, n = 512, 400
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((n, dim)).astype(float)
    pdf = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    emb512 = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    t0 = time.time()
    idx = IVFIndex.build(emb512, nlist=16, iters=2)
    build_s = time.time() - t0
    assert len(idx.centroids) == 16
    assert all(len(v) == dim for _, v in idx.centroids)
    queries = emb512.filter(F.col("vec_id") < 5)
    out = idx.search(queries, k=3, nprobe=16)
    rows = out.collect()
    assert len(rows) == 5 * 3
    # exhaustive probe ⇒ identical to brute force at dim 512 too
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, emb512, k=3).collect()
    }
    assert {(r.query_id, r.neighbor_id) for r in rows} == exact
    assert build_s < 120, f"build too slow: {build_s:.1f}s"
