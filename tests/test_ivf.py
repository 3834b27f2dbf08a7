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
