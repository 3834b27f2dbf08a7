"""Distributed PCA: orthonormality, variance ordering, reconstruction, and
agreement with a single-node numpy PCA on the same data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators.pca import (
    pca_fit,
    pca_project,
    pca_variance_df,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # anisotropic data: variance concentrated in a few directions
    basis = rng.normal(size=(8, 8))
    scales = np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.2, 0.1, 0.05])
    x = rng.normal(size=(2000, 8)) * scales @ basis
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(8)


def test_components_orthonormal_and_variance_descending(emb):
    m = pca_fit(emb, k=4)
    gram = m.components @ m.components.T
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    ev = m.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))


def test_matches_single_node_numpy_pca(emb):
    m = pca_fit(emb, k=3)
    x = np.array([r.embedding for r in emb.orderBy("vec_id").collect()])
    cov = np.cov(x, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    ref = vecs[:, np.argsort(vals)[::-1][:3]].T
    for i in range(3):
        # eigenvectors match up to sign
        dot = abs(float(np.dot(m.components[i], ref[i])))
        assert dot > 1 - 1e-8, (i, dot)
    assert np.allclose(m.explained_variance, np.sort(vals)[::-1][:3])


def test_projection_variance_equals_eigenvalues(emb):
    m = pca_fit(emb, k=3)
    proj = pca_project(emb, m)
    p = np.array([r.pca for r in proj.collect()])
    assert np.allclose(p.var(axis=0, ddof=1), m.explained_variance, rtol=1e-6)


def test_projection_passes_through_columns(emb):
    m = pca_fit(emb, k=2)
    out = pca_project(emb, m)
    assert out.columns == ["vec_id", "embedding", "pca"]
    assert out.count() == emb.count()
    assert len(out.first().pca) == 2


def test_full_rank_reconstruction(emb):
    """k=dim: projecting then un-projecting recovers the data exactly."""
    m = pca_fit(emb, k=8)
    rows = pca_project(emb, m).orderBy("vec_id").limit(50).collect()
    for r in rows:
        rec = np.asarray(r.pca) @ m.components + m.mean
        assert np.allclose(rec, np.asarray(r.embedding), atol=1e-8)


def test_deterministic_across_runs(emb):
    a, b = pca_fit(emb, k=3), pca_fit(emb, k=3)
    assert np.array_equal(a.components, b.components)
    assert np.array_equal(a.mean, b.mean)


def test_variance_df_cumulative(emb, spark):
    # k < dim: the model discards variance, and the ratio must say so
    # (denominator is trace(cov), not the kept top-k sum)
    m4 = pca_fit(emb, k=4)
    rows = pca_variance_df(emb, m4).collect()
    assert [r.component for r in rows] == [0, 1, 2, 3]
    ratios = [r.cumulative_ratio for r in rows]
    assert ratios == sorted(ratios)
    assert ratios[-1] < 1.0
    assert ratios[-1] == pytest.approx(
        float(m4.explained_variance.sum()) / m4.total_variance
    )
    # full-rank model explains everything
    m8 = pca_fit(emb, k=8)
    assert pca_variance_df(emb, m8).collect()[-1].cumulative_ratio == (
        pytest.approx(1.0)
    )
