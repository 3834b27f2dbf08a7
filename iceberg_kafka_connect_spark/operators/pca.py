"""Distributed PCA over an embedding column.

The standard preprocessing step before semantic dedup / clustering /
whitened-cosine retrieval (SemDeDup whitens; IVF recall improves on
decorrelated vectors). Two phases, mirroring the IVF design
(operators/ivf.py): the DATA never leaves the executors — only fixed-size
moment matrices do.

1. fit: each Arrow batch contributes (n, Σx, XᵀX) — one mapInPandas pass,
   O(dim²) floats per partition regardless of row count. Partials are
   summed on the driver (driver state = dim×dim, e.g. 8 MB at dim=1024),
   the covariance eigendecomposed with numpy, components sign-normalized
   for determinism.
2. project: the k×dim component matrix broadcasts; projection is a numpy
   GEMM per Arrow batch (same throughput shape as brute_force_topk_numpy).

At 100 TB: phase 1 is one full scan with a metadata-sized shuffle-free
reduce; phase 2 is one scan, zero shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import local_df


@dataclass
class PCAModel:
    mean: "object"  # np.ndarray (dim,)
    components: "object"  # np.ndarray (k, dim) — rows orthonormal
    explained_variance: "object"  # np.ndarray (k,) — descending
    total_variance: float = 0.0  # trace(cov): ALL variance, not just top-k

    @property
    def k(self) -> int:
        return self.components.shape[0]


def pca_fit(
    emb: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> PCAModel:
    """Fit a k-component PCA. Deterministic: moment sums are accumulated in
    float64 per partition and summed in sorted partition order; eigenvector
    signs are fixed so the largest-|coordinate| entry is positive."""
    import numpy as np  # noqa: PLC0415

    def moments(batches):
        import pandas as pd  # noqa: PLC0415

        n, s, xtx = 0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf[vec_col].values).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            xtx = x.T @ x if xtx is None else xtx + x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "xtx": [xtx.ravel().tolist()],
                }
            )

    parts = (
        emb.select(vec_col)
        .mapInPandas(moments, "n long, s array<double>, xtx array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit on an empty DataFrame")
    n = sum(p["n"] for p in parts)
    dim = len(parts[0]["s"])
    s = np.zeros(dim)
    xtx = np.zeros((dim, dim))
    # sorted accumulation: float64 addition is order-sensitive; a stable
    # order makes the model bit-reproducible across runs
    for p in sorted(parts, key=lambda p: (p["n"], p["s"])):
        s += np.asarray(p["s"])
        xtx += np.asarray(p["xtx"]).reshape(dim, dim)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, dim)
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(vals[order], 0.0),
        total_variance=float(np.trace(cov)),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = (x - mean) @ componentsᵀ. Broadcast GEMM per
    Arrow batch; all other columns pass through untouched."""
    import numpy as np  # noqa: PLC0415

    spark = df.sparkSession
    bm = spark.sparkContext.broadcast(
        (np.asarray(model.mean), np.asarray(model.components))
    )
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<double>"]
    )

    def project(batches):
        mean, comps = bm.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf[vec_col].values).astype(np.float64)
            proj = (x - mean) @ comps.T
            pdf = pdf.copy()
            pdf[out_col] = list(proj)
            yield pdf

    return df.mapInPandas(project, schema)


def pca_variance_df(emb: DataFrame, model: PCAModel) -> DataFrame:
    """Explained-variance table (component, variance, cumulative_ratio) —
    the fit diagnostic. The ratio denominator is trace(cov) (TOTAL data
    variance), so a k-component model that discards variance shows a final
    cumulative_ratio < 1 instead of misreporting completeness."""
    total = model.total_variance or 1.0
    rows, acc = [], 0.0
    for i, v in enumerate(model.explained_variance):
        acc += float(v)
        rows.append((i, float(v), acc / total))
    return local_df(emb.sparkSession, 
        rows, "component int, variance double, cumulative_ratio double"
    )
