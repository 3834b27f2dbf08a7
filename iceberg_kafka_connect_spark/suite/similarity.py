"""Similarity-search queries over the `embeddings` table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import sql_cosine
from ..operators import similarity
from . import register
from .core import davg, dsum, table


# --------------------------------------------------------------------------
# Exact brute-force cosine top-k (the correctness baseline). Query set =
# vec_id < 20; broadcast; ties broken by neighbor id on both sides.
# --------------------------------------------------------------------------
@register(
    "ann_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_cosine('q.embedding', 'c.embedding')} AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_cosine('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def ann_topk_bruteforce(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.70x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    emb = table(spark, sf_dir, "embeddings", fan=False)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.brute_force_topk(queries, emb, k=5)


# --------------------------------------------------------------------------
# IVF-style partition-pruned top-k: only corpus rows in the query's cell
# (the `label` column stands in for the IVF assignment) are scored — the
# 100 TB path, scanning nprobe/nlist of the corpus.
# --------------------------------------------------------------------------
@register(
    "ann_topk_ivf",
    oracle=f"""
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {sql_cosine('q.embedding', 'c.embedding')} AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_cosine('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM embeddings q JOIN embeddings c ON q.label = c.label
        WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def ann_topk_ivf(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.41x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    emb = table(spark, sf_dir, "embeddings", fan=False)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.partitioned_topk(queries, emb, k=5, part_col="label")


# --------------------------------------------------------------------------
# Random-hyperplane LSH near-neighbor pairs, exact-cosine verified.
# Verified output ⊆ exact pairs; recall depends on band shape → rows-only
# check here, recall asserted in pytest against the exact pair set.
# --------------------------------------------------------------------------
@register("ann_srp_lsh_pairs", oracle=None, tags=("similarity",))
def ann_srp_lsh_pairs(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    # r=8 → 256 buckets per band: the rows-per-band must scale with
    # log(corpus) or buckets saturate (r=4 gives 16 buckets — at n=2000
    # EVERY bucket holds ~n/16 ids and candidates go quadratic: ~40% of all
    # pairs). At r=8 a random pair (cos≈0, p=1/2) passes a band at 2^-8, so
    # candidates ≈ n²·bands/256 — linear-ish in n for bands ∝ log n — while
    # banding over 16 bands keeps usable recall near the threshold.
    # max_bucket caps pathological buckets (10× the n/256 expected width).
    return similarity.srp_lsh_pairs(
        emb, threshold=0.35, num_bits=128, bands=16, dim=64, max_bucket=256
    )


# --------------------------------------------------------------------------
# True IVF: deterministic k-means centroids + nprobe cell search — the
# 100 TB path (scan fraction ≈ nprobe/nlist). Scores use a different (but
# equivalent) normalized-dot formulation → rows-only here; pytest proves
# nprobe=nlist reproduces brute force exactly (tests/test_ivf.py).
# --------------------------------------------------------------------------
@register("ann_topk_ivf_kmeans", oracle=None, tags=("similarity",))
def ann_topk_ivf_kmeans(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.63x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators.ivf import IVFIndex

    emb = table(spark, sf_dir, "embeddings", fan=False)
    index = IVFIndex.build(emb, nlist=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 20)
    return index.search(queries, k=5, nprobe=4)


# --------------------------------------------------------------------------
# Blocked-numpy brute force (mapInPandas + GEMM): the throughput variant.
# Scores come from float matmul (summation order differs from a SQL fold
# in the last ulp), so the gate checks the integer columns — ids + rank,
# with the SAME tie rule (score desc, neighbor id asc) on both sides; the
# float scores themselves are pytest-checked against the exact fold.
# --------------------------------------------------------------------------
@register(
    "ann_topk_numpy",
    oracle=f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_cosine('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def ann_topk_numpy(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.66x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    emb = table(spark, sf_dir, "embeddings", fan=False)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.brute_force_topk_numpy(queries, emb, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


# --------------------------------------------------------------------------
# Embedding normalize + int8 quantize, position-exploded so every produced
# double/int is value-checked. All arithmetic is exactly IEEE-reproducible
# (sequential fold mirrored by DuckDB list_reduce, floor(x+0.5) instead of
# engine-dependent round) — zero shuffles at any scale.
# --------------------------------------------------------------------------
@register(
    "embedding_quantize",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               sqrt(list_reduce(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b)) AS nrm,
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) AS amax
        FROM embeddings
    ),
    sc AS (
        SELECT vec_id, embedding, nrm,
               CASE WHEN amax > 0 THEN CAST(127 AS DOUBLE) / amax
                    ELSE CAST(1 AS DOUBLE) END AS scl
        FROM s
    )
    SELECT vec_id,
           unnest(list_transform(embedding,
                                 (x, i) -> CAST(i - 1 AS INT))) AS pos,
           unnest(list_transform(embedding,
               (x, i) -> CASE WHEN nrm > 0
                              THEN CAST(x AS DOUBLE) / nrm
                              ELSE CAST(0 AS DOUBLE) END)) AS nval,
           unnest(list_transform(embedding,
               (x, i) -> CAST(greatest(-127, least(127,
                   CAST(floor(CAST(x AS DOUBLE) * scl + CAST(0.5 AS DOUBLE))
                        AS BIGINT))) AS INT))) AS qval
    FROM sc
    """,
    tags=("similarity",),
)
def embedding_quantize(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q = similarity.quantize_int8(emb)
    return q.select(
        "vec_id", F.posexplode(F.arrays_zip("nvec", "qvec"))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("col.nvec").alias("nval"),
        F.col("col.qvec").alias("qval"),
    )


# --------------------------------------------------------------------------
# Distributed PCA (operators/pca.py): fit is a moment-matrix reduce (no
# eigendecomposition in SQL → rows-only gate entry; tests/test_pca.py pins
# the math against single-node numpy PCA, including exact eigenvalue
# agreement). The query projects every embedding onto the top-4 components
# and reports per-component projected variance = the explained variance.
# --------------------------------------------------------------------------
@register("embedding_pca", oracle=None, tags=("similarity",))
def embedding_pca(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.76x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators import pca

    emb = table(spark, sf_dir, "embeddings", fan=False)
    model = pca.pca_fit(emb, k=4)
    proj = pca.pca_project(emb, model)
    return (
        proj.select(F.posexplode("pca").alias("component", "value"))
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.var_samp("value"), 6).alias("projected_variance"),
        )
        .orderBy("component")
    )


# --------------------------------------------------------------------------
# Product quantization (operators/pq.py): sample-trained per-subspace
# codebooks, distributed encode (m bytes/vector), asymmetric-distance
# top-k. Codebook contents aren't SQL-expressible → rows-only gate entry;
# tests/test_pq.py pins determinism, code range, ADC-vs-cosine error, and
# recall@10 against exact brute force.
# --------------------------------------------------------------------------
@register("ann_topk_pq", oracle=None, tags=("similarity",))
def ann_topk_pq(spark, sf_dir):
    from ..operators.pq import PQIndex

    emb = table(spark, sf_dir, "embeddings")
    index = PQIndex.build(emb, m=8, nbits=8, iters=4)
    queries = emb.filter(F.col("vec_id") < 50)
    return index.search(queries, k=10)


# --------------------------------------------------------------------------
# Exact k-NN GRAPH (every vector is a query — no broadcastable small side):
# block-pair GEMM, B² float64 matmul tasks, per-pair partial top-k, one
# global window. Output restricted to the integer columns (ids + rank);
# the float64-GEMM score itself is checked against the exact fold in
# pytest, not hashed by the gate (summation order differs in the last ulp).
# --------------------------------------------------------------------------
@register(
    "ann_knn_graph",
    oracle=f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_cosine('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def ann_knn_graph(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return similarity.knn_graph_blocked(emb, k=5, num_blocks=8).select(
        "query_id", "neighbor_id", "rank"
    )


# --------------------------------------------------------------------------
# Centroid-outlier detection (CLIP-filtering shape): per-vector cosine to
# its label's centroid, decimal-exact so the keep/drop decision (< 0.5)
# hash-checks end to end. Output per label: counts + an order-insensitive
# id checksum of the flagged outliers + the mean similarity.
# --------------------------------------------------------------------------
@register(
    "embedding_outliers",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label,
               CAST(unnest(embedding) AS DOUBLE) AS val,
               CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos
        FROM embeddings
    ),
    cent AS (
        SELECT label, pos,
               (CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS c
        FROM ex GROUP BY label, pos
    ),
    per AS (
        SELECT e.vec_id, e.label,
               CAST(SUM(CAST((e.val * c.c) AS DECIMAL(27,12))) AS DOUBLE) AS dot,
               CAST(SUM(CAST((e.val * e.val) AS DECIMAL(27,12))) AS DOUBLE) AS nv,
               CAST(SUM(CAST((c.c * c.c) AS DECIMAL(27,12))) AS DOUBLE) AS nc
        FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
        GROUP BY e.vec_id, e.label
    ),
    cos AS (
        SELECT vec_id, label, dot / sqrt(nv * nc) AS cc FROM per
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN cc < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           CAST(SUM(CASE WHEN cc < 0.5 THEN vec_id ELSE 0 END) AS BIGINT)
               AS sum_outlier_ids,
           ROUND(CAST(SUM(CAST(cc AS DECIMAL(27,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_cos
    FROM cos GROUP BY label ORDER BY label
    """,
    tags=("similarity", "curation"),
)
def embedding_outliers(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    cc = similarity.centroid_similarity(emb)
    is_out = F.col("centroid_cos") < 0.5
    return (
        cc.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias(
                "n_outliers"
            ),
            F.sum(F.when(is_out, F.col("vec_id")).otherwise(0))
            .cast("bigint")
            .alias("sum_outlier_ids"),
            F.round(davg(F.col("centroid_cos"), 12), 6).alias("mean_cos"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Per-dimension embedding audit (training-data QA: dead dimensions,
# mis-scaled features, normalization drift): mean/variance/min/max per
# vector position, decimal-exact. One explode + one groupBy(pos) with
# map-side combine — dim rows out.
# --------------------------------------------------------------------------
@register(
    "embedding_dim_stats",
    oracle="""
    WITH ex AS (
        SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    )
    SELECT pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_val,
           ROUND(CAST(SUM(CAST((val * val) AS DECIMAL(27,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE)
                 - (CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) ** 2, 6) AS var_val,
           ROUND(MIN(val), 6) AS min_val,
           ROUND(MAX(val), 6) AS max_val
    FROM ex GROUP BY pos ORDER BY pos
    """,
    tags=("similarity", "curation"),
)
def embedding_dim_stats(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.78x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    emb = table(spark, sf_dir, "embeddings", fan=False)
    ex = emb.select(
        F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    n = F.count(F.lit(1)).cast("bigint")
    mean = davg(F.col("val"), 12)
    msq = davg(F.col("val") * F.col("val"), 12)
    return (
        ex.groupBy("pos")
        .agg(
            n.alias("n"),
            F.round(mean, 6).alias("mean_val"),
            F.round(msq - mean * mean, 6).alias("var_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
        .orderBy("pos")
    )


# --------------------------------------------------------------------------
# Matryoshka truncation audit (MRL, arXiv:2205.13147): how much of each
# vector's energy the 16-of-64 prefix retains, per label — the measurement
# that decides which serving dimension an MRL embedding column can afford.
# Decimal-exact sums so the per-label means hash-check; the production
# truncation itself (slice + aggregate fold + renorm, zero shuffles) is
# operators/similarity.truncate_renorm, pinned by pytest.
# --------------------------------------------------------------------------
@register(
    "embedding_mrl_energy",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label,
               CAST(unnest(embedding) AS DOUBLE) AS val,
               CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos
        FROM embeddings
    ),
    per AS (
        SELECT vec_id, label,
               CAST(SUM(CASE WHEN pos < 16
                   THEN CAST((val * val) AS DECIMAL(27,12))
                   ELSE CAST(0 AS DECIMAL(27,12)) END) AS DOUBLE) AS pn,
               CAST(SUM(CAST((val * val) AS DECIMAL(27,12))) AS DOUBLE) AS fn
        FROM ex GROUP BY vec_id, label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(CAST((pn / fn) AS DECIMAL(27,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_retained,
           CAST(SUM(CASE WHEN pn / fn < 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_energy
    FROM per GROUP BY label ORDER BY label
    """,
    tags=("similarity", "curation"),
)
def embedding_mrl_energy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    dec = "decimal(27,12)"
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id", "label", "pos", F.col("val").cast("double").alias("val")
    )
    per = ex.groupBy("vec_id", "label").agg(
        F.sum(
            F.when(
                F.col("pos") < 16, (F.col("val") * F.col("val")).cast(dec)
            ).otherwise(F.lit(0).cast(dec))
        ).cast("double").alias("pn"),
        F.sum((F.col("val") * F.col("val")).cast(dec)).cast("double").alias(
            "fn"
        ),
    )
    ratio = F.col("pn") / F.col("fn")
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum(ratio.cast(dec)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_retained"),
            F.sum(F.when(ratio < 0.2, 1).otherwise(0)).cast("bigint").alias(
                "n_low_energy"
            ),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# X105: MMR diversified re-ranking (Carbonell & Goldstein SIGIR'98) after
# an exact top-30 candidate fetch: per query, greedily pick 10 trading
# relevance against redundancy. The greedy chain is sequential per query
# (no SQL twin -> rows-only; pinned agreement test against a pure-Python
# reference in test_rows_only_agreement.py), queries parallelize as
# applyInPandas groups over the bounded candidate sets.
# --------------------------------------------------------------------------
@register("docs_mmr_rerank", oracle=None, tags=("similarity", "retrieval"))
def docs_mmr_rerank(spark, sf_dir):
    from ..operators.retrieval import mmr_rerank

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    cand = similarity.brute_force_topk(queries, emb, k=30).join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), "embedding"
        ),
        "neighbor_id",
    )
    return mmr_rerank(
        cand, k=10, lam=0.7, score_col="cos_sim"
    ).orderBy("query_id", "rank")
