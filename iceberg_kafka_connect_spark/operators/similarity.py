"""Similarity search over embedding columns (array<float>).

Three strategies:

- brute_force_topk: exact cosine top-k. The query set is broadcast (it's
  small by definition); the corpus streams through one scan with a per-pair
  Catalyst cosine — no shuffle until the final per-query top-k, which is a
  window over (query, score) pairs of size |Q|·k.
- partitioned_topk ("IVF-style"): search only corpus partitions matching the
  query's partition key (a precomputed cluster/label assignment). This is the
  scale path: partition pruning cuts the scanned fraction to nprobe/nlist.
- srp_lsh_pairs: signed-random-projection LSH for near-dup pairs at corpus
  scale: sign-bit signatures via deterministic hyperplanes, banded exactly
  like MinHash, verified with exact cosine.

A numpy/Arrow blocked brute-force (`brute_force_topk_numpy`) is provided for
raw throughput: mapInPandas with a broadcast query matrix — each Arrow batch
is one BLAS matmul instead of 64-element folds per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import (
    cosine,
    cosine_with_norms,
    cosine_with_norms_fast,
    infer_dim,
    norm2,
)
from .dedup import banded_pairs


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Deterministic: ties broken by neighbor id. Self-matches excluded.
    """
    dim = infer_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm2(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm2(F.col(vec_col)).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_with_norms_fast(
                "qv", "cv", F.col("qn"), F.col("cn"), dim
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def partitioned_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    part_col: str = "label",
) -> DataFrame:
    """IVF-style pruned search: only corpus rows whose partition key matches
    the query's are scored. With a real IVF, ``part_col`` is the assigned
    centroid id (possibly exploded to nprobe cells); here the precomputed
    assignment column plays that role. The equality join on the partition key
    IS the inverted-list lookup — Spark prunes everything else."""
    dim = infer_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm2(F.col(vec_col)).alias("qn"),
        F.col(part_col).alias("part"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm2(F.col(vec_col)).alias("cn"),
        F.col(part_col).alias("part"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "part")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_with_norms_fast(
                "qv", "cv", F.col("qn"), F.col("cn"), dim
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter_margin: float = 1e-6,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Exact all-pairs cosine near-duplicates (id_a < id_b). Quadratic —
    correct at verification scale; use srp_lsh_pairs at corpus scale.

    ``max_rows`` bounds the driver collect (the embedding matrix is
    gathered and broadcast for the GEMM prefilter — 1M × 768-dim float64
    ≈ 6 GiB, the sensible ceiling for a default driver). A larger input
    raises instead of OOMing the driver; raise the bound explicitly or
    switch to ``srp_lsh_pairs``, the corpus-scale sibling that banding
    keeps linear. ``id_col`` must be integer-typed (the prefilter packs
    ids into an int64 vector).

    Two phases, same exact results as the naive cross join:

    1. **GEMM prefilter.** The normalized matrix broadcasts once; each
       Arrow batch computes ``batch @ allᵀ`` in numpy and keeps pairs
       with ``cos ≥ threshold − prefilter_margin``. The margin (1e-6 ≫
       the ~1e-12 float divergence between numpy's pairwise summation
       and a sequential fold) makes the prefilter a strict superset of
       the exact answer — same candidates-then-verify shape as the LSH
       operators.
    2. **Exact verify.** Only the candidates evaluate the sequential
       left-fold cosine (``cosine_with_norms``) that the DuckDB oracle
       mirrors bit-identically, and that exact value decides inclusion
       and is what's returned.

    So the O(n²·dim) work runs as BLAS instead of an interpreted
    per-element fold in the join condition, and bit-exact engine parity
    is untouched."""
    import numpy as np  # noqa: PLC0415

    # limit(max_rows+1).count() answers "more than max_rows?" while
    # scanning at most max_rows+1 rows — no second full pass over a
    # possibly-expensive upstream plan
    if emb.select(id_col).limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"cosine_pairs collects the embedding matrix to the driver "
            f"(input exceeds max_rows={max_rows}); use srp_lsh_pairs "
            f"at corpus scale, or pass a larger max_rows if the driver "
            f"can hold the matrix"
        )
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    if len(rows) == 0:
        return (
            emb.select(
                F.col(id_col).alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0.0).alias("cos_sim"),
            ).limit(0)
        )
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0  # zero vectors can't reach any threshold > 0
    normed = mat / norms[:, None]
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((ids, normed))
    cut = threshold - prefilter_margin

    def _candidates(batches):
        import pandas as pd  # noqa: PLC0415

        all_ids, all_normed = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            bm = np.array(list(pdf[vec_col]), dtype=np.float64)
            bn = np.linalg.norm(bm, axis=1)
            bn[bn == 0] = 1.0
            sims = (bm / bn[:, None]) @ all_normed.T
            ii, jj = np.nonzero(sims >= cut)
            a, b = bids[ii], all_ids[jj]
            keep = a < b
            yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    cand = emb.select(id_col, vec_col).mapInPandas(
        _candidates, "id_a long, id_b long"
    )
    dim = int(mat.shape[1]) if mat.ndim == 2 and mat.shape[1] else None
    va = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm2(F.col(vec_col)).alias("na"),
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm2(F.col(vec_col)).alias("nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_with_norms_fast(
                "va", "vb", F.col("na"), F.col("nb"), dim
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


_SRP_SEED = 0x5B9  # deterministic hyperplanes: fixed seed, no stored model


def _srp_buckets(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, num_bits: int, bands: int
) -> DataFrame:
    """(id, band, bucket) LSH bucket assignments: sign bits of projections
    onto deterministic ±1 hyperplanes, banded into r = num_bits/bands-bit
    bucket keys.

    One Arrow-batched numpy GEMM per batch — (batch × dim) @ (dim ×
    num_bits) — replaces num_bits separate Catalyst fold expressions (a
    ~num_bits × dim expression tree whose codegen alone dominated the
    runtime at dim=64, and which grows unboundedly with dim)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    rng = np.random.default_rng(_SRP_SEED)
    planes = rng.choice([-1.0, 1.0], size=(dim, num_bits))
    bc = emb.sparkSession.sparkContext.broadcast(planes)
    r = num_bits // bands
    weights = (1 << np.arange(r)).astype(np.int64)

    def assign(batches):
        h = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (vecs @ h) >= 0  # (n, num_bits)
            # bucket key per band: the r bits as an integer
            buckets = np.stack(
                [
                    bits[:, b * r : (b + 1) * r].astype(np.int64) @ weights
                    for b in range(bands)
                ],
                axis=1,
            )  # (n, bands)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy().repeat(bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), n),
                    "bucket": buckets.ravel(),
                }
            )

    # the id column passes through untouched — declare its REAL type so
    # string/decimal ids survive the Arrow round-trip (a hardcoded `long`
    # would fail or null them)
    id_type = dict(emb.dtypes)[id_col]
    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"id {id_type}, band int, bucket long"
    )


def srp_lsh_pairs(
    emb: DataFrame,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_bits: int = 32,
    bands: int = 8,
    verify: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH near-neighbor pairs, exact-cosine verified.

    P(bit match) = 1 - θ/π; banding amplifies as usual. Candidate
    generation is ONE shuffle: bucket assignments (id, band, bucket — ids
    only, never vectors) group into per-bucket sorted id lists, the
    ``max_bucket`` cap drops pathological buckets BEFORE any pair exists,
    and the i<j pair expansion happens in-row on the grouped list (each
    in-bucket pair emitted exactly once — the previous self-join +
    separate width-count formulation cost three shuffles and materialized
    hot-bucket pairs before capping). Bucket width per band is
    2^(num_bits/bands): keep rows-per-band ≥ 4 so buckets stay narrow
    (r=2 on a large corpus puts ~|corpus|/4 ids in every bucket —
    quadratic). ``max_bucket`` is REQUIRED at corpus scale; it also bounds
    the grouped row size (a capped bucket is ≤ 8·max_bucket bytes)."""
    sc = emb.sparkSession.sparkContext
    if emb.rdd.getNumPartitions() < sc.defaultParallelism:
        # under-split scan: widen so the GEMM and the bucket grouping
        # parallelize (no-op when the scan already has enough splits)
        emb = emb.repartition(sc.defaultParallelism)
    buckets = _srp_buckets(emb, id_col, vec_col, dim, num_bits, bands)
    cand = banded_pairs(buckets, max_bucket=max_bucket)
    if not verify:
        return cand
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm2(F.col(vec_col)).alias("n"),
    )
    return (
        cand.join(
            vecs.select(
                F.col("id").alias("id_a"),
                F.col("v").alias("va"),
                F.col("n").alias("na"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("id").alias("id_b"),
                F.col("v").alias("vb"),
                F.col("n").alias("nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            cosine_with_norms_fast(
                "va", "vb", F.col("na"), F.col("nb"), dim
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def brute_force_topk_numpy(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput path: blocked matmul via mapInPandas. The (small) query
    matrix is a broadcast variable; each Arrow batch of corpus vectors is one
    numpy GEMM producing partial top-k, reduced by a final window. ~100×
    faster per pair than expression folds; use when |Q|·dim fits in executor
    memory (it does — queries are small by definition)."""
    import numpy as np  # noqa: PLC0415

    spark = queries.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows])  # id dtype preserved (object ok)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qmat))

    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"

    def score(batches):
        import pandas as pd  # noqa: PLC0415

        ids, mat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.vstack(pdf[vec_col].values).astype(np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = mat @ cmat.T  # |Q| × batch
            nb = pdf[id_col].to_numpy()  # native id dtype, incl. strings
            kk = min(k + 1, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(ids, kk),
                "neighbor_id": nb[top].ravel(),
                "cos_sim": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """L2 normalization + symmetric int8 quantization of an embedding
    column, per row, zero shuffles — the storage/bandwidth step before
    shipping vectors into an ANN index (4× smaller than float32, dot
    products survive up to the per-vector scale).

    Adds ``nrm`` (L2 norm), ``scale`` (127/max|x|), ``nvec``
    (array<double>, unit-norm copy) and ``qvec`` (array<int>, clamped
    round-half-up). Every op is exactly IEEE-reproducible across engines:
    sequential fold for the squared sum, sqrt/division/multiply (correctly
    rounded), floor(x+0.5) instead of engine-dependent round()."""
    v = F.col(vec_col)

    def xd(x: Column) -> Column:
        return x.cast("double")

    ss = F.aggregate(
        F.transform(v, lambda x: xd(x) * xd(x)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    amax = F.array_max(F.transform(v, lambda x: F.abs(xd(x))))
    out = df.withColumn("nrm", F.sqrt(ss)).withColumn(
        "scale",
        F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0)),
    )
    nvec = F.transform(
        v,
        lambda x: F.when(
            F.col("nrm") > 0, xd(x) / F.col("nrm")
        ).otherwise(F.lit(0.0)),
    )
    qvec = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127).cast("bigint"),
            F.least(
                F.lit(127).cast("bigint"),
                F.floor(xd(x) * F.col("scale") + F.lit(0.5)),
            ),
        ).cast("int"),
    )
    return out.withColumn("nvec", nvec).withColumn("qvec", qvec)


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    nlist: int = 8,
    iters: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings, then finding cosine near-duplicates only WITHIN
    each cluster and keeping one representative per near-dup group.

    Two clustering modes:

    - ``cluster_col`` given: the shard assignment is an existing column
      (a stored k-means cell, a topic label, a partition key). Fully
      deterministic and SQL-expressible — the oracle-checked path.
    - ``cluster_col`` None: k-means via :class:`IVFIndex` (deterministic
      init, ``nlist``/``iters``) assigns the cells. The real SemDeDup
      shape; approximate exactly like the paper (a near-dup pair split
      across cluster boundaries is missed — precision stays 1.0 because
      every reported pair is verified with exact cosine).

    Scale shape: the quadratic step is confined inside clusters (the whole
    point of SemDeDup — |cluster| ≈ n/nlist, so the pair join on the
    cluster key costs Σ|cluster|² ≪ n²); representative election is
    min-label propagation over the near-dup edges (O(cluster diameter)
    rounds, id-keyed shuffles only). Vectors cross the wire once for the
    cluster-keyed self-join; verdicts are one id-keyed left join.

    Output: one row per input vector — (id, cluster, kept, rep_id) where
    ``rep_id`` is the smallest id in the vector's near-dup group (itself
    when no duplicate ≥ threshold shares its cluster).
    """
    from .ivf import IVFIndex

    if cluster_col is None:
        idx = IVFIndex.build(
            emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
        )
        cells = idx.assigned.select(
            F.col("id"), F.col("cell").alias("__cluster")
        )
        base = emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
        ).join(cells, "id")
    else:
        base = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("__v"),
            F.col(cluster_col).alias("__cluster"),
        )
    base = base.persist()
    dim = infer_dim(emb, vec_col)
    # within-cluster near-dup pairs: scored on the ORIGINAL vectors (not a
    # normalized copy) so the pair set is bit-identical to an exact
    # all-pairs cosine over the same cluster
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        norm2(F.col("__v")).alias("__na"),
        F.col("__cluster").alias("__ca"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        norm2(F.col("__v")).alias("__nb"),
        F.col("__cluster").alias("__cb"),
    )
    pairs = (
        a.join(b, (F.col("__ca") == F.col("__cb")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.col("__ca"),
            cosine_with_norms_fast(
                "__va", "__vb", F.col("__na"), F.col("__nb"), dim
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    # Representative election: near-dup edges are CLUSTER-CONFINED by
    # construction (the pair join's equi-key is the cluster), so each
    # cluster's component structure is independent — one grouped
    # union-find pass replaces the iterative min-label propagation loop
    # (init + diameter rounds, one Spark job each; the semdedup graphs
    # chain up to diameter ~6 ⇒ 7 sequential jobs at gate scale). The
    # group payload is the cluster's near-dup EDGES (ids only, never
    # vectors) — bounded by the same Σ|cluster|² confinement the pair
    # join itself relies on, so if the pair join fits, the per-group
    # union-find fits. Result is identical: component = min reachable id
    # (union-by-min-root keeps every tree rooted at its minimum).
    id_type = dict(base.dtypes)["id"]

    def _group_components(pdf):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for va, vb in zip(pdf["id_a"], pdf["id_b"]):
            for v in (va, vb):
                if v not in parent:
                    parent[v] = v
            ra, rb = find(va), find(vb)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        ids = list(parent)
        return pd.DataFrame({"id": ids, "__rep": [find(i) for i in ids]})

    comp = pairs.groupBy("__ca").applyInPandas(
        _group_components, schema=f"id {id_type}, __rep {id_type}"
    )
    out = (
        base.join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("__cluster").alias("cluster"),
            (F.coalesce(F.col("__rep"), F.col("id")) == F.col("id")).alias(
                "kept"
            ),
            F.coalesce(F.col("__rep"), F.col("id")).alias("rep_id"),
        )
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out


def knn_graph_blocked(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """Exact cosine k-NN GRAPH over the whole corpus (every vector is a
    query), via block-pair GEMM — the all-pairs shape brute_force_topk
    cannot take, because there is no small side to broadcast.

    Plan shape:
      1. block assignment: id % num_blocks (no shuffle beyond the groupBy);
      2. pack each block into ONE row (sorted array<struct<id,v>>) — B rows;
      3. cross-join packed × packed → B² block pairs; each pair is one
         float64 GEMM inside mapInPandas, emitting per-query partial top-k;
      4. one window over the n·B·k partials picks the global top-k.

    Scale accounting at B blocks over n vectors: the corpus is materialized
    B+1 times (each block meets every other block) — data movement O(n·B)
    buys O(n²/B²)-sized GEMM tasks, the classic block-nested trade. Choose
    B ≈ n·dim·8 / task_budget_bytes so a block pair fits executor memory;
    at 1B × 768-dim vectors and a 1 GiB task budget that is B ≈ 6000 —
    and each packed block should then be CHUNKED into ~64 MB rows (several
    rows per block id) instead of one giant row; the single-row packing
    below is the small-corpus form. For corpora where exact all-pairs is
    not worth n²/B GEMMs, the sub-quadratic siblings are IVF
    (operators/ivf.py) and SRP-LSH (srp_lsh_pairs).

    Determinism: ids are sorted inside each packed block, scores are
    float64, ties break by neighbor id — output is run-stable. Self-matches
    excluded.

    Output: (query_id, neighbor_id, cos_sim, rank≤k).
    """
    import numpy as np  # noqa: PLC0415

    elem = F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    packed = (
        emb.select(
            F.pmod(F.col(id_col), F.lit(num_blocks)).alias("block"),
            elem.alias("s"),
        )
        .groupBy("block")
        .agg(F.array_sort(F.collect_list("s")).alias("xs"))
    )
    pairs = packed.select(
        F.col("block").alias("block_a"), F.col("xs").alias("xs_a")
    ).crossJoin(
        packed.select(F.col("block").alias("block_b"), F.col("xs").alias("xs_b"))
    )

    out_schema = "query_id long, neighbor_id long, cos_sim double"

    def kern(batches):
        import pandas as pd  # noqa: PLC0415

        def unpack(cell):
            ids = np.fromiter((e["id"] for e in cell), dtype=np.int64)
            mat = np.array([e["v"] for e in cell], dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            return ids, mat

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a, A = unpack(row.xs_a)
                ids_b, B = unpack(row.xs_b)
                sims = A @ B.T
                # exclude self-matches before the local top-k so a query
                # never wastes one of its k partial slots on itself
                if row.block_a == row.block_b:
                    np.fill_diagonal(sims, -np.inf)
                kk = min(k, sims.shape[1])
                # local top-k with the SAME tie rule as the final window
                # (score desc, then neighbor id asc): lexsort is stable and
                # keys read last-first
                order = np.lexsort(
                    (np.broadcast_to(ids_b, sims.shape), -sims), axis=1
                )[:, :kk]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(ids_a, kk),
                        "neighbor_id": ids_b[order].ravel(),
                        "cos_sim": np.take_along_axis(
                            sims, order, axis=1
                        ).ravel(),
                    }
                )

    partial = pairs.mapInPandas(kern, schema=out_schema).filter(
        ~F.col("cos_sim").eqNullSafe(float("-inf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def centroid_similarity(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 12,
) -> DataFrame:
    """Per-vector cosine similarity to its group's centroid — the
    CLIP-filtering / cluster-outlier curation signal: vectors far from
    their cluster's mean are candidate mislabels/noise to drop before
    training. Output: (id, label, centroid_cos).

    Engine-reproducible on purpose: every floating aggregation goes
    through DECIMAL (the suite's order-independence convention), so the
    resulting doubles are bit-identical across engines and the downstream
    keep/drop decision is hash-checkable.

    Scale shape: the vectors explode to (n·dim) skinny rows ONCE;
    centroids are one groupBy(label, pos) with map-side combine; the
    centroid table (labels × dim rows) broadcasts back; per-vector dot
    and norms are one groupBy(id). No whole-array shuffle anywhere.
    """
    dec = f"decimal(27,{scale})"
    ex = emb.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))

    def dsum(c):
        return F.sum(c.cast(dec)).cast("double")

    cent = ex.groupBy("lbl", "pos").agg(
        (dsum(F.col("val")) / F.count(F.lit(1)).cast("double")).alias("c")
    )
    j = ex.join(F.broadcast(cent), ["lbl", "pos"])
    per = j.groupBy("id", "lbl").agg(
        dsum(F.col("val") * F.col("c")).alias("dot"),
        dsum(F.col("val") * F.col("val")).alias("nv"),
        dsum(F.col("c") * F.col("c")).alias("nc"),
    )
    return per.select(
        F.col("id").alias(id_col),
        F.col("lbl").alias(label_col),
        (F.col("dot") / F.sqrt(F.col("nv") * F.col("nc"))).alias(
            "centroid_cos"
        ),
    )


def truncate_renorm(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Matryoshka-style embedding truncation (Kusupati et al. 2022,
    arXiv:2205.13147): keep the first ``dim`` coordinates and re-normalize
    to unit length — the storage/serving trade every MRL-trained embedding
    column is built for (store 64d, serve 16d at 4× less ANN memory).

    Pure Column expressions: ``slice`` + one ``aggregate`` fold for the
    norm, zero shuffles, zero Python — runs at scan speed over 100 TB of
    vectors. Zero-norm prefixes return NULL (no direction to keep).
    ``retained_energy`` = |prefix|²/|full|² is appended as the quality
    signal (how much of the vector's mass the prefix keeps).
    """
    out_col = out_col or vec_col
    v = F.col(vec_col)
    pre = F.slice(v, 1, dim)

    def _sq_sum(arr: Column) -> Column:
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    pn, fn = _sq_sum(pre), _sq_sum(v)
    norm = F.sqrt(pn)
    return df.withColumn(
        "retained_energy",
        F.when(fn > 0, pn / fn),
    ).withColumn(
        out_col,
        F.when(
            norm > 0,
            F.transform(pre, lambda x: x.cast("double") / norm),
        ),
    )
