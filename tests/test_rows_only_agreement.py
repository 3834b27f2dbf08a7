"""Pinned agreement tests for every rows-only gate entry (r5 verdict #4).

Eight registered queries have no DuckDB oracle (hash-family / numpy /
zlib semantics the SQL engine can't express bit-identically). For each,
this file runs the EXACT suite query at sf0.001 and checks it against an
independent single-node recomputation (numpy / pure Python / stdlib), so
"rows-only" is backed by value-level evidence, not just a row count —
the same standard tests/test_pca.py::test_matches_single_node_numpy_pca
set for embedding_pca. PARITY.md lists the test per entry.
"""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_kafka_connect_spark.suite import load_all

SPECS = load_all()


def _run(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir)


@pytest.fixture(scope="module")
def emb_rows(spark, sf_dir):
    """(vec_id, embedding) sorted by id, as numpy-friendly lists."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = df.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


@pytest.fixture(scope="module")
def doc_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select("doc_id", "text").orderBy("doc_id").collect()


# ---------------------------------------------------------------- helpers
def _exact_cosine(mat):
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = mat / n
    return x @ x.T


# ------------------------------------------------------ ann_srp_lsh_pairs
def test_srp_lsh_pairs_agreement(spark, sf_dir, emb_rows):
    """Full single-node replay of the SRP pipeline — the seeded ±1
    hyperplanes, sign bits, banded bucket keys, max_bucket cap, i<j
    in-bucket candidates, exact-cosine verification — must produce exactly
    the suite query's pair set, with matching cos_sim values."""
    from iceberg_kafka_connect_spark.operators.similarity import _SRP_SEED

    ids, mat = emb_rows
    dim, num_bits, bands, max_bucket, thr = 64, 128, 16, 256, 0.35
    rng = np.random.default_rng(_SRP_SEED)
    planes = rng.choice([-1.0, 1.0], size=(dim, num_bits))
    bits = (mat @ planes) >= 0
    r = num_bits // bands
    weights = (1 << np.arange(r)).astype(np.int64)
    cand = set()
    for b in range(bands):
        keys = bits[:, b * r : (b + 1) * r].astype(np.int64) @ weights
        buckets: dict[int, list[int]] = {}
        for i, key in enumerate(keys):
            buckets.setdefault(int(key), []).append(int(ids[i]))
        for members in buckets.values():
            if len(members) < 2 or len(members) > max_bucket:
                continue
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    # exact-cosine verify (same formula: dot / (||a||·||b||), raw vectors)
    pos = {int(v): i for i, v in enumerate(ids)}
    cos = _exact_cosine(mat)
    expected = {
        (a, b): cos[pos[a], pos[b]]
        for a, b in cand
        if cos[pos[a], pos[b]] >= thr
    }

    got = {
        (r_.id_a, r_.id_b): r_.cos_sim
        for r_ in _run("ann_srp_lsh_pairs", spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-9, k


# --------------------------------------------------- ann_topk_ivf_kmeans
def test_ivf_kmeans_search_agreement(spark, sf_dir, emb_rows):
    """Given the built index's centroids (a bounded driver artifact), a
    numpy replay of the distributed search — normalize, probe the nprobe
    nearest cells (ties → lower cell), score candidates in the probed
    cells, rank (score desc, id asc) — must produce the suite query's
    exact (query_id, neighbor_id, rank) rows."""
    from iceberg_kafka_connect_spark.operators.ivf import IVFIndex

    ids, mat = emb_rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index = IVFIndex.build(emb, nlist=8, iters=2)
    cmat = np.vstack(
        [np.asarray(v, dtype=np.float64) for _, v in sorted(index.centroids)]
    )
    x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cells = (x @ cmat.T).argmax(axis=1)  # first max wins = np argmax
    k, nprobe = 5, 4
    expected = set()
    qmask = ids < 20
    for qi in np.where(qmask)[0]:
        scores = x[qi] @ cmat.T
        order = np.argsort(-scores, kind="stable")[:nprobe]
        cand = [
            ci
            for ci in range(len(ids))
            if cells[ci] in set(order) and ids[ci] != ids[qi]
        ]
        sims = [(float(x[qi] @ x[ci]), int(ids[ci])) for ci in cand]
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_s, nid) in enumerate(sims[:k], 1):
            expected.add((int(ids[qi]), nid, rank))

    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in _run("ann_topk_ivf_kmeans", spark, sf_dir).collect()
    }
    assert got == expected


# ----------------------------------------------------------- ann_topk_pq
def test_pq_adc_agreement(spark, sf_dir, emb_rows):
    """Given the trained codebooks, a numpy replay of encode (nearest
    sub-centroid per subspace) + ADC scoring + rank must reproduce the
    suite query's (query_id, neighbor_id, rank) rows exactly."""
    from iceberg_kafka_connect_spark.operators.pq import PQIndex

    ids, mat = emb_rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index = PQIndex.build(emb, m=8, nbits=8, iters=4)
    books = np.asarray(index.codebooks, dtype=np.float64)  # (m, 2^nbits, d/m)
    m = books.shape[0]
    x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    d = x.shape[1]
    sub = d // m
    # encode corpus: per subspace nearest centroid by L2
    codes = np.empty((len(ids), m), dtype=np.int64)
    for j in range(m):
        seg = x[:, j * sub : (j + 1) * sub]
        d2 = ((seg[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    k = 10
    expected = set()
    for qi in np.where(ids < 50)[0]:
        # ADC: sum over subspaces of dot(query segment, neighbor's centroid)
        scores = np.zeros(len(ids))
        for j in range(m):
            lut = books[j] @ x[qi, j * sub : (j + 1) * sub]  # (2^nbits,)
            scores += lut[codes[:, j]]
        order = [
            (float(-scores[ci]), int(ids[ci]))
            for ci in range(len(ids))
            if ids[ci] != ids[qi]
        ]
        order.sort()
        for rank, (_s, nid) in enumerate(order[:k], 1):
            expected.add((int(ids[qi]), nid, rank))

    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in _run("ann_topk_pq", spark, sf_dir).collect()
    }
    assert got == expected


# --------------------------------------------------------- dedup_semdedup
def test_semdedup_agreement(spark, sf_dir, emb_rows):
    """Given the k-means cell assignment (deterministic, replayed from the
    same build), a single-node replay of SemDeDup — within-cluster exact
    cosine pairs ≥ threshold, connected components, min-id representative
    — must reproduce the suite query's (vec_id, kept, rep_id) rows."""
    from iceberg_kafka_connect_spark.operators.ivf import IVFIndex

    ids, mat = emb_rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFIndex.build(emb, nlist=8, iters=2)
    cell_of = {r.id: r.cell for r in idx.assigned.select("id", "cell").collect()}
    cos = _exact_cosine(mat)
    pos = {int(v): i for i, v in enumerate(ids)}
    # within-cluster near-dup edges on the ORIGINAL vectors
    parent = {int(v): int(v) for v in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_cell: dict[int, list[int]] = {}
    for v in ids:
        by_cell.setdefault(cell_of[int(v)], []).append(int(v))
    for members in by_cell.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if cos[pos[ms[i]], pos[ms[j]]] >= 0.4:
                    union(ms[i], ms[j])
    expected = {
        int(v): (find(int(v)) == int(v), find(int(v))) for v in ids
    }

    out = _run("dedup_semdedup", spark, sf_dir).collect()
    assert len(out) == len(ids)
    for r in out:
        kept, rep = expected[r.vec_id]
        assert (r.kept, r.rep_id) == (kept, rep), r.vec_id


# ----------------------------------------------------------- dedup_simhash
def test_simhash_agreement(spark, sf_dir):
    """Pure-Python replay of the SimHash pipeline — per-bit votes over the
    per-shingle hashes, 63-bit signature, chunk banding, exact Hamming —
    must reproduce the suite query's (id_a, id_b, hamming) rows. Only the
    xxhash64 primitive itself is taken from Spark (it has no portable
    single-node twin); everything downstream is recomputed."""
    import re

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the one Spark-side primitive: distinct word-bigram -> xxhash64
    grams = set()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    gram_of: dict[int, list[str]] = {}
    for did, text in texts.items():
        ws = re.split(r"\s+", (text or "").strip())
        gs = sorted({" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)})
        gram_of[did] = gs
        grams.update(gs)
    gdf = spark.createDataFrame([(g,) for g in sorted(grams)], "shingle string")
    h_of = {
        r.shingle: r.h
        for r in gdf.select("shingle", F.xxhash64("shingle").alias("h")).collect()
    }
    # votes -> signature (63 bits)
    sig_of = {}
    for did, gs in gram_of.items():
        if not gs:
            continue
        votes = [0] * 63
        for g in gs:
            h = h_of[g]
            for j in range(63):
                votes[j] += 1 if (h >> j) & 1 else -1
        sig = 0
        for j in range(63):
            if votes[j] > 0:
                sig |= 1 << j
        sig_of[did] = sig
    # chunk banding (16 chunks of 4 bits over the 64-bit word) + hamming
    chunks, width, max_h = 16, 4, 10
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in sig_of.items():
        for c in range(chunks):
            key = (c, (sig >> (c * width)) & ((1 << width) - 1))
            buckets.setdefault(key, []).append(did)
    expected = {}
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                ham = bin(sig_of[ms[i]] ^ sig_of[ms[j]]).count("1")
                if ham <= max_h:
                    expected[(ms[i], ms[j])] = ham

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in _run("dedup_simhash", spark, sf_dir).collect()
    }
    assert got == expected


# ------------------------------------------------- text_compression_ratio
def test_compression_ratio_agreement(spark, sf_dir, doc_rows):
    """stdlib-zlib single-node recompute of every document's raw/compressed
    byte counts and the suite query's decile aggregation — exact integer
    agreement (zlib at a fixed level is a pure function of the bytes)."""
    import zlib
    from collections import defaultdict
    from math import floor

    agg = defaultdict(lambda: [0, 0, 0])  # decile -> [n, raw, comp]
    for r in doc_rows:
        raw = (r.text or "").encode("utf-8")
        rn, cn = len(raw), len(zlib.compress(raw, 6))
        ratio = cn / max(rn, 1)
        d = agg[floor(ratio * 10)]
        d[0] += 1
        d[1] += rn
        d[2] += cn

    got = {
        r.decile: (r.n_docs, r.raw_bytes, r.zlib_bytes)
        for r in _run("text_compression_ratio", spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# -------------------------------------------- multimodal_decode_features
def test_multimodal_decode_features_agreement(spark, sf_dir, doc_rows):
    """Pure-numpy recompute of the deterministic fake decode (normalized
    byte histogram over payload % feature_dim) for every row — exact
    byte_len/feature_dim agreement and f0 to the query's 6-dp rounding
    (Spark round = HALF_UP, unlike Python's banker's round)."""
    from decimal import ROUND_HALF_UP, Decimal

    feature_dim = 8
    expected = {}
    for r in doc_rows:
        blob = (r.text or "").encode("utf-8")
        arr = np.frombuffer(blob, dtype=np.uint8)
        hist = np.bincount(arr % feature_dim, minlength=feature_dim)
        total = max(int(hist.sum()), 1)
        f0 = float(np.float32(hist[0] / total))
        f0r = float(
            Decimal(repr(f0)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        expected[r.doc_id] = (len(arr), feature_dim, f0r)

    got = {
        r.doc_id: (r.byte_len, r.feature_dim, r.f0)
        for r in _run("multimodal_decode_features", spark, sf_dir).collect()
    }
    assert got == expected


# ----------------------------------------------------------- embedding_pca
def test_embedding_pca_suite_matches_numpy_eigenvalues(spark, sf_dir, emb_rows):
    """The suite query reports per-component projected variance; numpy's
    eigenvalues of the sample covariance are the same quantity (complement
    to tests/test_pca.py, which pins the operator — this pins the
    registered query's output itself)."""
    _ids, mat = emb_rows
    vals = np.linalg.eigvalsh(np.cov(mat, rowvar=False))
    top = np.sort(vals)[::-1][:4]

    rows = _run("embedding_pca", spark, sf_dir).collect()
    assert [r.component for r in rows] == [0, 1, 2, 3]
    for r, ev in zip(rows, top):
        assert r.n == len(mat)
        assert abs(r.projected_variance - ev) < 1e-5, (r.component, ev)


# ------------------------------------------------------ docs_bpe_token_stats
def test_docs_bpe_token_stats_matches_pure_python(spark, sf_dir):
    """The suite query trains 64 merges from the word-frequency table and
    reports per-source token stats; this recomputes BOTH stages in pure
    Python (Counter + the same classic merge loop + a naive encoder) and
    demands identical totals."""
    from collections import Counter

    from iceberg_kafka_connect_spark.operators.bpe import END, train_bpe

    docs = [
        (r.source, r.text or "")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    ]
    c = Counter(w for _, t in docs for w in t.lower().split())
    wf = sorted(
        ((w, f) for w, f in c.items() if f >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:50_000]
    merges = train_bpe(wf, 64)
    ranks = {m: i for i, m in enumerate(merges)}

    def enc_word(word):
        syms = list(word) + [END]
        while len(syms) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    cache = {}
    expected = {}
    for src, text in docs:
        n = 0
        for w in text.lower().split():
            if w not in cache:
                cache[w] = len(enc_word(w))
            n += cache[w]
        d = expected.setdefault(src, [0, 0, 0])
        d[0] += 1
        d[1] += n
        d[2] = max(d[2], n)

    got = {
        r.source: (r.n_docs, r.total_tokens, r.max_tokens)
        for r in _run("docs_bpe_token_stats", spark, sf_dir).collect()
    }
    assert got == {s: tuple(v) for s, v in expected.items()}


# --------------------------------------------------------- docs_mmr_rerank
def test_docs_mmr_rerank_matches_pure_python(spark, sf_dir, emb_rows):
    """The exact suite query vs an independent greedy MMR in numpy over
    the same exact-cosine top-30 candidates."""
    ids, mat = emb_rows
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = mat / n
    sims = x @ x.T
    lam, k_cand, k_out = 0.7, 30, 10
    want = []
    for qi in np.nonzero(ids % 97 == 0)[0]:
        order = sorted(
            (j for j in range(len(ids)) if j != qi),
            key=lambda j: (-sims[qi, j], ids[j]),
        )[:k_cand]
        # candidates sorted by ascending id (the operator's tiebreak frame)
        cand = sorted(order, key=lambda j: ids[j])
        rel = {j: float(sims[qi, j]) for j in cand}
        picked, max_sim = [], {j: 0.0 for j in cand}
        for rank in range(1, min(k_out, len(cand)) + 1):
            best = max(
                (j for j in cand if j not in picked),
                key=lambda j: (
                    lam * rel[j] - (1 - lam) * max_sim[j],
                    -ids[j],
                ),
            )
            picked.append(best)
            want.append((int(ids[qi]), rank, int(ids[best])))
            for j in cand:
                max_sim[j] = max(max_sim[j], float(sims[best, j]))
    got = [
        (r.query_id, r.rank, r.neighbor_id)
        for r in _run("docs_mmr_rerank", spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)
