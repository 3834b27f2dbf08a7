"""Deduplication queries over the `documents` / `embeddings` tables.

The exact strategies (hash, n-gram Jaccard, embedding cosine) carry full
DuckDB oracles. MinHash-LSH is verified with exact Jaccard after candidate
generation, so its output equals the exact-Jaccard oracle (recall at the
configured band shape is 1-1e-8 at s=0.5). SimHash has no SQL-expressible
oracle (xxhash64) → rows-only check + pytest semantic tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from ..operators import text as tx
from ..operators import similarity
from ..operators.similarity import cosine_pairs
from ..functions.vector import sql_cosine
from . import register
from .core import PROFILE_CTE, table

# Shared DuckDB Jaccard CTE chain: word trigrams, distinct per doc — the
# exact mirror of operators/dedup.shingles(n=3) + _pair_jaccard. Expects a
# `docs(doc_id, w)` CTE in scope (so callers can restrict the corpus, e.g.
# curation's exact-dedup representatives).
_DUCK_JACCARD_FROM_DOCS = r"""
    sh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       list_zip(w[1:-3], w[2:-2], w[3:-1]),
                       x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS s
            FROM docs
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT id_a, id_b,
               CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
"""

_DUCK_SHINGLES = (
    r"""
    docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
    ),
"""
    + _DUCK_JACCARD_FROM_DOCS
)

_JACCARD_ORACLE = f"""
    WITH {_DUCK_SHINGLES}
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
"""


# --------------------------------------------------------------------------
# Exact dedup: hash-groupBy on the normalized-content digest.
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
)
def dedup_exact(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.47x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    return dedup.exact_dedup(docs)


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (word trigrams, t=0.5).
# --------------------------------------------------------------------------
@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, n=3, threshold=0.5)


# --------------------------------------------------------------------------
# MinHash + LSH with exact verification: candidates from 64 bands × 2 rows
# (recall ≈ 1-1e-8 at s=0.5), verified with exact Jaccard → output equals
# the exact oracle. The scale win: candidates shuffle on band buckets
# instead of the full inverted index.
# --------------------------------------------------------------------------
@register("dedup_minhash_lsh", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_minhash_lsh(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, n=3, threshold=0.5, num_hashes=128, bands=64
    )


# --------------------------------------------------------------------------
# SimHash near-dup pairs (63-bit, hamming ≤ 10 over word bigram features;
# short documents flip more bits per differing feature, and the planted
# near-dups in this corpus span hamming 4-10).
# No SQL oracle (xxhash64 is Spark-side) → rows-only + pytest checks.
# --------------------------------------------------------------------------
@register("dedup_simhash", oracle=None, tags=("dedup",))
def dedup_simhash(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, n=2, max_hamming=10, chunks=16)


# Transitive closure of the near-dup edge set, as a recursive CTE (tiny
# clusters → tiny closure). Defines `comp(id, component)`; expects `jac`.
_DUCK_COMPONENTS = """
    e AS (SELECT id_a AS a, id_b AS b FROM jac WHERE jaccard >= 0.5),
    sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
    reach(id, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, t.r FROM sym s JOIN reach t ON t.id = s.b
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
"""


# --------------------------------------------------------------------------
# Near-dup clusters: LSH pairs (== exact-Jaccard pairs after verification)
# → connected components by min-label propagation. The oracle computes the
# same components via a recursive-CTE transitive closure — feasible there
# exactly because near-dup graphs are small dense clusters.
# --------------------------------------------------------------------------
@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    {_DUCK_COMPONENTS}
    SELECT id AS doc_id, component FROM comp
    """,
    tags=("dedup",),
)
def dedup_components(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, n=3, threshold=0.5, num_hashes=128, bands=64
    )
    comp = dedup.connected_components(pairs)
    return comp.select(F.col("id").alias("doc_id"), "component")


# --------------------------------------------------------------------------
# Cluster collapse: every document lands in a component (isolated docs are
# their own), and each component keeps its best-quality member (ties by
# min doc_id). This is the step that turns near-dup PAIRS into the actual
# deduplicated corpus. One groupBy on component with a struct-argmax —
# no window sort, no quadratic anything.
# --------------------------------------------------------------------------
@register(
    "dedup_collapse",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    {_DUCK_COMPONENTS},
    {PROFILE_CTE}
    , allc AS (
        SELECT p.doc_id,
               COALESCE(c.component, p.doc_id) AS component,
               p.quality
        FROM profile p LEFT JOIN comp c ON c.id = p.doc_id
    ),
    sel AS (
        SELECT component, doc_id, quality,
               ROW_NUMBER() OVER (
                   PARTITION BY component ORDER BY quality DESC, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY component) AS n_docs
        FROM allc
    )
    SELECT component, doc_id AS keep_id, quality AS keep_quality,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM sel WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_collapse(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, n=3, threshold=0.5, num_hashes=128, bands=64
    )
    comp = dedup.connected_components(pairs).withColumnRenamed("id", "doc_id")
    scored = docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("quality")
    )
    with_comp = scored.join(comp, "doc_id", "left").select(
        "doc_id",
        "quality",
        F.coalesce("component", "doc_id").alias("component"),
    )
    # argmax(quality) with min-doc_id tie-break == max of (quality, -doc_id)
    best = F.max(
        F.struct(
            F.col("quality"), (-F.col("doc_id")).alias("neg_id")
        )
    ).alias("best")
    return (
        with_comp.groupBy("component")
        .agg(best, F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "component",
            (-F.col("best.neg_id")).alias("keep_id"),
            F.col("best.quality").alias("keep_quality"),
            "n_docs",
        )
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (exact all-pairs at oracle scale; the
# corpus-scale path is operators/similarity.srp_lsh_pairs).
# --------------------------------------------------------------------------
@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {sql_cosine('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.4
    """,
    tags=("dedup",),
)
def dedup_embedding_cosine(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, threshold=0.4)


# --------------------------------------------------------------------------
# Lexical vs semantic agreement: near-dup pairs found by trigram Jaccard,
# by embedding cosine, or by both (vec_id aligns 1:1 with doc_id). The
# full-outer join on the pair key is the audit a curation team runs before
# trusting one signal to stand in for the other.
# --------------------------------------------------------------------------
@register(
    "dedup_signal_agreement",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    lex AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    sem AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.4
    )
    SELECT CASE WHEN l.id_a IS NOT NULL AND s.id_a IS NOT NULL THEN 'both'
                WHEN l.id_a IS NOT NULL THEN 'lexical_only'
                ELSE 'semantic_only' END AS signal,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lex l FULL OUTER JOIN sem s
      ON l.id_a = s.id_a AND l.id_b = s.id_b
    GROUP BY 1 ORDER BY 1
    """,
    tags=("dedup",),
)
def dedup_signal_agreement(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex = dedup.minhash_lsh_pairs(
        docs, n=3, threshold=0.5, num_hashes=128, bands=64
    ).select("id_a", "id_b")
    sem = cosine_pairs(emb, threshold=0.4).select(
        F.col("id_a").alias("s_a"), F.col("id_b").alias("s_b")
    )
    j = lex.join(
        sem,
        (F.col("id_a") == F.col("s_a")) & (F.col("id_b") == F.col("s_b")),
        "full_outer",
    )
    signal = (
        F.when(F.col("id_a").isNotNull() & F.col("s_a").isNotNull(), "both")
        .when(F.col("id_a").isNotNull(), "lexical_only")
        .otherwise("semantic_only")
    )
    return (
        j.select(signal.alias("signal"))
        .groupBy("signal")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("signal")
    )


# --------------------------------------------------------------------------
# Exact repeated-span removal (Lee et al. ExactSubstr, aligned-span form):
# every 4-word span occurring twice-plus in the corpus survives only at its
# first occurrence. The whole corpus is reassembled, so the oracle hashes
# both the per-doc span accounting AND the rewritten text.
# --------------------------------------------------------------------------
@register(
    "docs_span_dedup",
    oracle=r"""
    WITH arrs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
        FROM documents
    ),
    words AS (
        SELECT doc_id,
               unnest(arr) AS word,
               unnest(range(1, len(arr) + 1)) AS ord
        FROM arrs
    ),
    spans AS (
        SELECT doc_id,
               CAST((ord - 1) // 4 AS BIGINT) AS idx,
               string_agg(word, ' ' ORDER BY ord) AS span
        FROM words GROUP BY doc_id, (ord - 1) // 4
    ),
    ranked AS (
        SELECT doc_id, idx, span,
               COUNT(*) OVER (PARTITION BY span) AS cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY span ORDER BY doc_id, idx
               ) AS rn
        FROM spans
    ),
    kept AS (
        SELECT doc_id, idx, span,
               (cnt < 2 OR rn = 1) AS keep
        FROM ranked
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_spans_kept,
           COALESCE(string_agg(CASE WHEN keep THEN span END, ' '
                               ORDER BY idx), '') AS text_dedup
    FROM kept GROUP BY doc_id
    """,
    tags=("dedup",),
)
def docs_span_dedup(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return dedup.span_dedup(docs, span_words=4, min_df=2)


# --------------------------------------------------------------------------
# Semantic dedup, sharded by a stored cluster column (SemDeDup with the
# clustering given): near-dup pairs are searched only within a shard, each
# near-dup group keeps its smallest id. The oracle replays the exact same
# semantics — within-label cosine edges, recursive-CTE closure, min-id
# representative — so every verdict is hash-checked. The k-means variant
# (dedup_semdedup) exercises the full pipeline shape.
# --------------------------------------------------------------------------
@register(
    "dedup_semantic",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.4
    ),
    sym AS (SELECT ia AS a, ib AS b FROM e
            UNION SELECT ib AS a, ia AS b FROM e),
    reach(id, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, t.r FROM sym s JOIN reach t ON t.id = s.b
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT e0.vec_id,
           e0.label AS cluster,
           COALESCE(c.component, e0.vec_id) = e0.vec_id AS kept,
           COALESCE(c.component, e0.vec_id) AS rep_id
    FROM embeddings e0 LEFT JOIN comp c ON c.id = e0.vec_id
    """,
    tags=("dedup",),
)
def dedup_semantic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.4, cluster_col="label")


# Full SemDeDup: deterministic k-means discovers the shards, then the same
# within-cluster dedup. k-means isn't SQL-expressible → rows-only here;
# tests/test_semdedup.py proves nlist=1 ≡ the exact all-pairs verdicts and
# that every dropped vector has a true cosine-≥-threshold partner.
@register("dedup_semdedup", oracle=None, tags=("dedup",))
def dedup_semdedup(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.60x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    emb = table(spark, sf_dir, "embeddings", fan=False)
    return similarity.semantic_dedup(emb, threshold=0.4, nlist=8, iters=2)


# --------------------------------------------------------------------------
# Bloom-prefiltered incremental exact dedup: history = doc_id % 3 == 0,
# batch = the rest; survivors are batch docs whose normalized digest is not
# in history. The Bloom probe splits the batch map-side — only probe HITS
# (true dups + ~1% false positives) enter the anti-join shuffle; the
# filter's own build is one bounded-size aggregation (functions/bloom.py).
# No false negatives ⇒ output is bit-identical to the plain anti-join the
# oracle runs.
# --------------------------------------------------------------------------
@register(
    "dedup_exact_bloom",
    oracle=r"""
    WITH h AS (
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id FROM documents b
    WHERE b.doc_id % 3 != 0
      AND md5(trim(regexp_replace(lower(b.text), '\s+', ' ', 'g')))
          NOT IN (SELECT digest FROM h)
    """,
    tags=("dedup",),
)
def dedup_exact_bloom(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.76x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    history = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    return dedup.incremental_exact_dedup_bloom(batch, history)


# --------------------------------------------------------------------------
# SimHash with the engine-independent md5 feature hash: the ONE hash both
# Spark (conv(substr(md5,1,15),16,10)) and DuckDB (('0x'||…)::BIGINT)
# compute bit-identically, which lets the FULL pipeline — per-bit votes →
# 60-bit signature → hamming pairs — be SQL-oracle-checked instead of
# rows-only like the xxhash64 production variant. The Spark side still
# runs chunk banding (16 chunks > hamming 10 ⇒ pigeonhole recall 1); the
# oracle brute-forces all pairs, so agreement also re-proves the banding
# loses nothing.
# --------------------------------------------------------------------------
_SIMHASH_MD5_ORACLE = r"""
    WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       list_zip(w[1:-2], w[2:-1]),
                       x -> x[1] || ' ' || x[2])) AS s
            FROM docs
        )
    ),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
        FROM sh
    ),
    bits AS (
        SELECT doc_id, b.b AS b,
               SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h, (SELECT unnest(generate_series(0, 59)) AS b) b
        GROUP BY 1, 2
    ),
    sig AS (
        SELECT doc_id,
               SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                        ELSE 0 END) AS s
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 10
"""


@register("dedup_simhash_md5", oracle=_SIMHASH_MD5_ORACLE, tags=("dedup",))
def dedup_simhash_md5(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(
        docs,
        n=2,
        max_hamming=10,
        chunks=16,
        feature_hash=dedup.md5_hash60,
        bits=60,
    ).withColumn("hamming", F.col("hamming").cast("int"))


# --------------------------------------------------------------------------
# Dup-cluster size histogram: the corpus-health view of exact dedup —
# "how much of the corpus sits in clusters of size k". Shares
# operators/dedup.normalize_text with dedup_exact (one normalization,
# no drift point). Pure integer aggs; two shuffles, the second over
# |distinct digests| ≪ n.
# --------------------------------------------------------------------------
@register(
    "dedup_cluster_histogram",
    oracle=r"""
    WITH clusters AS (
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS d,
               CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM documents GROUP BY 1
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM clusters GROUP BY cluster_size ORDER BY cluster_size
    """,
    tags=("dedup", "quality"),
)
def dedup_cluster_histogram(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.42x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    """Histogram of exact-duplicate cluster sizes over the SAME
    normalized digest dedup_exact uses (operators/dedup.normalize_text):
    cluster_size -> how many clusters and how many documents."""
    docs = table(spark, sf_dir, "documents", fan=False)
    clusters = (
        docs.select(F.md5(dedup.normalize_text(F.col("text"))).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# --------------------------------------------------------------------------
# Source-pair Jaccard: corpus-group overlap for mixture planning and
# corpus-level contamination triage. Exact integer intersection over
# per-group distinct 3-shingles; jaccard is one identical IEEE division
# in both engines. The 100 TB sibling is per-group MinHash signatures
# (fixed 128 numbers per group) — this exact form is the ground truth.
# --------------------------------------------------------------------------
@register(
    "docs_source_similarity",
    oracle=r"""
    WITH sh AS (
        SELECT DISTINCT source AS g,
               array_to_string(ws[i + 1 : i + 3], ' ') AS shingle
        FROM (
            SELECT source, string_split_regex(trim(text), '\s+') AS ws
            FROM documents
        ), UNNEST(range(len(ws) - 2)) AS t(i)
    ),
    sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.g AS source_a, b.g AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.g < b.g
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_common,
           sa.n AS n_a, sb.n AS n_b,
           n_common / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = source_a
    JOIN sizes sb ON sb.g = source_b
    ORDER BY jaccard DESC, source_a, source_b
    """,
    tags=("dedup", "quality"),
)
def docs_source_similarity(spark, sf_dir):
    """operators/dedup.source_similarity over documents.source: pairwise
    shingle-set Jaccard between corpus sources."""
    docs = table(spark, sf_dir, "documents")
    return dedup.source_similarity(docs, group_col="source", n=3)
