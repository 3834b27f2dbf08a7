"""Corpus-quality queries: Gopher/C4-style repetition filtering and
benchmark decontamination over the `documents` table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from ..operators import text as tx
from . import register
from .core import PROFILE_CTE, table

# Thresholds chosen against the synthetic corpus distributions so the gate
# actually splits it (top-word p75≈0.11 / p90≈0.14; dup-2gram p90≈0.065).
_TWR, _DUP2, _DUP3, _MINW = 0.125, 0.06, 0.05, 5


# --------------------------------------------------------------------------
# Repetition profile + Gopher-style gate: most-common-word ratio and
# duplicate n-gram fractions, all single-pass Catalyst array arithmetic —
# one scan, zero shuffles at any corpus size.
# --------------------------------------------------------------------------
@register(
    "text_repetition",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    wx AS (SELECT doc_id, unnest(w) AS word FROM d),
    wc AS (SELECT doc_id, word, COUNT(*) AS c FROM wx GROUP BY 1, 2),
    twr AS (
        SELECT doc_id,
               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_word_ratio
        FROM wc GROUP BY 1
    ),
    g AS (
        SELECT doc_id, len(w) AS nw,
               list_transform(list_zip(w[1:-2], w[2:-1]),
                              x -> x[1] || ' ' || x[2]) AS g2,
               list_transform(list_zip(w[1:-3], w[2:-2], w[3:-1]),
                              x -> x[1] || ' ' || x[2] || ' ' || x[3]) AS g3
        FROM d
    ),
    r AS (
        SELECT doc_id, nw,
               CASE WHEN len(g2) > 0
                    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                               / CAST(len(g2) AS DOUBLE)
                    ELSE 0.0 END AS dup_2gram_ratio,
               CASE WHEN len(g3) > 0
                    THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                               / CAST(len(g3) AS DOUBLE)
                    ELSE 0.0 END AS dup_3gram_ratio
        FROM g
    )
    SELECT t.doc_id, t.top_word_ratio, r.dup_2gram_ratio, r.dup_3gram_ratio,
           (r.nw >= {_MINW} AND t.top_word_ratio <= {_TWR}
            AND r.dup_2gram_ratio <= {_DUP2}
            AND r.dup_3gram_ratio <= {_DUP3}) AS passes
    FROM twr t JOIN r ON t.doc_id = r.doc_id
    """,
    tags=("text",),
)
def text_repetition(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.85x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    # The repetition signals are CPU-heavy per row; a small-file scan yields
    # one split and serializes them. Widen only when under-split (no-op at
    # real corpus scale, where the scan has >= cores splits).
    sc = spark.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    t = F.col("text")
    # compute each signal once; derive the gate from the projected columns
    # instead of re-evaluating the (expensive) expressions inside it
    prof = docs.select(
        "doc_id",
        tx.word_count(t).alias("__nw"),
        tx.top_word_ratio(t).alias("top_word_ratio"),
        tx.dup_ngram_ratio(t, 2).alias("dup_2gram_ratio"),
        tx.dup_ngram_ratio(t, 3).alias("dup_3gram_ratio"),
    )
    return prof.select(
        "doc_id",
        "top_word_ratio",
        "dup_2gram_ratio",
        "dup_3gram_ratio",
        (
            (F.col("__nw") >= _MINW)
            & (F.col("top_word_ratio") <= _TWR)
            & (F.col("dup_2gram_ratio") <= _DUP2)
            & (F.col("dup_3gram_ratio") <= _DUP3)
        ).alias("passes"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: per corpus doc, how many of its word 5-grams
# appear anywhere in the held-out benchmark split (doc_id % 20 == 0 plays
# the benchmark). The benchmark shingle set broadcasts; corpus shingles are
# probed map-side — no corpus shuffle at any scale.
# --------------------------------------------------------------------------
@register(
    "contamination_check",
    oracle=r"""
    WITH cw AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id % 20 != 0
    ),
    csh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   list_zip(w[1:-5], w[2:-4], w[3:-3], w[4:-2], w[5:-1]),
                   x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' || x[4]
                        || ' ' || x[5])) AS s
        FROM cw
    ),
    bw AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id % 20 = 0
    ),
    bsh AS (
        SELECT DISTINCT
               unnest(list_transform(
                   list_zip(w[1:-5], w[2:-4], w[3:-3], w[4:-2], w[5:-1]),
                   x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' || x[4]
                        || ' ' || x[5])) AS s
        FROM bw
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n FROM csh GROUP BY 1),
    hit AS (
        SELECT doc_id, COUNT(*) AS c
        FROM csh WHERE s IN (SELECT s FROM bsh) GROUP BY 1
    )
    SELECT t.doc_id,
           t.n AS n_shingles,
           COALESCE(h.c, 0) AS n_contaminated,
           CAST(COALESCE(h.c, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)
             AS contamination
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
    tags=("dedup",),
)
def contamination_check(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return dedup.contamination_scores(corpus, benchmark, n=5)


# --------------------------------------------------------------------------
# Curriculum binning: decile of quality score WITHIN each source — the
# window is partitioned by source, so the sort is per-group, never global
# (a global NTILE at corpus scale is a total sort; per-source is the
# shuffle a curriculum job needs anyway). NTILE semantics are SQL-standard
# in both engines; ordering is fully deterministic (quality DESC, doc_id).
# --------------------------------------------------------------------------
@register(
    "quality_bins_by_source",
    oracle=f"""
    WITH {PROFILE_CTE}
    SELECT d.source, p.doc_id,
           CAST(NTILE(10) OVER (
               PARTITION BY d.source ORDER BY p.quality DESC, p.doc_id
           ) AS INT) AS bin
    FROM documents d JOIN profile p ON p.doc_id = d.doc_id
    """,
    tags=("text",),
)
def quality_bins_by_source(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "source", "doc_id", tx.quality_score(F.col("text")).alias("q")
    )
    w = Window.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")
    return scored.select(
        "source", "doc_id", F.ntile(10).over(w).cast("int").alias("bin")
    )


# --------------------------------------------------------------------------
# Incremental dedup: curate an incoming batch against an already-curated
# history WITHOUT re-pairing history with itself — the production ingest
# loop. doc_id % 5 == 0 plays the incoming batch. Every batch doc gets a
# verdict: kept, or first-matching drop reason (exact_history, exact_batch,
# near_history, near_batch).
# --------------------------------------------------------------------------
@register(
    "dedup_incremental",
    oracle=r"""
    WITH b AS (
        SELECT doc_id, text,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest
        FROM documents WHERE doc_id % 5 = 0
    ),
    h AS (
        SELECT doc_id, text,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest
        FROM documents WHERE doc_id % 5 != 0
    ),
    eh AS (SELECT doc_id FROM b WHERE digest IN (SELECT digest FROM h)),
    bm AS (SELECT digest, MIN(doc_id) AS keep_id FROM b GROUP BY 1),
    eb AS (
        SELECT b.doc_id FROM b JOIN bm ON b.digest = bm.digest
        WHERE b.doc_id != bm.keep_id
    ),
    reps AS (
        SELECT doc_id, text FROM b
        WHERE doc_id NOT IN (SELECT doc_id FROM eh)
          AND doc_id NOT IN (SELECT doc_id FROM eb)
    ),
    rsh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(list_transform(
                list_zip(w[1:-3], w[2:-2], w[3:-1]),
                x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\s+') AS w FROM reps)
        )
    ),
    hsh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(list_transform(
                list_zip(w[1:-3], w[2:-2], w[3:-1]),
                x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\s+') AS w FROM h)
        )
    ),
    rsz AS (SELECT doc_id, COUNT(*) AS n FROM rsh GROUP BY 1),
    hsz AS (SELECT doc_id, COUNT(*) AS n FROM hsh GROUP BY 1),
    xinter AS (
        SELECT r.doc_id AS id_a, hh.doc_id AS id_b, COUNT(*) AS c
        FROM rsh r JOIN hsh hh ON r.s = hh.s GROUP BY 1, 2
    ),
    nh AS (
        SELECT DISTINCT id_a AS doc_id FROM xinter
        JOIN rsz ON rsz.doc_id = id_a JOIN hsz ON hsz.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / CAST(rsz.n + hsz.n - c AS DOUBLE) >= 0.5
    ),
    surv AS (
        SELECT doc_id FROM reps
        WHERE doc_id NOT IN (SELECT doc_id FROM nh)
    ),
    ssh AS (SELECT * FROM rsh WHERE doc_id IN (SELECT doc_id FROM surv)),
    binter AS (
        SELECT a.doc_id AS id_a, bb.doc_id AS id_b, COUNT(*) AS c
        FROM ssh a JOIN ssh bb ON a.s = bb.s AND a.doc_id < bb.doc_id
        GROUP BY 1, 2
    ),
    nb AS (
        SELECT DISTINCT id_b AS doc_id FROM binter
        JOIN rsz sa ON sa.doc_id = id_a JOIN rsz sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
    )
    SELECT b.doc_id,
           CASE WHEN b.doc_id IN (SELECT doc_id FROM eh) THEN 'exact_history'
                WHEN b.doc_id IN (SELECT doc_id FROM eb) THEN 'exact_batch'
                WHEN b.doc_id IN (SELECT doc_id FROM nh) THEN 'near_history'
                WHEN b.doc_id IN (SELECT doc_id FROM nb) THEN 'near_batch'
                END AS drop_reason,
           (CASE WHEN b.doc_id IN (SELECT doc_id FROM eh) THEN 'exact_history'
                WHEN b.doc_id IN (SELECT doc_id FROM eb) THEN 'exact_batch'
                WHEN b.doc_id IN (SELECT doc_id FROM nh) THEN 'near_history'
                WHEN b.doc_id IN (SELECT doc_id FROM nb) THEN 'near_batch'
                END) IS NULL AS kept
    FROM b
    """,
    tags=("dedup",),
)
def dedup_incremental(spark, sf_dir):
    # fan=False: incremental_dedup re-reads the UN-persisted history
    # subtree in three sub-actions; a table-level fan exchange re-executes
    # with each of them (measured +1.5s), while the operator's own
    # shingles() guard already fans the explode stage
    docs = table(spark, sf_dir, "documents", fan=False)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    history = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup.incremental_dedup(batch, history)


# --------------------------------------------------------------------------
# Temperature-based source re-mixing (the data-recipe smoothing step of
# Pile-style pretraining mixes): target share of source s ∝ n_s^t; without
# replacement that means keep-fraction (n_min/n_s)^(1-t) — the smallest
# source keeps all, larger sources thin deterministically (md5 prefix; 'g' sorts above all hex).
# --------------------------------------------------------------------------
@register(
    "docs_source_mix",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    mn AS (SELECT MIN(n) AS nmin FROM counts),
    th AS (
        SELECT source,
               CASE WHEN POWER(nmin / CAST(n AS DOUBLE), 0.5) >= 1.0
                    THEN 'g'
                    ELSE printf('%06x', CAST(FLOOR(
                        POWER(nmin / CAST(n AS DOUBLE), 0.5) * 16777216
                    ) AS INT)) END AS thresh
        FROM counts, mn
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
    FROM documents d JOIN th USING (source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) < th.thresh
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("quality",),
)
def docs_source_mix(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.59x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    mixed = tx.source_mix_resample(docs, temperature=0.5)
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# DSIR-style domain-relevance scoring (hashed-unigram importance shape,
# arXiv:2302.03169): target domain = English docs, raw = whole corpus.
# Integer arithmetic end-to-end (c_t·N_r − c_r·N_t summed per doc, one
# final double division) so Spark and DuckDB hash-match bit-for-bit.
# --------------------------------------------------------------------------
@register(
    "docs_dsir_relevance",
    oracle=r"""
    WITH bx AS (
        SELECT doc_id,
               substr(md5(unnest(
                   string_split_regex(trim(lower(text)), '\s+'))), 1, 2)
                 AS b,
               (lang = 'en') AS tgt
        FROM documents
    ),
    stats AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
        FROM bx GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_all) AS BIGINT) AS nr,
               CAST(SUM(n_tgt) AS BIGINT) AS nt
        FROM stats
    ),
    score AS (
        SELECT bx.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(s.n_tgt * t.nr - s.n_all * t.nt) AS BIGINT)
                 AS score_num,
               MAX(t.nt) AS nt, MAX(t.nr) AS nr
        FROM bx JOIN stats s USING (b) CROSS JOIN tot t
        GROUP BY bx.doc_id
    )
    SELECT doc_id, n_words, score_num,
           CAST(score_num AS DOUBLE)
             / ((CAST(nt AS DOUBLE) * CAST(nr AS DOUBLE))
                * CAST(n_words AS DOUBLE)) AS relevance,
           score_num > 0 AS toward_target
    FROM score
    """,
    tags=("quality",),
)
def docs_dsir_relevance(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return tx.hashed_relevance(docs, target=F.col("lang") == "en")


# --------------------------------------------------------------------------
# CCNet-style LM surprise scoring (arXiv:1911.00359 shape): hashed-unigram
# LM trained on the corpus in one aggregation pass; per-token information
# quantized to whole bits (bit_length arithmetic, no transcendentals) so
# both engines agree bit-for-bit. High mean surprise = corpus-rare tokens
# (CCNet "tail"); low = head boilerplate.
# --------------------------------------------------------------------------
@register(
    "docs_lm_surprise",
    oracle=r"""
    WITH bx AS (
        SELECT doc_id,
               substr(md5(unnest(
                   string_split_regex(trim(lower(text)), '\s+'))), 1, 2)
                 AS b
        FROM documents
    ),
    stats AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bx GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM stats),
    info AS (
        SELECT s.b,
               CAST(length(bin(t.n)) - length(bin(s.c)) AS BIGINT) AS ib
        FROM stats s CROSS JOIN tot t
    )
    SELECT bx.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(i.ib) AS BIGINT) AS surprise_bits,
           CAST(SUM(i.ib) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_surprise
    FROM bx JOIN info i USING (b)
    GROUP BY bx.doc_id
    """,
    tags=("quality",),
)
def docs_lm_surprise(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return tx.lm_surprise(docs)


# --------------------------------------------------------------------------
# Deterministic shard shuffle: reproducible pseudo-random (shard, pos)
# address per document — the pre-training export permutation. No global
# sort: md5-mod sharding + per-shard row_number windows.
# --------------------------------------------------------------------------
@register(
    "docs_shard_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM documents
    """,
    tags=("quality",),
)
def docs_shard_shuffle(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.67x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    return tx.shard_shuffle(docs, n_shards=8).select("doc_id", "shard", "pos")


# --------------------------------------------------------------------------
# Per-source epoch repetition (recipe upsampling): src0 ×2.5, src1 ×2,
# src2 ×0.5, everything else ×1. Fractional epochs pick their extra-copy
# docs by md5 — deterministic in both engines, no randomness.
# --------------------------------------------------------------------------
@register(
    "docs_source_epochs",
    oracle="""
    WITH e AS (
        SELECT d.doc_id, d.source,
               CASE d.source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 2.0
                             WHEN 'src2' THEN 0.5 ELSE 1.0 END AS ep
        FROM documents d
    ),
    n AS (
        SELECT doc_id, source,
               CAST(FLOOR(ep) AS INT)
               + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                           < printf('%06x', CAST(FLOOR((ep - FLOOR(ep))
                                                       * 16777216) AS INT))
                      THEN 1 ELSE 0 END AS n_copies
        FROM e
    )
    SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INT)
               AS epoch
    FROM n WHERE n_copies >= 1
    """,
    tags=("quality",),
)
def docs_source_epochs(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.81x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    out = tx.source_epochs(docs, {"src0": 2.5, "src1": 2.0, "src2": 0.5})
    return out.select("doc_id", "source", "epoch")


# --------------------------------------------------------------------------
# Contiguous global IDs without a global sort: range-partition + per-shard
# offsets reproduce ROW_NUMBER() OVER (ORDER BY ...) exactly — the oracle
# IS that window, proving the two-phase plan's numbering is identical while
# never funneling the corpus through one task (operators/ids.py).
# --------------------------------------------------------------------------
@register(
    "docs_global_ids",
    oracle="""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (ORDER BY source, doc_id) AS BIGINT)
               AS global_id
    FROM documents
    """,
    tags=("quality",),
)
def docs_global_ids(spark, sf_dir):
    from ..operators.ids import assign_global_ids

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_global_ids(docs, ["source", "doc_id"]).select(
        "doc_id", "source", "global_id"
    )


# --------------------------------------------------------------------------
# Deterministic hash split (train/val/test): md5-prefix bucketing with
# thresholds computed ONCE in python and inlined into both engines, so the
# assignment is engine-independent by construction. Stable under reruns and
# corpus appends (a doc's split depends only on its own key) — properties a
# rand() split lacks. The Spark side is a no-shuffle stateless projection;
# the gate aggregates per (split, source) to hash-check every assignment.
# --------------------------------------------------------------------------
def _split_oracle() -> str:
    from ..operators.ids import split_thresholds

    (t_train, th1), (t_val, th2) = split_thresholds(
        (("train", 0.8), ("val", 0.1), ("test", 0.1))
    )
    return f"""
    SELECT CASE WHEN substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 6)
                     < '{th1}' THEN '{t_train}'
                WHEN substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 6)
                     < '{th2}' THEN '{t_val}'
                ELSE 'test' END AS split,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


@register("docs_split_assign", oracle=_split_oracle(), tags=("quality",))
def docs_split_assign(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.67x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators.ids import split_assign

    docs = table(spark, sf_dir, "documents", fan=False)
    return (
        split_assign(docs, "doc_id", seed="v1")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("split", "source")
    )


# --------------------------------------------------------------------------
# Language-ID confusion matrix: labeled lang (truth column) vs the n-gram/
# stopword predictor, with per-truth-language accuracy — the QA readout
# that decides whether the cheap classifier is good enough to route
# curation decisions at corpus scale. One scan, one map-side-combined
# groupBy over (truth, pred).
# --------------------------------------------------------------------------
@register(
    "docs_langid_confusion",
    oracle=rf"""
    WITH {PROFILE_CTE},
    joined AS (
        SELECT d.lang AS lang_true, p.lang_pred
        FROM documents d JOIN profile p USING (doc_id)
    )
    SELECT lang_true, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER (
               PARTITION BY lang_true) AS DOUBLE), 6) AS frac_of_true
    FROM joined GROUP BY lang_true, lang_pred
    """,
    tags=("quality", "text"),
)
def docs_langid_confusion(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..operators import text as tx

    docs = table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("lang_true"),
        tx.detect_language(F.col("text")).alias("lang_pred"),
    )
    counted = pred.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # the window runs over the CONFUSION MATRIX (≤ |langs|² rows), not the
    # corpus — per-group totals on the aggregated frame are free
    w = Window.partitionBy("lang_true")
    return counted.select(
        "lang_true",
        "lang_pred",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w).cast("double"), 6
        ).alias("frac_of_true"),
    )


# --------------------------------------------------------------------------
# Per-source duplication rate (curation monitoring: which feeds are
# flooding the corpus with copies): exact-dup fraction per source from the
# normalized content fingerprint. Two map-side-combined aggregations over
# one scan — count + distinct-fingerprint count per source.
# --------------------------------------------------------------------------
@register(
    "docs_dup_rate_by_source",
    oracle=r"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(trim(regexp_replace(lower(text),
                '\s+', ' ', 'g')))) AS BIGINT) AS n_distinct,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(trim(regexp_replace(
                lower(text), '\s+', ' ', 'g')))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
    FROM documents GROUP BY source
    """,
    tags=("quality", "dedup"),
)
def docs_dup_rate_by_source(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.50x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators import text as tx

    docs = table(spark, sf_dir, "documents", fan=False)
    return (
        docs.select("source", tx.fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("fp").cast("bigint").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.round(
                1.0
                - F.col("n_distinct").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )


# --------------------------------------------------------------------------
# X103: bigram conditional surprise — the context step of CCNet perplexity
# filtering. info(w2|w1) in whole bits (bit_length arithmetic, zero
# transcendentals → bit-exact engine parity); stats in ONE pass over
# hashed bigram buckets, context counts derived from the pair frame,
# scoring as one broadcast join. Low mean = templated/repetitive text a
# unigram model can't flag.
# --------------------------------------------------------------------------
@register(
    "docs_bigram_surprise",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               substr(md5(z[1]), 1, 2) AS b1,
               substr(md5(z[2]), 1, 2) AS b2
        FROM w, UNNEST(list_zip(ws[:-2], ws[2:])) AS t(z)
    ),
    pc AS (SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS cp
           FROM bg GROUP BY 1, 2),
    cc AS (SELECT b1, CAST(SUM(cp) AS BIGINT) AS ctx FROM pc GROUP BY 1),
    info AS (
        SELECT pc.b1, pc.b2,
               CAST(length(bin(cc.ctx)) - length(bin(pc.cp)) AS BIGINT)
                   AS ib
        FROM pc JOIN cc USING (b1)
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(i.ib) AS BIGINT) AS surprise_bits,
           CAST(SUM(i.ib) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_surprise
    FROM bg JOIN info i USING (b1, b2)
    GROUP BY bg.doc_id
    """,
    tags=("quality",),
)
def docs_bigram_surprise(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return tx.bigram_surprise(docs)


# --------------------------------------------------------------------------
# X108: CCNet-style perplexity bucketing (arXiv:1911.00359 §4.3 splits each
# language's corpus into head/middle/tail by LM perplexity tertiles):
# per-source NTILE(3) over the integer-scaled mean bigram surprise,
# deterministic via the doc_id tiebreak. Composes X103's LM pass with one
# per-source window — the curation stage that samples training data by
# quality stratum.
# --------------------------------------------------------------------------
@register(
    "docs_ccnet_buckets",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, source,
               string_split_regex(trim(lower(text)), '\s+') AS ws
        FROM documents
    ),
    bg AS (
        SELECT doc_id, source,
               substr(md5(z[1]), 1, 2) AS b1, substr(md5(z[2]), 1, 2) AS b2
        FROM w, UNNEST(list_zip(ws[:-2], ws[2:])) AS t(z)
    ),
    pc AS (SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS cp
           FROM bg GROUP BY 1, 2),
    cc AS (SELECT b1, CAST(SUM(cp) AS BIGINT) AS ctx FROM pc GROUP BY 1),
    info AS (SELECT pc.b1, pc.b2,
                    CAST(length(bin(cc.ctx)) - length(bin(pc.cp)) AS BIGINT)
                        AS ib
             FROM pc JOIN cc USING (b1)),
    score AS (
        SELECT bg.doc_id, bg.source,
               CAST(SUM(i.ib) AS BIGINT) AS bits,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM bg JOIN info i USING (b1, b2) GROUP BY 1, 2
    ),
    bucketed AS (
        SELECT source,
               NTILE(3) OVER (PARTITION BY source
                              ORDER BY bits * 1000000 // nb, doc_id)
                   AS tertile
        FROM score
    )
    SELECT source,
           CASE tertile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM bucketed GROUP BY 1, 2
    """,
    tags=("quality", "curation"),
)
def docs_ccnet_buckets(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    score = tx.bigram_surprise(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy(
        F.expr("surprise_bits * 1000000 div n_bigrams"), "doc_id"
    )
    bucketed = score.withColumn("tertile", F.ntile(3).over(w))
    return bucketed.groupBy(
        "source",
        F.when(F.col("tertile") == 1, "head")
        .when(F.col("tertile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
