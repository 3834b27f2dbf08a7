"""Text-analysis queries over the `documents` table.

Every metric is deterministic arithmetic, so the DuckDB oracles reproduce
the exact doubles (same IEEE operations in the same order — the oracle SQL
mirrors the Spark expression tree, including parenthesization).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import text as tx
from ..functions import local_df
from . import register
from .core import PROFILE_CTE, sql_davg, table, davg



# --------------------------------------------------------------------------
# Gopher rule battery (Rae et al. 2021 App. A1.1): the canonical pretraining
# document filter — word-count bounds, mean word length, symbol ratio,
# alphabetic-word fraction, stopword presence, bullet/ellipsis line ratios.
# Pure Catalyst single-pass projection; the oracle mirrors every IEEE
# division. min_words=20 fits the verification corpus (docs run 10-99
# words); production uses the published 50.
# --------------------------------------------------------------------------
_GOPHER_MINW = 20

@register(
    "text_gopher_rules",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\s+') AS w,
               string_split_regex(trim(lower(text)), '\s+') AS wl,
               string_split_regex(text, '\n') AS lines
        FROM documents
    ),
    m AS (
        SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS mean_word_len,
            CAST(len(regexp_extract_all(text, '#|\.{{3}}|…')) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS symbol_ratio,
            CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                AS DOUBLE) / CAST(len(w) AS DOUBLE) AS alpha_word_ratio,
            CAST(CAST(list_contains(wl, 'the') AS INT)
               + CAST(list_contains(wl, 'be') AS INT)
               + CAST(list_contains(wl, 'to') AS INT)
               + CAST(list_contains(wl, 'of') AS INT)
               + CAST(list_contains(wl, 'and') AS INT)
               + CAST(list_contains(wl, 'that') AS INT)
               + CAST(list_contains(wl, 'have') AS INT)
               + CAST(list_contains(wl, 'with') AS INT) AS BIGINT)
                AS n_stopword_hits,
            CAST(len(list_filter(lines,
                x -> regexp_matches(x, '^\s*[-*•]'))) AS DOUBLE)
                / CAST(len(lines) AS DOUBLE) AS bullet_line_ratio,
            CAST(len(list_filter(lines,
                x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS DOUBLE)
                / CAST(len(lines) AS DOUBLE) AS ellipsis_line_ratio
        FROM d
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
           n_stopword_hits, bullet_line_ratio, ellipsis_line_ratio,
           (n_words >= {_GOPHER_MINW} AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio < 0.1 AND alpha_word_ratio > 0.8
            AND n_stopword_hits >= 2 AND bullet_line_ratio <= 0.9
            AND ellipsis_line_ratio <= 0.3) AS passes
    FROM m
    """,
    tags=("text",),
)
def text_gopher_rules(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    metrics = docs.select("doc_id", *tx.gopher_rules(F.col("text")))
    return metrics.select(
        "*", tx.gopher_passes(min_words=_GOPHER_MINW)
    )


# --------------------------------------------------------------------------
# Single-pass text profile: word/token counts, language ID, quality score,
# fingerprint — one projection, zero shuffles at any scale.
# --------------------------------------------------------------------------
@register(
    "text_profile",
    oracle=f"""
    WITH {PROFILE_CTE}
    SELECT doc_id, n_words, n_tokens, lang_pred, stopword_ratio,
           punct_ratio, mean_word_len, quality, fingerprint
    FROM profile
    """,
    tags=("text",),
)
def text_profile(spark, sf_dir):
    docs = table(spark, sf_dir, "documents", fan=False)
    # spread the expression-heavy projection ONLY when the input is
    # under-split (single-file local parquet) — at warehouse scale the scan
    # already has enough splits and this shuffle would move the whole corpus
    sc = spark.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    prof = tx.profile(docs)
    return prof.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "lang_pred",
        "stopword_ratio",
        "punct_ratio",
        "mean_word_len",
        "quality",
        "fingerprint",
    )


# --------------------------------------------------------------------------
# Corpus quality rollup by (declared) language and source — the filtering
# dashboard a training-data pipeline drives filtering decisions from.
# --------------------------------------------------------------------------
@register(
    "text_quality_by_lang",
    oracle=f"""
    WITH {PROFILE_CTE}
    SELECT d.lang, d.source,
           COUNT(*) AS n_docs,
           {sql_davg('p.quality', 6)} AS avg_quality,
           {sql_davg('p.mean_word_len', 6)} AS avg_word_len,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN profile p ON d.doc_id = p.doc_id
    GROUP BY d.lang, d.source
    ORDER BY d.lang, d.source
    """,
    tags=("text",),
)
def text_quality_by_lang(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    prof = tx.profile(docs).select("doc_id", "quality", "mean_word_len")
    return (
        docs.join(prof, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("quality"), 6, "avg_quality"),
            davg(F.col("mean_word_len"), 6, "avg_word_len"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Token accounting: whitespace vs BPE-ish tokenization, chars/token.
# --------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
           (CAST(length(text) AS DOUBLE)
            / CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS DOUBLE)) AS chars_per_token
    FROM documents
    """,
    tags=("text",),
)
def text_token_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    n_bpe = tx.token_count_regex(t).cast("bigint")
    return docs.select(
        "doc_id",
        tx.word_count(t).cast("bigint").alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length(t).cast("double") / n_bpe.cast("double")).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# PII scrubbing: email / IPv4 / SSN-shaped / phone-run redaction — the
# standard pre-training scrub, as a chain of codegen'd regexp_replace
# passes (patterns portable between Java regex and RE2).
# --------------------------------------------------------------------------
@register(
    "text_pii_scrub",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\+?\d[\d()\- ]{7,}\d', '<PHONE>', 'g') AS scrubbed,
           (text != regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\+?\d[\d()\- ]{7,}\d', '<PHONE>', 'g')) AS had_pii
    FROM documents
    """,
    tags=("text",),
)
def text_pii_scrub(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    scrubbed = tx.scrub_pii(F.col("text"))
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (F.col("text") != scrubbed).alias("had_pii"),
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling: md5-prefix predicate per document,
# per-language acceptance counts. Reproducible across engines and runs with
# zero RNG/coordination state — the property a training sample must have.
# --------------------------------------------------------------------------
@register(
    "docs_sample_stratified",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 5)
                              < '28f5c' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(MIN(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 5)
                              < '28f5c' THEN doc_id END) AS BIGINT) AS first_sampled
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
    tags=("text",),
)
def docs_sample_stratified(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.70x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    keep = tx.hash_sample(F.col("doc_id"), "28f5c")  # ≈16% rate
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(keep.cast("int")).cast("bigint").alias("n_sampled"),
            F.min(F.when(keep, F.col("doc_id"))).cast("bigint").alias(
                "first_sampled"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Sequence packing: assign docs to fixed-token-budget training sequences
# (pack = floor(tokens-before / budget) within each language, doc_id
# order). One window pass; shuffle key = the packing group.
# --------------------------------------------------------------------------
@register(
    "docs_pack_sequences",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT lang, n_tokens,
               CAST(floor(
                 COALESCE(SUM(n_tokens) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / 8192.0) AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT lang, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
    tags=("text",),
)
def docs_pack_sequences(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        tx.token_count_regex(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    packed = tx.pack_sequences(
        toks, budget=8192, part_cols=["lang"], order_col="doc_id"
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


# --------------------------------------------------------------------------
# Per-doc key terms: tf × linear idf (N/df). The linear-idf variant keeps
# every arithmetic op exactly IEEE-representable (multiply + divide only, no
# transcendental log whose last ULP differs between libm and the JVM), so
# the oracle reproduces bit-identical scores. Shuffle shape: tf agg on
# (doc, term), df agg on term, a term-keyed join (vocabulary-sized — NOT
# force-broadcast; AQE decides), and the per-doc top-k window.
# --------------------------------------------------------------------------
@register(
    "docs_keyterms",
    oracle=r"""
    WITH wx AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM wx GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               (CAST(t.tf AS DOUBLE)
                * (CAST(n.n AS DOUBLE) / CAST(d.df AS DOUBLE))) AS score
        FROM tf t JOIN df d USING (term) CROSS JOIN n
    )
    SELECT doc_id, term,
           CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df,
           score,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term
        ) AS rank FROM scored
    ) WHERE rank <= 3
    """,
    tags=("text",),
)
def docs_keyterms(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.64x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents", fan=False)
    wx = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    )
    tf = wx.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # df as a window count over tf (one row per doc containing the term):
    # a groupBy+join formulation would compute the tf aggregation TWICE
    # (the unpersisted subtree duplicates) and add a join shuffle; the
    # window reuses tf's rows in place with a single term-keyed exchange.
    w_df = Window.partitionBy("term")
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df).cast("bigint"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# --------------------------------------------------------------------------
# Fixed-size deterministic sample per stratum ("hash reservoir"): the k
# docs with the smallest md5 rank within each source. Unlike the rate-based
# stratified sample, the output size per group is exact. Window is keyed by
# source — the shuffle a per-stratum sampler needs anyway, never global.
# --------------------------------------------------------------------------
@register(
    "docs_sample_topk_per_source",
    oracle="""
    SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 10
    """,
    tags=("text",),
)
def docs_sample_topk_per_source(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "source", "doc_id", F.row_number().over(w).cast("int").alias("rk")
        )
        .filter(F.col("rk") <= 10)
    )


# --------------------------------------------------------------------------
# Context-window chunking: overlapping fixed-token chunks per doc, pure
# per-row slice arithmetic (sequence of starts + slices), zero shuffles.
# --------------------------------------------------------------------------
@register(
    "docs_chunk_overlap",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               list_transform(range(0, greatest(len(w) - 10 - 1, 0) + 1, 30),
                              s -> w[s+1:s+40]) AS cl
        FROM d
    )
    SELECT doc_id,
           unnest(list_transform(cl, (x, i) -> CAST(i - 1 AS INT))) AS chunk_id,
           unnest(list_transform(cl, x -> array_to_string(x, ' '))) AS chunk_text,
           unnest(list_transform(cl, x -> CAST(len(x) AS BIGINT))) AS n_chunk_tokens
    FROM c
    """,
    tags=("text",),
)
def docs_chunk_overlap(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return tx.chunk_documents(docs, chunk_tokens=40, overlap=10)


# --------------------------------------------------------------------------
# Compression-ratio redundancy signal (RefinedWeb/Dolma): zlib is not
# SQL-expressible → rows-only gate entry; tests/test_operators.py pins the
# semantics (repetitive text compresses harder) and determinism.
# --------------------------------------------------------------------------
@register("text_compression_ratio", oracle=None, tags=("text",))
def text_compression_ratio(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.80x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    docs = table(spark, sf_dir, "documents", fan=False)
    out = tx.compression_ratio_df(docs)
    return (
        out.groupBy((F.floor(F.col("compression_ratio") * 10)).alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("raw_bytes").cast("bigint").alias("raw_bytes"),
            F.sum("zlib_bytes").cast("bigint").alias("zlib_bytes"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS; Schleimer et al. SIGMOD'03): shift-tolerant
# local fingerprints — the rolling-hash document-fingerprinting stage of a
# plagiarism/near-dup pipeline. md5 hex is the hash domain (any total order
# winnows; md5 is bit-identical in both engines), so the full algorithm —
# positional k-grams, sliding-window min, distinct selection — is
# oracle-checked end to end. Output: per-doc fingerprint count + an
# order-insensitive digest of the selected set.
# --------------------------------------------------------------------------
@register(
    "docs_winnow_fingerprints",
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\s+') AS ws
        FROM documents
    ),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(ws[i + 1 : i + 4], ' ') AS gram
        FROM words, UNNEST(range(len(ws) - 3)) AS t(i)
    ),
    winmin AS (
        SELECT doc_id, pos,
               MIN(md5(gram)) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               ) AS fp
        FROM grams
    ),
    fps AS (
        SELECT DISTINCT doc_id, fp FROM winmin WHERE pos >= 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           md5(string_agg(fp, '' ORDER BY fp)) AS set_digest
    FROM fps GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text",),
)
def docs_winnow_fingerprints(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    fps = tx.winnow_fingerprints(docs, k=4, window=4)
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("fp")))
            ).alias("set_digest"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# BM25 top-k retrieval (operators/retrieval.py). The compared columns are
# (query_id, doc_id, rank) — identical (tf, df, dl) integer inputs produce
# identical doubles in both engines for every arithmetic step except ln,
# whose last ULP may differ between libm and the JVM; ranks are compared
# instead of raw scores so a ULP never flips the hash (ties break on
# doc_id in both engines). Queries are a fixed literal term list over the
# synthetic vocabulary.
# --------------------------------------------------------------------------
_BM25_QUERIES = [
    (0, "spark"), (0, "join"),
    (1, "window"), (1, "merge"), (1, "sort"),
    (2, "customer"), (2, "filter"),
    (3, "stream"), (3, "batch"), (3, "nosuchterm"),
]
_BM25_Q_SQL = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)


@register(
    "docs_bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t.term
        FROM documents,
             UNNEST(list_filter(
                 string_split_regex(lower(text), '[^a-z0-9]+'),
                 x -> x <> ''
             )) AS t(term)
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
        FROM dl
    ),
    q(query_id, term) AS (VALUES {_BM25_Q_SQL}),
    dft AS (
        SELECT term, COUNT(*) AS df FROM tf
        WHERE term IN (SELECT DISTINCT term FROM q)
        GROUP BY 1
    ),
    qterms AS (
        SELECT q.query_id, q.term, COALESCE(dft.df, 0) AS df
        FROM q LEFT JOIN dft USING (term)
    ),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               SUM(
                   ln(1.0 + (s.n_docs - qt.df + 0.5) / (qt.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
               ) AS score
        FROM tf
        JOIN qterms qt USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, rank FROM (
        SELECT CAST(query_id AS BIGINT) AS query_id,
               doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id ASC
               ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
    tags=("text", "retrieval"),
)
def docs_bm25_topk(spark, sf_dir):
    """Okapi BM25 lexical retrieval, the corpus-audit / contamination-probe
    primitive (operators/retrieval.py docstring has the 100 TB shape:
    broadcast query vocabulary, no posting reshuffle, no global sort)."""
    from ..operators.retrieval import bm25_topk

    docs = table(spark, sf_dir, "documents")
    queries = local_df(spark, 
        _BM25_QUERIES, "query_id long, term string"
    )
    return bm25_topk(docs, queries, k=10)


# --------------------------------------------------------------------------
# Corpus-wide boilerplate mining: word 5-grams by document frequency.
# Integer-count output, deterministic (df DESC, gram) ordering — no float
# anywhere, so the oracle is exact. The df >= min_df filter runs BEFORE
# any ordering; only the tiny surviving set is sorted.
# --------------------------------------------------------------------------
@register(
    "docs_boilerplate_ngrams",
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\s+') AS ws
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(ws[i + 1 : i + 5], ' ') AS gram
        FROM words, UNNEST(range(len(ws) - 4)) AS t(i)
    ),
    counted AS (
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS df
        FROM grams GROUP BY gram HAVING COUNT(*) >= 5
    )
    SELECT gram, df FROM counted
    ORDER BY df DESC, gram LIMIT 20
    """,
    tags=("text", "quality"),
)
def docs_boilerplate_ngrams(spark, sf_dir):
    """Template/boilerplate detector (operators/text.boilerplate_ngrams):
    highest-document-frequency word 5-grams — the blocklist input for
    span dedup / line filtering."""
    docs = table(spark, sf_dir, "documents")
    return tx.boilerplate_ngrams(docs, n=5, min_df=5, top=20)


# --------------------------------------------------------------------------
# Hashed linear quality scorer (fastText-shape, operators/text.py
# hashed_linear_score): per-doc token-hash feature sum under pinned
# weights — integer-exact, so the full pipeline (tokenize → md5 bucket →
# weight → per-doc sum → keep decision) is oracle-checked end to end.
# --------------------------------------------------------------------------
@register(
    "docs_quality_linear",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ),
    wt AS (
        SELECT doc_id,
               ((CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 64)
                * 2654435761) % 1000 - 500 AS w
        FROM toks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w) AS BIGINT) AS score_num,
           SUM(w) > 0 AS keep
    FROM wt
    GROUP BY doc_id
    """,
    tags=("text", "quality"),
)
def docs_quality_linear(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return tx.hashed_linear_score(docs, dim=64)


# --------------------------------------------------------------------------
# Per-source token-budget selection: keep each source's documents (in
# deterministic doc_id order) until a token budget fills — the mixture
# allocator step between source weighting (docs_source_mix) and shard
# export. Production form: operators/budget.py's shard-partial-sums +
# broadcast-prefix-offsets shape — a dominant source at 100 TB spans many
# range shards instead of one giant single-task sorted window partition.
# The DuckDB oracle below is the plain-window verification twin.
# --------------------------------------------------------------------------
@register(
    "docs_token_budget",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
               ) AS cum
        FROM t
    )
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= 20000
    """,
    tags=("text", "curation"),
)
def docs_token_budget(spark, sf_dir):
    from ..operators.budget import grouped_cumulative_sum

    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        tx.word_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    return grouped_cumulative_sum(
        t,
        "source",
        ["doc_id"],
        "n_tokens",
        cum_col="cum_tokens",
        budget=20000,
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


# --------------------------------------------------------------------------
# Frequent terms with bounded memory: Misra-Gries candidate generation per
# partition + exact recount of candidates only (operators/sketch.py). The
# result is EXACT — identical to GROUP BY ... HAVING count >= support — so
# the oracle is the plain SQL; the difference is the physical plan: MG keeps
# per-task state at O(total/support) regardless of vocabulary size, and the
# shuffle carries candidates only. Support = 0.5% of the token stream.
# --------------------------------------------------------------------------
@register(
    "docs_heavy_hitters",
    oracle=r"""
    WITH terms AS (
        SELECT u.term AS term
        FROM documents,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS u(term)
    ),
    thr AS (
        SELECT GREATEST(1, CAST(floor(COUNT(*) / 200.0) AS BIGINT)) AS s
        FROM terms
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM terms GROUP BY term
    HAVING COUNT(*) >= (SELECT s FROM thr)
    """,
    tags=("text", "sketch"),
)
def docs_heavy_hitters(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.62x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators.sketch import frequent_items

    docs = table(spark, sf_dir, "documents", fan=False)
    terms = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    total = terms.count()
    support = max(1, total // 200)
    return frequent_items(terms, "term", support, total=total).select(
        "term", F.col("n").cast("bigint").alias("n")
    )


# --------------------------------------------------------------------------
# X99: real BPE tokenization. Train merges from the corpus's word-frequency
# table (ONE distributed count pass; the merge loop runs over the bounded
# vocabulary table) and report per-source token statistics under the
# trained tokenizer — the budget numbers that match a serving tokenizer
# instead of a whitespace proxy. Rows-only (an iterative merge loop has no
# SQL twin); value-level evidence is the pinned agreement test in
# tests/test_rows_only_agreement.py.
# --------------------------------------------------------------------------
@register("docs_bpe_token_stats", oracle=None, tags=("text", "tokenize"))
def docs_bpe_token_stats(spark, sf_dir):
    # fan=False: r10 fan A/B, nofan/fan=0.72x — the scan fan-out
    # exchange costs more than the trivial map side it parallelizes
    # (interleaved best-of-3; see OPTIMIZATION_r10.md fan study)
    from ..operators.bpe import bpe_token_stats, fit_bpe
    from .core import table

    docs = table(spark, sf_dir, "documents", fan=False).select("source", "text")
    merges = fit_bpe(
        docs, "text", num_merges=64, min_word_freq=2, max_words=50_000
    )
    return bpe_token_stats(docs, "text", "source", merges).orderBy("source")


# --------------------------------------------------------------------------
# X117: temperature-sampled source mix — the multilingual pretraining
# staple (sample weight ∝ n^α, α=0.5 upsampling tail languages relative
# to proportional). Deterministic and cross-engine exact end-to-end:
# per-language inclusion probability p = min(1, q·N·√n / (S·n)) with
# S = Σ√n summed through DECIMAL (order-independent — the one
# float-ordering hazard), quantized to a 32-bit hex threshold, and
# membership decided by md5(doc_id) prefix < threshold (the suite's
# hash-sampling idiom). Scale shape: one tiny per-language agg
# broadcast back over the corpus — no shuffle of the documents.
# --------------------------------------------------------------------------
@register(
    "docs_temperature_mix",
    oracle="""
    WITH stats AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SQRT(COUNT(*)) AS DECIMAL(28,10)) AS w
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS total,
               CAST(SUM(w) AS DOUBLE) AS s
        FROM stats
    ),
    thr AS (
        -- p >= 1 means KEEP EVERYTHING: 'g' sorts above every hex char,
        -- so no md5 prefix (not even 'ffffffff') is excluded
        SELECT lang, n,
               CASE WHEN 0.6 * total * SQRT(n) / (s * n) >= 1.0 THEN 'g'
                    ELSE LPAD(LOWER(TO_HEX(CAST(FLOOR(
                        (0.6 * total * SQRT(n) / (s * n))
                        * 4294967296.0) AS BIGINT))), 8, '0')
               END AS h
        FROM stats, tot
    )
    SELECT d.lang, CAST(t.n AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                              < t.h THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(SUM(CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                              < t.h THEN d.doc_id ELSE 0 END) AS BIGINT)
               AS sum_sampled_ids
    FROM documents d JOIN thr t USING (lang)
    GROUP BY d.lang, t.n ORDER BY d.lang
    """,
    tags=("text", "sampling"),
)
def docs_temperature_mix(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    # ONE corpus scan computes the per-language sizes; the handful of
    # rows (bounded by #languages) collects and the threshold arithmetic
    # re-runs over a local frame — without this, the stats lineage feeds
    # both the total and the thresholds and the corpus is scanned 3×
    stats_rows = (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sqrt(F.count(F.lit(1))).cast("decimal(28,10)").alias("w"),
        )
        .collect()
    )
    stats = local_df(spark, stats_rows, "lang string, n bigint, w decimal(28,10)")
    tot = stats.agg(
        F.sum("n").cast("double").alias("total"),
        F.sum("w").cast("double").alias("s"),
    )
    thr = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "p",
            F.lit(0.6)
            * F.col("total")
            * F.sqrt("n")
            / (F.col("s") * F.col("n")),
        )
        .withColumn(
            "h",
            # p >= 1 means KEEP EVERYTHING: 'g' sorts above every hex
            # char, so no md5 prefix (not even 'ffffffff') is excluded
            F.when(F.col("p") >= 1.0, F.lit("g")).otherwise(
                F.lpad(
                    F.lower(
                        F.hex(
                            F.floor(
                                F.col("p") * F.lit(4294967296.0)
                            ).cast("bigint")
                        )
                    ),
                    8,
                    "0",
                )
            ),
        )
        .select("lang", "n", "h")
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < F.col(
        "h"
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .groupBy("lang", "n")
        .agg(
            F.sum(keep.cast("int")).cast("bigint").alias("n_sampled"),
            F.sum(F.when(keep, F.col("doc_id")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("sum_sampled_ids"),
        )
        .select(
            "lang",
            F.col("n").alias("n_total"),
            "n_sampled",
            "sum_sampled_ids",
        )
        .orderBy("lang")
    )
