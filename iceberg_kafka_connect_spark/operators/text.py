"""Text analysis operators for training-data pipelines.

All pure Catalyst expressions (no UDFs): language-ID by stopword-hit
heuristic, quality scoring, token counting (whitespace + BPE-ish regex), and
document fingerprinting. Each returns Column expressions so they compose
into any projection; `profile()` bundles them into one single-pass transform
— at 100 TB this whole module is one scan, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword anchors (deterministic heuristic, not a model).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist"),
}

# BPE-ish token regex: letter runs, digit runs, or single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: regexp_count is JVM-side and codegen'd."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def _stopword_hits(w: Column, stopwords: tuple[str, ...]) -> Column:
    # single-arg lambda: F.filter passes (element, index) to 2-arg lambdas
    return F.size(F.filter(w, lambda x: x.isin(*stopwords)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of words that are language-anchor stopwords."""
    w = F.split(F.trim(F.lower(text)), r"\s+")
    hits = _stopword_hits(w, STOPWORDS[lang])
    return hits.cast("double") / F.size(w).cast("double")


def detect_language(text: Column) -> Column:
    """Argmax of per-language stopword-hit counts; 'und' when nothing hits.
    Deterministic tie-break by language code order."""
    w = F.split(F.trim(F.lower(text)), r"\s+")
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(STOPWORDS):
        hits = _stopword_hits(w, STOPWORDS[lang])
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    w = F.split(F.trim(text), r"\s+")
    total = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.size(w).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length documents and
    stopword presence, penalizes punctuation soup and very short texts.
    Deterministic arithmetic only — reproducible in any engine."""
    n_words = word_count(text).cast("double")
    length_term = F.least(n_words / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text, "en") * 5.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(text) * 4.0, F.lit(0.0))
    wl = mean_word_length(text)
    wl_term = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        length_term * 0.3 + stop_term * 0.3 + punct_term * 0.2 + wl_term * 0.2
    )


# Gopher document-quality rule battery (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A1.1).
# Thresholds are the published ones; word-count bounds are parameters since
# verification corpora run far shorter than web documents.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_BULLET_LINE_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_LINE_RATIO = 0.3

_SYMBOL_RE = r"#|\.{3}|…"
_BULLET_RE = r"^\s*[-*•]"
_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def gopher_rules(text: Column) -> list[Column]:
    """Per-document Gopher rule metrics, as a single-pass projection (pure
    Catalyst, one scan, zero shuffles at any corpus size):

    n_words bounds · mean word length in [3,10] · symbol-to-word ratio
    (#/ellipsis) · fraction of words containing an alphabetic character ·
    presence of >=2 canonical English stopwords · fraction of lines starting
    with a bullet · fraction of lines ending with an ellipsis.

    Returns aliased metric Columns for ``df.select(id, *gopher_rules(col))``;
    derive the gate with :func:`gopher_passes` over the projected columns so
    each (expensive) signal is evaluated once, not re-inlined into the gate.
    """
    w = F.split(F.trim(text), r"\s+")
    wl = F.split(F.trim(F.lower(text)), r"\s+")
    lines = F.split(text, r"\n")
    nw = F.size(w).cast("double")
    nl = F.size(lines).cast("double")
    n_words = F.size(w).cast("bigint").alias("n_words")
    mwl = mean_word_length(text).alias("mean_word_len")
    symbol_ratio = (
        F.regexp_count(text, F.lit(_SYMBOL_RE)).cast("double") / nw
    ).alias("symbol_ratio")
    alpha_ratio = (
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw
    ).alias("alpha_word_ratio")
    n_stop = sum(
        F.array_contains(wl, s).cast("int") for s in GOPHER_STOPWORDS
    ).cast("bigint").alias("n_stopword_hits")
    bullet_ratio = (
        F.size(F.filter(lines, lambda x: x.rlike(_BULLET_RE))).cast("double")
        / nl
    ).alias("bullet_line_ratio")
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda x: x.rlike(_ELLIPSIS_RE))).cast("double")
        / nl
    ).alias("ellipsis_line_ratio")
    return [
        n_words,
        mwl,
        symbol_ratio,
        alpha_ratio,
        n_stop,
        bullet_ratio,
        ellipsis_ratio,
    ]


def gopher_passes(
    min_words: int = 50, max_words: int = 100_000
) -> Column:
    """AND of all Gopher rules over the metric columns :func:`gopher_rules`
    projected (second select — evaluates each signal exactly once)."""
    return (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") < GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_ratio") > GOPHER_MIN_ALPHA_WORD_RATIO)
        & (F.col("n_stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
        & (F.col("bullet_line_ratio") <= GOPHER_MAX_BULLET_LINE_RATIO)
        & (F.col("ellipsis_line_ratio") <= GOPHER_MAX_ELLIPSIS_LINE_RATIO)
    ).alias("passes")


def compression_ratio_df(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> "DataFrame":
    """(id, raw_bytes, zlib_bytes, compression_ratio) per document — the
    RefinedWeb/Dolma-style redundancy signal: machine-generated or
    boilerplate-heavy text compresses far better than natural prose (ratio
    = compressed/raw; low ratio ⇒ repetitive).

    zlib isn't expressible in Catalyst, so this is the one text signal that
    runs as an Arrow-batched mapInPandas (stdlib zlib per document inside
    the batch loop — no per-row Python round trips). Deterministic: zlib
    at a fixed level is a pure function of the bytes. One scan, zero
    shuffles at any scale."""
    import pandas as pd  # noqa: PLC0415

    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, raw_bytes long, zlib_bytes long, "
        "compression_ratio double"
    )

    def score(batches):
        import zlib  # noqa: PLC0415

        for pdf in batches:
            if pdf.empty:
                continue
            # NULL text scores as empty — curation signals must survive
            # dirty rows, not crash the scan
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            raw_n = raw.str.len()
            comp_n = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": raw_n,
                    "zlib_bytes": comp_n,
                    "compression_ratio": comp_n / raw_n.clip(lower=1),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(score, schema)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace/case-normalized text.
    (The rolling-hash variant for shift-tolerant matching is the simhash in
    operators/dedup.py; this one is the exact-content key.)"""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


# PII patterns: portable across Java regex (Spark) and RE2 (DuckDB) — no
# backrefs, no lookaround, ASCII word boundaries only.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\+?\d[\d()\- ]{7,}\d", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Redact emails / IPv4s / SSN-shaped ids / phone-number runs with typed
    placeholders. A chain of JVM-side regexp_replace — one codegen'd pass
    per pattern, zero shuffles, the standard pre-training scrub stage."""
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def hash_sample(key: Column, hex_threshold: str = "28f5c") -> Column:
    """Deterministic, engine-portable sampling predicate: keep a row when
    the md5-hex prefix of its key sorts below ``hex_threshold``. 5 hex chars
    → rate granularity 1/16^5 ≈ 1e-6 (e.g. '28f5c' ≈ 16%). Reproducible
    across engines, scales with zero coordination (no RNG state), and is
    stable under re-runs — the property a training-data sample must have."""
    return F.substring(F.md5(key.cast("string")), 1, len(hex_threshold)) < F.lit(
        hex_threshold
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    part_cols: list[str],
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences ("packs"):
    within each partition group, in deterministic ``order_col`` order, a doc
    goes to pack floor(tokens-before-it / budget). One window pass — the
    shuffle key is the partition columns, exactly the grouping a packing
    job needs anyway. Docs longer than the budget occupy packs alone."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    )


def profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Single-pass text profile: all metrics in one projection."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        word_count(t).alias("n_words"),
        token_count_regex(t).alias("n_tokens"),
        detect_language(t).alias("lang_pred"),
        stopword_ratio(t).alias("stopword_ratio"),
        punct_ratio(t).alias("punct_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def _lower_words(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def gram_array(w: Column, n: int) -> Column:
    """Word n-grams of an array column (empty below n words). Built by
    zip_with-ing the array against its own shifted slices — ~2.6× faster
    than transform(sequence)+element_at, which defeats codegen on the
    per-element index arithmetic. The trailing zip positions (shorter
    shifted slice → null) are filtered out, so the result has exactly
    max(0, size-n+1) grams."""
    if n == 1:
        return w
    g = w
    for j in range(1, n):
        s = F.slice(w, j + 1, F.greatest(F.size(w) - F.lit(j), F.lit(0)))
        g = F.zip_with(
            g,
            s,
            lambda a, b: F.when(
                a.isNotNull() & b.isNotNull(), F.concat(a, F.lit(" "), b)
            ),
        )
    return F.filter(g, lambda x: x.isNotNull())


def top_word_ratio(text: Column) -> Column:
    """Frequency of the single most common word over total words — the
    Gopher 'most common word' repetition signal. The max frequency is the
    longest run of equal adjacent elements in the SORTED word array, found
    by one aggregate() scan — O(n log n) per doc (the naive
    distinct×filter formulation is O(distinct×n), quadratic on
    natural text), zero shuffles."""
    w = _lower_words(text)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(F.array_sort(w), zero, step, lambda a: a["best"])
    return best.cast("double") / F.size(w).cast("double")


def dup_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier n-gram
    in the same document (C4/Gopher 'duplicate n-gram fraction'). 0.0 for
    docs shorter than n words."""
    g = gram_array(_lower_words(text), n)
    return F.when(
        F.size(g) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(g)).cast("double") / F.size(g).cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_filter(
    text: Column,
    max_top_word_ratio: float = 0.125,
    max_dup_2gram: float = 0.06,
    max_dup_3gram: float = 0.05,
    min_words: int = 5,
) -> Column:
    """Gopher-style repetition gate: a doc passes when no repetition signal
    exceeds its threshold. All signals are single-pass Catalyst expressions;
    the whole gate is a filter pushed into the scan projection."""
    return (
        (word_count(text) >= min_words)
        & (top_word_ratio(text) <= max_top_word_ratio)
        & (dup_ngram_ratio(text, 2) <= max_dup_2gram)
        & (dup_ngram_ratio(text, 3) <= max_dup_3gram)
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document's whitespace tokens into fixed-size overlapping
    chunks — the context-window splitting step of a training pipeline
    (pack_sequences then bins the CHUNKS; this op creates them). Pure
    per-row slice arithmetic: chunk start positions are a sequence() with
    stride = chunk_tokens - overlap, each chunk a slice of the word array —
    one scan, zero shuffles at any corpus size.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens); a doc shorter than
    one chunk yields exactly one chunk (itself)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    # a chunk starts at s only while s <= size - overlap - 1: a later start
    # would add no words beyond the previous chunk's coverage (the old
    # size-1 bound emitted a trailing chunk fully contained in its
    # predecessor whenever stride < size <= chunk_tokens)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(w) - F.lit(overlap) - 1, F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(starts, lambda s: F.slice(w, s + F.lit(1), chunk_tokens))
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__c")
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.concat_ws(" ", F.col("__c")).alias("chunk_text"),
        F.size("__c").cast("bigint").alias("n_chunk_tokens"),
    )


def source_mix_resample(
    docs: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-based source re-mixing — the multinomial smoothing step
    of pretraining data recipes (Pile / multilingual-LM style): target share
    of source s ∝ n_s^temperature, so t=1 keeps natural proportions and
    t→0 flattens toward uniform, boosting small sources' RELATIVE share.

    Keep fraction per source: kept counts k_s ∝ n_s^t requires
    f_s ∝ n_s^(t-1); sampling without replacement can only subsample, so
    normalize at the SMALLEST source — f_s = (n_min / n_s)^(1 - t). The
    smallest source keeps everything; every larger source is deterministically
    thinned until relative shares match the tempered mix. A row survives when
    its md5-hex prefix (engine-portable, coordination-free — same idiom as
    hash_sample) falls under its source's acceptance threshold.

    Scale shape: per-source counts are one partial-agg groupBy over the
    source column (tiny result, broadcast back); the filter itself is a
    pure projection — no per-row shuffle at any corpus size.
    """
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__nmin"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        F.pow(F.col("__nmin") / F.col("__n"), F.lit(1.0 - temperature)).alias(
            "__rate"
        ),
    )
    # acceptance threshold as a 6-hex-digit string; rate 1 → 'g', which
    # sorts above every hex character, keeping the whole source
    thresh = F.when(F.col("__rate") >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%06x", F.floor(F.col("__rate") * F.lit(16**6)).cast("int")
        )
    )
    rates = rates.withColumn("__thresh", thresh).drop("__rate")
    # null-safe join: a NULL source is a legitimate group (scraped corpora
    # often miss metadata) — a plain equi-join would silently drop it
    r = rates.withColumnRenamed(source_col, "__src")
    return (
        docs.join(
            F.broadcast(r),
            F.col(source_col).eqNullSafe(F.col("__src")),
        )
        .filter(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 6)
            < F.col("__thresh")
        )
        .drop("__thresh", "__src")
    )


def hashed_relevance(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_hex: int = 2,
) -> DataFrame:
    """DSIR-style domain-relevance scoring (Xie et al. 2023,
    arXiv:2302.03169 "Data Selection for Language Models via Importance
    Resampling"): score every document by how much its hashed-unigram
    profile looks like a target domain (rows where ``target`` is true)
    versus the raw corpus, then select/resample on the score.

    DSIR weights are log p_target(f)/p_raw(f) sums; this uses the linear
    discriminant Σ_w [p_t(b(w)) − p_r(b(w))] instead — same feature space
    (hashed n-gram buckets), same sign, but exactly reproducible across
    engines because it stays in INTEGER arithmetic until one final
    division: the per-word term p_t − p_r is computed as
    c_t·N_r − c_r·N_t over the bucket counts (exact bigints), summed per
    document, and normalized once by N_t·N_r·n_words. (At web scale swap
    the bigint sums for doubles — the exactness only matters for oracle
    hash-parity.)

    Buckets are the first ``prefix_hex`` hex chars of md5(word) —
    engine-portable (same idiom as hash_sample), 16^prefix_hex buckets.

    Scale shape: the bucket table is ONE partial-agg groupBy over exploded
    words (16^prefix_hex rows out), collected and folded back into the
    per-document pass as a literal map — the scoring pass is then a pure
    projection: zero joins, zero shuffles, one corpus scan each for stats
    and scoring.

    Output: (id, n_words, score_num, relevance, toward_target).
    """
    words = _lower_words(F.col(text_col))
    bucket = lambda w: F.substring(F.md5(w), 1, prefix_hex)  # noqa: E731
    stats = (
        docs.select(
            F.explode(words).alias("__w"), target.alias("__tgt")
        )
        .select(bucket(F.col("__w")).alias("__b"), "__tgt")
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum(F.col("__tgt").cast("long")).alias("n_tgt"),
        )
        .collect()
    )
    n_raw = sum(r.n_all for r in stats)
    n_tgt = sum(r.n_tgt for r in stats)
    if n_tgt == 0 or n_raw == 0:
        raise ValueError("hashed_relevance: empty corpus or target slice")
    # per-bucket integer weight: c_t·N_r − c_r·N_t  (≡ sign of p_t − p_r)
    weight = {r["__b"]: r.n_tgt * n_raw - r.n_all * n_tgt for r in stats}
    wmap = F.create_map(
        *[F.lit(x) for kv in weight.items() for x in kv]
    )
    score = F.aggregate(
        F.transform(words, lambda w: wmap[bucket(w)]),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    nw = F.size(words)
    return docs.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        score.alias("score_num"),
        (
            score.cast("double")
            / (
                F.lit(float(n_tgt) * float(n_raw))
                * nw.cast("double")
            )
        ).alias("relevance"),
        (score > 0).alias("toward_target"),
    )


def lm_surprise(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_hex: int = 2,
) -> DataFrame:
    """CCNet-style LM-perplexity filtering signal (Wenzek et al. 2020,
    arXiv:1911.00359 train a LM on reference text and bucket documents by
    perplexity; here the LM is a hashed-unigram model trained on the corpus
    itself in one aggregation pass).

    Per-token information content is quantized to whole bits so the score
    stays in INTEGER arithmetic end-to-end (the same engine-parity reasoning
    as hashed_relevance): info(w) = floor(log2 N) − floor(log2 c(w)) ≈
    −log2 p(w), computed exactly as bit_length(N) − bit_length(c) — no
    transcendental ever evaluated, so Spark and an ANSI-SQL oracle agree
    bit-for-bit. A document's mean surprise is high when its tokens are
    corpus-rare (CCNet's "tail"), low for head-boilerplate.

    Scale shape: bucket counts are ONE partial-agg groupBy over exploded
    words (16^prefix_hex rows out), folded back as a literal map — the
    scoring pass is a pure projection: zero joins, zero shuffles, one
    corpus scan for stats and one for scoring.
    """
    words = _lower_words(F.col(text_col))
    bucket = lambda w: F.substring(F.md5(w), 1, prefix_hex)  # noqa: E731
    stats = (
        docs.select(F.explode(words).alias("__w"))
        .select(bucket(F.col("__w")).alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n_total = sum(r.c for r in stats)
    if n_total == 0:
        raise ValueError("lm_surprise: empty corpus")
    info = {r["__b"]: n_total.bit_length() - int(r.c).bit_length() for r in stats}
    imap = F.create_map(*[F.lit(x) for kv in info.items() for x in kv])
    s = F.aggregate(
        F.transform(words, lambda w: imap[bucket(w)]),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    nw = F.size(words)
    return docs.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        s.alias("surprise_bits"),
        (s.cast("double") / nw.cast("double")).alias("mean_surprise"),
    )


def shard_shuffle(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every document
    gets a (shard, pos) address that is a pseudo-random but reproducible
    permutation of the corpus — the standard pre-training export step
    (shards consumed round-robin see an unbiased stream).

    NOT a global sort: shard = md5(id) mod n_shards needs no comparison at
    all, and pos is a row_number window PARTITIONED BY shard — each shard
    ranks independently after one hash-keyed shuffle, so the op scales as
    n_shards independent sorts of corpus/n_shards rows, never a single
    total order. The hash is md5 (engine-portable), the within-shard order
    key is the full digest with the id as tiebreak, so the permutation is
    stable across engines and runs.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    # first 15 hex chars = 60 bits — fits a signed 64-bit long exactly
    shard = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        docs.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def export_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    compression: str | None = "gzip",
) -> list[str]:
    """Materialize a corpus as deterministic training shards: one
    ``shard=K`` directory per shard of JSONL(.gz) files, rows in the
    :func:`shard_shuffle` permutation order — the artifact a data loader
    streams round-robin.

    Scale shape: shard_shuffle's hash-keyed shuffle is the ONLY data
    movement; the write clusters by shard (repartition on the shard key →
    one writer task per shard) and sorts within partitions by position, so
    each shard file is written in final order in one pass. Returns the
    shard directories written.
    """
    import glob as globmod
    import os

    sharded = shard_shuffle(docs, n_shards, id_col)
    w = sharded.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "pos"
    )
    # emit explicit nulls: a loader expecting a fixed key set per record
    # must not lose keys on null-valued fields
    writer = (
        w.write.mode("overwrite")
        .partitionBy("shard")
        .option("ignoreNullFields", "false")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_dir)
    # numeric order: lexicographic glob order puts shard=10 before shard=2
    return sorted(
        (
            d
            for d in globmod.glob(os.path.join(out_dir, "shard=*"))
            if os.path.isdir(d)
        ),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )


def source_epochs(
    docs: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_epochs: float = 1.0,
) -> DataFrame:
    """Deterministic per-source repetition — the UPSAMPLING half of a
    pretraining data recipe (source_mix_resample is the downsampling half).
    Recipes repeat curated sources fractionally ("books ×2.5, web ×0.8",
    DoReMi / Llama-style); a fractional epoch e gives every doc floor(e)
    copies and the md5-selected frac(e) share one extra copy, so corpus-
    level proportions land exactly on the recipe without any randomness.

    Output rows carry an ``epoch`` index (1..n) so downstream shuffling can
    interleave copies instead of emitting them adjacently.

    Scale shape: the recipe is a literal map folded into a projection;
    copies come from explode(sequence(1, n)) — no join, no shuffle, output
    size is exactly the recipe-weighted corpus.
    """
    emap = F.create_map(
        *[F.lit(x) for k, v in epochs.items() for x in (k, float(v))]
    )
    e = F.coalesce(emap[F.col(source_col)], F.lit(float(default_epochs)))
    base = F.floor(e).cast("int")
    frac = e - F.floor(e)
    thresh = F.format_string(
        "%06x", F.floor(frac * F.lit(16**6)).cast("int")
    )
    extra = (
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 6) < thresh
    ).cast("int")
    n = base + extra
    # sequence(1, 0) counts DOWN in Spark — guard with an empty array so
    # e < 1 prunes rows instead of duplicating them backwards
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return docs.withColumn("epoch", F.explode(seq))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    the shift-tolerant LOCAL document fingerprint the md5 whole-content
    ``fingerprint`` can't give — any shared word run of at least
    ``window + k - 1`` words between two documents is guaranteed to share
    at least one selected fingerprint.

    1. hash every word ``k``-gram at its position (md5 hex — any total
       order works for winnowing, and md5 strings are engine-portable, so
       the whole operator is DuckDB-oracle-checkable);
    2. over each sliding window of ``window`` consecutive gram hashes,
       select the minimum;
    3. a document's fingerprint set = the DISTINCT selected hashes.

    Scale shape: posexplode is linear in corpus tokens; the only shuffle is
    the per-document window (partitioned by ``id_col``, bounded by document
    length) plus the distinct — no corpus-wide joins. Fingerprint-set
    matching for near-dup *pairs* then reuses the n-gram inverted-index
    join (``dedup.ngram_jaccard_pairs`` shape) over 64-char keys.

    Returns (id_col, fp) — one row per selected fingerprint.
    """
    from pyspark.sql.window import Window

    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = gram_array(words, k)
    hashed = docs.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    ).select(id_col, "pos", F.md5("gram").alias("h"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    return (
        hashed.withColumn("fp", F.min("h").over(w))
        # only full windows select — short docs (< window+k-1 words) have
        # no fingerprint, matching the algorithm's guarantee boundary
        .filter(F.col("pos") >= window - 1)
        .select(id_col, "fp")
        .distinct()
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 5,
    top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide boilerplate mining: the word n-grams that recur across
    the MOST documents. Template headers/footers, license blurbs, and
    scraped navigation chrome show up as high-document-frequency n-grams
    long before any pairwise dedup finds them (the C4/RefinedWeb
    line-dedup motivation, applied corpus-wide) — the output is a
    blocklist feeding span dedup (`span_dedup_filter`) or a line filter.

    Scale shape: df semantics (a doc repeating its own header counts
    once) come from ``array_distinct`` BEFORE the explode — all of a
    doc's grams live in its single input row, so dedup is per-row and
    free, the same idiom as ``operators/dedup.shingles``; the ONLY
    shuffle is the groupBy(gram) count with map-side partial
    aggregation. df >= min_df filters BEFORE any ordering, then a single
    top-``top`` election over the tiny surviving set. Integer counts
    only — no float comparisons anywhere.
    """
    w = _lower_words(docs[text_col])
    grams = docs.select(
        F.explode(F.array_distinct(gram_array(w, n))).alias("gram")
    )
    df_counts = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    return (
        df_counts.orderBy(F.col("df").desc(), F.col("gram"))
        .limit(top)
        .select("gram", "df")
    )


def hashed_linear_score(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> "DataFrame":
    """fastText-style hashed linear quality scorer — the shape of every
    production quality classifier (CCNet/RefinedWeb fasttext filters,
    DCLM's fastText gate): tokens hash into ``dim`` feature buckets, the
    document's score is the token-frequency-weighted sum of per-bucket
    weights, and a threshold on the score keeps/drops the document.

    The weights here are a PINNED deterministic function of the bucket
    (``W_j = (j * 2654435761) % 1000 - 500``, a Knuth-hash spread over
    [-500, 500)) standing in for trained parameters: the distributed
    scoring machinery — the expensive, scale-sensitive part — is identical
    whether weights come from training or a formula, and the pinned form
    makes the whole pipeline integer-exact and SQL-oracle-checkable
    (bucket = md5 hex prefix, the same engine-independent hash as
    ``operators/dedup.md5_hash60``).

    Output per document: ``n_tokens`` (BIGINT), ``score_num`` (BIGINT,
    Σ_tokens W(bucket(token))), and ``keep`` (score_num > 0 — the
    mean-weight-positive decision; the real-valued score is
    score_num / (500·n_tokens), recoverable exactly).

    Scale shape: one scan; the explode fans out tokens but the per-token
    weight is a pure expression (md5 + integer ops, whole-stage codegen),
    and the ONLY shuffle is the groupBy(id) sum with map-side partial
    aggregation — at 100 TB this is a single pass like token counting.
    A trained-weights variant swaps the formula for a broadcast
    ``dim``-entry map lookup; nothing else changes.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_lower_words(F.col(text_col))).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("long")
        % dim
    )
    w = (bucket * F.lit(2654435761)) % 1000 - 500
    return (
        toks.select("id", w.alias("w"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("w").cast("bigint").alias("score_num"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "score_num",
            (F.col("score_num") > 0).alias("keep"),
        )
    )


def bigram_surprise(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_hex: int = 2,
) -> DataFrame:
    """Context-conditional LM surprise — the bigram step of CCNet-style
    perplexity filtering (Wenzek et al. 2020, arXiv:1911.00359, which
    scores documents with an n-gram LM; ``lm_surprise`` is the unigram
    floor, this conditions each token on its predecessor):
    info(w2 | w1) = −log2 p(w2 | w1) ≈ bits(c(w1 ·)) − bits(c(w1 w2)),
    quantized to whole bits via bit_length arithmetic (length(bin(x)))
    so no transcendental is ever evaluated and an ANSI-SQL oracle agrees
    bit-for-bit. Repetitive/templated text (every bigram predictable
    from its context) scores LOW even when its unigrams are rare —
    exactly the head/tail split a unigram model misses.

    Scale shape: ONE map-side-combined groupBy over exploded hashed
    bigram buckets (≤ 16^(2·prefix_hex) rows out — 64k at the default,
    Heaps-bounded in practice); context counts derive from the pair
    frame (no second corpus pass); scoring is one broadcast hash join of
    the tiny info frame onto the exploded corpus — no driver-side map
    literal (a 64k-entry Column literal would cost seconds of py4j; the
    PSL lesson), no UDF, no corpus shuffle. Documents with fewer than
    two words emit nothing (no bigram to score).
    """
    words = _lower_words(F.col(text_col))
    n = F.size(words)
    bucket = lambda w: F.substring(F.md5(w), 1, prefix_hex)  # noqa: E731
    grams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(
            bucket(a).alias("b1"), bucket(b).alias("b2")
        ),
    )
    bg = docs.select(
        F.col(id_col), F.explode(grams).alias("__g")
    ).select(id_col, F.col("__g.b1").alias("__b1"), F.col("__g.b2").alias("__b2"))
    pc = bg.groupBy("__b1", "__b2").agg(F.count(F.lit(1)).alias("__cp"))
    cc = pc.groupBy("__b1").agg(F.sum("__cp").alias("__ctx"))
    info = pc.join(cc, "__b1").select(
        "__b1",
        "__b2",
        (F.length(F.bin(F.col("__ctx"))) - F.length(F.bin(F.col("__cp"))))
        .cast("long")
        .alias("__ib"),
    )
    s = F.sum("__ib")
    nb = F.count(F.lit(1))
    return (
        bg.join(F.broadcast(info), ["__b1", "__b2"])
        .groupBy(id_col)
        .agg(
            nb.cast("long").alias("n_bigrams"),
            s.cast("long").alias("surprise_bits"),
            (s.cast("double") / nb.cast("double")).alias("mean_surprise"),
        )
    )
