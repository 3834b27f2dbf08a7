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


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace/case-normalized text.
    (The rolling-hash variant for shift-tolerant matching is the simhash in
    operators/dedup.py; this one is the exact-content key.)"""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


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
