"""Byte-Pair-Encoding tokenizer: distributed training statistics,
distributed encoding.

LLM data pipelines need REAL token counts (budgeting, packing, pricing),
not whitespace proxies. BPE (Sennrich et al. 2016, arXiv:1508.07909 —
the GPT-2/LLaMA tokenizer family) trains from a word-frequency table and
encodes by applying learned merges.

Scale split, and why it's the right one at 100 TB:

- **The corpus-sized work is distributed.** Training statistics are ONE
  map-side-combined ``groupBy(word).count()`` over the corpus (the only
  corpus pass), pruned by ``min_word_freq`` and capped to the
  ``max_words`` most frequent words — Heaps' law keeps the surviving
  table vocabulary-sized (millions), not corpus-sized (trillions).
- **The merge loop runs over the bounded word table.** Classic BPE
  iterates "count symbol pairs → merge the most frequent"; every
  iteration touches only the word-frequency table, so it runs
  driver-side over the collected table — exactly how HuggingFace
  ``tokenizers`` and SentencePiece train, and why a 100 TB corpus and a
  100 GB corpus train in the same time after the count pass.
- **Encoding is embarrassingly parallel.** The learned merge ranks
  broadcast inside an Arrow-batched ``mapInPandas`` closure
  (self-contained — no package imports on workers); each doc encodes
  independently.

Determinism: pair ties break on (count, pair) with lexicographic pair
order, so training is reproducible across partitionings — the
property the suite's agreement test pins.

Reference analogue: none (LLM-pipeline extension; the mandated
"token counting (BPE-ish regex)" operator in ``operators/text.py`` is
the cheap proxy — this is the real thing for when budgets must match
the serving tokenizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich's formulation)


def word_frequency_table(
    df: DataFrame,
    text_col: str,
    min_word_freq: int = 2,
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> DataFrame:
    """The ONE corpus pass: whitespace pre-tokenization →
    map-side-combined word counts → frequency prune → top-``max_words``
    cap. Returns (word, freq) sorted by (-freq, word) for deterministic
    downstream training."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = df.select(
        F.explode(F.split(F.trim(text), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_word_freq)
    )
    # the cap is a global top-K — vocabulary-sized input, so a plain
    # sort-limit is fine (Spark executes it as a TakeOrdered, partial
    # per-partition top-K then a single bounded merge)
    return counts.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)


def _count_pairs(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + freq
    return pairs


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) table (the bounded
    artifact of ``word_frequency_table().collect()``). Deterministic:
    ties on pair count break lexicographically. Stops early when no pair
    repeats. Returns the ordered merge list."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _count_pairs(vocab)
        if not pairs:
            break
        # deterministic choice: max count, ties broken by MIN pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = {_merge_word(s, best): f for s, f in vocab.items()}
    return merges


def fit_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_word_freq: int = 2,
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """End-to-end: distributed word counts → driver merge loop."""
    wf = word_frequency_table(
        df, text_col, min_word_freq=min_word_freq,
        max_words=max_words, lowercase=lowercase,
    ).collect()
    return train_bpe([(r["word"], r["freq"]) for r in wf], num_merges)


def encode_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out_col`` = BPE token array per row. Arrow-batched
    ``mapInPandas`` with the merge ranks captured in the closure (ships
    once per task, broadcast-style); the worker function is
    self-contained — plain dict/loops, no package imports."""
    from pyspark.sql import types as T

    ranks = {m: i for i, m in enumerate(merges)}
    cols = df.columns
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    end = END

    def _encode(batches):
        def enc_word(word: str) -> list[str]:
            syms = list(word) + [end]
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [
                    syms[best_i] + syms[best_i + 1]
                ]
            return syms

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                if text:
                    t = text.lower() if lowercase else text
                    for w in t.split():
                        got = cache.get(w)
                        if got is None:
                            got = cache[w] = enc_word(w)
                        out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.select(*cols).mapInPandas(_encode, schema)


def bpe_token_stats(
    df: DataFrame,
    text_col: str,
    group_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-group token statistics under a trained tokenizer: the budget
    primitive (token counts that match the serving tokenizer, not a
    whitespace proxy)."""
    enc = encode_bpe(df, text_col, merges)
    return (
        enc.select(group_col, F.size("tokens").alias("n_tokens"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )
