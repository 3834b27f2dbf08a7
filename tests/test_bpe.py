"""BPE training/encoding: hand-pinned merges on the classic corpus,
partitioning-independence of the distributed count pass, and encode
round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators.bpe import (
    END,
    bpe_token_stats,
    encode_bpe,
    fit_bpe,
    train_bpe,
    word_frequency_table,
)


def test_train_bpe_classic_example():
    # Sennrich et al. §3.2-style corpus: 'est</w>' should emerge
    word_freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(word_freqs, num_merges=4)
    assert merges[0] == ("e", "s")  # es: 9 (newest+widest)
    assert merges[1] == ("es", "t")  # est: 9
    assert merges[2] == ("est", END)  # est</w>: 9
    assert merges[3] == ("l", "o")  # lo: 7
    # merging is deterministic: rerun gives the same list
    assert train_bpe(word_freqs, num_merges=4) == merges


def test_fit_bpe_matches_local_and_is_partitioning_independent(spark):
    texts = [
        ("the lowest low", ), ("newest of the new", ),
        ("the widest wide one", ), ("low low low newest", ),
    ] * 10
    df1 = spark.createDataFrame(texts, ["text"]).repartition(1)
    df8 = spark.createDataFrame(texts, ["text"]).repartition(8)
    m1 = fit_bpe(df1, "text", num_merges=10, min_word_freq=1)
    m8 = fit_bpe(df8, "text", num_merges=10, min_word_freq=1)
    assert m1 == m8
    # local twin: count words in python, train the same table
    from collections import Counter

    c = Counter(w for (t,) in texts for w in t.lower().split())
    local = train_bpe(sorted(c.items(), key=lambda kv: (-kv[1], kv[0])), 10)
    assert m1 == local


def test_word_frequency_table_prune_and_cap(spark):
    df = spark.createDataFrame(
        [("a a a b b c",), ("a b d",)], ["text"]
    )
    rows = word_frequency_table(
        df, "text", min_word_freq=2, max_words=2
    ).collect()
    assert [(r.word, r.freq) for r in rows] == [("a", 4), ("b", 3)]


def test_encode_roundtrip_and_stats(spark):
    df = spark.createDataFrame(
        [(1, "s0", "the lowest low"), (2, "s0", "newest of the new"),
         (3, "s1", ""), (4, "s1", None)],
        ["id", "src", "text"],
    )
    merges = fit_bpe(df, "text", num_merges=8, min_word_freq=1)
    enc = encode_bpe(df, "text", merges)
    rows = {r.id: r.tokens for r in enc.collect()}
    # every word's tokens concatenate back to word + END marker
    for rid, text in ((1, "the lowest low"), (2, "newest of the new")):
        joined = "".join(rows[rid])
        assert joined == "".join(w + END for w in text.split())
    assert rows[3] == [] and rows[4] == []
    stats = {
        r.src: (r.n_docs, r.total_tokens)
        for r in bpe_token_stats(df, "text", "src", merges).collect()
    }
    assert stats["s0"][0] == 2 and stats["s0"][1] == sum(
        len(rows[i]) for i in (1, 2)
    )
    assert stats["s1"] == (2, 0)


def test_encode_with_no_merges_is_chars(spark):
    df = spark.createDataFrame([(1, "ab c")], ["id", "text"])
    [row] = encode_bpe(df, "text", []).collect()
    assert row.tokens == ["a", "b", END, "c", END]
