"""Property parity: span_dedup against a sequential pure-Python reference.

The DataFrame implementation is a distributed groupBy+join; the reference
is the obvious sequential algorithm. Hypothesis drives random small corpora
(tiny vocab → heavy span collisions) through both.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from iceberg_kafka_connect_spark.operators.dedup import span_dedup

VOCAB = ["a", "b", "c"]


def _reference(docs: list[tuple[int, str]], k: int, min_df: int):
    spans = []  # (doc, idx, span) in doc order
    for doc_id, text in docs:
        words = text.split()
        for idx in range(0, (len(words) + k - 1) // k):
            spans.append(
                (doc_id, idx, " ".join(words[idx * k : idx * k + k]))
            )
    counts: dict[str, int] = {}
    first: dict[str, tuple[int, int]] = {}
    for doc_id, idx, s in spans:
        counts[s] = counts.get(s, 0) + 1
        if s not in first or (doc_id, idx) < first[s]:
            first[s] = (doc_id, idx)
    out = {}
    for doc_id, text in docs:
        mine = [(i, s) for d, i, s in spans if d == doc_id]
        kept = [
            s
            for i, s in mine
            if counts[s] < min_df or first[s] == (doc_id, i)
        ]
        out[doc_id] = (len(mine), len(kept), " ".join(kept))
    return out


docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=9).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None)
@given(texts=docs_strategy, k=st.integers(1, 3), min_df=st.integers(2, 3))
def test_span_dedup_matches_reference(spark, texts, k, min_df):
    docs = list(enumerate(texts))
    expected = _reference(docs, k, min_df)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_spans_kept, r.text_dedup)
        for r in span_dedup(
            df, span_words=k, min_df=min_df
        ).collect()
    }
    assert got == expected
