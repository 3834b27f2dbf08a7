"""BM25 top-k retrieval over a document table.

A training-data pipeline retrieves constantly: nearest-neighbor probes for
contamination sweeps, example selection for targeted curation, query-based
corpus audits ("what does the corpus say about X"). The embedding side is
covered by the ANN operators (similarity.py / ivf.py / pq.py); this module
is the LEXICAL side — Okapi BM25 (Robertson et al., TREC-3; the Lucene
default scoring function) expressed as pure DataFrame algebra.

Scale shape (the whole point — no search library, no driver loops):

- the posting list (doc, term, tf) is ONE tokenize+groupBy pass over the
  corpus, shuffled by (doc, term) with map-side partial aggregation;
- per-term document frequencies are computed only for the QUERY terms —
  the query set joins the postings BROADCAST, so the 100 TB posting table
  is filtered map-side to matching terms and never reshuffles by term;
- global stats (N, avgdl) ride a broadcast 1-row crossJoin, never a
  driver ``.collect()``;
- scoring aggregates by (query, doc) — cardinality bounded by
  |queries| × matched docs, tiny next to the corpus;
- top-k election is a window over each query's partition (ROW_NUMBER,
  score DESC, doc id ASC tie-break) — there is NO global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["bm25_topk", "tokenize_terms"]


def tokenize_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term) posting rows: lowercase, split on non-alphanumerics,
    drop empties. Deliberately the same tokenizer the text-analysis
    operators use so retrieval and dedup agree on what a term is."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``queries`` is a (query_id, term) DataFrame — one row per query term,
    duplicates meaningful (a repeated term scores twice, matching the
    classic formulation over bag-of-words queries). It is assumed SMALL
    (thousands of terms, not millions) and is broadcast.

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                  (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))   (Lucene's variant,
    always positive).

    Returns (query_id, doc_id, rank) with rank 1..k per query; ties break
    on the smaller doc id so results are deterministic.
    """
    tok = tokenize_terms(docs, id_col, text_col)
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document length = Σ tf by definition: derive dl from the already-
    # aggregated (and far smaller) tf relation instead of a second full
    # tokenize pass over the corpus
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(term_col).alias("term")
    )
    # df(t) only for query terms: postings filter against the broadcast
    # query vocabulary map-side, then a tiny groupBy over the survivors
    qvocab = q.select("term").distinct()
    dft = (
        tf.join(F.broadcast(qvocab), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qterms = q.join(F.broadcast(dft), "term", "left").fillna(
        {"df": 0}
    )  # a term absent from the corpus scores nothing but keeps the query

    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
        .groupBy("qid", "id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): per query, greedily select ``k`` of its candidate rows
    maximizing ``lam * score − (1 − lam) * max_cos_sim(selected)`` —
    relevance traded against redundancy, the standard diversification
    pass after a BM25/ANN candidate fetch (RAG retrieval, few-shot
    example selection, dedup-aware sampling).

    The greedy chain is inherently sequential PER QUERY, so it runs as
    one Arrow-batched ``applyInPandas`` per query group over the
    ALREADY-BOUNDED candidate set (the upstream top-N); queries
    parallelize freely. Per-group cost O(N·k·dim) in vectorized numpy —
    never a pairwise matrix beyond N², never a driver loop. Ties (equal
    MMR value) break on ascending id for determinism.

    Returns (query, rank 1..k, id, score, mmr_value).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    # query/id keep the INPUT column types (string or int ids work the
    # same as long — Arrow conversion fails on a type mismatch, the same
    # contract funnel_stream pins for its key column)
    in_t = {f.name: f.dataType.simpleString() for f in candidates.schema}
    out_schema = (
        f"{query_col} {in_t[query_col]}, rank int, "
        f"{id_col} {in_t[id_col]}, "
        f"{score_col} double, mmr_value double"
    )

    def _rerank(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        normed = mat / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        max_sim = np.zeros(n)  # max cos-sim to the selected set so far
        picked = np.zeros(n, dtype=bool)
        values: list[float] = []
        for _ in range(min(k, n)):
            mmr = lam * rel - (1.0 - lam) * max_sim
            mmr[picked] = -np.inf
            # argmax with ascending-id tiebreak: ids are sorted, argmax
            # returns the first (= smallest id) maximal entry
            i = int(np.argmax(mmr))
            selected.append(i)
            values.append(float(mmr[i]))
            picked[i] = True
            max_sim = np.maximum(max_sim, normed @ normed[i])
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[selected].to_numpy(),
                "rank": np.arange(1, len(selected) + 1, dtype=np.int32),
                id_col: pdf[id_col].iloc[selected].to_numpy(),
                score_col: rel[selected],
                "mmr_value": values,
            }
        )

    return candidates.groupBy(query_col).applyInPandas(_rerank, out_schema)
