"""Product quantization (PQ) for embedding compression + ANN search.

The memory-side scale path for similarity search (Jégou/Douze/Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011): each
L2-normalized vector splits into ``m`` subvectors; each subvector is
replaced by the id of its nearest codeword from a per-subspace codebook of
``2^nbits`` entries. A dim-768 float32 vector (3 KB) becomes ``m`` bytes —
a 100 TB embedding corpus compresses ~384× into something that fits hot
storage, and search never touches the original vectors.

Execution shape (same design rules as ``ivf.py``):

- **codebook training is sample-based**: k-means per subspace on a
  deterministic hash-sampled subset collected to the driver (standard
  practice — FAISS trains PQ codebooks on 10⁴-10⁵ samples regardless of
  corpus size). Driver state = m × 2^nbits × (dim/m) floats ≈ the codebook
  itself; the corpus never moves.
- **encoding is distributed**: one Arrow-batched ``mapInPandas`` pass, one
  GEMM per subspace per batch against the broadcast codebooks.
- **search is asymmetric-distance (ADC)**: per query build an m × 2^nbits
  lookup table of subvector·codeword products, then every candidate's
  score is m table lookups summed — numpy fancy-indexing over the code
  matrix, no per-row Python. Exact top-k over approximate scores.

Recall/compression trade-off is (m, nbits); composes with IVF (encode per
cell, probe then ADC-score) — here kept orthogonal: `PQIndex.search`
scans all codes (the "flat PQ" of FAISS's IndexPQ).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import local_df

from .ivf import _norm_rows


def _train_codebooks(
    sample: np.ndarray, m: int, k: int, iters: int
) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means on the driver sample.
    Returns codebooks of shape (m, k, dsub)."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        # deterministic init: first k distinct rows
        _, first_idx = np.unique(sub.round(9), axis=0, return_index=True)
        init_rows = sub[np.sort(first_idx)[:k]]
        if len(init_rows) < k:  # degenerate subspace: pad by repetition
            reps = -(-k // max(len(init_rows), 1))
            init_rows = np.tile(init_rows, (reps, 1))[:k]
        cb = init_rows.copy()
        for _ in range(iters):
            # squared-L2 assignment: argmin ||x-c||² = argmax x·c - ||c||²/2
            scores = sub @ cb.T - 0.5 * (cb * cb).sum(axis=1)
            assign = scores.argmax(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cb[c] = sub[mask].mean(axis=0)
        books[j] = cb
    return books


class PQIndex:
    def __init__(self, codebooks: np.ndarray, codes: DataFrame):
        self.codebooks = codebooks  # (m, k, dsub)
        self.codes = codes  # (id, code array<int>), persisted

    @staticmethod
    def build(
        corpus: DataFrame,
        m: int = 8,
        nbits: int = 8,
        iters: int = 5,
        train_sample: int = 4096,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "PQIndex":
        normed = _norm_rows(corpus, id_col, vec_col)
        k = 1 << nbits
        # deterministic hash sample for training (never `limit` alone: one
        # partition's prefix is not a representative sample of a sharded
        # corpus; md5-ordering mixes shards at identical cost)
        rows = (
            normed.orderBy(F.md5(F.col("id").cast("string")))
            .limit(train_sample)
            .collect()
        )
        sample = np.vstack([np.asarray(r.v) for r in rows])
        books = _train_codebooks(sample, m=m, k=k, iters=iters)
        sc = normed.sparkSession.sparkContext
        bc = sc.broadcast(books)

        def encode(batches):
            cb = bc.value
            mm, kk, dsub = cb.shape
            flat_scores_bias = 0.5 * (cb * cb).sum(axis=2)  # (m, k)
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.vstack(pdf["v"].to_numpy())
                codes = np.empty((len(vecs), mm), dtype=np.int32)
                for j in range(mm):
                    sub = vecs[:, j * dsub : (j + 1) * dsub]
                    scores = sub @ cb[j].T - flat_scores_bias[j]
                    codes[:, j] = scores.argmax(axis=1)
                yield pd.DataFrame(
                    {"id": pdf["id"].to_numpy(), "code": list(codes)}
                )

        id_type = dict(normed.dtypes)["id"]
        codes = normed.mapInPandas(
            encode, schema=f"id {id_type}, code array<int>"
        ).persist()
        codes.count()  # materialize before the sample lineage is dropped
        return PQIndex(books, codes)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k. Output schema matches brute_force_topk:
        (query_id, neighbor_id, pq_score, rank) — pq_score approximates
        cos_sim with quantization error."""
        qn = _norm_rows(queries, id_col, vec_col)
        books = self.codebooks
        sc = qn.sparkSession.sparkContext
        bc = sc.broadcast(books)
        # broadcast the queries against the (large) code table: queries are
        # the small side in every batch-scoring deployment
        q_rows = qn.collect()
        if not q_rows:
            return local_df(self.codes.sparkSession, 
                [], "query_id long, neighbor_id long, pq_score double, rank int"
            )
        q_ids = np.asarray([r.id for r in q_rows])
        q_mat = np.vstack([np.asarray(r.v) for r in q_rows])
        bq = sc.broadcast((q_ids, q_mat))
        topk = k

        def adc(batches):
            cb = bc.value
            mm, kk, dsub = cb.shape
            ids, qm = bq.value
            # per-query lookup tables: (nq, m, k) of subvector·codeword
            tables = np.einsum(
                "qmd,mkd->qmk",
                qm.reshape(len(qm), mm, dsub),
                cb,
            )
            for pdf in batches:
                if not len(pdf):
                    continue
                code_mat = np.vstack(pdf["code"].to_numpy())  # (n, m)
                n = len(code_mat)
                nid = pdf["id"].to_numpy()
                # scores[q, i] = Σ_j tables[q, j, code[i, j]]
                scores = np.zeros((len(qm), n))
                for j in range(mm):
                    scores += tables[:, j, code_mat[:, j]]
                # per-partition top-k per query; global top-k after shuffle
                keep = min(topk + 1, n)
                part = np.argpartition(-scores, keep - 1, axis=1)[:, :keep]
                out_q, out_n, out_s = [], [], []
                for qi in range(len(qm)):
                    for ci in part[qi]:
                        out_q.append(ids[qi])
                        out_n.append(nid[ci])
                        out_s.append(scores[qi, ci])
                yield pd.DataFrame(
                    {
                        "query_id": out_q,
                        "neighbor_id": out_n,
                        "pq_score": out_s,
                    }
                )

        cand = self.codes.mapInPandas(
            adc, schema="query_id long, neighbor_id long, pq_score double"
        ).filter(F.col("query_id") != F.col("neighbor_id"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("pq_score").desc(), F.col("neighbor_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .orderBy("query_id", "rank")
        )

    def compression_stats(self, dim: int) -> dict:
        m, k, dsub = self.codebooks.shape
        raw = dim * 4  # float32
        coded = m * (1 if k <= 256 else 2)
        return {
            "m": m,
            "k": k,
            "bytes_raw": raw,
            "bytes_coded": coded,
            "ratio": raw / coded,
        }
