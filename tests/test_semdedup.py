"""SemDeDup (k-means path) and DSIR-relevance invariants.

The label-sharded variant (`dedup_semantic`) and the relevance score
(`docs_dsir_relevance`) are hash-checked against DuckDB by the parity
suites; these tests pin what the oracle can't express: the k-means path's
equivalence to exact all-pairs dedup when clustering is trivial, its
precision (never drops a vector without a true near-duplicate), and the
relevance score's directional semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_kafka_connect_spark.operators.dedup import connected_components
from iceberg_kafka_connect_spark.operators.similarity import (
    cosine_pairs,
    semantic_dedup,
)
from iceberg_kafka_connect_spark.operators.text import hashed_relevance

THR = 0.4


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _exact_verdicts(emb):
    """Ground truth: exact all-pairs cosine graph → min-id representative."""
    comp = {
        r.id: r.component
        for r in connected_components(cosine_pairs(emb, THR)).collect()
    }
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    return {i: comp.get(i, i) for i in ids}


def test_semantic_dedup_nlist1_equals_exact(spark, sf_dir):
    """One cluster = no cluster boundary = the exact all-pairs result."""
    emb = _emb(spark, sf_dir)
    truth = _exact_verdicts(emb)
    out = {
        r.vec_id: (r.kept, r.rep_id)
        for r in semantic_dedup(emb, threshold=THR, nlist=1, iters=1).collect()
    }
    assert set(out) == set(truth)
    for i, rep in truth.items():
        assert out[i] == (rep == i, rep), f"vec {i}"


def test_semantic_dedup_kmeans_precision(spark, sf_dir):
    """Cluster boundaries may MISS pairs, never invent them: every dropped
    vector must have a true cosine-≥-threshold partner, and its rep must be
    in the same exact-graph component."""
    emb = _emb(spark, sf_dir)
    truth = _exact_verdicts(emb)
    dropped = (
        semantic_dedup(emb, threshold=THR, nlist=8, iters=2)
        .filter(~F.col("kept"))
        .collect()
    )
    assert dropped, "corpus has planted near-dups; k-means must find some"
    for r in dropped:
        assert truth[r.vec_id] != r.vec_id, f"{r.vec_id} has no true partner"
        assert truth[r.rep_id] == truth[r.vec_id], (
            f"{r.vec_id} collapsed onto {r.rep_id} from another component"
        )


def test_semantic_dedup_label_shard_covers_all_rows(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = semantic_dedup(emb, threshold=THR, cluster_col="label")
    assert out.count() == emb.count()
    # representatives are self-kept
    bad = out.filter((F.col("rep_id") == F.col("vec_id")) & ~F.col("kept"))
    assert bad.count() == 0


def test_hashed_relevance_directional(spark, sf_dir):
    """Target-domain (English) docs must skew positive, the rest negative —
    the score is a target-vs-raw discriminant by construction."""
    docs = _docs(spark, sf_dir)
    rel = hashed_relevance(docs, target=F.col("lang") == "en")
    j = rel.join(docs.select("doc_id", "lang"), "doc_id")
    rows = (
        j.groupBy(F.col("lang") == "en")
        .agg(F.avg("relevance").alias("m"))
        .collect()
    )
    means = {r[0]: r.m for r in rows}
    assert means[True] > 0 > means[False]


def test_hashed_relevance_empty_target_raises(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    try:
        hashed_relevance(docs, target=F.lit(False))
    except ValueError as e:
        assert "empty" in str(e)
    else:
        raise AssertionError("expected ValueError on empty target slice")
