"""The composite training-data curation pipeline as ONE oracle-checked
query: quality filter → exact dedup → near-dup removal → per-language
corpus stats.

This is the product use-case every individual operator exists for, composed
end-to-end. Spark-side it is a linear chain of the engine's operators; the
oracle reproduces the identical pipeline in SQL CTEs. At scale each stage is
shuffle-bounded exactly like its standalone operator: the full pipeline adds
no new shuffle beyond its parts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from ..operators import text as tx
from . import register
from .core import davg, sql_davg, table
from .dedup import _DUCK_JACCARD_FROM_DOCS


@register(
    "curation_pipeline",
    oracle=rf"""
    WITH quality AS (
        SELECT d.doc_id, d.lang, d.n_chars, d.text,
               md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS digest,
               (CAST(len(string_split_regex(trim(d.text), '\s+')) AS DOUBLE)) AS n_words
        FROM documents d
        WHERE len(string_split_regex(trim(d.text), '\s+')) >= 20
    ),
    exact_kept AS (
        SELECT * FROM quality q
        WHERE q.doc_id = (SELECT MIN(q2.doc_id) FROM quality q2
                          WHERE q2.digest = q.digest)
    ),
    docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM exact_kept
    ),
    {_DUCK_JACCARD_FROM_DOCS},
    near_dup_losers AS (
        SELECT DISTINCT id_b AS doc_id FROM jac WHERE jaccard >= 0.5
    ),
    final AS (
        SELECT * FROM exact_kept
        WHERE doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg('n_words', 4)} AS avg_words
    FROM final
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("curation", "bench"),
)
def curation_pipeline(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")

    # stage 1: quality floor (≥ 20 words)
    n_words = tx.word_count(F.col("text")).cast("double")
    quality = docs.withColumn("n_words", n_words).filter(F.col("n_words") >= 20)
    quality = quality.withColumn("digest", tx.fingerprint(F.col("text"))).persist()

    # stage 2: exact dedup — keep min doc_id per content digest
    keep = quality.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    exact_kept = quality.join(
        keep,
        (quality.digest == keep.digest) & (quality.doc_id == keep.keep_id),
        "left_semi",
    ).persist()

    # stage 3: near-dup removal among the exact-dedup REPRESENTATIVES only —
    # drop the higher id of each Jaccard pair. (Pair-drop keeps two docs that
    # are only TRANSITIVELY similar through a middle doc — deliberately: they
    # are not near-dups of each other. The aggressive policy — collapse whole
    # connected components — is dedup_components/dedup_collapse.) Feeding
    # representatives (not
    # the raw corpus) to LSH is the hot-bucket fix: a cluster of f identical
    # docs would share every band bucket and emit O(f²·bands) candidates;
    # after exact dedup each cluster is one doc. MinHash-LSH with exact
    # verification: pair set identical to the all-pairs Jaccard oracle
    # (recall 1-1e-8 at s=0.5, precision 1) at a fraction of the join cost.
    losers = (
        dedup.minhash_lsh_pairs(
            exact_kept, n=3, threshold=0.5, num_hashes=128, bands=64
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    final = exact_kept.join(losers, "doc_id", "left_anti")

    # stage 4: per-language corpus stats
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            davg(F.col("n_words"), 4, "avg_words"),
        )
        .orderBy("lang")
    )
