"""Pretraining-corpus preparation recipe: the full curation chain.

Chains the training-data operators the way a 100 TB pipeline would, against
the driver's synthetic documents table:

  1. quality + language profiling            (one scan, zero shuffles)
  2. LM-surprise scoring (CCNet shape)       (drop boilerplate head + noise tail)
  3. exact dedup, then MinHash-LSH near-dup  (hash-groupBy; banded LSH —
     signatures shuffle, documents never)
  4. near-dup cluster collapse               (connected components, best-quality
     representative per cluster)
  5. benchmark decontamination               (broadcast shingle-hash probe)
  6. recipe mixing: temperature re-mix +     (tiny per-source aggregates
     per-source epoch repetition              broadcast back; md5-deterministic)
  7. sequence packing to a token budget      (per-source window pass)
  8. deterministic shard shuffle             (md5-mod shards, per-shard ranks)

Every step is a DataFrame→DataFrame function; the chain is lazy until an
action, so Catalyst sees whole sub-plans at once.

Usage: python examples/pretraining_recipe.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_kafka_connect_spark.operators import dedup, text
from iceberg_kafka_connect_spark.session import get_spark
from iceberg_kafka_connect_spark.suite.core import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pretraining-recipe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} docs")

    # 1. profile: quality score, language, token counts — pure projection
    prof = text.profile(docs).select("doc_id", "quality", "n_tokens")
    docs = docs.join(prof, "doc_id")

    # 2. LM surprise: keep the mid band — drop boilerplate head (low
    # surprise) and noise tail (high surprise)
    surprise = text.lm_surprise(docs).select("doc_id", "mean_surprise")
    docs = docs.join(surprise, "doc_id")
    lo, hi = 2.0, 5.2
    docs = docs.filter(F.col("mean_surprise").between(lo, hi)).persist()
    print(f"after LM-surprise band [{lo},{hi}]: {docs.count()}")

    # 3. exact dedup first (so LSH never sees f identical docs -> f^2
    # candidates per band), then MinHash-LSH near-dup pairs on survivors
    groups = dedup.exact_dedup(docs)  # (digest, keep_id, n_docs)
    docs = docs.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    pairs = dedup.minhash_lsh_pairs(docs)  # (id_a, id_b, jaccard)

    # 4. collapse near-dup clusters, keep the highest-quality representative
    comp = dedup.connected_components(pairs, "id_a", "id_b")  # (id, component)
    labeled = docs.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    )
    w = Window.partitionBy(
        F.coalesce(F.col("component"), F.col("doc_id"))
    ).orderBy(F.col("quality").desc(), F.col("doc_id"))
    docs = (
        labeled.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "component")
    )
    print(f"after dedup (exact + near-dup collapse): {docs.count()}")

    # 5. decontamination vs a benchmark slice (here: 20 held-out docs)
    bench = table(spark, sf_dir, "documents").limit(20)
    scores = dedup.contamination_scores(docs, bench)
    clean = scores.filter(F.col("contamination") < 0.5).select("doc_id")
    docs = docs.join(clean, "doc_id", "left_semi")
    print(f"after decontamination: {docs.count()}")

    # 6. recipe mixing: flatten source skew at t=0.7, then repeat curated
    # sources fractionally (every copy keeps its epoch index)
    docs = text.source_mix_resample(docs, temperature=0.7)
    docs = text.source_epochs(docs, {"src0": 2.0, "src1": 1.5})

    # 7. pack into 512-token training sequences per source
    packed = text.pack_sequences(
        docs, budget=512, part_cols=["source"], order_col="doc_id"
    )

    # 8. deterministic shard shuffle for the export layout
    sharded = text.shard_shuffle(packed, n_shards=8)
    sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("source", "pack_id").alias("sequences"),
    ).orderBy("shard").show()
    spark.stop()


if __name__ == "__main__":
    main()
