"""IVF (inverted-file) approximate nearest-neighbor index.

The scale path for similarity search: brute force scans |corpus| vectors per
query; IVF scans ~nprobe/nlist of them. Build assigns every vector to its
nearest centroid (k-means with deterministic initialization — fixed seed
rows as initial centroids, Lloyd iterations as Spark aggregations); search
scores only the nprobe cells nearest to each query.

All distributed work is DataFrame ops: assignment is a broadcast-centroid
cross-score (the centroid table is tiny by construction), Lloyd's update is
one groupBy-mean per iteration, and search reuses the assignment join. The
centroid set is the only driver-side state (nlist × dim floats).

At 100 TB: the corpus assignment is computed once and persisted as a
partition column (write the table PARTITIONED BY cell for storage-level
pruning); queries touch nprobe directories.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_rows(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """L2-normalize embeddings (cosine ≡ dot after normalization)."""
    sq = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    inv = F.lit(1.0) / F.sqrt(sq)
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") * inv).alias("v"),
    )


def _nearest_centroid(vec_df: DataFrame, centroids: list[tuple[int, list[float]]]):
    """Add `cell` = argmax dot(v, centroid) as a single Catalyst expression
    over the broadcast (literal) centroid matrix."""
    best_cell = None
    best_score = None
    for cid, cvec in centroids:
        arr = F.array(*[F.lit(float(x)) for x in cvec])
        score = F.aggregate(
            F.zip_with(F.col("v"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if best_cell is None:
            best_cell, best_score = F.lit(cid), score
        else:
            better = score > best_score
            best_cell = F.when(better, F.lit(cid)).otherwise(best_cell)
            best_score = F.when(better, score).otherwise(best_score)
    return vec_df.withColumn("cell", best_cell)


class IVFIndex:
    def __init__(self, centroids: list[tuple[int, list[float]]], assigned: DataFrame):
        self.centroids = centroids
        self.assigned = assigned  # (id, v, cell), persisted

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        iters: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """Deterministic k-means: init = the nlist lowest-id vectors,
        ``iters`` Lloyd rounds, each one groupBy-mean over the corpus."""
        normed = _norm_rows(corpus, id_col, vec_col).persist()
        init = [
            (i, list(r.v))
            for i, r in enumerate(normed.orderBy("id").limit(nlist).collect())
        ]
        centroids = init
        dim = len(init[0][1])
        for _ in range(iters):
            assigned = _nearest_centroid(normed, centroids)
            means = (
                assigned.groupBy("cell")
                .agg(
                    *[
                        F.avg(F.col("v").getItem(d)).alias(f"d{d}")
                        for d in range(dim)
                    ]
                )
                .collect()
            )
            new = []
            for r in means:
                vec = [r[f"d{d}"] for d in range(dim)]
                n = math.sqrt(sum(x * x for x in vec)) or 1.0
                new.append((r["cell"], [x / n for x in vec]))
            # cells that lost all members keep their previous centroid
            have = {c for c, _ in new}
            new.extend((c, v) for c, v in centroids if c not in have)
            centroids = sorted(new)
        assigned = _nearest_centroid(normed, centroids).persist()
        return IVFIndex(centroids, assigned)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Score only the nprobe cells nearest each query. Output matches
        brute_force_topk's schema (query_id, neighbor_id, cos_sim, rank)."""
        qn = _norm_rows(queries, id_col, vec_col)
        # rank cells per query by centroid similarity, keep nprobe
        probed = None
        for cid, cvec in self.centroids:
            arr = F.array(*[F.lit(float(x)) for x in cvec])
            score = F.aggregate(
                F.zip_with(F.col("v"), arr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            row = qn.select(
                F.col("id").alias("query_id"),
                F.col("v").alias("qv"),
                F.lit(cid).alias("cell"),
                score.alias("cscore"),
            )
            probed = row if probed is None else probed.unionByName(row)
        wq = Window.partitionBy("query_id").orderBy(
            F.col("cscore").desc(), F.col("cell")
        )
        cells = probed.withColumn("crank", F.row_number().over(wq)).filter(
            F.col("crank") <= nprobe
        )
        scored = (
            F.broadcast(cells.select("query_id", "qv", "cell"))
            .join(
                self.assigned.select(
                    F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
                ),
                "cell",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.aggregate(
                    F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rank")
        )
