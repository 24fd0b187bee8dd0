"""SemDeDup: semantic deduplication via embedding clusters.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (arXiv:2303.09540): k-means-cluster the
embedding space, compare pairs only WITHIN a cluster, call a pair
semantic duplicates when their cosine exceeds a threshold, and keep the
cluster member with the LOWEST similarity to its centroid (the paper's
keep-hard-examples rule). Complements dedup.embedding_near_duplicates
(hyperplane-LSH buckets, data-independent) the same way IVF complements
LSH in similarity.py: the cluster pass adapts the candidate buckets to
the data distribution.

Absent from the reference (a rank engine); part of the LLM-pipeline
dedup surface.

Determinism: the codebook is similarity.ivf_train_centroids (seed cells
= smallest shared-hash ids, Lloyd refinement — no RNG state), so the
whole pipeline replays bit-identically and unrolls into a SQL oracle.
The removal rule is a single pass, not a fixpoint: x is dropped iff some
same-cluster y with cosine(x, y) >= threshold has strictly smaller
(centroid_sim, id) priority — so within a duplicate pair the
lower-centroid-similarity member survives, ties break to the lower id.

Scale shape (10^12 vectors): the codebook is n_cells x dim (driver-side,
like the IVF path); assignment is one Arrow matmul batch per partition;
the pairwise verify is an equi-join ON CELL — cost Σ|cell|², which is
the quantity SemDeDup controls by raising n_cells (the paper uses
n_cells ~ sqrt(N); a hot-cell cap like dedup.py's LSH bucket cap drops
degenerate cells rather than letting one melt an executor).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import cosine
from pagerank_spark.operators.similarity import (ivf_assignments,
                                                 ivf_train_centroids)


def semantic_dedup(emb: DataFrame, *, threshold: float = 0.9,
                   n_cells: int = 16, lloyd_iters: int = 1,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: np.ndarray | None = None) -> DataFrame:
    """SemDeDup verdict per vector: ``(id, cell, centroid_sim, kept)``.

    ``centroid_sim`` is the cosine to the assigned centroid rounded to 6
    decimals; ``kept`` is False for vectors dropped by the
    within-cluster rule above.
    """
    spark = emb.sparkSession
    if centroids is None:
        centroids = ivf_train_centroids(emb, n_cells, id_col, vec_col,
                                        lloyd_iters)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "cell int, cv array<double>")

    assign = ivf_assignments(emb, centroids, id_col, vec_col, nprobe=1)
    vecs = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    sims = (assign.join(vecs, "id")
            .join(F.broadcast(cents), "cell")
            .select("id", "cell", "v",
                    cosine(F.col("v"), F.col("cv")).alias("sim"))
            .localCheckpoint(eager=True))   # reused by both join sides

    x, y = sims.alias("x"), sims.alias("y")
    dropped = (
        x.join(y, "cell")
        .filter(F.col("x.id") != F.col("y.id"))
        # y has priority: strictly lower centroid_sim, id tie-break
        .filter((F.col("y.sim") < F.col("x.sim"))
                | ((F.col("y.sim") == F.col("x.sim"))
                   & (F.col("y.id") < F.col("x.id"))))
        .filter(cosine(F.col("x.v"), F.col("y.v")) >= F.lit(threshold))
        .select(F.col("x.id").alias("id")).distinct()
    )
    return (sims.join(dropped.withColumn("dropped", F.lit(True)), "id", "left")
            .select("id", "cell", F.round("sim", 6).alias("centroid_sim"),
                    F.coalesce(~F.col("dropped"), F.lit(True)).alias("kept")))
