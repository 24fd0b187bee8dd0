"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the corpus, cosine via JVM-side zip_with/aggregate, window
  row_number <= k. The correctness baseline.
* ``ann_topk_lsh`` — the scale path: random-hyperplane LSH (deterministic
  seeded planes, multiple tables), equi-join query buckets to corpus
  buckets, score only within buckets, then top-k. Sub-linear candidates at
  the cost of recall; recall is measured against brute force in tests.

At 100 TB the corpus side stays partitioned; only query vectors and the
plane matrix move (broadcast). No Python executes per row — the dot
products are Catalyst higher-order functions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.functions.hashing import mix3
from pagerank_spark.operators.dedup import cosine


def _plane(dim: int, table: int, plane: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random unit hyperplane: components are
    mix3(d, table*1024+plane, seed) mapped to [-1, 1)."""
    h = mix3(np.arange(dim, dtype=np.uint64), table * 1024 + plane, seed)
    return (h.astype(np.float64) / 2.0**63) - 1.0


def hyperplane_buckets(emb: DataFrame, id_col: str, vec_col: str,
                       planes: int = 16, seed: int = 42,
                       tables: int = 4, dim: int | None = None) -> DataFrame:
    """(id, table, bucket) — sign-pattern bucket per LSH table.

    bucket = bits of sign(v . plane_j); computed as a JVM expression per
    plane with the plane vector inlined as a literal array (planes are tiny:
    tables*planes*dim doubles)."""
    if dim is None:
        row = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if row is None:
            # empty (or all-null) input: type-correct empty bucket table
            # instead of a TypeError on first()[0]
            return (emb.select(F.col(id_col).alias("id")).limit(0)
                    .withColumn("table", F.lit(0))
                    .withColumn("bucket", F.lit(0).cast("long")))
        dim = len(row[0])
    v = F.col(vec_col).cast("array<double>")
    rows = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for p in range(planes):
            plane = _plane(dim, t, p, seed)
            dot = F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(x)) for x in plane]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x)
            bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            bucket = bucket + F.shiftleft(bit, p)
        rows.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return (
        emb.select(F.col(id_col).alias("id"), F.explode(F.array(*rows)).alias("tb"))
        .select("id", "tb.table", "tb.bucket")
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "vec_id", q_vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cos, rank), neighbor != query."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).cast("array<double>").alias("qv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 planes: int = 12, tables: int = 6, seed: int = 42) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH; same output schema
    as cosine_topk. Recall grows with ``tables`` and shrinks with ``planes``."""
    cb = hyperplane_buckets(corpus, id_col, vec_col, planes, seed, tables)
    qb = hyperplane_buckets(queries, id_col, vec_col, planes, seed, tables)
    cands = (
        cb.alias("c").join(qb.alias("q"), ["table", "bucket"])
        .filter(F.col("c.id") != F.col("q.id"))
        .select(F.col("q.id").alias("query_id"), F.col("c.id").alias("neighbor_id"))
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
