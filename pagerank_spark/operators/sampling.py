"""Layered neighbor sampling — the GraphSAGE mini-batch primitive.

Hamilton, Ying & Leskovec, "Inductive representation learning on large
graphs" (NeurIPS 2017): expand a seed set hop by hop, keeping at most
``fanouts[h]`` neighbors per frontier vertex — the bounded-neighborhood
expansion every GNN training pipeline runs as its sampler. At 10^12 edges
the cap is the whole point: a k-hop ball around a hub is the graph; the
sampled ball is ≤ Π fanouts edges per seed regardless of the power-law
head (the same skew the reference's degree split targets,
/root/reference/kernel_bblock.cu:663-692, answered here by construction).

Determinism: the "random" choice ranks each vertex's distinct out-edges
by the cross-engine 60-bit md5 hash of (hop:src:dst:seed) (ties by dst)
and keeps the first ``fanouts[h]`` — a pure function of the graph and
seed, identical under any partitioning and expressible in ANSI SQL for
the DuckDB oracle.

Scale shape per hop: one frontier semi-join onto the edge table (the
frontier is the small side — AQE broadcasts it) and one per-src window
rank over ONLY the frontier's edges. Frontier size is bounded by the
cumulative fanout product, not by graph degrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shared_hash60


def sample_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int],
    seed: int = 42,
) -> DataFrame:
    """Sampled k-hop expansion; returns ``(hop, src, dst)`` edge rows.

    ``seeds``: (id) DataFrame. Hop h (0-based) keeps at most
    ``fanouts[h]`` distinct out-edges per frontier vertex; the next
    frontier is the distinct sampled destinations.
    """
    spark = edges.sparkSession
    if not fanouts:
        return spark.createDataFrame([], "hop int, src long, dst long")
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    frontier = seeds.select("id").distinct().localCheckpoint(eager=True)
    out = []
    for hop, fanout in enumerate(fanouts):
        ranked = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .withColumn("h", shared_hash60(F.concat_ws(
                ":", F.lit(str(hop)), F.col("src").cast("string"),
                F.col("dst").cast("string"), F.lit(str(seed)))))
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("src").orderBy("h", "dst")))
            .filter(F.col("rk") <= fanout)
            .select(F.lit(hop).alias("hop"), "src", "dst")
            .localCheckpoint(eager=True)
        )
        out.append(ranked)
        frontier = ranked.select(F.col("dst").alias("id")).distinct() \
                         .localCheckpoint(eager=True)
        if not frontier.take(1):
            break
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
