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
frontier is the small side — AQE broadcasts it) and a TWO-LEVEL top-k
over the frontier's edges — a partial top-``fanout`` inside
``n_salts`` hash-salted slices of each src's adjacency, then the final
top-``fanout`` over the ≤ n_salts·fanout survivors (the K2 salting
discipline: a hub src is ranked by n_salts parallel tasks instead of one
straggler sorting its whole adjacency; the partial keeps every global
top-fanout candidate because dropping below-fanout rows WITHIN a slice
can never drop a row that is top-fanout overall). The salt is a pure
hash of dst, so the result is identical for any ``n_salts`` — the
DuckDB oracle stays the plain single-window rank. Frontier size is
bounded by the cumulative fanout product, not by graph degrees.
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
    n_salts: int = 32,
    assume_distinct: bool = False,
) -> DataFrame:
    """Sampled k-hop expansion; returns ``(hop, src, dst)`` edge rows.

    ``seeds``: (id) DataFrame. Hop h (0-based) keeps at most
    ``fanouts[h]`` distinct out-edges per frontier vertex; the next
    frontier is the distinct sampled destinations. ``n_salts`` splits
    each src's adjacency for the partial top-k (plan knob only — the
    output is invariant to it). ``assume_distinct`` skips the O(E)
    dedup shuffle when the caller guarantees (src, dst) rows are already
    unique (a warehouse edge table typically is) — at 10^12 edges that
    shuffle costs more than the sampling itself.
    """
    spark = edges.sparkSession
    if not fanouts:
        return spark.createDataFrame([], "hop int, src long, dst long")
    e = edges.select("src", "dst")
    if not assume_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    frontier = seeds.select("id").distinct().localCheckpoint(eager=True)
    w_partial = Window.partitionBy("src", "salt").orderBy("h", "dst")
    w_final = Window.partitionBy("src").orderBy("h", "dst")
    out = []
    for hop, fanout in enumerate(fanouts):
        ranked = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .withColumn("h", shared_hash60(F.concat_ws(
                ":", F.lit(str(hop)), F.col("src").cast("string"),
                F.col("dst").cast("string"), F.lit(str(seed)))))
            # two-level top-k: salted partial (hub adjacency split across
            # n_salts tasks), then the exact rank over the survivors
            .withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(n_salts)))
            .withColumn("prk", F.row_number().over(w_partial))
            .filter(F.col("prk") <= fanout)
            .withColumn("rk", F.row_number().over(w_final))
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
