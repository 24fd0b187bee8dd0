"""Coreness (core-number) decomposition via distributed h-index iteration.

Companion to the fixed-k peel in ``kcore.py``: instead of membership in one
k-core, every vertex gets its core number (the largest k whose k-core
contains it). Algorithm: Montresor, De Pellegrini, Miorandi, "Distributed
k-Core Decomposition" (IEEE TPDS 2013) — initialize core(v) = deg(v), then
repeatedly set core(v) to the h-index of its neighbors' current core values
(the largest h such that >= h neighbors have core >= h). The sequence is
monotone non-increasing and converges to the exact coreness on any graph.

DataFrame formulation per round: join the core table onto the symmetric
edge list, PRE-REDUCE the gather to ``(id, core, cnt)`` with a hash
aggregate (map-side partials collapse a hub's 10^8 neighbor rows before
they ever reach one reducer), then evaluate the h-index from the
descending cumulative counts: h = max over distinct neighbor-core values v
of min(v, #neighbors with core >= v). The window that computes the
cumulative sum partitions by id over AT MOST ``distinct core values <=
current max core`` rows per vertex — bounded by O(sqrt(E)) on any graph,
independent of the power-law degree head — so no single task ever sorts a
hub's full neighbor multiset (the skew hazard of the naive
row_number-over-all-neighbors formulation this replaces). The
changed-vertex count rides each round's materialization as an observed
metric (one Spark job per round), and localCheckpoint truncates lineage,
exactly as in the sibling loops.

Scale note: round count is bounded by the graph's core depth (empirically
O(10-100) on web graphs, far below the O(V) of sequential peeling). The
groupBy(id, core) pre-reduce is order-insensitive and the h-index of a
multiset depends only on value counts, so the result is deterministic
across engines and partitionings.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


@dataclass
class CorenessResult:
    cores: DataFrame       # (id long, core long)
    rounds: int
    converged: bool


def coreness(edges: DataFrame, max_rounds: int = 100) -> CorenessResult:
    """Exact core number per vertex of the undirected simple graph."""
    simple = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    sym = simple.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        simple.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)

    core = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("core"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    # cumulative neighbor count from the largest core value downwards;
    # partitions hold <= distinct-core-values rows per id (bounded, no
    # hub skew), unlike a row_number over the raw neighbor multiset
    w = (Window.partitionBy("id").orderBy(F.desc("core"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for rounds in range(1, max_rounds + 1):
        neigh = sym.join(
            core.select(F.col("id").alias("dst"), "core"), "dst"
        ).select(F.col("src").alias("id"), "core")
        # h-index from value counts: for each distinct neighbor-core v,
        # cum = #neighbors with core >= v; h = max over v of min(v, cum).
        # Equivalent to max(least(core, row_number)) on the sorted multiset
        # (within a value group the max of least(v, rn) is least(v, cum)).
        hidx = (
            neigh.groupBy("id", "core")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("core"), F.col("cum"))).alias("new_core"))
        )
        obs = Observation(f"coreness_round_{rounds}")
        new_core = (
            core.join(hidx, "id")
            .observe(obs, F.sum((F.col("new_core") != F.col("core"))
                                .cast("int")).alias("changed"))
            .select("id", F.col("new_core").alias("core"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        core.unpersist()
        core = new_core
        if changed == 0:
            converged = True
            break
    return CorenessResult(cores=core, rounds=rounds, converged=converged)
