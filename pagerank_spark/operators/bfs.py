"""BFS hop distance: multi-source frontier expansion over the directed graph.

Absent from the reference (SURVEY.md §2.9); the frontier loop is the same
superstep shape as the reference's per-iteration gather
(/root/reference/kernel_bblock.cu:337) restricted to the active frontier —
the canonical "think like a vertex" traversal a link-graph engine owes its
users (reachability, crawl-depth analysis, seed-set expansion).

Semantics: dist(v) = minimum number of directed edges on any path from the
source set to v; sources themselves have dist 0; unreachable vertices are
absent from the output (callers left-join against their universe if they
want NULL/∞ rows).

Scale shape: per round ONE join of the O(E) edge table against the current
frontier (O(frontier) rows, shrinking), an anti-join against the visited
set, and a localCheckpoint that truncates lineage. The frontier size rides
the round's own materialization as an observed metric — one Spark job per
round. The visited set is O(V) and only ever unioned, never re-shuffled
wholesale: the anti-join shuffles (frontier-candidates × visited) on id,
which is the minimum any hash-distributed BFS pays.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class BfsResult:
    distances: DataFrame   # (id long, dist int) — reachable vertices only
    rounds: int            # rounds actually executed
    exhausted: bool        # True when the frontier emptied before max_hops


def bfs_hops(
    edges: DataFrame,
    sources: Sequence[int] | DataFrame,
    max_hops: int = 20,
) -> BfsResult:
    """Minimum hop distance from ``sources`` along directed ``edges``."""
    spark = edges.sparkSession
    if isinstance(sources, DataFrame):
        src_df = sources.select("id").distinct()
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "id long")

    # pin the (src, dst) projection once: the loop scans it every round, and
    # the frontier side is the small (broadcast) side of each join
    edges = edges.select("src", "dst").localCheckpoint(eager=True)

    visited = src_df.select("id", F.lit(0).alias("dist")).localCheckpoint(eager=True)
    frontier = visited.select("id")
    rounds = 0
    exhausted = False
    for rounds in range(1, max_hops + 1):
        candidates = (
            edges.join(frontier.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        obs = Observation(f"bfs_round_{rounds}")
        new_frontier = (
            candidates.join(visited.select("id"), "id", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_new = int(obs.get["n"] or 0)
        if n_new == 0:
            new_frontier.unpersist()
            rounds -= 1
            exhausted = True
            break
        new_visited = visited.unionAll(
            new_frontier.select("id", F.lit(rounds).alias("dist"))
        ).localCheckpoint(eager=True)
        visited.unpersist()
        if rounds > 1:
            frontier.unpersist()
        visited, frontier = new_visited, new_frontier
    return BfsResult(distances=visited, rounds=rounds, exhausted=exhausted)


@dataclass
class LandmarkResult:
    distances: DataFrame   # (lm long, id long, dist int) — reachable only
    rounds: int
    exhausted: bool


def landmark_bfs(
    edges: DataFrame,
    landmarks: Sequence[int] | DataFrame,
    max_hops: int = 20,
) -> LandmarkResult:
    """Per-landmark hop distances — the landmark distance-oracle primitive
    (Das Sarma et al., "A Sketch-Based Distance Oracle for Web-Scale
    Graphs", WSDM 2010): after this table exists, d(u, v) is estimated as
    min over landmarks of d(u, lm) + d(lm, v) with two hash joins, no
    traversal. Unlike :func:`bfs_hops` (which MERGES its sources into one
    min-distance field), every landmark keeps its own distance field.

    Scale shape: all landmarks share each superstep (the ppr_batch
    discipline) — frontier rows carry the landmark key, so a round is ONE
    edge join expanding every landmark's frontier at once + one (lm, id)
    anti-join against the visited set; state is O(V·k), the price of any
    k-landmark oracle.
    """
    spark = edges.sparkSession
    if isinstance(landmarks, DataFrame):
        lm_df = landmarks.select(F.col(landmarks.columns[0]).alias("lm")) \
                         .distinct()
    else:
        lm_df = spark.createDataFrame([(int(s),) for s in landmarks],
                                      "lm long")
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    visited = lm_df.select(
        "lm", F.col("lm").alias("id"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = visited.select("lm", "id")
    rounds, exhausted = 0, False
    for rounds in range(1, max_hops + 1):
        candidates = (
            edges.join(frontier.select("lm", F.col("id").alias("src")),
                       "src")
            .select("lm", F.col("dst").alias("id"))
            .distinct()
        )
        obs = Observation(f"lmbfs_round_{rounds}")
        new_frontier = (
            candidates.join(visited.select("lm", "id"), ["lm", "id"],
                            "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if not int(obs.get["n"] or 0):
            rounds -= 1
            exhausted = True
            break
        visited = visited.unionAll(
            new_frontier.select("lm", "id", F.lit(rounds).alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = new_frontier
    return LandmarkResult(distances=visited, rounds=rounds,
                          exhausted=exhausted)
