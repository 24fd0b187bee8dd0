"""Connected components: alternating large-star / small-star (hash-min).

Absent from the reference (SURVEY.md §2.9); mandated by the north rule.
Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — alternating star operations converge in O(log^2 n) rounds on
any graph (empirically ~log n), each round two groupBy-aggregations over
the edge set. This is the scalable choice at 10^12 edges: no O(diameter)
propagation, no driver-side state beyond a convergence scalar.

  large-star: for each vertex u and its neighborhood N(u) (both directions),
              m = min({u} ∪ N(u)); emit (v, m) for v ∈ N(u), v > u
  small-star: key every edge by its larger endpoint: (u = max, v = min);
              m = min(N(u)); emit (u, m) and (v, m) for v ∈ N(u), v ≠ m

Convergence: the edge multiset stops changing. We detect it with
(count, sum of xxhash64(src,dst)) collected as OBSERVED metrics on each
round's own materialization — zero extra jobs; a false stop needs a 64-bit
hash-sum collision on same-count sets (~2^-64, documented trade against a
full exceptAll anti-join per round).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ComponentsResult:
    labels: DataFrame          # (id long, component long) — component = min id
    rounds: int
    converged: bool


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected simple graph: drop self-loops, orient small->large, dedupe."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    # symmetric neighborhoods
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # key by larger endpoint; neighbors are the smaller ones
    keyed = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    m = keyed.groupBy("u").agg(F.min("v").alias("m"))
    with_m = keyed.join(m, "u")
    out = with_m.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("src"), F.col("m").alias("dst")
    ).unionAll(m.select(F.col("u").alias("src"), F.col("m").alias("dst")))
    return out.distinct()


def _sig_metrics() -> list:
    # decimal(38,0) sum: no overflow under ANSI mode at any realistic edge count
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ]


def _observed_checkpoint(edges: DataFrame, name: str) -> tuple[DataFrame, tuple[int, int]]:
    """Materialize a round's edge set AND collect its convergence signature
    in the same Spark job (observed metrics on the localCheckpoint) — one
    job per round, not a round job plus a signature scan."""
    obs = Observation(name)
    out = edges.observe(obs, *_sig_metrics()).localCheckpoint(eager=True)
    got = obs.get
    return out, (int(got["n"]), int(got["h"] or 0))


def connected_components(
    edges: DataFrame,
    universe: DataFrame | None = None,
    max_rounds: int = 50,
) -> ComponentsResult:
    """Component label (= min vertex id in the component) per vertex.

    ``universe``: optional (id) DataFrame of all vertices — isolated ones
    get their own id as label, matching the union-find oracle exactly.
    """
    cur, sig = _observed_checkpoint(_canonical(edges), "cc_init")
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        nxt, nsig = _observed_checkpoint(
            _small_star(_large_star(cur)), f"cc_round_{rounds}")
        cur.unpersist()  # drop the previous round's checkpoint blocks
        cur = nxt
        if nsig == sig:
            converged = True
            break
        sig = nsig

    # final star edges: (child -> root). canonicalize (larger endpoint is child)
    child_root = cur.select(
        F.greatest("src", "dst").alias("id"), F.least("src", "dst").alias("component")
    ).groupBy("id").agg(F.min("component").alias("component"))

    members = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    if universe is not None:
        members = members.unionAll(universe.select("id"))
    labels = (
        members.distinct()
        .join(child_root, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    return ComponentsResult(labels=labels, rounds=rounds, converged=converged)
