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
    checkpointer=None,
    resume: bool = False,
    prior_labels: DataFrame | None = None,
) -> ComponentsResult:
    """Component label (= min vertex id in the component) per vertex.

    ``universe``: optional (id) DataFrame of all vertices — isolated ones
    get their own id as label, matching the union-find oracle exactly.

    ``prior_labels``: optional (id, component) frame from a previous run —
    the incremental-recompute warm start for a crawl DELTA that only ADDS
    edges (the same role ``init_ranks`` plays for ``pagerank()``). Each
    prior component collapses to a star edge (id, component) folded into
    the input, so already-merged structure contracts in round 1 instead of
    being re-derived; extra edges can only merge components further, never
    split them, so the fixpoint is identical to a cold run on the full
    edge set. NOT valid if the delta REMOVES edges — removal can split a
    component, which a label edge would incorrectly hold together.

    ``checkpointer``: optional dir-backed
    :class:`~pagerank_spark.plans.checkpoint.SuperstepCheckpointer` — each
    round's contracted edge state commits to parquet with a metrics row
    (edge count, state hash, wall ms, per-partition lineage), and
    ``resume=True`` continues a killed run from the last committed round
    (the same superstep-resume contract as ``pagerank()``; the round state
    IS the star-contracted edge multiset, so nothing else needs saving).
    ``checkpointer=None`` keeps the in-memory ``localCheckpoint`` path.
    """
    from pagerank_spark.plans.checkpoint import StageTimer

    start_round = 0
    if checkpointer is not None and not resume:
        checkpointer.reset()
    if checkpointer is not None and resume and \
            (last := checkpointer.last_committed()) is not None:
        # re-materialize the committed state; the convergence signature is
        # a deterministic function of the edge multiset, so recomputing it
        # on load reproduces exactly what the killed run observed
        cur, sig = _observed_checkpoint(checkpointer.load(last), "cc_resume")
        start_round = last
    else:
        base = edges
        if prior_labels is not None:
            base = edges.select("src", "dst").unionAll(
                prior_labels.select(F.col("id").alias("src"),
                                    F.col("component").alias("dst")))
        cur, sig = _observed_checkpoint(_canonical(base), "cc_init")
    rounds = start_round
    converged = False
    timer = StageTimer()
    for rounds in range(start_round + 1, max_rounds + 1):
        nxt, nsig = _observed_checkpoint(
            _small_star(_large_star(cur)), f"cc_round_{rounds}")
        if checkpointer is not None:
            # durable commit off the in-memory blocks (no recompute), then
            # keep iterating on the in-memory copy
            checkpointer.save(rounds, nxt)
            checkpointer.record(rounds, nxt, n_edges=nsig[0],
                                state_hash=str(nsig[1]),
                                converged=(nsig == sig),
                                wall_ms=timer.lap_ms())
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
    if prior_labels is not None:
        # a prior vertex kept alive only by `universe` in the previous run
        # must stay in the output even if the new edge set never names it
        members = members.unionAll(prior_labels.select("id")).unionAll(
            prior_labels.select(F.col("component").alias("id")))
    if universe is not None:
        members = members.unionAll(universe.select("id"))
    labels = (
        members.distinct()
        .join(child_root, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    return ComponentsResult(labels=labels, rounds=rounds, converged=converged)
