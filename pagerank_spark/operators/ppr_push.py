"""Single-seed approximate personalized PageRank by forward push.

The batch power iteration (operators/ppr_batch.py) costs O(V) state and
O(E) gather work per superstep regardless of how local the answer is —
overkill when ONE seed's neighborhood is wanted (a "related pages" probe,
a crawl-frontier prior, a seed-expansion step). Forward push (Andersen,
Chung, Lang, "Local Graph Partitioning using PageRank Vectors", FOCS
2006) maintains an approximation ``p`` and a residual ``r`` with the
invariant  pr_seed = p + Σ_u r(u)·pr_u  and repeatedly "pushes" vertices
whose residual is large relative to their degree: a push at ``u`` settles
``(1-α)·r(u)`` into ``p(u)`` and forwards ``α·r(u)`` along u's out-edges.
Total settled mass only grows, residual mass only shrinks, and — the
point — ONLY vertices the walk actually reaches ever enter the state, so
work and state are proportional to the support of the answer, not to V.

Semantics match ``pagerank(teleport=e_seed)`` (α = damping / follow
probability, dangling mass re-injected at the seed): at convergence
(empty active set) every vertex holds  |pr(v) − p(v)| ≤ Σ r ≤ ε·Σ deg,
with the per-vertex ACL guarantee r(v) ≤ ε·max(out_deg(v), 1).

This is the SYNCHRONOUS batch formulation: each round pushes EVERY
vertex above threshold at once — one frontier-restricted J1-shaped join
(edges ⋈ active) + one map-side-combinable hash aggregate per round, the
sssp.py/bfs.py discipline. Determinism: the active set is a pure
predicate of the state and each round's sums are order-free, so the
whole fixpoint is reproducible under any partitioning (and replicated
verbatim by the DuckDB oracle in __spark_entry__.py).

Scale shape (10^12 edges): state holds only touched vertices (sparse);
the per-round edge join is frontier-restricted exactly like sssp; the
inflow aggregate's partials collapse hub destinations map-side; the one
driver-side value per round is the observed active count. No windows, no
collect beyond that scalar.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pagerank_spark.operators.graph import LinkGraph
from pagerank_spark.operators.pagerank import ALPHA_DEFAULT


@dataclass
class PPRPushResult:
    scores: DataFrame   # (id, p double, r double) — touched vertices only
    rounds: int
    converged: bool     # True iff the active set emptied within max_rounds


def ppr_push(
    graph: LinkGraph,
    seed: int,
    alpha: float = ALPHA_DEFAULT,
    eps: float = 1e-4,
    max_rounds: int = 40,
) -> PPRPushResult:
    """Approximate PPR from ``seed``: push rounds until no vertex has
    r(v) > eps·max(out_deg(v), 1), or ``max_rounds``.

    ``scores`` contains only vertices the pushed mass reached; absent
    vertices have p = 0 exactly. p + r sums to 1 (mass conservation) at
    every round.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    if eps <= 0.0:
        raise ValueError(f"eps must be positive: {eps}")
    spark = graph.edges.sparkSession
    verts = graph.vertices.select("id", "out_deg", "is_dangling")
    if verts.filter(F.col("id") == int(seed)).isEmpty():
        raise ValueError(f"seed {seed} is not in the graph's vertex universe")

    state = spark.createDataFrame([(int(seed), 0.0, 1.0)],
                                  "id long, p double, r double") \
        .localCheckpoint(eager=True)
    rounds, converged = 0, False
    for rounds in range(1, max_rounds + 1):
        obs = Observation(f"push_round_{rounds}")
        st = (state.join(verts, "id", "left")
              .select("id", "p", "r",
                      F.coalesce("is_dangling", F.lit(True))
                       .alias("is_dangling"),
                      (F.col("r") > F.lit(float(eps))
                       * F.greatest(F.coalesce("out_deg", F.lit(0)),
                                    F.lit(1))).alias("active"))
              .observe(obs, F.sum(F.when(F.col("active"), 1).otherwise(0))
                       .alias("n_active"))
              .localCheckpoint(eager=True))
        if not int(obs.get["n_active"] or 0):
            state = st.select("id", "p", "r")
            rounds -= 1
            converged = True
            break
        act = st.filter("active")
        flows = (graph.edges
                 .join(act.select(F.col("id").alias("src"), "r"), "src")
                 .select(F.col("dst").alias("id"),
                         (F.lit(alpha) * F.col("r") * F.col("w"))
                         .alias("flow"))
                 .unionByName(
                     # dangling pushes re-inject their forwarded mass at
                     # the seed — the teleport-proportional redistribution
                     # of the main loop specialized to e_seed
                     act.filter("is_dangling")
                     .select(F.lit(int(seed)).alias("id"),
                             (F.lit(alpha) * F.col("r")).alias("flow"))))
        inflow = flows.groupBy("id").agg(F.sum("flow").alias("flow"))
        state = (st.select(
            "id",
            (F.col("p") + F.when(F.col("active"),
                                 F.lit(1.0 - alpha) * F.col("r"))
             .otherwise(F.lit(0.0))).alias("p"),
            F.when(F.col("active"), F.lit(0.0)).otherwise(F.col("r"))
            .alias("r"))
            .join(inflow, "id", "full_outer")
            .select("id",
                    F.coalesce("p", F.lit(0.0)).alias("p"),
                    (F.coalesce("r", F.lit(0.0))
                     + F.coalesce("flow", F.lit(0.0))).alias("r")))
    return PPRPushResult(scores=state, rounds=rounds, converged=converged)
