"""Heat-kernel diffusion scores — the third member of the engine's
diffusion family.

PageRank weights walk lengths geometrically (α^j), Katz counts
attenuated paths, and the heat kernel weights them by a Poisson
distribution (Chung, "The heat kernel as the pagerank of a graph", PNAS
2007):

    hk_t = Σ_{j≥0} e^{-t} t^j / j! · (Pᵀ)^j s

with P the out-degree-normalized walk matrix and ``s`` the seed
distribution. The Poisson profile concentrates mass at walk length ≈ t,
which is why heat-kernel scores give tighter local communities than PPR
(Kloster & Gleich, KDD 2014) — short-circuiting neither too early
(PageRank's heavy j=0,1 terms) nor diffusing forever.

Computed by the truncated series: x_0 = s, x_{j+1} = Pᵀ x_j (dangling
mass re-injected ∝ s, the engine's teleport convention), and

    hk ≈ Σ_{j=0}^{K} c_j x_j,   c_j = e^{-t} t^j / j!

The dropped tail is bounded by 1 − Σ_{j≤K} c_j (the Poisson upper tail,
reported so callers can size K; K ~ t + a few √t suffices).

Scale shape (10^12 edges): each term is ONE J1-shaped rank-gather
equi-join + per-dst combinable SUM — exactly the audited pagerank
superstep (kernel_bblock.cu:337,219-464) with the affine damping
replaced by a coefficient accumulation; the dangling mass is the same
fused scalar. State is two O(V) vectors (current term, running sum). The
coefficients are driver-side Python floats inlined as literals, so the
DuckDB oracle replays bit-identical arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pagerank_spark.operators.graph import LinkGraph


def heat_coefficients(t: float, terms: int) -> list[float]:
    """c_j = e^{-t} t^j / j! for j = 0..terms, evaluated with the same
    recurrence (c_j = c_{j-1} * t / j) the oracle literals come from."""
    cs = [math.exp(-t)]
    for j in range(1, terms + 1):
        cs.append(cs[-1] * t / j)
    return cs


def heat_kernel_pagerank(graph: LinkGraph, t: float = 2.0,
                         terms: int = 10,
                         seed: int | None = None) -> DataFrame:
    """Truncated heat-kernel scores ``(id, hk)`` over ``graph``.

    ``seed=None`` diffuses from the uniform distribution (global scores,
    Σ hk = Σ c_j ≤ 1); an integer seed diffuses from e_seed (local
    scores). ``hk`` is rounded to 8 decimals.
    """
    if t <= 0:
        raise ValueError(f"t must be positive: {t}")
    if terms < 0:
        raise ValueError(f"terms must be >= 0: {terms}")
    verts = graph.vertices.select("id", "is_dangling")
    if seed is not None and verts.filter(F.col("id") == int(seed)).isEmpty():
        raise ValueError(f"seed {seed} is not in the graph's vertex universe")
    cs = heat_coefficients(t, terms)
    n = graph.n_vertices

    if seed is None:
        s = verts.select("id", "is_dangling", F.lit(1.0 / n).alias("s"))
    else:
        s = verts.select(
            "id", "is_dangling",
            F.when(F.col("id") == int(seed), F.lit(1.0))
            .otherwise(F.lit(0.0)).alias("s"))

    # the per-term dangling scalar rides each term's materialization as
    # an observed metric (the pagerank.py one-job-per-superstep
    # discipline) — no extra per-round action
    dang_of = lambda c: F.sum(F.when(F.col("is_dangling"), c)          # noqa: E731
                              .otherwise(F.lit(0.0))).alias("d")
    obs0 = Observation("hk_term_0")
    s = s.observe(obs0, dang_of(F.col("s"))).localCheckpoint(eager=True)
    dang = float(obs0.get["d"] or 0.0)

    x = s.select("id", F.col("s").alias("x"))
    hk = x.select("id", (F.lit(cs[0]) * F.col("x")).alias("hk"))
    for j in range(1, terms + 1):
        gathered = (graph.edges
                    .join(x.select(F.col("id").alias("src"), "x"), "src")
                    .select(F.col("dst").alias("id"),
                            (F.col("x") * F.col("w")).alias("m"))
                    .groupBy("id").agg(F.sum("m").alias("m")))
        obs = Observation(f"hk_term_{j}")
        xdf = (s.join(gathered, "id", "left")
               .select("id", "is_dangling",
                       (F.coalesce("m", F.lit(0.0))
                        + F.lit(dang) * F.col("s")).alias("x"))
               .observe(obs, dang_of(F.col("x")))
               .localCheckpoint(eager=True))
        dang = float(obs.get["d"] or 0.0)
        x = xdf.select("id", "x")
        hk = (hk.join(x, "id")
              .select("id", (F.col("hk") + F.lit(cs[j]) * F.col("x"))
                      .alias("hk"))
              .localCheckpoint(eager=False))
    return hk.select("id", F.round("hk", 8).alias("hk"))
