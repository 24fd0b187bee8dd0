"""Monte-Carlo SimRank for query pairs via coupled reverse walks.

SimRank (Jeh & Widom, KDD 2002) scores two pages as similar when they
are pointed at by similar pages: s(u, v) = E[ c^tau ], where tau is the
FIRST MEETING TIME of two random walks started at u and v on the
REVERSED graph (the random-surfer-pair formulation, Jeh-Widom Thm 2).
Exact SimRank iterates over O(V^2) pair state — a non-starter at web
scale — so this module implements the scalable estimator of Fogaras &
Racz, "Scaling link-based similarity search" (WWW 2005): simulate R
coupled reverse walks per queried vertex and average c^tau over the
serials where the two walks meet.

Coupling (``random_walks(coupled=True)``): the neighbor pick at step k
is a hash of (walk serial, k, CURRENT vertex) — not the start — so two
walks are independent while they are apart (different vertices hash
differently) and coalesce forever once they meet. That preserves the
first-meeting distribution the estimator needs while making each
serial's step a FUNCTION of the vertex (one fingerprint per serial, the
F-R trick), and keeps the whole simulation a pure cross-engine hash
function — replayable in the DuckDB oracle like every walk operator.

Scale shape: state is O(|query endpoints| x R) walker rows (never
O(V^2) and never O(V) unless asked); per step the standard two
hash-joins of walks.py against the reused adjacency index. The meeting
computation is one (serial, step, vertex) equi-join between the two
sides' walk tables + a min/1-row-per-serial aggregate — no windows.
Dangling-vertex termination (walkers stop) simply truncates tau, which
only LOWERS the estimate toward the exact semantics of walks that never
meet (contribution 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.walks import random_walks


def simrank_mc(
    edges: DataFrame,
    pairs: DataFrame,
    c: float = 0.8,
    walk_length: int = 5,
    walks: int = 24,
    seed: int = 42,
) -> DataFrame:
    """Estimate SimRank for each ``(u, v)`` query pair.

    Returns ``(u, v, n_meets, simrank)`` — ``n_meets`` of the ``walks``
    coupled serials met within ``walk_length`` reverse steps, and
    ``simrank`` = (1/walks) * Σ_meets c^tau, rounded to 6 dp (identical
    power/sum algebra in the SQL oracle). Pairs with u == v score 1.0 by
    definition; pairs never meeting score 0.0 (a row is always emitted).
    """
    if not 0.0 < c < 1.0:
        raise ValueError(f"c must be in (0, 1): {c}")
    p = pairs.select("u", "v")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    starts = (p.select(F.col("u").alias("id"))
              .unionByName(p.select(F.col("v").alias("id"))))
    wk = random_walks(rev, walk_length=walk_length, walks_per_vertex=walks,
                      seed=seed, starts=starts, coupled=True)
    wa = p.join(wk.select(F.col("start_id").alias("u"), "walk", "step",
                          "vertex"), "u")
    wb = wk.select(F.col("start_id").alias("v"),
                   F.col("walk").alias("walk"),
                   F.col("step").alias("step"),
                   F.col("vertex").alias("vertex"))
    tau = (
        wa.join(wb, ["v", "walk", "step", "vertex"])
        .filter(F.col("step") > 0)          # step-0 meet means u == v
        .groupBy("u", "v", "walk")
        .agg(F.min("step").alias("tau"))
    )
    met = (tau.groupBy("u", "v")
           .agg(F.count(F.lit(1)).alias("n_meets"),
                F.sum(F.pow(F.lit(c), F.col("tau"))).alias("mass")))
    return (
        p.join(met, ["u", "v"], "left")
        .select(
            "u", "v",
            F.when(F.col("u") == F.col("v"), F.lit(walks))
            .otherwise(F.coalesce("n_meets", F.lit(0))).cast("int")
            .alias("n_meets"),
            F.when(F.col("u") == F.col("v"), F.lit(1.0))
            .otherwise(F.round(F.coalesce(F.col("mass"), F.lit(0.0))
                               / F.lit(float(walks)), 6))
            .alias("simrank"))
    )
