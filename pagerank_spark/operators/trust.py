"""TrustRank and spam mass: seed-biased PageRank for web spam detection.

Gyongyi, Garcia-Molina & Pedersen, "Combating Web Spam with TrustRank"
(VLDB 2004): run PageRank with the teleport vector concentrated on a small
curated set of trusted pages/hosts; trust flows out along links, so pages
reachable only through spam farms get little of it. Spam mass (Gyongyi et
al., "Link Spam Detection Based on Mass Estimation", VLDB 2006) compares the
two fixed points: the fraction of a page's PageRank NOT explained by its
TrustRank is the mass contributed by (potentially) spam sources.

Engine mapping: TrustRank is exactly the personalized-teleport slot the
reference's lightSpMV finalize already carries (d*(A^T r) + (1-d)*p,
/root/reference/lightSpMV/PageRank.h:314-343) with p uniform over the seed
set — a thin layer over ``pagerank(teleport=...)``, inheriting its whole
physical plan (cached src-partitioned edges, salted aggregation, one job
per superstep, checkpoint/resume). Spam mass adds one V-scale join of the
two converged rank vectors.

Scale: the seed set is a curated list (10^2..10^4 rows at any crawl size) —
the teleport join inside the loop broadcasts it; nothing here adds an
E-scale stage beyond the two PageRank runs themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.graph import LinkGraph
from pagerank_spark.operators.pagerank import ALPHA_DEFAULT, PageRankResult, pagerank


def trust_teleport(seeds: DataFrame,
                   universe: DataFrame | None = None) -> DataFrame:
    """Uniform teleport vector over the seed set: (id, p = 1/|seeds|).

    The |seeds| count is a driver scalar — seeds are a curated trust list,
    tiny by construction. ``universe``: optional (id) vertex table; seeds
    outside it are DROPPED BEFORE the 1/n split. This matters: the
    pagerank loop left-joins teleport onto the vertex universe, so an
    out-of-graph seed would otherwise silently carry away its share of
    teleport mass (Σp < 1) and decay every rank each superstep."""
    s = seeds.select("id").distinct()
    if universe is not None:
        s = s.join(universe.select("id"), "id", "leftsemi")
    n = s.count()
    if n == 0:
        raise ValueError("trust seed set is empty (or disjoint from the graph)")
    return s.withColumn("p", F.lit(1.0 / n))


def trustrank(
    graph: LinkGraph,
    seeds: DataFrame,
    alpha: float = ALPHA_DEFAULT,
    tol: float | None = 1e-6,
    max_iter: int = 100,
    **kwargs,
) -> PageRankResult:
    """PageRank with teleport uniform over ``seeds (id)`` — trust scores.

    All ``pagerank`` keyword options (checkpointer, join_strategy, ...)
    pass through."""
    return pagerank(
        graph, alpha=alpha, tol=tol, max_iter=max_iter,
        teleport=trust_teleport(seeds, universe=graph.vertices), **kwargs,
    )


def spam_mass(
    graph: LinkGraph,
    seeds: DataFrame,
    alpha: float = ALPHA_DEFAULT,
    tol: float | None = 1e-6,
    max_iter: int = 100,
) -> DataFrame:
    """Relative spam mass per vertex: (pr - tr) / pr.

    ``pr`` is ordinary PageRank, ``tr`` TrustRank over the same graph and
    alpha (both Σ=1). Near 1: essentially none of the vertex's rank is
    endorsed by the trusted core (spam-farm signature); near 0 (or
    negative): trust-rich. pr >= (1-alpha)/n > 0, so the ratio is total.
    """
    # the two power iterations share only the cached immutable edge table;
    # submitting their job DAGs from two threads overlaps their supersteps
    # (each one's shuffle waves fill the slots the other leaves idle at its
    # per-superstep barriers — same pattern as SCC's fwd/bwd fixpoints,
    # operators/scc.py). Futures re-raise worker exceptions on .result().
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        pr_fut = pool.submit(pagerank, graph, alpha=alpha, tol=tol,
                             max_iter=max_iter)
        tr_fut = pool.submit(trustrank, graph, seeds, alpha=alpha, tol=tol,
                             max_iter=max_iter)
        pr, tr = pr_fut.result().ranks, tr_fut.result().ranks
    return (
        pr.select("id", F.col("rank").alias("pr"))
        .join(tr.select("id", F.col("rank").alias("tr")), "id")
        .select(
            "id", "pr", "tr",
            ((F.col("pr") - F.col("tr")) / F.col("pr")).alias("spam_mass"),
        )
    )
