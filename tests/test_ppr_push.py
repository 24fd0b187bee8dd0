"""Forward-push approximate PPR (operators/ppr_push.py) vs the exact
personalized power iteration, plus the ACL invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.pagerank import pagerank
from pagerank_spark.operators.ppr_push import ppr_push


def _random_graph(spark, n, m, tag):
    rng = random.Random(tag)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    return build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long"))


def test_push_tracks_exact_ppr(spark):
    g = _random_graph(spark, 30, 90, 7)
    seed = 3
    res = ppr_push(g, seed=seed, alpha=0.5, eps=1e-7, max_rounds=80)
    assert res.converged
    tp = g.vertices.filter(F.col("id") == seed).select(
        "id", F.lit(1.0).alias("p"))
    exact = pagerank(g, alpha=0.5, tol=1e-11, max_iter=200,
                     teleport=tp).ranks
    joined = exact.join(res.scores.select("id", "p"), "id", "left").select(
        F.max(F.abs(F.col("rank") - F.coalesce("p", F.lit(0.0)))).alias("mx"),
        F.sum("rank").alias("tot")).first()
    # |pr - p| <= total residual <= eps * sum(max(deg,1)) — tiny at eps=1e-7
    assert joined["mx"] < 1e-4
    assert abs(joined["tot"] - 1.0) < 1e-9
    g.unpersist()


def test_push_mass_conservation_and_sparsity(spark):
    # two components; the seed's component has 4 vertices — pushed mass
    # can only ever reach those 4 (plus nothing else): state stays sparse
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 10)]
    g = build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long"))
    # p + r sums to 1 EXACTLY at every round (the invariant under
    # test) — eps only sets how soon the loop stops, so 1e-7 buys the
    # same assert ~7 rounds cheaper than 1e-9
    res = ppr_push(g, seed=0, alpha=0.5, eps=1e-7, max_rounds=60)
    assert res.converged
    rows = res.scores.collect()
    assert {r.id for r in rows} <= {0, 1, 2, 3}
    assert abs(sum(r.p + r.r for r in rows) - 1.0) < 1e-12
    g.unpersist()


def test_push_dangling_mass_reinjected_at_seed(spark):
    # seed -> sink (dangling): α of each pushed unit returns to the seed;
    # the fixed point matches the exact teleport run on the same graph
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1)], "src long, dst long"))
    # rounds scale ~log(1/eps)/log(2) on this 2-vertex fixture and
    # each round is a full Spark fixpoint step; 1e-5 keeps the compare
    # bound (below) an order under the asserts at half the rounds
    res = ppr_push(g, seed=0, alpha=0.5, eps=1e-5, max_rounds=60)
    assert res.converged
    got = {r.id: r.p for r in res.scores.collect()}
    tp = g.vertices.filter(F.col("id") == 0).select(
        "id", F.lit(1.0).alias("p"))
    exact = {r.id: r.rank
             for r in pagerank(g, alpha=0.5, tol=1e-9, max_iter=200,
                               teleport=tp).ranks.collect()}
    # residual bound: |p - pr| <= eps * sum(max(deg,1)) = 2e-5, plus the
    # exact side's own 1e-9 stop residual
    assert abs(got[0] - exact[0]) < 1e-4
    assert abs(got[1] - exact[1]) < 1e-4
    g.unpersist()


def test_push_validates_inputs(spark):
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1)], "src long, dst long"))
    with pytest.raises(ValueError, match="seed"):
        ppr_push(g, seed=99)
    with pytest.raises(ValueError, match="alpha"):
        ppr_push(g, seed=0, alpha=1.0)
    with pytest.raises(ValueError, match="eps"):
        ppr_push(g, seed=0, eps=0.0)
    g.unpersist()
