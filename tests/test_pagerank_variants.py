"""Reference variant semantics: P5 out-degree init, P8 no-redistribution
fork, A5 L2 stop, A6 per-bin telemetry, P9 pre-weighted edges."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.pagerank import pagerank
from pagerank_spark.sources import synth


@pytest.fixture(scope="module")
def g6(spark):
    edges = spark.createDataFrame(synth.G6_EDGES, schema="src long, dst long")
    return build_graph(spark, edges, n_vertices=6)


def _vec(res, n):
    out = np.zeros(n)
    for r in res.ranks.collect():
        out[r.id] = r.rank
    return out


def test_out_degree_init_same_fixed_point(spark, g6):
    """P5 (kernel_bblock.cu:56-68) only changes the starting point; the
    damped chain has a unique fixed point."""
    # starting-point independence holds at ANY damping; alpha=0.5 bounds
    # convergence at ~22 supersteps a side vs 60+ at the default 0.85
    a = pagerank(g6, alpha=0.5, tol=3e-7, max_iter=150)
    b = pagerank(g6, alpha=0.5, tol=3e-7, max_iter=150, init="out_degree")
    np.testing.assert_allclose(_vec(a, 6), _vec(b, 6), atol=1e-5)


def test_no_redistribution_leaks_dangling_mass(spark, g6):
    """P8 (lightSpMV PageRank.h:339-343): vertex 1 is dangling, so total
    mass at the fixed point is < 1."""
    res = pagerank(g6, tol=1e-8, max_iter=300, dangling_redistribution=False)
    total = float(res.ranks.agg(F.sum("rank")).first()[0])
    assert total < 1.0 - 1e-3
    # oracle: explicit leaky power iteration
    A = np.zeros((6, 6))
    out = np.zeros(6)
    for s, d in synth.G6_EDGES:
        out[s] += 1
    for s, d in synth.G6_EDGES:
        A[d, s] = 1.0 / out[s]
    r = np.full(6, 1 / 6)
    for _ in range(300):
        nxt = 0.85 * A @ r + 0.15 / 6
        if np.abs(nxt - r).sum() <= 1e-8:
            r = nxt
            break
        r = nxt
    np.testing.assert_allclose(_vec(res, 6), r, atol=1e-6)


def test_no_redistribution_equals_default_without_dangling(spark):
    """With zero dangling vertices the P8 fork is a no-op."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], schema="src long, dst long")
    g = build_graph(spark, edges, n_vertices=3)
    # the no-op holds superstep-for-superstep — a fixed 10-iteration pair
    # compares the identical trajectories without ~100 convergence rounds
    a = pagerank(g, tol=None, max_iter=10)
    b = pagerank(g, tol=None, max_iter=10, dangling_redistribution=False)
    np.testing.assert_allclose(_vec(a, 3), _vec(b, 3), atol=1e-12)


def test_l2_norm_stop(spark, g6):
    """A5 (lightSpMV PageRank.h:56-66): L2 stop converges to the same
    ranks; metrics carry both norms and l2 <= l1 always."""
    # the L2-vs-L1 stop semantics are alpha-independent; 0.5 halves the
    # superstep count of each convergence
    res = pagerank(g6, alpha=0.5, tol=3e-7, max_iter=300, norm="l2")
    assert res.converged
    ref = pagerank(g6, alpha=0.5, tol=3e-7, max_iter=300)
    np.testing.assert_allclose(_vec(res, 6), _vec(ref, 6), atol=1e-5)
    for m in res.metrics:
        assert m["l2_diff"] <= m["l1_diff"] + 1e-15


def test_bin_telemetry_recorded(spark, g6):
    """A6 (for_test.h:51-85): per-bin mean |Δ| present and shrinking."""
    res = pagerank(g6, tol=None, max_iter=5, bin_telemetry=True)
    rows = [m for m in res.metrics if "bin_convergence" in m]
    assert len(rows) == 5
    first, last = rows[0]["bin_convergence"], rows[-1]["bin_convergence"]
    assert set(first) and all(
        last[b]["mean_abs_diff"] <= first[b]["mean_abs_diff"] for b in last)


def test_personalized_pagerank_matches_oracle(spark, g6):
    """Topic-sensitive teleport: p concentrated on vertices {3, 5}."""
    import pyspark.sql.functions as SF

    from pagerank_spark.oracle import pagerank_oracle
    p = np.zeros(6)
    p[3], p[5] = 0.7, 0.3
    tp = spark.createDataFrame([(3, 0.7), (5, 0.3)], "id long, p double")
    res = pagerank(g6, tol=1e-10, max_iter=300, teleport=tp)
    want = pagerank_oracle(synth.G6_EDGES, 6, 0.85, tol=1e-10, max_iter=300, p=p)
    np.testing.assert_allclose(_vec(res, 6), want, atol=1e-9)
    # teleport mass still conserves Σrank = 1 (dangling mass re-injected via p)
    assert float(res.ranks.agg(SF.sum("rank")).first()[0]) == pytest.approx(1.0)


def test_personalized_uniform_equals_default(spark, g6):
    """Uniform p reproduces standard PageRank exactly."""
    tp = spark.createDataFrame([(i, 1 / 6) for i in range(6)], "id long, p double")
    # trajectory identity holds at EVERY superstep — fixed iterations
    # compare the same thing as deep convergence at a fraction of the jobs
    a = pagerank(g6, tol=None, max_iter=10)
    b = pagerank(g6, tol=None, max_iter=10, teleport=tp)
    np.testing.assert_allclose(_vec(a, 6), _vec(b, 6), atol=1e-12)


def test_weighted_edges_row_normalized(spark):
    """P9 (lightSpMV PageRank.h:256-274): explicit weights, |.|-row-sum
    normalized; uniform explicit weights reproduce the unweighted graph."""
    rows = [(0, 1, 3.0), (0, 2, -1.0), (1, 2, 2.0)]
    g = build_graph(
        spark,
        spark.createDataFrame(rows, schema="src long, dst long, w double"),
        n_vertices=3,
    )
    w = {(r.src, r.dst): r.w for r in g.edges.collect()}
    assert w[(0, 1)] == pytest.approx(0.75) and w[(0, 2)] == pytest.approx(0.25)
    assert w[(1, 2)] == pytest.approx(1.0)

    uni = [(s, d, 2.5) for s, d in synth.G6_EDGES]
    gw = build_graph(
        spark, spark.createDataFrame(uni, schema="src long, dst long, w double"),
        n_vertices=6)
    gu = build_graph(
        spark, spark.createDataFrame(synth.G6_EDGES, schema="src long, dst long"),
        n_vertices=6)
    # per-superstep trajectory identity — fixed iterations suffice
    rw = pagerank(gw, tol=None, max_iter=10)
    ru = pagerank(gu, tol=None, max_iter=10)
    np.testing.assert_allclose(_vec(rw, 6), _vec(ru, 6), atol=1e-12)


def test_warm_start_converges_faster_and_to_same_fixed_point(spark):
    """init_ranks: re-rank a perturbed graph seeded with the previous
    converged vector — same fixed point, fewer iterations than cold."""
    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank

    from pagerank_spark.functions.hashing import mix2
    n, m = 400, 1600
    ids = np.arange(m, dtype=np.uint64)
    base = list(zip((mix2(ids, 71) % np.uint64(n)).astype(np.int64).tolist(),
                    (mix2(ids, 72) % np.uint64(n)).astype(np.int64).tolist()))
    g1 = build_graph(spark, spark.createDataFrame(base, "src long, dst long"),
                     n_vertices=n)
    # warm<=cold and fixed-point identity hold at any damping; alpha=0.6
    # cuts each of the three convergences from ~70 to ~25 supersteps
    r1 = pagerank(g1, alpha=0.6, tol=1e-5, max_iter=200)
    assert r1.converged

    # perturb: three extra edges out of 1600 — a small crawl delta
    delta = [(1, 7), (9, 300), (123, 45)]
    g2 = build_graph(spark,
                     spark.createDataFrame(base + delta, "src long, dst long"),
                     n_vertices=n)
    cold = pagerank(g2, alpha=0.6, tol=1e-6, max_iter=200)
    warm = pagerank(g2, alpha=0.6, tol=1e-6, max_iter=200,
                    init_ranks=r1.ranks.select("id", "rank"))
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations
    got_cold = {r.id: r.rank for r in cold.ranks.collect()}
    got_warm = {r.id: r.rank for r in warm.ranks.collect()}
    for i in range(n):
        assert got_warm[i] == pytest.approx(got_cold[i], abs=1e-5)


@pytest.mark.parametrize("bad", ["zero", "negative", "nan"])
def test_warm_start_rejects_degenerate_init(spark, bad):
    """An all-zero, negative-sum, or NaN-polluted init vector must raise,
    not silently renormalize the whole run into NaN/inf ranks."""
    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank

    g = build_graph(spark, spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"), n_vertices=3)
    val = {"zero": 0.0, "negative": -1.0, "nan": float("nan")}[bad]
    init = spark.createDataFrame([(i, val) for i in range(3)],
                                 "id long, rank double")
    with pytest.raises(ValueError, match="init_ranks"):
        pagerank(g, max_iter=2, tol=None, init_ranks=init)
