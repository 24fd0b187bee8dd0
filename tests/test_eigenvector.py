"""Eigenvector centrality: power iteration vs a pure-Python oracle."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.eigenvector import eigenvector_centrality

# strongly-connected-ish digraph with a duplicate edge (weights add)
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 0), (3, 0)]


def _eig_python(edges, n, iters, w=None):
    x = [1.0] * n
    for _ in range(iters):
        nxt = [0.0] * n
        for i, (s, d) in enumerate(edges):
            nxt[d] += x[s] * (w[i] if w else 1.0)
        tot = sum(abs(v) for v in nxt)
        x = [v / tot for v in nxt]
    return x


def _scores(res):
    return {r["id"]: r["eig"] for r in res.scores.collect()}


def test_eigenvector_matches_python(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = eigenvector_centrality(e, iterations=3)
    want = _eig_python(EDGES, 4, 3)
    got = _scores(res)
    assert res.iterations == 3
    for i in range(4):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_eigenvector_weighted_and_universe(spark):
    w = [2.0, 1.0, 1.0, 0.5, 0.5, 3.0]
    e = spark.createDataFrame(
        [(s, d, wt) for (s, d), wt in zip(EDGES, w)],
        "src long, dst long, w double")
    uni = spark.createDataFrame([(i,) for i in range(6)], "id long")
    res = eigenvector_centrality(e, iterations=2, universe=uni, weight_col="w")
    want = _eig_python(EDGES, 6, 2, w=w)
    got = _scores(res)
    assert set(got) == set(range(6))
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    assert got[4] == 0.0 and got[5] == 0.0  # isolated via universe


def test_eigenvector_degenerate_drain_raises(spark):
    # layered DAG: all mass lands on sinks after round 1, drains at round 2
    e = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="degenerated at iteration 2"):
        eigenvector_centrality(e, iterations=2)


def test_eigenvector_rejects_zero_iters(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        eigenvector_centrality(e, iterations=0)
