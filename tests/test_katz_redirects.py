"""Katz centrality and redirect-chain resolution."""

from __future__ import annotations

import pytest

from pagerank_spark.operators.katz import katz_centrality
from pagerank_spark.operators.redirects import resolve_redirects

# small digraph: 0->1, 0->2, 1->2, 2->0, 3 isolated (via universe)
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0)]


def _katz_numpy(edges, n, alpha, beta, iters):
    x = [beta] * n
    for _ in range(iters):
        nxt = [beta] * n
        for s, d in edges:
            nxt[d] += alpha * x[s]
        x = nxt
    return x


def _scores(res):
    return {r["id"]: r["katz"] for r in res.scores.collect()}


def test_katz_fixed_iters_matches_numpy(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = katz_centrality(e, alpha=0.2, beta=1.0, max_iter=4)
    want = _katz_numpy(EDGES, 3, 0.2, 1.0, 4)
    got = _scores(res)
    assert res.iterations == 4 and not res.converged
    for v in range(3):
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_katz_universe_isolated_scores_beta(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    u = spark.createDataFrame([(3,)], "id long")
    got = _scores(katz_centrality(e, alpha=0.2, max_iter=3, universe=u))
    assert got[3] == pytest.approx(1.0)


def test_katz_converges_to_resolvent(spark):
    # closed form x = beta (I - alpha A^T)^-1 1 for the 2-cycle 0<->1:
    # x0 = x1 = beta/(1-alpha)
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    res = katz_centrality(e, alpha=0.5, beta=1.0, max_iter=100, tol=1e-12)
    assert res.converged and res.l1_diff <= 1e-12
    got = _scores(res)
    assert got[0] == pytest.approx(2.0, abs=1e-10)
    assert got[1] == pytest.approx(2.0, abs=1e-10)


def test_katz_duplicate_edges_add_and_weights_match(spark):
    dup = spark.createDataFrame([(0, 1), (0, 1), (1, 0)], "src long, dst long")
    w = spark.createDataFrame([(0, 1, 2.0), (1, 0, 1.0)],
                              "src long, dst long, w double")
    a = _scores(katz_centrality(dup, alpha=0.3, max_iter=3))
    b = _scores(katz_centrality(w, alpha=0.3, max_iter=3, weight_col="w"))
    assert a == pytest.approx(b)


def test_katz_validates_alpha(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="alpha"):
        katz_centrality(e, alpha=1.5)


# --- redirects ---


def _targets(res):
    return {r["id"]: (r["final_id"], r["resolved"])
            for r in res.targets.collect()}


def test_redirect_chain_resolves_to_terminal(spark):
    # 5 -> 4 -> 3 -> 2 -> 1 -> 0 (0 does not redirect)
    r = spark.createDataFrame([(i, i - 1) for i in range(1, 6)],
                              "src long, dst long")
    res = resolve_redirects(r, max_hops=8)
    got = _targets(res)
    assert got == {i: (0, True) for i in range(1, 6)}
    assert res.rounds <= 3


def test_redirect_cycle_and_self_loop_unresolved(spark):
    r = spark.createDataFrame([(10, 11), (11, 10), (7, 7), (1, 2)],
                              "src long, dst long")
    got = _targets(resolve_redirects(r, max_hops=8))
    assert got[1] == (2, True)          # 2 is terminal
    assert got[7] == (7, False)         # self-loop
    assert not got[10][1] and got[10][0] in (10, 11)
    assert not got[11][1] and got[11][0] in (10, 11)


def test_redirect_chain_longer_than_budget_unresolved(spark):
    r = spark.createDataFrame([(i, i - 1) for i in range(1, 12)],
                              "src long, dst long")
    got = _targets(resolve_redirects(r, max_hops=4))
    assert got[2] == (0, True)
    assert not got[11][1]               # 11 hops > budget


def test_redirect_duplicates_collapse_conflicts_raise(spark):
    dup = spark.createDataFrame([(1, 2), (1, 2)], "src long, dst long")
    assert _targets(resolve_redirects(dup)) == {1: (2, True)}
    bad = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="functional"):
        resolve_redirects(bad)


def test_cli_redirects_parquet(spark, tmp_path):
    """--algo redirects over a parquet redirect map writes resolved
    terminal targets."""
    from pagerank_spark.cli import main
    src = tmp_path / "redir"
    spark.createDataFrame([(i, i - 1) for i in range(1, 5)],
                          "src long, dst long").write.parquet(str(src))
    out = tmp_path / "resolved"
    rc = main([str(src), str(out), "8", "--format", "parquet",
               "--algo", "redirects"])
    assert rc == 0
    got = {r["id"]: (r["final_id"], r["resolved"])
           for r in spark.read.parquet(str(out)).collect()}
    assert got == {i: (0, True) for i in range(1, 5)}
