"""HITS, BFS hop distance, and k-core vs exact Python/NumPy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.functions.hashing import mix2
from pagerank_spark.operators.bfs import bfs_hops
from pagerank_spark.operators.hits import hits
from pagerank_spark.operators.kcore import k_core
from pagerank_spark.oracle import bfs_oracle, hits_oracle, kcore_oracle


def _random_edges(n: int, m: int, seed_tag: int) -> list[tuple[int, int]]:
    ids = np.arange(m, dtype=np.uint64)
    src = mix2(ids, seed_tag) % np.uint64(n)
    dst = mix2(ids, seed_tag ^ 0xBEEF) % np.uint64(n)
    return [(int(s), int(d)) for s, d in zip(src, dst)]


@pytest.mark.parametrize("n,m,tag", [(100, 400, 11), (60, 60, 12)])
def test_hits_matches_numpy(spark, n, m, tag):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = hits(df, universe=spark.range(n), iterations=3)
    got = {r.id: (r.hub, r.authority) for r in res.scores.collect()}
    hub, auth = hits_oracle(edges, n, iterations=3)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i][0] == pytest.approx(hub[i], abs=1e-12)
        assert got[i][1] == pytest.approx(auth[i], abs=1e-12)


def test_hits_star_graph(spark):
    """Hub/authority split: all edges point at the center, so the center is
    the only authority and the leaves are all equal hubs."""
    edges = [(i, 0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = hits(df, iterations=2)
    got = {r.id: (r.hub, r.authority) for r in res.scores.collect()}
    assert got[0][1] == pytest.approx(1.0)
    assert got[0][0] == pytest.approx(0.0)
    for i in range(1, 6):
        assert got[i][0] == pytest.approx(0.2)
        assert got[i][1] == pytest.approx(0.0)


@pytest.mark.parametrize("n,m,tag,srcs", [(150, 300, 21, [0]),
                                          (150, 150, 22, [0, 7]),
                                          (40, 30, 23, [5])])
def test_bfs_matches_oracle(spark, n, m, tag, srcs):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = bfs_hops(df, srcs, max_hops=20)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == bfs_oracle(edges, srcs, max_hops=20)


def test_bfs_chain_exhausts(spark):
    edges = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = bfs_hops(df, [0], max_hops=10)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == {i: i for i in range(6)}
    assert res.exhausted and res.rounds == 5


def test_bfs_respects_hop_bound(spark):
    edges = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = bfs_hops(df, [0], max_hops=2)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert not res.exhausted


@pytest.mark.parametrize("n,m,tag,k", [(80, 600, 31, 8), (100, 300, 32, 4),
                                       (50, 100, 33, 30)])
def test_kcore_matches_oracle(spark, n, m, tag, k):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = k_core(df, k=k)
    assert res.converged
    got = {r.id: r.core_deg for r in res.vertices.collect()}
    assert got == kcore_oracle(edges, k)


def test_kcore_peels_tail_into_empty(spark):
    """A 5-clique with a pendant chain: 4-core = the clique alone; 5-core
    is empty (each clique vertex has degree 4)."""
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    core4 = k_core(df, k=4)
    assert {r.id: r.core_deg for r in core4.vertices.collect()} == {
        i: 4 for i in range(5)}
    core5 = k_core(df, k=5)
    assert core5.vertices.count() == 0 and core5.converged


def test_local_clustering_coefficient_exact(spark):
    """Triangle (0,1,2) with a pendant 3: lcc=1 inside the triangle except
    vertex 2, whose extra pendant edge dilutes it to 1/3."""
    from pagerank_spark.operators.triangles import local_clustering_coefficient
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.degree, r.triangles, r.lcc)
           for r in local_clustering_coefficient(df).collect()}
    assert got == {0: (2, 1, 1.0), 1: (2, 1, 1.0),
                   2: (3, 1, pytest.approx(1 / 3)), 3: (1, 0, 0.0)}


def test_degree_assortativity_matches_numpy(spark):
    from pagerank_spark.operators.graphstats import degree_assortativity
    edges = _random_edges(60, 200, 41)
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(df).collect()[0]
    out_deg: dict[int, int] = {}
    in_deg: dict[int, int] = {}
    for s, d in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
        in_deg[d] = in_deg.get(d, 0) + 1
    xs = np.array([out_deg[s] for s, _ in edges], dtype=np.float64)
    ys = np.array([in_deg[d] for _, d in edges], dtype=np.float64)
    want = np.corrcoef(xs, ys)[0, 1]
    assert row.m_edges == len(edges)
    assert row.assortativity == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("n,m,tag", [(60, 250, 51), (100, 200, 52), (40, 40, 53)])
def test_coreness_matches_peeling_oracle(spark, n, m, tag):
    from pagerank_spark.operators.coreness import coreness
    from pagerank_spark.oracle import coreness_oracle
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = coreness(df)
    assert res.converged
    got = {r.id: r.core for r in res.cores.collect()}
    assert got == coreness_oracle(edges)


def test_coreness_clique_with_tail(spark):
    """5-clique (coreness 4) + pendant chain (coreness 1)."""
    from pagerank_spark.operators.coreness import coreness
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r.id: r.core for r in coreness(df).cores.collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 5: 1, 6: 1, 7: 1}


def test_degree_quantiles_exact(spark):
    import numpy as np
    from pagerank_spark.operators.graphstats import degree_quantiles
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_quantiles(df, universe=spark.range(5)).first()
    out_degs = np.array([3, 1, 1, 0, 1])   # vertices 0..4
    in_degs = np.array([1, 1, 2, 2, 0])
    assert row.out_max == 3 and row.in_max == 2
    assert abs(row.out_p50 - np.percentile(out_degs, 50)) < 1e-9
    assert abs(row.out_p90 - np.percentile(out_degs, 90)) < 1e-9
    assert abs(row.in_p50 - np.percentile(in_degs, 50)) < 1e-9
    assert abs(row.in_p99 - np.percentile(in_degs, 99)) < 1e-9


def test_landmark_bfs_matches_per_source_bfs(spark):
    from pagerank_spark.operators.bfs import landmark_bfs
    edges = spark.createDataFrame(_random_edges(80, 200, 17),
                                  "src long, dst long")
    lms = [0, 1, 2]
    res = landmark_bfs(edges, lms, max_hops=10)
    got = {(r.lm, r.id): r.dist for r in res.distances.collect()}
    for lm in lms:
        solo = {r.id: r.dist
                for r in bfs_hops(edges, [lm], max_hops=10)
                .distances.collect()}
        mine = {i: d for (l, i), d in got.items() if l == lm}
        assert mine == solo, lm


def test_landmark_bfs_duplicate_list_input_deduped(spark):
    # round-4 advice: a Sequence with repeated landmark ids must behave
    # exactly like the DataFrame form (no duplicated (lm, id, dist) rows)
    from pagerank_spark.operators.bfs import bfs_hops, landmark_bfs
    edges = spark.createDataFrame(_random_edges(40, 100, 23),
                                  "src long, dst long")
    dup = landmark_bfs(edges, [1, 2, 1, 2, 2], max_hops=6).distances.collect()
    uniq = landmark_bfs(edges, [1, 2], max_hops=6).distances.collect()
    assert sorted((r.lm, r.id, r.dist) for r in dup) \
        == sorted((r.lm, r.id, r.dist) for r in uniq)
    bdup = bfs_hops(edges, [1, 1, 2], max_hops=6).distances.collect()
    buniq = bfs_hops(edges, [1, 2], max_hops=6).distances.collect()
    assert sorted((r.id, r.dist) for r in bdup) \
        == sorted((r.id, r.dist) for r in buniq)


def test_landmark_bfs_distance_estimate_upper_bound(spark):
    from pagerank_spark.operators.bfs import landmark_bfs
    # chain 0-1-2-3-4 (directed both ways) with landmark 2 in the middle:
    # the landmark estimate d(0,lm)+d(lm,4) equals the true distance
    e = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
    edges = spark.createDataFrame(e, "src long, dst long")
    res = landmark_bfs(edges, [2], max_hops=10)
    d = {(r.lm, r.id): r.dist for r in res.distances.collect()}
    assert d[(2, 0)] + d[(2, 4)] == 4
    assert res.exhausted


def test_distance_oracle_estimate_undirected_exact_through_landmark(spark):
    from pagerank_spark.operators.bfs import (distance_oracle_estimate,
                                              landmark_bfs)
    # symmetric chain 0-1-2-3-4, landmark 2: every (u,v) estimate is
    # d(u,2)+d(2,v), exact whenever the shortest path passes 2
    e = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
    edges = spark.createDataFrame(e, "src long, dst long")
    dist = landmark_bfs(edges, [2], max_hops=10).distances
    pairs = spark.createDataFrame([(0, 4), (1, 3), (0, 2)], "u long, v long")
    got = {(r.u, r.v): r.est
           for r in distance_oracle_estimate(dist, pairs).collect()}
    assert got == {(0, 4): 4, (1, 3): 2, (0, 2): 2}


def test_distance_oracle_estimate_directed_uses_reverse_table(spark):
    from pagerank_spark.operators.bfs import (distance_oracle_estimate,
                                              landmark_bfs)
    # directed cycle 0->1->2->3->0, landmark 0: d(2->0)=2 (via 3) and
    # d(0->1)=1, so est(2,1) = 3 — correct for the directed graph, while
    # using the forward table for both sides would (wrongly) give 1+1=2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    rev = edges.selectExpr("dst AS src", "src AS dst")
    from pyspark.sql import functions as F  # noqa: F401 (style parity)
    fwd = landmark_bfs(edges, [0], max_hops=10).distances
    bwd = landmark_bfs(rev, [0], max_hops=10).distances
    pairs = spark.createDataFrame([(2, 1)], "u long, v long")
    got = distance_oracle_estimate(fwd, pairs, to_lm=bwd).collect()
    assert {(r.u, r.v): r.est for r in got} == {(2, 1): 3}


def test_distance_oracle_estimate_upper_bound_on_random_graph(spark):
    from pagerank_spark.operators.bfs import (bfs_hops,
                                              distance_oracle_estimate,
                                              landmark_bfs)
    edges = spark.createDataFrame(_random_edges(60, 150, 29),
                                  "src long, dst long")
    sym = edges.union(edges.selectExpr("dst AS src", "src AS dst"))
    dist = landmark_bfs(sym, [0, 7, 13], max_hops=12).distances
    us = [1, 2, 3, 4, 5]
    pairs = spark.createDataFrame([(u, v) for u in us for v in (20, 21)],
                                  "u long, v long")
    est = {(r.u, r.v): r.est
           for r in distance_oracle_estimate(dist, pairs).collect()}
    # truth per source u via BFS on the same symmetrized graph
    for u in us:
        truth = {r.id: r.dist
                 for r in bfs_hops(sym, [u], max_hops=24).distances.collect()}
        for v in (20, 21):
            if (u, v) in est:
                assert est[(u, v)] >= truth[v], (u, v)


def test_distance_oracle_estimate_silent_when_no_common_landmark(spark):
    from pagerank_spark.operators.bfs import (distance_oracle_estimate,
                                              landmark_bfs)
    # two disconnected symmetric edges; landmark 0 never reaches {2,3}
    edges = spark.createDataFrame([(0, 1), (1, 0), (2, 3), (3, 2)],
                                  "src long, dst long")
    dist = landmark_bfs(edges, [0], max_hops=5).distances
    pairs = spark.createDataFrame([(0, 3), (2, 3), (0, 1)], "u long, v long")
    got = {(r.u, r.v): r.est
           for r in distance_oracle_estimate(dist, pairs).collect()}
    assert got == {(0, 1): 1}


def test_landmark_tables_match_two_separate_fixpoints(spark):
    from pagerank_spark.operators.bfs import landmark_bfs, landmark_tables
    edges = spark.createDataFrame(_random_edges(70, 180, 37),
                                  "src long, dst long")
    fwd, bwd, raw = landmark_tables(edges, [0, 3, 9], max_hops=10)
    want_f = landmark_bfs(edges, [0, 3, 9], max_hops=10).distances
    rev = edges.selectExpr("dst AS src", "src AS dst")
    want_b = landmark_bfs(rev, [0, 3, 9], max_hops=10).distances
    assert sorted((r.lm, r.id, r.dist) for r in fwd.collect()) \
        == sorted((r.lm, r.id, r.dist) for r in want_f.collect())
    assert sorted((r.lm, r.id, r.dist) for r in bwd.collect()) \
        == sorted((r.lm, r.id, r.dist) for r in want_b.collect())
    # DataFrame landmark input decodes identically
    lm_df = spark.createDataFrame([(0,), (3,), (9,)], "id long")
    fwd2, _, _ = landmark_tables(edges, lm_df, max_hops=10)
    assert sorted((r.lm, r.id, r.dist) for r in fwd2.collect()) \
        == sorted((r.lm, r.id, r.dist) for r in want_f.collect())


def test_landmark_tables_rejects_oversized_ids(spark):
    from pagerank_spark.operators.bfs import landmark_tables
    big = spark.createDataFrame([(1 << 62, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        landmark_tables(big, [1], max_hops=2)
