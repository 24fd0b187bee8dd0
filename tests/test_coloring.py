from __future__ import annotations

import hashlib
from collections import defaultdict

from pagerank_spark.operators.coloring import greedy_coloring


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _h(i: int) -> int:
    return int(hashlib.md5(f"{i}:c".encode()).hexdigest()[:15], 16)


def _python_oracle(pairs):
    """Exact replay of the speculative rounds on the undirected simple
    graph: returns {id: (color, round)}."""
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    color, decided_round = {}, {}
    active = set(adj)
    r = 0
    while active:
        tent = {}
        for v in active:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            tent[v] = c
        keep = set(tent)
        for v in tent:
            for u in adj[v]:
                if u in tent and tent[u] == tent[v] \
                        and (_h(u), u) < (_h(v), v):
                    keep.discard(v)
        for v in keep:
            color[v] = tent[v]
            decided_round[v] = r
        active -= keep
        r += 1
        assert r < 100
    return {v: (color[v], decided_round[v]) for v in color}


def _collect(res):
    return {r.id: (r.color, r.round) for r in res.colors.collect()}


def test_coloring_matches_python_oracle_random_graph(spark):
    pairs = [((7 * i) % 23, (11 * i + 3) % 23) for i in range(60)]
    res = greedy_coloring(_edges_df(spark, pairs))
    assert res.converged
    assert _collect(res) == _python_oracle(pairs)


def test_coloring_is_proper_and_greedy_bounded(spark):
    pairs = [((5 * i) % 17, (3 * i + 1) % 17) for i in range(40)]
    res = greedy_coloring(_edges_df(spark, pairs))
    got = {r.id: r.color for r in res.colors.collect()}
    adj = defaultdict(set)
    deg = defaultdict(int)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    for v in adj:
        deg[v] = len(adj[v])
        for u in adj[v]:
            assert got[u] != got[v]
        # greedy mex bound: a vertex never needs more than its degree
        assert got[v] <= deg[v]
    assert res.n_colors == len(set(got.values()))


def test_coloring_clique_uses_exactly_k_colors(spark):
    k = 5
    pairs = [(a, b) for a in range(k) for b in range(k) if a < b]
    res = greedy_coloring(_edges_df(spark, pairs))
    got = {r.id: r.color for r in res.colors.collect()}
    assert sorted(got.values()) == list(range(k))


def test_coloring_universe_includes_isolated_vertices(spark):
    edges = _edges_df(spark, [(0, 1)])
    uni = spark.createDataFrame([(0,), (1,), (9,)], "id long")
    res = greedy_coloring(edges, universe=uni)
    got = _collect(res)
    assert set(got) == {0, 1, 9}
    assert got[9] == (0, 0)  # isolated: colour 0, decided round 0
    assert got[0][0] != got[1][0]


def test_coloring_partition_invariance(spark):
    pairs = [((7 * i) % 23, (11 * i + 3) % 23) for i in range(60)]
    a = _collect(greedy_coloring(_edges_df(spark, pairs)))
    b = _collect(greedy_coloring(
        _edges_df(spark, pairs).repartition(7, "dst")))
    assert a == b
