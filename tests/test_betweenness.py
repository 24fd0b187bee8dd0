"""Truncated sampled Brandes betweenness vs a pure-Python oracle."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest

from pagerank_spark.operators.betweenness import betweenness


def brandes_oracle(edges, sources, max_depth=10**9):
    """Directed Brandes from the given sources, BFS truncated at max_depth."""
    adj = defaultdict(set)
    verts = set()
    for s, d in edges:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
    bc = {v: 0.0 for v in verts}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if dist[v] >= max_depth:
                continue
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


EDGES = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4), (4, 0), (1, 4), (5, 1),
         (2, 5), (0, 1)]  # duplicate edge collapsed


def test_betweenness_all_sources_exact(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = betweenness(e, k_sources=6, max_depth=10)
    got = {r.id: r.bc for r in res.scores.collect()}
    want = brandes_oracle(EDGES, sources=range(6))
    assert res.n_sources == 6
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-12), (v, got[v], b)


def test_betweenness_truncated_matches_truncated_oracle(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = betweenness(e, k_sources=6, max_depth=2)
    got = {r.id: r.bc for r in res.scores.collect()}
    want = brandes_oracle(EDGES, sources=range(6), max_depth=2)
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-12), (v, got[v], b)
    assert res.depth == 2


def test_betweenness_sampled_sources(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    srcs = spark.createDataFrame([(2,), (4,)], "id long")
    res = betweenness(e, sources=srcs)
    got = {r.id: r.bc for r in res.scores.collect()}
    want = brandes_oracle(EDGES, sources=[2, 4])
    for v, b in want.items():
        assert got[v] == pytest.approx(b, abs=1e-12)


def test_betweenness_path_graph(spark):
    # 0->1->2->3: bc(1)=2 (pairs 0-2,0-3), bc(2)=2 (0-3,1-3) from all sources
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {r.id: r.bc for r in betweenness(e, k_sources=4).scores.collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}
