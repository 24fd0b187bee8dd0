"""Weighted shortest paths: Bellman-Ford frontier loop vs a Python oracle."""

from __future__ import annotations

import heapq
import random

import pytest

from pagerank_spark.operators.sssp import shortest_paths


def _dijkstra(edges, sources):
    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, float(w)))
    dist = {s: 0.0 for s in sources}
    heap = [(0.0, s) for s in sources]
    while heap:
        dv, v = heapq.heappop(heap)
        if dv > dist.get(v, float("inf")):
            continue
        for u, w in adj.get(v, ()):
            nd = dv + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return dist


def _collect(res):
    return {r.id: r.dist for r in res.distances.collect()}


def test_sssp_matches_dijkstra_random(spark):
    rng = random.Random(11)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    wedges = [(s, d, float(1 + (s * 7 + d * 3) % 5)) for s, d in edges
              if s != d]
    df = spark.createDataFrame(wedges, "src long, dst long, w double")
    res = shortest_paths(df, [0, 1])
    assert res.converged
    want = _dijkstra(wedges, [0, 1])
    assert _collect(res) == pytest.approx(want)


def test_sssp_unit_weights_equal_bfs(spark):
    from pagerank_spark.operators.bfs import bfs_hops
    edges = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = shortest_paths(df, [0], weight_col=None)
    hops = {r.id: float(r.dist) for r in bfs_hops(df, [0]).distances.collect()}
    assert _collect(res) == hops


def test_sssp_parallel_edges_keep_cheapest(spark):
    df = spark.createDataFrame([(0, 1, 5.0), (0, 1, 2.0), (1, 2, 1.0)],
                               "src long, dst long, w double")
    got = _collect(shortest_paths(df, [0]))
    assert got == {0: 0.0, 1: 2.0, 2: 3.0}


def test_sssp_cheap_detour_beats_direct_hop(spark):
    # direct edge 0->2 costs 10; the 3-hop detour costs 3
    df = spark.createDataFrame(
        [(0, 2, 10.0), (0, 1, 1.0), (1, 3, 1.0), (3, 2, 1.0)],
        "src long, dst long, w double")
    got = _collect(shortest_paths(df, [0]))
    assert got[2] == 3.0


def test_sssp_rejects_bad_weights(spark):
    neg = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, w double")
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(neg, [0])
    nan = spark.createDataFrame([(0, 1, float("nan"))],
                                "src long, dst long, w double")
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(nan, [0])
