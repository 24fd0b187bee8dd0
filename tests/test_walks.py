"""Deterministic random walks vs a pure-Python oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pagerank_spark.operators.walks import adjacency_index, random_walks


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def walks_oracle(edges, walk_length, walks_per_vertex, seed):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    for s in adj:
        adj[s].sort()
    starts = sorted({v for e in edges for v in e})
    rows = set()
    for v0 in starts:
        for r in range(walks_per_vertex):
            cur = v0
            rows.add((v0, r, 0, v0))
            for k in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_h60(f"{v0}:{r}:{k}:{cur}:{seed}") % len(nbrs)]
                rows.add((v0, r, k, cur))
    return rows


EDGES = [(0, 1), (0, 2), (0, 2), (1, 3), (2, 0), (2, 3), (3, 4), (5, 0)]
# 4 is dangling; edge 0->2 doubled (multiplicity keeps two index slots)


def test_adjacency_index_multiset_order(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r.src, r.idx): (r.dst, r.deg)
           for r in adjacency_index(e).collect()}
    assert got[(0, 0)] == (1, 3)
    assert got[(0, 1)] == (2, 3) and got[(0, 2)] == (2, 3)
    assert got[(5, 0)] == (0, 1)


def test_walks_match_python_oracle(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = random_walks(e, walk_length=6, walks_per_vertex=3, seed=7)
    got = {(r.start_id, r.walk, r.step, r.vertex) for r in res.collect()}
    assert got == walks_oracle(EDGES, 6, 3, 7)


def test_walks_stop_at_dangling(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    res = random_walks(e, walk_length=9, walks_per_vertex=1, seed=1)
    got = sorted((r.start_id, r.step, r.vertex) for r in res.collect())
    # chain walks deterministically to the dangling tail and stops
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2),
                   (1, 0, 1), (1, 1, 2), (2, 0, 2)]


def test_walks_partitioning_invariant(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    a = {tuple(r) for r in random_walks(e, 5, 2, seed=3).collect()}
    b = {tuple(r) for r in random_walks(e.repartition(7), 5, 2, seed=3).collect()}
    assert a == b and len(a) > 20


def test_covisit_similarity_matches_recount(spark):
    from pagerank_spark.operators.walks import covisit_similarity
    from collections import Counter, defaultdict
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r.start_id, r.vertex): r.visits
           for r in covisit_similarity(e, walk_length=5, walks_per_vertex=3,
                                       seed=11, top_k=2).collect()}
    rows = walks_oracle(EDGES, 5, 3, 11)
    counts = Counter((s, v) for s, r, k, v in rows if k > 0 and v != s)
    per_start = defaultdict(list)
    for (s, v), n in counts.items():
        per_start[s].append((-n, v))
    want = {}
    for s, lst in per_start.items():
        for negn, v in sorted(lst)[:2]:
            want[(s, v)] = -negn
    assert got == want
