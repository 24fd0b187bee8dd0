"""MC SimRank (coupled reverse walks) vs a pure-Python oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from pagerank_spark.operators.simrank import simrank_mc


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _coupled_ref(edges, pairs, c, walk_length, walks, seed):
    """Reference: reversed adjacency, coupled picks H(r:k:cur:seed),
    s(u,v) = (1/R) sum over serials of c^tau at first meeting."""
    adj = defaultdict(list)
    for s, d in edges:
        adj[d].append(s)          # reversed
    for s in adj:
        adj[s].sort()

    def walk(v0, r):
        path = [v0]
        cur = v0
        for k in range(1, walk_length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = nbrs[_h60(f"{r}:{k}:{cur}:{seed}") % len(nbrs)]
            path.append(cur)
        return path

    out = {}
    for u, v in pairs:
        if u == v:
            out[(u, v)] = (walks, 1.0)
            continue
        meets, mass = 0, 0.0
        for r in range(walks):
            pu, pv = walk(u, r), walk(v, r)
            tau = None
            for k in range(1, min(len(pu), len(pv))):
                if pu[k] == pv[k]:
                    tau = k
                    break
            if tau is not None:
                meets += 1
                mass += c ** tau
        out[(u, v)] = (meets, round(mass / walks, 6))
    return out


EDGES = [(0, 2), (1, 2), (0, 3), (1, 3), (4, 5), (2, 4), (3, 4),
         (5, 1), (5, 0), (3, 0)]
PAIRS = [(2, 3), (3, 2), (0, 1), (4, 5), (2, 2), (0, 5)]


def test_simrank_matches_python_reference(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    p = spark.createDataFrame(PAIRS, "u long, v long")
    got = {(r.u, r.v): (r.n_meets, r.simrank)
           for r in simrank_mc(e, p, c=0.8, walk_length=5, walks=8,
                               seed=11).collect()}
    want = _coupled_ref(EDGES, PAIRS, 0.8, 5, 8, 11)
    assert got == want
    assert got[(2, 2)] == (8, 1.0)


def test_simrank_symmetric_and_shared_parent_is_c(spark):
    # u and v each have exactly ONE in-neighbor, the same vertex p:
    # both reverse walks move to p deterministically at step 1 -> tau = 1
    # for every serial, so s(u, v) = c exactly
    e = spark.createDataFrame([(9, 1), (9, 2), (0, 9)], "src long, dst long")
    p = spark.createDataFrame([(1, 2), (2, 1)], "u long, v long")
    got = {(r.u, r.v): r.simrank
           for r in simrank_mc(e, p, c=0.7, walk_length=4,
                               walks=6).collect()}
    assert got[(1, 2)] == pytest.approx(0.7)
    assert got[(1, 2)] == got[(2, 1)]


def test_simrank_no_meeting_scores_zero(spark):
    # two disconnected 2-cycles: reverse walks can never meet
    e = spark.createDataFrame([(0, 1), (1, 0), (2, 3), (3, 2)],
                              "src long, dst long")
    p = spark.createDataFrame([(0, 2)], "u long, v long")
    row = simrank_mc(e, p, walk_length=6, walks=4).collect()[0]
    assert (row.n_meets, row.simrank) == (0, 0.0)


def test_simrank_validates_c(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    p = spark.createDataFrame([(0, 1)], "u long, v long")
    with pytest.raises(ValueError):
        simrank_mc(e, p, c=1.0)
