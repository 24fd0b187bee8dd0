"""SALSA and link-prediction scores vs pure-Python oracles."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from pagerank_spark.operators.hits import salsa
from pagerank_spark.operators.linkpred import link_prediction_scores


EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2), (4, 3), (0, 2)]
# duplicate 0->2 (multiplicity adds weight, like hits())


def salsa_oracle(edges, n, iterations):
    oc = defaultdict(int)
    ic = defaultdict(int)
    for s, d in edges:
        oc[s] += 1
        ic[d] += 1
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iterations):
        auth = np.zeros(n)
        for s, d in edges:
            auth[d] += hub[s] / oc[s]
        auth /= np.abs(auth).sum()
        hub = np.zeros(n)
        for s, d in edges:
            hub[s] += auth[d] / ic[d]
        hub /= np.abs(hub).sum()
    return hub, auth


def test_salsa_matches_numpy(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = salsa(e, iterations=3)
    got = {r.id: (r.hub, r.authority) for r in res.scores.collect()}
    hub, auth = salsa_oracle(EDGES, 5, 3)
    for v in range(5):
        assert abs(got[v][0] - hub[v]) < 1e-12, (v, got[v][0], hub[v])
        assert abs(got[v][1] - auth[v]) < 1e-12


def test_salsa_differs_from_raw_indegree(spark):
    # star: many weak endorsers vs one dense clique — salsa is normalized,
    # so a vertex endorsed by single-purpose hubs scores the same authority
    # per hub mass, unlike HITS where raw fan-in dominates
    e = spark.createDataFrame(EDGES, "src long, dst long")
    res = salsa(e, iterations=8)
    a = {r.id: r.authority for r in res.scores.collect()}
    assert abs(sum(a.values()) - 1.0) < 1e-12   # L1-normalized


def test_salsa_universe_zeros(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    res = salsa(e, universe=spark.range(4).select("id"), iterations=2)
    got = {r.id: (r.hub, r.authority) for r in res.scores.collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[2] == (0.0, 0.0) and got[3] == (0.0, 0.0)


def linkpred_oracle(edges, top_k):
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    existing = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    pair = {}
    verts = sorted(nbrs)
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if (a, b) in existing:
                continue
            common = nbrs[a] & nbrs[b]
            if not common:
                continue
            aa = sum(1.0 / math.log(len(nbrs[w])) for w in common)
            jac = len(common) / (len(nbrs[a]) + len(nbrs[b]) - len(common))
            pair[(a, b)] = (len(common), jac, aa)
    out = set()
    for u in verts:
        cand = [(v, sc) for (a, b), sc in pair.items()
                for v in [b if a == u else a if b == u else None] if v is not None]
        cand.sort(key=lambda kv: (-kv[1][0], kv[0]))
        for v, (c, j, s) in cand[:top_k]:
            out.add((u, v, c, round(j, 9), round(s, 9)))
    return out


def test_linkpred_matches_python_oracle(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r.u, r.v, r.common, round(r.jaccard, 9), round(r.adamic_adar, 9))
           for r in link_prediction_scores(e, top_k=5).collect()}
    assert got == linkpred_oracle(EDGES, 5)


def test_linkpred_every_vertex_gets_own_ranking(spark):
    # the LARGEST vertex id must still appear as u: it is never a pair's
    # smaller endpoint, so the old per-`a` ranking could never rank it
    e = spark.createDataFrame(EDGES, "src long, dst long")
    us = {r.u for r in link_prediction_scores(e, top_k=5).collect()}
    assert max(us) == 4   # vertex 4 (the max id) has candidates 0 and 1


def test_linkpred_excludes_existing_edges(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(min(r.u, r.v), max(r.u, r.v))
           for r in link_prediction_scores(e, top_k=10).collect()}
    assert not got & {(0, 1), (0, 2), (1, 2), (2, 3), (0, 3), (2, 4), (3, 4)}


def test_linkpred_max_degree_cap_drops_hub_wedges(spark):
    # star through hub 0 (degree 5) plus a side wedge 1-6-2
    star = [(0, i) for i in range(1, 6)] + [(6, 1), (6, 2)]
    e = spark.createDataFrame(star, "src long, dst long")
    capped = {(r.u, r.v): r.common
              for r in link_prediction_scores(e, top_k=10, max_degree=3).collect()}
    # pairs only connected through the hub are gone; the 1-2 wedge via 6 stays
    assert (3, 4) not in capped and (4, 5) not in capped
    assert capped[(1, 2)] == 1 and capped[(2, 1)] == 1


def test_linkpred_capped_plan_equals_exact_when_cap_not_binding(spark):
    # the two physical plans (bounded-array enumeration vs wedge self-join)
    # must agree exactly whenever the cap exceeds every degree
    e = spark.createDataFrame(EDGES, "src long, dst long")
    exact = {(r.u, r.v, r.common, round(r.jaccard, 9), round(r.adamic_adar, 9))
             for r in link_prediction_scores(e, top_k=5).collect()}
    capped = {(r.u, r.v, r.common, round(r.jaccard, 9), round(r.adamic_adar, 9))
              for r in link_prediction_scores(e, top_k=5, max_degree=1000).collect()}
    assert exact == capped


def test_salsa_zero_iterations_raises(spark):
    import pytest
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        salsa(e, iterations=0)
