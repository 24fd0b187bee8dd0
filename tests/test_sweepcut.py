"""ACL sweep cut (operators/sweepcut.py): difference-array cut curve vs a
brute-force per-prefix Python oracle, planted-community recovery, and the
edge cases (isolated support vertices, edges leaving the support)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.ppr_push import ppr_push
from pagerank_spark.operators.sweepcut import sweep_cut


def _brute_sweep(edges, scores):
    """Per-prefix brute force: same order key, membership-counted cuts."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m2 = 2 * len(und)
    sup = sorted(((v, p) for v, p in scores.items() if p > 0),
                 key=lambda vp: (-round(vp[1] / max(deg.get(vp[0], 0), 1), 8),
                                 vp[0]))
    out, s, vol = [], set(), 0
    for k, (v, p) in enumerate(sup, start=1):
        s.add(v)
        vol += deg.get(v, 0)
        cut = sum(1 for a, b in und if (a in s) != (b in s))
        den = min(vol, m2 - vol)
        phi = 0.0 if den <= 0 else round(cut / den, 6)
        out.append((k, v, round(p, 8), deg.get(v, 0), vol, cut, phi))
    return out


def _collect(df):
    return [(r.k, r.id, r.p, r.d, r.volume, r.cut, r.conductance)
            for r in df.collect()]


def test_sweep_hand_fixture(spark):
    # path 0-1-2-3 with scores decaying from 0; prefix {0,1} is the
    # 1-cut split: phi = 1/min(3, 6-3) = 1/3
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)],
        "src long, dst long"))
    sc = spark.createDataFrame(
        [(0, 0.5), (1, 0.3), (2, 0.15), (3, 0.05)], "id long, p double")
    got = _collect(sweep_cut(g, sc))
    assert got == _brute_sweep(
        [(0, 1), (1, 2), (2, 3)],
        {0: 0.5, 1: 0.3, 2: 0.15, 3: 0.05})
    # sweep order is p/d: 0 (0.5/1), 1 (0.3/2), 2 (0.075), 3 (0.05)
    assert [r[1] for r in got] == [0, 1, 2, 3]
    assert [(r[4], r[5]) for r in got] == [(1, 1), (3, 1), (5, 1), (6, 0)]
    assert got[1][6] == pytest.approx(1 / 3, abs=1e-6)
    g.unpersist()


def test_sweep_matches_brute_force_with_push_scores(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(24), rng.randrange(24)) for _ in range(70)})
    g = build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long"))
    res = ppr_push(g, seed=edges[0][0], alpha=0.5, eps=1e-5, max_rounds=60)
    assert res.converged
    scores = {r.id: r.p for r in res.scores.collect()}
    got = _collect(sweep_cut(g, res.scores))
    want = _brute_sweep(edges, scores)
    assert [r[:2] + r[3:] for r in got] == [r[:2] + r[3:] for r in want]
    assert all(abs(a[2] - b[2]) < 1e-8 for a, b in zip(got, want))
    g.unpersist()


def test_sweep_recovers_planted_community(spark):
    # two 5-cliques joined by ONE bridge edge; push from inside clique A
    # must bottom out at the clique boundary (cut=1)
    a, b = range(0, 5), range(5, 10)
    edges = ([(i, j) for i in a for j in a if i != j]
             + [(i, j) for i in b for j in b if i != j]
             + [(0, 5), (5, 0)])
    g = build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long"))
    res = ppr_push(g, seed=1, alpha=0.6, eps=1e-6, max_rounds=80)
    sw = _collect(sweep_cut(g, res.scores))
    # argmin over NON-degenerate prefixes: the full-volume sweep row has
    # min(vol, 2m - vol) = 0 and phi := 0.0 by convention (same as
    # community.conductance) — it is not a candidate cut
    m2 = 2 * (2 * 10 + 1)
    best = min((r for r in sw if 0 < r[4] < m2), key=lambda r: (r[6], r[0]))
    assert best[0] == 5                       # prefix size = clique size
    prefix = {r[1] for r in sw if r[0] <= best[0]}
    assert prefix == set(a)
    assert best[5] == 1                       # the single bridge
    assert best[6] == pytest.approx(1 / 21, abs=1e-6)   # vol(A)=2*10+1
    g.unpersist()


def test_sweep_isolated_support_and_outside_edges(spark):
    # vertex 9 has p > 0 but NO undirected edges (self-loop only): it
    # ranks by p/1, adds zero volume, changes no cut; edge (2,3) leaves
    # the support entirely (3 has p=0) and stays cut once 2 joins
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (9, 9)], "src long, dst long"))
    sc = spark.createDataFrame(
        [(0, 0.6), (1, 0.2), (2, 0.1), (9, 0.05)], "id long, p double")
    got = _collect(sweep_cut(g, sc))
    assert got == _brute_sweep([(0, 1), (1, 2), (2, 3), (9, 9)],
                               {0: 0.6, 1: 0.2, 2: 0.1, 9: 0.05})
    by_id = {r[1]: r for r in got}
    assert by_id[9][3] == 0                   # isolated: d = 0
    last = max(got, key=lambda r: r[0])
    assert last[5] == 1                       # (2,3) still cut at full sweep
    g.unpersist()


def test_sweep_partition_invariance(spark):
    rng = random.Random(5)
    edges = list({(rng.randrange(16), rng.randrange(16)) for _ in range(40)})
    g = build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long").repartition(7))
    sc = spark.createDataFrame(
        [(i, 1.0 / (i + 1)) for i in range(16)], "id long, p double")
    a = _collect(sweep_cut(g, sc))
    b = _collect(sweep_cut(g, sc.repartition(5)))
    assert a == b
    g.unpersist()
