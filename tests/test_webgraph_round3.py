"""Round-3 operators — closeness, modularity, truss, co-citation,
neighbor-degree stats, streaming edge ingest — vs pure-Python oracles."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from pagerank_spark.functions.hashing import mix2
from pagerank_spark.operators.cocitation import cocitation_topk, coupling_topk
from pagerank_spark.operators.community import modularity
from pagerank_spark.operators.graphstats import (avg_neighbor_degree,
                                                 degree_distribution)
from pagerank_spark.operators.neighborhood import closeness_centrality_exact
from pagerank_spark.operators.truss import edge_support, k_truss


def _random_edges(n: int, m: int, seed_tag: int) -> list[tuple[int, int]]:
    ids = np.arange(m, dtype=np.uint64)
    src = mix2(ids, seed_tag) % np.uint64(n)
    dst = mix2(ids, seed_tag ^ 0xBEEF) % np.uint64(n)
    return [(int(s), int(d)) for s, d in zip(src, dst)]


def _simple_pairs(edges):
    return {(min(s, d), max(s, d)) for s, d in edges if s != d}


# ---------------------------------------------------------------- closeness

def _closeness_oracle(edges, n, max_t, direction="in"):
    """BFS per target over reversed ('in') or forward edges, truncated."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            if direction == "in":
                adj[d].add(s)
            else:
                adj[s].add(d)
    out = {}
    for v in range(n):
        dist = {v: 0}
        frontier = {v}
        for t in range(1, max_t + 1):
            frontier = {w for u in frontier for w in adj[u] if w not in dist}
            for w in frontier:
                dist[w] = t
        nr = len(dist) - 1
        ds = sum(dist.values())
        c = (nr / (n - 1)) * (nr / ds) if ds > 0 else 0.0
        out[v] = (nr, ds, c)
    return out


@pytest.mark.parametrize("n,m,tag,t", [(60, 180, 301, 4), (40, 40, 302, 8)])
def test_closeness_matches_bfs_oracle(spark, n, m, tag, t):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = closeness_centrality_exact(df, max_t=t, universe=spark.range(n))
    got = {r.id: (r.n_reached, r.dist_sum, r.closeness)
           for r in res.scores.collect()}
    want = _closeness_oracle(edges, n, t)
    assert set(got) == set(want)
    for v in range(n):
        assert got[v][:2] == want[v][:2], v
        assert got[v][2] == pytest.approx(want[v][2], abs=1e-12)


def test_closeness_path_graph(spark):
    # 0 -> 1 -> 2 -> 3: 'in' balls grow over reversed edges
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    res = closeness_centrality_exact(df, max_t=8)
    got = {r.id: (r.n_reached, r.dist_sum) for r in res.scores.collect()}
    assert got == {0: (0, 0), 1: (1, 1), 2: (2, 3), 3: (3, 6)}
    assert res.converged


# --------------------------------------------------------------- modularity

def _modularity_oracle(edges, labels):
    s = _simple_pairs(edges)
    m = len(s)
    deg = defaultdict(int)
    for a, b in s:
        deg[a] += 1
        deg[b] += 1
    lab = lambda v: labels.get(v, v)  # noqa: E731
    intra = sum(1 for a, b in s if lab(a) == lab(b))
    dc = defaultdict(int)
    for v, d in deg.items():
        dc[lab(v)] += d
    q = intra / m - sum(x * x for x in dc.values()) / ((4.0 * m) * m)
    return m, intra, q


def test_modularity_two_cliques(spark):
    # two triangles bridged by one edge; the natural partition
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "id long, label long")
    row = modularity(e, lab).collect()[0]
    m, intra, q = _modularity_oracle(edges, labels)
    assert (row.m_edges, row.intra_edges) == (m, intra)
    assert row.modularity == pytest.approx(q, abs=1e-12)
    # the all-singletons partition scores lower
    single = spark.createDataFrame([(i, i) for i in range(6)],
                                   "id long, label long")
    assert modularity(e, single).collect()[0].modularity < row.modularity


@pytest.mark.parametrize("n,m,tag", [(50, 200, 311)])
def test_modularity_random_partition_matches_oracle(spark, n, m, tag):
    edges = _random_edges(n, m, tag)
    labels = {v: v % 7 for v in range(n)}
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "id long, label long")
    row = modularity(e, lab).collect()[0]
    em, intra, q = _modularity_oracle(edges, labels)
    assert (row.m_edges, row.intra_edges) == (em, intra)
    assert row.modularity == pytest.approx(q, abs=1e-12)


def test_modularity_missing_labels_default_to_singletons(spark):
    edges = [(0, 1), (1, 2), (0, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame([(0, 9), (1, 9)], "id long, label long")
    row = modularity(e, lab).collect()[0]
    m, intra, q = _modularity_oracle(edges, {0: 9, 1: 9})
    assert (row.m_edges, row.intra_edges, row.modularity) == \
        (m, intra, pytest.approx(q, abs=1e-12))


# -------------------------------------------------------------------- truss

def _support_oracle(edges):
    s = _simple_pairs(edges)
    adj = defaultdict(set)
    for a, b in s:
        adj[a].add(b)
        adj[b].add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in s}


def _ktruss_oracle(edges, k):
    cur = _simple_pairs(edges)
    while True:
        sup = _support_oracle([(a, b) for a, b in cur])
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return cur
        cur = nxt


def test_edge_support_k4_plus_pendant(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b): r.support for r in edge_support(df).collect()}
    assert got == {(0, 1): 2, (0, 2): 2, (0, 3): 2, (1, 2): 2,
                   (1, 3): 2, (2, 3): 2, (3, 4): 0}


@pytest.mark.parametrize("n,m,tag,k", [(40, 300, 321, 4), (30, 120, 322, 3),
                                       (60, 150, 323, 5)])
def test_ktruss_matches_peel_oracle(spark, n, m, tag, k):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = k_truss(df, k)
    assert res.converged
    got = {(r.a, r.b) for r in res.edges.collect()}
    assert got == _ktruss_oracle(edges, k)


def test_ktruss_k4_survives_pendant_triangle_peeled(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 4), (3, 5), (4, 5)]   # pendant triangle on 3
    df = spark.createDataFrame(edges, "src long, dst long")
    res = k_truss(df, 4)
    got = {(r.a, r.b) for r in res.edges.collect()}
    assert got == set(_simple_pairs(k4))


# -------------------------------------------------- co-citation / coupling

def _pair_oracle(edges, middle_of, leaf_of, cap):
    d = {(s, t) for s, t in edges if s != t}
    groups = defaultdict(set)
    for e in d:
        groups[middle_of(e)].add(leaf_of(e))
    cnt = defaultdict(int)
    for leaves in groups.values():
        if cap is not None and len(leaves) > cap:
            continue
        ls = sorted(leaves)
        for i, a in enumerate(ls):
            for b in ls[i + 1:]:
                cnt[(a, b)] += 1
    return cnt


def _topk(cnt, k):
    return sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("cap", [None, 5])
def test_cocitation_matches_oracle(spark, cap):
    edges = _random_edges(30, 150, 331)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [((r.a, r.b), r.cnt)
           for r in cocitation_topk(df, top_k=10, max_degree=cap).collect()]
    want = _topk(_pair_oracle(edges, lambda e: e[0], lambda e: e[1], cap), 10)
    assert got == want


@pytest.mark.parametrize("cap", [None, 5])
def test_coupling_matches_oracle(spark, cap):
    edges = _random_edges(30, 150, 332)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [((r.a, r.b), r.cnt)
           for r in coupling_topk(df, top_k=10, max_degree=cap).collect()]
    want = _topk(_pair_oracle(edges, lambda e: e[1], lambda e: e[0], cap), 10)
    assert got == want


def test_cocitation_semantics(spark):
    # w=0 cites 1,2,3; w=9 cites 1,2 -> (1,2) co-cited twice
    edges = [(0, 1), (0, 2), (0, 3), (9, 1), (9, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [((r.a, r.b), r.cnt) for r in cocitation_topk(df, top_k=3).collect()]
    assert got == [((1, 2), 2), ((1, 3), 1), ((2, 3), 1)]
    # coupling: 0 and 9 share targets {1,2}
    got2 = [((r.a, r.b), r.cnt) for r in coupling_topk(df, top_k=2).collect()]
    assert got2 == [((0, 9), 2)]


# ------------------------------------------------------ degree-stat extras

def test_avg_neighbor_degree(spark):
    # 0->1,2 ; 1->2 ; 2->0  => out-degs: 0:2, 1:1, 2:1
    edges = [(0, 1), (0, 2), (1, 2), (2, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.nbr_cnt, r.nbr_deg_sum, r.avg_nbr_deg)
           for r in avg_neighbor_degree(df).collect()}
    assert got == {0: (2, 2, 1.0), 1: (1, 1, 1.0), 2: (1, 2, 2.0)}


def test_degree_distribution_with_universe(spark):
    edges = [(0, 1), (0, 2), (0, 3), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.deg: (r.n_vertices, r.cum_ge)
           for r in degree_distribution(df, universe=spark.range(5)).collect()}
    # out-degs: 0:3, 1:1, rest 0
    assert got == {3: (1, 1), 1: (1, 2), 0: (3, 5)}


def test_conductance_two_triangles_bridge(spark):
    from pagerank_spark.operators.community import conductance
    # triangles {0,1,2} and {3,4,5} joined by bridge 2-3
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(e, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, 100) for i in (0, 1, 2)] + [(i, 200) for i in (3, 4, 5)],
        "id long, label long")
    rows = {r.label: r for r in conductance(edges, labels).collect()}
    # each side: vol = 2+2+3 = 7, cut = 1, 2m = 14 -> min(7, 7) = 7
    for lbl in (100, 200):
        assert rows[lbl].n_vertices == 3
        assert rows[lbl].volume == 7 and rows[lbl].cut == 1
        assert rows[lbl].conductance == pytest.approx(1 / 7)


def test_conductance_whole_graph_is_zero_and_singletons(spark):
    from pagerank_spark.operators.community import conductance
    e = [(0, 1), (1, 2), (0, 2)]
    edges = spark.createDataFrame(e, "src long, dst long")
    one = spark.createDataFrame([(i, 7) for i in range(3)],
                                "id long, label long")
    rows = conductance(edges, one).collect()
    assert len(rows) == 1 and rows[0].conductance == 0.0  # spans all volume
    # missing labels -> singleton communities; each vertex: vol 2, cut 2
    some = spark.createDataFrame([(0, 7)], "id long, label long")
    got = {r.label: r for r in conductance(edges, some).collect()}
    assert got[1].n_vertices == 1 and got[1].cut == 2
    assert got[1].conductance == pytest.approx(1.0)


# ------------------------------------------------- gamma compression


def _gamma_oracle(edges):
    """Python replay: distinct sorted successor lists, gap gamma bits,
    log2-degree binning."""
    import math
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    bins = defaultdict(lambda: [0, 0, 0])
    for s, ds in adj.items():
        sd = sorted(ds)
        gaps = [sd[0] + 1] + [b - a for a, b in zip(sd, sd[1:])]
        bits = sum(2 * int(math.floor(math.log2(g))) + 1 for g in gaps)
        b = int(math.floor(math.log2(len(sd))))
        bins[b][0] += 1
        bins[b][1] += len(sd)
        bins[b][2] += bits
    return sorted((b, nl, ne, gb, round(gb / ne, 6))
                  for b, (nl, ne, gb) in bins.items())


def test_gamma_estimate_matches_python_oracle(spark):
    import random

    from pagerank_spark.operators.graphstats import \
        gamma_compression_estimate

    rng = random.Random(31)
    edges = [(rng.randrange(40), rng.randrange(900)) for _ in range(500)]
    # duplicates must collapse before encoding
    edges += edges[:60]
    got = [(r.bin, r.n_lists, r.n_edges, r.gamma_bits, r.bits_per_edge)
           for r in gamma_compression_estimate(
               spark.createDataFrame(edges, "src long, dst long")).collect()]
    assert got == _gamma_oracle(edges)


def test_gamma_estimate_hand_values(spark):
    from pagerank_spark.operators.graphstats import \
        gamma_compression_estimate

    # src 0 -> {0, 1, 9}: gaps 1,1,8 -> bits 1+1+7=9; bin=floor(log2 3)=1
    # src 1 -> {4}: gap 5 -> bits 5; bin 0
    rows = gamma_compression_estimate(spark.createDataFrame(
        [(0, 9), (0, 0), (0, 1), (1, 4)], "src long, dst long")).collect()
    got = {r.bin: (r.n_lists, r.n_edges, r.gamma_bits) for r in rows}
    assert got == {0: (1, 1, 5), 1: (1, 3, 9)}


def test_gamma_estimate_locality_compresses_better(spark):
    from pagerank_spark.operators.graphstats import \
        gamma_compression_estimate

    local = [(s, s * 10 + i) for s in range(20) for i in range(8)]
    spread = [(s, s + 997 * i) for s in range(20) for i in range(8)]
    bits = {}
    for name, ed in (("local", local), ("spread", spread)):
        r = gamma_compression_estimate(spark.createDataFrame(
            ed, "src long, dst long")).collect()
        bits[name] = sum(x.gamma_bits for x in r) / sum(x.n_edges for x in r)
    assert bits["local"] < bits["spread"]


# --------------------------------------------------- power-law fit


def test_powerlaw_fit_recovers_planted_alpha(spark):
    import math
    import random

    from pagerank_spark.operators.graphstats import powerlaw_tail_fit

    # plant in-degrees from a discrete power law via inverse transform:
    # d = floor(dmin * u^(-1/(alpha-1))) has Hill-MLE alpha ~ alpha
    rng = random.Random(7)
    alpha, dmin = 2.5, 5
    edges = []
    nxt = 0
    for v in range(400):
        d = min(int(dmin * rng.random() ** (-1.0 / (alpha - 1))), 400)
        for _ in range(d):
            edges.append((nxt, v))
            nxt += 1
    res = {r.deg_type: r for r in powerlaw_tail_fit(
        spark.createDataFrame(edges, "src long, dst long"),
        dmin=dmin).collect()}
    assert res["in"].n_tail == 400
    assert abs(res["in"].alpha - alpha) < 0.25
    # every src has out-degree 1 < dmin: empty tail -> alpha 0.0
    assert res["out"].n_tail == 0 and res["out"].alpha == 0.0

    # exact Hill replay on the same degrees
    degs = {}
    for _, v in edges:
        degs[v] = degs.get(v, 0) + 1
    tail = [d for d in degs.values() if d >= dmin]
    want = 1.0 + len(tail) / sum(math.log(d / (dmin - 0.5)) for d in tail)
    assert res["in"].alpha == pytest.approx(want, abs=2e-6)


def test_powerlaw_fit_validation_and_partition_invariance(spark):
    from pagerank_spark.operators.graphstats import powerlaw_tail_fit

    ed = spark.createDataFrame(
        [(i % 11, (i * 7) % 23) for i in range(300)], "src long, dst long")
    with pytest.raises(ValueError):
        powerlaw_tail_fit(ed, dmin=1)
    a = [tuple(r) for r in powerlaw_tail_fit(ed, dmin=3).collect()]
    b = [tuple(r) for r in powerlaw_tail_fit(
        ed.repartition(13), dmin=3).collect()]
    assert a == b
