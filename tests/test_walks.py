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


def test_pagerank_mc_tracks_exact(spark):
    """The MC estimate correlates strongly with the exact fixed point on a
    random graph, sums to 1, and is bit-deterministic across runs."""
    import numpy as np
    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank
    from pagerank_spark.operators.walks import pagerank_monte_carlo

    n, m = 60, 360
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, n, m), rng.integers(0, n, m))]
    df = spark.createDataFrame(edges, "src long, dst long")

    exact = pagerank(build_graph(spark, df, n_vertices=n),
                     alpha=0.85, tol=1e-5, max_iter=200)  # MC err >> 1e-5
    ex = np.zeros(n)
    for r in exact.ranks.collect():
        ex[r.id] = r.rank

    est_rows = pagerank_monte_carlo(
        df, alpha=0.85, walks_per_vertex=40, max_length=16,
        starts=spark.range(n)).collect()
    mc = np.zeros(n)
    for r in est_rows:
        mc[r.id] = r.rank_est
    assert abs(mc.sum() - 1.0) < 1e-9
    corr = np.corrcoef(ex, mc)[0, 1]
    assert corr > 0.9, corr
    # top-5 shortlist overlap (the estimator's production use)
    top_ex = set(np.argsort(-ex)[:5])
    top_mc = set(np.argsort(-mc)[:5])
    assert len(top_ex & top_mc) >= 3, (top_ex, top_mc)

    again = {(r.id, r.visits, r.rank_est) for r in pagerank_monte_carlo(
        df, alpha=0.85, walks_per_vertex=40, max_length=16,
        starts=spark.range(n)).collect()}
    assert {(r.id, r.visits, r.rank_est) for r in est_rows} == again


def _n2v_collect(spark, edges, **kw):
    from pagerank_spark.operators.walks import node2vec_walks
    df = spark.createDataFrame(edges, "src long, dst long")
    return node2vec_walks(df, **kw).collect()


def test_node2vec_walks_follow_edges_and_are_deterministic(spark):
    import numpy as np
    rng = np.random.default_rng(3)
    edges = list({(int(a), int(b)) for a, b in
                  zip(rng.integers(0, 30, 150), rng.integers(0, 30, 150))})
    eset = set(edges)
    rows = _n2v_collect(spark, edges, walk_length=5, walks_per_vertex=2,
                        p=2.0, q=0.5)
    byw = {}
    for r in rows:
        byw.setdefault((r.start_id, r.walk), {})[r.step] = r.vertex
    assert byw  # non-empty corpus
    for (s, w), path in byw.items():
        assert path[0] == s
        for k in range(1, max(path) + 1):
            assert (path[k - 1], path[k]) in eset, (s, w, k, path)
    again = {(r.start_id, r.walk, r.step, r.vertex) for r in _n2v_collect(
        spark, edges, walk_length=5, walks_per_vertex=2, p=2.0, q=0.5)}
    assert {(r.start_id, r.walk, r.step, r.vertex) for r in rows} == again


def test_node2vec_step1_matches_uniform_rule(spark):
    """Step 1 has no prev, so it must reproduce random_walks' uniform
    hash pick exactly (same hash string, same adjacency index)."""
    from pagerank_spark.operators.walks import node2vec_walks, random_walks
    edges = [(i, j) for i in range(12) for j in ((i * 3 + 1) % 12,
                                                 (i * 5 + 2) % 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {(r.start_id, r.walk, r.step, r.vertex)
         for r in node2vec_walks(df, walk_length=1, walks_per_vertex=3)
         .collect()}
    b = {(r.start_id, r.walk, r.step, r.vertex)
         for r in random_walks(df, walk_length=1, walks_per_vertex=3)
         .collect()}
    assert a == b


def test_node2vec_p_controls_returns(spark):
    """On a bidirectional cycle (return always possible), tiny p must
    produce many immediate returns and huge p almost none."""
    n = 20
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [((i + 1) % n, i) for i in range(n)]

    def returns(p):
        rows = _n2v_collect(spark, edges, walk_length=6,
                            walks_per_vertex=4, p=p, q=1.0)
        byw = {}
        for r in rows:
            byw.setdefault((r.start_id, r.walk), {})[r.step] = r.vertex
        ret = tot = 0
        for path in byw.values():
            for k in range(2, max(path) + 1):
                tot += 1
                ret += path[k] == path[k - 2]
        return ret / tot
    lo, hi = returns(100.0), returns(0.01)
    assert hi > 0.8, hi     # p=0.01: return weight 100000 vs 1000/2000
    assert lo < 0.2, lo     # p=100: return weight 10 vs 1000/2000
    assert hi > lo + 0.5


def test_node2vec_rejects_bad_params(spark):
    import pytest
    from pagerank_spark.operators.walks import node2vec_walks
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        node2vec_walks(df, p=0)
    with pytest.raises(ValueError):
        node2vec_walks(df, p=5000.0)


def test_adjacency_index_band_invariance_and_hub(spark):
    """The banded two-level prefix sum must reproduce the plain
    single-window row_number ranking for ANY n_bands (bands partition the
    dst order, so offsets compose exactly) — including a hub whose
    adjacency spans many bands and duplicate edges keeping multiplicity."""
    import random

    rng = random.Random(7)
    hub_edges = [(99, d) for d in rng.sample(range(0, 100_000), 500)]
    dup_edges = [(1, 5), (1, 5), (1, 2), (2, 7)]
    e = spark.createDataFrame(hub_edges + dup_edges, "src long, dst long")
    want = {}  # plain ranking oracle, computed in Python
    by_src = {}
    for s, d in hub_edges + dup_edges:
        by_src.setdefault(s, []).append(d)
    for s, ds in by_src.items():
        for i, d in enumerate(sorted(ds)):
            want[(s, i)] = (d, len(ds))
    # (n_bands, hot_threshold) combos covering: all-cold single window
    # (default threshold), all-hot banded (threshold 1: every src routed
    # banded), mixed (threshold 100: only the 500-degree hub is banded)
    for nb, thr in ((1, 1), (7, 100), (1024, 100), (1024, 100_000)):
        got = {(r.src, r.idx): (r.dst, r.deg)
               for r in adjacency_index(e, n_bands=nb,
                                        hot_threshold=thr).collect()}
        assert got == want, f"n_bands={nb} hot_threshold={thr}"


def weighted_walks_oracle(wedges, walk_length, walks_per_vertex, seed):
    """Uniform-walk oracle over the weight-expanded adjacency: an edge of
    weight w owns w consecutive slots of the sorted-dst index."""
    adj = defaultdict(list)
    for s, d, w in wedges:
        adj[s].append((d, w))
    slots = {}
    for s in adj:
        lst = []
        for d, w in sorted(adj[s]):
            lst.extend([d] * w)
        slots[s] = lst
    starts = sorted({v for s, d, _ in wedges for v in (s, d)})
    rows = set()
    for v0 in starts:
        for r in range(walks_per_vertex):
            cur = v0
            rows.add((v0, r, 0, v0))
            for k in range(1, walk_length + 1):
                sl = slots.get(cur)
                if not sl:
                    break
                cur = sl[_h60(f"{v0}:{r}:{k}:{cur}:{seed}") % len(sl)]
                rows.add((v0, r, k, cur))
    return rows


WEDGES = [(0, 1, 1), (0, 2, 3), (1, 3, 2), (2, 0, 1), (2, 3, 5),
          (3, 4, 1), (5, 0, 2), (0, 2, 2)]
# duplicate 0->2 rows: weights ADD (3+2=5 slots), 4 dangling


def test_weighted_walks_match_python_oracle(spark):
    e = spark.createDataFrame(WEDGES, "src long, dst long, w long")
    res = random_walks(e, walk_length=6, walks_per_vertex=3, seed=7,
                       weight_col="w")
    got = {(r.start_id, r.walk, r.step, r.vertex) for r in res.collect()}
    assert got == weighted_walks_oracle(WEDGES, 6, 3, 7)


def test_weighted_adjacency_index_slots(spark):
    e = spark.createDataFrame(WEDGES, "src long, dst long, w long")
    got = defaultdict(list)
    for r in adjacency_index(e, weight_col="w").collect():
        got[r.src].append((r.idx, r.dst, r.deg))
    # src 0: dst 1 (w=1) then dst 2 (w=3+2=5) -> deg 6
    s0 = sorted(got[0])
    assert [d for _, d, _ in s0] == [1] + [2] * 5
    assert all(deg == 6 for _, _, deg in s0)
    assert [i for i, _, _ in s0] == list(range(6))


def test_weighted_walks_reject_bad_weights(spark):
    import pytest

    bad0 = spark.createDataFrame([(0, 1, 0)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        random_walks(bad0, weight_col="w")
    huge = spark.createDataFrame([(0, 1, 1 << 40)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        random_walks(huge, weight_col="w")
