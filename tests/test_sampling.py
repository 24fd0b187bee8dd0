"""GraphSAGE-style neighbor sampling vs a pure-Python oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pagerank_spark.operators.sampling import sample_neighbors


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def sampling_oracle(edges, seeds, fanouts, seed):
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    frontier = set(seeds)
    rows = set()
    for hop, fanout in enumerate(fanouts):
        nxt = set()
        for v in frontier:
            ranked = sorted(adj[v],
                            key=lambda d: (_h60(f"{hop}:{v}:{d}:{seed}"), d))
            for d in ranked[:fanout]:
                rows.add((hop, v, d))
                nxt.add(d)
        if not nxt:
            break
        frontier = nxt
    return rows


EDGES = [(0, i) for i in range(1, 8)] + [(1, 8), (1, 9), (8, 0), (9, 9),
         (2, 5), (2, 6), (0, 1)]  # hub 0 (7 out-edges), duplicate collapsed


def test_sampling_matches_python_oracle(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (2,)], "id long")
    got = {(r.hop, r.src, r.dst)
           for r in sample_neighbors(e, seeds, [3, 2], seed=7).collect()}
    assert got == sampling_oracle(EDGES, [0, 2], [3, 2], 7)


def test_sampling_caps_hub_fanout(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = sample_neighbors(e, seeds, [3], seed=1).collect()
    assert len(got) == 3          # hub 0 has 7 distinct out-edges, capped to 3
    assert {r.src for r in got} == {0}


def test_sampling_partitioning_invariant(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    a = {tuple(r) for r in sample_neighbors(e, seeds, [2, 2, 2]).collect()}
    b = {tuple(r) for r in sample_neighbors(
        e.repartition(5), seeds, [2, 2, 2]).collect()}
    assert a == b and len(a) > 4


def test_sampling_salt_invariant(spark):
    """n_salts is a physical-plan knob (two-level top-k); the sampled set
    must be identical for any salt count, including the degenerate 1."""
    e = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (2,)], "id long")
    want = sampling_oracle(EDGES, [0, 2], [3, 2], 7)
    for s in (1, 4, 64):
        got = {(r.hop, r.src, r.dst)
               for r in sample_neighbors(e, seeds, [3, 2], seed=7,
                                         n_salts=s).collect()}
        assert got == want, f"n_salts={s}"


def test_sampling_empty_fanouts_returns_empty_frame(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    res = sample_neighbors(e, seeds, [])
    assert res.count() == 0
    assert res.columns == ["hop", "src", "dst"]


def test_sampling_assume_distinct_equivalent(spark):
    """assume_distinct skips the dedup shuffle; on an already-distinct edge
    table the sampled set is identical."""
    e = spark.createDataFrame(sorted(set(EDGES)), "src long, dst long")
    seeds = spark.createDataFrame([(0,), (2,)], "id long")
    a = {tuple(r) for r in sample_neighbors(e, seeds, [3, 2], seed=7).collect()}
    b = {tuple(r) for r in sample_neighbors(e, seeds, [3, 2], seed=7,
                                            assume_distinct=True).collect()}
    assert a == b and len(a) > 0
