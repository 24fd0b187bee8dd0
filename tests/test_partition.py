"""Balanced partitioning (operators/partition.py): exact Python replay of
the penalized-LPA dynamics, planted-cluster recovery, balance, and the
quality summary."""

from __future__ import annotations

import math
import random

import pytest

from pagerank_spark.operators.partition import (balanced_partition,
                                                partition_quality)


def _replay(edges, k, rounds, slack=1.05):
    """Pure-Python replay: same init, scores, parity gate, tie-breaks,
    and per-target capacity admission."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = {v for e in edges for v in e}
    n = len(verts)
    cap = float(math.ceil(n * slack / k))
    assign = {v: v % k for v in verts}
    for r in range(rounds):
        load = {}
        for v, p in assign.items():
            load[p] = load.get(p, 0) + 1
        movers = []   # (target, gain, id)
        for v in verts:
            cnt = {}
            for nb in adj.get(v, ()):
                cnt[assign[nb]] = cnt.get(assign[nb], 0) + 1
            if not cnt:
                continue
            scores = {p: c * (1.0 - load.get(p, 0) / cap)
                      for p, c in cnt.items()}
            best = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))
            cur = scores.get(assign[v], 0.0)
            if ((v + r) % 2 == 0 and best[1] > cur
                    and best[0] != assign[v]):
                movers.append((best[0], best[1] - cur, v))
        by_target = {}
        for p, gain, v in movers:
            by_target.setdefault(p, []).append((gain, v))
        for p, lst in by_target.items():
            lst.sort(key=lambda gv: (-gv[0], gv[1]))
            room = int(cap - load.get(p, 0))
            for gain, v in lst[:max(room, 0)]:
                assign[v] = p
    return assign


def test_partition_matches_python_replay(spark):
    rng = random.Random(23)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    got = {r.id: r.partition for r in balanced_partition(
        spark.createDataFrame(edges, "src long, dst long"),
        k=4, rounds=4).collect()}
    assert got == _replay(edges, k=4, rounds=4)


def test_partition_recovers_planted_clusters_and_cuts_improve(spark):
    # two 8-cliques + one bridge; k=2. The id % 2 seed scatters each
    # clique across both partitions; LPA must pull each clique together.
    a, b = range(0, 8), range(8, 16)
    edges = ([(i, j) for i in a for j in a if i < j]
             + [(i, j) for i in b for j in b if i < j]
             + [(0, 8)])
    df = spark.createDataFrame(edges, "src long, dst long")
    before = partition_quality(df, balanced_partition(
        df, k=2, rounds=0)).first()
    after_assign = balanced_partition(df, k=2, rounds=8)
    after = partition_quality(df, after_assign).first()
    assert after.cut_edges < before.cut_edges
    # each clique ends monochromatic
    parts = {r.id: r.partition for r in after_assign.collect()}
    assert len({parts[i] for i in a}) == 1
    assert len({parts[i] for i in b}) == 1
    assert after.cut_edges == 1 and after.imbalance == 1.0


def test_partition_balance_held_by_penalty(spark):
    # a star would collapse into the hub's partition without the load
    # penalty; with it, leaves spread and max_load stays near n/k
    edges = [(0, i) for i in range(1, 41)]
    df = spark.createDataFrame(edges, "src long, dst long")
    q = partition_quality(df, balanced_partition(df, k=4, rounds=6)).first()
    assert q.n_vertices == 41 and q.k_used == 4
    assert q.max_load <= math.ceil(41 * 1.05 / 4) + 1


def test_partition_validation_and_empty(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    for bad in (dict(k=1), dict(k=2, rounds=-1), dict(k=2, slack=0.9)):
        with pytest.raises(ValueError):
            balanced_partition(df, **bad)
    empty = spark.createDataFrame([], "src long, dst long")
    assert balanced_partition(empty, k=2).count() == 0


def test_partition_invariance(spark):
    rng = random.Random(3)
    edges = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, balanced_partition(df, k=3, rounds=3).collect()))
    b = sorted(map(tuple, balanced_partition(
        df.repartition(7), k=3, rounds=3).collect()))
    assert a == b
