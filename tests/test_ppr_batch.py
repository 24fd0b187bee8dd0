"""Batch personalized PageRank vs the single-run engine and NumPy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.functions.hashing import mix2
from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.pagerank import pagerank
from pagerank_spark.operators.ppr_batch import personalized_pagerank_batch


def _random_edges(n: int, m: int, seed_tag: int) -> list[tuple[int, int]]:
    ids = np.arange(m, dtype=np.uint64)
    src = mix2(ids, seed_tag) % np.uint64(n)
    dst = mix2(ids, seed_tag ^ 0xBEEF) % np.uint64(n)
    return [(int(s), int(d)) for s, d in zip(src, dst)]


def _numpy_ppr(edges, n, p, alpha, iters):
    out = [[] for _ in range(n)]
    for s, d in edges:
        out[s].append(d)
    r = np.full(n, 1.0 / n)
    p = np.asarray(p)
    for _ in range(iters):
        c = np.zeros(n)
        mass = 0.0
        for v in range(n):
            if out[v]:
                c[np.array(out[v])] += r[v] / len(out[v])
            else:
                mass += r[v]
        r = alpha * c + (alpha * mass + (1 - alpha)) * p
    return r


def test_batch_matches_single_run_per_sid(spark):
    """Each sid's vector must equal the single-run pagerank(teleport=...)
    at the same fixed iteration budget."""
    n, iters = 120, 3
    edges = _random_edges(n, 360, 401)
    g = build_graph(spark, spark.createDataFrame(edges, "src long, dst long"),
                    n_vertices=n)
    seed_rows = [(0, i, 1.0) for i in range(6)] + \
                [(1, i, 1.0) for i in range(50, 60)]
    seeds = spark.createDataFrame(seed_rows, "sid long, id long, p double")
    batch = personalized_pagerank_batch(g, seeds, alpha=0.85, iterations=iters)
    got = {(r.sid, r.id): r.rank for r in batch.collect()}
    for sid, lo, hi in ((0, 0, 6), (1, 50, 60)):
        tp = spark.createDataFrame(
            [(i, 1.0 / (hi - lo)) for i in range(lo, hi)], "id long, p double")
        single = pagerank(g, alpha=0.85, tol=None, max_iter=iters, teleport=tp)
        want = {r.id: r.rank for r in single.ranks.collect()}
        for v in range(n):
            assert got[(sid, v)] == pytest.approx(want[v], abs=1e-14), (sid, v)


def test_batch_matches_numpy(spark):
    n, iters, alpha = 80, 4, 0.85
    edges = _random_edges(n, 240, 402)
    # drop duplicate edges: build_graph weights 1/out_deg over the
    # multigraph; numpy oracle below uses the plain adjacency
    edges = sorted(set(edges))
    g = build_graph(spark, spark.createDataFrame(edges, "src long, dst long"),
                    n_vertices=n)
    seeds = spark.createDataFrame(
        [(7, i, 0.25) for i in range(4)], "sid long, id long, p double")
    got = {r.id: r.rank
           for r in personalized_pagerank_batch(
               g, seeds, alpha=alpha, iterations=iters).collect()}
    p = np.zeros(n)
    p[:4] = 0.25
    want = _numpy_ppr(edges, n, p, alpha, iters)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_batch_renormalizes_out_of_graph_seeds(spark):
    """Seeds outside the vertex universe are dropped and p renormalized —
    mass must stay 1 per sid."""
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"), n_vertices=3)
    seeds = spark.createDataFrame(
        [(0, 0, 0.5), (0, 99, 0.5)], "sid long, id long, p double")
    res = personalized_pagerank_batch(g, seeds, alpha=0.85, iterations=5)
    total = res.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-12)
    # all teleport mass concentrates on the surviving seed's vector
    got = {r.id: r.rank for r in res.collect()}
    assert got[0] > got[1] and got[0] > got[2]
