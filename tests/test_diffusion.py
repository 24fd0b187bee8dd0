"""Heat-kernel diffusion (operators/diffusion.py): NumPy series replay,
Poisson-mass conservation, seed locality, and parameter validation."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from pagerank_spark.operators.diffusion import (heat_coefficients,
                                                heat_kernel_pagerank)
from pagerank_spark.operators.graph import build_graph


def _np_hk(edges, n, t, terms, seed=None):
    """Dense replay: x_{j+1} = P^T x_j + dang_j * s, hk = sum c_j x_j."""
    P = np.zeros((n, n))
    out = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    for a, nbs in out.items():
        for b in nbs:
            P[a, b] += 1.0 / len(nbs)
    s = (np.full(n, 1.0 / n) if seed is None
         else np.eye(n)[seed])
    cs = heat_coefficients(t, terms)
    x, hk = s.copy(), cs[0] * s.copy()
    dangling = np.array([i not in out for i in range(n)], dtype=float)
    for j in range(1, terms + 1):
        d = float(x @ dangling)
        x = P.T @ x + d * s
        hk = hk + cs[j] * x
    return hk


def test_hk_matches_numpy_series(spark):
    rng = random.Random(5)
    n = 18
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(50)
                  if True})
    edges = [(a, b) for a, b in edges if a != b][:40]
    g = build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long"))
    nv = g.n_vertices
    ids = sorted(r.id for r in g.vertices.select("id").collect())
    remap = {v: i for i, v in enumerate(ids)}
    want = _np_hk([(remap[a], remap[b]) for a, b in edges], nv,
                  t=2.0, terms=8, seed=None)
    got = {r.id: r.hk for r in heat_kernel_pagerank(
        g, t=2.0, terms=8).collect()}
    for v, i in remap.items():
        assert abs(got[v] - want[i]) < 1e-7, v
    g.unpersist()


def test_hk_mass_is_truncated_poisson(spark):
    # with dangling reinjection every term is a distribution, so
    # sum(hk) == sum_{j<=K} c_j exactly (modulo rounding)
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"))  # 3 is dangling
    t, K = 1.5, 6
    rows = heat_kernel_pagerank(g, t=t, terms=K).collect()
    assert abs(sum(r.hk for r in rows) - sum(heat_coefficients(t, K))) < 1e-6
    g.unpersist()


def test_hk_seeded_is_local_and_poisson_peaked(spark):
    # directed path 0->1->...->5, seed 0: hk(v) = sum of c_j for walks of
    # length j reaching v — i.e. exactly c_v + (reinjected dangling tail)
    edges = [(i, i + 1) for i in range(5)]
    g = build_graph(spark, spark.createDataFrame(
        edges, "src long, dst long"))
    t, K = 2.0, 5
    got = {r.id: r.hk for r in heat_kernel_pagerank(
        g, t=t, terms=K, seed=0).collect()}
    cs = heat_coefficients(t, K)
    # before any mass falls off the end (j < 5 reaches vertex j exactly)
    for v in range(5):
        assert got[v] >= cs[v] - 1e-7   # 8-dp output rounding
    # Poisson peak at walk length ~t=2 shows up at vertex 2
    assert got[2] == max(got[v] for v in range(1, 5))
    g.unpersist()


def test_hk_validation(spark):
    g = build_graph(spark, spark.createDataFrame(
        [(0, 1)], "src long, dst long"))
    with pytest.raises(ValueError):
        heat_kernel_pagerank(g, t=0.0)
    with pytest.raises(ValueError):
        heat_kernel_pagerank(g, terms=-1)
    with pytest.raises(ValueError):
        heat_kernel_pagerank(g, seed=99)
    g.unpersist()


def test_hk_coefficients_sum_below_one():
    cs = heat_coefficients(3.0, 15)
    assert 0.999 < sum(cs) < 1.0
    assert cs[3] == max(cs)   # Poisson mode at j = t
