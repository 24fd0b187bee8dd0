"""Strongly connected components vs an exact Tarjan oracle."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.functions.hashing import mix2
from pagerank_spark.operators.scc import strongly_connected_components
from pagerank_spark.oracle import scc_oracle


def _random_edges(n: int, m: int, seed_tag: int) -> list[tuple[int, int]]:
    ids = np.arange(m, dtype=np.uint64)
    src = mix2(ids, seed_tag) % np.uint64(n)
    dst = mix2(ids, seed_tag ^ 0xBEEF) % np.uint64(n)
    return [(int(s), int(d)) for s, d in zip(src, dst)]


def _run(spark, edges, n):
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(df, universe=spark.range(n))
    assert res.converged
    return {r.id: r.scc for r in res.labels.collect()}


def test_scc_bowtie(spark):
    """Broder bowtie in miniature: IN -> giant SCC -> OUT, plus a tendril
    and an isolated vertex."""
    edges = [
        (7, 0),                           # IN tendril
        (0, 1), (1, 2), (2, 0),           # giant SCC {0,1,2}
        (2, 3), (3, 4),                   # OUT path
        (4, 5), (5, 4),                   # OUT-side 2-cycle {4,5}
    ]
    got = _run(spark, edges, 9)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 7, 8: 8}


def test_scc_directed_cycle_and_chain(spark):
    edges = [(i, (i + 1) % 40) for i in range(40)] + [(40, 41), (41, 42)]
    got = _run(spark, edges, 43)
    want = {i: 0 for i in range(40)} | {40: 40, 41: 41, 42: 42}
    assert got == want


@pytest.mark.parametrize("n,m,tag", [(60, 200, 61), (80, 120, 62), (50, 400, 63)])
def test_scc_matches_tarjan(spark, n, m, tag):
    edges = _random_edges(n, m, tag)
    got = _run(spark, edges, n)
    assert got == scc_oracle(edges, n)


def test_scc_self_loops_and_duplicates(spark):
    edges = [(0, 0), (0, 1), (0, 1), (1, 0), (2, 2)]
    got = _run(spark, edges, 3)
    assert got == {0: 0, 1: 0, 2: 2}


def test_scc_inner_budget_exhaustion_is_not_silent(spark):
    """A cycle longer than max_inner_rounds: the hash-min fixpoint is
    truncated, so NO labels may be settled from it (settling would peel
    the min-id vertex as a singleton and break the cycle). The result
    must surface converged=False instead of wrong labels."""
    cyc = 30
    edges = [(i, (i + 1) % cyc) for i in range(cyc)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(df, max_inner_rounds=5)
    assert not res.converged
    # with enough inner budget the same graph converges to one SCC
    ok = strongly_connected_components(df, max_inner_rounds=cyc + 1)
    assert ok.converged
    assert {r.scc for r in ok.labels.collect()} == {0}
