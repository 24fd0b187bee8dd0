from __future__ import annotations

from pagerank_spark.operators.labelprop import seeded_label_propagation


def _lp(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "id long, label long")
    return seeded_label_propagation(e, s, **kw)


def test_two_cliques_take_their_seed(spark):
    # cliques {0..3} and {10..13}, one bridge 3-10; one seed per clique
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    res = _lp(spark, c1 + c2 + [(3, 10)], [(0, 7), (11, 9)])
    assert res.converged
    got = {r.id: r.label for r in res.labels.collect()}
    assert all(got[i] == 7 for i in range(4))
    assert all(got[i] == 9 for i in range(10, 14))


def test_seeds_are_pinned_even_when_outnumbered(spark):
    # seed 0 labelled 5; its three neighbors all seeded 6 — 0 keeps 5
    edges = [(0, 1), (0, 2), (0, 3)]
    res = _lp(spark, edges, [(0, 5), (1, 6), (2, 6), (3, 6)])
    got = {r.id: r.label for r in res.labels.collect()}
    assert got == {0: 5, 1: 6, 2: 6, 3: 6}


def test_unreached_vertices_stay_null(spark):
    res = _lp(spark, [(0, 1), (2, 3)], [(0, 1)],
              universe=None, max_rounds=10)
    got = {r.id: r.label for r in res.labels.collect()}
    assert got[0] == 1 and got[1] == 1
    assert got[2] is None and got[3] is None


def test_tie_breaks_to_smallest_label_and_deterministic(spark):
    # vertex 2 sees labels {1 (from 0), 3 (from 1)} once each -> min = 1
    edges = [(0, 2), (1, 2)]
    res = _lp(spark, edges, [(0, 1), (1, 3)], max_rounds=3)
    got = {r.id: r.label for r in res.labels.collect()}
    assert got[2] == 1
    again = {r.id: r.label for r in _lp(spark, edges, [(0, 1), (1, 3)],
                                        max_rounds=3).labels.collect()}
    assert got == again
