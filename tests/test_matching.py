from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.operators.matching import maximal_matching


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _check_valid_maximal(edges_df, matched):
    """A matching is valid (no shared endpoint) and maximal (every
    remaining edge touches a matched vertex)."""
    seen = set()
    for r in matched:
        assert r.a < r.b
        assert r.a not in seen and r.b not in seen
        seen.add(r.a)
        seen.add(r.b)
    for e in edges_df.collect():
        if e.src != e.dst:
            assert e.src in seen or e.dst in seen, (e, seen)


def test_matching_path_graph(spark):
    # path 1-2-3-4: any maximal matching has 1 or 2 edges; locally
    # dominant rounds must produce a valid maximal one deterministically
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    res = maximal_matching(edges)
    assert res.converged
    matched = res.edges.collect()
    _check_valid_maximal(edges, matched)
    again = maximal_matching(edges).edges.collect()
    assert sorted((r.a, r.b, r.round) for r in matched) == \
        sorted((r.a, r.b, r.round) for r in again)


def test_matching_star_takes_one_edge(spark):
    # star centered at 0: exactly one edge can match
    edges = _edges(spark, [(0, i) for i in range(1, 6)])
    res = maximal_matching(edges)
    assert res.converged
    assert res.edges.count() == 1


def test_matching_perfect_on_disjoint_edges(spark):
    edges = _edges(spark, [(1, 2), (3, 4), (5, 6)])
    res = maximal_matching(edges)
    assert res.converged and res.rounds == 1
    assert sorted((r.a, r.b) for r in res.edges.collect()) == \
        [(1, 2), (3, 4), (5, 6)]
    assert all(r.round == 0 for r in res.edges.collect())


def test_matching_ignores_self_loops_direction_multiplicity(spark):
    edges = _edges(spark, [(1, 1), (2, 1), (1, 2), (1, 2)])
    res = maximal_matching(edges)
    assert res.converged
    assert [(r.a, r.b) for r in res.edges.collect()] == [(1, 2)]


def test_matching_empty_graph(spark):
    edges = _edges(spark, [(7, 7)])  # only a self-loop
    res = maximal_matching(edges)
    assert res.converged and res.rounds == 0
    assert res.edges.count() == 0
    assert [f.name for f in res.edges.schema.fields] == ["a", "b", "round"]


def test_matching_triangle_leaves_one_vertex(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    res = maximal_matching(edges)
    assert res.converged
    matched = res.edges.collect()
    assert len(matched) == 1
    _check_valid_maximal(edges, matched)


def test_vertex_cover_covers_every_edge(spark):
    import random
    from pagerank_spark.operators.matching import vertex_cover
    rng = random.Random(41)
    raw = [(rng.randrange(30), rng.randrange(30)) for _ in range(70)]
    edges = _edges(spark, raw)
    res = vertex_cover(edges)
    assert res.converged
    cover = {r.id for r in res.vertices.collect()}
    for a, b in raw:
        if a != b:
            assert a in cover or b in cover, (a, b)


def test_vertex_cover_is_2x_matching_and_duplicate_free(spark):
    from pagerank_spark.operators.matching import (maximal_matching,
                                                   vertex_cover)
    raw = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7)]
    edges = _edges(spark, raw)
    n_matched = maximal_matching(edges).edges.count()
    got = [r.id for r in vertex_cover(edges).vertices.collect()]
    assert len(got) == len(set(got)) == 2 * n_matched


def test_vertex_cover_star_graph_at_most_double_opt(spark):
    # star: OPT = 1 (the hub); matching can take only one spoke -> |C| = 2
    from pagerank_spark.operators.matching import vertex_cover
    edges = _edges(spark, [(0, i) for i in range(1, 8)])
    cover = {r.id for r in vertex_cover(edges).vertices.collect()}
    assert len(cover) == 2 and 0 in cover
