"""Host-graph contraction, TrustRank/spam mass, reciprocity, anchor index."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.operators.anchors import anchor_pairs, anchor_text_index
from pagerank_spark.operators.contraction import (
    contract_graph,
    host_graph_from_pages,
    host_of,
)
from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.graphstats import reciprocity
from pagerank_spark.operators.pagerank import pagerank
from pagerank_spark.operators.trust import spam_mass, trust_teleport, trustrank
from pagerank_spark.oracle import pagerank_oracle
from pagerank_spark.sources import synth

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# contraction
# ---------------------------------------------------------------------------

def test_contract_graph_sums_multiplicity(spark):
    # groups: {0,1} -> g0, {2,3} -> g1; edges 0->2, 1->2, 1->3, 0->1 (intra)
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (1, 3), (0, 1)], "src long, dst long")
    mapping = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, gid long")
    got = {(r.src, r.dst): r.w for r in contract_graph(edges, mapping).collect()}
    assert got == {(0, 1): 3.0}  # three cross edges merged, intra dropped

    keep = {(r.src, r.dst): r.w
            for r in contract_graph(edges, mapping, drop_self_loops=False).collect()}
    assert keep == {(0, 1): 3.0, (0, 0): 1.0}


def test_contract_graph_carries_weights(spark):
    edges = spark.createDataFrame(
        [(0, 2, 2.5), (1, 2, 0.5)], "src long, dst long, w double")
    mapping = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "id long, gid long")
    got = {(r.src, r.dst): r.w for r in contract_graph(edges, mapping).collect()}
    assert got == {(0, 1): 3.0}


def test_host_of_expression(spark):
    df = spark.createDataFrame(
        [("https://Site3.Example/page7",),
         ("http://a.b.c:8080/x?q=1",),
         ("mailto:nobody",),       # no host part in our scheme://host shape
         ("relative/path",)], "url string")
    got = [r.h for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["site3.example", "a.b.c:8080", "", ""]


def test_host_graph_from_pages_matches_numpy(spark):
    """Host PageRank on the contracted F1 graph == NumPy on the same
    contracted edge table (weights = link multiplicities)."""
    pages = synth.synth_pages(spark, n_pages=300, n_sites=7)
    g = host_graph_from_pages(spark, pages)
    # host universe: the 7 site hosts (every synth url has a host)
    assert g.n_vertices == 7
    hosts = {r.url: r.id for r in g.url_dict.collect()}
    assert sorted(hosts) == sorted({f"site{k}.example" for k in range(7)})

    # independent truth: urls -> host ids in python, contract, run numpy PR
    w = np.zeros((7, 7))
    for i in range(300):
        hs = hosts[f"site{i % 7}.example"]
        for u in synth.outlinks_of(i, 7):
            j = int(u.split("page")[1])
            hd = hosts[f"site{j % 7}.example"]
            if hs != hd:
                w[hs, hd] += 1.0
    res = pagerank(g, alpha=0.85, tol=None, max_iter=8)
    got = np.array([r.rank for r in res.ranks.orderBy("id").collect()])
    pairs = [(s, d) for s in range(7) for d in range(7) if w[s, d]]
    want = pagerank_oracle(pairs, 7, alpha=0.85, tol=None, max_iter=8,
                           weights=[w[s, d] for s, d in pairs])
    assert np.allclose(got, want, atol=1e-12)


# ---------------------------------------------------------------------------
# trustrank / spam mass
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_graph(spark):
    # two communities bridged one-way: trusted {0,1,2} ring links into 3;
    # spam farm {4,5} boosts 6, unreachable from the trusted core.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (4, 6), (5, 6), (6, 4), (6, 5)],
        "src long, dst long")
    return build_graph(spark, edges)


def test_trustrank_equals_personalized_pagerank(spark, tiny_graph):
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    tr = trustrank(tiny_graph, seeds, alpha=0.85, tol=None, max_iter=6)
    pr = pagerank(tiny_graph, alpha=0.85, tol=None, max_iter=6,
                  teleport=trust_teleport(seeds))
    a = {r.id: r.rank for r in tr.ranks.collect()}
    b = {r.id: r.rank for r in pr.ranks.collect()}
    assert a == b


def test_spam_mass_separates_farm(spark, tiny_graph):
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    # the separation asserts have >= 0.4 slack; tol=1e-3 converges both
    # inner power iterations in half the supersteps of 1e-6
    sm = {r.id: r.spam_mass
          for r in spam_mass(tiny_graph, seeds, tol=1e-3, max_iter=60).collect()}
    # the farm community gets (almost) no trust -> spam mass near 1
    for v in (4, 5, 6):
        assert sm[v] > 0.9, (v, sm[v])
    # the trusted core and its endorsee keep spam mass low / negative
    for v in (0, 1, 2, 3):
        assert sm[v] < 0.5, (v, sm[v])


def test_trust_teleport_empty_seeds_raises(spark):
    with pytest.raises(ValueError):
        trust_teleport(spark.createDataFrame([], "id long"))


# ---------------------------------------------------------------------------
# reciprocity
# ---------------------------------------------------------------------------

def test_reciprocity_counts(spark):
    # distinct non-loop edges: 0->1, 1->0, 1->2, 2->3, 3->2 ; loops +dups noise
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (2, 3), (7, 7)],
        "src long, dst long")
    row = reciprocity(edges).collect()[0]
    assert (row.m_edges, row.m_reciprocated) == (5, 4)
    assert row.reciprocity == pytest.approx(0.8)


def test_reciprocity_extremes(spark):
    none = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    assert reciprocity(none).collect()[0].reciprocity == 0.0
    full = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    assert reciprocity(full).collect()[0].reciprocity == 1.0


# ---------------------------------------------------------------------------
# anchor-text index
# ---------------------------------------------------------------------------

def _pages(spark, rows):
    import pandas as pd
    data = [(u, pd.Timestamp("2026-01-01").to_pydatetime(),
             h.encode(), "", "en") for u, h in rows]
    return spark.createDataFrame(data, schema=synth.PAGES_SCHEMA)


def test_anchor_pairs_extracts_text_and_href(spark):
    pages = _pages(spark, [
        ("u://a", '<html><body><a href="u://b">first <b>link</b></a>'
                  '<a class="x" href="u://c">second</a></body></html>'),
        ("u://b", '<html><body>no anchors</body></html>'),
    ])
    got = {(r.src_url, r.dst_url, r.anchor) for r in anchor_pairs(pages).collect()}
    assert got == {("u://a", "u://b", "first link"),
                   ("u://a", "u://c", "second")}


def test_anchor_text_index_majority_and_ties(spark):
    pages = _pages(spark, [
        ("u://a", '<html><body><a href="u://t">spark</a>'
                  '<a href="u://t">spark</a><a href="u://t">rank</a></body></html>'),
        ("u://b", '<html><body><a href="u://t">rank</a>'
                  '<a href="u://t">alpha</a></body></html>'),
    ])
    row = anchor_text_index(pages).collect()[0]
    assert row.url == "u://t"
    assert (row.n_anchors, row.n_sources, row.n_texts) == (5, 2, 3)
    # counts: spark=2, rank=2, alpha=1 -> tie broken lexicographically
    assert (row.top_anchor, row.top_anchor_n) == ("rank", 2)


def test_anchor_index_partitioning_invariant(spark):
    pages = synth.synth_pages(spark, n_pages=200)
    a = sorted(map(tuple, anchor_text_index(pages).collect()))
    b = sorted(map(tuple, anchor_text_index(
        synth.synth_pages(spark, n_pages=200, partitions=7)).collect()))
    assert a == b and len(a) > 50


def test_trustrank_drops_out_of_graph_seeds(spark, tiny_graph):
    """An out-of-graph seed must not carry away teleport mass (Σp < 1
    would decay every rank each superstep)."""
    clean = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    junk = spark.createDataFrame([(0,), (1,), (2,), (999,)], "id long")
    a = {r.id: r.rank
         for r in trustrank(tiny_graph, clean, tol=None, max_iter=4).ranks.collect()}
    b = {r.id: r.rank
         for r in trustrank(tiny_graph, junk, tol=None, max_iter=4).ranks.collect()}
    assert a == b
    assert abs(sum(a.values()) - 1.0) < 1e-12


def test_trustrank_all_seeds_out_of_graph_raises(spark, tiny_graph):
    junk = spark.createDataFrame([(999,)], "id long")
    with pytest.raises(ValueError):
        trustrank(tiny_graph, junk, tol=None, max_iter=2)
