"""Graph build: degrees, weights, dangling, id dictionary, salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.operators.graph import (
    build_graph,
    degree_bins,
    edges_from_pages,
    hot_vertex_salts,
    salted_edges,
)
from pagerank_spark.sources import synth


def _g6(spark):
    edges = spark.createDataFrame(synth.G6_EDGES, schema="src long, dst long")
    return build_graph(spark, edges, n_vertices=6)


def test_g6_degrees_and_dangling(spark):
    g = _g6(spark)
    v = {r.id: r for r in g.vertices.collect()}
    assert g.n_vertices == 6 and g.n_edges == 10
    assert [v[i].out_deg for i in range(6)] == [2, 0, 3, 2, 2, 1]
    assert [v[i].in_deg for i in range(6)] == [1, 2, 1, 2, 2, 2]
    # bookmark vector parity: only vertex 1 dangling (nvgraph_Pagerank.cpp:56)
    assert [v[i].is_dangling for i in range(6)] == [False, True, False, False, False, False]


def test_g6_weights(spark):
    g = _g6(spark)
    w = {(r.src, r.dst): r.w for r in g.edges.collect()}
    assert w[(0, 1)] == 0.5 and w[(2, 0)] == 1.0 / 3 and w[(5, 3)] == 1.0


def test_duplicate_edges_add_weight(spark):
    edges = spark.createDataFrame([(0, 1), (0, 1), (0, 2)], "src long, dst long")
    g = build_graph(spark, edges)
    w = [r.w for r in g.edges.filter("src=0 and dst=1").collect()]
    assert w == [1.0 / 3, 1.0 / 3]


def test_edges_from_pages_g6(spark):
    pages = synth.g6_pages(spark)
    edges, d = edges_from_pages(pages)
    # url dictionary: urls sorted lexicographically -> stable dense ids
    url_to_id = {r.url: r.id for r in d.collect()}
    got = sorted((r.src, r.dst) for r in edges.collect())
    expect = sorted(
        (url_to_id[synth.url_of(s)], url_to_id[synth.url_of(t)])
        for s, t in synth.G6_EDGES
    )
    assert got == expect
    assert sorted(url_to_id.values()) == list(range(6))


def test_url_dictionary_deterministic(spark):
    p1 = synth.synth_pages(spark, 80, partitions=5)
    p2 = synth.synth_pages(spark, 80, partitions=2)
    _, d1 = edges_from_pages(p1)
    _, d2 = edges_from_pages(p2)
    assert {(r.url, r.id) for r in d1.collect()} == {(r.url, r.id) for r in d2.collect()}


def test_degree_bins_match_reference_formula(spark):
    g = _g6(spark)
    bins = {r.id: r.bin for r in degree_bins(g.vertices).collect()}
    # in_deg: [1,2,1,2,2,2]; reference (kernel_bblock.cu:636) casts with C
    # truncation-toward-zero: in=1: (int)log2(0.9) = (int)(-0.15) = 0 -> bin 1
    # (NOT floor, which would give -1 -> bin 0); in=2: (int)log2(1.9)=0 -> bin 1.
    # bin 0 is reserved for in_deg == 0 exactly.
    assert bins[0] == 1 and bins[1] == 1 and bins[3] == 1


def test_salted_aggregation_equals_unsalted(spark):
    edges = synth.skew_edges(spark, 2000)
    g = build_graph(spark, edges, n_vertices=2000)
    salts = hot_vertex_salts(g.vertices, hot_threshold=50, target_bucket=20)
    assert salts.count() >= 1  # vertex 0 must be hot
    se = salted_edges(g.edges, salts)
    ranks = g.vertices.select("id", F.lit(1.0 / 2000).alias("rank"))
    joined = se.join(ranks.withColumnRenamed("id", "src"), "src").select(
        "dst", "salt", (F.col("rank") * F.col("w")).alias("c")
    )
    two_level = (
        joined.groupBy("dst", "salt").agg(F.sum("c").alias("c"))
        .groupBy("dst").agg(F.sum("c").alias("contrib"))
    )
    flat = joined.groupBy("dst").agg(F.sum("c").alias("contrib"))
    a = {r.dst: r.contrib for r in two_level.collect()}
    b = {r.dst: r.contrib for r in flat.collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_url_dictionary_sorted_dense_and_jvm_only(spark):
    """Ids are the global sorted-url positions (dense 0..n-1), and the plan
    contains no per-row Python node (PythonRDD/SerializeFromObject): the id
    dictionary is the one ingestion stage that used to route every url
    through a Python RDD; it must stay JVM-side at 10^12 urls."""
    from pagerank_spark.operators.graph import url_id_dictionary
    from pagerank_spark.plans.inspect import python_nodes

    urls = spark.createDataFrame(
        [(f"https://site{i % 97}.example/p{i}",) for i in range(1000)],
        "url string")
    d = url_id_dictionary(urls, partitions=7)
    rows = d.collect()
    want = {u: i for i, u in enumerate(sorted({r.url for r in urls.collect()}))}
    assert {r.url: r.id for r in rows} == want
    assert python_nodes(d) == []
    d.unpersist()
