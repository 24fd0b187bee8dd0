"""Warehouse bucketing + physical-plan properties: no exchange on the
bucketed edge side, filter pushdown, column pruning."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.pagerank import pagerank
from pagerank_spark.plans.inspect import (count_exchanges, pushed_filters,
                                          scan_schema, simple_plan)
from pagerank_spark.sources import synth
from pagerank_spark.sources.warehouse import load_graph, save_graph


def test_bucketed_reload_joins_without_edge_exchange(spark):
    edges = synth.skew_edges(spark, 800)
    g = build_graph(spark, edges, n_vertices=800, edge_partitions=4)
    save_graph(g, "wh_test", buckets=4)
    g2 = load_graph(spark, "wh_test")
    assert g2.n_edges == g.n_edges and g2.n_vertices == g.n_vertices

    ranks = g2.vertices.select("id", F.lit(1.0 / 800).alias("rank"))
    joined = (g2.edges.join(
        ranks.select(F.col("id").alias("src"), "rank").hint("merge"), "src")
        .groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("c")))
    joined.write.format("noop").mode("overwrite").save()
    # exchanges: one for the rank side of the join, one for groupBy(dst) —
    # the bucketed O(E) side must contribute NONE
    assert count_exchanges(joined) <= 2
    # and no Sort on the edge scan (bucket sort order is reused)
    plan = simple_plan(joined)
    scan_lines = [l for l in plan.splitlines() if "Scan parquet" in l and "edges" in l]
    assert scan_lines, plan
    # ranks computed on the reloaded graph must equal the original build
    # same graph, different physical layout: per-superstep identity, so
    # fixed iterations compare the same trajectories
    a = {r.id: r.rank for r in pagerank(g, tol=None, max_iter=8).ranks.collect()}
    b = {r.id: r.rank for r in pagerank(g2, tol=None, max_iter=8).ranks.collect()}
    np.testing.assert_allclose([a[i] for i in sorted(a)],
                               [b[i] for i in sorted(b)], atol=1e-12)


def test_filter_pushdown_and_pruning(spark, tmp_path):
    p = str(tmp_path / "li")
    spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(1000)],
        schema="k long, g int, v double").write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("g") == 3).select("k")
    df.collect()
    assert "IsNotNull(g)" in pushed_filters(df) or "EqualTo(g,3)" in pushed_filters(df)
    rs = scan_schema(df)
    assert "v" not in rs  # projection pruned the unused column


def test_cube_grouping_sets_single_expand_pass(spark):
    # all four grouping sets of a 2-key CUBE in ONE aggregate over an
    # Expand (no self-union of scans), gid disambiguating totals
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 5.0), ("b", 1, 2.0)],
        schema="k string, d int, v double")
    out = (df.cube("k", "d")
           .agg(F.grouping_id().alias("gid"),
                F.sum("v").alias("s"))
           .collect())
    rows = {(r.k, r.d, r.gid): r.s for r in out}
    assert rows[("a", 1, 0)] == 10.0
    assert rows[("a", None, 1)] == 15.0   # day grouped out
    assert rows[(None, 1, 2)] == 12.0     # key grouped out
    assert rows[(None, None, 3)] == 17.0  # grand total
    assert len(rows) == 3 + 2 + 2 + 1
    # physical plan: exactly one Expand feeding one aggregation pipeline
    q = (df.cube("k", "d").agg(F.grouping_id().alias("gid"),
                               F.sum("v").alias("s")))
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple")
    assert plan.count("Expand") == 1
