"""Crawl-frontier planning (operators/frontier.py): politeness scheduling
and URL-pattern mining."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.frontier import (
    frontier_schedule,
    url_path_template,
    url_patterns,
)


@pytest.fixture(scope="module")
def frontier(spark):
    # 3 hosts x uneven frontier sizes, priorities with a deliberate tie
    rows = [
        ("u01", "a.com", 9), ("u02", "a.com", 9), ("u03", "a.com", 5),
        ("u04", "a.com", 7), ("u05", "a.com", 1),
        ("u06", "b.com", 3), ("u07", "b.com", 8),
        ("u08", "c.com", 4),
    ]
    return spark.createDataFrame(rows, "url string, host string, priority int")


def test_schedule_ranks_by_priority_then_key(spark, frontier):
    out = {r.key: (r.host_rank, r.slot)
           for r in frontier_schedule(frontier, per_slot=2).collect()}
    # a.com by (priority desc, key asc): u01(9) u02(9-tie) u04(7) u03(5) u05(1)
    assert out["u01"] == (1, 0) and out["u02"] == (2, 0)
    assert out["u04"] == (3, 1) and out["u03"] == (4, 1)
    assert out["u05"] == (5, 2)
    assert out["u07"] == (1, 0) and out["u06"] == (2, 0)
    assert out["u08"] == (1, 0)


def test_schedule_slot_width_never_exceeds_per_slot(spark):
    fr = spark.range(500).select(
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        ((F.col("id") * 131) % 997).alias("priority"))
    widths = (frontier_schedule(fr, per_slot=3, max_per_host=1000)
              .groupBy("host", "slot").agg(F.count(F.lit(1)).alias("n")))
    assert widths.filter(F.col("n") > 3).count() == 0
    # every URL scheduled (cap not hit), slots contiguous from 0
    assert widths.agg(F.sum("n")).first()[0] == 500
    per_host = widths.groupBy("host").agg(
        F.max("slot").alias("mx"), F.count(F.lit(1)).alias("nslots")).collect()
    for r in per_host:
        assert r.nslots == r.mx + 1


def test_schedule_max_per_host_defers_tail(spark, frontier):
    out = frontier_schedule(frontier, per_slot=1, max_per_host=2)
    assert out.count() == 2 + 2 + 1  # a.com and b.com capped at 2
    kept = {r.key for r in out.collect()}
    assert kept == {"u01", "u02", "u07", "u06", "u08"}


def test_schedule_deterministic_across_partitionings(spark, frontier):
    a = frontier_schedule(frontier)
    b = frontier_schedule(frontier.repartition(7, "priority"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schedule_validates_params(spark, frontier):
    with pytest.raises(ValueError):
        frontier_schedule(frontier, per_slot=0)
    with pytest.raises(ValueError):
        frontier_schedule(frontier, max_per_host=0)


def test_url_path_template_collapses_families(spark):
    urls = [
        ("http://A.com/blog/2024/01/post-991",),
        ("http://a.com/blog/7/post-3",),
        ("http://b.org/s/deadbeef1234cafe",),   # long hex run -> H
        ("http://b.org/about",),
        ("http://c.net",),                       # no path
    ]
    df = spark.createDataFrame(urls, "url string")
    got = [r.t for r in df.select(
        url_path_template(F.col("url")).alias("t")).collect()]
    assert got == ["/blog/N/N/post-N", "/blog/N/post-N", "/s/H", "/about", ""]


def test_url_patterns_counts_urls_and_hosts(spark):
    urls = [(u,) for u in [
        "http://a.com/item/1", "http://a.com/item/2", "http://A.com/item/3",
        "http://b.com/item/9",
        "http://a.com/unique-once",
    ]]
    df = spark.createDataFrame(urls, "url string")
    out = {r.pattern: (r.n_urls, r.n_hosts)
           for r in url_patterns(df, min_urls=2).collect()}
    # mixed-case a.com/A.com is ONE host after normalization
    assert out == {"/item/N": (4, 2)}  # min_urls=2 drops the singleton


def test_schedule_cap_is_partial_window_group_limit(spark):
    """The max_per_host cap must push a Partial WindowGroupLimit BELOW the
    exchange (Spark 4 InferWindowGroupLimit) — the property that bounds
    what a 100M-URL spam host ships into the shuffle."""
    fr = spark.range(10_000).select(
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 11).cast("string")).alias("host"),
        ((F.col("id") * 131) % 997).alias("priority"))
    plan = (frontier_schedule(fr, per_slot=2, max_per_host=50)
            ._jdf.queryExecution().executedPlan().toString())
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit" in l and "Partial" in l]
    exchange = [i for i, l in enumerate(lines) if "Exchange" in l]
    assert partial and exchange
    # the Partial limit sits BELOW (deeper than) the exchange in the tree
    assert min(exchange) < max(partial)
