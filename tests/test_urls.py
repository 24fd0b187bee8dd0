from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.functions.urls import (normalize_url, registered_domain,
                                           url_depth, url_host, url_port,
                                           url_query, url_scheme)

CASES = [
    # (raw, normalized)
    ("HTTP://WWW.Example.COM:80/Path/X?b=2&a=1#frag",
     "http://www.example.com/Path/X?a=1&b=2"),
    ("https://site.example:443/", "https://site.example/"),
    ("https://site.example:8443/x", "https://site.example:8443/x"),
    ("http://host.example", "http://host.example/"),
    ("http://host.example/?z=1", "http://host.example/?z=1"),
    ("ftp://Files.Example.com:21/pub", "ftp://files.example.com:21/pub"),
    ("not a url", ""),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r.n for r in df.select(normalize_url(F.col("url")).alias("n"))
           .collect()]
    assert got == [n for _, n in CASES]


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("HTTPS://A.B.co.UK:8080/x/y/z?q=1#f",)], "url string")
    row = df.select(
        url_scheme(F.col("url")).alias("s"),
        url_host(F.col("url")).alias("h"),
        url_port(F.col("url")).alias("p"),
        url_query(F.col("url")).alias("q"),
        registered_domain(F.col("url")).alias("d"),
        url_depth(F.col("url")).alias("n"),
    ).first()
    assert (row.s, row.h, row.p, row.q) == ("https", "a.b.co.uk", "8080", "q=1")
    assert row.d == "co.uk"  # documented last-two-labels approximation
    assert row.n == 3


def test_normalize_is_jvm_only(spark):
    from pagerank_spark.plans.inspect import python_nodes
    df = spark.range(10).select(
        normalize_url(F.concat(F.lit("http://h.example/p"),
                               F.col("id").cast("string"))).alias("n"))
    assert python_nodes(df) == []


def test_normalize_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES[:-1]], "url string")
    once = df.select(normalize_url(F.col("url")).alias("u"))
    twice = once.select(normalize_url(F.col("u")).alias("u"))
    assert [r.u for r in once.collect()] == [r.u for r in twice.collect()]
