"""Ingestion invariants: byte-identical text per url; outlinks exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.functions.extract import extract_outlinks, extract_text
from pagerank_spark.sources import synth


def test_extract_text_byte_identical(spark):
    pages = synth.synth_pages(spark, 120)
    bad = (
        pages.withColumn("extracted", extract_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extract_text_deterministic_across_runs(spark):
    pages = synth.synth_pages(spark, 60, partitions=7)
    a = {r.url: r.t for r in pages.select("url", extract_text("html").alias("t")).collect()}
    pages2 = synth.synth_pages(spark, 60, partitions=3)
    b = {r.url: r.t for r in pages2.select("url", extract_text("html").alias("t")).collect()}
    assert a == b


def test_extract_outlinks_match_generator(spark):
    pages = synth.synth_pages(spark, 120)
    got = {
        r.url: list(r.outs)
        for r in pages.select("url", extract_outlinks("html").alias("outs")).collect()
    }
    for i in range(120):
        assert got[synth.url_of(i)] == synth.outlinks_of(i), f"page {i}"


def test_dangling_pages_have_no_outlinks(spark):
    for i in (0, 13, 26, 39):
        assert synth.outlinks_of(i) == []
