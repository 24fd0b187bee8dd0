"""Inverted anchor-text index over the pages table.

Web-search signal: anchor text is how OTHER pages describe a target — the
classic ranking feature aggregated per link target. This is the text-side
companion of the edge extraction that feeds the link graph
(functions/extract.py; the reference's edge parser analogue,
/root/reference/kernel_bblock.cu:567-619, carries no text — anchors are the
payload the engine adds for the webtext tier).

Scale shape: one pandas-UDF extraction pass (Arrow batches), one explode,
then aggregations keyed by target url. The power-law head (a hot target
like a homepage) is exactly the skew regime of the reference's degree
binning; both aggregates here two-phase (map-side partials for the counts,
(dst, anchor) composite key for the text histogram — the hot target's rows
spread over its distinct anchor texts before the final per-target pick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.functions.extract import extract_anchors


def anchor_pairs(pages: DataFrame) -> DataFrame:
    """pages -> (src_url, dst_url, anchor) — one row per anchor element."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_anchors(F.col("html"))).alias("a"),
        )
        .select(
            "src_url",
            F.col("a.href").alias("dst_url"),
            F.col("a.anchor").alias("anchor"),
        )
    )


def anchor_text_index(pages: DataFrame) -> DataFrame:
    """Per link target: anchor volume and the dominant anchor text.

    Returns ``(url, n_anchors, n_sources, n_texts, top_anchor,
    top_anchor_n)`` where ``top_anchor`` is the most frequent anchor text
    pointing at ``url`` (ties broken lexicographically — deterministic
    under any partitioning, so the result is value-hash stable).
    """
    pairs = anchor_pairs(pages)
    per_text = pairs.groupBy(F.col("dst_url").alias("url"), "anchor").agg(
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("url").orderBy(F.desc("n"), F.asc("anchor"))
    top = (
        per_text.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("url", F.col("anchor").alias("top_anchor"),
                F.col("n").alias("top_anchor_n"))
    )
    totals = pairs.groupBy(F.col("dst_url").alias("url")).agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.countDistinct("src_url").alias("n_sources"),
        F.countDistinct("anchor").alias("n_texts"),
    )
    return totals.join(top, "url").select(
        "url", "n_anchors", "n_sources", "n_texts",
        "top_anchor", "top_anchor_n",
    )
