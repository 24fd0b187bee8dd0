"""Whole-graph structural statistics over the edge table.

Companion analytics to the degree machinery of SURVEY.md §2.3 (the
reference's A1 degree counts, /root/reference/kernel_bblock.cu:588-598):
one-pass aggregates that summarize the graph a crawl produced — the
numbers an operator looks at before deciding partitioning and salting.

Numeric discipline: all moment sums accumulate in DECIMAL(38,0) from
integer degrees (exact, order-independent — the same trick the engine's
money aggregates use), and only the final closed-form statistic is
evaluated in double. That makes the result bit-stable across partitionings
and engines, so it can be value-hash-checked against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Directed degree assortativity: Pearson correlation, over every edge
    (u, v) of the multigraph, between out_deg(u) and in_deg(v).

    Positive: high-fanout pages link to popular pages (hub cliques);
    negative: hubs link to the long tail. One edge-scale join pass + one
    six-way exact aggregate; the O(1) closed form runs on the driver side
    of the plan (a 1-row projection), never touching the edge table again.
    """
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    pairs = (
        edges.join(out_deg.hint("shuffle_hash"), "src")
        .join(in_deg.hint("shuffle_hash"), "dst")
        .select("x", "y")
    )
    sums = pairs.agg(
        F.count(F.lit(1)).cast(_DEC).alias("m"),
        F.sum(F.col("x").cast(_DEC)).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("syy"),
    )
    m, sx, sy = F.col("m").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col("sxy").cast("double"), F.col("sxx").cast("double"),
                     F.col("syy").cast("double"))
    cov = m * sxy - sx * sy
    vx = m * sxx - sx * sx
    vy = m * syy - sy * sy
    return sums.select(
        F.col("m").cast("long").alias("m_edges"),
        (cov / F.sqrt(vx * vy)).alias("assortativity"),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Link reciprocity of the simple directed graph: the fraction of
    distinct non-loop edges (u, v) whose reverse (v, u) is also present.

    High reciprocity means mutual-linking cliques (blog rings, mirror
    farms); crawl-quality pipelines read it next to assortativity before
    choosing salting thresholds. One distinct + one self-semi-join, both
    shuffling on the same (src, dst) pair — the second shuffle is the
    reversed key, unavoidable for any reverse-edge lookup. The ratio is
    exact (two BIGINT counts, divided once at the end).
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)  # both counts read one materialization
    )
    rec = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "leftsemi",
    )
    m = e.agg(F.count(F.lit(1)).alias("m")).select("m")
    r = rec.agg(F.count(F.lit(1)).alias("r")).select("r")
    return m.crossJoin(r).select(
        F.col("m").alias("m_edges"),
        F.col("r").alias("m_reciprocated"),
        (F.col("r") / F.col("m")).alias("reciprocity"),
    )
