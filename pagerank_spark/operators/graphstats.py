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

from pyspark.sql import DataFrame, Window
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


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """(id, nbr_cnt, nbr_deg_sum, avg_nbr_deg) per vertex with >= 1
    out-edge: the mean OUT-degree of its distinct out-neighbors — the
    per-vertex knn curve behind the assortativity scalar (Pastor-Satorras,
    Vazquez & Vespignani, PRL 2001), read next to it when picking salting
    thresholds.

    Exact integers (count + BIGINT sum, order-independent) plus ONE final
    division. Plan: one degree aggregate, one edges⋈degrees equi-join
    (J1 shape, shuffle-hash), one per-src aggregate with map-side
    partials — never more state than the PageRank contribution sum.
    Dangling out-neighbors contribute degree 0 (they have no out-edges).
    """
    d = (edges.filter(F.col("src") != F.col("dst"))
         .select("src", "dst").distinct()
         .localCheckpoint(eager=True))  # degree agg + join read one scan
    deg = d.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d"))
    return (
        d.join(deg.withColumnRenamed("v", "dst").hint("shuffle_hash"),
               "dst", "left")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("nbr_cnt"),
             F.sum(F.coalesce("d", F.lit(0))).alias("nbr_deg_sum"))
        .select("id", "nbr_cnt", "nbr_deg_sum",
                (F.col("nbr_deg_sum") / F.col("nbr_cnt"))
                .alias("avg_nbr_deg"))
    )


def degree_distribution(edges: DataFrame,
                        universe: DataFrame | None = None) -> DataFrame:
    """(deg, n_vertices, cum_ge) — the out-degree histogram plus the
    descending cumulative count (#vertices with out-degree >= deg), i.e.
    the integer CCDF a crawl operator reads to size salting thresholds
    and spot the power-law head. ``universe`` adds zero-out-degree
    (dangling) vertices to the deg=0 bucket.

    All integers, no floats anywhere. The cumulative window runs over ONE
    partition of AT MOST #distinct-degree-values rows (O(sqrt(E)) on any
    graph — a few thousand at 10^12 edges), strictly after the V-scale
    degree aggregate has collapsed the data; that single-task step is
    deliberate and bounded, not a skew hazard.
    """
    deg = (edges.filter(F.col("src") != F.col("dst"))
           .select("src", "dst").distinct()
           .groupBy(F.col("src").alias("id"))
           .agg(F.count(F.lit(1)).alias("deg")))
    if universe is not None:
        deg = (universe.select("id").distinct()
               .join(deg, "id", "left")
               .select("id", F.coalesce("deg", F.lit(0)).alias("deg")))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_vertices"))
    w = (Window.orderBy(F.desc("deg"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return hist.select("deg", "n_vertices",
                       F.sum("n_vertices").over(w).alias("cum_ge"))


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


def degree_quantiles(edges: DataFrame, universe: DataFrame | None = None,
                     probs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """One-row exact out/in-degree quantile + max summary — the skew
    numbers that size the engine's salting threshold and partition counts
    (K2/K4). Linear-interpolated exact percentiles (Spark ``percentile``
    == DuckDB ``quantile_cont``), so the row is oracle-checkable.

    Scale: two V-scale degree aggregates; the percentile aggregate's
    state is O(distinct degree values) <= max degree — bounded by page
    size on the out side of the webtext tier.
    """
    e = edges.select("src", "dst")
    if universe is None:
        universe = (e.select(F.col("src").alias("id"))
                    .unionByName(e.select(F.col("dst").alias("id"))).distinct())
    else:
        universe = universe.select("id")
    od = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("idg"))
    degs = (universe.join(od, "id", "left").join(idg, "id", "left")
            .select(F.coalesce("od", F.lit(0)).alias("od"),
                    F.coalesce("idg", F.lit(0)).alias("idg")))
    aggs = []
    for col in ("od", "idg"):
        side = "out" if col == "od" else "in"
        for p in probs:
            tag = f"p{round(p * 100)}"
            aggs.append(F.round(F.percentile(F.col(col), F.lit(p)), 6)
                        .alias(f"{side}_{tag}"))
        aggs.append(F.max(col).alias(f"{side}_max"))
    return degs.agg(*aggs)
