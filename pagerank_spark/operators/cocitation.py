"""Co-citation and bibliographic coupling over the directed link graph.

The two classic directed-overlap similarities of link analysis (Small,
"Co-citation in the scientific literature", JASIS 1973; Kessler,
"Bibliographic coupling between scientific papers", American Documentation
1963) — the signals Kleinberg's HITS and SALSA build on, and the standard
"related pages" primitive of a web index:

* co-citation(u, v)   = #{w : w→u AND w→v}  — pages CITED TOGETHER; the
  wedge middle is the citing page w, fan-out bounded by out_deg(w).
* coupling(u, v)      = #{w : u→w AND v→w}  — pages CITING the same
  targets; the wedge middle is the cited page w, fan-out in_deg(w).

Scale shape mirrors ``linkpred.py`` exactly (it is the same wedge
enumeration with a directed middle): per-middle fan-out is deg(w)², the
power-law-head hazard, so middles above ``max_degree`` are dropped — the
standard approximation (a page citing 10^5 targets says nothing about any
pair of them; for web "related pages", stop-middles are PRUNED, not
salted). Pairs are exploded JVM-side from a bounded, sorted per-middle
adjacency array (collect_list capped by the degree filter, map-side
partial-aggregated), counted with one hash aggregate, and the global
top-k is a TakeOrdered (partial per-partition top-k merged on the driver —
no full sort shuffle). Ranking is by EXACT INTEGERS (count desc, a, b
asc), the repo's determinism rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(edges: DataFrame, middle: str, leaf: str,
                 max_degree: int | None) -> DataFrame:
    d = (edges.filter(F.col("src") != F.col("dst"))
         .select("src", "dst").distinct())
    if max_degree is not None:
        # capped (scale) plan: bounded per-middle adjacency array, pairs
        # exploded JVM-side — collect_list never exceeds max_degree
        # elements per group (linkpred.py's K4-style dispatch)
        grp = (d.groupBy(middle)
               .agg(F.count(F.lit(1)).alias("deg"),
                    F.sort_array(F.collect_list(leaf)).alias("A"))
               .filter(F.col("deg") <= max_degree))
        pairs = grp.select(
            F.explode(F.flatten(F.transform(
                "A",
                lambda x, i: F.transform(
                    F.slice("A", i + F.lit(2), F.size("A")),
                    lambda y: F.struct(x.alias("a"), y.alias("b"))),
            ))).alias("p")
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    else:
        # exact plan: self-join streams hub fan-out instead of buffering
        # an unbounded adjacency list in one aggregation buffer
        n1 = d.select(F.col(middle).alias("w"), F.col(leaf).alias("a"))
        n2 = d.select(F.col(middle).alias("w"), F.col(leaf).alias("b"))
        pairs = n1.join(n2, "w").filter(F.col("a") < F.col("b")) \
                  .select("a", "b")
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cocitation_topk(edges: DataFrame, top_k: int = 20,
                    max_degree: int | None = 1000) -> DataFrame:
    """Top-``top_k`` co-cited pairs (a < b, cnt = #common citing pages),
    ranked by (cnt desc, a asc, b asc). Citing pages with out-degree above
    ``max_degree`` are skipped (None = exact)."""
    cnt = _pair_counts(edges, middle="src", leaf="dst",
                       max_degree=max_degree)
    return cnt.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(top_k)


def coupling_topk(edges: DataFrame, top_k: int = 20,
                  max_degree: int | None = 1000) -> DataFrame:
    """Top-``top_k`` bibliographically coupled pairs (a < b, cnt = #common
    cited targets), ranked by (cnt desc, a asc, b asc). Targets with
    in-degree above ``max_degree`` are skipped (None = exact)."""
    cnt = _pair_counts(edges, middle="dst", leaf="src",
                       max_degree=max_degree)
    return cnt.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(top_k)
