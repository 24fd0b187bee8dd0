"""Triangle counting on the undirected simple graph induced by the edge table.

Absent from the reference (SURVEY.md §2.9); mandated by the north rule.
Formulation: orient every edge low->high id after dedupe/self-loop removal,
then triangles are paths a->b->c (a<b<c) closed by edge (a,c):

    tri = E ⋈_{b} E ⋈_{(a,c)} E

Two shuffle joins over the oriented edge set. At web scale the standard
refinement is degree-ordering (orient toward the higher-degree endpoint) so
the join fan-out per vertex is bounded by sqrt(m); we orient by id here and
rely on AQE skew-join splitting, with degree-ordering available via the
``order_by_degree`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, order_by_degree: bool) -> DataFrame:
    simple = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    if not order_by_degree:
        return simple
    # orient from lower-(degree, id) to higher-(degree, id): bounds the
    # out-neighborhood of every vertex by O(sqrt(m)) (Schank-Wagner ordering)
    sym = simple.unionAll(simple.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("a", "v")
    with_deg = (
        simple.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    fwd = F.struct("da", "a") < F.struct("db", "b")
    return with_deg.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangle_count(edges: DataFrame, order_by_degree: bool = True) -> int:
    """Total number of triangles."""
    e = _oriented(edges, order_by_degree).localCheckpoint(eager=True)
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e2.b").alias("y"),
                F.col("e1.b").alias("via"))
    )
    closed = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
            e.select(F.col("b").alias("x"), F.col("a").alias("y"))
        ),
        ["x", "y"],
    )
    return closed.count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates in.

    Uses id-orientation (a<b<c) so each triangle is enumerated exactly once,
    then fans out to its three corners.
    """
    e = _oriented(edges, order_by_degree=False).localCheckpoint(eager=True)
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                F.col("e2.b").alias("z"))
        .join(e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"])
    )
    corners = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
