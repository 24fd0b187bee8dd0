"""Warehouse persistence for the built link graph.

The north star keeps the edge table in warehouse tables so the expensive
build shuffle happens ONCE per crawl, not once per job. The edge table is
written BUCKETED + SORTED by ``src`` — the on-disk form of the engine's
CSC-analogue layout (SURVEY §1.3): a reload joins against the rank table
with no exchange and no sort on the O(E) side.

Local catalogs: Spark's native parquet bucketing via ``saveAsTable``. The
in-memory session catalog forgets table DEFINITIONS between sessions, so
``load_graph`` re-registers the persisted files from the warehouse
directory on a fresh session; a production deployment swaps this for a
real metastore or Iceberg catalog (Iceberg jars are not in this sandbox)
without touching callers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from pagerank_spark.operators.graph import LinkGraph


def _table_names(name: str) -> tuple[str, str]:
    return f"{name}_edges", f"{name}_vertices"


def save_graph(graph: LinkGraph, name: str, buckets: int | None = None) -> None:
    """Persist a built LinkGraph as ``<name>_edges`` (bucketed+sorted by
    src) and ``<name>_vertices`` warehouse tables."""
    edges_t, vertices_t = _table_names(name)
    if buckets is None:
        buckets = graph.edges.rdd.getNumPartitions()
    spark = graph.edges.sparkSession
    for t in (edges_t, vertices_t):
        # the in-memory catalog forgets table DEFINITIONS across sessions
        # but the warehouse files persist; saveAsTable(overwrite) refuses a
        # location it does not own, so clear both catalog entry and files
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), t)
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    (graph.edges.write.mode("overwrite")
     .bucketBy(buckets, "src").sortBy("src", "dst")
     .format("parquet").saveAsTable(edges_t))
    graph.vertices.write.mode("overwrite").format("parquet").saveAsTable(vertices_t)


def load_graph(spark: SparkSession, name: str) -> LinkGraph:
    """Load a saved graph; edge scans keep the bucketed layout, so the
    per-superstep contribution join needs no exchange/sort on the edge
    side (asserted in tests via plans.inspect.count_exchanges)."""
    edges_t, vertices_t = _table_names(name)
    edges = spark.table(edges_t).persist(StorageLevel.MEMORY_AND_DISK)
    vertices = spark.table(vertices_t).persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()
    n = vertices.count()
    return LinkGraph(edges=edges, vertices=vertices, n_vertices=n,
                     n_edges=n_edges)


def metrics_table(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The iteration-metrics table of a dir-backed run (telemetry sink S4
    as a queryable DataFrame)."""
    return spark.read.json(f"{checkpoint_dir}/metrics.jsonl")
