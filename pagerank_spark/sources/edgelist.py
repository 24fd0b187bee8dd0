"""Reference-format edge-list sources and rank sinks.

S1 — whitespace edge-list scan (/root/reference/kernel_bblock.cu:567-619):
first line ``n nnz``, then ``nnz`` lines ``src dst`` with 1-indexed vertex
ids, decremented on read (the reference's ``tmp_va--``,
kernel_bblock.cu:590-592).

S2 — Matrix Market scan (/root/reference/lightSpMV/PageRank.h:408):
``%``-comment lines, then a ``rows cols nnz`` size line, then entries.

S3 — rank sink (/root/reference/kernel_bblock.cu:1097-1102): one rank per
line, fixed 6-decimal precision, vertex-id order. The reference's single
output file exists for parity; ``n_files`` spreads the sink at scale.

All parsing is distributed (DataFrame ops over ``spark.read.text``); only
the 2-token header line is resolved via a zipWithIndex pass, exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _lines_with_index(spark: SparkSession, path: str) -> DataFrame:
    """(line string, idx long) in file order."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(rdd, schema="line string, idx long")


def read_edge_list(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Reference S1 format -> (edges(src long, dst long) 0-indexed, n)."""
    lines = _lines_with_index(spark, path).persist()
    header = lines.filter(F.col("idx") == 0).select("line").first()[0]
    n = int(header.split()[0])
    toks = F.split(F.trim("line"), r"\s+")
    edges = (
        lines.filter(F.col("idx") > 0)
        .filter(F.trim("line") != "")
        .select(
            (toks.getItem(0).cast("long") - 1).alias("src"),
            (toks.getItem(1).cast("long") - 1).alias("dst"),
        )
    )
    return edges, n


def read_matrix_market(spark: SparkSession, path: str,
                       values: bool = False) -> tuple[DataFrame, int]:
    """Matrix Market coordinate format -> (edges 0-indexed, n).

    Comment lines start with ``%``; the first non-comment line is the size
    header ``rows cols nnz`` (skipped by position, matching
    cusp::io::read_matrix_market_file semantics). A ``symmetric`` banner
    expands each off-diagonal entry to both directions, as cusp does.

    ``values=True`` parses the explicit third column as edge weight ``w``
    (entries without one get NULL, which ``build_graph`` drops) — feeding
    the P9 row-sum normalization path
    (/root/reference/lightSpMV/PageRank.h:256-274: fabs + rowSum divide),
    so a weighted ``.mtx`` keeps its weights instead of silently degrading
    to 1/out_degree. Default ``False`` = pattern semantics (the four main
    reference binaries, kernel_bblock.cu:613 derives w from out-degree).
    """
    lines = _lines_with_index(spark, path).filter(F.trim("line") != "").persist()
    banner = lines.filter(F.col("idx") == 0).first()
    symmetric = banner is not None and "symmetric" in banner["line"].lower()
    data = lines.filter(~F.col("line").startswith("%"))
    header_idx = data.agg(F.min("idx")).first()[0]
    header = data.filter(F.col("idx") == header_idx).first()["line"]
    n = int(header.split()[0])
    toks = F.split(F.trim("line"), r"\s+")
    cols = [
        (toks.getItem(0).cast("long") - 1).alias("src"),
        (toks.getItem(1).cast("long") - 1).alias("dst"),
    ]
    if values:
        cols.append(toks.getItem(2).cast("double").alias("w"))
    edges = data.filter(F.col("idx") > header_idx).select(*cols)
    if symmetric:
        back = edges.filter(F.col("src") != F.col("dst"))
        edges = edges.unionAll(back.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *([F.col("w")] if values else [])))
    return edges, n


def write_ranks_text(ranks: DataFrame, path: str, n_files: int = 1) -> None:
    """S3 parity sink: ``%.6f`` per line in vertex-id order
    (kernel_bblock.cu:1099-1102 iterates i=0..n and prints 6 decimals).
    ``n_files > 1`` spreads the sink over id-range-partitioned files whose
    lexicographic part order preserves the global id order."""
    fmt = F.format_string("%.6f", F.col("rank"))
    if n_files == 1:
        out = ranks.orderBy("id").select(fmt).coalesce(1)
    else:
        out = (ranks.repartitionByRange(n_files, "id")
               .sortWithinPartitions("id").select(fmt))
    out.write.mode("overwrite").text(path)


def write_ranks_parquet(ranks: DataFrame, path: str,
                        partitions: int | None = None) -> None:
    """Scale sink: (id, rank) parquet, optionally repartitioned by id range
    so downstream consumers get clustered reads."""
    out = ranks
    if partitions:
        out = out.repartitionByRange(partitions, "id")
    out.write.mode("overwrite").parquet(path)
