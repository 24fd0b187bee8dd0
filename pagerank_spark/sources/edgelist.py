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

All parsing is distributed and stays entirely inside the JVM: the header
is read DRIVER-SIDE through the Hadoop FS API (an O(header-bytes) open of
the file head — never a per-row Python pass over the body), and the body
is a plain CSV scan whose comment/header options drop the non-data lines
at the parser. ``plans.inspect.python_nodes`` on the result is empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _resolve_files(spark: SparkSession, path: str) -> list[str]:
    """Files matched by ``path`` (a file, glob, or directory) in
    lexicographic order — shard 0 carries the size header by convention.
    Resolved driver-side via the Hadoop FS API so the same enumeration
    serves both the header read and the body scan."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(jpath)
    if statuses is None or len(statuses) == 0:
        raise FileNotFoundError(path)
    files = sorted(s.getPath().toString() for s in statuses if s.isFile())
    if not files:
        files = sorted(
            s.getPath().toString()
            for s in fs.listStatus(statuses[0].getPath()) if s.isFile())
        if not files:
            raise FileNotFoundError(f"no files under {path}")
    return files


def _head_lines(spark: SparkSession, path: str,
                max_lines: int = 100_000) -> list[str]:
    """Leading lines of ``path`` up to and including the first non-comment,
    non-blank line (the size header), read driver-side via Hadoop FS —
    works on any filesystem Spark can reach and costs O(header), not a
    distributed job. Globs/directories resolve to their first file in
    lexicographic order (shard 0 carries the header by convention)."""
    jvm = spark._jvm
    files = _resolve_files(spark, path)
    fs = jvm.org.apache.hadoop.fs.Path(files[0]).getFileSystem(
        spark._jsc.hadoopConfiguration())
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(
            fs.open(jvm.org.apache.hadoop.fs.Path(files[0])), "UTF-8"))
    lines: list[str] = []
    try:
        for _ in range(max_lines):
            ln = reader.readLine()
            if ln is None:
                break
            lines.append(ln)
            if ln.strip() and not ln.lstrip().startswith("%"):
                break  # reached the size header — that's all we need
    finally:
        reader.close()
    if not lines or not lines[-1].strip() or lines[-1].lstrip().startswith("%"):
        raise ValueError(f"no size header found in {path}")
    return lines


def _body_lines(spark: SparkSession, path: str) -> DataFrame:
    """(line string) = the data lines of the file(s): ``%``-comment lines
    are dropped INSIDE the JVM CSV parser (``comment='%'``) and the size
    header is dropped from SHARD 0 ONLY (``header=True`` on the first file
    of the lexicographic listing, ``header=False`` on the rest — a plain
    per-path ``header=True`` would silently eat the first real edge row of
    every headerless shard of a multi-file input). The ``\\x01`` delimiter
    never occurs in these formats, so each line lands as one string
    column. No PythonRDD / SerializeFromObject in the plan (pinned by
    tests via plans.inspect.python_nodes)."""
    files = _resolve_files(spark, path)

    def scan(paths: list[str], header: bool) -> DataFrame:
        return (
            spark.read
            .option("comment", "%")
            .option("header", header)
            .option("delimiter", "\x01")
            .option("quote", "")
            .schema("line string")
            .csv(paths)
        )

    body = scan(files[:1], True)
    if len(files) > 1:
        body = body.unionAll(scan(files[1:], False))
    return body.filter(F.trim("line") != "")


def read_edge_list(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Reference S1 format -> (edges(src long, dst long) 0-indexed, n)."""
    header = next(ln for ln in _head_lines(spark, path) if ln.strip())
    n = int(header.split()[0])
    toks = F.split(F.trim("line"), r"\s+")
    edges = _body_lines(spark, path).select(
        (toks.getItem(0).cast("long") - 1).alias("src"),
        (toks.getItem(1).cast("long") - 1).alias("dst"),
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
    head = _head_lines(spark, path)
    banner = next((ln for ln in head if ln.strip()), "")
    symmetric = "symmetric" in banner.lower()
    header = head[-1]  # first non-comment, non-blank line = size header
    n = int(header.split()[0])
    toks = F.split(F.trim("line"), r"\s+")
    cols = [
        (toks.getItem(0).cast("long") - 1).alias("src"),
        (toks.getItem(1).cast("long") - 1).alias("dst"),
    ]
    if values:
        cols.append(toks.getItem(2).cast("double").alias("w"))
    edges = _body_lines(spark, path).select(*cols)
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
