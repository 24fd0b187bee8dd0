"""Incremental edge ingestion: pages stream -> append log -> compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.sources.synth import synth_pages
from pagerank_spark.streaming.ingest import (compact_edges, edges_of_batch,
                                             ingest_edges, stream_pages)


def _batch_url_edges(spark, pages):
    """Ground truth: the batch extraction's (src_url, dst_url) pairs."""
    from pagerank_spark.functions.extract import extract_outlinks
    raw = (pages.select(F.col("url").alias("src_url"),
                        extract_outlinks(F.col("html")).alias("outs"))
           .select("src_url", F.explode("outs").alias("dst_url")))
    return {(r.src_url, r.dst_url) for r in raw.distinct().collect()}


def test_stream_ingest_matches_batch_extraction(spark, tmp_path):
    pages = synth_pages(spark, n_pages=300).localCheckpoint(eager=True)
    land = tmp_path / "landing"
    # two crawl deltas land as separate files -> separate micro-batches
    pages.filter("xxhash64(url) % 2 = 0").coalesce(1) \
         .write.mode("append").parquet(str(land))
    pages.filter("xxhash64(url) % 2 != 0").coalesce(1) \
         .write.mode("append").parquet(str(land))

    q = ingest_edges(
        stream_pages(spark, str(land), max_files_per_trigger=1),
        out_dir=str(tmp_path / "edges"),
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    got = compact_edges(spark, str(tmp_path / "edges"))
    got_pairs = {(r.src_url, r.dst_url) for r in got.collect()}
    assert got_pairs == _batch_url_edges(spark, pages)
    # hash ids are the deterministic xxhash64 of the url
    one = got.limit(5).collect()
    for r in one:
        h = spark.sql(f"SELECT xxhash64('{r.src_url}') AS h").first().h
        assert r.src == h


def test_recrawl_replaces_edges(spark, tmp_path):
    """A recrawled page's NEW outlinks replace its old ones at compaction."""
    import pandas as pd
    old_html = b'<html><body><a href="https://x.test/a">l</a></body></html>'
    new_html = b'<html><body><a href="https://x.test/b">l</a></body></html>'
    rows_v1 = [("https://s.test/p", pd.Timestamp("2026-01-01").to_pydatetime(),
                old_html, "t", "en")]
    rows_v2 = [("https://s.test/p", pd.Timestamp("2026-02-01").to_pydatetime(),
                new_html, "t", "en")]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    land = tmp_path / "landing"
    spark.createDataFrame(rows_v1, schema).coalesce(1) \
         .write.mode("append").parquet(str(land))
    spark.createDataFrame(rows_v2, schema).coalesce(1) \
         .write.mode("append").parquet(str(land))

    q = ingest_edges(stream_pages(spark, str(land), max_files_per_trigger=1),
                     out_dir=str(tmp_path / "edges"),
                     checkpoint_dir=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = {(r.src_url, r.dst_url)
           for r in compact_edges(spark, str(tmp_path / "edges")).collect()}
    assert got == {("https://s.test/p", "https://x.test/b")}


def test_in_batch_recrawl_keeps_latest(spark):
    """edges_of_batch: duplicate url within ONE batch -> newest snapshot."""
    import pandas as pd
    h1 = b'<html><body><a href="https://x.test/old">l</a></body></html>'
    h2 = b'<html><body><a href="https://x.test/new">l</a></body></html>'
    rows = [
        ("https://s.test/p", pd.Timestamp("2026-01-01").to_pydatetime(), h1, "t", "en"),
        ("https://s.test/p", pd.Timestamp("2026-03-01").to_pydatetime(), h2, "t", "en"),
    ]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    got = edges_of_batch(spark.createDataFrame(rows, schema))
    assert [(r.src_url, r.dst_url) for r in got.collect()] == \
        [("https://s.test/p", "https://x.test/new")]


def test_incremental_crawl_warm_start_e2e(spark, tmp_path):
    """The north-rule incremental story end to end: crawl 1 streams in ->
    graph -> converged ranks; a crawl DELTA lands -> recompact -> rebuild
    -> warm-start from the previous vector converges in no more supersteps
    than a cold run and to the same fixed point."""
    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank
    from pagerank_spark.sources.synth import synth_pages

    land = tmp_path / "landing"
    crawl1 = synth_pages(spark, 150).localCheckpoint(eager=True)
    delta = (synth_pages(spark, 200)
             .join(crawl1.select("url"), "url", "left_anti")
             .localCheckpoint(eager=True))
    assert delta.count() == 50

    def drain():
        q = ingest_edges(
            stream_pages(spark, str(land), max_files_per_trigger=1),
            out_dir=str(tmp_path / "edges"),
            checkpoint_dir=str(tmp_path / "ckpt"))
        q.processAllAvailable()
        q.stop()

    def graph():
        e = compact_edges(spark, str(tmp_path / "edges")) \
            .select("src", "dst").localCheckpoint(eager=True)
        return build_graph(spark, e)

    crawl1.coalesce(1).write.mode("append").parquet(str(land))
    drain()
    # warm<=cold and the fixed-point identity hold at any damping; alpha
    # 0.6 / tol 1e-5 caps each of the three convergences at ~23 supersteps
    # (vs ~70 at the default 0.85) and TIGHTENS the stop-residual bound
    # alpha/(1-alpha)*tol from 5.7e-5 to 1.5e-5, well inside the 1e-3/n
    # comparison threshold below
    r1 = pagerank(graph(), alpha=0.6, tol=1e-5, max_iter=150)
    assert r1.converged

    delta.coalesce(1).write.mode("append").parquet(str(land))
    drain()  # same checkpoint dir: only the new file is processed
    g2 = graph()
    cold = pagerank(g2, alpha=0.6, tol=1e-5, max_iter=150)
    warm = pagerank(g2, alpha=0.6, tol=1e-5, max_iter=150, init_ranks=r1.ranks)
    assert cold.converged and warm.converged
    assert warm.iterations <= cold.iterations
    c = {r.id: r.rank for r in cold.ranks.collect()}
    w = {r.id: r.rank for r in warm.ranks.collect()}
    assert set(c) == set(w)
    n = len(c)
    for i, v in c.items():
        assert abs(v - w[i]) * n < 1e-3, i
