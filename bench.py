#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (< ~700 bytes — the driver's tail window is
bounded and clips the line's head past ~2 kB; rounds 3-4 lost the parse
to per-query dicts on stdout):
  {"metric": ..., "value": <best suite wall sec>, "unit": "sec",
   "queries": {summary only}, "sf": ..., "cpus": ...,
   "pagerank": {edges_per_sec_per_iter, iterations, n_edges, ...},
   "raw_reps_file": "BENCH/bench_lastrun_raw.json"}
Per-query bests, raw reps, and the sf-suite pagerank stats all ship in
raw_reps_file.

The headline number the baseline cares about (BASELINE.json `metric`) is
PageRank edges/sec per iteration — reported under "pagerank", measured on
the SCALED graph (default 128x lineitem expansion = 76.8M edges, the same
construction as tools/scale_worker.py) where operator throughput, not
session/codegen fixed overhead, dominates. The sf0.1 breadth suite runs
unchanged and its per-query times go to the raw file. The bench link
graph uses a 2^20 id space (sparser and more scale-shaped than the sf0.01
correctness graph, which needs a small id space for its DuckDB recursive
oracles).

Execution is forced with the `noop` sink: full computation, no driver
collect, no disk write — isolates engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_MOD = 1 << 20


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, sf_dir: str, cpus: int) -> tuple[dict, dict]:
    """One full pass over the suite; returns (timings, pagerank stats)."""
    from pyspark.sql import functions as F

    from pagerank_spark.operators.components import connected_components
    from pagerank_spark.operators.dedup import (near_duplicates_minhash,
                                                simhash_near_duplicates)
    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.labelprop import label_propagation
    from pagerank_spark.operators.pagerank import pagerank
    from pagerank_spark.operators.similarity import cosine_topk
    from pagerank_spark.operators.textops import analyze_documents
    from pagerank_spark.operators.triangles import triangle_count
    import __spark_entry__ as entry

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_partkey") % BENCH_MOD).alias("src"),
                      (F.col("l_orderkey") % BENCH_MOD).alias("dst"))

    # -- graph build (scan + degrees + weights + partition-by-src layout)
    g = timed("graph_build", lambda: build_graph(spark, edges))

    # -- headline: PageRank to 1e-6 L1 convergence
    t0 = time.monotonic()
    res = pagerank(g, alpha=0.85, tol=1e-6, max_iter=60)
    noop(res.ranks)
    pr_s = time.monotonic() - t0
    timings["pagerank_converged"] = round(pr_s, 3)
    pr_stats = {
        "edges_per_sec_per_iter": round(g.n_edges * res.iterations / pr_s, 1),
        "iterations": res.iterations,
        "converged": res.converged,
        "n_edges": g.n_edges,
        "n_vertices": g.n_vertices,
    }

    # -- graph algorithms
    timed("connected_components", lambda: noop(connected_components(edges).labels))
    timed("label_propagation_3r",
          lambda: noop(label_propagation(edges, max_rounds=3).labels))
    from pagerank_spark.operators.labelprop import weighted_label_propagation
    wedges = edges.select(
        "src", "dst", (F.lit(1) + (F.col("src") * 7 + F.col("dst")) % 5).alias("w"))
    timed("weighted_labelprop_3r",
          lambda: noop(weighted_label_propagation(wedges, max_rounds=3).labels))
    timed("triangle_count", lambda: triangle_count(edges))
    from pagerank_spark.operators.bfs import bfs_hops
    from pagerank_spark.operators.hits import hits
    from pagerank_spark.operators.kcore import k_core
    timed("hits_3iter", lambda: noop(hits(edges, iterations=3).scores))
    from pagerank_spark.operators.katz import katz_centrality
    timed("katz_3iter",
          lambda: noop(katz_centrality(edges, alpha=0.1, max_iter=3).scores))
    from pagerank_spark.operators.eigenvector import eigenvector_centrality
    timed("eigenvector_3iter",
          lambda: noop(eigenvector_centrality(edges, iterations=3).scores))
    from pagerank_spark.operators.redirects import resolve_redirects
    redir = g.vertices.filter(F.col("id") % 8 != 0).select(
        "id", F.expr("CASE WHEN id % 8 BETWEEN 1 AND 5 THEN id - 1 "
                     "WHEN id % 8 = 6 THEN id + 1 ELSE id - 1 END").alias("ptr"))
    timed("resolve_redirects",
          lambda: noop(resolve_redirects(redir, max_hops=8, src_col="id",
                                         dst_col="ptr").targets))
    timed("bfs_hops", lambda: noop(bfs_hops(edges, [1], max_hops=8).distances))
    from pagerank_spark.operators.bfs import (distance_oracle_estimate,
                                              landmark_bfs)
    timed("landmark_bfs_4", lambda: noop(landmark_bfs(
        edges, [1, 2, 3, 4], max_hops=8).distances))

    def _dist_oracle():
        # both oracle tables from ONE shared fixpoint, answer a 32x32 grid
        from pagerank_spark.operators.bfs import landmark_tables
        fwd, bwd, _ = landmark_tables(edges, [1, 2, 3, 4], max_hops=8)
        pairs = spark.range(32).selectExpr("id AS u").crossJoin(
            spark.range(32, 64).selectExpr("id AS v"))
        noop(distance_oracle_estimate(fwd, pairs, to_lm=bwd))
    timed("distance_oracle_est", _dist_oracle)
    from pagerank_spark.operators.sssp import shortest_paths
    swedges = edges.select("src", "dst", F.expr(
        "CAST(1 + (src * 7 + dst * 3) % 5 AS DOUBLE)").alias("w"))
    timed("sssp_weighted",
          lambda: noop(shortest_paths(swedges, [1], max_rounds=12).distances))
    timed("k_core_5", lambda: noop(k_core(edges, k=5, max_rounds=8).vertices))
    from pagerank_spark.operators.coreness import coreness
    from pagerank_spark.operators.scc import strongly_connected_components
    timed("coreness_8r", lambda: noop(coreness(edges, max_rounds=8).cores))
    timed("scc", lambda: noop(strongly_connected_components(edges).labels))
    from pagerank_spark.operators.mis import maximal_independent_set
    timed("mis", lambda: noop(maximal_independent_set(edges).members))
    from pagerank_spark.operators.mst import minimum_spanning_forest
    timed("msf", lambda: noop(minimum_spanning_forest(edges).edges))
    from pagerank_spark.operators.coloring import greedy_coloring
    # coloring gets a sparse web-like projection (the shared dense fixture
    # serializes ANY greedy colouring; see operators/coloring.py). MOD
    # 65536 keeps avg degree ~18 at sf0.1 — 15 speculative rounds —
    # where the driver-oracle fixture's MOD 16384 would hit 27 at this sf
    cedges = li.select((F.col("l_partkey") % 65536).alias("src"),
                       (F.col("l_orderkey") % 65536).alias("dst"))
    timed("greedy_coloring",
          lambda: noop(greedy_coloring(cedges, max_rounds=120).colors))
    from pagerank_spark.operators.densest import densest_subgraph
    timed("densest_subgraph",
          lambda: noop(densest_subgraph(edges, epsilon=0.1).best_vertices))
    from pagerank_spark.operators.betweenness import betweenness
    from pagerank_spark.operators.contraction import contract_graph
    from pagerank_spark.operators.hits import salsa
    from pagerank_spark.operators.linkpred import link_prediction_scores
    from pagerank_spark.operators.trust import trustrank
    from pagerank_spark.operators.walks import random_walks
    timed("salsa_3iter", lambda: noop(salsa(edges, iterations=3).scores))
    timed("random_walks_4", lambda: noop(random_walks(edges, walk_length=4)))
    timed("weighted_walks_4", lambda: noop(random_walks(
        wedges, walk_length=4, weight_col="w")))
    from pagerank_spark.operators.walks import (node2vec_walks,
                                                pagerank_monte_carlo)
    timed("node2vec_walks_4",
          lambda: noop(node2vec_walks(edges, walk_length=4, p=4.0, q=0.25)))
    timed("pagerank_mc",
          lambda: noop(pagerank_monte_carlo(edges, walks_per_vertex=2,
                                            max_length=8)))
    timed("betweenness_8s",
          lambda: noop(betweenness(edges, k_sources=8, max_depth=4).scores))
    timed("link_prediction",
          lambda: noop(link_prediction_scores(edges, top_k=5, max_degree=64)))
    timed("trustrank_3iter", lambda: noop(trustrank(
        g, g.vertices.filter(F.col("id") < 16).select("id"),
        tol=None, max_iter=3).ranks))
    timed("graph_contraction", lambda: noop(contract_graph(
        edges, g.vertices.select("id", (F.col("id") % 4096).alias("gid")))))

    # -- round-3 structural ops
    from pagerank_spark.operators.cocitation import cocitation_topk
    from pagerank_spark.operators.community import modularity
    from pagerank_spark.operators.graphstats import (avg_neighbor_degree,
                                                     degree_distribution)
    from pagerank_spark.operators.neighborhood import closeness_centrality
    from pagerank_spark.operators.truss import edge_support, k_truss
    timed("edge_support", lambda: noop(edge_support(edges)))
    timed("k_truss_4", lambda: noop(k_truss(edges, k=4).edges))
    # the front door dispatches by projected pair-state volume; at bench
    # scale it picks the HyperANF sketch plan (O(V·2^b) state) — the same
    # plan a 10^12-edge run gets, so the measured plan IS the scale plan
    # (round-3 verdict item 1; the exact pair-table mode remains the
    # sf0.01 oracle path in __spark_entry__.py)
    timed("closeness_3h",
          lambda: noop(closeness_centrality(edges, max_t=3,
                                            mode="auto").scores))
    from pagerank_spark.operators.community import conductance as _cond
    timed("community_conductance", lambda: noop(_cond(
        edges, label_propagation(edges, max_rounds=3).labels)))
    timed("lpa_modularity", lambda: noop(modularity(
        edges, label_propagation(edges, max_rounds=3).labels)))
    from pagerank_spark.operators.labelprop import seeded_label_propagation
    timed("seeded_labelprop_3r", lambda: noop(seeded_label_propagation(
        edges, g.vertices.filter(F.col("id") < 64).select(
            "id", (F.col("id") % 4).alias("label")),
        max_rounds=3).labels))
    timed("cocitation_top25",
          lambda: noop(cocitation_topk(edges, top_k=25, max_degree=64)))
    from pagerank_spark.operators.bowtie import bowtie_decomposition
    timed("bowtie_8h",
          lambda: noop(bowtie_decomposition(edges, max_hops=8).regions))
    timed("avg_neighbor_degree", lambda: noop(avg_neighbor_degree(edges)))
    from pagerank_spark.operators.graphstats import (
        gamma_compression_estimate, powerlaw_tail_fit)
    timed("gamma_compression", lambda: noop(
        gamma_compression_estimate(edges)))
    timed("powerlaw_fit", lambda: noop(powerlaw_tail_fit(edges, dmin=5)))
    from pagerank_spark.operators.partition import balanced_partition
    timed("balanced_partition", lambda: noop(balanced_partition(
        edges, k=8, rounds=4)))
    from pagerank_spark.operators.graphstats import rich_club
    timed("rich_club", lambda: noop(rich_club(edges)))
    timed("degree_distribution", lambda: noop(degree_distribution(
        edges, universe=g.vertices.select("id"))))
    from pagerank_spark.operators.ppr_batch import personalized_pagerank_batch
    timed("ppr_batch_4x3iter", lambda: noop(personalized_pagerank_batch(
        g, g.vertices.filter(F.col("id") < 64).select(
            (F.col("id") % 4).alias("sid"), "id", F.lit(1.0).alias("p")),
        iterations=3)))
    from pagerank_spark.operators.ppr_push import ppr_push
    timed("ppr_push", lambda: noop(ppr_push(
        g, seed=1, eps=1e-5, max_rounds=20).scores))
    from pagerank_spark.operators.sweepcut import sweep_cut
    timed("ppr_sweep_cut", lambda: noop(sweep_cut(
        g, ppr_push(g, seed=1, eps=1e-5, max_rounds=20).scores)))
    from pagerank_spark.operators.diffusion import heat_kernel_pagerank
    timed("heat_kernel", lambda: noop(heat_kernel_pagerank(
        g, t=2.0, terms=8)))

    # -- webtext ingestion: pandas-UDF anchor extraction + aggregation
    from pagerank_spark.operators.anchors import anchor_text_index
    from pagerank_spark.sources.synth import synth_pages
    timed("anchor_text_index_100k",
          lambda: noop(anchor_text_index(synth_pages(spark, 100_000,
                                                     partitions=cpus * 2))))

    # -- relational suite (driver-contract queries at bench scale)
    timed("q1_pricing_summary", lambda: noop(entry.q_q1_pricing_summary(spark, sf_dir)))
    timed("q3_top_orders", lambda: noop(entry.q_q3_top_orders(spark, sf_dir)))
    timed("q5_region_revenue", lambda: noop(entry.q_q5_region_revenue(spark, sf_dir)))
    timed("window_top_orders", lambda: noop(entry.q_window_top_orders(spark, sf_dir)))
    timed("events_hourly_rollup", lambda: noop(entry.q_events_hourly_rollup(spark, sf_dir)))
    timed("events_sessionization",
          lambda: noop(entry.q_events_sessionization(spark, sf_dir)))
    timed("events_funnel", lambda: noop(entry.q_events_funnel(spark, sf_dir)))
    timed("events_asof_click",
          lambda: noop(entry.q_events_asof_click(spark, sf_dir)))
    timed("hll_distinct", lambda: noop(entry.q_hll_distinct(spark, sf_dir)))
    timed("events_cube", lambda: noop(entry.q_events_cube(spark, sf_dir)))

    # -- training-data pipeline
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("docs_text_profile", lambda: noop(analyze_documents(docs)))
    from pagerank_spark.operators.textops import pii_scrub, repetition_stats
    timed("pii_scrub", lambda: noop(pii_scrub(docs)))
    timed("docs_repetition", lambda: noop(repetition_stats(docs)))
    from pagerank_spark.operators.textops import kn_perplexity, lm_perplexity
    timed("lm_perplexity", lambda: noop(lm_perplexity(docs)))
    timed("kn_perplexity", lambda: noop(kn_perplexity(
        docs, target=docs.filter(F.col("doc_id") % 5 == 0))))
    from pagerank_spark.operators.textops import sb_perplexity
    timed("sb_perplexity", lambda: noop(sb_perplexity(
        docs, target=docs.filter(F.col("doc_id") % 3 == 0))))
    from pagerank_spark.operators.textops import pmi_collocations
    timed("pmi_collocations", lambda: noop(pmi_collocations(
        docs, min_count=3, k=200)))
    from pagerank_spark.operators.textops import textrank_keywords
    timed("textrank_keywords", lambda: noop(textrank_keywords(
        docs, k=150)))
    from pagerank_spark.operators.dedup import passage_dedup
    timed("passage_dedup", lambda: noop(passage_dedup(docs, w=20)))
    from pagerank_spark.operators.textops import corpus_filter
    timed("corpus_filter", lambda: noop(corpus_filter(docs, min_tokens=25)))
    from pagerank_spark.operators.dsir import dsir_select
    timed("dsir_select", lambda: noop(dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=100, n_buckets=1024)))
    from pagerank_spark.operators.dedup import host_boilerplate
    timed("host_boilerplate", lambda: noop(host_boilerplate(
        docs, host_col="source", w=20, min_pages=5, min_frac=0.05)))
    from pagerank_spark.operators.mirrors import mirror_hosts
    timed("mirror_hosts", lambda: noop(mirror_hosts(docs)))
    from pagerank_spark.operators.winnow import winnow_candidates
    timed("winnow_dedup", lambda: noop(winnow_candidates(docs)))
    from pagerank_spark.operators.ranking import bm25_topk
    timed("bm25_topk", lambda: noop(bm25_topk(
        docs, ["agg", "dup", "window"], k=25)))
    from pagerank_spark.operators.matching import maximal_matching
    timed("maximal_matching", lambda: noop(maximal_matching(edges).edges))
    from pagerank_spark.operators.matching import vertex_cover
    timed("vertex_cover", lambda: noop(vertex_cover(edges).vertices))
    from pagerank_spark.operators.simrank import simrank_mc
    sr_pairs = spark.range(8).selectExpr("id AS u").crossJoin(
        spark.range(8, 16).selectExpr("id AS v"))
    timed("simrank_mc", lambda: noop(simrank_mc(
        edges, sr_pairs, walk_length=4, walks=8)))
    from pagerank_spark.operators.semdedup import semantic_dedup
    timed("semantic_dedup", lambda: noop(semantic_dedup(emb, threshold=0.9)))
    from pagerank_spark.operators.bpe import bpe_encode, bpe_train
    bpe_holder = {}

    def _bpe_train():
        bpe_holder["res"] = bpe_train(docs, merges=10)
        noop(bpe_holder["res"].merges)
    timed("bpe_merges", _bpe_train)
    timed("bpe_encode", lambda: noop(bpe_encode(docs, bpe_holder["res"])))
    timed("dedup_minhash_lsh", lambda: noop(near_duplicates_minhash(docs, threshold=0.5)))
    timed("dedup_simhash", lambda: noop(simhash_near_duplicates(docs, max_hamming=3)))
    timed("similarity_topk",
          lambda: noop(cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)))
    from pagerank_spark.operators.similarity import ann_topk_ivf, ann_topk_lsh
    timed("similarity_ann_lsh",
          lambda: noop(ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 8), k=5)))
    timed("similarity_ann_ivf",
          lambda: noop(ann_topk_ivf(emb, emb.filter(F.col("vec_id") < 8), k=5)))
    from pagerank_spark.operators.similarity import ann_topk_ivfpq, ann_topk_pq
    timed("similarity_ann_pq",
          lambda: noop(ann_topk_pq(emb, emb.filter(F.col("vec_id") < 8), k=5)))
    from pagerank_spark.operators.similarity import (ivf_assignments,
                                                     ivf_train_centroids)

    def _clusters():
        C = ivf_train_centroids(emb, n_cells=16, lloyd_iters=1)
        noop(ivf_assignments(emb, C, nprobe=1))
    timed("embedding_clusters", _clusters)
    timed("similarity_ann_ivfpq",
          lambda: noop(ann_topk_ivfpq(emb, emb.filter(F.col("vec_id") < 8),
                                      k=5, nprobe=4)))
    from pagerank_spark.operators.splits import dataset_split
    from pagerank_spark.operators.textops import tfidf_top_terms
    timed("docs_dataset_split", lambda: noop(dataset_split(docs, "doc_id")))
    from pagerank_spark.operators.splits import (pack_sequences,
                                                 priority_sample,
                                                 stratified_sample)
    timed("pack_sequences", lambda: noop(pack_sequences(docs, buckets=8)))
    timed("priority_sample", lambda: noop(priority_sample(
        docs.select("doc_id", (F.col("n_chars") + 1).cast("double").alias("w")),
        "doc_id", "w", k=50)))
    from pagerank_spark.operators.sketch import (bloom_bits,
                                                 bloom_maybe_contains,
                                                 cms_heavy_hitters)
    events_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    timed("cms_heavy_hitters", lambda: noop(cms_heavy_hitters(
        events_df, "user_id", k=25, depth=4, width=64)))
    timed("bloom_frontier", lambda: noop(bloom_maybe_contains(
        docs.select("doc_id"),
        bloom_bits(docs.filter(F.col("doc_id") % 4 != 0).select("doc_id"),
                   "doc_id", m_bits=1 << 16, hashes=3),
        "doc_id", m_bits=1 << 16, hashes=3)))
    timed("stratified_sample", lambda: noop(stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "zh": 1.0}, default_rate=0.25)))
    from pagerank_spark.operators.splits import temperature_mix, unimax_budgets
    timed("temperature_mix", lambda: noop(temperature_mix(
        docs, "doc_id", "lang", tau=0.7)))
    timed("unimax_budgets", lambda: noop(unimax_budgets(
        docs, "lang", budget=1_200_000.0, max_epochs=1.0,
        weight_col="n_chars")))
    # containment in its production shape: LSH candidates, not the
    # exhaustive shared-shingle join the sf0.01 oracle uses
    from pagerank_spark.operators.dedup import (exact_containment,
                                                lsh_candidate_pairs,
                                                minhash_signatures, shingles)

    def _containment():
        sh = shingles(docs)
        cands = lsh_candidate_pairs(minhash_signatures(sh, k=64))
        noop(exact_containment(sh, cands))
    timed("dedup_containment", _containment)
    from pagerank_spark.operators.frontier import (frontier_schedule,
                                                   url_patterns)
    i = F.col("id")
    bench_frontier = spark.range(500_000).select(
        F.concat(F.lit("u"), F.lpad(i.cast("string"), 7, "0")).alias("url"),
        F.concat(F.lit("h"), (i % 997).cast("string")).alias("host"),
        ((i * F.lit(2654435761)) % F.lit(1_000_000)).alias("priority"))
    timed("frontier_schedule_500k", lambda: noop(frontier_schedule(
        bench_frontier, per_slot=2, max_per_host=400)))
    bench_urls = spark.range(500_000).select(F.concat(
        F.lit("http://site"), (i % 997).cast("string"), F.lit(".example.com"),
        F.when(i % 3 == 0, F.concat(F.lit("/blog/"), (i % 17).cast("string"),
                                    F.lit("/post-"), i.cast("string")))
         .when(i % 3 == 1, F.concat(F.lit("/p/"), i.cast("string")))
         .otherwise(F.concat(F.lit("/s/"),
                             F.substring(F.md5(i.cast("string")), 1, 12)))
    ).alias("url"))
    timed("url_patterns_500k", lambda: noop(url_patterns(bench_urls)))
    timed("docs_tfidf_top3", lambda: noop(tfidf_top_terms(docs, k=3)))
    from pagerank_spark.operators.decontam import decontaminate_split
    timed("decontaminate",
          lambda: noop(decontaminate_split(docs, ngram=3, min_shared=2,
                                           max_df=200)))
    from pagerank_spark.operators.dedup import (deduplicate_corpus,
                                                embedding_near_duplicates)
    timed("dedup_corpus",
          lambda: noop(deduplicate_corpus(docs, threshold=0.5)))
    # embedding-cosine near-dup over corpus + doubled twins (cosine ~1.0,
    # byte-different) — same planted shape as the dedup_embedding driver query
    twins = emb.filter(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")
                    ).alias("embedding"))
    ecorpus = emb.select("vec_id", "embedding").unionByName(twins)
    timed("dedup_embedding",
          lambda: noop(embedding_near_duplicates(ecorpus, threshold=0.9)))

    g.unpersist()  # release the cached graph before a possible next rep
    return timings, pr_stats


def run_scaled_headline(spark, sf_dir: str, cpus: int,
                        copies: int, iters: int) -> dict:
    """Headline PageRank on the deterministically expanded link graph
    (same construction as tools/scale_worker.py: coprime-stride copies of
    the lineitem-derived edge table, 76.8M edges at copies=128).

    The sf0.1 suite's 600k-edge PageRank measures session/codegen fixed
    overhead, not the operator (round-4 verdict item 4); throughput only
    dominates past ~10^7 edges, so THIS is the reported `pagerank` block.
    Plan pinned to the at-scale strategy: sort-merge rank join, 64 shuffle
    partitions — not the small-graph broadcast shortcut.
    """
    from pyspark.sql import functions as F

    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        edges = li.select(
            "l_partkey", "l_orderkey",
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k"),
        ).select(
            ((F.col("l_partkey") + F.col("k") * 131071) % BENCH_MOD).alias("src"),
            ((F.col("l_orderkey") + F.col("k") * 524287) % BENCH_MOD).alias("dst"),
        )
        g = build_graph(spark, edges)
        t0 = time.monotonic()
        res = pagerank(g, alpha=0.85, tol=None, max_iter=iters,
                       join_strategy="merge")
        noop(res.ranks)
        dt = time.monotonic() - t0
        # steady-state median superstep wall, skipping codegen/AQE warmup
        walls = sorted(m["wall_ms"] for m in res.metrics[2:]) or [dt * 1000 / iters]
        med_s = walls[len(walls) // 2] / 1000
        stats = {
            "edges_per_sec_per_iter": round(g.n_edges / med_s, 1),
            "iterations": res.iterations,
            "sec_total": round(dt, 2),
            "median_iter_sec": round(med_s, 3),
            "n_edges": g.n_edges,
            "n_vertices": g.n_vertices,
            "input": f"lineitem x{copies} coprime-stride expansion",
        }
        g.unpersist()
        return stats
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def main() -> None:
    from pagerank_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # host interference on this box spans 2-4x run-to-run (BENCH/BASELINE.md
    # documents a 10.3s/150.3s back-to-back pair for the SAME binary), so
    # the published per-query number is the best of SPARK_GRAFT_BENCH_REPS
    # full alternating suite passes; the raw reps ship alongside.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark("bench", cpus=cpus)
    all_timings, all_pr = [], []
    for _ in range(max(1, reps)):
        t, p = run_suite(spark, sf_dir, cpus)
        all_timings.append(t)
        all_pr.append(p)

    # headline pagerank on the SCALED graph (default 128x = 76.8M edges):
    # throughput there is dominated by the operator, not session overhead
    copies = int(os.environ.get("SPARK_GRAFT_HEADLINE_COPIES", "128"))
    h_iters = int(os.environ.get("SPARK_GRAFT_HEADLINE_ITERS", "8"))
    pr_scaled = run_scaled_headline(spark, sf_dir, cpus, copies, h_iters)

    best = {k: min(t[k] for t in all_timings) for k in all_timings[0]}
    # sf0.1-suite pagerank stats from the rep with the fastest converged run
    pr_suite = max(all_pr, key=lambda p: p["edges_per_sec_per_iter"])
    # suite value = the best FULL-SUITE total a single rep actually
    # achieved (min over reps of the rep's sum) — not the sum of per-query
    # minima, which is a composite no one run produced; that sum ships
    # in the raw file as sum_of_query_bests
    suite_walls = [round(sum(t.values()), 3) for t in all_timings]
    total = min(suite_walls)
    # EVERYTHING bulky goes to the raw file, NOT stdout: the driver parses
    # the final stdout line through a bounded tail window (~2 kB) that clips
    # the line's HEAD — rounds 3 and 4 both lost the machine-readable signal
    # to this, so the stdout line is now headline-only (< ~700 bytes)
    raw_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "bench_lastrun_raw.json")
    try:
        os.makedirs(os.path.dirname(raw_path), exist_ok=True)
        with open(raw_path, "w") as f:
            json.dump({"queries": best,
                       "sum_of_query_bests": round(sum(best.values()), 3),
                       "reps": all_timings, "suite_walls": suite_walls,
                       "pagerank_scaled": pr_scaled,
                       "pagerank_sf_suite": pr_suite,
                       "pagerank_sf_reps": all_pr,
                       "sf": sf, "cpus": cpus}, f, indent=1)
    except OSError:
        pass
    print(json.dumps({
        "metric": "pagerank edges/sec/iter (scaled graph); value = best "
                  f"sf{sf} full-suite wall over {len(all_timings)} reps",
        "value": total,
        "unit": "sec",
        "queries": {"suite_n_queries": len(best),
                    "pagerank_converged_sf": best.get("pagerank_converged"),
                    "full_detail_in": "BENCH/bench_lastrun_raw.json"},
        "sf": sf,
        "cpus": cpus,
        "pagerank": pr_scaled,
        "raw_reps_file": "BENCH/bench_lastrun_raw.json",
    }))


if __name__ == "__main__":
    main()
