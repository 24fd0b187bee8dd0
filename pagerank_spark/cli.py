"""spark-submit entry point mirroring the reference's argv contract.

Reference: ``./pagerank <input> <output> <max_iteration>``
(/root/reference/kernel_bblock.cu:1178-1191, defaults web-Stanford.txt /
out.txt / 40). This CLI keeps that positional shape and adds the engine's
knobs. Run with::

    spark-submit --py-files pagerank_spark.zip -m pagerank_spark.cli \
        input.txt out_dir 40 --alpha 0.85 --tol 1e-6 \
        --checkpoint-dir /ckpt --resume

Input formats (--format): ``edgelist`` (reference S1 text), ``mm``
(Matrix Market), ``parquet`` (an (src,dst) edge table), ``pages`` (a
Common-Crawl-style pages table -> UDF outlink extraction). Output is the
reference's Σ=n scale (kernel_* binaries init rank=1.0 so their ranks sum
to n; nvgraph writes pr*n, nvgraph_Pagerank.cpp:321).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pagerank_spark")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("max_iteration", nargs="?", type=int, default=40)
    p.add_argument("--format", choices=["edgelist", "mm", "parquet", "pages"],
                   default="edgelist")
    p.add_argument("--mm-values", action="store_true",
                   help="parse the Matrix Market third column as edge "
                        "weights (P9 row-sum normalization, "
                        "lightSpMV/PageRank.h:256-274) instead of pattern "
                        "semantics")
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6,
                   help="total-L1 early exit; <=0 runs the fixed budget "
                        "like the reference loop (kernel_bblock.cu:949)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output-format", choices=["text", "parquet"], default="text")
    p.add_argument("--join-strategy", choices=["auto", "broadcast", "merge"],
                   default="auto")
    p.add_argument("--cpus", type=int, default=None,
                   help="local-mode threads; ignored under spark-submit "
                        "with an explicit master")
    p.add_argument("--algo",
                   choices=["pagerank", "components", "labelprop", "triangles",
                            "hits", "bfs", "kcore", "coreness", "scc", "anf",
                            "salsa", "walks", "betweenness", "linkpred",
                            "trustrank", "reciprocity", "covisit", "sample",
                            "bowtie", "closeness", "ktruss", "cocitation",
                            "mcpagerank", "node2vec", "seededlp", "katz",
                            "redirects", "eigenvector", "sssp", "mis", "mst",
                            "densest", "matching", "coloring", "partition",
                            "pprpush", "sweepcut", "vertexcover",
                            "landmarks"],
                   default="pagerank",
                   help="algorithm to run over the loaded edge table; "
                        "max_iteration caps rounds/iterations/hops for the "
                        "iterative ones; non-pagerank results are written "
                        "as parquet")
    p.add_argument("--source", default="0",
                   help="comma-separated vertex ids: BFS/betweenness sources, "
                        "trustrank seeds, sampling seeds")
    p.add_argument("--k", type=int, default=2,
                   help="per-algo knob: kcore degree threshold, walks per "
                        "vertex (walks), top-k (linkpred/covisit), per-hop "
                        "fan-out (sample)")
    p.add_argument("--p", dest="n2v_p", type=float, default=1.0,
                   help="node2vec return parameter (--algo node2vec)")
    p.add_argument("--q", dest="n2v_q", type=float, default=1.0,
                   help="node2vec in-out parameter (--algo node2vec)")
    p.add_argument("--weight-col", default=None,
                   help="edge weight column (e.g. 'w' from a valued Matrix "
                        "Market or parquet input): labelprop propagates by "
                        "total incident weight; walks pick neighbors "
                        "weight-proportionally (integer weights)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pagerank_spark.operators.graph import build_graph, graph_from_pages
    from pagerank_spark.operators.pagerank import pagerank
    from pagerank_spark.plans.checkpoint import SuperstepCheckpointer
    from pagerank_spark.session import get_spark
    from pagerank_spark.sources.edgelist import (read_edge_list,
                                                 read_matrix_market,
                                                 write_ranks_parquet,
                                                 write_ranks_text)

    spark = get_spark("pagerank_cli", cpus=args.cpus)

    raw_edges = None   # pre-normalization table; carries --weight-col
    if args.format == "edgelist":
        edges, n = read_edge_list(spark, args.input)
        raw_edges = edges
        graph = build_graph(spark, edges, n_vertices=n)
    elif args.format == "mm":
        edges, n = read_matrix_market(spark, args.input, values=args.mm_values)
        raw_edges = edges
        graph = build_graph(spark, edges, n_vertices=n)
    elif args.format == "parquet":
        raw_edges = spark.read.parquet(args.input)
        graph = build_graph(spark, raw_edges)
    else:
        graph = graph_from_pages(spark, spark.read.parquet(args.input))

    if args.algo != "pagerank":
        return _run_algo(spark, graph, args, raw_edges)

    ckpt = SuperstepCheckpointer(spark, args.checkpoint_dir)
    res = pagerank(
        graph,
        alpha=args.alpha,
        tol=args.tol if args.tol > 0 else None,
        max_iter=args.max_iteration,
        checkpointer=ckpt,
        resume=args.resume,
        join_strategy=args.join_strategy,
    )
    ranks_n = res.reference_scale()
    if args.output_format == "text":
        write_ranks_text(ranks_n, args.output)
    else:
        write_ranks_parquet(ranks_n, args.output)

    print(f"iterations={res.iterations} converged={res.converged} "
          f"l1={res.l1_diff:.3e} edges={graph.n_edges} vertices={graph.n_vertices}")
    return 0


def _run_algo(spark, graph, args, raw_edges=None) -> int:
    """Dispatch the non-PageRank algorithms; result table written as parquet."""
    edges = graph.edges.select("src", "dst")
    if args.weight_col:
        # --weight-col reads the RAW input weights (graph.edges carries the
        # P9 row-NORMALIZED w, which is neither the link weight labelprop
        # wants nor the integer weight walks require)
        if raw_edges is None or args.weight_col not in raw_edges.columns:
            raise SystemExit(
                f"--weight-col {args.weight_col!r} not present in this "
                f"input (valued Matrix Market or parquet edge table needed)")
        edges = raw_edges.select("src", "dst", args.weight_col)
    universe = graph.vertices.select("id")
    if args.algo == "components":
        from pagerank_spark.operators.components import connected_components
        res = connected_components(edges, universe=universe,
                                   max_rounds=args.max_iteration)
        out, tail = res.labels, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "labelprop":
        if args.weight_col:
            from pagerank_spark.operators.labelprop import \
                weighted_label_propagation
            res = weighted_label_propagation(
                edges, universe=universe, max_rounds=args.max_iteration,
                weight_col=args.weight_col)
        else:
            from pagerank_spark.operators.labelprop import label_propagation
            res = label_propagation(edges, universe=universe,
                                    max_rounds=args.max_iteration)
        out, tail = res.labels, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "triangles":
        from pagerank_spark.operators.triangles import local_clustering_coefficient
        out, tail = local_clustering_coefficient(edges), ""
    elif args.algo == "hits":
        from pagerank_spark.operators.hits import hits
        res = hits(edges, universe=universe, iterations=args.max_iteration)
        out, tail = res.scores, f"iterations={res.iterations}"
    elif args.algo == "bfs":
        from pagerank_spark.operators.bfs import bfs_hops
        sources = [int(s) for s in args.source.split(",")]
        res = bfs_hops(edges, sources, max_hops=args.max_iteration)
        out, tail = res.distances, f"rounds={res.rounds} exhausted={res.exhausted}"
    elif args.algo == "coreness":
        from pagerank_spark.operators.coreness import coreness
        res = coreness(edges, max_rounds=args.max_iteration)
        out, tail = res.cores, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "scc":
        from pagerank_spark.operators.scc import strongly_connected_components
        res = strongly_connected_components(edges, universe=universe,
                                            max_rounds=args.max_iteration)
        out, tail = res.labels, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "mis":
        from pagerank_spark.operators.mis import maximal_independent_set
        res = maximal_independent_set(edges, universe=universe,
                                      max_rounds=args.max_iteration)
        out, tail = res.members, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "mst":
        from pagerank_spark.operators.mst import minimum_spanning_forest
        res = minimum_spanning_forest(edges, weight_col=args.weight_col,
                                      max_rounds=args.max_iteration)
        out, tail = res.edges, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "densest":
        from pagerank_spark.operators.densest import densest_subgraph
        res = densest_subgraph(edges, max_rounds=args.max_iteration)
        out = res.best_vertices
        tail = (f"rounds={res.rounds} best_round={res.best_round} "
                f"best_density={res.best_density:.3f}")
    elif args.algo == "matching":
        from pagerank_spark.operators.matching import maximal_matching
        res = maximal_matching(edges, max_rounds=args.max_iteration)
        out, tail = res.edges, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "coloring":
        from pagerank_spark.operators.coloring import greedy_coloring
        res = greedy_coloring(edges, max_rounds=args.max_iteration,
                              universe=universe)
        out = res.colors
        tail = (f"rounds={res.rounds} n_colors={res.n_colors} "
                f"converged={res.converged}")
    elif args.algo == "vertexcover":
        from pagerank_spark.operators.matching import vertex_cover
        res = vertex_cover(edges, max_rounds=args.max_iteration)
        out, tail = res.vertices, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "landmarks":
        from pagerank_spark.operators.bfs import landmark_bfs
        lms = [int(x) for x in args.source.split(",")]
        res = landmark_bfs(edges, lms, max_hops=args.max_iteration)
        out = res.distances
        tail = f"landmarks={len(lms)} rounds={res.rounds} exhausted={res.exhausted}"
    elif args.algo == "partition":
        from pagerank_spark.operators.partition import balanced_partition
        out = balanced_partition(edges, k=max(args.k, 2),
                                 rounds=args.max_iteration)
        tail = f"k={max(args.k, 2)} rounds={args.max_iteration}"
    elif args.algo == "pprpush":
        from pagerank_spark.operators.ppr_push import ppr_push
        res = ppr_push(graph, seed=int(args.source.split(",")[0]),
                       alpha=args.alpha, max_rounds=args.max_iteration)
        out, tail = res.scores, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "sweepcut":
        from pagerank_spark.operators.ppr_push import ppr_push
        from pagerank_spark.operators.sweepcut import sweep_cut
        res = ppr_push(graph, seed=int(args.source.split(",")[0]),
                       alpha=args.alpha, max_rounds=args.max_iteration)
        out = sweep_cut(graph, res.scores)
        tail = f"push_rounds={res.rounds} converged={res.converged}"
    elif args.algo == "anf":
        from pagerank_spark.operators.neighborhood import (
            distance_stats, neighborhood_function_hll)
        res = neighborhood_function_hll(edges, universe=universe,
                                        max_t=args.max_iteration)
        st = distance_stats(res.counts)
        out = res.nf
        tail = (f"rounds={res.rounds} converged={res.converged} "
                f"eff_diam={st['effective_diameter']:.2f} "
                f"mean_dist={st['mean_distance']:.2f}")
    elif args.algo == "salsa":
        from pagerank_spark.operators.hits import salsa
        res = salsa(edges, universe=universe, iterations=args.max_iteration)
        out, tail = res.scores, f"iterations={res.iterations}"
    elif args.algo == "walks":
        from pagerank_spark.operators.walks import random_walks
        out = random_walks(edges, walk_length=args.max_iteration,
                           walks_per_vertex=args.k,
                           weight_col=args.weight_col)
        tail = f"walk_length={args.max_iteration} walks_per_vertex={args.k}"
    elif args.algo == "betweenness":
        from pagerank_spark.operators.betweenness import betweenness
        sources = [int(s) for s in args.source.split(",")]
        res = betweenness(edges, max_depth=args.max_iteration,
                          sources=spark.createDataFrame(
                              [(s,) for s in sources], "id long"))
        out, tail = res.scores, f"depth={res.depth} sources={res.n_sources}"
    elif args.algo == "linkpred":
        from pagerank_spark.operators.linkpred import link_prediction_scores
        out, tail = link_prediction_scores(edges, top_k=args.k), f"top_k={args.k}"
    elif args.algo == "trustrank":
        from pagerank_spark.operators.trust import trustrank
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.source.split(",")], "id long")
        res = trustrank(graph, seeds, alpha=args.alpha, tol=args.tol,
                        max_iter=args.max_iteration)
        out, tail = res.ranks, f"iterations={res.iterations} converged={res.converged}"
    elif args.algo == "reciprocity":
        from pagerank_spark.operators.graphstats import reciprocity
        out, tail = reciprocity(edges), ""
    elif args.algo == "covisit":
        from pagerank_spark.operators.walks import covisit_similarity
        out = covisit_similarity(edges, walk_length=args.max_iteration,
                                 top_k=args.k)
        tail = f"walk_length={args.max_iteration} top_k={args.k}"
    elif args.algo == "sample":
        from pagerank_spark.operators.sampling import sample_neighbors
        seeds = spark.createDataFrame(
            [(int(s),) for s in args.source.split(",")], "id long")
        fanouts = [args.k] * args.max_iteration
        out = sample_neighbors(edges, seeds, fanouts)
        tail = f"hops={args.max_iteration} fanout={args.k}"
    elif args.algo == "bowtie":
        from pagerank_spark.operators.bowtie import bowtie_decomposition
        res = bowtie_decomposition(edges, universe=universe,
                                   max_hops=args.max_iteration)
        out = res.regions
        tail = (f"core_label={res.core_label} core_size={res.core_size} "
                f"converged={res.converged}")
    elif args.algo == "closeness":
        from pagerank_spark.operators.neighborhood import closeness_centrality_exact
        res = closeness_centrality_exact(edges, max_t=args.max_iteration,
                                         universe=universe)
        out, tail = res.scores, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "ktruss":
        from pagerank_spark.operators.truss import k_truss
        res = k_truss(edges, k=args.k, max_rounds=args.max_iteration)
        out, tail = res.edges, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "cocitation":
        from pagerank_spark.operators.cocitation import cocitation_topk
        out, tail = cocitation_topk(edges, top_k=args.k), f"top_k={args.k}"
    elif args.algo == "node2vec":
        from pagerank_spark.operators.walks import node2vec_walks
        out = node2vec_walks(edges, walk_length=args.max_iteration,
                             walks_per_vertex=args.k,
                             p=args.n2v_p, q=args.n2v_q)
        tail = (f"walk_length={args.max_iteration} walks_per_vertex={args.k} "
                f"p={args.n2v_p} q={args.n2v_q}")
    elif args.algo == "seededlp":
        from pagerank_spark.operators.labelprop import seeded_label_propagation
        seeds = spark.createDataFrame(
            [(int(s), i) for i, s in enumerate(args.source.split(","))],
            "id long, label long")
        res = seeded_label_propagation(edges, seeds, universe=universe,
                                       max_rounds=args.max_iteration)
        out, tail = res.labels, f"rounds={res.rounds} converged={res.converged}"
    elif args.algo == "katz":
        from pagerank_spark.operators.katz import katz_centrality
        res = katz_centrality(edges, alpha=min(args.alpha, 0.99), beta=1.0,
                              max_iter=args.max_iteration,
                              tol=args.tol if args.tol > 0 else None,
                              universe=universe, weight_col=args.weight_col)
        out, tail = res.scores, (f"iterations={res.iterations} "
                                 f"converged={res.converged}")
    elif args.algo == "redirects":
        from pagerank_spark.operators.redirects import resolve_redirects
        # the (src, dst) input IS the redirect map here
        res = resolve_redirects(edges, max_hops=args.max_iteration)
        out, tail = res.targets, f"rounds={res.rounds}"
    elif args.algo == "eigenvector":
        from pagerank_spark.operators.eigenvector import eigenvector_centrality
        res = eigenvector_centrality(edges, iterations=args.max_iteration,
                                     universe=universe,
                                     weight_col=args.weight_col)
        out, tail = res.scores, f"iterations={res.iterations}"
    elif args.algo == "sssp":
        from pagerank_spark.operators.sssp import shortest_paths
        srcs = [int(s) for s in (args.source or "0").split(",")]
        res = shortest_paths(edges, srcs, weight_col=args.weight_col,
                             max_rounds=args.max_iteration)
        out, tail = res.distances, (f"rounds={res.rounds} "
                                    f"converged={res.converged}")
    elif args.algo == "mcpagerank":
        from pagerank_spark.operators.walks import pagerank_monte_carlo
        out = pagerank_monte_carlo(edges, alpha=args.alpha,
                                   walks_per_vertex=args.k,
                                   max_length=args.max_iteration)
        tail = f"walks_per_vertex={args.k} max_length={args.max_iteration}"
    else:  # kcore
        from pagerank_spark.operators.kcore import k_core
        res = k_core(edges, k=args.k, max_rounds=args.max_iteration)
        out, tail = res.vertices, f"rounds={res.rounds} converged={res.converged}"
    out.write.mode("overwrite").parquet(args.output)
    print(f"algo={args.algo} rows={spark.read.parquet(args.output).count()} "
          f"edges={graph.n_edges} vertices={graph.n_vertices} {tail}".rstrip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
