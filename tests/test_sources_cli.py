"""Reference-format sources (S1 edge list, S2 Matrix Market), the S3 text
sink, and the CLI entry point."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.pagerank import pagerank
from pagerank_spark.sources import synth
from pagerank_spark.sources.edgelist import (read_edge_list,
                                             read_matrix_market,
                                             write_ranks_text)


@pytest.fixture()
def g6_file(tmp_path):
    """G6 in the reference's S1 format: header 'n nnz', 1-indexed pairs."""
    lines = [f"6 {len(synth.G6_EDGES)}"]
    lines += [f"{s + 1} {d + 1}" for s, d in synth.G6_EDGES]
    p = tmp_path / "g6.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_edge_list_g6(spark, g6_file):
    edges, n = read_edge_list(spark, g6_file)
    assert n == 6
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == sorted(synth.G6_EDGES)


def test_read_edge_list_plan_is_jvm_only(spark, g6_file, tmp_path):
    """The loaders must never route the body through per-row Python (the
    old header-locating zipWithIndex pass): pin PythonRDD-free plans."""
    from pagerank_spark.plans.inspect import python_nodes

    edges, _ = read_edge_list(spark, g6_file)
    assert python_nodes(edges) == []
    content = "%%MatrixMarket matrix coordinate real general\n"
    content += "3 3 2\n1 2 0.5\n2 3 1.5\n"
    p = tmp_path / "w.mtx"
    p.write_text(content)
    medges, _ = read_matrix_market(spark, str(p), values=True)
    assert python_nodes(medges) == []


def test_read_matrix_market(spark, tmp_path):
    content = "%%MatrixMarket matrix coordinate pattern general\n% comment\n"
    content += f"6 6 {len(synth.G6_EDGES)}\n"
    content += "\n".join(f"{s + 1} {d + 1}" for s, d in synth.G6_EDGES) + "\n"
    p = tmp_path / "g6.mtx"
    p.write_text(content)
    edges, n = read_matrix_market(spark, str(p))
    assert n == 6
    assert sorted((r.src, r.dst) for r in edges.collect()) == sorted(synth.G6_EDGES)


def test_read_matrix_market_symmetric_expands(spark, tmp_path):
    """cusp parity: a `symmetric` banner stores each undirected edge once;
    the reader must expand off-diagonal entries both ways."""
    content = "%%MatrixMarket matrix coordinate pattern symmetric\n"
    content += "3 3 3\n1 2\n2 3\n2 2\n"
    p = tmp_path / "sym.mtx"
    p.write_text(content)
    edges, n = read_matrix_market(spark, str(p))
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == [(0, 1), (1, 0), (1, 1), (1, 2), (2, 1)]


def test_text_sink_multi_file_preserves_order(spark, tmp_path, g6_file):
    edges, n = read_edge_list(spark, g6_file)
    g = build_graph(spark, edges, n_vertices=n)
    res = pagerank(g, alpha=0.9, tol=1e-6, max_iter=300)
    out = tmp_path / "ranks_multi"
    write_ranks_text(res.reference_scale(), str(out), n_files=3)
    parts = sorted(out.glob("part-*"))
    assert len(parts) >= 2
    vals = [float(x) for p in parts for x in p.read_text().split()]
    np.testing.assert_allclose(np.array(vals) / 6.0, synth.G6_RANKS_A09, atol=1e-3)


def test_text_sink_reference_parity(spark, tmp_path, g6_file):
    """6-decimal, vertex-id order — the byte format of kernel_bblock.cu:1099."""
    edges, n = read_edge_list(spark, g6_file)
    g = build_graph(spark, edges, n_vertices=n)
    res = pagerank(g, alpha=0.9, tol=1e-6, max_iter=300)
    out = tmp_path / "ranks_out"
    write_ranks_text(res.reference_scale(), str(out))
    part = next(out.glob("part-*"))
    vals = [float(x) for x in part.read_text().strip().splitlines()]
    assert len(vals) == 6
    np.testing.assert_allclose(
        np.array(vals) / 6.0, synth.G6_RANKS_A09, atol=1e-3)


def test_cli_end_to_end(spark, tmp_path, g6_file):
    from pagerank_spark.cli import main
    out = tmp_path / "cli_out"
    rc = main([g6_file, str(out), "300", "--alpha", "0.9", "--tol", "1e-6"])
    assert rc == 0
    part = next(out.glob("part-*"))
    vals = [float(x) for x in part.read_text().strip().splitlines()]
    np.testing.assert_allclose(np.array(vals) / 6.0, synth.G6_RANKS_A09, atol=1e-3)


def test_cli_fixed_budget_and_parquet_output(spark, tmp_path, g6_file):
    from pagerank_spark.cli import main
    out = tmp_path / "cli_pq"
    rc = main([g6_file, str(out), "7", "--tol", "0",
               "--output-format", "parquet"])
    assert rc == 0
    got = {r.id: r.rank for r in spark.read.parquet(str(out)).collect()}
    assert len(got) == 6 and abs(sum(got.values()) - 6.0) < 1e-9


def test_read_matrix_market_explicit_weights_feed_p9(spark, tmp_path):
    """values=True parses the third column as edge weight and build_graph
    row-sum-normalizes it (P9, lightSpMV PageRank.h:256-274) — a weighted
    .mtx no longer silently degrades to 1/out_degree. Checked against a
    direct NumPy power iteration on the weighted transition matrix."""
    import numpy as np
    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank

    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 4\n"
        "1 2 3.0\n"
        "1 3 1.0\n"
        "2 3 2.0\n"
        "3 1 5.0\n")
    edges, n = read_matrix_market(spark, str(p), values=True)
    got_w = {(r.src, r.dst): r.w for r in edges.collect()}
    assert got_w == {(0, 1): 3.0, (0, 2): 1.0, (1, 2): 2.0, (2, 0): 5.0}

    g = build_graph(spark, edges, n_vertices=n)
    w = {(r.src, r.dst): r.w for r in g.edges.collect()}
    assert abs(w[(0, 1)] - 0.75) < 1e-15 and abs(w[(0, 2)] - 0.25) < 1e-15
    assert w[(1, 2)] == 1.0 and w[(2, 0)] == 1.0

    # fixed-budget trajectory comparison against the same 12-step NumPy
    # loop — identical modulo fp noise, no deep convergence needed
    res = pagerank(g, alpha=0.85, tol=None, max_iter=12)
    got = np.zeros(3)
    for r in res.ranks.collect():
        got[r.id] = r.rank
    P = np.array([[0, .75, .25], [0, 0, 1], [1, 0, 0]])
    r = np.full(3, 1 / 3)
    for _ in range(12):
        r = 0.85 * (P.T @ r) + 0.15 / 3
    np.testing.assert_allclose(got, r, atol=1e-9)


def test_read_matrix_market_symmetric_keeps_weights(spark, tmp_path):
    p = tmp_path / "sym.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "2 2 1\n"
        "1 2 4.5\n")
    edges, n = read_matrix_market(spark, str(p), values=True)
    got = {(r.src, r.dst): r.w for r in edges.collect()}
    assert got == {(0, 1): 4.5, (1, 0): 4.5}


def test_cli_mm_values_weighted_run(spark, tmp_path):
    """--format mm --mm-values drives the weighted P9 path end to end."""
    from pagerank_spark.cli import main
    mtx = tmp_path / "w.mtx"
    mtx.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 4\n"
        "1 2 3.0\n"
        "1 3 1.0\n"
        "2 3 2.0\n"
        "3 1 5.0\n")
    out = tmp_path / "cli_w"
    # fixed 12-superstep budget (tol<=0 -> reference fixed-budget loop)
    # compared against the same 12-step NumPy trajectory
    rc = main([str(mtx), str(out), "12", "--format", "mm", "--mm-values",
               "--tol", "0"])
    assert rc == 0
    part = next(out.glob("part-*"))
    vals = np.array([float(x) for x in part.read_text().strip().splitlines()])
    P = np.array([[0, .75, .25], [0, 0, 1], [1, 0, 0]])
    r = np.full(3, 1 / 3)
    for _ in range(12):
        r = 0.85 * (P.T @ r) + 0.15 / 3
    np.testing.assert_allclose(vals / 3.0, r, atol=1e-6)


@pytest.mark.parametrize("algo,extra,check_cols", [
    ("components", [], {"id", "component"}),
    ("labelprop", [], {"id", "label"}),
    ("triangles", [], {"id", "degree", "triangles", "lcc"}),
    ("hits", [], {"id", "hub", "authority"}),
    ("bfs", ["--source", "0,3"], {"id", "dist"}),
    ("kcore", ["--k", "2"], {"id", "core_deg"}),
    ("coreness", [], {"id", "core"}),
    ("scc", [], {"id", "scc"}),
    ("anf", [], {"t", "n_pairs"}),
    ("salsa", [], {"id", "hub", "authority"}),
    ("walks", ["--k", "2"], {"start_id", "walk", "step", "vertex"}),
    ("betweenness", ["--source", "0,2"], {"id", "bc"}),
    ("linkpred", ["--k", "3"], {"u", "v", "common", "jaccard", "adamic_adar"}),
    ("trustrank", ["--source", "0,5"], {"id", "rank"}),
    ("reciprocity", [], {"m_edges", "m_reciprocated", "reciprocity"}),
    ("covisit", ["--k", "2"], {"start_id", "vertex", "visits"}),
    ("sample", ["--source", "0,2", "--k", "2"], {"hop", "src", "dst"}),
    ("katz", [], {"id", "katz"}),
    ("eigenvector", [], {"id", "eig"}),
    ("sssp", ["--source", "0,3"], {"id", "dist"}),
    ("matching", [], {"a", "b", "round"}),
    ("coloring", [], {"id", "color", "round"}),
    ("partition", ["--k", "2"], {"id", "partition"}),
    ("pprpush", ["--source", "0"], {"id", "p", "r"}),
    ("sweepcut", ["--source", "0"],
     {"k", "id", "p", "d", "volume", "cut", "conductance"}),
    ("vertexcover", [], {"id"}),
    ("landmarks", ["--source", "0,2"], {"lm", "id", "dist"}),
])
def test_cli_algo_dispatch(spark, tmp_path, g6_file, algo, extra, check_cols):
    from pagerank_spark.cli import main
    out = tmp_path / f"cli_{algo}"
    rc = main([g6_file, str(out), "6", "--algo", algo, *extra])
    assert rc == 0
    df = spark.read.parquet(str(out))
    assert set(df.columns) == check_cols
    assert df.count() > 0


def test_cli_round3_algos_dispatch(spark, tmp_path, g6_file):
    """Round-3 CLI surface: each new --algo runs end to end and writes a
    non-degenerate parquet result."""
    from pagerank_spark.cli import main
    expect_min_rows = {"bowtie": 6, "closeness": 6, "ktruss": 0,
                       "cocitation": 1, "mcpagerank": 1, "node2vec": 6,
                       "seededlp": 6}
    for algo, min_rows in expect_min_rows.items():
        out = tmp_path / f"cli_{algo}"
        rc = main([g6_file, str(out), "6", "--algo", algo, "--k", "3"])
        assert rc == 0, algo
        assert spark.read.parquet(str(out)).count() >= min_rows, algo


def test_read_edge_list_multi_file_keeps_shard_first_rows(spark, tmp_path):
    """Multi-file input: only shard 0 carries the size header; the first
    DATA line of every other shard must survive (a naive per-file
    header=True silently ate one real edge per headerless shard)."""
    d = tmp_path / "sharded"
    d.mkdir()
    half = len(synth.G6_EDGES) // 2
    shard0 = [f"6 {len(synth.G6_EDGES)}"]
    shard0 += [f"{s + 1} {d_ + 1}" for s, d_ in synth.G6_EDGES[:half]]
    shard1 = [f"{s + 1} {d_ + 1}" for s, d_ in synth.G6_EDGES[half:]]
    (d / "part-00000.txt").write_text("\n".join(shard0) + "\n")
    (d / "part-00001.txt").write_text("\n".join(shard1) + "\n")
    edges, n = read_edge_list(spark, str(d))
    assert n == 6
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == sorted(synth.G6_EDGES)


def test_ppr_batch_degenerate_seed_sets_raise(spark):
    """A sid with no in-universe seeds (or zero teleport mass) must raise,
    not vanish from the output / emit NULL ranks."""
    import pytest as _pytest

    from pagerank_spark.operators.graph import build_graph as _bg
    from pagerank_spark.operators.ppr_batch import personalized_pagerank_batch

    edges = spark.createDataFrame(
        [(s, d) for s, d in synth.G6_EDGES], "src long, dst long")
    g = _bg(spark, edges)
    seeds = spark.createDataFrame(
        [(0, 0, 1.0), (1, 999, 1.0), (2, 1, 0.0)],
        "sid long, id long, p double")
    with _pytest.raises(ValueError, match=r"sids: \[1, 2\]"):
        personalized_pagerank_batch(g, seeds, iterations=1)
    ok = personalized_pagerank_batch(
        g, seeds.filter("sid = 0"), iterations=1)
    assert ok.filter("rank IS NULL").count() == 0


def test_cli_weighted_labelprop_and_walks(spark, tmp_path):
    """--weight-col flows a valued Matrix Market's w column into the
    weighted labelprop and weight-biased walks dispatches."""
    from pagerank_spark.cli import main
    mtx = tmp_path / "wlp.mtx"
    mtx.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "4 4 4\n"
        "1 3 1.0\n"
        "2 3 5.0\n"
        "3 4 2.0\n"
        "4 1 1.0\n")
    out = tmp_path / "cli_wlp"
    rc = main([str(mtx), str(out), "1", "--format", "mm", "--mm-values",
               "--algo", "labelprop", "--weight-col", "w"])
    assert rc == 0
    got = {r.id: r.label for r in spark.read.parquet(str(out)).collect()}
    # vertex 2 (0-based) sees label 0 w=1 vs label 1 w=5 -> weight wins
    assert got[2] == 1

    out2 = tmp_path / "cli_wwalks"
    rc = main([str(mtx), str(out2), "3", "--format", "mm", "--mm-values",
               "--algo", "walks", "--k", "2", "--weight-col", "w"])
    assert rc == 0
    df = spark.read.parquet(str(out2))
    assert set(df.columns) == {"start_id", "walk", "step", "vertex"}
    assert df.count() > 0
