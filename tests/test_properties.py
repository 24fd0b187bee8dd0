"""Property tests (SURVEY §5): vertex-id permutation invariance, mass
conservation, and component-partition consistency on hypothesis-generated
graphs. Example counts are small — every example spins Spark jobs."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, seed, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.graph import build_graph
from pagerank_spark.operators.pagerank import pagerank

N = 12
EDGE = st.tuples(st.integers(0, N - 1), st.integers(0, N - 1))
GRAPH = st.lists(EDGE, min_size=1, max_size=30)
PROP = settings(max_examples=3, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _ranks(spark, edges, n):
    # fixed-superstep run: permutation invariance and mass conservation
    # hold at EVERY superstep, so converging to 1e-10 (~50+ Spark jobs per
    # example) buys nothing over 12 fixed ones — this test's wall time is
    # the whole suite's outlier otherwise
    g = build_graph(
        spark, spark.createDataFrame(edges, "src long, dst long"), n_vertices=n)
    res = pagerank(g, tol=None, max_iter=9)
    out = np.zeros(n)
    for r in res.ranks.collect():
        out[r.id] = r.rank
    return out


@seed(42)
@PROP
@given(edges=GRAPH, perm_seed=st.integers(0, 2**31))
def test_pagerank_permutation_invariance(spark, edges, perm_seed):
    """Relabeling vertices permutes the ranks and changes nothing else —
    the engine must not depend on id order, partition placement, or the
    sort order of the edge list."""
    rng = np.random.default_rng(perm_seed)
    pi = rng.permutation(N)
    base = _ranks(spark, edges, N)
    permuted = _ranks(spark, [(int(pi[s]), int(pi[d])) for s, d in edges], N)
    np.testing.assert_allclose(permuted[pi], base, atol=1e-9)
    assert abs(base.sum() - 1.0) < 1e-9  # mass conservation, any graph


@seed(43)
@PROP
@given(edges=GRAPH, perm_seed=st.integers(0, 2**31))
def test_components_partition_invariance(spark, edges, perm_seed):
    """The component PARTITION (which vertices group together) is
    permutation-invariant even though representative labels change."""
    rng = np.random.default_rng(perm_seed)
    pi = rng.permutation(N)

    def parts(es):
        df = spark.createDataFrame(es, "src long, dst long")
        labels = connected_components(
            df, universe=spark.range(N).select("id")).labels
        lab = {r.id: r.component for r in labels.collect()}
        groups: dict[int, frozenset] = {}
        for v, c in lab.items():
            groups.setdefault(c, set()).add(v)  # type: ignore[arg-type]
        return {frozenset(g) for g in groups.values()}

    base = parts(edges)
    permuted = parts([(int(pi[s]), int(pi[d])) for s, d in edges])
    mapped = {frozenset(int(pi[v]) for v in grp) for grp in base}
    assert mapped == permuted


@seed(44)
@PROP
@given(edges=GRAPH, perm_seed=st.integers(0, 2**31))
def test_kcore_permutation_invariance(spark, edges, perm_seed):
    """Relabeling vertices permutes the k-core membership and in-core
    degrees — peeling must not depend on id order or partitioning."""
    from pagerank_spark.operators.kcore import k_core
    rng = np.random.default_rng(perm_seed)
    perm = rng.permutation(N)
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {r.id: r.core_deg for r in k_core(df, k=2).vertices.collect()}
    pedges = [(int(perm[s]), int(perm[d])) for s, d in edges]
    pdf = spark.createDataFrame(pedges, "src long, dst long")
    permuted = {r.id: r.core_deg for r in k_core(pdf, k=2).vertices.collect()}
    assert permuted == {int(perm[i]): c for i, c in base.items()}


@seed(45)
@PROP
@given(edges=GRAPH, perm_seed=st.integers(0, 2**31))
def test_hits_permutation_invariance(spark, edges, perm_seed):
    """Relabeling vertices permutes hub/authority scores exactly."""
    from pagerank_spark.operators.hits import hits
    rng = np.random.default_rng(perm_seed)
    perm = rng.permutation(N)
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {r.id: (r.hub, r.authority)
            for r in hits(df, universe=spark.range(N), iterations=2).scores.collect()}
    pedges = [(int(perm[s]), int(perm[d])) for s, d in edges]
    pdf = spark.createDataFrame(pedges, "src long, dst long")
    permuted = {r.id: (r.hub, r.authority)
                for r in hits(pdf, universe=spark.range(N), iterations=2).scores.collect()}
    for i in range(N):
        got = permuted[int(perm[i])]
        assert abs(got[0] - base[i][0]) < 1e-12
        assert abs(got[1] - base[i][1]) < 1e-12


@seed(46)
@PROP
@given(edges=GRAPH, walk_seed=st.integers(0, 2**20))
def test_random_walks_match_python_on_arbitrary_graphs(spark, edges, walk_seed):
    """The walk corpus equals the Python oracle on hypothesis graphs —
    duplicates, self-loops, dangling tails, any seed."""
    from pagerank_spark.operators.walks import random_walks
    from tests.test_walks import walks_oracle
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.start_id, r.walk, r.step, r.vertex)
           for r in random_walks(e, walk_length=4, walks_per_vertex=2,
                                 seed=walk_seed).collect()}
    assert got == walks_oracle(edges, 4, 2, walk_seed)


@seed(47)
@PROP
@given(edges=GRAPH, samp_seed=st.integers(0, 2**20))
def test_neighbor_sampling_matches_python_on_arbitrary_graphs(spark, edges,
                                                              samp_seed):
    from pagerank_spark.operators.sampling import sample_neighbors
    from tests.test_sampling import sampling_oracle
    seeds = sorted({s for s, _ in edges})[:3]
    e = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {(r.hop, r.src, r.dst)
           for r in sample_neighbors(e, sdf, [2, 2], seed=samp_seed).collect()}
    assert got == sampling_oracle(edges, seeds, [2, 2], samp_seed)


@seed(42)
@PROP
@given(edges=GRAPH)
def test_distance_oracle_upper_bound_property(spark, edges):
    """est(u,v) >= d(u,v) on arbitrary graphs (triangle inequality), for
    every pair the oracle answers."""
    from pagerank_spark.operators.bfs import (bfs_hops,
                                              distance_oracle_estimate,
                                              landmark_bfs)
    e = spark.createDataFrame(edges, "src long, dst long")
    fwd = landmark_bfs(e, [0, 1], max_hops=N).distances
    rev = e.selectExpr("dst AS src", "src AS dst")
    bwd = landmark_bfs(rev, [0, 1], max_hops=N).distances
    pairs = spark.createDataFrame(
        [(u, v) for u in range(4) for v in range(4) if u != v],
        "u long, v long")
    est = {(r.u, r.v): r.est
           for r in distance_oracle_estimate(fwd, pairs, to_lm=bwd).collect()}
    for u in range(4):
        truth = {r.id: r.dist
                 for r in bfs_hops(e, [u], max_hops=2 * N).distances.collect()}
        for v in range(4):
            if (u, v) in est:
                assert v in truth and est[(u, v)] >= truth[v], (u, v)


@seed(42)
@PROP
@given(edges=GRAPH)
def test_vertex_cover_property(spark, edges):
    """The cover covers every non-loop edge and is exactly the matched
    endpoints (duplicate-free, 2x matching size)."""
    from pagerank_spark.operators.matching import (maximal_matching,
                                                   vertex_cover)
    e = spark.createDataFrame(edges, "src long, dst long")
    cover = [r.id for r in vertex_cover(e).vertices.collect()]
    assert len(cover) == len(set(cover))
    assert len(cover) == 2 * maximal_matching(e).edges.count()
    cset = set(cover)
    for a, b in edges:
        if a != b:
            assert a in cset or b in cset, (a, b)


@seed(42)
@PROP
@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=12),
                      min_size=1, max_size=8))
def test_kn_perplexity_at_least_one(spark, texts):
    """Every probability is <= 1, so per-doc entropy >= 0 and ppl >= 1
    for any doc with bigrams (0.0 sentinel otherwise) — on arbitrary
    corpora, self-trained."""
    from pagerank_spark.operators.textops import kn_perplexity
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    for r in kn_perplexity(docs).collect():
        if r.n_bigrams:
            assert r.ppl >= 1.0, (r.doc_id, r.ppl)
        else:
            assert r.ppl == 0.0


@seed(42)
@PROP
@given(sizes=st.lists(st.integers(1, 40), min_size=1, max_size=6),
       budget=st.floats(1.0, 500.0),
       epochs=st.floats(0.25, 4.0))
def test_unimax_budget_identity(spark, sizes, budget, epochs):
    """Sum of allocations = min(budget, epochs * total); every stratum
    respects the epoch cap."""
    from pagerank_spark.operators.splits import unimax_budgets
    rows = [(f"s{i}-{j}", f"s{i}") for i, n in enumerate(sizes)
            for j in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    alloc = unimax_budgets(df, "lang", budget=budget,
                           max_epochs=epochs).collect()
    total = sum(r.budget_s for r in alloc)
    want = min(budget, epochs * sum(sizes))
    assert abs(total - want) < 1e-4, (total, want)
    for r in alloc:
        assert r.epochs_s <= epochs + 1e-9
