"""Similarity search: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.similarity import ann_topk_lsh, cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk(emb, queries, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)

    for qid in by_q:
        qi = np.where(ids == qid)[0][0]
        sims = mat_n @ mat_n[qi]
        sims[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:5]
        want_ids = [int(ids[j]) for j in order]
        got_ids = [r.neighbor_id for r in by_q[qid]]
        assert got_ids == want_ids, (qid, got_ids, want_ids)
        for r, j in zip(by_q[qid], order):
            assert abs(r.cos - sims[j]) < 1e-9


def test_ann_lsh_recall(spark, emb):
    # this corpus's true top-5 neighbors are weak (cosine ~0.32), so the
    # hash must be coarse: 4 planes x 16 tables gives ~0.9 expected recall
    # (collision prob (1-theta/pi)^4 per table). On near-dup workloads
    # (cosine > 0.9) the default finer hash is the right trade.
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_topk_lsh(emb, queries, k=5, planes=4, tables=16).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, recall


def test_ann_schema_matches_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 2)
    a = cosine_topk(emb, queries, k=3)
    b = ann_topk_lsh(emb, queries, k=3)
    assert a.columns == b.columns == ["query_id", "neighbor_id", "cos", "rank"]


def test_buckets_high_dim_plan_size_independent(spark):
    """dim=512 with many tables/planes must not inflate the Catalyst plan:
    the pandas-UDF matmul keeps the projection O(1) in dim*planes*tables
    (the old per-plane literal expansion held ~55k expression nodes at
    dim=768). Also sanity-check bucket determinism and range."""
    from pagerank_spark.operators.similarity import hyperplane_buckets

    rng = np.random.default_rng(7)
    dim, n = 512, 40
    rows = [(i, rng.standard_normal(dim).astype(float).tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    b = hyperplane_buckets(df, "vec_id", "embedding", planes=12, tables=6)
    plan = b._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, f"plan unexpectedly large: {len(plan)} chars"

    got = b.collect()
    assert len(got) == n * 6
    assert all(0 <= r.bucket < (1 << 12) for r in got)
    # deterministic: recompute equals first run
    again = {(r.id, r.table): r.bucket for r in b.collect()}
    for r in got:
        assert again[(r.id, r.table)] == r.bucket

    # buckets agree with a direct NumPy evaluation of the same planes
    from pagerank_spark.operators.similarity import plane_matrix
    P = plane_matrix(dim, 12, 6, 42)
    M = np.array([v for _, v in rows])
    signs = (M @ P.T) >= 0
    want = signs.reshape(n, 6, 12) @ (1 << np.arange(12, dtype=np.int64))
    for r in got:
        assert r.bucket == int(want[r.id, r.table]), (r.id, r.table)


def test_ann_ivf_recall_and_determinism(spark, emb):
    from pagerank_spark.operators.similarity import ann_topk_ivf

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_topk_ivf(emb, queries, k=5, n_cells=16, nprobe=6).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, recall
    # candidate set is genuinely sub-linear: probing 6/16 cells must not
    # degenerate to scoring the whole corpus for every query
    again = {(r.query_id, r.neighbor_id, r.rank) for r in
             ann_topk_ivf(emb, queries, k=5, n_cells=16, nprobe=6).collect()}
    assert again == {(r.query_id, r.neighbor_id, r.rank) for r in approx}


def test_ivf_cells_partition_corpus(spark, emb):
    from pagerank_spark.operators.similarity import (ivf_assignments,
                                                     ivf_train_centroids)
    C = ivf_train_centroids(emb, n_cells=8)
    assert C.shape == (8, 64)
    cells = ivf_assignments(emb, C, nprobe=1).collect()
    n = emb.count()
    assert len(cells) == n                       # exactly one cell per vector
    assert all(0 <= r.cell < 8 for r in cells)
    sizes = {}
    for r in cells:
        sizes[r.cell] = sizes.get(r.cell, 0) + 1
    assert max(sizes.values()) < n               # not all in one cell


def _pq_ref(vectors, m, ksub, seeds_idx, lloyd_iters=1):
    """NumPy replica of pq_train: normalized seeds sliced per subspace,
    Lloyd rounds with stable argmin by (x.c - |c|^2/2) score."""
    import numpy as np
    X = np.asarray(vectors, dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    dsub = X.shape[1] // m
    S = Xn[seeds_idx]
    C = np.stack([S[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    for _ in range(lloyd_iters):
        codes = _pq_codes_ref(Xn, C)
        nc = C.copy()
        for s in range(m):
            for c in range(ksub):
                members = Xn[codes[:, s] == c, s * dsub:(s + 1) * dsub]
                if len(members):
                    nc[s, c] = members.mean(axis=0)
        C = nc
    return C


def _pq_codes_ref(Xn, C):
    import numpy as np
    m, ksub, dsub = C.shape
    out = np.empty((Xn.shape[0], m), dtype=int)
    for s in range(m):
        sub = Xn[:, s * dsub:(s + 1) * dsub]
        score = sub @ C[s].T - 0.5 * (C[s] ** 2).sum(axis=1)
        out[:, s] = np.argsort(-score, axis=1, kind="stable")[:, 0]
    return out


def _pq_fixture(spark, n=60, dim=16, seed=7):
    import numpy as np
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, dim) * 2
    rows = []
    for i in range(n):
        v = centers[i % 4] + rng.randn(dim) * 0.3
        rows.append((i, [float(x) for x in v]))
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_train_matches_reference_and_is_deterministic(spark):
    from pagerank_spark.operators.dedup import shared_hash60  # noqa: F401
    from pagerank_spark.operators.similarity import pq_train
    import hashlib
    import numpy as np
    rows, df = _pq_fixture(spark)
    C1 = pq_train(df, m=4, ksub=4)
    C2 = pq_train(df, m=4, ksub=4)
    assert C1.shape == (4, 4, 4)
    assert np.array_equal(C1, C2)
    # reference: seeds = 4 smallest (md5-hash60, id)
    def h60(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    seeds_idx = sorted(range(len(rows)), key=lambda i: (h60(i), i))[:4]
    # float32 storage: the reference must read the same float32-rounded values
    vecs = [np.asarray(r[1], dtype=np.float32).astype(np.float64)
            for r in rows]
    want = _pq_ref(vecs, 4, 4, seeds_idx)
    assert np.allclose(C1, want, atol=1e-12)


def test_pq_codes_match_reference(spark):
    from pagerank_spark.operators.similarity import pq_codes, pq_train
    import numpy as np
    rows, df = _pq_fixture(spark)
    C = pq_train(df, m=4, ksub=4)
    got = {r.id: list(r.codes) for r in pq_codes(df, C).collect()}
    vecs = np.stack([np.asarray(r[1], dtype=np.float32).astype(np.float64)
                     for r in rows])
    Xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = _pq_codes_ref(Xn, C)
    for i in range(len(rows)):
        assert got[i] == list(want[i]), i


def test_pq_adc_finds_the_right_cluster_and_scores_match_reference(spark):
    # within a tight cluster every member shares the same codes, so ADC
    # cannot rank INSIDE a cell (inherent to PQ — Jegou et al. §III);
    # the guarantee on this fixture is cluster-level: every approximate
    # neighbor comes from the query's own cluster (i % 4)
    from pagerank_spark.operators.similarity import (ann_topk_pq, pq_codes,
                                                     pq_train)
    from pyspark.sql import functions as F
    import numpy as np
    rows, df = _pq_fixture(spark, n=80)
    queries = df.filter(F.col("vec_id") < 4)
    C = pq_train(df, m=4, ksub=8)
    approx = ann_topk_pq(df, queries, k=5, m=4, ksub=8, codebook=C).collect()
    assert len(approx) == 20      # 4 queries x 5
    for r in approx:
        assert r.neighbor_id % 4 == r.query_id % 4, (r.query_id, r.neighbor_id)
    # ADC score parity: lut[q, s*ksub + code] summed over s, in float64
    vecs = np.stack([np.asarray(r[1], dtype=np.float32).astype(np.float64)
                     for r in rows])
    Xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    codes = {r.id: list(r.codes) for r in pq_codes(df, C).collect()}
    for r in approx:
        q = Xn[r.query_id]
        want = sum(float(q[s * 4:(s + 1) * 4] @ C[s][codes[r.neighbor_id][s]])
                   for s in range(4))
        assert r.cos == pytest.approx(want, abs=1e-9), (r.query_id,
                                                        r.neighbor_id)


def test_pq_dim_not_divisible_raises(spark):
    from pagerank_spark.operators.similarity import pq_train
    _, df = _pq_fixture(spark, dim=18)
    with pytest.raises(ValueError):
        pq_train(df, m=4, ksub=4)


def test_ivfpq_full_probe_equals_pure_pq(spark):
    # probing every cell makes the IVF stage a no-op filter, so IVFADC
    # must reproduce the pure-PQ ranking exactly (same codebook)
    from pagerank_spark.operators.similarity import (ann_topk_ivfpq,
                                                     ann_topk_pq, pq_train)
    from pyspark.sql import functions as F
    _, df = _pq_fixture(spark, n=60)
    queries = df.filter(F.col("vec_id") < 3)
    C = pq_train(df, m=4, ksub=4)
    pure = {(r.query_id, r.neighbor_id, r.rank)
            for r in ann_topk_pq(df, queries, k=5, codebook=C).collect()}
    comp = {(r.query_id, r.neighbor_id, r.rank)
            for r in ann_topk_ivfpq(df, queries, k=5, n_cells=8, nprobe=8,
                                    codebook=C).collect()}
    assert comp == pure


def test_ivfpq_prunes_but_stays_in_cluster(spark):
    from pagerank_spark.operators.similarity import ann_topk_ivfpq
    from pyspark.sql import functions as F
    _, df = _pq_fixture(spark, n=80)
    queries = df.filter(F.col("vec_id") < 4)
    got = ann_topk_ivfpq(df, queries, k=5, n_cells=8, nprobe=2,
                         m=4, ksub=8).collect()
    assert len(got) == 20
    for r in got:
        assert r.neighbor_id % 4 == r.query_id % 4, (r.query_id, r.neighbor_id)
