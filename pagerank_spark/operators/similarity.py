"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the corpus, cosine via JVM-side zip_with/aggregate, window
  row_number <= k. The correctness baseline.
* ``ann_topk_lsh`` — the scale path: random-hyperplane LSH (deterministic
  seeded planes, multiple tables), equi-join query buckets to corpus
  buckets, score only within buckets, then top-k. Sub-linear candidates at
  the cost of recall; recall is measured against brute force in tests.
* ``ann_topk_ivf`` — the other scale path: an inverted-file index.
  Deterministically seeded + Lloyd-refined codebook partitions the corpus
  into Voronoi cells; queries probe their ``nprobe`` nearest cells. IVF
  adapts cells to the data distribution (better on clustered corpora);
  LSH needs no training pass. Both share the bucket-equi-join shape.
* ``ann_topk_pq`` — the compression path: product quantization (Jegou et
  al. TPAMI 2011). Corpus vectors shrink to m small codes; queries score
  by LUT lookups (ADC). Linear scan, but over a ~dim*8/m-fold smaller
  state; compose with IVF cells (IVFADC) for sub-linear candidates.

At 100 TB the corpus side stays partitioned; only query vectors and the
plane matrix move (broadcast). No Python executes per row — the dot
products are Catalyst higher-order functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pagerank_spark.functions.hashing import mix3
from pagerank_spark.operators.dedup import cosine


def _plane(dim: int, table: int, plane: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplane: components are
    mix3(d, table*1024+plane, seed) mapped to [-1, 1)."""
    h = mix3(np.arange(dim, dtype=np.uint64), table * 1024 + plane, seed)
    return (h.astype(np.float64) / 2.0**63) - 1.0


def plane_matrix(dim: int, planes: int, tables: int, seed: int) -> np.ndarray:
    """(tables*planes, dim) deterministic plane matrix, row t*planes+p."""
    return np.stack([_plane(dim, t, p, seed)
                     for t in range(tables) for p in range(planes)])


def hyperplane_buckets(emb: DataFrame, id_col: str, vec_col: str,
                       planes: int = 16, seed: int = 42,
                       tables: int = 4, dim: int | None = None) -> DataFrame:
    """(id, table, bucket) — sign-pattern bucket per LSH table.

    bucket_t = Σ_p sign(v · plane_{t,p}) << p, for ALL tables at once via
    ONE Arrow-batched pandas UDF doing a (batch × dim)·(dim × tables·planes)
    matmul against the closure-captured plane matrix. The plan is O(1) in
    dim/planes/tables — the earlier per-plane JVM expression inlined every
    plane as literals, and at dim=768 with 6 tables × 12 planes the
    projection held ~55k expression nodes (Catalyst planning/codegen
    blowup). The matrix itself is tiny (tables·planes·dim doubles) and
    ships once per executor inside the serialized UDF."""
    if dim is None:
        row = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if row is None:
            # empty (or all-null) input: type-correct empty bucket table
            # instead of a TypeError on first()[0]
            return (emb.select(F.col(id_col).alias("id")).limit(0)
                    .withColumn("table", F.lit(0))
                    .withColumn("bucket", F.lit(0).cast("long")))
        dim = len(row[0])
    P = plane_matrix(dim, planes, tables, seed)          # (T*B, dim)
    weights = (1 << np.arange(planes, dtype=np.int64))   # bit weight per plane

    @pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)    # (batch, dim)
        signs = (M @ P.T) >= 0.0                          # (batch, T*B)
        b = signs.reshape(len(M), tables, planes) @ weights  # (batch, T)
        return pd.Series(list(b))

    return (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"),
                F.posexplode(_buckets(F.col(vec_col).cast("array<double>")))
                .alias("table", "bucket"))
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "vec_id", q_vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cos, rank), neighbor != query."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).cast("array<double>").alias("qv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assignments(emb: DataFrame, centroids: np.ndarray,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nprobe: int = 1) -> DataFrame:
    """(id, cell) — index of the cosine-nearest centroid(s) per vector.

    ``nprobe > 1`` emits that many nearest cells per vector (query-side
    probing). One Arrow-batched matmul against the broadcast centroid
    matrix; ties break to the lowest cell index (np.argsort stable)."""
    C = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = M @ C.T                                   # (batch, n_cells)
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in top])

    return (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"),
                F.explode(_cells(F.col(vec_col).cast("array<double>")))
                .alias("cell"))
    )


def ivf_train_centroids(corpus: DataFrame, n_cells: int = 16,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        lloyd_iters: int = 1) -> np.ndarray:
    """Deterministic IVF codebook: seed cells with the ``n_cells`` corpus
    vectors of smallest xxhash64(id) (a seeded pseudo-random sample, no
    RNG state), then ``lloyd_iters`` rounds of Lloyd refinement — assign
    every vector to its nearest centroid (one matmul pass) and average
    element-wise per cell (posexplode + groupBy, all JVM; only the
    n_cells x dim codebook ever reaches the driver)."""
    from pagerank_spark.operators.dedup import shared_hash60
    seeds = (corpus.filter(F.col(vec_col).isNotNull())
             .orderBy(shared_hash60(F.col(id_col)), F.col(id_col))
             .select(F.col(vec_col).cast("array<double>").alias("v"))
             .limit(n_cells).collect())
    C = np.stack([np.asarray(r.v, dtype=np.float64) for r in seeds])
    for _ in range(lloyd_iters):
        assign = ivf_assignments(corpus, C, id_col, vec_col, nprobe=1)
        means = (
            assign.join(corpus.select(F.col(id_col).alias("id"),
                                      F.col(vec_col).cast("array<double>").alias("v")),
                        "id")
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        nc = C.copy()  # cells that lost every member keep their centroid
        for r in means:
            nc[r.cell, r.pos] = r.m
        C = nc
    return C


def ann_topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_cells: int = 16, nprobe: int = 4,
                 lloyd_iters: int = 1,
                 centroids: np.ndarray | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: same output schema as
    cosine_topk. The corpus is partitioned into ``n_cells`` Voronoi cells
    by a deterministic trained codebook; each query probes its ``nprobe``
    nearest cells and scores only vectors in them. Complements
    ``ann_topk_lsh``: IVF adapts its cells to the data distribution
    (better for clustered corpora), LSH is data-independent (no training
    pass). At scale the cell assignment table is a bucketed join column —
    the corpus side never re-shuffles between queries."""
    if centroids is None:
        centroids = ivf_train_centroids(corpus, n_cells, id_col, vec_col,
                                        lloyd_iters)
    ca = ivf_assignments(corpus, centroids, id_col, vec_col, nprobe=1)
    qa = ivf_assignments(queries, centroids, id_col, vec_col, nprobe=nprobe)
    cands = (
        qa.alias("q").join(ca.alias("c"), "cell")
        .filter(F.col("c.id") != F.col("q.id"))
        .select(F.col("q.id").alias("query_id"), F.col("c.id").alias("neighbor_id"))
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 planes: int = 12, tables: int = 6, seed: int = 42) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH; same output schema
    as cosine_topk. Recall grows with ``tables`` and shrinks with ``planes``."""
    cb = hyperplane_buckets(corpus, id_col, vec_col, planes, seed, tables)
    qb = hyperplane_buckets(queries, id_col, vec_col, planes, seed, tables)
    cands = (
        cb.alias("c").join(qb.alias("q"), ["table", "bucket"])
        .filter(F.col("c.id") != F.col("q.id"))
        .select(F.col("q.id").alias("query_id"), F.col("c.id").alias("neighbor_id"))
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_train(corpus: DataFrame, m: int = 4, ksub: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             lloyd_iters: int = 1, dim: int | None = None) -> np.ndarray:
    """Deterministic product-quantization codebook (Jegou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    split the (L2-normalized) vectors into ``m`` contiguous subspaces and
    learn an independent ``ksub``-centroid codebook per subspace — the
    same seeded-sample + Lloyd discipline as ``ivf_train_centroids``, but
    under the EUCLIDEAN metric per subspace (the PQ decomposition needs
    plain dot products to telescope: q·x ≈ Σ_s q_s·C_s[code_s]).

    Returns the ``(m, ksub, dim/m)`` codebook. All corpus passes are
    Arrow/JVM; only the codebook (m·ksub·dsub doubles) reaches the
    driver — the bounded-codebook discipline. Seeds are the ``ksub``
    corpus vectors of smallest shared-hash(id), each sliced into its m
    sub-vectors, so every subspace seeds from the same rows (no RNG)."""
    from pagerank_spark.operators.dedup import shared_hash60

    if dim is None:
        row = corpus.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        dim = len(row[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    seeds = (corpus.filter(F.col(vec_col).isNotNull())
             .orderBy(shared_hash60(F.col(id_col)), F.col(id_col))
             .select(F.col(vec_col).cast("array<double>").alias("v"))
             .limit(ksub).collect())
    S = np.stack([np.asarray(r.v, dtype=np.float64) for r in seeds])
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    C = np.stack([S[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    for _ in range(lloyd_iters):
        codes = pq_codes(corpus, C, id_col, vec_col)
        elems = (corpus.filter(F.col(vec_col).isNotNull())
                 .select(F.col(id_col).alias("id"),
                         F.posexplode(_l2_normalize(
                             F.col(vec_col).cast("array<double>")))
                         .alias("pos", "x")))
        means = (codes.select("id", F.posexplode("codes").alias("s", "code"))
                 .join(elems.select(
                     "id",
                     F.floor(F.col("pos") / dsub).cast("int").alias("s"),
                     "pos", "x"),
                     ["id", "s"])
                 .groupBy("s", "code", "pos")
                 .agg(F.avg("x").alias("mval"))
                 .collect())
        nc = C.copy()  # cells that lost every member keep their centroid
        for r in means:
            nc[r.s, r.code, r.pos - r.s * dsub] = r.mval
        C = nc
    return C


def _l2_normalize(v):
    """JVM-side L2 normalization of an array<double> column."""
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(v, lambda x: x / norm)


def pq_codes(emb: DataFrame, codebook: np.ndarray,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int> length m) — per subspace, the EUCLIDEAN-
    nearest centroid of the L2-normalized vector's slice; ties to the
    lowest code (stable argmin). ONE Arrow-batched UDF computes all m
    subspaces per batch against the closure-captured codebook."""
    mm, ksub, dsub = codebook.shape
    CB = codebook.copy()

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        out = np.empty((M.shape[0], mm), dtype=np.int32)
        for s in range(mm):
            sub = M[:, s * dsub:(s + 1) * dsub]          # (batch, dsub)
            # argmin ||x - c||^2 = argmax (x.c - |c|^2/2); stable ties
            score = sub @ CB[s].T - 0.5 * (CB[s] ** 2).sum(axis=1)
            out[:, s] = np.argsort(-score, axis=1, kind="stable")[:, 0]
        return pd.Series(list(out))

    return (emb.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    _codes(F.col(vec_col).cast("array<double>"))
                    .alias("codes")))


def ann_topk_pq(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                m: int = 4, ksub: int = 8, lloyd_iters: int = 1,
                codebook: np.ndarray | None = None) -> DataFrame:
    """PQ approximate top-k by asymmetric distance computation (ADC,
    Jegou et al. TPAMI 2011 §III): corpus vectors live only as m-byte
    codes; a query scores a candidate as Σ_s lut_q[s][code_s], where
    lut_q is the query's (m × ksub) table of exact sub-dot-products
    against the codebook. Same output schema as ``cosine_topk``
    (query_id, neighbor_id, cos, rank); ``cos`` is the ADC estimate of
    the cosine (both sides L2-normalized; the error is the corpus
    quantization error only).

    Scale shape — the complement of IVF/LSH candidate pruning: PQ is a
    COMPRESSED EXHAUSTIVE scan (dim doubles -> m ints per corpus row, a
    ~dim·8/m-fold state reduction), so the scan stays linear but touches
    a fraction of the bytes. The big (codes) side is pure JVM — the score
    is one element_at/aggregate over the zipped code array against the
    BROADCAST per-query LUT; Python runs only on the tiny query side
    (LUT construction) and in training. Compose with IVF cells for
    sub-linear candidates (IVFADC) when the corpus outgrows the scan."""
    if codebook is None:
        codebook = pq_train(corpus, m=m, ksub=ksub, id_col=id_col,
                            vec_col=vec_col, lloyd_iters=lloyd_iters)
    codes = pq_codes(corpus, codebook, id_col, vec_col)
    q = _pq_query_luts(queries, codebook, id_col, vec_col)
    scored = (
        codes.select(F.col("id").alias("neighbor_id"), "codes")
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                _adc_score_expr(codebook).alias("cos"))
    )
    return _adc_rank(scored, k)


def _adc_rank(scored: DataFrame, k: int) -> DataFrame:
    """Top-k over ADC scores with the ROUNDED score in the sort key (the
    pmi_collocations discipline): the codebook reaches the score through
    a driver-side Lloyd mean whose avg() summation order varies run to
    run, so raw ADC sums carry ~1e-15 run/engine noise — ranking on
    round(cos, 9) makes the k-boundary the same total order everywhere
    (ties at the 1e-9 grid break by neighbor_id in both engines)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 9)), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _pq_query_luts(queries: DataFrame, codebook: np.ndarray,
                   id_col: str, vec_col: str) -> DataFrame:
    """(query_id, lut array<double> length m*ksub): lut[s*ksub + c] is the
    exact sub-dot-product of the normalized query's subspace s against
    centroid c — one Arrow pass over the (small) query side."""
    mm, kk, dsub = codebook.shape
    CB = codebook.copy()

    @pandas_udf("array<double>")
    def _lut(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        out = np.empty((M.shape[0], mm * kk), dtype=np.float64)
        for s in range(mm):
            out[:, s * kk:(s + 1) * kk] = \
                M[:, s * dsub:(s + 1) * dsub] @ CB[s].T
        return pd.Series(list(out))

    return (queries.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("query_id"),
                    _lut(F.col(vec_col).cast("array<double>")).alias("lut")))


def _adc_score_expr(codebook: np.ndarray):
    """ADC sum over columns ``codes`` and ``lut`` — pure JVM array algebra
    on the big (codes) side."""
    mm, kk, _ = codebook.shape
    return F.aggregate(
        F.zip_with(F.col("codes"),
                   F.sequence(F.lit(0), F.lit(mm - 1)),
                   lambda c, s: F.element_at(
                       F.col("lut"), (s * kk + c + 1).cast("int"))),
        F.lit(0.0), lambda a, x: a + x)


def ann_topk_ivfpq(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_cells: int = 16, nprobe: int = 4,
                   m: int = 4, ksub: int = 8, lloyd_iters: int = 1,
                   centroids: np.ndarray | None = None,
                   codebook: np.ndarray | None = None) -> DataFrame:
    """IVFADC (Jegou et al. TPAMI 2011 §IV — the standard billion-scale
    ANN shape, e.g. FAISS's IVFx,PQy): IVF cells prune the candidate set
    to the query's ``nprobe`` nearest Voronoi cells, then PQ/ADC scores
    the survivors from their m-int codes — sub-linear candidates AND
    compressed state, the composition ``ann_topk_pq``'s docstring
    promises. Same output schema as ``cosine_topk``; both codebooks are
    the deterministic seeded-Lloyd artifacts of their components, so the
    whole pipeline is replayable.

    Scale shape: the cell-assignment equi-join is the IVF shape (corpus
    side bucketed, never re-shuffled between query batches); scoring
    touches only candidate codes with the broadcast per-query LUT —
    JVM-side, like ``ann_topk_pq``."""
    if centroids is None:
        centroids = ivf_train_centroids(corpus, n_cells, id_col, vec_col,
                                        lloyd_iters)
    if codebook is None:
        codebook = pq_train(corpus, m=m, ksub=ksub, id_col=id_col,
                            vec_col=vec_col, lloyd_iters=lloyd_iters)
    ca = ivf_assignments(corpus, centroids, id_col, vec_col, nprobe=1)
    qa = ivf_assignments(queries, centroids, id_col, vec_col, nprobe=nprobe)
    cands = (
        qa.alias("q").join(ca.alias("c"), "cell")
        .filter(F.col("c.id") != F.col("q.id"))
        .select(F.col("q.id").alias("query_id"),
                F.col("c.id").alias("neighbor_id"))
        .distinct()
    )
    codes = pq_codes(corpus, codebook, id_col, vec_col)
    q = _pq_query_luts(queries, codebook, id_col, vec_col)
    scored = (
        cands.join(codes.select(F.col("id").alias("neighbor_id"), "codes"),
                   "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id",
                _adc_score_expr(codebook).alias("cos"))
    )
    return _adc_rank(scored, k)
