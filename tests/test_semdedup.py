from __future__ import annotations

import numpy as np

from pagerank_spark.operators.semdedup import semantic_dedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_semdedup_drops_exact_twin_keeps_lower_id_on_tie(spark):
    # 0 and 1 are scaled copies (cosine 1.0, identical centroid sim):
    # the id tie-break keeps 0 and drops 1; 2 is orthogonal-ish and kept
    emb = _emb(spark, [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ])
    out = {r.id: r for r in
           semantic_dedup(emb, n_cells=2, threshold=0.9).collect()}
    assert out[0].kept is True
    assert out[1].kept is False
    assert out[2].kept is True
    assert out[0].cell == out[1].cell  # scaled twins share the cell


def test_semdedup_all_unique_keeps_everything(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(10, 8))
    emb = _emb(spark, list(enumerate(vecs)))
    out = semantic_dedup(emb, n_cells=3, threshold=0.99).collect()
    assert len(out) == 10
    assert all(r.kept for r in out)


def test_semdedup_keeps_low_centroid_sim_member(spark):
    # A cluster of three near-identical vectors with one slightly off-axis:
    # the paper's rule keeps the LOWEST-centroid-similarity member of each
    # duplicate relation; everything similar to a lower-priority member
    # drops.
    emb = _emb(spark, [
        (10, [1.0, 0.00, 0.0, 0.0]),
        (11, [1.0, 0.01, 0.0, 0.0]),
        (12, [1.0, 0.30, 0.0, 0.0]),   # furthest from the centroid
    ])
    out = {r.id: r for r in
           semantic_dedup(emb, n_cells=1, threshold=0.95).collect()}
    sims = {k: out[k].centroid_sim for k in out}
    lowest = min(sims, key=lambda k: (sims[k], k))
    assert out[lowest].kept is True
    assert sum(1 for r in out.values() if not r.kept) >= 1


def test_semdedup_deterministic_across_runs(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 8))
    vecs[5] = vecs[4] * 3.0  # one planted twin
    emb = _emb(spark, list(enumerate(vecs)))
    a = sorted(map(tuple, semantic_dedup(emb, n_cells=4).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, n_cells=4).collect()))
    assert a == b
    kept = {r[0]: r[3] for r in a}
    assert kept[4] is True and kept[5] is False
