from __future__ import annotations

from pagerank_spark.operators.winnow import (winnow_candidates,
                                             winnow_fingerprints)

K, W = 3, 4
T = W + K - 1  # MOSS guarantee threshold, in tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # two documents embedding the same T-token run in unrelated prose
    shared = _words("common", T)
    docs = _docs(spark, [
        (1, _words("alpha", 12) + " " + shared + " " + _words("omega", 9)),
        (2, _words("beta", 7) + " " + shared + " " + _words("gamma", 15)),
        (3, _words("noise", 30)),
    ])
    fps = winnow_fingerprints(docs, k=K, w=W)
    by_doc = {i: {r.fp for r in rows} for i, rows in
              ((d, [x for x in fps.collect() if x.doc_id == d])
               for d in (1, 2, 3))}
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnow_density_bound(spark):
    # fingerprints per doc ≤ number of windows, ≥ 1 for any doc ≥ k tokens
    docs = _docs(spark, [(1, _words("x", 40)), (2, _words("y", K)),
                         (3, "a b"), (4, None)])
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    per = {}
    for r in fps:
        per.setdefault(r.doc_id, set()).add(r.fp)
    n_shingles = 40 - K + 1
    assert 1 <= len(per[1]) <= n_shingles - W + 1
    assert len(per[2]) == 1      # exactly one shingle -> its own hash
    assert 3 not in per and 4 not in per   # shorter than k tokens


def test_winnow_candidates_order_and_threshold(spark):
    shared = _words("dup", 30)
    docs = _docs(spark, [(5, shared), (9, shared),
                         (7, _words("other", 30))])
    out = winnow_candidates(docs, k=K, w=W, min_shared=2,
                            max_doc_freq=10).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.doc_id_a, row.doc_id_b) == (5, 9)
    assert row.shared >= 2


def test_winnow_hot_fingerprint_cap_drops_boilerplate(spark):
    # the same licence block on every doc: with max_doc_freq below the
    # corpus size the boilerplate fingerprints vanish and no pair remains
    block = _words("licence", 20)
    docs = _docs(spark, [(i, block) for i in range(6)])
    assert winnow_candidates(docs, k=K, w=W, min_shared=1,
                             max_doc_freq=5).count() == 0
    # raising the cap brings all 15 pairs back
    assert winnow_candidates(docs, k=K, w=W, min_shared=1,
                             max_doc_freq=6).count() == 15


def test_winnow_deterministic_and_partition_invariant(spark):
    docs = _docs(spark, [(i, _words(f"w{i % 4}", 25)) for i in range(12)])
    a = sorted(map(tuple, winnow_candidates(docs, k=K, w=W).collect()))
    b = sorted(map(tuple, winnow_candidates(
        docs.repartition(7, "doc_id"), k=K, w=W).collect()))
    assert a == b and a
