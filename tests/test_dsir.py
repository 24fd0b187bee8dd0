from __future__ import annotations

import math

from pagerank_spark.operators.dsir import dsir_select


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, text string")


def _corpus(spark):
    # 6 "sciencey" docs sharing the target vocabulary, 6 "spammy" docs
    # sharing a disjoint vocabulary; the target sample is drawn from the
    # sciencey side only.
    sci = "quantum entanglement theorem lattice spectra proof"
    spam = "buy cheap pills casino winner jackpot"
    rows = [(i, sci) for i in range(6)] + [(10 + i, spam) for i in range(6)]
    return _docs(spark, rows)


def test_dsir_prefers_target_like_documents(spark):
    docs = _corpus(spark)
    target = docs.filter("doc_id < 6")
    out = dsir_select(docs, target, k=12, n_buckets=64).collect()
    assert len(out) == 12
    ratios = {r.doc_id: r.log_ratio for r in out}
    # every target-like doc must out-weigh every spam doc
    assert min(ratios[i] for i in range(6)) > max(
        ratios[10 + i] for i in range(6))
    # and with k=6 only target-like docs survive: their log_ratio lead is
    # far larger than any Gumbel perturbation the 60-bit hash can produce
    # on this fixture
    top6 = {r.doc_id for r in
            dsir_select(docs, target, k=6, n_buckets=64).collect()}
    assert top6 == set(range(6))


def test_dsir_k_limit_and_ordering(spark):
    docs = _corpus(spark)
    out = dsir_select(docs, docs.filter("doc_id < 6"),
                      k=5, n_buckets=64).collect()
    assert len(out) == 5
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_dsir_deterministic_across_runs(spark):
    docs = _corpus(spark)
    target = docs.filter("doc_id >= 10")
    a = dsir_select(docs, target, k=12, n_buckets=32).collect()
    b = dsir_select(docs, target, k=12, n_buckets=32).collect()
    assert [(r.doc_id, r.log_ratio, r.score) for r in a] == \
        [(r.doc_id, r.log_ratio, r.score) for r in b]


def test_dsir_uniform_when_target_equals_raw(spark):
    # target == raw -> the two hashed models coincide, so every document
    # scores log_ratio == 0 and selection is pure Gumbel noise
    docs = _corpus(spark)
    out = dsir_select(docs, docs, k=12, n_buckets=64).collect()
    assert all(math.isclose(r.log_ratio, 0.0, abs_tol=1e-6) for r in out)
    # score must then be exactly the per-doc Gumbel draw: finite, distinct
    scores = [r.score for r in out]
    assert all(math.isfinite(s) for s in scores)
    assert len(set(scores)) == len(scores)
