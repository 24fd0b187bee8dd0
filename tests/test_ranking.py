from __future__ import annotations

import math

import pytest

from pagerank_spark.operators.ranking import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_rare_term_outranks_common(spark):
    # "zebra" appears in one doc, "the" in all four: the zebra doc must
    # outrank any doc matched only via the common term.
    docs = _docs(spark, [
        (1, "the zebra sleeps"),
        (2, "the cat sleeps"),
        (3, "the dog runs"),
        (4, "the bird sings"),
    ])
    out = bm25_topk(docs, ["zebra", "the"], k=4).collect()
    assert out[0].doc_id == 1
    assert out[0].n_matched == 2
    assert all(r.n_matched == 1 for r in out[1:])


def test_bm25_matches_hand_computation(spark):
    # Two docs, one query term, equal lengths: scores reduce to the
    # closed form idf * tf(k1+1)/(tf + k1) with dl == avgdl.
    docs = _docs(spark, [(1, "x x y"), (2, "x y y")])
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["x"], k=2).collect()}
    idf = math.log(1 + (2 - 2 + 0.5) / (2 + 0.5))
    k1 = 1.2

    def score(tf):
        return idf * tf * (k1 + 1) / (tf + k1)

    assert out[1] == pytest.approx(score(2), abs=1e-6)
    assert out[2] == pytest.approx(score(1), abs=1e-6)


def test_bm25_length_normalization_prefers_short_doc(spark):
    # Same tf for the query term; the shorter document scores higher.
    docs = _docs(spark, [
        (1, "x a"),
        (2, "x a b c d e f g h i"),
    ])
    out = bm25_topk(docs, ["x"], k=2).collect()
    assert [r.doc_id for r in out] == [1, 2]


def test_bm25_ignores_non_matching_docs_and_breaks_ties_by_id(spark):
    docs = _docs(spark, [(3, "x y"), (1, "x y"), (2, "no match here")])
    out = bm25_topk(docs, ["x"], k=10).collect()
    assert [r.doc_id for r in out] == [1, 3]  # equal score, id ascending
    assert out[0].score == out[1].score


def test_bm25_empty_query_raises(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
