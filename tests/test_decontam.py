from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.operators.decontam import (decontaminate_split,
                                               ngram_overlap)
from pagerank_spark.operators.splits import dataset_split


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_overlap_counts(spark):
    train = _docs(spark, [(1, "a b c d e"), (2, "x y z w q")])
    evals = _docs(spark, [(10, "a b c d q r"), (11, "p p p")])
    got = {(r.eval_id, r.train_id): (r.n_shared, r.eval_ngrams, r.overlap)
           for r in ngram_overlap(train, evals, ngram=3).collect()}
    # e10 shares "a b c" and "b c d" with d1; 6 tokens -> 4 distinct 3-grams
    assert got == {(10, 1): (2, 4, 0.5)}


def test_ngram_overlap_max_df_drops_boilerplate(spark):
    boiler = "this code is licensed under the apache license"
    train = _docs(spark, [(i, boiler) for i in range(5)])
    evals = _docs(spark, [(100, boiler)])
    hot = ngram_overlap(train, evals, ngram=3, max_df=3)
    assert hot.count() == 0  # df=5 > 3: stop-shingles dropped
    cold = ngram_overlap(train, evals, ngram=3, max_df=10)
    assert cold.count() == 5  # one pair per train doc


def test_ngram_overlap_min_shared(spark):
    train = _docs(spark, [(1, "a b c d e")])
    evals = _docs(spark, [(10, "a b c z z z")])  # only "a b c" shared
    assert ngram_overlap(train, evals, ngram=3, min_shared=2).count() == 0
    assert ngram_overlap(train, evals, ngram=3, min_shared=1).count() == 1


def test_decontaminate_split_flags_planted_leak(spark):
    # unique filler texts; the split is a pure function of doc_id, so pick
    # a (train, eval) id pair from the real assignment, then plant the leak
    ids = list(range(40))
    filler = _docs(spark, [(i, f"filler{i} u{i} v{i} w{i} x{i} y{i}")
                           for i in ids])
    assign = {r.doc_id: r.split
              for r in dataset_split(filler, "doc_id").collect()}
    train_id = min(i for i in ids if assign[i] == "train")
    eval_id = min(i for i in ids if assign[i] != "train")
    secret = "the quick brown fox jumps over the lazy dog"
    rows = [(i, (f"filler{i} u{i} v{i} w{i} x{i} y{i}"
                 + (f" {secret}" if i in (train_id, eval_id) else "")))
            for i in ids]
    out = decontaminate_split(_docs(spark, rows), ngram=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == eval_id and r.train_id == train_id
    assert r.split == assign[eval_id]
    # the 9-token secret contributes 2 shared 8-grams
    assert r.n_shared == 2 and abs(r.overlap - 2 / r.eval_ngrams) < 1e-12


def test_decontaminate_split_deterministic(spark):
    rows = [(i, f"alpha beta gamma delta {i % 7} epsilon zeta eta theta")
            for i in range(30)]
    df = _docs(spark, rows)
    a = {tuple(r) for r in decontaminate_split(df, ngram=3).collect()}
    b = {tuple(r) for r in decontaminate_split(df, ngram=3).collect()}
    assert a == b


def test_decontaminate_plan_is_window_free_jvm_only(spark):
    """At-scale shape: no Window node ever sorts a hub shingle's matches in
    one task, and no per-row Python touches the hot path."""
    from pagerank_spark.plans.inspect import python_nodes, simple_plan
    df = _docs(spark, [(i, f"a b c d{i} e f") for i in range(10)])
    out = decontaminate_split(df, ngram=3)
    assert python_nodes(out) == []
    assert "Window" not in simple_plan(out)
