"""Dedup operators: exact, MinHash+LSH, SimHash, embedding near-dup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _docs_with_dups(spark):
    """Testdata documents plus planted near/exact duplicates."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = docs.filter("doc_id < 20").collect()
    planted = []
    for r in base[:5]:
        planted.append((10_000 + r.doc_id, r.text))                 # exact dup
    for r in base[5:10]:
        words = r.text.split()
        mutated = " ".join(words[:-2] + ["zzz"]) if len(words) > 4 else r.text
        planted.append((20_000 + r.doc_id, mutated))                # near dup
    extra = spark.createDataFrame(planted, "doc_id long, text string")
    return docs.unionByName(extra)


def test_exact_duplicates(spark):
    docs = _docs_with_dups(spark)
    groups = dedup.exact_duplicates(docs).collect()
    pairs = {tuple(sorted(g.doc_ids)) for g in groups}
    for i in range(5):
        assert any(i in p and 10_000 + i in p for p in pairs), i


def test_minhash_estimates_jaccard(spark):
    docs = _docs_with_dups(spark)
    sh = dedup.shingles(docs)
    sigs = dedup.minhash_signatures(sh, k=64)
    cands = dedup.lsh_candidate_pairs(sigs, bands=16, rows=4)
    est = dedup.minhash_similarity(sigs, cands)
    exact = dedup.exact_jaccard(sh, cands)
    joined = est.join(exact, ["a", "b"]).collect()
    assert joined, "LSH produced no candidates"
    for r in joined:
        assert abs(r.est_jaccard - r.jaccard) < 0.35, (r.a, r.b, r.est_jaccard, r.jaccard)


def test_minhash_near_duplicates_finds_planted(spark):
    docs = _docs_with_dups(spark)
    found = dedup.near_duplicates_minhash(docs, threshold=0.6).collect()
    got_pairs = {(r.a, r.b) for r in found}
    for i in range(5):  # exact dups must be found with jaccard 1.0
        assert (i, 10_000 + i) in got_pairs, (i, sorted(got_pairs))
    exacts = [r for r in found if r.b == r.a + 10_000]
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in exacts)


def test_simhash_hamming_small_for_near_dups(spark):
    docs = _docs_with_dups(spark)
    fps = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    for i in range(5):
        assert fps[i] == fps[10_000 + i]  # identical text -> identical simhash
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=3).collect()
    got = {(r.a, r.b) for r in pairs}
    for i in range(5):
        assert (i, 10_000 + i) in got


def test_embedding_near_duplicates(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # plant: vec 90001 = copy of vec 1 (cosine 1.0)
    v1 = emb.filter("vec_id = 1").select("embedding").first()[0]
    extra = spark.createDataFrame([(90_001, v1, 0)],
                                  schema=emb.schema)
    both = emb.unionByName(extra)
    pairs = dedup.embedding_near_duplicates(both, threshold=0.99)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (1, 90_001) in got


def test_lsh_max_bucket_drops_boilerplate_hot_bucket(spark):
    """The hot-key discipline, exercised: 30 byte-identical boilerplate docs
    share every band bucket (30 docs/bucket); with max_bucket=10 those
    buckets are dropped, contributing ZERO of their O(bucket^2)=435 pairs,
    while a planted near-dup pair with distinct content in small buckets is
    still found. With the cap lifted the boilerplate pairs reappear —
    proving the cap (dedup.py lsh_candidate_pairs), not shingle luck, is
    what bounds the fan-out."""
    boiler = ("click here to accept cookies and subscribe to our newsletter "
              "terms of service privacy policy all rights reserved") * 3
    uniq = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green turtles recite ancient poetry under a crimson moon")
    rows = [(i, boiler) for i in range(100, 130)]
    rows.append((1, uniq))
    rows.append((2, uniq + " extra tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = dedup.shingles(docs)
    sigs = dedup.minhash_signatures(sh, k=64)

    capped = {(r.a, r.b)
              for r in dedup.lsh_candidate_pairs(sigs, 16, 4, max_bucket=10).collect()}
    assert (1, 2) in capped
    boiler_pairs = {p for p in capped if p[0] >= 100 and p[1] >= 100}
    assert boiler_pairs == set(), f"hot bucket leaked {len(boiler_pairs)} pairs"

    uncapped = {(r.a, r.b)
                for r in dedup.lsh_candidate_pairs(sigs, 16, 4, max_bucket=10_000).collect()}
    assert {(a, b) for a in range(100, 130) for b in range(a + 1, 130)} <= uncapped


def test_dedup_clusters_and_keep(spark):
    # pairs: {1,2,3} via 1-2, 2-3; {7,9} via 9-7; universe adds singleton 5
    pairs = spark.createDataFrame([(1, 2), (2, 3), (9, 7)], "a long, b long")
    uni = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 7, 9)],
                                "doc_id long")
    from pagerank_spark.operators.dedup import dedup_clusters
    got = {r.doc_id: (r.cluster, r.keep)
           for r in dedup_clusters(pairs, universe=uni).collect()}
    assert got == {1: (1, True), 2: (1, False), 3: (1, False),
                   5: (5, True), 7: (7, True), 9: (7, False)}


def test_deduplicate_corpus_planted(spark):
    from pagerank_spark.operators.dedup import deduplicate_corpus
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight")
    rows = [(i, f"unique document {i} " + " ".join(
        f"w{(i * 7 + j) % 31}" for j in range(20))) for i in range(20)]
    # plant 3 copies of the same text at ids 100..102
    rows += [(100 + i, base) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = deduplicate_corpus(docs, threshold=0.8)
    kept = {r.doc_id for r in out.collect()}
    assert 100 in kept and 101 not in kept and 102 not in kept
    assert all(i in kept for i in range(20))  # uniques survive


def test_passages_split_shape(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None), (4, "")],
        "doc_id long, text string")
    rows = dedup.passages(df, w=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.passage))
    assert sorted(by_doc[1]) == [(0, "a b"), (1, "c d"), (2, "e")]
    assert sorted(by_doc[2]) == [(0, "x y")]
    assert 3 not in by_doc and 4 not in by_doc


def test_passage_dedup_first_occurrence_survives(spark):
    # doc 1 owns "a b"/"c d"; doc 2 repeats "a b" then adds "e f";
    # doc 3 is entirely made of already-seen passages.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b e f"), (3, "c d a b")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.passage_dedup(df, w=2).collect()}
    assert out[1].n_dropped == 0 and out[1].dedup_text == "a b c d"
    assert out[2].n_dropped == 1 and out[2].dedup_text == "e f"
    assert out[3].n_dropped == 2 and out[3].dedup_text == ""
    assert all(out[i].n_passages == 2 for i in (1, 2, 3))


def test_passage_dedup_clean_corpus_keeps_everything(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 30")
    out = dedup.passage_dedup(docs, w=1000)  # one passage per doc, all unique
    rows = out.collect()
    assert len(rows) == 30
    dropped = sum(r.n_dropped for r in rows)
    # whole-doc passages: duplicates only if full docs are identical
    n_unique = docs.select(F.lower("text")).distinct().count()
    assert dropped == 30 - n_unique


def test_host_boilerplate_flags_template_passages(spark):
    # host "a": 6 pages, 4 share the footer passage "nav bar" (0.67 > 0.5);
    # "x y" appears on 2/6 pages (0.33 <= 0.5, not flagged);
    # host "b": only 2 pages (< min_pages) — never flagged even at 100%
    rows = [(1, "nav bar p q", "a"), (2, "nav bar r s", "a"),
            (3, "nav bar t u", "a"), (4, "nav bar v w", "a"),
            (5, "x y m n", "a"), (6, "x y o p", "a"),
            (7, "nav bar h i", "b"), (8, "nav bar j k", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dedup.host_boilerplate(df, w=2, min_pages=3, min_frac=0.5)
    got = [(r.host, r.passage, r.n_pages_with, r.n_pages, r.frac)
           for r in out.collect()]
    assert got == [("a", "nav bar", 4, 6, round(4 / 6, 6))]


def test_host_boilerplate_counts_pages_not_occurrences(spark):
    # the footer repeats TWICE inside doc 1 — still one page
    rows = [(1, "nav bar nav bar", "a"), (2, "nav bar q r", "a"),
            (3, "s t u v", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dedup.host_boilerplate(df, w=2, min_pages=2, min_frac=0.5)
    got = [(r.passage, r.n_pages_with) for r in out.collect()]
    assert got == [("nav bar", 2)]


def test_host_boilerplate_rejects_bad_frac(spark):
    df = spark.createDataFrame([(1, "a b", "h")],
                               "doc_id long, text string, source string")
    with pytest.raises(ValueError):
        dedup.host_boilerplate(df, min_frac=0.0)


# -- containment (Broder resemblance-vs-containment) -------------------------


def _containment_fixture(spark):
    """doc 2 = doc 1's text embedded in a much longer page: containment of
    the pair is ~1 while Jaccard is low; doc 3 is unrelated."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i} pad{i}" for i in range(40))
    rows = [(1, a), (2, filler + " " + a + " " + filler.upper().lower()),
            (3, "completely different content about nothing shared here at all")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_detects_embedded_quote(spark):
    docs = _containment_fixture(spark)
    sh = dedup.shingles(docs)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    out = {(r.a, r.b): (r.inter, r.containment)
           for r in dedup.exact_containment(sh, pairs).collect()}
    # every shingle of doc 1 appears in doc 2
    sz1 = sh.filter("doc_id = 1").count()
    assert out[(1, 2)] == (sz1, 1.0)
    assert out[(1, 3)][1] == 0.0  # left-join keeps zero-overlap pairs
    # symmetric Jaccard on the same pair is far below any near-dup threshold
    jac = {(r.a, r.b): r.jaccard
           for r in dedup.exact_jaccard(sh, pairs).collect()}
    assert jac[(1, 2)] < 0.3


def test_containment_duplicates_end_to_end(spark):
    docs = _containment_fixture(spark)
    out = {(r.a, r.b): r.containment
           for r in dedup.containment_duplicates(docs, threshold=0.8).collect()}
    assert set(out) == {(1, 2)} and out[(1, 2)] == 1.0


def test_containment_matches_python_oracle(spark):
    docs = _docs_with_dups(spark).filter("doc_id < 30 OR doc_id >= 10000")
    texts = {r.doc_id: r.text for r in docs.collect()}

    def grams(t):
        w = t.lower().split()
        idx = range(max(len(w) - 3, 0) + 1)
        return {" ".join(w[i:i + 3]) for i in idx if w[i:i + 3]}

    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ga, gb = grams(texts[a]), grams(texts[b])
            if not ga or not gb:
                continue
            c = len(ga & gb) / min(len(ga), len(gb))
            if c >= 0.5:
                want[(a, b)] = round(c, 6)
    got = {(r.a, r.b): round(r.containment, 6)
           for r in dedup.containment_duplicates(docs, threshold=0.5).collect()}
    assert got == want
