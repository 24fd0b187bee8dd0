"""BPE training (operators/bpe.py): reference-implementation replay,
greedy-merge semantics, early stop, determinism."""

from __future__ import annotations

import random
import string

import pytest

from pagerank_spark.operators.bpe import bpe_train


def _ref_bpe(texts, merges):
    """Sennrich-style reference: word freq table, char symbols, argmax
    pair by (count desc, left, right), greedy left-to-right re-split."""
    from collections import Counter

    freq = Counter(w for t in texts for w in (t or "").lower().split() if w)
    vocab = {w: list(w) for w in freq}
    out = []
    for step in range(merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, n))
        for w, syms in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    return out, {w: " ".join(s) for w, s in vocab.items()}


def test_bpe_matches_reference_on_random_corpus(spark):
    rng = random.Random(19)
    texts = [" ".join("".join(rng.choices(string.ascii_lowercase[:5],
                                          k=rng.randint(1, 7)))
                      for _ in range(rng.randint(3, 10)))
             for _ in range(40)]
    want_merges, want_vocab = _ref_bpe(texts, 10)
    res = bpe_train(spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string"), merges=10)
    got = [(r.step, r.left, r.right, r.n_pair)
           for r in res.merges.orderBy("step").collect()]
    assert got == want_merges
    got_vocab = {r.w: r.syms for r in res.vocab.collect()}
    assert got_vocab == want_vocab
    assert res.n_merges == len(want_merges)


def test_bpe_hand_fixture_greedy_semantics(spark):
    # corpus: "abab" x3, "ab" x2 -> pair (a,b) count 3*2+2 = 8 wins;
    # after merging, "abab" = [ab, ab] so (ab, ab) count 3 is next
    sp = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string")
    res = bpe_train(sp, merges=2)
    got = [(r.step, r.left, r.right, r.n_pair)
           for r in res.merges.orderBy("step").collect()]
    assert got == [(0, "a", "b", 8), (1, "ab", "ab", 3)]
    vocab = {r.w: r.syms for r in res.vocab.collect()}
    assert vocab == {"abab": "abab", "ab": "ab"}


def test_bpe_overlapping_run_is_left_to_right(spark):
    # "aaa": greedy (a,a) merges the FIRST two only -> [aa, a]
    sp = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    res = bpe_train(sp, merges=1)
    assert {r.w: r.syms for r in res.vocab.collect()} == {"aaa": "aa a"}


def test_bpe_early_stop_and_validation(spark):
    # single-char words have no pairs at all -> 0 merges learned
    sp = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    res = bpe_train(sp, merges=5)
    assert res.n_merges == 0 and res.merges.count() == 0
    with pytest.raises(ValueError):
        bpe_train(sp, merges=0)


def test_bpe_partition_invariance(spark):
    texts = [(i, "the quick brown fox the the quick") for i in range(20)]
    sp = spark.createDataFrame(texts, "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(sp, merges=6).merges.collect()]
    b = [tuple(r) for r in bpe_train(sp.repartition(7),
                                     merges=6).merges.collect()]
    assert a == b and len(a) == 6


def _ref_encode(text, merge_rules):
    """Reference apply: char-split each word, run every merge in learned
    order, greedy left-to-right; concatenate subwords across words."""
    out = []
    for w in (text or "").lower().split():
        syms = list(w)
        for a, b in merge_rules:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        out.extend(syms)
    return out


def test_bpe_encode_training_corpus_matches_reference(spark):
    from pagerank_spark.operators.bpe import bpe_encode
    rng = random.Random(23)
    texts = [" ".join("".join(rng.choices(string.ascii_lowercase[:4],
                                          k=rng.randint(1, 6)))
                      for _ in range(rng.randint(2, 8)))
             for _ in range(25)]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    trained = bpe_train(docs, merges=8)
    rules = [(r.left, r.right)
             for r in trained.merges.orderBy("step").collect()]
    got = {r.doc_id: (r.n_tokens, list(r.tokens))
           for r in bpe_encode(docs, trained).collect()}
    for i, t in enumerate(texts):
        want = _ref_encode(t, rules)
        assert got[i] == (len(want), want), i


def test_bpe_encode_unseen_words_run_merges(spark):
    from pagerank_spark.operators.bpe import bpe_encode
    train = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string")
    trained = bpe_train(train, merges=2)  # learns (a,b) then (ab,ab)
    # 'ababab' and 'ba' never seen at training time
    new = spark.createDataFrame(
        [(7, "ababab ab ba"), (8, "")], "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, list(r.tokens))
           for r in bpe_encode(new, trained).collect()}
    # ababab: (a,b) -> [ab,ab,ab]; (ab,ab) greedy -> [abab, ab];
    # ba: no rule matches (b,a) -> stays char symbols
    assert got[7] == (5, ["abab", "ab", "ab", "b", "a"])
    assert got[8] == (0, [])


def test_bpe_encode_partition_invariant(spark):
    from pagerank_spark.operators.bpe import bpe_encode
    docs = spark.createDataFrame(
        [(i, "abc ab a " * (i % 3 + 1)) for i in range(12)],
        "doc_id long, text string")
    trained = bpe_train(docs, merges=3)
    a = {r.doc_id: list(r.tokens)
         for r in bpe_encode(docs, trained).collect()}
    b = {r.doc_id: list(r.tokens)
         for r in bpe_encode(docs.repartition(7), trained).collect()}
    assert a == b
