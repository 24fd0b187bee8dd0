from __future__ import annotations

from pagerank_spark.operators.mirrors import mirror_hosts


def _w(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_mirror_pair_detected_with_exact_jaccard(spark):
    # hosts a and b serve the same 3-passage page; c is unrelated
    page = _w("mirrored", 60)            # 3 passages of 20 tokens
    docs = _docs(spark, [
        (1, page, "a"),
        (2, page, "b"),
        (3, _w("solo", 60), "c"),
    ])
    out = mirror_hosts(docs, w=20, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b) == ("a", "b")
    assert r.shared == 3 and r.n_a == 3 and r.n_b == 3
    assert r.jaccard == 1.0


def test_mirror_partial_overlap_jaccard(spark):
    shared = _w("common", 40)            # 2 shared passages
    docs = _docs(spark, [
        (1, shared + " " + _w("onlya", 40), "a"),   # 4 passages total
        (2, shared + " " + _w("onlyb", 20), "b"),   # 3 passages total
    ])
    out = mirror_hosts(docs, w=20, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.shared, r.n_a, r.n_b) == (2, 4, 3)
    assert r.jaccard == round(2 / (4 + 3 - 2), 6)


def test_mirror_hot_passage_cap_drops_boilerplate(spark):
    # one cookie-banner passage on every host must not link them
    banner = _w("banner", 20)
    docs = _docs(spark, [(i, banner + " " + _w(f"u{i}", 20), f"h{i}")
                         for i in range(8)])
    assert mirror_hosts(docs, w=20, min_shared=1,
                        max_host_freq=4).count() == 0
    # with the cap lifted every pair appears (28 pairs, shared=1)
    assert mirror_hosts(docs, w=20, min_shared=1,
                        max_host_freq=8).count() == 28


def test_mirror_min_shared_threshold_and_determinism(spark):
    shared = _w("dup", 20)
    docs = _docs(spark, [(1, shared, "a"), (2, shared, "b")])
    assert mirror_hosts(docs, w=20, min_shared=2).count() == 0
    a = sorted(map(tuple, mirror_hosts(docs, w=20, min_shared=1).collect()))
    b = sorted(map(tuple, mirror_hosts(
        docs.repartition(5, "doc_id"), w=20, min_shared=1).collect()))
    assert a == b and len(a) == 1
