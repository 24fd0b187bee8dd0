"""Count-min sketch, Bloom frontier filter, and priority sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.sketch import (
    bloom_bits,
    bloom_maybe_contains,
    cms_estimate,
    cms_heavy_hitters,
    count_min_sketch,
)
from pagerank_spark.operators.splits import priority_sample


@pytest.fixture(scope="module")
def keyed(spark):
    # key i appears i+1 times, i in [0, 40) -> known exact counts
    rows = [(i,) for i in range(40) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "k long").cache()


def test_cms_overestimates_never_under(spark, keyed):
    """est >= exact for EVERY key (the one-sided count-min contract),
    and with width >= distinct keys' bucket spread collisions still only
    ever push estimates UP."""
    hh = cms_heavy_hitters(keyed, "k", k=40, depth=4, width=32)
    rows = hh.collect()
    assert len(rows) == 40
    assert all(r["est_count"] >= r["exact_count"] for r in rows)
    assert all(r["exact_count"] == r["k"] + 1 for r in rows)


def test_cms_exact_when_wide(spark, keyed):
    """A sketch much wider than the key set has (whp for this fixture)
    no colliding bucket in at least one depth row per key -> est == exact."""
    hh = cms_heavy_hitters(keyed, "k", k=40, depth=4, width=4096)
    assert all(r["est_count"] == r["exact_count"] for r in hh.collect())


def test_cms_sketch_shape_and_mass(spark, keyed):
    sk = count_min_sketch(keyed, "k", depth=3, width=16).collect()
    assert all(0 <= r["bucket"] < 16 and 0 <= r["d"] < 3 for r in sk)
    n = keyed.count()
    # every depth row partitions the input: counters sum to n per row
    per_depth = {}
    for r in sk:
        per_depth[r["d"]] = per_depth.get(r["d"], 0) + r["cnt"]
    assert per_depth == {0: n, 1: n, 2: n}


def test_cms_estimate_unknown_key_zero(spark, keyed):
    sk = count_min_sketch(keyed, "k", depth=4, width=4096)
    probe = spark.createDataFrame([(999_999,)], "k long")
    est = cms_estimate(probe, sk, "k", depth=4, width=4096).collect()
    assert est[0]["est_count"] == 0


def test_cms_partition_invariance(spark, keyed):
    a = cms_heavy_hitters(keyed, "k", k=10, depth=4, width=32).collect()
    b = cms_heavy_hitters(keyed.repartition(13), "k", k=10,
                          depth=4, width=32).collect()
    assert a == b


def test_cms_validation(spark, keyed):
    with pytest.raises(ValueError):
        count_min_sketch(keyed, "k", depth=0)
    with pytest.raises(ValueError):
        cms_heavy_hitters(keyed, "k", k=0)


def test_bloom_no_false_negatives(spark):
    seen = spark.createDataFrame([(f"u{i}",) for i in range(300)], "url string")
    bits = bloom_bits(seen, "url", m_bits=1 << 14, hashes=3)
    out = bloom_maybe_contains(seen, bits, "url", m_bits=1 << 14, hashes=3)
    assert out.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_finds_new_keys(spark):
    seen = spark.createDataFrame([(f"u{i}",) for i in range(300)], "url string")
    cand = spark.createDataFrame([(f"v{i}",) for i in range(300)], "url string")
    bits = bloom_bits(seen, "url", m_bits=1 << 16, hashes=3)
    out = bloom_maybe_contains(cand, bits, "url", m_bits=1 << 16, hashes=3)
    # 300*3/65536 fill ~ 1.4% -> fp rate ~ 2.6e-6; all 300 should be new
    assert out.filter(F.col("maybe_seen")).count() == 0


def test_bloom_bits_bounded_and_valid(spark):
    seen = spark.createDataFrame([(f"u{i}",) for i in range(50)], "url string")
    bits = bloom_bits(seen, "url", m_bits=128, hashes=4).collect()
    assert len(bits) <= 128
    assert all(0 <= r["bit"] < 128 for r in bits)
    with pytest.raises(ValueError):
        bloom_bits(seen, "url", m_bits=0)


def test_priority_sample_basic(spark):
    docs = spark.createDataFrame(
        [(i, float(10 + i)) for i in range(100)], "id long, w double")
    out = priority_sample(docs, "id", "w", k=20).collect()
    assert len(out) == 20
    assert [r["rank"] for r in out] == list(range(1, 21)) or \
        sorted(r["rank"] for r in out) == list(range(1, 21))
    pris = [r["priority"] for r in
            sorted(out, key=lambda r: r["rank"])]
    assert pris == sorted(pris, reverse=True)
    # DLT estimator: est = max(w, tau) >= w, and tau is a single value
    taus = {r["est_weight"] for r in out if r["est_weight"] > r["weight"]}
    assert len(taus) <= 1
    assert all(r["est_weight"] >= r["weight"] for r in out)


def test_priority_sample_nested_in_k(spark):
    docs = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)], "id long, w double")
    small = {r["key"] for r in priority_sample(docs, "id", "w", k=10).collect()}
    big = {r["key"] for r in priority_sample(docs, "id", "w", k=30).collect()}
    assert small <= big


def test_priority_sample_small_input_exact(spark):
    """n <= k: everything sampled, tau = 0, estimator exact."""
    docs = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(5)], "id long, w double")
    out = priority_sample(docs, "id", "w", k=10).collect()
    assert len(out) == 5
    assert all(r["est_weight"] == r["weight"] for r in out)


def test_priority_sample_skips_nonpositive_and_validates(spark):
    docs = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double")
    out = priority_sample(docs, "id", "w", k=10).collect()
    assert [r["key"] for r in out] == [3]
    with pytest.raises(ValueError):
        priority_sample(docs, "id", "w", k=0)


def test_priority_sample_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(i, float(1 + (i * 37) % 11)) for i in range(150)],
        "id long, w double")
    a = priority_sample(docs, "id", "w", k=15).collect()
    b = priority_sample(docs.repartition(17), "id", "w", k=15).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_priority_sample_unbiased_total_ballpark(spark):
    """Sum of est_weight over the sample estimates the population total;
    DLT guarantees unbiasedness over the u-draws — with one fixed draw we
    only pin a generous ballpark (the pytest is about wiring, the math is
    the paper's)."""
    docs = spark.createDataFrame(
        [(i, 1.0) for i in range(1000)], "id long, w double")
    out = priority_sample(docs, "id", "w", k=100).collect()
    est_total = sum(r["est_weight"] for r in out)
    assert 0.3 * 1000 <= est_total <= 3.0 * 1000
