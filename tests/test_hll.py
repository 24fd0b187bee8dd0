from __future__ import annotations

import math

import pytest

from pagerank_spark.operators.hll import hll_count_distinct


def _df(spark, rows, schema="grp string, v long"):
    return spark.createDataFrame(rows, schema)


def test_hll_accuracy_raw_branch(spark):
    # 5000 distinct values, b=10 (sigma ~ 3.25%): demand within 5 sigma
    rows = [("a", i) for i in range(5000)]
    est = hll_count_distinct(_df(spark, rows), ["grp"], "v", b=10).collect()
    assert len(est) == 1
    assert abs(est[0].approx_distinct - 5000) / 5000 < 5 * 1.04 / math.sqrt(1024)


def test_hll_linear_counting_small_cardinality(spark):
    # 30 distinct with m=1024 registers: linear counting is near-exact
    rows = [("a", i % 30) for i in range(900)]
    est = hll_count_distinct(_df(spark, rows), ["grp"], "v", b=10).collect()
    assert abs(est[0].approx_distinct - 30) <= 2


def test_hll_groups_isolated_and_nulls_ignored(spark):
    rows = ([("x", i) for i in range(50)] + [("y", i) for i in range(200)]
            + [("x", None), ("y", None)])
    out = {r.grp: r.approx_distinct for r in
           hll_count_distinct(_df(spark, rows), ["grp"], "v", b=10).collect()}
    assert abs(out["x"] - 50) <= 5
    assert abs(out["y"] - 200) <= 15
    # nulls contributed nothing: a null-only group vanishes entirely
    only_null = _df(spark, [("z", None)])
    assert hll_count_distinct(only_null, ["grp"], "v", b=10).count() == 0


def test_hll_duplicates_do_not_move_the_estimate(spark):
    once = [("a", i) for i in range(300)]
    many = once * 7
    e1 = hll_count_distinct(_df(spark, once), ["grp"], "v", b=9).collect()
    e2 = hll_count_distinct(_df(spark, many), ["grp"], "v", b=9).collect()
    assert e1[0].approx_distinct == e2[0].approx_distinct


def test_hll_partition_invariance_and_validation(spark):
    rows = [("g", i * 31) for i in range(400)]
    df = _df(spark, rows)
    a = hll_count_distinct(df, ["grp"], "v", b=8).collect()
    b = hll_count_distinct(df.repartition(7, "v"), ["grp"], "v", b=8).collect()
    assert a[0].approx_distinct == b[0].approx_distinct
    with pytest.raises(ValueError):
        hll_count_distinct(df, ["grp"], "v", b=3)
