"""As-of join (operators/asof.py): brute-force backward-match replay,
equal-timestamp convention, tolerance, null-payload atomicity, and a
DuckDB native ASOF JOIN cross-check."""

from __future__ import annotations

import random

import pytest

from pagerank_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _brute(left, right, tolerance=None):
    """left: (key, ts, lpay); right: (key, ts, rpay) with unique (key, ts)."""
    out = []
    for k, t, lp in left:
        cand = [(rt, rp) for rk, rt, rp in right if rk == k and rt <= t
                and (tolerance is None or t - rt <= tolerance)]
        if cand:
            rt, rp = max(cand)
            out.append((k, t, lp, rp, rt))
        else:
            out.append((k, t, lp, None, None))
    return sorted(out)


def test_asof_matches_brute_force(spark):
    rng = random.Random(17)
    left = [(rng.randrange(6), rng.randrange(1000), i) for i in range(150)]
    right_ts = {(rng.randrange(6), rng.randrange(1000)) for _ in range(120)}
    right = [(k, t, k * 10000 + t) for k, t in right_ts]
    got = asof_join(
        _mk(spark, left, "user long, ts long, lid long"),
        _mk(spark, right, "user long, ts long, rval long"), on="user")
    rows = sorted((r.user, r.ts, r.lid, r.rval_r, r.ts_r)
                  for r in got.collect())
    assert rows == _brute(left, right)


def test_asof_equal_ts_matches_and_tolerance(spark):
    left = [(1, 100, 1), (1, 150, 2), (1, 500, 3)]
    right = [(1, 100, 7), (1, 140, 8)]
    l = _mk(spark, left, "user long, ts long, lid long")
    r = _mk(spark, right, "user long, ts long, v long")
    by = {x.lid: (x.v_r, x.ts_r) for x in asof_join(l, r, "user").collect()}
    # equal ts matches (<= convention); later left rows carry the newest
    assert by == {1: (7, 100), 2: (8, 140), 3: (8, 140)}
    by = {x.lid: (x.v_r, x.ts_r)
          for x in asof_join(l, r, "user", tolerance_ms=50).collect()}
    assert by == {1: (7, 100), 2: (8, 140), 3: (None, None)}


def test_asof_null_payload_stays_atomic(spark):
    # right row B has a null field; a per-column carry would stitch A's
    # x together with B's ts — the struct carry must keep rows whole
    left = [(1, 10, 1)]
    right = [(1, 1, 5, None), (1, 2, None, 7)]
    got = asof_join(
        _mk(spark, left, "user long, ts long, lid long"),
        _mk(spark, right, "user long, ts long, x long, y long"),
        on="user").collect()
    assert [(r.x_r, r.y_r, r.ts_r) for r in got] == [(None, 7, 2)]


def test_asof_unmatched_and_validation(spark):
    l = _mk(spark, [(1, 10, 1), (2, 10, 2)], "user long, ts long, lid long")
    r = _mk(spark, [(1, 20, 9)], "user long, ts long, v long")
    got = {x.lid: x.v_r for x in asof_join(l, r, "user").collect()}
    assert got == {1: None, 2: None}   # future-only / absent key
    with pytest.raises(ValueError):
        asof_join(l, r, "user", tolerance_ms=-1)
    clash = _mk(spark, [(1, 10, 1)], "user long, ts long, v_r long")
    with pytest.raises(ValueError):
        asof_join(clash, r, "user")


def test_asof_agrees_with_duckdb_native(spark):
    import duckdb

    rng = random.Random(29)
    left = [(rng.randrange(5), rng.randrange(400), i) for i in range(100)]
    right_ts = {(rng.randrange(5), rng.randrange(400)) for _ in range(80)}
    right = [(k, t, float(k + t)) for k, t in right_ts]
    got = sorted((r.user, r.ts, r.lid, r.price_r, r.ts_r)
                 for r in asof_join(
        _mk(spark, left, "user long, ts long, lid long"),
        _mk(spark, right, "user long, ts long, price double"),
        on="user").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(user BIGINT, ts BIGINT, lid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left)
    con.execute("CREATE TABLE r(user BIGINT, ts BIGINT, price DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", right)
    want = sorted(tuple(x) for x in con.execute(
        "SELECT l.user, l.ts, l.lid, r.price, r.ts FROM l "
        "ASOF LEFT JOIN r ON l.user = r.user AND l.ts >= r.ts").fetchall())
    assert got == want


def test_asof_partition_invariance(spark):
    rng = random.Random(41)
    left = [(rng.randrange(4), rng.randrange(300), i) for i in range(80)]
    right = [(k, t, k + t) for k, t in
             {(rng.randrange(4), rng.randrange(300)) for _ in range(60)}]
    l = _mk(spark, left, "user long, ts long, lid long")
    r = _mk(spark, right, "user long, ts long, v long")
    a = sorted(map(tuple, asof_join(l, r, "user").collect()))
    b = sorted(map(tuple, asof_join(l.repartition(7), r.repartition(3),
                                    "user").collect()))
    assert a == b
