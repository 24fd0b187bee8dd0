"""Ordered funnel (operators/funnel.py): greedy-earliest telescoping
windows vs a brute-force Python matcher, plus window/order edge cases."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pagerank_spark.operators.funnel import funnel

T0 = dt.datetime(2024, 1, 1)


def _ev(rows):
    """rows: (event_id, minutes, user, type)."""
    return [(i, T0 + dt.timedelta(minutes=m), u, t, 0.0, "")
            for i, m, u, t in rows]


def _mk(spark, rows):
    return spark.createDataFrame(
        _ev(rows),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def _brute(rows, steps, window_min):
    """Greedy-earliest replay in Python (exact for telescoping windows)."""
    by_user = {}
    for _, m, u, t in rows:
        by_user.setdefault(u, []).append((m, t))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        t = None
        for i, s in enumerate(steps):
            cand = [m for m, ty in evs if ty == s
                    and (i == 0 or (m > t and m - t <= window_min))]
            if not cand:
                break
            t = min(cand)
            counts[i] += 1
    return counts


def test_funnel_hand_fixture(spark):
    rows = [
        (1, 0, 1, "view"), (2, 5, 1, "click"), (3, 9, 1, "purchase"),
        (4, 0, 2, "view"), (5, 200, 2, "click"),          # click too late
        (6, 0, 3, "click"), (7, 1, 3, "view"),            # wrong order
        (8, 3, 3, "click"),                               # ...then right
        (9, 0, 4, "purchase"),                            # never views
    ]
    got = funnel(_mk(spark, rows), ["view", "click", "purchase"],
                 step_window_ms=60 * 60_000).collect()
    assert [(r.step, r.event_type, r.n_users) for r in got] == [
        (1, "view", 3), (2, "click", 2), (3, "purchase", 1)]
    assert [r.conversion for r in got] == [1.0, round(2 / 3, 6), round(1 / 3, 6)]


def test_funnel_matches_brute_force(spark):
    rng = random.Random(13)
    types = ["view", "click", "purchase", "error"]
    rows = [(i, rng.randrange(0, 2000), rng.randrange(25),
             rng.choice(types)) for i in range(600)]
    steps = ["view", "click", "purchase"]
    want = _brute(rows, steps, 300)
    got = funnel(_mk(spark, rows), steps,
                 step_window_ms=300 * 60_000).collect()
    assert [r.n_users for r in got] == [c for c in want if c > 0]


def test_funnel_telescoping_not_anchored_at_first(spark):
    # step 3 lands 90 min after step 1 but only 50 after step 2:
    # telescoping windows (60 min each) accept it
    rows = [(1, 0, 1, "view"), (2, 40, 1, "click"), (3, 90, 1, "purchase")]
    got = funnel(_mk(spark, rows), ["view", "click", "purchase"],
                 step_window_ms=60 * 60_000).collect()
    assert [r.n_users for r in got] == [1, 1, 1]


def test_funnel_strict_order_same_timestamp_rejected(spark):
    rows = [(1, 0, 1, "view"), (2, 0, 1, "click")]
    got = funnel(_mk(spark, rows), ["view", "click"]).collect()
    assert [(r.step, r.n_users) for r in got] == [(1, 1)]


def test_funnel_repeated_step_type(spark):
    # view -> view needs TWO distinct-times views
    rows = [(1, 0, 1, "view"), (2, 5, 1, "view"),
            (3, 0, 2, "view")]
    got = funnel(_mk(spark, rows), ["view", "view"]).collect()
    assert [(r.step, r.n_users) for r in got] == [(1, 2), (2, 1)]


def test_funnel_empty_and_validation(spark):
    rows = [(1, 0, 1, "click")]
    assert funnel(_mk(spark, rows), ["view", "click"]).count() == 0
    with pytest.raises(ValueError):
        funnel(_mk(spark, rows), [])
    with pytest.raises(ValueError):
        funnel(_mk(spark, rows), ["view"], step_window_ms=0)


def test_funnel_partition_invariance(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 500), rng.randrange(12),
             rng.choice(["view", "click", "purchase"])) for i in range(200)]
    df = _mk(spark, rows)
    a = [tuple(r) for r in funnel(df, ["view", "click"]).collect()]
    b = [tuple(r) for r in funnel(df.repartition(9),
                                  ["view", "click"]).collect()]
    assert a == b
