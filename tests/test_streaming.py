"""Structured Streaming: windowed rollup vs batch oracle, watermark drop of
late data, and stateful sessionization vs the batch sessionizer."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from pagerank_spark.streaming.rollup import (hourly_rollup_stream,
                                             run_to_memory,
                                             sessionize_stream, stream_events)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, rows, path):
    df = spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, et, float(v), "{}")
         for i, (s, u, et, v) in enumerate(rows)],
        schema="event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def test_hourly_rollup_matches_batch(spark, tmp_path):
    rows = [(s, s % 3, "view" if s % 2 else "click", s * 0.5)
            for s in range(0, 7200, 97)]
    batch_df = _mk_events(spark, rows, str(tmp_path / "ev"))
    stream = hourly_rollup_stream(stream_events(spark, str(tmp_path / "ev")))
    # complete mode: every window emitted each trigger (append + availableNow
    # would hold back windows the watermark has not sealed)
    run_to_memory(stream, "rollup_t", output_mode="complete")
    got = {(r.hour, r.event_type): (r.n_events, r.sum_value)
           for r in spark.table("rollup_t").collect()}
    want = {(r.hour, r.event_type): (r.n_events, r.sum_value)
            for r in batch_df.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1])


def test_sessionize_late_event_does_not_split_session(spark, tmp_path):
    """A late (out-of-order, within-watermark) event arriving in a LATER
    micro-batch must not move the session's `last` backward — that would
    spuriously close the session on the next on-time event."""
    d = tmp_path / "ev_late"
    d.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(
            [(i, T0 + dt.timedelta(seconds=s), u, et, float(v), "{}")
             for i, (s, u, et, v) in enumerate(rows)],
            schema="event_id long, ts timestamp, user_id long, "
                   "event_type string, value double, props string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / name))

    # batch 1: 10:00:00 and 10:20:00; batch 2: late 10:05:00 + on-time 10:40:00
    write_file("b1", [(0, 9, "view", 1.0), (1200, 9, "view", 1.0)])
    write_file("b2", [(300, 9, "view", 1.0), (2400, 9, "view", 1.0)])
    ev = (spark.readStream
          .schema("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
          .option("maxFilesPerTrigger", 1)
          .parquet(str(d) + "/*/*.parquet"))
    run_to_memory(sessionize_stream(ev), "late_t", output_mode="append")
    # 10:40 - true_last(10:20) = 20 min < gap: one session, nothing closed.
    # With the backward-last bug, 10:40 - 10:05 = 35 min closes it spuriously.
    assert spark.table("late_t").count() == 0


def test_sessionize_stream_closed_sessions(spark, tmp_path):
    # user 7: two sessions separated by a 2-hour gap; the second stays open
    rows = [(0, 7, "view", 1.0), (60, 7, "view", 1.0), (120, 7, "click", 1.0),
            (7320, 7, "view", 1.0), (7380, 7, "view", 1.0)]
    _mk_events(spark, rows, str(tmp_path / "ev2"))
    stream = sessionize_stream(stream_events(spark, str(tmp_path / "ev2")))
    run_to_memory(stream, "sessions_t", output_mode="append")
    got = spark.table("sessions_t").collect()
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 7 and s.n_events == 3
    assert s.session_start == T0 and s.session_end == T0 + dt.timedelta(seconds=120)
