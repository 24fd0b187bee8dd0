"""Structured Streaming operators over an events stream.

The reference has no streaming surface (SURVEY §2.8 — its "iteration" is a
synchronous driver loop), so these operators exist for the engine's
training-data-pipeline obligations: a telemetry/event stream lands
continuously and the warehouse wants windowed rollups and sessions.

* ``hourly_rollup_stream`` — event-time tumbling window + watermark for
  late data; all built-in (JVM-side) operators.
* ``sessionize_stream`` — custom stateful operator via
  ``applyInPandasWithState``: per-user session assembly with a 30-minute
  inactivity gap; an EVENT-TIME timeout (watermark-driven) flushes a
  session once the watermark passes last_event + gap. Event time, not
  processing time: wall-clock timeouts keep a bounded drain spinning
  no-data batches forever ("cleaning up state"), and replaying history
  would close sessions spuriously.

Both take a streaming DataFrame from ``stream_events`` (file source; a
Kafka source differs only in ``.format()``) and return a streaming
DataFrame the caller binds to a sink; tests drive them with
``trigger(availableNow=True)`` into a memory sink and compare against the
batch equivalents in ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")

SESSION_GAP_MS = 30 * 60 * 1000

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long")
_STATE_SCHEMA = "start long, last long, n long"


def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source event stream (one parquet file = one micro-batch unit)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window; late rows beyond ``watermark``
    are dropped and their window state reclaimed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        # exact DECIMAL accumulation: the sum is identical regardless of
        # row/micro-batch arrival order, so the streaming result is
        # hash-comparable against the batch/DuckDB rollup (fp doubles
        # would differ in the last ulps by summation order)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .select(F.col("win.start").alias("hour"), "event_type",
                "n_events", "sum_value")
    )


def _sessionize(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user session assembly. State = (start_ms, last_ms, n_events).

    Emits a row per CLOSED session: a gap > 30 min inside the batch, or an
    EVENT-TIME timeout firing once the watermark passes
    last_event + gap for an idle user.
    """
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n)],
                               columns=["user_id", "start_ms", "last_ms", "n"])
        return

    ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
    ms = (ts.astype("int64") // 1_000_000).to_list()
    start, last, n = state.get if state.exists else (None, None, 0)
    closed = []
    for t in ms:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_MS:
            closed.append((user_id, start, last, n))
            start, last, n = t, t, 1
        else:
            # late (out-of-order, within-watermark) events from a later
            # micro-batch may sort BEFORE state: never move the session
            # boundaries backward
            start, last, n = min(start, t), max(last, t), n + 1
    state.update((start, last, n))
    # fire when the event-time watermark passes the inactivity gap
    state.setTimeoutTimestamp(
        max(last + SESSION_GAP_MS, state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "start_ms", "last_ms", "n"])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Closed sessions per user via applyInPandasWithState (Arrow-batched
    custom stateful operator — the engine's §2.8 UDF/state surface)."""
    out = events.withWatermark("ts", "30 minutes").groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType="user_id long, start_ms long, last_ms long, n long",
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_millis(F.col("start_ms")).alias("session_start"),
        F.timestamp_millis(F.col("last_ms")).alias("session_end"),
        F.col("n").alias("n_events"),
    )


def run_to_memory(stream: DataFrame, name: str, output_mode: str = "append"):
    """Drain all available input into a memory sink (test/bench harness).

    Uses processAllAvailable + stop rather than trigger(availableNow):
    a stateful operator with an event-time timeout may need extra no-data
    micro-batches after the last input batch for the final watermark
    advance to fire pending timeouts; processAllAvailable blocks until
    the backlog (including those no-data batches) is fully processed,
    while an availableNow query's termination point depends on trigger
    accounting, not on the state having drained."""
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    q.processAllAvailable()
    q.stop()
    return q
