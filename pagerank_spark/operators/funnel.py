"""Ordered funnel analysis over the event log.

The behavioral-analytics staple: of the users who did step 1 ("view"),
how many went on to do step 2 ("click") and then step 3 ("purchase"),
each within a conversion window of the PREVIOUS step? Complements the
rollup/sessionization event surface (streaming/rollup.py,
__spark_entry__ events_sessionization) with the one query shape those
can't express: ordered sequence matching per user.

Semantics: user u completes step i+1 iff some event of that type exists
with  t_{i+1} > t_i  and  t_{i+1} - t_i <= step_window_ms,  where t_i is
u's EARLIEST completion time of step i. Greedy-earliest is EXACT for
these telescoping per-step windows (exchange argument: an earlier t_i
only widens the admissible (t_i, t_i + W] interval's right edge for
step i+1 — any valid assignment can be rewritten to the greedy one), so
no per-user backtracking is ever needed.

Scale shape (10^12 events): one filtered min-aggregate per step (map-side
combinable), each joined against the previous step's frontier keyed by
user — frontiers only shrink, so step k's join is bounded by step k-1's
converters. The per-step counts collapse via a single union + count
rather than one action per step, and the conversion denominator joins
back as a 1-row broadcast. No windows, no per-user event sorting, no
collect.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_MS = 7 * 24 * 3600 * 1000


def funnel(events: DataFrame, steps: Sequence[str],
           step_window_ms: int = WEEK_MS, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Per-step funnel counts: ``(step, event_type, n_users, conversion)``
    ordered by step (1-based), with conversion = n_users / step-1 users
    rounded to 6 (a 1.0 first row). Empty when nobody did step 1.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    if step_window_ms <= 0:
        raise ValueError(f"step_window_ms must be positive: {step_window_ms}")
    u, ts, et = F.col(user_col), F.col(ts_col), F.col(type_col)
    ms = F.unix_millis(ts.cast("timestamp"))

    frontier = (events.filter(et == steps[0])
                .groupBy(u.alias("user_id"))
                .agg(F.min(ms).alias("t")))
    tagged = [frontier.select(F.lit(1).alias("step"), "user_id")]
    for i, step_type in enumerate(steps[1:], start=2):
        ev = events.filter(et == step_type).select(
            u.alias("user_id"), ms.alias("t2"))
        frontier = (ev.join(frontier, "user_id")
                    .filter((F.col("t2") > F.col("t"))
                            & (F.col("t2") - F.col("t")
                               <= F.lit(int(step_window_ms))))
                    .groupBy("user_id").agg(F.min("t2").alias("t"))
                    .localCheckpoint(eager=False))
        tagged.append(frontier.select(F.lit(i).alias("step"), "user_id"))

    all_steps = reduce(DataFrame.unionByName, tagged)
    # the <= len(steps)-row count table feeds BOTH the output and the
    # step-1 denominator; checkpointing it keeps the O(events) frontier
    # chain from being computed twice
    counts = (all_steps.groupBy("step")
              .agg(F.count(F.lit(1)).alias("n_users"))
              .localCheckpoint(eager=False))
    names = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, event_type string")
    base = counts.filter(F.col("step") == 1) \
        .select(F.col("n_users").alias("n1"))
    return (names.join(counts, "step")
            .crossJoin(F.broadcast(base))
            .select("step", "event_type", "n_users",
                    F.round(F.col("n_users") / F.col("n1").cast("double"), 6)
                    .alias("conversion"))
            .orderBy("step"))
