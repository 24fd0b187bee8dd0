"""As-of (backward temporal) join — the time-series operator Spark's
join zoo lacks.

For every left row, attach the single right row with the LARGEST right
timestamp satisfying ``right.ts <= left.ts`` within the same key group
(and optionally within ``tolerance_ms``) — "what was the latest quote
when this trade printed", "which click preceded this purchase". ANSI
engines ship it natively (DuckDB ``ASOF JOIN``, the oracle used in
__spark_entry__.py); on Spark the naive formulations are a range join
(quadratic per key) or a per-key ``applyInPandas`` (Python in the hot
path). This implementation is the scalable union trick instead:

    union(left tagged 1, right tagged 0)
      -> one shuffle by key
      -> per-key sort by (ts, tag)
      -> last(right payload, ignorenulls) carried forward
      -> keep the left rows

ONE exchange total, all JVM-side, and the carry-forward window is
rows-between-preceding (streaming inside each partition, no quadratic
blowup). Right rows sort BEFORE left rows at equal timestamps (tag 0 <
tag 1), which is exactly the ``<=`` match convention.

Determinism: if the right side has several rows with the same (key, ts),
"the" latest row is ambiguous — callers should pre-aggregate to unique
(key, ts) (the driver query does); otherwise the carried row is the last
in the (ts, tag, payload...) sort, which is still a total order but an
arbitrary convention.

Scale shape (10^12 rows): hash-partitioned by key, per-partition sort —
the sort-merge-join discipline; a hot key (one user with millions of
events) serializes within its task the same way it would in any
sort-based join, and the banded-prefix rewrite recorded for
adjacency_index (walks.py:34-130) applies if a profiled input needs it.
No cross join, no per-row Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              ts_col: str = "ts", tolerance_ms: int | None = None,
              suffix: str = "_r") -> DataFrame:
    """Backward as-of join of ``right`` onto ``left`` by key ``on``.

    Both inputs need an ``on`` column and a ``ts_col`` column holding
    epoch-milliseconds (BIGINT) — cast timestamps with
    ``F.unix_millis`` first; keeping the operator integer-keyed makes
    the match predicate exact. Every other right column is carried onto
    the matching left row renamed with ``suffix`` (plus ``ts_col +
    suffix`` for the matched time); left rows with no admissible right
    row keep NULLs. ``tolerance_ms`` (optional) drops matches older
    than ``left.ts - tolerance_ms``.
    """
    if tolerance_ms is not None and tolerance_ms < 0:
        raise ValueError(f"tolerance_ms must be >= 0: {tolerance_ms}")
    payload = [c for c in right.columns if c not in (on, ts_col)]
    clash = [c + suffix for c in payload + [ts_col]
             if c + suffix in left.columns]
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")

    rtypes = dict(right.dtypes)
    # the right payload travels as ONE struct so the carry-forward is
    # atomic — carrying each column independently could stitch together
    # fields of DIFFERENT right rows when payload columns hold nulls
    pack = F.struct(F.col(ts_col).alias(ts_col + suffix),
                    *[F.col(c).alias(c + suffix) for c in payload])
    null_pack = F.lit(None).cast(
        "struct<" + ",".join(
            [f"{ts_col + suffix}:{rtypes[ts_col]}"]
            + [f"{c + suffix}:{rtypes[c]}" for c in payload]) + ">")
    lhs = left.select("*", F.lit(1).alias("__tag"),
                      null_pack.alias("__r"))
    rhs = right.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("__tag"),
        pack.alias("__r"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in (on, ts_col)])
    u = lhs.unionByName(rhs)

    w = (Window.partitionBy(on)
         .orderBy(ts_col, "__tag", *[F.col("__r")[c + suffix]
                                     for c in payload])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        *[c for c in left.columns], "__tag",
        F.last("__r", ignorenulls=True).over(w).alias("__r"))
    out = (carried.filter(F.col("__tag") == 1)
           .select(*[c for c in left.columns],
                   *[F.col("__r")[c + suffix].alias(c + suffix)
                     for c in payload + [ts_col]]))
    if tolerance_ms is not None:
        stale = (F.col(ts_col) - F.col(ts_col + suffix)
                 > F.lit(int(tolerance_ms)))
        out = out.select(
            *[c for c in left.columns],
            *[F.when(stale, F.lit(None)).otherwise(F.col(c + suffix))
              .alias(c + suffix) for c in payload + [ts_col]])
    return out
