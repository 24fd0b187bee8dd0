"""Frequency and membership sketches: count-min heavy hitters and a
Bloom-filter crawl-frontier membership check.

Absent from the reference (a CUDA PageRank kernel, kernel_bblock.cu) —
engine-surface depth for the web-scale ingestion side: at 10^12 events or
URLs, "how often does this key occur" and "have we crawled this URL
before" must not require a full join against history. Both sketches here
are built in ONE pass with map-side-combinable aggregates and are
re-usable across batches; estimates and membership probes touch only the
sketch, never the history table.

Count-min (Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 2005): depth
hash rows x width buckets of counters; est(key) = min over rows of the
key's bucket counter — always >= the true count, over by at most
eps * total with the usual (eps, delta) sizing. The sketch table is
depth*width rows regardless of input size, so it broadcasts.

Bloom filter (Bloom, CACM 1970): the seen-set is projected to <= m
distinct set-bit positions; a candidate is "maybe seen" iff all of its
``hashes`` bit positions are set. No false negatives ever; false-positive
rate ~ (set_fraction)^hashes. The bit table is bounded by m rows (one
int each), independent of how many keys were inserted — at web scale it
is the compact reusable summary of the crawl history, sized by the
operator's m, not by the corpus.

All hashing is the shared md5-derived 60-bit hash (operators/dedup.py
shared_hash60 discipline), so every pipeline here is reproducible
verbatim in the DuckDB SQL oracle — integer-only outputs, zero
floating-point parity risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shared_hash60


def _bucket(key: Column, salt: str, i: int, width: int) -> Column:
    """Row-``i`` bucket of ``key``: shared_hash60(key || ':salt:i') % width.

    DuckDB twin: ('0x' || substr(md5(k || ':salt:' || i), 1, 15))::BIGINT
    % width — byte-identical input string, identical bucket.
    """
    return F.pmod(
        shared_hash60(F.concat(key.cast("string"), F.lit(f":{salt}:{i}"))),
        F.lit(width))


def count_min_sketch(df: DataFrame, key_col: str, depth: int = 4,
                     width: int = 1024, salt: str = "cms") -> DataFrame:
    """Build the count-min table ``(d int, bucket long, cnt long)``.

    One narrow projection (each row emits its ``depth`` buckets) into one
    hash aggregate: partial counters combine map-side, so the shuffle is
    bounded by partitions * depth * width rows — independent of input
    size. The result is at most depth*width rows: cache it, broadcast it,
    or union-merge it across batches (counters add).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1: {depth}, {width}")
    key = F.col(key_col)
    pairs = df.select(F.posexplode(F.array(
        *[_bucket(key, salt, i, width) for i in range(depth)]
    )).alias("d", "bucket"))
    return pairs.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(keys: DataFrame, sketch: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024,
                 salt: str = "cms") -> DataFrame:
    """Point-estimate counts for ``keys`` (one row per key) against a
    ``count_min_sketch`` table built with the SAME (depth, width, salt).

    Returns ``keys`` + ``est_count`` = min over the depth rows of the
    key's bucket counters (0 if a bucket row is absent, i.e. nothing ever
    hashed there). The join broadcasts the sketch (depth*width rows), so
    estimating any number of candidate keys is a map-side lookup — the
    history table is never touched.
    """
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.posexplode(F.array(
            *[_bucket(key, salt, i, width) for i in range(depth)]
        )).alias("d", "bucket"))
    return (probes
            .join(F.broadcast(sketch), ["d", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def cms_heavy_hitters(df: DataFrame, key_col: str, k: int = 25,
                      depth: int = 4, width: int = 1024,
                      salt: str = "cms") -> DataFrame:
    """Top-``k`` keys by count-min estimate, with the exact count beside
    the estimate: ``(key, est_count, exact_count)`` ordered by
    (est_count desc, key) — est_count >= exact_count always (one-sided
    error is the count-min contract; the pytest property pins it).

    The candidate enumeration here is the exact distinct-key aggregate —
    at test scale that doubles as the oracle check that estimates bound
    truth. At 10^12 events the candidate set comes from a cheaper stream
    (e.g. per-partition local top-k union), and each candidate is still a
    broadcast sketch lookup; the sketch build itself never changes shape.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    sketch = count_min_sketch(df, key_col, depth, width, salt)
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(exact.select(key_col), sketch, key_col,
                       depth, width, salt)
    return (exact.join(est, key_col)
            .orderBy(F.desc("est_count"), key_col)
            .limit(k)
            .select(key_col, "est_count", "exact_count"))


def bloom_bits(seen: DataFrame, key_col: str, m_bits: int = 1 << 20,
               hashes: int = 3, salt: str = "bloom") -> DataFrame:
    """Project the seen-set to its Bloom bit table ``(bit long)`` —
    distinct positions only, so the table is bounded by
    min(n_keys * hashes, m_bits) rows whatever the history size. Build
    once per epoch and reuse; inserting a new batch is a distinct-union.
    """
    if m_bits < 1 or hashes < 1:
        raise ValueError(f"m_bits and hashes must be >= 1: {m_bits}, {hashes}")
    key = F.col(key_col)
    return (seen.select(F.explode(F.array(
        *[_bucket(key, salt, i, m_bits) for i in range(hashes)]
    )).alias("bit")).distinct())


def bloom_maybe_contains(candidates: DataFrame, bits: DataFrame,
                         key_col: str, m_bits: int = 1 << 20,
                         hashes: int = 3, salt: str = "bloom") -> DataFrame:
    """Flag every candidate ``maybe_seen`` iff ALL of its bit positions
    are set in ``bits`` (a ``bloom_bits`` table with the SAME
    (m_bits, hashes, salt)). No false negatives: a key that went into the
    filter always comes back maybe_seen = true; false positives at the
    standard (1 - e^(-hashes*n/m))^hashes rate.

    Plan shape: candidates explode to ``hashes`` probe rows, one
    LEFT ANTI join against the bit table finds keys with ANY unset bit
    (= definitely new), and one left join marks the rest. The bit table
    is the only state — bounded by m_bits rows — so the whole check costs
    O(candidates * hashes) join rows against a broadcastable summary, not
    a join against the crawl history.
    """
    key = F.col(key_col)
    probes = candidates.select(key_col, F.explode(F.array(
        *[_bucket(key, salt, i, m_bits) for i in range(hashes)]
    )).alias("bit"))
    definitely_new = (probes.join(bits, "bit", "left_anti")
                      .select(key_col).distinct()
                      .withColumn("_new", F.lit(True)))
    return (candidates.join(definitely_new, key_col, "left")
            .select(*candidates.columns,
                    F.col("_new").isNull().alias("maybe_seen")))
