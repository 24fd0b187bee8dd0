"""Deterministic dataset splitting and sampling for training pipelines.

A training corpus at 10^12-document scale needs its train/val/test
assignment to be (a) a pure function of a stable document key — never of
partition layout, row order, or cluster size — so re-runs, backfills, and
incremental appends land every document in the same split forever, and
(b) computable without any shuffle: both operators here are narrow
projections/filters over built-in expressions (md5 + modular arithmetic,
JVM-side, whole-stage codegen), so they cost one scan at any scale and
push down beneath downstream joins.

The hash is ``shared_hash60`` (first 15 md5 hex digits as int64,
operators/dedup.py) — computable verbatim in DuckDB, which makes every
assignment value-hash checkable by the SQL oracle, and uniform enough
that split sizes concentrate tightly around the requested weights
(binomial, relative error O(1/sqrt(n_docs · w))).

Properties tests rely on:
  * partition-invariant and deterministic (pure column function);
  * splits are disjoint and exhaustive (CASE over one bucket value);
  * ``hash_sample`` rates are NESTED: rate r1 <= r2 implies
    sample(r1) is a subset of sample(r2) (thresholding one hash), so
    growing a sample never churns previously selected documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shared_hash60

BUCKETS = 10_000  # split resolution: weights quantized to 0.01%


def split_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) for a key column: hash(key || salt).

    ``salt`` derives independent assignments from the same keys (e.g. a
    fresh fold layout per experiment) — change the salt, never the key.
    """
    return F.pmod(shared_hash60(F.concat(key.cast("string"), F.lit(salt))),
                  F.lit(BUCKETS))


def dataset_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label, deterministically by ``key_col``.

    ``weights`` maps label -> fraction (normalized to sum 1; insertion
    order defines the bucket layout, so keep it fixed across runs).
    Default 80/10/10 train/val/test. Pure projection: no shuffle, no RDD,
    no sampling state — the 100-TB plan is one codegen'd scan.

    NULL keys: md5(NULL) is NULL, every ``bucket < t`` comparison is NULL
    (never true), so NULL-keyed rows deterministically take the LAST
    label — identically in Spark and the DuckDB oracle. Same mechanics
    drop NULL keys from every ``hash_sample`` (a NULL filter predicate).
    Key columns are expected non-null; this pins the failure mode rather
    than leaving it engine-defined.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and non-empty: {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights sum to zero")

    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label] / total
        threshold = int(round(acc * BUCKETS))
        cond = bucket < F.lit(threshold)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "") -> DataFrame:
    """Deterministic ~``rate`` sample by key hash (0 <= rate <= 1).

    Unlike ``DataFrame.sample`` this is reproducible across runs, cluster
    sizes, and partitionings, and is NESTED across rates (see module
    docstring). One narrow filter; pushes down to the scan.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    threshold = int(round(rate * BUCKETS))
    return df.filter(split_bucket(F.col(key_col), salt) < F.lit(threshold))


def duckdb_bucket_sql(key_expr: str, salt: str = "") -> str:
    """The DuckDB expression computing exactly ``split_bucket`` (oracle)."""
    s = f"CAST({key_expr} AS VARCHAR) || '{salt}'" if salt else f"CAST({key_expr} AS VARCHAR)"
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT % {BUCKETS})"
