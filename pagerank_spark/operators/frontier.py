"""Crawl-frontier planning: politeness scheduling and URL-pattern mining.

A web crawler's frontier at 10^12-URL scale is itself a big-data problem:
the candidate set must be turned into a fetch plan that (a) respects
per-host politeness (at most k simultaneous fetches per host per time
slot — the crawl-delay contract every large crawler honors), and (b)
avoids spider traps / boilerplate URL families (calendar pages,
session-id paths, faceted-search grids) that inflate a host's frontier
without adding content. Both are pure DataFrame computations over the
(url, host, priority) frontier table; see also streaming/ingest.py for
the incremental crawl-delta path and operators/sketch.py for the Bloom
seen-set that feeds this module its *new* candidates.

Scale notes:
* ``frontier_schedule`` is ONE window per host. The per-host cap is
  applied as ``rank <= max_per_host``, which Spark 4 rewrites to a
  partial WindowGroupLimit BELOW the exchange (InferWindowGroupLimit —
  the same skew-safe shape measured in the top-fanout sampling campaign,
  BENCH/BASELINE.md): a 100M-URL spam host ships at most ``max_per_host``
  rows to the window, so a hot host cannot straggle the shuffle.
* ``url_patterns`` is two hash aggregates over a regex projection —
  map-side combinable, no joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.functions.urls import url_host, url_path


def frontier_schedule(frontier: DataFrame, key_col: str = "url",
                      host_col: str = "host", priority_col: str = "priority",
                      per_slot: int = 2, max_per_host: int = 1000) -> DataFrame:
    """Assign every frontier URL a politeness slot: within each host, rank
    by priority (desc, key-asc tiebreak — fully deterministic) and fetch
    the top ``per_slot`` in slot 0, the next ``per_slot`` in slot 1, ...
    so no host ever sees more than ``per_slot`` concurrent fetches.
    URLs ranked past ``max_per_host`` are deferred (dropped from this
    plan) — the frontier-cap that both bounds the window shuffle (see
    module docstring) and starves spider traps.

    Returns (key, host, priority, host_rank, slot), host_rank 1-based.
    """
    if per_slot < 1:
        raise ValueError(f"per_slot must be >= 1: {per_slot}")
    if max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1: {max_per_host}")
    return (frontier
            .select(F.col(key_col).alias("key"),
                    F.col(host_col).alias("host"),
                    F.col(priority_col).alias("priority"))
            .withColumn("host_rank", F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.desc("priority"), F.asc("key"))))
            .filter(F.col("host_rank") <= max_per_host)
            .withColumn("slot", ((F.col("host_rank") - 1) /
                                 F.lit(per_slot)).cast("int")))


# digit runs and long hex runs are the URL-family variables: /2024/01/05/,
# ?sid=ab12ef..., /product/98321 all collapse onto one template
_DIGITS = "[0-9]+"
_HEX_RUN = "[0-9a-f]{8,}"


def url_path_template(url_col: Column) -> Column:
    """Collapse a URL's path onto its family template: lowercase path with
    digit runs -> 'N' and long hex runs -> 'H'. Pure JVM regex projection."""
    p = F.lower(url_path(url_col))
    return F.regexp_replace(F.regexp_replace(p, _HEX_RUN, "H"), _DIGITS, "N")


def url_patterns(urls: DataFrame, url_col: str = "url",
                 min_urls: int = 2) -> DataFrame:
    """Mine URL-family templates: (pattern, n_urls, n_hosts) for every path
    template matched by >= ``min_urls`` distinct URLs, ordered nowhere
    (caller sorts). High n_urls/low-content families (calendars, session
    ids, pagination grids) are crawl-budget sinks; n_hosts says whether a
    family is host-local (a trap) or web-wide (a platform convention).

    Two map-side-combinable aggregates over one narrow regex projection:
    distinct (template, host) resolves n_hosts without count(distinct)'s
    expand, n_urls sums per-host URL counts."""
    u = F.col(url_col)
    per_host = (urls
                .select(url_path_template(u).alias("pattern"),
                        url_host(u).alias("host"))
                .groupBy("pattern", "host")
                .agg(F.count(F.lit(1)).alias("n")))
    return (per_host.groupBy("pattern")
            .agg(F.sum("n").alias("n_urls"),
                 F.count(F.lit(1)).alias("n_hosts"))
            .filter(F.col("n_urls") >= min_urls))
