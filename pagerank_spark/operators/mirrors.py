"""Mirror-host detection: passage-set Jaccard between hosts.

Web corpora carry mirror sites — the same content served under several
hosts (Bharat & Broder, "Mirror, mirror on the Web: a study of host
pairs with replicated content", WWW 1999). Detecting them host-pair-wise
matters to the LLM pipeline because document-level dedup (MinHash,
passage_dedup) removes COPIES but keeps sampling weight spread across
the mirrors, and crawl scheduling wastes budget refetching them.

The operator scores host pairs by exact Jaccard over their DISTINCT
passage sets (dedup.passages — the CCNet unit shared with passage_dedup
/ host_boilerplate): shared passages via one passage-keyed equi-join,
set sizes via one per-host aggregate.

Absent from the reference (a rank engine); the host-graph tier of the
dedup surface next to host_boilerplate.

Scale shape (10^8 hosts): the (host, passage) table is ONE distinct
(map-side combinable); passages on more than ``max_host_freq`` hosts are
dropped before pairing (cookie banners and licence blocks appear on
thousands of unrelated hosts and carry no mirroring signal — the
dedup.py stop-shingle discipline), which caps the join fan-out per
passage at max_host_freq²; per-host set sizes are an O(hosts) aggregate
joined back (broadcast-sized under AQE); the pair count is map-side
combinable. No all-pairs anywhere — host pairs sharing nothing are
never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import passages


def mirror_hosts(docs: DataFrame, *, w: int = 20, min_shared: int = 2,
                 max_host_freq: int = 10, host_col: str = "source",
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Host pairs ranked by passage-set overlap: ``(host_a, host_b,
    shared, n_a, n_b, jaccard)`` with host_a < host_b, for pairs sharing
    ≥ ``min_shared`` distinct w-token passages. ``jaccard`` is
    |A∩B| / |A∪B| rounded to 6 decimals; ``n_a``/``n_b`` are the hosts'
    distinct-passage counts (BEFORE the hot-passage drop, so the score
    is the true set Jaccard, conservatively lowered by any dropped
    cross-host boilerplate).
    """
    hp = (passages(docs, w=w, id_col=id_col, text_col=text_col)
          .join(docs.select(F.col(id_col).alias(id_col),
                            F.col(host_col).alias("host")), id_col)
          .select("host", "passage")
          .distinct())
    sizes = hp.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    rare = (hp.groupBy("passage")
            .agg(F.count(F.lit(1)).alias("hf"))
            .filter(F.col("hf") <= max_host_freq)
            .select("passage"))
    hpr = hp.join(rare, "passage")
    pairs = (hpr.alias("x")
             .join(hpr.alias("y"),
                   (F.col("x.passage") == F.col("y.passage"))
                   & (F.col("x.host") < F.col("y.host")))
             .groupBy(F.col("x.host").alias("host_a"),
                      F.col("y.host").alias("host_b"))
             .agg(F.count(F.lit(1)).alias("shared"))
             .filter(F.col("shared") >= min_shared))
    return (pairs
            .join(sizes.select(F.col("host").alias("host_a"),
                               F.col("n").alias("n_a")), "host_a")
            .join(sizes.select(F.col("host").alias("host_b"),
                               F.col("n").alias("n_b")), "host_b")
            .select("host_a", "host_b", "shared", "n_a", "n_b",
                    F.round(F.col("shared")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("shared")), 6).alias("jaccard")))
