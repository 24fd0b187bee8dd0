"""Deterministic synthetic web-pages table (FIXTURES.md F1) and graph fixtures.

The pages table matches BASELINE.json's ``input_hint`` schema:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
Generation is distributed (``spark.range(n).mapInPandas``) and each row is a
pure function of its index ``i`` under fixed integer mixes, so the output is
identical regardless of partitioning, core count, or run — the property the
byte-identical-text invariant rests on.

Outlink structure (defines the link graph):
  * page i emits k_i = 1 + (i*2654435761 mod 7) anchors,
    target_t = mix3(i, t, SEED) mod (i+1)  — favors low ids (hubs)
  * every 13th page has zero outlinks (dangling; reference models these via
    the ``bookmark`` vector, /root/reference/kernel_bblock.cu:606-609)
  * every 17th page additionally links to page 0 (hot vertex / skew — the
    regime the reference's degree-binned kernels target,
    /root/reference/kernel_bblock.cu:622-692)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pagerank_spark.functions.hashing import mix2, mix3

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
SEED = 42
_EPOCH = pd.Timestamp("2026-01-01T00:00:00")  # session TZ is UTC

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "graph", "spark", "vector", "matrix", "rank",
    "crawl",
]

KNUTH = 2654435761  # Knuth multiplicative-hash constant (public domain)


def url_of(i: int, n_sites: int = 97) -> str:
    return f"https://site{i % n_sites}.example/page{i}"


def words_of(i: int) -> str:
    """deterministic_words(seed, i): 5..24 vocab words picked by fixed mixes."""
    count = 5 + int(mix2(i, SEED ^ 0xC0FFEE) % np.uint64(20))
    idx = mix3(np.full(count, i, dtype=np.uint64), SEED, 0xFACE) % np.uint64(len(_VOCAB))
    return " ".join(_VOCAB[int(j)] for j in idx)


def text_of(i: int) -> str:
    return f"page {i} body {words_of(i)}"


def outlink_ids(i: int) -> list[int]:
    """Target page indices of page i under the fixture's
    preferential-attachment rule (position t matters: ``anchor_word(i, t)``
    keys off it). Shared by the HTML generator and the driver-contract
    DuckDB oracles, which unroll the expected edge list from this rule."""
    if i % 13 == 0:
        return []  # dangling page
    k = 1 + (i * KNUTH) % 7
    targets = [int(mix3(i, t, SEED) % np.uint64(i + 1)) for t in range(k)]
    if i % 17 == 0:
        targets.append(0)  # hot vertex
    return targets


def outlinks_of(i: int, n_sites: int = 97) -> list[str]:
    """Target urls of page i under the fixture's preferential-attachment rule."""
    return [url_of(j, n_sites) for j in outlink_ids(i)]


def anchor_word(i: int, t: int) -> str:
    """Deterministic anchor text for page i's t-th link (a vocab word).

    Anchors are stripped wholesale by ``extract_text``, so varying this
    does NOT touch the byte-identical extracted-text invariant."""
    return _VOCAB[int(mix3(i, t, SEED ^ 0xA11C0) % np.uint64(len(_VOCAB)))]


def html_of(i: int, n_sites: int = 97) -> bytes:
    anchors = "".join(
        f'<a href="{u}">{anchor_word(i, t)}</a>'
        for t, u in enumerate(outlinks_of(i, n_sites))
    )
    page = (
        f"<html><head><title>p{i}</title></head>"
        f"<body>{text_of(i)}{anchors}</body></html>"
    )
    return page.encode("utf-8")


def _gen_batch(n_sites: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "url": [url_of(int(i), n_sites) for i in ids],
                    "warc_ts": _EPOCH + pd.to_timedelta(ids, unit="s"),
                    "html": [html_of(int(i), n_sites) for i in ids],
                    "text": [text_of(int(i)) for i in ids],
                    "lang": ["de" if i % 20 == 0 else "en" for i in ids],
                }
            )

    return gen


def synth_pages(spark: SparkSession, n_pages: int, n_sites: int = 97,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n_pages`` rows."""
    rng = spark.range(0, n_pages, numPartitions=partitions) if partitions \
        else spark.range(0, n_pages)
    return rng.mapInPandas(_gen_batch(n_sites), schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Golden fixture G6 — the reference's only golden vector
# (/root/reference/nvgraph_Pagerank.cpp:40-69, Langville & Meyer example).
# ---------------------------------------------------------------------------

G6_EDGES = [(0, 1), (0, 2), (2, 0), (2, 1), (2, 4),
            (3, 4), (3, 5), (4, 3), (4, 5), (5, 3)]
# Expected PageRank, alpha=0.9, sum-to-1 convention:
G6_RANKS_A09 = [0.037210, 0.053960, 0.041510, 0.37510, 0.206000, 0.28620]


def g6_pages(spark: SparkSession) -> DataFrame:
    """The G6 graph rendered as a 6-row F1-style pages table (vertex 1 dangling)."""
    out: dict[int, list[int]] = {i: [] for i in range(6)}
    for s, d in G6_EDGES:
        out[s].append(d)
    rows = []
    for i in range(6):
        anchors = "".join(f'<a href="{url_of(j)}">l</a>' for j in out[i])
        body = f"{text_of(i)}{anchors}"
        html = f"<html><head><title>p{i}</title></head><body>{body}</body></html>"
        rows.append(
            (url_of(i), (_EPOCH + pd.Timedelta(seconds=i)).to_pydatetime(),
             html.encode("utf-8"), text_of(i), "en")
        )
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Edge-level fixtures (F5 skew, F6 dangling-heavy, F7 components) — these
# test the graph operators directly, so they are generated as edge tables.
# ---------------------------------------------------------------------------


def skew_edges(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """F5: page 0 receives in-links from ~30% of pages; rest uniform random."""
    ids = np.arange(1, n, dtype=np.uint64)
    hot = ids[mix2(ids, SEED ^ 0x51CE) % np.uint64(10) < np.uint64(3)]
    src = np.concatenate([hot, ids])
    dst = np.concatenate(
        [np.zeros(len(hot), dtype=np.uint64), mix2(ids, SEED ^ 0xD1CE) % np.uint64(n)]
    )
    pdf = pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    pdf = pdf[pdf.src != pdf.dst]
    return spark.createDataFrame(pdf, schema="src long, dst long")


def dangling_heavy_edges(spark: SparkSession, n: int = 1000) -> DataFrame:
    """F6: 40% of pages have zero outlinks."""
    ids = np.arange(n, dtype=np.uint64)
    live = ids[mix2(ids, SEED ^ 0xDA61) % np.uint64(10) >= np.uint64(4)]
    dst = mix2(live, SEED ^ 0x0DD) % np.uint64(n)
    pdf = pd.DataFrame({"src": live.astype(np.int64), "dst": dst.astype(np.int64)})
    pdf = pdf[pdf.src != pdf.dst]
    return spark.createDataFrame(pdf, schema="src long, dst long")


def components_fixture_edges(spark: SparkSession) -> DataFrame:
    """F7: ring of 50 (ids 0-49) + clique of 8 (50-57) + star of 20 (58-77,
    hub 58) + 10 isolated vertices (78-87) + one bridge edge 0->50.

    Isolated vertices carry a self-loop-free presence via the vertex table;
    here we emit them as (i, i) self edges filtered out downstream — instead
    we return (edges, n_vertices) info implicitly: callers should build the
    vertex universe from ``spark.range(88)``.
    """
    edges: list[tuple[int, int]] = []
    edges += [(i, (i + 1) % 50) for i in range(50)]                 # ring
    edges += [(50 + a, 50 + b) for a in range(8) for b in range(8) if a != b]
    edges += [(58, 58 + i) for i in range(1, 20)]                   # star
    edges += [(0, 50)]                                              # bridge
    return spark.createDataFrame(edges, schema="src long, dst long")


F7_N_VERTICES = 88
