"""Deduplication over a documents table: exact, MinHash+LSH, SimHash,
n-gram Jaccard, and embedding-cosine near-dup.

Scale design notes (the part that matters at 10^12 docs):

* Exact dedup is one hash-groupBy — partial aggregation collapses
  duplicates map-side before the shuffle.
* MinHash signatures are computed WITHOUT a per-permutation explode:
  shingles are hashed once (xxhash64), then the k permutations are affine
  maps (a_i*h + b_i mod p) evaluated as k min-aggregations in a single
  groupBy pass (JVM-side, codegen). LSH banding turns the O(n^2) pair
  space into per-bucket joins; a frequency cap on buckets (drop buckets
  with > max_bucket docs, i.e. stop-shingle removal) bounds the worst-case
  join fan-out — the same hot-key discipline as the PageRank salting.
* SimHash is 64 conditional sums per token row in one groupBy pass.
* Exact n-gram Jaccard runs only on LSH candidate pairs (verify step),
  never all pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions.hashing import mix2
from pagerank_spark.operators.textops import tokens

# 31-bit Mersenne prime: affine-map products stay < 2^62, inside int64 even
# under ANSI overflow checking; 2^31 hash space is ample for per-doc shingle
# sets (collision probability per permutation ~ |set|/2^31).
_MERSENNE31 = (1 << 31) - 1


def shared_hash60(col: Column) -> Column:
    """60-bit deterministic string hash computable IDENTICALLY in Spark and
    DuckDB: the first 15 hex digits of md5, as a non-negative int64.

    Spark:  conv(substring(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

    Exists so the MinHash/SimHash pipelines can be cross-checked end-to-end
    against a SQL oracle engine; the default ``xxhash64`` (JVM-side, no md5
    string round-trip) stays the production hash."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


DUCKDB_HASH60 = "('0x' || substr(md5({s}), 1, 15))::BIGINT"


# -- exact ------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fp, n_docs, doc_ids).

    Hash-groupBy on md5 of normalized text (SURVEY.md training-data ops)."""
    fp = F.md5(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        docs.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


# -- shingles + MinHash -----------------------------------------------------


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3, hash_fn=F.xxhash64) -> DataFrame:
    """(doc_id, shingle) — distinct lower-cased word n-gram per doc, as a
    64-bit hash so downstream state is fixed-width. ``hash_fn`` defaults to
    the JVM-side xxhash64; pass ``shared_hash60`` for oracle parity."""
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .select("doc_id", hash_fn(F.col("g")).alias("shingle"))
        .distinct()
    )


def _minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    a = mix2(np.arange(k, dtype=np.uint64), seed) % np.uint64(_MERSENNE31 - 1) + np.uint64(1)
    b = mix2(np.arange(k, dtype=np.uint64), seed ^ 0xABCD) % np.uint64(_MERSENNE31)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def minhash_signatures(sh: DataFrame, k: int = 64, seed: int = 42) -> DataFrame:
    """(doc_id, sig array<long>[k]) — k affine permutations min-aggregated in
    ONE pass (no explode-by-permutation)."""
    params = _minhash_params(k, seed)
    # shingle hash -> non-negative 31-bit domain before the affine map
    h = F.pmod(F.col("shingle"), F.lit(_MERSENNE31))
    mins = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16, rows: int = 4,
                        max_bucket: int = 1000, hash_fn=F.xxhash64) -> DataFrame:
    """(a, b) candidate doc pairs sharing >=1 LSH band bucket (a < b).

    bands*rows must equal len(sig) — enforced per-row below: a mismatched
    banding would slice past the signature (empty array -> one shared
    constant bucket -> all-pairs candidates, exactly the O(n^2) blow-up
    LSH exists to avoid). Buckets larger than ``max_bucket`` are dropped
    (stop-shingle discipline): they would contribute O(bucket^2) pairs and
    correspond to boilerplate."""
    k_guard = F.when(
        F.size("sig") == bands * rows, F.col("sig")
    ).otherwise(F.raise_error(
        f"minhash signature length must equal bands*rows = {bands * rows}"))
    sigs = sigs.withColumn("sig", k_guard)
    band_cols = F.explode(
        F.array(*[
            F.struct(F.lit(j).alias("band"),
                     hash_fn(F.concat_ws(
                         ",", F.slice("sig", j * rows + 1, rows).cast("array<string>")))
                     .alias("bucket"))
            for j in range(bands)
        ])
    ).alias("bb")
    buckets = sigs.select("doc_id", band_cols).select("doc_id", "bb.band", "bb.bucket")
    counts = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("sz"))
    small = buckets.join(counts.filter(F.col("sz") <= max_bucket), ["band", "bucket"])
    pairs = (
        small.alias("x")
        .join(small.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    return pairs


def minhash_similarity(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(a, b, est_jaccard) — fraction of equal signature components."""
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    eq = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select("a", "b",
                (F.aggregate(eq, F.lit(0), lambda acc, v: acc + v)
                 / F.size("sig_a")).alias("est_jaccard"))
    )


def exact_jaccard(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """(a, b, jaccard) — exact shingle-set Jaccard, computed only on the
    candidate pairs (the verify step)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .select(
            "a", "b",
            (F.coalesce("inter", F.lit(0))
             / (F.col("sz_a") + F.col("sz_b") - F.coalesce("inter", F.lit(0)))
             ).alias("jaccard"),
        )
    )


def exact_containment(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """(a, b, inter, containment) — asymmetric shingle containment on
    candidate pairs: containment = |A ∩ B| / min(|A|, |B|), i.e. the
    fraction of the SMALLER document's shingles present in the other.

    The quote/boilerplate detector Jaccard misses: a short passage fully
    embedded in a long page has containment ~1 but Jaccard ~|small|/|big|
    (arbitrarily low), so symmetric near-dup thresholds never fire on it
    (Broder's resemblance-vs-containment distinction, "On the resemblance
    and containment of documents", SEQUENCES 1997).

    Same scale shape as ``exact_jaccard``: two shingle equi-joins + one
    hash aggregate, computed ONLY on candidate pairs (LSH or otherwise) —
    never all pairs."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .select(
            "a", "b", F.coalesce("inter", F.lit(0)).alias("inter"),
            (F.coalesce("inter", F.lit(0))
             / F.least("sz_a", "sz_b").cast("double")).alias("containment"),
        )
    )


def containment_duplicates(
    docs: DataFrame, threshold: float = 0.8, ngram: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    hash_fn=F.xxhash64,
) -> DataFrame:
    """All-pairs-on-shared-shingle containment >= threshold: pairs where
    the smaller document's shingle set is mostly inside the other's.

    Candidate generation here is the shared-shingle join itself (any pair
    with containment > 0 shares >= 1 shingle), with the same O(df^2)
    exposure as the exhaustive Jaccard verify — at corpus scale feed
    ``exact_containment`` LSH candidates (``lsh_candidate_pairs``) or
    stop-shingle-capped joins instead; this wrapper is the small-scale /
    oracle-checkable form."""
    sh = shingles(docs, id_col, text_col, ngram, hash_fn=hash_fn)
    inter = (
        sh.alias("x").join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    return (exact_containment(sh, inter)
            .filter(F.col("containment") >= threshold))


def near_duplicates_minhash(
    docs: DataFrame, threshold: float = 0.8, k: int = 64,
    bands: int = 16, rows: int = 4, ngram: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    max_bucket: int = 1000, hash_fn=F.xxhash64,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup pipeline: shingle -> minhash -> band
    -> bucket-join -> exact-Jaccard verify. Returns (a, b, jaccard) pairs
    with jaccard >= threshold. ``hash_fn=shared_hash60`` makes every stage
    reproducible in a SQL oracle engine (same shingle ids, same buckets)."""
    if bands * rows != k:
        raise ValueError(f"bands*rows ({bands}*{rows}) must equal k ({k})")
    sh = shingles(docs, id_col, text_col, ngram, hash_fn=hash_fn)
    sigs = minhash_signatures(sh, k)
    cands = lsh_candidate_pairs(sigs, bands, rows, max_bucket, hash_fn=hash_fn)
    return exact_jaccard(sh, cands).filter(F.col("jaccard") >= threshold)


# -- SimHash ----------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, hash_fn=F.xxhash64) -> DataFrame:
    """(doc_id, simhash long) — sign of per-bit ±1 sums over token hashes,
    one groupBy pass with ``bits`` conditional sums (JVM-side).
    ``hash_fn=shared_hash60`` (with bits<=60) gives oracle-reproducible
    fingerprints."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).select("doc_id", hash_fn(F.col("t")).alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id", text_col: str = "text",
                            block_bits: int = 16, bits: int = 64,
                            hash_fn=F.xxhash64) -> DataFrame:
    """(a, b, hamming) pairs with hamming(simhash) <= max_hamming.

    Blocking: with bits/block_bits blocks and max_hamming < n_blocks, any
    qualifying pair agrees exactly on >=1 block (pigeonhole) — candidates
    come from equi-joins on block values, never a cross join."""
    fps = simhash(docs, id_col, text_col, bits=bits, hash_fn=hash_fn)
    n_blocks = bits // block_bits
    assert n_blocks * block_bits == bits, "block_bits must divide bits"
    assert max_hamming < n_blocks, "pigeonhole requires max_hamming < n_blocks"
    mask = (1 << block_bits) - 1
    blocks = fps.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("blk"),
                     F.shiftright("simhash", j * block_bits)
                     .bitwiseAND(F.lit(mask)).alias("val"))
            for j in range(n_blocks)
        ])).alias("bb"),
    ).select("doc_id", "simhash", "bb.blk", "bb.val")
    cands = (
        blocks.alias("x").join(blocks.alias("y"), ["blk", "val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("x.simhash").alias("ha"),
                F.col("y.doc_id").alias("b"), F.col("y.simhash").alias("hb"))
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cands.select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# -- embedding cosine near-dup ----------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side
    (zip_with product + aggregate sum — no Python in the loop)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_near_duplicates(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    planes: int = 16, seed: int = 42,
) -> DataFrame:
    """(a, b, cos) pairs with cosine >= threshold, via random-hyperplane LSH
    bucketing (deterministic seeded planes) + within-bucket verification."""
    from pagerank_spark.operators.similarity import hyperplane_buckets

    b = hyperplane_buckets(emb, id_col, vec_col, planes, seed, tables=4)
    va = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    cands = (
        b.alias("x").join(b.alias("y"), ["table", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    sim = cands.join(va, "a").join(vb, "b").select(
        "a", "b", cosine(F.col("va").cast("array<double>"),
                         F.col("vb").cast("array<double>")).alias("cos"))
    return sim.filter(F.col("cos") >= threshold)


# -- duplicate-cluster formation + canonical selection ----------------------


def dedup_clusters(pairs: DataFrame, universe: DataFrame | None = None,
                   a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Near-dup pairs -> duplicate clusters -> keep/drop decision.

    The completion step of every dedup pipeline: duplicate pairs are the
    edge list of an undirected similarity graph; a duplicate CLUSTER is a
    connected component of it (operators/components.py hash-min — the
    same Kiveris-style loop the link graph uses), and the canonical
    survivor is the smallest doc id per cluster (deterministic under any
    partitioning). Returns ``(doc_id, cluster, keep)``; with ``universe``
    (a (doc_id) frame of ALL docs), singleton non-duplicated docs appear
    as their own kept cluster, so ``filter(keep)`` IS the deduplicated
    corpus.

    Scale shape: pair graphs are tiny relative to the corpus (only docs
    with a near-dup appear), components is two groupBys per round, and the
    keep flag is one expression off the component label — no extra
    shuffle, no window.
    """
    from pagerank_spark.operators.components import connected_components

    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    uni = None
    if universe is not None:
        uni = universe.select(F.col(universe.columns[0]).alias("id"))
    labels = connected_components(edges, universe=uni).labels
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("keep"),
    )


def deduplicate_corpus(
    docs: DataFrame, threshold: float = 0.8, k: int = 64,
    bands: int = 16, rows: int = 4, ngram: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    max_bucket: int = 1000, hash_fn=F.xxhash64,
) -> DataFrame:
    """docs minus near-duplicates: MinHash+LSH pairs -> clusters -> keep
    the min-id survivor of each cluster. Returns the surviving docs with
    their ``cluster`` label appended."""
    pairs = near_duplicates_minhash(
        docs, threshold=threshold, k=k, bands=bands, rows=rows, ngram=ngram,
        id_col=id_col, text_col=text_col, max_bucket=max_bucket,
        hash_fn=hash_fn)
    clusters = dedup_clusters(
        pairs, universe=docs.select(F.col(id_col).alias("doc_id")))
    return (docs.join(
        clusters.filter("keep").select(F.col("doc_id").alias(id_col),
                                       "cluster"), id_col))


# -- passage-level (CCNet-style) dedup ---------------------------------------


def passages(docs: DataFrame, w: int = 20, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Split each document into non-overlapping ``w``-token passages:
    ``(id_col, pos, passage)`` with a 0-based passage index; the trailing
    passage may be shorter than ``w``. Tokens are the same lower-cased
    whitespace tokens the rest of the text pipeline uses.

    The split is one JVM projection (split + sequence + slice + array_join)
    followed by posexplode — no UDF; the row growth is ~n_tokens/w per doc,
    the same order the shingle pipeline already pays.
    """
    tk = docs.select(id_col, tokens(F.col(text_col)).alias("tk"))
    npass = F.ceil(F.size("tk") / F.lit(float(w))).cast("int")
    arr = F.when(npass > 0, F.transform(
        F.sequence(F.lit(0), npass - F.lit(1)),
        lambda i: F.array_join(F.slice(F.col("tk"), i * w + 1, w), " "),
    )).otherwise(F.array().cast("array<string>"))
    return tk.select(id_col, F.posexplode(arr).alias("pos", "passage"))


def passage_dedup(docs: DataFrame, w: int = 20, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """CCNet-style passage-level deduplication: the globally FIRST
    occurrence (smallest ``(doc_id, pos)``) of each distinct passage
    survives; every later occurrence is dropped. Returns one row per input
    document: ``(doc_id, n_passages, n_dropped, dedup_text)`` where
    ``dedup_text`` is the surviving passages re-joined in document order
    (CCNet deduplicates paragraph-hash-wise across the whole corpus;
    Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
    from Web Crawl Data", 2020).

    Scale shape (10^12 docs): survivors come from ONE hash groupBy on the
    passage key whose min-struct aggregate collapses duplicates map-side —
    a boilerplate passage occurring 10^9 times contributes one partial min
    per input partition, so there is no hot-key join anywhere (deliberately
    NOT the tag-each-occurrence-via-join-back plan, whose equi-join on the
    passage key would be exactly such a hot key). Doc-level stats then need
    only doc_id-keyed aggregations and a three-way co-partitioned join.
    At full scale the groupBy key should be a 128-bit passage hash rather
    than the string to cut shuffle bytes (CCNet uses SHA1 paragraph
    hashes); at test scale the string key is exact and oracle-checkable.
    """
    p = passages(docs, w=w, id_col=id_col, text_col=text_col)
    surv = (p.groupBy("passage")
            .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("f"))
            .select(F.col(f"f.{id_col}").alias(id_col),
                    F.col("f.pos").alias("pos"), "passage"))
    kept = surv.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "passage"))),
            lambda s: s["passage"]), " ").alias("dedup_text"))
    totals = p.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_passages"))
    return (docs.select(id_col)
            .join(totals, id_col, "left").join(kept, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_passages", F.lit(0)).alias("n_passages"),
                (F.coalesce("n_passages", F.lit(0))
                 - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
                F.coalesce("dedup_text", F.lit("")).alias("dedup_text")))


def host_boilerplate(docs: DataFrame, host_col: str = "source",
                     w: int = 20, min_pages: int = 5,
                     min_frac: float = 0.25, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Host-level boilerplate detection (the CCNet deduplication
    heuristic at domain granularity; Wenzek et al. 2020 §2.2 note that
    paragraph dedup removes "boilerplate such as navigation menus, cookie
    warnings and contact information"): a passage appearing on more than
    ``min_frac`` of a host's pages (hosts with at least ``min_pages``
    pages) is site template/navigation/footer, not content. Returns one
    row per flagged (host, passage)::

        (host, passage, n_pages_with, n_pages, frac)

    with ``frac = n_pages_with / n_pages`` rounded to 6 places.

    Scale shape (10^12 docs): passages (one JVM projection + posexplode,
    see :func:`passages`) are joined to their host by doc_id (doc-keyed,
    never hot), deduped per (host, passage, doc) and counted by ONE
    (host, passage)-keyed hash aggregate whose partials collapse each
    host-template passage map-side — no all-pairs, no hot-key join: the
    per-host page-count table is O(hosts) and joins back under AQE
    (broadcast while hosts fit, skew-split sort-merge past that). At full
    scale the aggregate key should be a 128-bit passage hash instead of
    the string (the passage_dedup note applies verbatim); at test scale
    the string key is exact and oracle-checkable.
    """
    if not 0.0 < min_frac <= 1.0:
        raise ValueError(f"min_frac must be in (0, 1]: {min_frac}")
    p = (passages(docs, w=w, id_col=id_col, text_col=text_col)
         .join(docs.select(id_col, F.col(host_col).alias("host")), id_col)
         .select("host", "passage", id_col)
         .distinct())
    per = p.groupBy("host", "passage").agg(
        F.count(F.lit(1)).alias("n_pages_with"))
    pages = (docs.groupBy(F.col(host_col).alias("host"))
             .agg(F.countDistinct(id_col).alias("n_pages")))
    return (per.join(pages, "host")
            .filter((F.col("n_pages") >= F.lit(int(min_pages)))
                    & (F.col("n_pages_with")
                       > F.lit(float(min_frac)) * F.col("n_pages")))
            .select("host", "passage", "n_pages_with", "n_pages",
                    F.round(F.col("n_pages_with")
                            / F.col("n_pages"), 6).alias("frac")))
