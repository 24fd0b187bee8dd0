"""Winnowing document fingerprints (MOSS) for partial-overlap detection.

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003): hash every k-token shingle, slide a
w-window over the hash sequence, and record the MINIMUM hash of each
window. The selected set is a position-independent sketch with the MOSS
guarantee: any shared token run of length ≥ w + k - 1 between two
documents contributes at least one shared fingerprint — unlike MinHash
(dedup.py), which estimates WHOLE-document similarity, winnowing detects
bounded LOCAL overlap (quotes, mirrored paragraphs, licence blocks).

Absent from the reference (a rank engine); part of the LLM-pipeline
dedup surface between passage_dedup (exact fixed-width passages) and
near_duplicates_minhash (global Jaccard).

Determinism: shingle hashes use dedup.shared_hash60 so the whole
pipeline replays bit-identically in the DuckDB oracle.

Scale shape (100 TB corpus): fingerprint extraction is ONE narrow
projection per document — the token array, the shingle-hash array, and
the window-min array are materialized as successive columns (one pass
each; the textops lesson — a higher-order lambda re-evaluates a
subexpression argument per element, so arrays feed lambdas only as
materialized columns). Expected fingerprints per document are
2/(w+1) × |shingles| (the paper's density bound), so the exploded
(doc, fp) table is a constant fraction of the token count. Candidate
pairing drops fingerprints shared by more than ``max_doc_freq``
documents FIRST (boilerplate/licence fingerprints are the power-law
head — the dedup.py stop-shingle discipline), which caps the self-join
fan-out per fingerprint; the pair aggregate is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shared_hash60
from pagerank_spark.operators.textops import tokens


def winnow_fingerprints(docs: DataFrame, *, k: int = 5, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Distinct winnowed fingerprints per document: ``(doc_id, fp)``.

    ``k`` = shingle width in tokens, ``w`` = winnowing window in
    shingles; the guarantee threshold is t = w + k - 1 tokens. Documents
    with fewer than k tokens emit nothing; documents with 1..w-1
    shingles emit the minimum shingle hash (so every document of ≥ k
    tokens keeps at least one fingerprint).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("toks"))
    # shingle-hash array H (materialized before the window lambda).
    # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], not [] — docs
    # shorter than k tokens must short-circuit before the transform
    sh = toks.select(
        "doc_id",
        F.when(
            F.size("toks") >= k,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
                lambda i: shared_hash60(
                    F.array_join(F.slice(F.col("toks"), i, k), " "))))
        .otherwise(F.array().cast("array<bigint>")).alias("h"))
    # window-min array W; short hash sequences (1..w-1) collapse to [min]
    win = sh.select(
        "doc_id",
        F.when(F.size("h") >= w,
               F.transform(
                   F.sequence(F.lit(1), F.size("h") - F.lit(w - 1)),
                   lambda i: F.array_min(F.slice(F.col("h"), i, w))))
        .when(F.size("h") > 0, F.array(F.array_min("h")))
        .otherwise(F.array().cast("array<bigint>")).alias("fps"))
    return (win.select("doc_id",
                       F.explode(F.array_distinct("fps")).alias("fp"))
            .distinct())


def winnow_candidates(docs: DataFrame, *, k: int = 5, w: int = 4,
                      min_shared: int = 2, max_doc_freq: int = 50,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Candidate overlap pairs ``(doc_id_a, doc_id_b, shared)`` — document
    pairs sharing ≥ ``min_shared`` winnowed fingerprints, ordered ids
    (a < b). Fingerprints held by more than ``max_doc_freq`` documents
    are dropped before pairing (boilerplate discipline — they would
    contribute O(df²) pairs and carry no pair-specific signal).
    """
    fps = winnow_fingerprints(docs, k=k, w=w,
                              id_col=id_col, text_col=text_col)
    # the fingerprint table fans out three ways (df-count, both join
    # sides); materialize it once so the raw-text scan + extraction run
    # once, not per consumer (plan-audited: 4 text scans without this)
    fps = fps.localCheckpoint(eager=True)
    rare = (fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("fp"))
    fps = fps.join(rare, "fp")
    pairs = (fps.alias("x")
             .join(fps.alias("y"),
                   (F.col("x.fp") == F.col("y.fp"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
             .groupBy(F.col("x.doc_id").alias("doc_id_a"),
                      F.col("y.doc_id").alias("doc_id_b"))
             .agg(F.count(F.lit(1)).alias("shared")))
    return pairs.filter(F.col("shared") >= min_shared)
