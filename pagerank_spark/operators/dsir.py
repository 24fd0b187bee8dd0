"""DSIR: data selection via importance resampling.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): fit hashed bag-of-ngram unigram models on a
TARGET corpus (the distribution you want more of) and on the RAW corpus,
weight every raw document by the log-likelihood ratio
``log p_target(x) - log p_raw(x)``, and sample k documents by Gumbel
top-k — which draws WITHOUT replacement from the softmax of the weights.

Absent from the reference (a rank engine); the data-selection stage of
the LLM-pipeline surface, sitting between the quality cascade
(textops.corpus_filter) and the samplers (splits.py).

Determinism (repo discipline): term buckets and the Gumbel noise both
come from dedup.shared_hash60, so the full pipeline — feature hashing,
the two fitted models, the perturbed ranking — replays bit-identically
and is expressible in the DuckDB oracle. u = (h + 1) / (2^60 + 1) maps
the 60-bit hash into (0, 1) exclusive, so log(u) and log(-log(u)) are
always finite.

Scale shape (100 TB raw corpus): doc_terms bounds shuffle volume by
distinct doc-term pairs; both fitted models are <= n_buckets rows and
BROADCAST back (the raw corpus never reshuffles to score); per-document
weights are one map-side-combinable sum; the final selection is a
k-limited sort (TakeOrdered). Totals are driver scalars, the tfidf
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shared_hash60
from pagerank_spark.operators.textops import doc_terms

TWO60 = float(1 << 60)


def _bucket_model(dt: DataFrame, n_buckets: int, alpha: float):
    """Laplace-smoothed hashed-unigram log-probabilities:
    (bucket, logp) for every OCCUPIED bucket, plus the log-probability
    every EMPTY bucket shares (returned as a Python float — the caller
    folds it in via coalesce after the broadcast join)."""
    counts = (dt.groupBy((shared_hash60(F.col("term")) % n_buckets)
                         .alias("bucket"))
              .agg(F.sum("tf").alias("c")))
    total = counts.agg(F.sum("c")).first()[0] or 0
    import math
    denom = math.log(total + alpha * n_buckets)
    logp = counts.select(
        "bucket", (F.log(F.col("c") + F.lit(alpha)) - F.lit(denom)).alias("logp"))
    empty_logp = math.log(alpha) - denom
    return logp, empty_logp


def dsir_select(docs: DataFrame, target: DataFrame, *, k: int = 100,
                n_buckets: int = 1024, alpha: float = 1.0,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-``k`` raw documents by Gumbel-perturbed importance weight.

    ``target`` is a DataFrame with the same (id, text) shape holding the
    target-distribution sample. Returns (doc_id, log_ratio, score) with
    score = log_ratio + gumbel(doc_id), both rounded to 6 decimals,
    ordered by (score desc, doc_id asc), k-limited.
    """
    raw_dt = doc_terms(docs, id_col, text_col)
    tgt_dt = doc_terms(target, id_col, text_col)

    p_tgt, tgt_empty = _bucket_model(tgt_dt, n_buckets, alpha)
    p_raw, raw_empty = _bucket_model(raw_dt, n_buckets, alpha)
    model = (p_tgt.withColumnRenamed("logp", "lt")
             .join(p_raw.withColumnRenamed("logp", "lr"), "bucket", "full")
             .select("bucket",
                     (F.coalesce(F.col("lt"), F.lit(tgt_empty))
                      - F.coalesce(F.col("lr"), F.lit(raw_empty))).alias("llr")))

    scored = (raw_dt
              .withColumn("bucket", shared_hash60(F.col("term")) % n_buckets)
              .join(F.broadcast(model), "bucket")
              .groupBy("doc_id")
              .agg(F.sum(F.col("tf") * F.col("llr")).alias("log_ratio")))
    u = (shared_hash60(F.col("doc_id")) + F.lit(1.0)) / F.lit(TWO60 + 1.0)
    gumbel = -F.log(-F.log(u))
    return (scored
            .select("doc_id",
                    F.round("log_ratio", 6).alias("log_ratio"),
                    F.round(F.col("log_ratio") + gumbel, 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))
