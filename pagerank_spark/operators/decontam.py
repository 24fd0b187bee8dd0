"""Train/eval decontamination: n-gram overlap between dataset splits.

The training-data hygiene step every large-scale corpus pipeline runs
before training: an eval/test document that shares long word n-grams with
a training document leaks the benchmark into the model. This module finds
those collisions at corpus scale, composing the dedup machinery
(operators/dedup.shingles — distinct hashed word n-grams per doc) with the
deterministic split assignment (operators/splits.dataset_split).

Scale shape (100 TB discipline):
  * shingling is one projection + explode + distinct (map-side partials);
  * the only big shuffle is the shingle equi-join train⋈eval, keyed by a
    64-bit hash — the J1 gather shape;
  * boilerplate n-grams (license headers, navigation chrome) are the hot
    keys of that join: a shingle present in > ``max_df`` TRAIN docs is
    dropped before the join (the same stop-shingle discipline as the LSH
    ``max_bucket`` cap, and standard practice in published decontamination
    pipelines), bounding any shingle's join fan-out to ``max_df``;
  * per-pair aggregation is a hash groupBy on (eval_id, train_id).

No counterpart in the reference (its scope is the link graph); this is
webtext-tier engine surface alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shingles
from pagerank_spark.operators.splits import dataset_split


def ngram_overlap(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_shared: int = 1,
    max_df: int = 1000,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """(eval_id, train_id, n_shared, eval_ngrams, overlap) per contaminated
    pair: ``n_shared`` distinct ``ngram``-grams in common, ``overlap`` =
    n_shared / eval's distinct n-gram count. Pairs below ``min_shared``
    are dropped; so are shingles occurring in > ``max_df`` train docs."""
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    sh_tr = shingles(train_docs, id_col, text_col, n=ngram, hash_fn=hash_fn)
    sh_ev = shingles(eval_docs, id_col, text_col, n=ngram, hash_fn=hash_fn)

    rare = (sh_tr.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle"))
    ev_sizes = sh_ev.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("eval_ngrams"))

    shared = (
        sh_ev.withColumnRenamed("doc_id", "eval_id")
        .join(rare, "shingle")
        .join(sh_tr.withColumnRenamed("doc_id", "train_id"), "shingle")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(ev_sizes.withColumnRenamed("doc_id", "eval_id"), "eval_id")
        .select("eval_id", "train_id", "n_shared", "eval_ngrams",
                (F.col("n_shared") / F.col("eval_ngrams")).alias("overlap"))
    )


def decontaminate_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    salt: str = "",
    train_label: str = "train",
    ngram: int = 8,
    min_shared: int = 1,
    max_df: int = 1000,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Per NON-train document: its worst contamination against the train
    split of the same deterministic ``dataset_split`` assignment.

    Returns ``(doc_id, split, n_shared, eval_ngrams, overlap, train_id)``
    where ``train_id`` is the most-overlapping train doc (ties: smallest
    id) — only rows with ``n_shared >= min_shared`` appear; clean eval
    docs are simply absent, so ``anti-join on doc_id`` yields the
    decontaminated eval set."""
    tagged = dataset_split(docs, id_col, weights=weights, salt=salt)
    train = tagged.filter(F.col("split") == train_label)
    evals = tagged.filter(F.col("split") != train_label)
    hits = ngram_overlap(train, evals, id_col, text_col, ngram=ngram,
                         min_shared=min_shared, max_df=max_df,
                         hash_fn=hash_fn)
    # two-level deterministic argmax (no window): best (n_shared, -id)
    # per eval doc via a max on an encoded struct, then a re-join
    best = (hits.groupBy("eval_id").agg(
        F.max(F.struct(F.col("n_shared"), (-F.col("train_id")).alias("nt")))
        .alias("b"))
        .select(F.col("eval_id").alias("be"),
                F.col("b.n_shared").alias("bn"),
                (-F.col("b.nt")).alias("bt")))
    return (
        hits.join(best, (F.col("eval_id") == F.col("be"))
                  & (F.col("n_shared") == F.col("bn"))
                  & (F.col("train_id") == F.col("bt")))
        .select(F.col("eval_id").alias("doc_id"), "n_shared", "eval_ngrams",
                "overlap", "train_id")
        .join(tagged.select(F.col(id_col).alias("doc_id"), "split"),
              "doc_id")
        .select("doc_id", "split", "n_shared", "eval_ngrams", "overlap",
                "train_id")
    )
