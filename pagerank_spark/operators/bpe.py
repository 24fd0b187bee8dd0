"""BPE vocabulary induction — tokenizer training as a corpus operator.

Byte-pair encoding (Sennrich, Haddow, Birch, "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016 — the GPT/Llama tokenizer
family's training algorithm): start from characters, repeatedly merge
the most frequent adjacent symbol pair. The repo ships BPE-ish token
COUNTING (textops.bpe_ish_token_count); this is the other half — LEARN
the merge table from the corpus.

The textbook scalable formulation: after ONE corpus scan collapses the
text to the distinct-word frequency table, every merge iteration runs on
that vocab-bounded table only —

    pairs    = Σ_words freq · adjacent-symbol pairs     (combinable agg)
    best     = argmax (count desc, left, right)         (1-row collect)
    re-split = greedy left-to-right merge applied per word (narrow map)

The greedy merge is a FOLD over each word's symbol list (replace the
accumulator's last symbol when (last, next) equals the chosen pair, else
append), expressed with the same split/left/concat string algebra in
Spark's ``aggregate`` and DuckDB's ``list_reduce`` — so the whole
training run, argmaxes included, unrolls into a SQL oracle.

Per-merge driver state is the single argmax row (the bounded-codebook
discipline of similarity.ivf_train_centroids); everything else stays in
the plan. Words are whitespace tokens, so the space character is free to
serve as the symbol separator inside the fold. Scale: the corpus is
touched once; k merges cost k vocab-bounded rounds (|vocab| rows, each
|word| symbols), independent of corpus row count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import tokens


@dataclass
class BPEResult:
    merges: DataFrame   # (step int, left string, right string, n_pair long)
    vocab: DataFrame    # (word, freq, syms) after all merges
    n_merges: int       # merges actually learned (< requested if pairs ran out)


def _merge_fold(arr: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of merge (left, right) to the
    symbol array ``arr``, as a fold to a space-joined symbol string —
    the EXACT algebra the DuckDB oracle replays with list_reduce."""
    merged = left + right
    la = len(left)

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(F.split(acc, " "), -1)
        return (F.when((last == F.lit(left)) & (x == F.lit(right)),
                       F.concat(F.substring(acc, F.lit(1),
                                            F.length(acc) - F.lit(la)),
                                F.lit(merged)))
                .otherwise(F.concat(acc, F.lit(" "), x)))

    rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.aggregate(rest, F.element_at(arr, 1), step)


def bpe_train(docs: DataFrame, merges: int = 20, id_col: str = "doc_id",
              text_col: str = "text") -> BPEResult:
    """Learn ``merges`` BPE merge rules from the corpus.

    Returns the ordered merge table, the final symbolized vocabulary,
    and the number of merges actually learned (training stops early when
    no adjacent pair is left). Ties at the argmax break by
    (count desc, left, right) — a total order, so the learned table is
    deterministic and engine-independent.
    """
    if merges < 1:
        raise ValueError(f"merges must be >= 1: {merges}")
    spark = docs.sparkSession
    words = (docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .select(
                 "w", "freq",
                 F.array_join(F.transform(
                     F.sequence(F.lit(1), F.length("w")),
                     lambda i: F.substring(F.col("w"), i, F.lit(1))),
                     " ").alias("syms"))
             .localCheckpoint(eager=True))

    learned: list[tuple[int, str, str, int]] = []
    for step_i in range(merges):
        arr = F.split(F.col("syms"), " ")
        pairs = F.zip_with(
            F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")))
        best = (words.select("freq", F.explode(pairs).alias("p"))
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), "l", "r")
                .limit(1).collect())
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        learned.append((step_i, l, r, n))
        words = (words.select(
            "w", "freq",
            _merge_fold(F.split(F.col("syms"), " "), l, r).alias("syms"))
            .localCheckpoint(eager=True))

    merges_df = spark.createDataFrame(
        learned or [], "step int, left string, right string, n_pair long")
    return BPEResult(merges=merges_df, vocab=words, n_merges=len(learned))


def _apply_merges(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply the learned rules in order to ``(w, syms)``, ONE FOLD PER
    PASS with an eager checkpoint in between — the textops lesson:
    ``_merge_fold`` references its input expression ~3x, so chaining k
    folds in one projection builds a ~3^k expression tree (measured 200s
    of pure Catalyst time at k=10). The input is the distinct UNSEEN word
    table (tiny by Zipf), so k small jobs beat one exponential plan."""
    for left, right in merges:
        words = words.select(
            "w", _merge_fold(F.split(F.col("syms"), " "), left, right)
            .alias("syms")).localCheckpoint(eager=True)
    return words


def bpe_encode(docs: DataFrame, trained: BPEResult,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with a trained BPE merge table — the APPLY step
    (Sennrich ACL 2016 §3; ``bpe_train`` is the learn step).

    Returns ``(id_col, n_tokens int, tokens array<string>)``; documents
    whose text yields no words keep a row with an empty token array.

    Scale shape: encoding is a DICTIONARY JOIN, not per-token work. The
    corpus's distinct words (vocab-bounded — the Zipf head, shared with
    ``bpe_train``'s one-scan discipline) are symbolized once: words seen
    at training time take their final symbolization straight from the
    trained vocab; words unseen at training time form a (tiny) distinct
    word table that runs the same greedy merge folds in learned order —
    per distinct WORD, never per occurrence. The per-document token
    sequence is then one posexplode + dictionary equi-join + ordered
    re-aggregation; the dictionary is the small side (broadcast/AQE).
    The merge list itself is the k-row learned table — driver state
    bounded by the vocabulary budget, the codebook discipline.
    """
    from pagerank_spark.operators.textops import tokens as _tokens

    merge_rows = trained.merges.orderBy("step").collect()
    merge_list = [(r["left"], r["right"]) for r in merge_rows]

    words = (docs.select(F.posexplode(_tokens(F.col(text_col)))
                         .alias("pos", "w"))
             .select("w").distinct())
    vocab = trained.vocab.select("w", "syms")
    unseen = (words.join(vocab.select("w"), "w", "left_anti")
              .select("w", F.array_join(F.transform(
                  F.sequence(F.lit(1), F.length("w")),
                  lambda i: F.substring(F.col("w"), i, F.lit(1))),
                  " ").alias("syms"))
              .localCheckpoint(eager=True))
    # bounded-scalar probe: encoding the training corpus (the common
    # case) has zero unseen words — skip the k fold passes entirely
    if merge_list and unseen.limit(1).count():
        unseen = _apply_merges(unseen, merge_list)
    dictionary = vocab.unionByName(unseen)

    occ = docs.select(F.col(id_col),
                      F.posexplode(_tokens(F.col(text_col))).alias("pos", "w"))
    per_doc = (
        occ.join(dictionary, "w")
        .select(id_col, "pos", F.split(F.col("syms"), " ").alias("sub"))
        .groupBy(id_col)
        .agg(F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sub"))),
            lambda s: s["sub"])).alias("tokens"))
    )
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("tokens", F.array().cast("array<string>"))
                    .alias("tokens"))
            .select(id_col, F.size("tokens").alias("n_tokens"), "tokens"))
