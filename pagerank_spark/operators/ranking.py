"""BM25 full-text ranking over a documents table.

Completes the retrieval surface started by anchors.anchor_text_index and
textops.tfidf_top_terms: given a bag of query terms, score every matching
document with Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework") using the Lucene non-negative idf variant
ln(1 + (N - df + 0.5)/(df + 0.5)).

Absent from the reference (a rank engine, not a search engine); part of
the engine's web-corpus query surface.

Plan shape (the 100-TB story):
- the per-document term-frequency table comes from textops.doc_terms —
  shuffle volume bounded by distinct doc-term pairs, not raw tokens;
- the query-term filter lands BEFORE any join, so only matching rows
  (≤ n_docs × |query|) ever shuffle;
- per-term df stats aggregate that filtered table (≤ |query| rows) and
  broadcast back — never a shuffle on the corpus side;
- document lengths are a narrow projection of the corpus joined once on
  doc_id; N and avgdl are driver scalars (one count/avg job each, the
  same convention as tfidf's n_docs);
- the final top-k is a k-limited sort (TakeOrdered — k rows per
  partition reach the driver merge), ordered by the 6-decimal-rounded
  score then doc_id per the repo's cross-engine determinism rule.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import doc_terms, token_count


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], *, k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` documents for a bag of ``query_terms`` under Okapi BM25.

    Returns (doc_id, n_matched, score) — ``n_matched`` is the number of
    distinct query terms present in the document, ``score`` the BM25 sum
    rounded to 6 decimals. Ties broken by doc_id ascending.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    # driver scalars, one job each (tfidf convention)
    n_docs = int(docs.agg(F.count_distinct(F.col(id_col))).first()[0])
    avgdl = float(
        docs.agg(F.avg(token_count(F.col(text_col)))).first()[0] or 0.0)

    dt = doc_terms(docs, id_col, text_col).filter(F.col("term").isin(terms))
    df_stats = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = docs.select(F.col(id_col).alias("doc_id"),
                         token_count(F.col(text_col)).alias("dl"))

    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_norm = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                   + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    scored = (
        dt.join(F.broadcast(df_stats), "term")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"),
             F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
