"""Corpus-statistical keyword extraction and lexical relevance ranking
over ``documents``: per-document TF-IDF top-k terms and BM25 scoring of a
fixed query against the corpus.

Training-data pipelines use these for topic summarisation of shards,
boilerplate spotting (terms with near-zero IDF corpus-wide), and lexical
retrieval when picking seed documents for a filter classifier. No
reference analogue (pyld has no text analytics); this is the
builder's-brief training-data axis.

Scale design (the 100-TB shapes):

* ``tfidf_top_terms``: explode + partial-aggregated ``groupBy(doc, term)``
  is the only corpus-sized shuffle on the term-count side; document
  frequency re-aggregates the already (doc, term)-partitioned counts with
  map-side partials; corpus document count is a scalar 1-row aggregate
  crossed in (Spark plans a broadcast nested loop of the single row —
  no corpus shuffle). The IDF table is vocabulary-sized, orders of
  magnitude below the corpus, and is broadcast by default
  (``broadcast_idf=False`` falls back to a sorted-merge join for
  pathological vocabularies). Document length, score ranking, and the
  top-k cut all share ONE exchange on doc_id: two Window nodes over the
  same partitioning (an unbounded sum, then a rank), and the
  ``rank <= k`` filter compiles to Spark's two-phase WindowGroupLimit so
  each map task forwards at most k rows per doc.
* ``bm25_scores``: the query side is a literal in the plan (an
  ``isin`` filter on the exploded terms — pushed below the term-count
  shuffle, so only query-term postings ever shuffle). Document length is
  a pure column projection of the scan (no explode), and avgdl/N are
  scalar aggregates crossed in as 1-row broadcasts. One final
  doc_id-partitioned aggregate sums the per-term contributions.

Determinism contract (gate parity): scores are rounded to 6 decimals
BEFORE ranking, and ties break on term ASC, so the Spark result and the
DuckDB oracle rank identically even if the 7th decimal ever differed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_expr

#: default BM25 hyperparameters (the Robertson/Sparck-Jones standards)
BM25_K1 = 1.2
BM25_B = 0.75


def _term_counts(documents: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id_col, term, tf) — raw per-document term counts."""
    return (
        documents
        .select(id_col, F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _n_docs(documents: DataFrame, id_col: str) -> DataFrame:
    """1-row (n_docs) aggregate — crossed in as a broadcast scalar."""
    return documents.agg(F.count(F.col(id_col)).alias("n_docs"))


def tfidf_top_terms(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_idf: bool = True,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    tf is length-normalised (count / doc token count); idf is the
    sklearn-style smooth variant ``ln((N + 1) / (df + 1)) + 1`` so terms
    present in every document still score > 0 and no division ever hits
    zero. Output: (id_col, rank, term, tfidf_r6), rank 1..k per document,
    ordered by rounded score DESC then term ASC.
    """
    tf = _term_counts(documents, text_col, id_col)

    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        df_t.crossJoin(F.broadcast(_n_docs(documents, id_col)))
        .select(
            "term",
            (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
             + F.lit(1.0)).alias("idf"),
        )
    )
    if broadcast_idf:
        idf = F.broadcast(idf)

    doc_part = Window.partitionBy(id_col)
    scored = (
        tf.join(idf, "term")
        .withColumn("doclen", F.sum("tf").over(doc_part))
        .withColumn(
            "tfidf_r6",
            F.round((F.col("tf") / F.col("doclen")) * F.col("idf"), 6),
        )
    )
    rank_w = doc_part.orderBy(F.col("tfidf_r6").desc(), F.col("term").asc())
    return (
        scored
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf_r6")
    )


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 relevance of every document against a fixed bag of query terms.

    idf_t = ln(1 + (N - df + 0.5) / (df + 0.5));
    contribution_t = idf_t * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl)).
    Documents with no query term are omitted (inner semantics). Output:
    (id_col, n_matched, bm25_r6) with the score rounded to 6 decimals.
    """
    if not query_terms:
        raise ValueError("bm25_scores requires a non-empty query_terms list")
    terms = sorted({t.lower() for t in query_terms})

    # doc length is a pure projection — no explode, stays in codegen
    lengths = documents.select(
        id_col, F.size(tokens_expr(text_col)).alias("doclen")
    )
    avgdl = lengths.agg(F.avg("doclen").alias("avgdl"))

    tf = (
        documents
        .select(id_col, F.explode(tokens_expr(text_col)).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        df_t.crossJoin(F.broadcast(_n_docs(documents, id_col)))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )

    contrib: Column = (
        F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(avgdl))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum(contrib), 6).alias("bm25_r6"),
        )
    )
