"""Corpus-level term statistics: document frequency + TF-IDF
distinctive terms per document.

The keyword-extraction pass of a corpus pipeline (topic tagging, index
building, quality heuristics). Shuffle profile at 100 TB:

* term explode is map-side; the document-frequency aggregation is one
  map-side-combined ``groupBy(term)`` whose key cardinality is the
  vocabulary (bounded, ≪ corpus);
* the DF table is vocabulary-sized → joined back with an explicit
  ``broadcast`` — per-doc scoring never shuffles the corpus;
* top-k per doc is one window over the doc's own terms.

Ranking is by the INTEGER key (tf desc, df asc, term asc) — tf-primary
with rarity then lexicographic tie-breaks — so cross-engine float
(``ln``) differences cannot reorder results; the smoothed TF-IDF score
``tf * (ln((N+1)/(df+1)) + 1)`` is emitted as a rounded column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf) — whitespace terms with per-doc counts."""
    return (
        docs.select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " "))
                    .alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k distinctive terms per document:
    (id, term, rank, tf, df, score)."""
    n_docs = docs.count()
    tf = term_frequencies(docs, id_col, text_col)
    df = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("df"))
    scored = tf.join(F.broadcast(df), "term")
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", F.col("rank").cast("long").alias("rank"),
            "tf", "df",
            F.round(
                F.col("tf")
                * (F.log((F.lit(float(n_docs + 1)))
                         / (F.col("df") + 1)) + 1.0),
                6,
            ).alias("score"),
        )
    )
