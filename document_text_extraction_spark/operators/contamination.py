"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word n-grams.

The standard LLM-training-data hygiene pass (GPT-3 appendix C /
PaLM-style n-gram collision): any training document sharing at least one
word n-gram with a benchmark prompt/answer is contaminated and must be
reported (and usually dropped) before training.

Scale shape (100 TB corpus, benchmark sets are KBs–MBs):

* the benchmark side is tiny by construction → its distinct
  ``(bench_id, shingle)`` pairs are **broadcast**; the corpus side never
  shuffles for the probe — the join is map-side against every corpus
  partition;
* the only wide operation is the final per-document aggregation of hit
  rows, whose cardinality is bounded by (contaminated docs × benchmark
  n-grams), i.e. tiny relative to the corpus;
* corpus shingling is map-only (``dedup.shingles_col`` array
  expressions), O(tokens) per document, no explode of clean documents
  past the probe filter.

Reference analogue: the reference has no corpus hygiene (single-machine
extraction scripts); this is part of the training-pipeline layer the
100 TB engine adds (same family as ``operators.dedup`` /
``curation.curate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _explode_nonnull, shingles_col

DEFAULT_NGRAM = 8


def benchmark_ngrams(bench: DataFrame, k: int = DEFAULT_NGRAM,
                     id_col: str = "bench_id",
                     text_col: str = "text") -> DataFrame:
    """Distinct ``(bench_id, shingle)`` word-k-gram pairs of the
    evaluation set — the broadcast probe side."""
    arr = bench.select(
        F.col(id_col),
        F.array_distinct(shingles_col(F.col(text_col), k))
        .alias("__sh"))
    return (_explode_nonnull(arr, "__sh", "shingle", [id_col])
            .dropDuplicates([id_col, "shingle"]))


def contamination_report(docs: DataFrame, bench: DataFrame,
                         k: int = DEFAULT_NGRAM,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         bench_id_col: str = "bench_id",
                         bench_text_col: str = "text") -> DataFrame:
    """Per contaminated document: how many distinct benchmark n-grams it
    contains and which benchmark items it collides with.

    Returns ``(doc_id, n_hit_ngrams, bench_ids)`` — only documents with
    at least one collision (clean documents produce no probe-join rows,
    so they never reach the aggregation).
    """
    probe = benchmark_ngrams(bench, k, bench_id_col, bench_text_col)
    # outer-explode + null filter: a plain explode of the 8-gram array
    # re-evaluates the whole shingle expression per row through
    # Catalyst's inferred size() filter (see dedup._explode_nonnull) —
    # on the corpus side that doubled the dominant map cost.
    doc_arr = docs.select(
        F.col(id_col),
        F.array_distinct(shingles_col(F.col(text_col), k))
        .alias("__sh"))
    doc_sh = _explode_nonnull(doc_arr, "__sh", "shingle", [id_col])
    hits = doc_sh.join(F.broadcast(probe), "shingle")
    return hits.groupBy(id_col).agg(
        F.countDistinct("shingle").cast("long").alias("n_hit_ngrams"),
        F.array_sort(F.collect_set(bench_id_col)).alias("bench_ids"),
    )


def decontaminate(docs: DataFrame, bench: DataFrame,
                  k: int = DEFAULT_NGRAM,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_id_col: str = "bench_id",
                  bench_text_col: str = "text") -> DataFrame:
    """The transform: drop every contaminated document.

    The contaminated-id set is tiny (bounded by the benchmark's reach),
    so it broadcasts into a left-anti join — the corpus side stays
    map-only end to end.
    """
    bad = contamination_report(
        docs, bench, k, id_col, text_col, bench_id_col, bench_text_col
    ).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")
