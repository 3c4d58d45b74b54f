"""Overlapping context-window chunking — training-example preparation.

LM training splits long documents into fixed-size token windows with a
stride overlap (the Hugging Face ``return_overflowing_tokens`` shape):
window k covers tokens ``[k*stride, k*stride + window)``. Chunks are
pure per-row array expressions — map-only, no shuffle, no UDF — so the
operator runs at full corpus width inside whatever stage feeds it.

Semantics (deterministic, SQL-replicable): a window starts at every
multiple of ``stride`` below the token count; the final windows may be
shorter than ``window`` (document tail) and, when ``stride < window``,
a trailing window can be a fully-overlapped suffix — kept, as HF does,
so every token appears in a window ending no earlier than it.

Complementary to ``queries.q_pack_sequences`` (which packs *whole*
short docs into budgeted shards); this op splits *long* docs down to
window size first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_windows(docs: DataFrame, window: int = 64, stride: int = 48,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, chunk_id, text, n_tokens) — one row per overlapping
    whitespace-token window."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    ex = docs.select(
        F.col(id_col), toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_s"),
    )
    return ex.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(
            F.slice("_toks", F.col("_s") + 1, F.lit(window)), " "
        ).alias("text"),
        F.least(F.lit(window), F.size("_toks") - F.col("_s"))
        .cast("long").alias("n_tokens"),
    )
