"""Watermarked windowed aggregation over the events stream — the
late-data-tolerant counterpart of the batch rollups (O23/O31 family).

``append`` output emits a window only after the watermark passes its
end, i.e. once late data can no longer change it: the standard
Structured Streaming pattern for per-window counters at crawl scale
(state is O(open windows × keys), partitioned by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(stream: DataFrame, key_cols: list[str],
                    ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: first record per key wins; the watermark
    bounds the dedup state (keys older than it are evicted — the
    streaming form of `deduplicate_keep_first`, with the same
    'first capture wins' semantics inside the watermark horizon).

    ``dropDuplicatesWithinWatermark``, not ``dropDuplicates``: with a
    key-only subset, plain dropDuplicates never applies the watermark
    to its state store (eviction only happens when the event-time
    column is part of the dedup keys), so a long-running crawl stream
    would grow one state entry per key forever. The WithinWatermark
    form is exactly the bounded-state contract this function
    documents."""
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def streaming_windowed_counts(events: DataFrame,
                              window_duration: str = "1 hour",
                              slide: str | None = None,
                              watermark: str = "10 minutes",
                              ts_col: str = "ts",
                              key_col: str = "event_type") -> DataFrame:
    """events stream → (window_start, window_end, key, n_events,
    total_cents) per closed window."""
    e = (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
    )
    win = (F.window(F.col(ts_col), window_duration, slide)
           if slide else F.window(F.col(ts_col), window_duration))
    agg = [F.count("*").alias("n_events")]
    out_cols = ["n_events"]
    if "value" in events.columns:
        agg.append(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("total_cents"))
        out_cols.append("total_cents")
    return (
        e.groupBy(win.alias("w"), F.col(key_col))
        .agg(*agg)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *out_cols,
        )
    )
