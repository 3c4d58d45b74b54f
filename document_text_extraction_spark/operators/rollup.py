"""Hypertable-style multi-resolution rollups — the continuous-aggregate
pattern (TimescaleDB hypertables; Druid/ClickHouse rollup tables) for
event streams at corpus scale.

The defining property is NOT the groupBy — it is that each coarser
resolution re-aggregates the NEXT-FINER rollup, never the raw table:
count/sum/min/max are re-aggregable, so the 1-day level reads the
1-hour level (1/3600 of the raw rows) instead of rescanning raw
events. At 10^12 events the raw table is touched exactly once for the
finest level and every further resolution is almost free; refreshing a
day of rollups after late data touches only that day's fine-level rows.

Reference analogue: none (the reference has per-run counters only);
this is the metrics layer a crawl/event pipeline keeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_AGGS = ("n_events", "total_value", "min_value", "max_value")


def time_bucket(ts_col: str, seconds: int) -> F.Column:
    """Epoch-aligned bucket start (seconds) — the hypertable chunk key."""
    t = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000
    return (F.floor(t / seconds) * seconds).cast("long")


def hypertable_rollup(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "event_type",
                      value_col: str = "value",
                      resolutions: tuple[int, ...] = (3600, 86400),
                      ) -> dict[int, DataFrame]:
    """``{resolution_seconds: rollup_df}``, finest first; each coarser
    level derives from the previous one.

    Every level has schema ``(bucket_start_s, <key>, n_events,
    total_value, min_value, max_value)``. ``resolutions`` must be
    ascending and each a multiple of the previous (chunk alignment —
    the re-aggregation is exact only when coarse buckets are unions of
    fine ones). ``total_value`` is accumulated in integer cents so
    re-aggregation order cannot perturb a float sum."""
    res = list(resolutions)
    if any(b % a for a, b in zip(res, res[1:])):
        raise ValueError(f"resolutions must nest: {res}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    finest = (
        events.groupBy(
            time_bucket(ts_col, res[0]).alias("bucket_start_s"),
            F.col(key_col))
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum(cents).alias("total_value"),
             F.min(cents).alias("min_value"),
             F.max(cents).alias("max_value"))
    )
    out = {res[0]: finest}
    prev = finest
    for r in res[1:]:
        prev = (
            prev.groupBy(
                ((F.floor(F.col("bucket_start_s") / r) * r).cast("long"))
                .alias("bucket_start_s"),
                F.col(key_col))
            .agg(F.sum("n_events").cast("long").alias("n_events"),
                 F.sum("total_value").alias("total_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value"))
        )
        out[r] = prev
    return out
