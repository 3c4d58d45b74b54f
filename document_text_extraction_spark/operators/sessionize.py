"""Gaps-and-islands sessionization, prefix sums and deterministic mode.

These are the dataset-level analogues of the reference's histogram
kernels (SURVEY.md O25 consecutive-run grouping, O28 prefix sums, O34
mode): the same lag/flag/cumulative-sum algorithm the reference runs on
pixel histograms (``/root/reference/grid_detector_v1.py:47-85``), applied
to an event stream with window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 600) -> DataFrame:
    """Assign a session id per user: a new session starts when the gap to
    the previous event exceeds ``gap_seconds`` (exact microsecond
    arithmetic — no float timestamps)."""
    # NTZ parquet timestamps: cast is wall-clock == UTC epoch (session
    # timezone pinned to UTC in session.py), matching DuckDB's epoch_us
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = W.partitionBy(user_col).orderBy(us)
    prev = F.lag(us).over(w)
    new_session = (
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )


def user_session_counts(df: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts",
                        gap_seconds: int = 600) -> DataFrame:
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return (
        s.groupBy(user_col)
        .agg(F.max("session_id").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


def running_sum(df: DataFrame, part_col: str, order_cols: list[str],
                val_col: str, alias: str = "running") -> DataFrame:
    """Prefix sum (O28 ``np.cumsum`` analogue) with a total ordering.

    No rounding here — callers needing cross-engine comparability apply
    floor-scaling, which is bit-stable for identical double sequences.
    """
    w = (
        W.partitionBy(part_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(alias, F.sum(val_col).over(w))


def mode_by(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Deterministic mode: most frequent value, ties broken by value
    ascending (the reference's ``max(set(c), key=c.count)`` is
    iteration-order dependent — this version is total)."""
    counts = df.groupBy(group_col, value_col).agg(F.count("*").alias("n"))
    w = W.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(group_col), F.col(value_col).alias("mode_value"),
                F.col("n").alias("mode_count"))
    )
