"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (O25's streaming form).

The batch engine computes sessions with a gaps-and-islands window
(``operators/sessionize.py``); on an unbounded stream that fold needs
per-key state: each user's open session lives in the state store, new
events either extend it or close it (gap exceeded → the closed session
is EMITTED and a new one opens), and an **event-time timeout** closes
sessions for users who simply stop sending (timeout fires when the
watermark passes ``session_end + gap``).

Semantics match the batch operator for every emitted session: a session
is emitted exactly once, either by an in-stream gap split or by
watermark timeout; the most recent session per user stays pending in
the checkpoint until more data or a later watermark arrives.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = ("user_id bigint, session_start_us bigint, "
              "session_end_us bigint, n_events bigint")
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def make_sessionizer(gap_seconds: int):
    """Build the (key, batches, state) fn for applyInPandasWithState."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])

        def row(start_us: int, end_us: int, n: int) -> dict:
            return {"user_id": user_id, "session_start_us": start_us,
                    "session_end_us": end_us, "n_events": n}

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame([row(start_us, end_us, n)])
            return
        ts: list[int] = []
        for pdf in pdfs:
            # null/uncastable event times surface as NaN here; int(NaN)
            # would kill the task (and the query) — drop them, matching
            # the batch sessionizer's null-last window ordering
            ts.extend(int(v) for v in pdf["ts_us"] if v == v)
        ts.sort()
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = None
            n = 0
        closed: list[dict] = []
        for t in ts:
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us > gap_us:
                closed.append(row(start_us, end_us, n))
                start_us, end_us, n = t, t, 1
            else:
                end_us = max(end_us, t)
                n += 1
        state.update((start_us, end_us, n))
        # close this session when the watermark passes end + gap (ms)
        state.setTimeoutTimestamp((end_us + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def streaming_sessionize(events: DataFrame, gap_seconds: int = 600,
                         ts_col: str = "ts", user_col: str = "user_id",
                         watermark: str = "0 seconds") -> DataFrame:
    """events stream → one row per CLOSED session
    ``(user_id, session_start_us, session_end_us, n_events)``.

    Scale shape: state is O(open sessions) = O(active users), keyed and
    partitioned by user — the same key the batch window shuffles on; the
    state store scales horizontally with executors.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    keyed = (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.col(ts_col),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
