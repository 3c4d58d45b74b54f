"""As-of (point-in-time) join — the time-series join Spark's DataFrame
API lacks natively (SURVEY.md §2.3 notes the reference has no as-of
joins; this is one of the custom operators a crawl/event pipeline
needs: "state of X as of the time of Y" — user attributes at event
time, last price before a trade, most recent crawl before a capture).

Formulation: union the two sides into one tagged stream, sort per key
by (ts, side) with right rows BEFORE left rows at equal timestamps
(inclusive backward match), and carry every right payload forward with
``last(..., ignorenulls=True)`` — each left row picks up exactly the
most recent right row that governs it.

Scale shape: ONE hash shuffle on the key + one window sort — O(|L|+|R|)
rows end to end. The naive formulation (inequality join ``l.ts >=
r.ts`` then max-per-left) explodes to O(|L|x|R|) rows per key before
pruning; Spark has no native ASOF strategy to save it (DuckDB does —
which is what the registry oracle uses to cross-check this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str = "ts",
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              tiebreak_col: str | None = None) -> DataFrame:
    """For each left row: the right row with the greatest
    ``right.ts <= left.ts`` within the same ``key_col`` (backward
    inclusive). Right payload columns arrive as ``<col><suffix>``
    (null when no right row precedes); ``<ts_col><suffix>`` carries the
    matched timestamp.

    ``tiebreak_col``: orders right rows sharing an identical
    (key, ts) — the LAST under this ordering wins (pass e.g. an event
    id for deterministic output on tied timestamps).
    """
    rp = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (key_col, ts_col)]
    r_side = right.select(
        F.col(key_col), F.col(ts_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in rp],
    ).withColumn(f"{ts_col}{suffix}", F.col(ts_col)) \
     .withColumn("__side", F.lit(0))
    if tiebreak_col is not None:
        r_side = r_side.withColumn("__tb",
                                   F.col(f"{tiebreak_col}{suffix}"))
    l_side = left.withColumn("__side", F.lit(1))
    u = l_side.unionByName(r_side, allowMissingColumns=True)
    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    if tiebreak_col is not None:
        order.append(F.col("__tb").asc_nulls_first())
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u
    for c in [*rp, ts_col]:
        name = f"{c}{suffix}"
        filled = filled.withColumn(
            name, F.last(name, ignorenulls=True).over(w))
    out_cols = list(left.columns) + [f"{c}{suffix}" for c in rp] \
        + [f"{ts_col}{suffix}"]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               key_cols: list[str] | None = None,
               bin_size: float = 3600.0) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with
    ``start <= point < end`` (and equal ``key_cols``), WITHOUT the
    inequality-join cross product.

    Banding trick: each interval explodes into the time bins it covers
    (``floor(start/bin) .. floor((end - ε)/bin)``), each point tags its
    single bin, and the join becomes an EQUI-join on (keys, bin)
    followed by the exact range predicate. A point's bin is unique, so
    each qualifying pair appears exactly once — no dedup. Shuffle cost
    is O(points + intervals × interval_len/bin): pick ``bin_size``
    near the typical interval length (numeric columns — epoch seconds,
    positions, offsets — all work; Spark's own plan for a raw
    inequality join is BroadcastNestedLoop/cartesian, which this
    avoids at any scale)."""
    keys = list(key_cols or [])
    lo_bin = F.floor(F.col(start_col) / bin_size)
    hi_bin = F.floor((F.col(end_col)
                      - F.lit(1e-9)) / bin_size)
    iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(lo_bin.cast("long"),
                             F.greatest(hi_bin.cast("long"),
                                        lo_bin.cast("long")))),
    )
    pt = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_size).cast("long"))
    cond = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) < F.col(end_col))
    joined = pt.join(iv, [*keys, "__bin"]).filter(cond)
    return joined.drop("__bin")
