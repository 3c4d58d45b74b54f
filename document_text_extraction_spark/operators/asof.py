"""As-of (point-in-time) join — the time-series join Spark's DataFrame
API lacks natively (SURVEY.md §2.3 notes the reference has no as-of
joins; this is one of the custom operators a crawl/event pipeline
needs: "state of X as of the time of Y" — user attributes at event
time, last price before a trade, most recent crawl before a capture).

Formulation: union the two sides into one tagged stream, sort per key
by (ts, side) with right rows BEFORE left rows at equal timestamps
(inclusive backward match), and carry the most recent right row forward
as ONE struct with ``last(..., ignorenulls=True)`` — every ``_asof``
output column comes from the SAME matched right row (a per-column fill
would let a NULL payload value inherit that column from an older right
row, silently mixing rows — caught by the round-3 review).

Scale shape: ONE hash shuffle on the key + one window sort — O(|L|+|R|)
rows end to end. The naive formulation (inequality join ``l.ts >=
r.ts`` then max-per-left) explodes to O(|L|x|R|) rows per key before
pruning; Spark has no native ASOF strategy to save it (DuckDB does —
which is what the registry oracle uses to cross-check this operator).

Skew: ``partitionBy(key)`` puts a key's entire merged stream into one
window task, so a degenerate hot key (null user, bot account, a
single-host crawl timeline) serializes and can OOM at 100×. Pass
``skew_threshold`` to turn on the banded path for such keys: a cheap
count/min/max pre-aggregation (the same shape as the extraction
pipeline's salting plan) finds keys above the threshold; their rows are
split into ``n_bands`` time bands, the window runs per (key, band) —
parallel across bands — and a tiny per-band boundary aggregate (one row
per (hot key, band): the band's last right row) is window-scanned and
joined back so each band inherits the carry-over from all prior bands.
Identical semantics, two extra narrow shuffles over the hot keys only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _asof_fill(u: DataFrame, key_cols: list[str], ts_col: str,
               tiebreak: bool) -> DataFrame:
    """The core union+window pass: forward-fill the right-row struct
    ``__rpay`` over (ts, side[, tiebreak]) within ``key_cols``."""
    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    if tiebreak:
        order.append(F.col("__tb").asc_nulls_first())
    w = (Window.partitionBy(*key_cols).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return u.withColumn("__fill", F.last("__rpay", ignorenulls=True).over(w))


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str = "ts",
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              tiebreak_col: str | None = None,
              skew_threshold: int | None = None,
              n_bands: int = 32) -> DataFrame:
    """For each left row: the right row with the greatest
    ``right.ts <= left.ts`` within the same ``key_col`` (backward
    inclusive). Right payload columns arrive as ``<col><suffix>``
    (null when no right row precedes); ``<ts_col><suffix>`` carries the
    matched timestamp. All ``<suffix>`` columns come from the same
    matched right row (single-struct forward fill).

    ``tiebreak_col``: orders right rows sharing an identical
    (key, ts) — the LAST under this ordering wins (pass e.g. an event
    id for deterministic output on tied timestamps).

    ``skew_threshold``: when set, keys whose combined row count exceeds
    it run the banded anti-skew plan (see module docstring) with
    ``n_bands`` time bands; keys whose timestamps are all equal cannot
    be banded (ordering is total within one instant) and fall back to
    the single-window path.
    """
    rp = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (key_col, ts_col)]
    pay = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in rp],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    r_side = (right.select(F.col(key_col), F.col(ts_col),
                           pay.alias("__rpay"))
              .withColumn("__side", F.lit(0)))
    if tiebreak_col is not None:
        r_side = r_side.withColumn(
            "__tb", F.col("__rpay")[f"{tiebreak_col}{suffix}"])
    l_side = left.withColumn("__side", F.lit(1))
    u = l_side.unionByName(r_side, allowMissingColumns=True)
    tiebreak = tiebreak_col is not None

    if skew_threshold is None:
        filled = _asof_fill(u, [key_col], ts_col, tiebreak)
    else:
        # hot-key census: one cheap partial-aggregated pass (count +
        # ts range per key), same pattern as pipeline.plan_salting.
        # Keys with a degenerate ts range (all rows one instant) can't
        # band — their window is inherently one ordered run.
        stats = (u.groupBy(key_col)
                 .agg(F.count("*").alias("__n"),
                      F.min(ts_col).alias("__tmin"),
                      F.max(ts_col).alias("__tmax"))
                 .filter((F.col("__n") > skew_threshold)
                         & (F.col("__tmax") > F.col("__tmin")))
                 .select(key_col, "__tmin", "__tmax"))
        tagged = u.join(F.broadcast(stats), key_col, "left")
        is_hot = F.col("__tmin").isNotNull()
        band = F.least(
            F.lit(n_bands - 1),
            F.floor(((F.col(ts_col) - F.col("__tmin")) * n_bands)
                    / (F.col("__tmax") - F.col("__tmin"))),
        ).cast("int")
        tagged = tagged.withColumn(
            "__band", F.when(is_hot, band).otherwise(F.lit(0)))
        cold = tagged.filter(~is_hot).drop("__tmin", "__tmax", "__band")
        hot = tagged.filter(is_hot).drop("__tmin", "__tmax")
        cold_f = _asof_fill(cold, [key_col], ts_col, tiebreak)
        # phase A: in-band fill, parallel across a hot key's bands
        hot_f = _asof_fill(hot, [key_col, "__band"], ts_col, tiebreak)
        # phase B: boundary carry-over. Per (key, band) the LAST right
        # row = max by (ts, tb) — one tiny row per band; a window over
        # these (≤ n_bands rows per key, never skewed) yields each
        # band's seed = last right row of all STRICTLY PRIOR bands.
        last_r = (hot.filter(F.col("__side") == 0)
                  .groupBy(key_col, "__band")
                  .agg(F.max_by(
                      "__rpay",
                      F.struct(F.col(ts_col).alias("__b_ts"),
                               *([F.col("__tb").alias("__b_tb")]
                                 if tiebreak else []))).alias("__rlast"))
                  .withColumn("__bs", F.lit(1)))
        bands = (hot.select(key_col, "__band").distinct()
                 .withColumn("__bs", F.lit(0))
                 .withColumn("__rlast",
                             F.lit(None).cast(
                                 r_side.schema["__rpay"].dataType)))
        wb = (Window.partitionBy(key_col)
              .orderBy(F.col("__band").asc(), F.col("__bs").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        seeds = (last_r.unionByName(bands)
                 .withColumn("__seed",
                             F.last("__rlast", ignorenulls=True).over(wb))
                 .filter(F.col("__bs") == 0)
                 .select(key_col, "__band", "__seed"))
        hot_f = (hot_f.join(F.broadcast(seeds), [key_col, "__band"],
                            "left")
                 .withColumn("__fill",
                             F.coalesce(F.col("__fill"), F.col("__seed")))
                 .drop("__seed"))
        filled = cold_f.unionByName(hot_f.drop("__band"),
                                    allowMissingColumns=True)

    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col("__fill")[f"{c}{suffix}"].alias(f"{c}{suffix}")
                 for c in [*rp, ts_col]]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               key_cols: list[str] | None = None,
               bin_size: float = 3600.0) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with
    ``start <= point < end`` (and equal ``key_cols``), WITHOUT the
    inequality-join cross product.

    Banding trick: each interval explodes into the time bins it covers
    (``floor(start/bin) .. last_covered_bin``), each point tags its
    single bin, and the join becomes an EQUI-join on (keys, bin)
    followed by the exact range predicate. A point's bin is unique, so
    each qualifying pair appears exactly once — no dedup. Shuffle cost
    is O(points + intervals × interval_len/bin): pick ``bin_size``
    near the typical interval length (numeric columns — epoch seconds,
    positions, offsets — all work; Spark's own plan for a raw
    inequality join is BroadcastNestedLoop/cartesian, which this
    avoids at any scale).

    Exclusive-end trimming: when ``bin_size`` and the end value are
    both integral, the last covered bin is computed in INTEGER
    arithmetic — ``(end-1) div bin`` via pmod, exact at epoch-micro
    magnitudes where a float epsilon (``end - 1e-9``) silently vanishes
    — so an interval ending exactly on a bin boundary does not explode
    into an extra always-empty bin. Fractional ends fall back to
    ``floor(end/bin)``: at most one extra candidate bin, removed by the
    exact predicate. (Quotients are exact up to 2^53 — 285 years of
    epoch microseconds.)
    """
    keys = list(key_cols or [])
    lo_bin = F.floor(F.col(start_col) / bin_size)
    if float(bin_size).is_integer() and bin_size > 0:
        b = F.lit(int(bin_size))
        end_m1 = F.col(end_col).cast("long") - F.lit(1)
        int_hi = ((end_m1 - F.pmod(end_m1, b)) / b).cast("long")
        is_integral = (F.col(end_col).cast("long").cast("double")
                       == F.col(end_col).cast("double"))
        hi_bin = F.when(is_integral, int_hi).otherwise(
            F.floor(F.col(end_col) / bin_size))
    else:
        hi_bin = F.floor(F.col(end_col) / bin_size)
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
