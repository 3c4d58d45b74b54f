"""Region geometry operators over span tables — the dataset-level form
of the reference's per-image bbox kernels:

* O41 merge nearby detections (``/root/reference/cv_yolo_extractor_v2.py
  :208-272``): boxes whose vertical gap is small merge into one envelope.
  The reference does an O(n²) pairwise sweep with a ``used`` set; for
  1-D vertical intervals the sorted running-max sweep below produces the
  same transitive clusters as ONE window pass — no pairwise join.
* O42 split oversized detection (``cv_yolo_extractor_v2.py:146-205``):
  a region covering too much of the page splits at the valleys of its
  density profile. The text-layer counterpart splits at the largest
  vertical gaps between member spans (the same O29 largest-gap
  boundary rule used for columns, applied to y).
* O11 min-region-size filter (``grid_detector_v4.py`` family): drop
  spans below a size floor.
* O13 bbox clip: clamp coordinates into the page box.

All JVM-side (windows + aggregates + array expressions); shuffle profile
is one hash partition by (url, page) — at 10^12 docs this is the same
key the extraction already bucketed by, so AQE coalesces it cheaply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def cluster_spans_1d(df: DataFrame, gap: float,
                     keys: list[str] = ("url", "page"),
                     lo: str = "y0", hi: str = "y1") -> DataFrame:
    """Assign a ``region_id`` to every span: spans whose vertical
    intervals are within ``gap`` of the running envelope share a region
    (gaps-and-islands with a running max — transitive, like the
    reference's pairwise merge loop, but one window pass)."""
    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(F.col(lo), F.col(hi))
    run_end = F.max(hi).over(w.rowsBetween(W.unboundedPreceding, -1))
    new_region = (
        run_end.isNull() | (F.col(lo) > run_end + F.lit(gap))
    ).cast("int")
    region = F.sum(new_region).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn("region_id", region)


def region_envelopes(clustered: DataFrame,
                     keys: list[str] = ("url", "page"),
                     order_col: str = "block") -> DataFrame:
    """Merge each region's spans into one envelope row: bbox = covering
    box (min/max, ``cv_yolo_extractor_v2.py:255-260``), text = member
    texts in reading order."""
    keys = list(keys)
    return (
        clustered.groupBy(*keys, "region_id")
        .agg(
            F.min("x0").alias("x0"), F.min("y0").alias("y0"),
            F.max("x1").alias("x1"), F.max("y1").alias("y1"),
            F.count("*").alias("n_spans"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct(order_col, "text"))
                ).getField("text"),
                "\n",
            ).alias("text"),
        )
    )


def merge_nearby_spans(df: DataFrame, gap: float,
                       keys: list[str] = ("url", "page")) -> DataFrame:
    """O41 in one call: cluster + envelope."""
    return region_envelopes(cluster_spans_1d(df, gap, keys), keys)


def split_oversized_regions(clustered: DataFrame, max_height: float,
                            fine_gap: float,
                            keys: list[str] = ("url", "page")) -> DataFrame:
    """O42: regions taller than ``max_height`` re-cluster their member
    spans at the finer ``fine_gap`` (split at significant vertical gaps
    — the text-layer form of the reference's density-valley split);
    small regions pass through with ``sub_region = 0``."""
    keys = list(keys)
    h = F.max("y1").over(W.partitionBy(*keys, "region_id")) - \
        F.min("y0").over(W.partitionBy(*keys, "region_id"))
    tall = clustered.withColumn("_oversized", h > F.lit(max_height))
    w = W.partitionBy(*keys, "region_id").orderBy("y0", "y1")
    run_end = F.max("y1").over(w.rowsBetween(W.unboundedPreceding, -1))
    new_sub = (
        F.col("_oversized")
        & run_end.isNotNull()
        & (F.col("y0") > run_end + F.lit(fine_gap))
    ).cast("int")
    sub = F.sum(new_sub).over(w.rowsBetween(W.unboundedPreceding,
                                            W.currentRow))
    return tall.withColumn("sub_region", sub).drop("_oversized")


def min_span_filter(spans: Column, min_chars: int) -> Column:
    """O11 dedicated span predicate: keep spans with enough text."""
    return F.filter(
        spans, lambda s: F.length(s.getField("text")) >= min_chars)


def clip_bbox_cols(x0: Column, y0: Column, x1: Column, y1: Column,
                   page_w: float, page_h: float) -> Column:
    """O13 bbox clip into the page box (struct of clamped coords)."""
    def clamp(c, hi):
        return F.greatest(F.lit(0.0), F.least(c, F.lit(hi)))
    return F.struct(
        clamp(x0, page_w).alias("x0"), clamp(y0, page_h).alias("y0"),
        clamp(x1, page_w).alias("x1"), clamp(y1, page_h).alias("y1"),
    )
