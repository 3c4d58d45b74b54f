"""Crawl capture diffing — revisit / change classification per URL.

A production crawler re-fetches resources and must decide, per capture,
whether the content is NEW (first time this URL is seen), UNCHANGED
(byte-identical to the previous capture — written as a tiny
``warc/revisit`` record instead of a full response, the single biggest
storage saver in recurring crawls), or CHANGED (content drifted — the
capture a freshness-aware training pipeline keeps).  The reference
corpus has no recurring-crawl notion (single-shot folder scans,
``/root/reference/hybrid_cv_parser.py:33-60`` walks each file once);
this is the web-scale extension the CDX index
(:mod:`..functions.surt`) feeds.

Spark shape: ONE hash shuffle on ``url`` + a lag window over each
URL's capture history.  Capture histories are short (bounded by the
crawl cadence — tens of rows even for daily re-crawls of a year), and
URL cardinality is huge, so the window parallelizes perfectly and no
key can serialize a task: the opposite skew profile of the as-of join,
and why this operator needs no banding path.  Digest comparison uses
the content digest column (md5 over payload bytes, computed JVM-side
upstream) rather than the payload itself, so the shuffle carries ~50
bytes per capture, not page bodies — at 10^12 captures the shuffle is
O(index), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: classification values, in severity order
CHANGE_NEW = "new"
CHANGE_UNCHANGED = "unchanged"
CHANGE_CHANGED = "changed"


def classify_captures(captures: DataFrame, url_col: str = "url",
                      ts_col: str = "ts_epoch",
                      digest_col: str = "digest",
                      out_col: str = "change") -> DataFrame:
    """Tag every capture row with ``new`` / ``unchanged`` / ``changed``.

    ``unchanged`` ⇔ the digest equals the digest of the immediately
    preceding capture of the same URL (strictly earlier ``ts_col``;
    ties broken by digest order for determinism on pathological
    same-instant double-captures).  A URL's first capture is ``new``
    even if another URL carries the same digest — revisit records are
    per-resource, not global (URL-agnostic dedup is the separate
    ``operators.dedup`` family).
    """
    w = W.partitionBy(url_col).orderBy(
        F.col(ts_col).asc(), F.col(digest_col).asc())
    prev = F.lag(F.col(digest_col)).over(w)
    return captures.withColumn(
        out_col,
        F.when(prev.isNull(), F.lit(CHANGE_NEW))
        .when(prev == F.col(digest_col), F.lit(CHANGE_UNCHANGED))
        .otherwise(F.lit(CHANGE_CHANGED)),
    )


def change_summary(captures: DataFrame, url_col: str = "url",
                   ts_col: str = "ts_epoch",
                   digest_col: str = "digest") -> DataFrame:
    """Per-URL crawl-freshness rollup: capture count, distinct content
    versions, and the timestamp of the last CONTENT CHANGE (not the
    last fetch — the quantity recrawl schedulers actually key on).

    One additional map-side-combinable groupBy after the lag pass.
    """
    tagged = classify_captures(captures, url_col, ts_col, digest_col)
    changed_ts = F.when(
        F.col("change") != CHANGE_UNCHANGED, F.col(ts_col))
    return (
        tagged.groupBy(url_col)
        .agg(F.count("*").cast("long").alias("n_captures"),
             F.count_distinct(F.col(digest_col)).cast("long")
             .alias("n_versions"),
             F.max(changed_ts).cast("long").alias("last_change_ts"))
    )
