#!/usr/bin/env python
"""Production QA: spot-check a written extraction table against the
pure-Python oracle, byte for byte.

Samples N urls deterministically (md5-bucket, so re-runs check the
same rows), re-reads their raw pages, runs ``oracle.extract_document``
driver-free on the executors, and compares status + extracted bytes +
route. This operationalizes the corpus-level byte-identity guarantee
as a post-job gate a 10^12-doc deployment runs on a tiny sample after
every extraction run (the manual 400-doc check recorded in
BENCH/EVIDENCE.md, as a job).

    python jobs/spot_check.py --pages PAGES_DIR --extracted OUT_DIR \
        [--sample-permille 5]

Demo: --demo /tmp/sc  (synthesizes pages, extracts, checks 100%).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages")
    ap.add_argument("--extracted")
    ap.add_argument("--sample-permille", type=int, default=5)
    ap.add_argument("--demo", metavar="DIR")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from document_text_extraction_spark.session import get_spark
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )

    spark = get_spark("dte-spot-check")
    ensure_package_shipped(spark)

    if args.demo:
        from document_text_extraction_spark import pipeline
        from document_text_extraction_spark.sources import (
            synth_web_pages,
        )
        base = args.demo
        synth_web_pages(spark, 300).write.mode("overwrite").parquet(
            f"{base}/pages")
        pages = spark.read.parquet(f"{base}/pages")
        (pipeline.extract_df(pages, n_buckets=16)
         .write.mode("overwrite").parquet(f"{base}/out"))
        pages_dir, out_dir = f"{base}/pages", f"{base}/out"
        permille = 1000
    else:
        if not (args.pages and args.extracted):
            ap.error("--pages and --extracted required (or --demo)")
        pages_dir, out_dir = args.pages, args.extracted
        permille = args.sample_permille

    pages = spark.read.parquet(pages_dir).select("url", "html")
    written = spark.read.parquet(out_dir).select(
        "url", F.col("extracted_text").alias("written_text"),
        F.col("lineage.status").alias("written_status"),
        F.col("lineage.route").alias("written_route"))
    # deterministic sample: md5 bucket of the url
    bucket = F.conv(F.substring(F.md5("url"), 1, 6), 16, 10
                    ).cast("long") % 1000
    sample = pages.filter(bucket < permille)

    ref_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("ref_text", T.StringType()),
        T.StructField("ref_status", T.StringType()),
        T.StructField("ref_route", T.StringType()),
    ])

    def ref_batch(batches):
        import pandas as pd

        from document_text_extraction_spark import oracle
        for b in batches:
            rows = []
            for url, html in zip(b["url"], b["html"]):
                rec = oracle.extract_document(bytes(html or b""))
                rows.append((url, rec["extracted_text"],
                             rec["status"], rec["route"]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in ref_schema.fields])

    ref = sample.mapInPandas(ref_batch, schema=ref_schema)
    joined = ref.join(written, "url", "left")
    agg = joined.agg(
        F.count("*").alias("checked"),
        F.sum((F.col("written_status").isNull()).cast("long"))
        .alias("missing_rows"),
        F.sum((F.col("written_status") != F.col("ref_status"))
              .cast("long")).alias("status_mismatches"),
        F.sum((F.col("written_route") != F.col("ref_route"))
              .cast("long")).alias("route_mismatches"),
        F.sum((F.coalesce(F.col("written_text"), F.lit(""))
               != F.coalesce(F.col("ref_text"), F.lit("")))
              .cast("long")).alias("text_mismatches"),
    ).collect()[0]
    summary = {k: int(agg[k] or 0) for k in
               ("checked", "missing_rows", "status_mismatches",
                "route_mismatches", "text_mismatches")}
    summary["ok"] = (summary["missing_rows"] == 0
                     and summary["status_mismatches"] == 0
                     and summary["route_mismatches"] == 0
                     and summary["text_mismatches"] == 0)
    print(json.dumps(summary))
    spark.stop()
    if not summary["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
