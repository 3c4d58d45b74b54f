#!/usr/bin/env python
"""Crawl-over-crawl incremental extraction CLI
(pipeline.incremental_extract_df).

Cluster form:

    spark-submit --py-files dte.zip jobs/incremental_extract.py \
        --pages /path/to/new_crawl --prev /path/to/previous_extracted \
        --output /path/to/extracted_v2

``--prev`` must carry ``html_digest`` (write it alongside the output:
``extract_df(pages).withColumn("html_digest",
pipeline.html_digest_col())`` — or pass ``--prev-pages`` pointing at
the previous crawl's pages table and the digest join happens here).

Demo form (synthesizes two crawls with a planted change rate):

    python jobs/incremental_extract.py --demo /tmp/ix \
        [--docs 400] [--change-every 10]
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
    ap.add_argument("--pages", help="parquet dir: the NEW crawl")
    ap.add_argument("--prev", help="parquet dir: previous extracted "
                                   "output (with html_digest)")
    ap.add_argument("--prev-pages",
                    help="previous crawl's pages table — used to add "
                         "html_digest to --prev when it lacks one")
    ap.add_argument("--output", help="output parquet dir")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--demo", metavar="DIR",
                    help="self-contained demo under DIR")
    ap.add_argument("--docs", type=int, default=400)
    ap.add_argument("--change-every", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from document_text_extraction_spark import pipeline
    from document_text_extraction_spark.session import get_spark
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )

    spark = get_spark("dte-incremental")
    ensure_package_shipped(spark)

    if args.demo:
        base = args.demo
        from document_text_extraction_spark.sources import (
            synth_web_pages,
        )
        pages1 = synth_web_pages(spark, args.docs)
        pages1.write.mode("overwrite").parquet(f"{base}/crawl1")
        pages1 = spark.read.parquet(f"{base}/crawl1")
        (pipeline.extract_df(pages1, n_buckets=args.buckets)
         .join(pages1.select("url", pipeline.html_digest_col()
                             .alias("html_digest")), "url")
         .write.mode("overwrite").parquet(f"{base}/prev"))
        # crawl 2: every Nth doc gains appended content
        did = F.element_at(F.split("url", "/"), -1).cast("long")
        changed_html = F.when(
            did % args.change_every == 0,
            F.concat(F.col("html"),
                     F.lit(b"<p>revision appended in crawl 2</p>")),
        ).otherwise(F.col("html"))
        pages2 = pages1.withColumn("html", changed_html)
        pages2.write.mode("overwrite").parquet(f"{base}/crawl2")
        pages_df = spark.read.parquet(f"{base}/crawl2")
        prev_df = spark.read.parquet(f"{base}/prev")
        out_dir = f"{base}/out"
    else:
        if not (args.pages and args.prev and args.output):
            ap.error("--pages, --prev and --output required "
                     "(or use --demo DIR)")
        pages_df = spark.read.parquet(args.pages)
        prev_df = spark.read.parquet(args.prev)
        if "html_digest" not in prev_df.columns:
            if not args.prev_pages:
                ap.error("--prev lacks html_digest; pass --prev-pages")
            pp = spark.read.parquet(args.prev_pages)
            prev_df = prev_df.join(
                pp.select("url", pipeline.html_digest_col()
                          .alias("html_digest")), "url")
        out_dir = args.output

    out = pipeline.incremental_extract_df(pages_df, prev_df,
                                          n_buckets=args.buckets)
    (out.withColumn("html_digest", F.lit(None).cast("long"))
     .drop("html_digest")  # digest re-derivable; keep output schema
     .write.mode("overwrite").parquet(out_dir))
    written = spark.read.parquet(out_dir)
    summary = {
        "docs": written.count(),
        "reused": written.filter("from_cache").count(),
        "reextracted": written.filter("NOT from_cache").count(),
        "output": out_dir,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
