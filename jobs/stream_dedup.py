#!/usr/bin/env python
"""Production entry point for STREAMING incremental dedup: watch a
crawl-increment directory and admit only first-seen content, with the
fingerprint store carrying state across micro-batches and restarts.

Cluster form (north rule):

    spark-submit --py-files dte.zip jobs/stream_dedup.py \
        --input /path/to/increment_dir --fp-store /path/to/fps \
        --output /path/to/admitted --checkpoint /path/to/ck \
        [--seed-from /path/to/ingested_corpus]

``--seed-from`` initializes the fingerprint store from an
already-ingested corpus (run once); afterwards every invocation is an
``availableNow`` catch-up run that processes whatever new files landed
in ``--input`` since the last checkpoint and exits. Replays are safe:
outputs and fingerprints are batch_id-partitioned and overwritten (see
``streaming/stream.run_incremental_dedup_stream``).

Local/sandbox smoke:

    python jobs/stream_dedup.py --demo /tmp/sdedup_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of (doc_id, text) increment")
    ap.add_argument("--fp-store", help="fingerprint store dir")
    ap.add_argument("--output", help="admitted-docs dir")
    ap.add_argument("--checkpoint", help="streaming checkpoint dir")
    ap.add_argument("--seed-from",
                    help="parquet dir of the already-ingested corpus; "
                         "seeds the fingerprint store before streaming")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--demo", metavar="DIR",
                    help="self-contained two-arrival demo under DIR")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from document_text_extraction_spark.session import get_spark
        spark = get_spark("dte-stream-dedup")
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )
    from document_text_extraction_spark.streaming.stream import (
        run_incremental_dedup_stream,
        seed_fingerprint_store,
    )
    ensure_package_shipped(spark)

    if args.demo:
        base = args.demo
        existing = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"])
        seed_fingerprint_store(existing, f"{base}/fps")
        spark.createDataFrame(
            [(10, "alpha beta"), (11, "epsilon zeta")],
            ["doc_id", "text"]).write.mode("overwrite").parquet(
            f"{base}/in")
        run_incremental_dedup_stream(
            spark, f"{base}/in", f"{base}/fps", f"{base}/out",
            f"{base}/ck")
        spark.createDataFrame(
            [(20, "epsilon zeta"), (21, "eta theta")],
            ["doc_id", "text"]).write.mode("append").parquet(f"{base}/in")
        run_incremental_dedup_stream(
            spark, f"{base}/in", f"{base}/fps", f"{base}/out",
            f"{base}/ck")
        kept = sorted(
            r["doc_id"] for r in
            spark.read.parquet(f"{base}/out").select("doc_id").collect())
        print(json.dumps({"admitted_doc_ids": kept}))
        return

    if not (args.input and args.fp_store and args.output
            and args.checkpoint):
        ap.error("--input/--fp-store/--output/--checkpoint are required "
                 "(or use --demo DIR)")
    if args.seed_from:
        seed_fingerprint_store(
            spark.read.parquet(args.seed_from), args.fp_store,
            text_col=args.text_col)
    run_incremental_dedup_stream(
        spark, args.input, args.fp_store, args.output, args.checkpoint,
        id_col=args.id_col, text_col=args.text_col)
    out = spark.read.parquet(args.output)
    print(json.dumps({"admitted_docs": out.count()}))


if __name__ == "__main__":
    main()
