#!/usr/bin/env python
"""Production entry point for corpus curation.

Cluster form:

    spark-submit --py-files dte.zip jobs/curate.py \
        --input /path/to/documents_table --output /path/to/curated

Local/sandbox form (creates its own session, ships the package):

    python jobs/curate.py --sf-dir /root/testdata/sf0.001 \
        --output /tmp/curated --planted-dups
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with (doc_id, text)")
    ap.add_argument("--sf-dir", help="testdata dir (uses documents.parquet)")
    ap.add_argument("--planted-dups", action="store_true",
                    help="add the planted exact/near duplicate pool "
                         "(demo mode — mirrors queries.q_curate_corpus)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from document_text_extraction_spark.session import get_spark
        spark = get_spark("dte-curate")
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )
    ensure_package_shipped(spark)

    if args.input:
        docs = spark.read.parquet(args.input)
    elif args.sf_dir:
        if args.planted_dups:
            from document_text_extraction_spark.queries import (
                _curation_docs,
            )
            docs = _curation_docs(spark, args.sf_dir)
        else:
            docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    else:
        ap.error("need --input or --sf-dir")

    from document_text_extraction_spark.curation import curate
    manifest = curate(spark, docs, args.output, run_id=args.run_id,
                      near_threshold=args.threshold)
    print(json.dumps({
        "run_id": manifest["run_id"],
        "docs_in": manifest["docs_in"],
        "docs_out": manifest["docs_out"],
        "stages": {k: v["out"] for k, v in manifest["stages"].items()},
    }))


if __name__ == "__main__":
    main()
