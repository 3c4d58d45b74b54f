#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

NOT the frozen driver bench (bench.py is untouched): this file isolates
each declared query with the noop sink so the timed number is the
computation, not the collect/sink, captures `.explain("formatted")` for
plan-diff evidence (plans/r06/), and labels jobs for the UI.

Usage:
  python bench_extra.py [--sf-dir DIR] [--runs N] [--plans-tag TAG] q1 q2 ...
  python bench_extra.py --all           # every registry query in QUERIES
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from document_text_extraction_spark.queries import QUERIES
    from document_text_extraction_spark.session import get_spark
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )

    args = [a for a in sys.argv[1:]]
    runs = 2
    sf_dir = SF_DIR
    tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--sf-dir":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans-tag":
            tag = args[i + 1]; i += 2
        elif a == "--all":
            names = "ALL"; i += 1
        else:
            names.append(a); i += 1

    spark = get_spark("dte-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    ensure_package_shipped(spark)
    spark.range(1000).count()

    if names == "ALL":
        names = list(QUERIES)
    out: dict[str, float] = {}
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        if tag:
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        times = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"r06 bench: {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
            df = fn(spark, sf_dir)  # fresh plan per run (some queries stage state)
        out[name] = round(best, 3)
        print(json.dumps({"query": name, "best": out[name],
                          "runs": times}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
