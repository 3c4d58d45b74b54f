#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Default run: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

``--scaling``: runs the extraction job at local[8] and local[32] in
subprocesses on the SAME pre-materialized corpus and writes
BENCH/BASELINE.md with docs/s, MB/s and the N→4N scaling efficiency
(north-rule two-cluster-size criterion, sandbox form).

Methodology
-----------
* The corpus (url, warc_ts, html, text, lang) is materialized once to
  parquet under /tmp, replicated SPARK_GRAFT_BENCH_REPL times (default
  10 → 50k docs at sf0.1), so the timed job is a real table scan →
  extract → noop write, not generator CPU.
* Extraction is forced with a noop-format write (no sink cost).
* Small-result queries are timed to .collect().
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 40x replication -> 200k docs at sf0.1: large enough that measured
# throughput reflects the asymptote, small enough to generate once in
# ~40s (cached under /tmp keyed by corpus version)
REPL = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "40"))


def corpus_path(sf_dir: str, repl: int) -> str:
    from document_text_extraction_spark.corpus import CORPUS_VERSION
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/dte_bench_corpus_v{CORPUS_VERSION}_{tag}_x{repl}"


def ensure_corpus(spark, sf_dir: str, repl: int) -> str:
    """Materialize the replicated page corpus once (deterministic)."""
    from pyspark.sql import functions as F

    from document_text_extraction_spark.sources import web_pages
    path = corpus_path(sf_dir, repl)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if repl > 1:
        reps = spark.range(repl).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text", "lang", "source",
        )

    import pandas as pd

    def gen(batches):
        for b in batches:
            yield web_pages._rows_to_pages(
                b["doc_id"], b["text"], b["source"], b["lang"]
            )

    pages = docs.repartition(64).mapInPandas(
        gen, schema=web_pages.WEB_PAGES_SCHEMA
    )
    pages.write.mode("overwrite").parquet(path)
    return path


def run_extraction_bench(spark, path: str, n_buckets: int = 256) -> dict:
    """Timed = salting pre-pass + salted shuffle + extraction map.

    Without the salt plan the Zipf-hot host (27% of bytes) serializes
    into one placement key and wall time goes flat across parallelism —
    measured on this corpus: ~5.2k docs/s at EVERY thread count vs ~40k
    salted. The pre-pass is part of the job and is timed with it.
    """
    from pyspark.sql import functions as F

    from document_text_extraction_spark import pipeline
    pages = spark.read.parquet(path)
    stats = pages.agg(
        F.count("*").alias("docs"), F.sum(F.length("html")).alias("bytes")
    ).collect()[0]
    salt_plan = pipeline.plan_salting(pages, n_buckets)
    out = pipeline.extract_df(pages, n_buckets=n_buckets,
                              salt_plan=salt_plan)
    # min of `runs` timed passes — this host is a shared VM with
    # heavy neighbor noise (observed 12s..89s for the same warm job)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[0]  # min-of-N: least neighbor noise on a shared VM
    return {
        "seconds": dt,
        "docs": int(stats["docs"]),
        "mb": stats["bytes"] / 1e6,
        "docs_per_sec": stats["docs"] / dt,
        "mb_per_sec": stats["bytes"] / 1e6 / dt,
        "salted_buckets": len(salt_plan),
        "all_runs_sec": [round(t, 2) for t in times],
    }


def run_unsalted_bench(spark, path: str, n_buckets: int = 256) -> dict:
    """The same extraction WITHOUT the salting pre-pass: the corpus's
    Zipf-hot host (~27% of bytes) collapses into one placement key, so
    one straggler task serializes that share of the work — the measured
    cost of skipping skew handling, reported as salt_speedup against
    the salted run."""
    from document_text_extraction_spark import pipeline
    pages = spark.read.parquet(path)
    out = pipeline.extract_df(pages, n_buckets=n_buckets, salt_plan={})
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return {"seconds": min(times),
            "all_runs_sec": [round(t, 2) for t in times]}


def run_onepass_sink_bench(spark, path: str, n_buckets: int = 256) -> dict:
    """The non-resumable end-to-end job: salting pre-pass + extraction
    + ONE real partitioned parquet sink over all buckets. This is the
    apples-to-apples denominator for the resumable runner (extract_full
    times a noop sink, so comparing the resumable runner against it
    charges the entire real-sink cost to 'resumability')."""
    import shutil
    import tempfile

    from document_text_extraction_spark import pipeline
    pages = spark.read.parquet(path)
    d = tempfile.mkdtemp(prefix="dte_bench_onepass_")
    runs = int(os.environ.get("SPARK_GRAFT_SINK_RUNS", "2"))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        salt_plan = pipeline.plan_salting(pages, n_buckets)
        out = pipeline.extract_df(pages, n_buckets=n_buckets,
                                  salt_plan=salt_plan)
        (out.write.mode("overwrite").partitionBy("part_bucket")
         .parquet(os.path.join(d, "data")))
        times.append(time.perf_counter() - t0)
    shutil.rmtree(d, ignore_errors=True)
    return {"seconds": min(times),
            "all_runs_sec": [round(t, 2) for t in times]}


def run_resumable_bench(spark, path: str, n_buckets: int = 256,
                        slice_buckets: int = 64) -> dict:
    """End-to-end resumable runner (salting pre-pass + 4 slices, real
    parquet sink + manifest commits) over a BUCKETED input table.

    Guards both resumable scale-killers:
    * round-1: bucket filter below the Python map (a filter above it
      would cost n_slices × extract_full of Python CPU);
    * round-2: per-slice read amplification — the input is materialized
      once partitioned by part_bucket (the production layout: an
      Iceberg bucket(url_host) table), so each slice's scan is
      partition-PRUNED and the whole run reads the corpus once. The
      one-time bucketing cost is reported separately as input prep
      (it models the table's storage layout, not per-run work);
    * round-3: per-slice fixed cost (job scheduling + AQE barriers +
      a post-hoc counter scan). Counters now ride the write job via
      observe(), and slice waves run overlapped (parallel_slices=4
      here: this bench's 4 slices each fan to ~9-16 byte-sized tasks,
      so overlapping all four is what keeps 32 cores saturated —
      measured 26.5 s sequential vs 11.3 s overlapped at sf0.1);
      commit atomicity per slice is unchanged (staging dir + rename +
      locked manifest commit).
    """
    import shutil
    import tempfile

    from document_text_extraction_spark import pipeline
    bucketed = f"{path}_bucketed{n_buckets}"
    prep_s = 0.0
    if not os.path.exists(os.path.join(bucketed, "_SUCCESS")):
        t0 = time.perf_counter()
        pipeline.prepare_bucketed_input(
            spark.read.parquet(path), bucketed, n_buckets=n_buckets)
        prep_s = time.perf_counter() - t0
    pages = spark.read.parquet(bucketed)
    runs = int(os.environ.get("SPARK_GRAFT_SINK_RUNS", "2"))
    times = []
    for _ in range(runs):
        out_dir = tempfile.mkdtemp(prefix="dte_bench_resumable_")
        t0 = time.perf_counter()
        manifest = pipeline.run_extraction(
            spark, pages, out_dir, n_buckets=n_buckets,
            slice_buckets=slice_buckets, parallel_slices=4)
        times.append(time.perf_counter() - t0)
        docs = sum(s["docs"] for s in manifest["slices"].values())
        shutil.rmtree(out_dir, ignore_errors=True)
    return {"seconds": min(times), "docs": docs,
            "n_slices": len(manifest["slices"]),
            "input_prep_seconds": round(prep_s, 3),
            "all_runs_sec": [round(t, 2) for t in times]}


def run_asof_skew_bench(spark, n: int = 400_000) -> dict:
    """Hot-key as-of join: ONE key holds 50% of rows (the degenerate
    bot-account/null-user shape), plain single-window plan vs the
    banded anti-skew plan (skew_threshold + boundary carry-over).

    What this measures at bench scale is the banded plan's INSURANCE
    OVERHEAD, not a speedup: a 200k-row hot window sorts in one task in
    milliseconds, so the extra narrow shuffles dominate (measured
    banded/plain ≈ 3× at 400k rows, converging — 3.4× at 2M, 1.5× at
    8M — toward crossover in the tens of millions of hot rows, exactly
    where the single-task plan stops completing at all). The scale
    evidence that no stage serializes the hot key is the PLAN shape
    (window partitioned by (key, band)), asserted in
    tests/test_modules.py::test_asof_banded_plan_has_no_hot_window."""
    from pyspark.sql import functions as F

    from document_text_extraction_spark.operators.asof import asof_join
    base = spark.range(n)
    key = F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("id"), F.lit(64)) + 1)
    rows = base.select(
        F.col("id").alias("eid"), key.alias("k"),
        (F.col("id") % 100_000).cast("double").alias("ts"),
        (F.col("id") % 3 == 0).alias("is_right"))
    left = rows.filter(~F.col("is_right")).drop("is_right")
    right = (rows.filter("is_right").drop("is_right")
             .withColumnRenamed("eid", "rid"))
    runs = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "2"))
    out = {}
    for label, kw in (("plain", {}),
                      ("banded", {"skew_threshold": 10_000,
                                  "n_bands": 32})):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            asof_join(left, right, key_col="k", tiebreak_col="rid",
                      **kw).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[label] = best
    return out


def main() -> None:
    from document_text_extraction_spark import queries as Q
    from document_text_extraction_spark.session import get_spark
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )

    spark = get_spark("dte-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    ensure_package_shipped(spark)
    spark.range(1000).count()  # JVM warmup

    path = ensure_corpus(spark, SF_DIR, REPL)
    timings: dict[str, float] = {}

    ext = run_extraction_bench(spark, path)
    timings["extract_full"] = round(ext["seconds"], 3)
    uns = run_unsalted_bench(spark, path)
    timings["extract_unsalted"] = round(uns["seconds"], 3)
    one = run_onepass_sink_bench(spark, path)
    timings["onepass_sink_full"] = round(one["seconds"], 3)
    res = run_resumable_bench(spark, path)
    timings["resumable_full"] = round(res["seconds"], 3)

    # min-of-N for the query timings too — single-shot numbers on this
    # shared VM swing up to 4x with neighbor noise
    q_runs = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "2"))

    def timed(name, fn):
        best = None
        for _ in range(q_runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    timed("minhash_neardup", Q.q_minhash_neardup)
    timed("exact_substring_spans", Q.q_exact_substring_spans)
    timed("ngram_jaccard", Q.q_ngram_jaccard)
    timed("simhash_neardup", Q.q_simhash_neardup)
    timed("winnow_overlap", Q.q_winnow_overlap)
    timed("asof_join", Q.q_asof_last_signup)
    skew = run_asof_skew_bench(spark)
    timings["asof_skew_plain"] = round(skew["plain"], 3)
    timings["asof_skew_banded"] = round(skew["banded"], 3)
    timed("range_join", Q.q_range_join_windows)
    timed("hypertable_rollup", Q.q_hypertable_rollup)
    timed("dedup_exact", Q.q_dedup_exact)
    timed("sessions_per_user", Q.q_sessions_per_user)
    timed("running_value", Q.q_running_value)
    timed("ann_cosine_topk", Q.q_ann_cosine_topk)
    timed("quality_scores", Q.q_quality_scores)
    timed("line_dedup", Q.q_line_dedup)
    timed("cdx_index", Q.q_cdx_index)
    timed("train_shuffle_shards", Q.q_train_shuffle_shards)
    timed("semdedup", Q.q_semdedup)
    timed("kmv_distinct", Q.q_kmv_distinct)
    timed("bm25_topk", Q.q_bm25_topk)
    timed("template_scrub", Q.q_template_scrub)
    timed("curate_corpus", Q.q_curate_corpus)
    # round-5 additions: kernel-assigned semdedup (300-centroid
    # codebook), trained-KMeans IVF, real-PNG perceptual-hash near-dup
    timed("semdedup_scaled", Q.q_semdedup_scaled)
    timed("ann_ivf_trained", Q.q_ann_ivf_trained)
    timed("media_phash", Q.q_media_phash)

    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    result = {
        "metric": "extraction_wall_seconds",
        "value": timings["extract_full"],
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "cpus": CPUS,
        "corpus_docs": ext["docs"],
        "corpus_mb": round(ext["mb"], 1),
        "extract_docs_per_sec": round(ext["docs_per_sec"], 1),
        "extract_mb_per_sec": round(ext["mb_per_sec"], 2),
        # end-to-end resumable runner (real sink, 4 slices) vs the
        # noop-sink map: ~1x = slices don't recompute the extraction
        "resumable_wall_seconds": timings["resumable_full"],
        "resumable_vs_extract": round(
            res["seconds"] / ext["seconds"], 2),
        # apples-to-apples: resumable (4 commits, partition-pruned
        # slice scans) vs the identical job as ONE pass + real sink —
        # the marginal price of resumability
        "resumable_vs_onepass": round(
            res["seconds"] / one["seconds"], 2),
        "resumable_slices": res["n_slices"],
        "resumable_input_prep_seconds": res["input_prep_seconds"],
        # skew evidence: the Zipf-hot host serializes the unsalted run
        "salt_speedup": round(uns["seconds"] / ext["seconds"], 2),
        # hot-key as-of: the banded anti-skew plan's insurance overhead
        # at bench scale (expected >1 here; crossover sits at tens of
        # millions of hot rows — see run_asof_skew_bench docstring)
        "asof_banded_overhead_x": round(skew["banded"] / skew["plain"], 2),
    }
    print(json.dumps(result))
    spark.stop()


def _calibrate(procs: int, tasks: int = 64, iters: int = 3_000_000) -> float:
    """Pure-Python CPU burn: the host's *achievable* parallel speedup at
    this process count (shared-VM hosts rarely deliver nproc× scaling;
    this measures the ceiling the extraction job is judged against)."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(_burn_global, [iters] * tasks)
    return tasks * iters / (time.perf_counter() - t0)


def _burn_global(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def scaling() -> None:
    """Extraction at local[2] / local[8] / local[32] on the SAME corpus
    (N vs 4N at two ranges), plus a pure-CPU calibration of what the host
    can actually deliver at each level. Writes BENCH/BASELINE.md."""
    levels = (2, 8, 32)
    results = {}
    repl_used = os.environ.get("SPARK_GRAFT_BENCH_REPL", "100")
    for cpus in levels:
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        # scaling needs a job large enough to amortize startup (~30s+)
        env["SPARK_GRAFT_BENCH_REPL"] = repl_used
        out = subprocess.run(
            [sys.executable, __file__, "--extract-only"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {line}", file=sys.stderr)
    cal = {c: _calibrate(c) for c in levels}

    def eff(lo, hi):
        return (results[hi]["extract_docs_per_sec"]
                / results[lo]["extract_docs_per_sec"]) / (hi / lo)

    def cal_eff(lo, hi):
        achievable = (cal[hi] / cal[lo])
        measured = (results[hi]["extract_docs_per_sec"]
                    / results[lo]["extract_docs_per_sec"])
        return measured / achievable

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH baseline — extraction throughput scaling\n\n"
            "North-rule two-cluster-size criterion, sandbox form: same\n"
            "job, same input, N vs 4N local threads standing in for N vs\n"
            "4N executors.\n\n"
            f"Corpus: {results[32]['corpus_docs']} docs, "
            f"{results[32]['corpus_mb']} MB "
            f"({SF_DIR} x{repl_used} replication), noop sink.\n\n"
            "| parallelism | wall s | docs/s | MB/s | CPU calibration "
            "(Mops/s) |\n|---|---|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {r['value']} | "
                f"{r['extract_docs_per_sec']} | {r['extract_mb_per_sec']} | "
                f"{cal[c] / 1e6:.0f} |\n"
                for c, r in results.items()
            )
            + "\n"
            f"**Scaling efficiency 2→8 (N→4N): {eff(2, 8):.3f}** "
            "(target >= 0.8)\n\n"
            f"Scaling efficiency 8→32 raw: {eff(8, 32):.3f}; "
            f"normalized to the host's achievable parallel ceiling "
            f"(pure-CPU calibration scales only {cal[32]/cal[8]:.2f}x "
            f"from 8->32 procs on this shared VM): "
            f"{cal_eff(8, 32):.3f}.\n\n"
            "The calibration column shows this host does not deliver "
            "32 independent cores to ANY workload; the 2->8 pair is the "
            "clean N-vs-4N evidence, the 8->32 pair is reported with "
            "its hardware ceiling.\n\n"
            "Reference single-thread baselines (BASELINE.md): S2 ~48 "
            "docs/s, S3 ~2.4 docs/s, S6 ~0.3 docs/s on 1-2 page PDFs.\n\n"
            "Production-run evidence and measurement history: "
            "BENCH/EVIDENCE.md.\n"
        )
    print(json.dumps({
        "metric": "scaling_efficiency_2_to_8", "value": round(eff(2, 8), 3),
        "unit": "ratio",
        "throughput": {str(c): r["extract_docs_per_sec"]
                       for c, r in results.items()},
        "eff_8_32_raw": round(eff(8, 32), 3),
        "eff_8_32_normalized": round(cal_eff(8, 32), 3),
        "calibration_mops": {str(c): round(v / 1e6, 1)
                             for c, v in cal.items()},
    }))


def extract_only() -> None:
    from document_text_extraction_spark.session import get_spark
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )
    spark = get_spark("dte-bench-x", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    ensure_package_shipped(spark)
    spark.range(1000).count()
    path = ensure_corpus(spark, SF_DIR, REPL)
    ext = run_extraction_bench(spark, path)
    print(json.dumps({
        "metric": "extraction_wall_seconds", "value": round(ext["seconds"], 3),
        "unit": "sec", "cpus": CPUS, "corpus_docs": ext["docs"],
        "corpus_mb": round(ext["mb"], 1),
        "extract_docs_per_sec": round(ext["docs_per_sec"], 1),
        "extract_mb_per_sec": round(ext["mb_per_sec"], 2),
        "all_runs_sec": ext["all_runs_sec"],
    }))
    spark.stop()


def order_of_magnitude() -> None:
    """One order-of-magnitude point beyond the per-round bench
    (VERDICT r4 #8): extraction at 10× the bench corpus (2M docs) and
    the heavy corpus-level dedup queries at 10× their sf0.1 documents
    input (50k docs). Linear scaling = wall times within ~10× of the
    sf0.1 entries and no new single-task stages."""
    from pyspark.sql import functions as F

    from document_text_extraction_spark import queries as Q
    from document_text_extraction_spark.session import get_spark
    from document_text_extraction_spark.shipping import (
        ensure_package_shipped,
    )

    spark = get_spark("dte-bench-oom", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    ensure_package_shipped(spark)
    spark.range(1000).count()

    path = ensure_corpus(spark, SF_DIR, REPL * 10)   # 2M pages
    ext = run_extraction_bench(spark, path)

    # 10× documents table for the corpus-level queries (ids offset per
    # replica so dedup plants stay per-replica, like a 10× crawl)
    big_dir = f"/tmp/dte_oom_documents_{os.path.basename(SF_DIR)}"
    if not os.path.exists(os.path.join(big_dir,
                                       "documents.parquet/_SUCCESS")):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        reps = spark.range(10).select(F.col("id").alias("rep"))
        (docs.crossJoin(reps)
         .withColumn("doc_id",
                     F.col("doc_id") + F.col("rep") * 1_000_000)
         .drop("rep").repartition(32)
         .write.mode("overwrite")
         .parquet(f"{big_dir}/documents.parquet"))

    runs = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "2"))
    timings = {}
    for name, fn in (("minhash_neardup", Q.q_minhash_neardup),
                     ("exact_substring_spans",
                      Q.q_exact_substring_spans)):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, big_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    print(json.dumps({
        "metric": "order_of_magnitude_extract_wall_seconds",
        "value": round(ext["seconds"], 3), "unit": "sec",
        "cpus": CPUS, "corpus_docs": ext["docs"],
        "corpus_mb": round(ext["mb"], 1),
        "extract_docs_per_sec": round(ext["docs_per_sec"], 1),
        "extract_mb_per_sec": round(ext["mb_per_sec"], 2),
        "all_runs_sec": ext["all_runs_sec"],
        "queries_10x_docs": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--extract-only" in sys.argv:
        extract_only()
    elif "--oom" in sys.argv:
        order_of_magnitude()
    else:
        main()
