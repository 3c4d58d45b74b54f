"""Materializing corpus-curation runner (the production form).

``queries.q_curate_corpus`` expresses the same pipeline as ONE Spark
dataflow — right for the oracle cross-check, but its MinHash stage
re-derives the deduped pool inside every sub-plan. At production scale
each stage's survivors should be written once and read back, so this
module runs the stages with parquet materialization in between and
commits per-stage counters to an atomically-renamed ``manifest.json``
(same commit protocol as ``pipeline.run_extraction``).

Stages (the standard web-corpus cleaning order; each is a documented
operator elsewhere in the package):

1. **Quality gate** — Gopher rules (``textstats.gopher_flags_cols``),
   a pure filter pushed to the scan.
2. **Exact dedup** — first capture wins
   (``operators.dedup.deduplicate_keep_first``), one fingerprint window.
3. **Near-dup removal** — MinHash+LSH pairs
   (``operators.dedup.minhash_near_duplicates``); the drop set (higher
   id of each pair) is tiny and broadcast for a left-anti join.
4. **PII scrub** — ``functions.fields.pii_scrub_col`` over the actual
   text (the registry query plants synthetic PII so the oracle can
   check the scrub; production scrubs what is really there).

Reference analogue: the reference cleans per document inside its
extraction scripts (``/root/reference/batch_multi_column.py:573-592``
error protocol); corpus-level curation is the part a 100 TB pipeline
adds on top.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import fields as ff
from .functions import textstats as ts
from .operators import dedup


def _write_read(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Materialize a stage and read it back (parquet metadata makes the
    follow-up count() a footer read, not a scan)."""
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def curate(spark: SparkSession, docs: DataFrame, out_dir: str,
           run_id: str = "run1", near_threshold: float = 0.5,
           cluster_dedup: bool = False) -> dict:
    """Run the four curation stages with materialization between them.

    ``cluster_dedup=True`` switches the near-dup stage from the
    pairwise drop-higher-id policy (the oracle-checkable default) to
    transitive-safe connected-components cluster dedup — the policy a
    production run should use on corpora where near-dup CHAINS occur
    (A~B~C without A~C).

    ``docs`` needs (doc_id, text). All stage data lives under
    ``{out_dir}/{run_id}/`` (concurrent or repeated runs with distinct
    run_ids never clobber each other), the curated table lands in
    ``{out_dir}/{run_id}/curated``, and the manifest at
    ``{out_dir}/manifest_{run_id}.json`` is re-committed (atomic
    rename) after EVERY stage, so a crash leaves the completed stages'
    counters on disk — the same commit protocol as
    ``pipeline.run_extraction``. Returns the manifest dict.
    """
    base = f"{out_dir}/{run_id}"
    os.makedirs(base, exist_ok=True)
    manifest: dict = {"run_id": run_id, "near_threshold": near_threshold,
                      "near_dedup_policy": ("cluster" if cluster_dedup
                                            else "pairwise"),
                      "data_dir": base, "stages": {}}

    def commit() -> None:
        tmp = f"{out_dir}/.manifest_{run_id}.json.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, f"{out_dir}/manifest_{run_id}.json")

    docs = docs.select("doc_id", "text")
    n_in = docs.count()
    manifest["docs_in"] = n_in
    commit()

    flags = ts.gopher_flags_cols(F.col("text"))
    gated = _write_read(spark, docs.filter(flags["gopher_pass"]),
                        f"{base}/stage1_gated")
    n_gated = gated.count()
    manifest["stages"]["gate"] = {"in": n_in, "out": n_gated}
    commit()

    unique = _write_read(spark, dedup.deduplicate_keep_first(gated),
                         f"{base}/stage2_unique")
    n_unique = unique.count()
    manifest["stages"]["exact_dedup"] = {"in": n_gated, "out": n_unique}
    commit()

    pairs = dedup.minhash_near_duplicates(unique,
                                          threshold=near_threshold)
    if cluster_dedup:
        # transitive-safe cluster semantics: connected components over
        # the pair graph, one representative (min id) per cluster —
        # the production web-dedup policy (operators/components.py
        # explains why pairwise dropping is not transitive-safe)
        from .operators.components import keep_cluster_representative
        survivors = keep_cluster_representative(unique, pairs)
    else:
        # pairwise policy (drop the higher id of every pair) — the
        # oracle-checkable default, matching q_curate_corpus and its
        # DuckDB replica; on chained near-dup clusters it keeps every
        # member not directly paired with a survivor
        drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        survivors = unique.join(F.broadcast(drop), "doc_id", "left_anti")
    kept = _write_read(spark, survivors, f"{base}/stage3_kept")
    n_kept = kept.count()
    manifest["stages"]["near_dedup"] = {"in": n_unique, "out": n_kept}
    commit()

    scrubbed = ff.pii_scrub_col(F.col("text"))
    curated = kept.select(
        "doc_id",
        scrubbed.alias("text"),
        # token count of the text actually stored (post-scrub) — a
        # pre-scrub count would disagree with the column next to it
        F.size(F.split(scrubbed, " ")).cast("long").alias("n_tokens"),
    )
    curated.write.mode("overwrite").parquet(f"{base}/curated")
    manifest["stages"]["pii_scrub"] = {"in": n_kept, "out": n_kept}
    manifest["docs_out"] = n_kept
    commit()
    return manifest
