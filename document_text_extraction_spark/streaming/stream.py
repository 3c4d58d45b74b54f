"""Structured-Streaming form of the extraction pipeline.

The reference is pure batch (SURVEY.md §2.9) and the per-document map is
a pure function, so the streaming form costs nothing: ``readStream`` over
the pages table → the same ``extract_df`` plan → ``foreachBatch`` writing
with the same bucket layout. ``availableNow`` gives catch-up batch runs
with streaming checkpoints — an alternative resume mechanism to the
manifest (both are exposed; the manifest works without a streaming
query). The sink writes each micro-batch into its own ``batch_id=N``
directory with overwrite mode, so a replayed micro-batch (foreachBatch
is at-least-once) rewrites its directory instead of appending
duplicates — effectively-once output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import pipeline


def extraction_stream(spark: SparkSession, input_path: str,
                      schema=None, n_buckets: int = 64,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a pages directory → streaming extraction plan."""
    if schema is None:
        schema = spark.read.parquet(input_path).schema
    reader = (
        spark.readStream.schema(schema).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.load(input_path)
    return pipeline.extract_df(pages, n_buckets=n_buckets)


def run_stream_available_now(spark: SparkSession, input_path: str,
                             output_path: str, checkpoint_path: str,
                             n_buckets: int = 64):
    """Process everything currently in ``input_path`` (micro-batched),
    then stop; restarts resume from the streaming checkpoint.

    Idempotent sink: each micro-batch owns the ``batch_id=N`` directory
    and overwrites it on replay, so foreachBatch's at-least-once
    delivery never duplicates rows (read the root path back — Spark's
    partition discovery exposes ``batch_id`` as a column)."""
    out = extraction_stream(spark, input_path, n_buckets=n_buckets)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .partitionBy("part_bucket")
         .parquet(os.path.join(output_path, f"batch_id={batch_id}")))

    q = (
        out.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def seed_fingerprint_store(docs: DataFrame, fp_store: str,
                           text_col: str = "text") -> None:
    """Initialize the streaming dedup's fingerprint store from the
    already-ingested corpus (partition ``batch_id=seed``; micro-batches
    add their own ``batch_id=<run>_<n>`` partitions). At scale this
    store is the corpus's pre-computed fingerprint column — tiny next
    to the corpus (32 hex chars per document)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import content_fingerprint_col
    (docs.select(content_fingerprint_col(F.col(text_col)).alias("__fp"))
     .dropDuplicates(["__fp"])
     .write.mode("overwrite").parquet(os.path.join(fp_store,
                                                   "batch_id=seed")))


def _dedup_run_token(checkpoint_path: str) -> str:
    """A run token scoped to the streaming checkpoint: batch ids are
    only unique WITHIN one checkpoint's lifetime (a lost/reset
    checkpoint restarts them at 0), so fingerprint/output partitions
    are keyed by ``<token>_<batch_id>``. Same checkpoint → same token →
    a replayed batch overwrites its own partition (idempotent); a NEW
    checkpoint gets a fresh token, so it can never overwrite an old
    run's partitions — reprocessed content dedups against the old
    fingerprints instead of re-admitting or clobbering them. (Local
    paths here; on a cluster keep the token next to the checkpoint on
    the same fault-tolerant store.)"""
    import uuid
    os.makedirs(checkpoint_path, exist_ok=True)
    p = os.path.join(checkpoint_path, "_dedup_run_token")
    if os.path.exists(p):
        with open(p) as f:
            return f.read().strip()
    token = uuid.uuid4().hex[:12]
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(token)
    os.replace(tmp, p)
    return token


def run_incremental_dedup_stream(spark: SparkSession, input_path: str,
                                 fp_store: str, output_path: str,
                                 checkpoint_path: str,
                                 id_col: str = "doc_id",
                                 text_col: str = "text"):
    """Streaming form of ``operators.dedup.incremental_dedup``: each
    micro-batch of the crawl increment is anti-joined against the
    fingerprint store (ingested corpus + every EARLIER micro-batch),
    keep-first-per-fingerprint within the batch, survivors written to
    ``batch_id=N``, and the survivors' fingerprints appended to the
    store as the batch's own partition.

    Effectively-once under foreachBatch's at-least-once replay: both
    the output and the fingerprint partition are keyed by
    ``<run-token>_<batch_id>`` and OVERWRITTEN, and the anti-join
    excludes the current batch's own fingerprint partition — so a
    replayed batch recomputes the same survivors instead of
    anti-joining against itself (which would silently emit zero rows).
    The run token is scoped to the checkpoint (see
    :func:`_dedup_run_token`): if the checkpoint is lost, the restarted
    stream's batch 0 cannot collide with the old run's batch 0 — old
    partitions stay intact and previously admitted content is dropped
    by the store, never re-admitted or overwritten.

    Scale shape: one hash equi-join per micro-batch between the batch
    and the store, shuffled on the fingerprint — the store side is the
    corpus's fingerprint column, never its text. First-arrival wins
    across micro-batches (streaming semantics); within a batch the
    lowest id wins (deterministic, matching the batch operator).

    The store must be seeded first (:func:`seed_fingerprint_store`).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..operators.dedup import content_fingerprint_col

    schema = spark.read.parquet(input_path).schema
    inc = (spark.readStream.schema(schema).format("parquet")
           .load(input_path))
    run_token = _dedup_run_token(checkpoint_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        part = f"{run_token}_{batch_id}"
        fp = content_fingerprint_col(F.col(text_col))
        seen = (
            sess.read.parquet(fp_store)
            .filter(F.col("batch_id") != part)
            .select("__fp").dropDuplicates(["__fp"])
        )
        fresh = (batch_df.withColumn("__fp", fp)
                 .join(seen, "__fp", "left_anti"))
        w = W.partitionBy("__fp").orderBy(F.col(id_col))
        kept = (fresh.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))
        # persist: two write actions follow, and without it the second
        # re-runs the whole lineage — including the corpus-sized
        # fingerprint-store scan and the anti-join (the heaviest I/O of
        # the batch, twice)
        kept.persist()
        try:
            # survivors first, then their fingerprints: a crash between
            # the two writes replays the batch, which overwrites both
            (kept.drop("__fp").write.mode("overwrite")
             .parquet(os.path.join(output_path, f"batch_id={part}")))
            (kept.select("__fp").write.mode("overwrite")
             .parquet(os.path.join(fp_store, f"batch_id={part}")))
        finally:
            kept.unpersist()

    q = (
        inc.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
