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
