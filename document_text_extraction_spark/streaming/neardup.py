"""Streaming NEAR-duplicate dedup: MinHash/LSH state across micro-batches.

``stream.run_incremental_dedup_stream`` drops exact re-captures via a
fingerprint store; real crawl increments also carry near-copies
(boilerplate re-renders, timestamp edits) that only near-dup banding
catches. This module keeps the admitted corpus's MinHash state in a
BAND STORE — one row per (band, band-signature-slice) of every
admitted doc — and each micro-batch:

1. computes batch signatures (the explode+min formulation of
   ``operators.dedup.minhash_signature_df`` — one map-side-combined
   shuffle);
2. equi-joins its band rows against the store (shuffle keyed on the
   band value, never on text) and estimates Jaccard as the
   signature-agreement fraction;
3. rejects arrivals similar to an ADMITTED earlier doc, or to a
   lower-id arrival of the same batch (deterministic greedy — the
   streaming form of keep-first);
4. appends the ADMITTED arrivals' band rows as the batch's own store
   partition.

Replay safety is the ``stream.py`` contract verbatim: output and store
partitions are keyed ``<run-token>_<batch_id>`` and overwritten, and
the store read excludes the current batch's partition, so an
at-least-once replay recomputes identical survivors instead of
rejecting against itself.

Semantics note: the store holds admitted docs only, so a batch-2
arrival near-dup ONLY to a batch-1 REJECTED doc is admitted (its
content's earliest representative is already in the corpus only if
similarity happened to be transitive). For exact copies the two
formulations coincide (equality is transitive) — that is the case the
registry oracle pins; the near-pair behavior is property-tested.

Store-side scale note: each micro-batch equi-joins against the FULL
band store, which grows with the admitted corpus. The join shuffles
only (band, 4-long slice, 16-long sig) rows — never text — but at
10^12 admitted docs even that re-shuffle dominates; the production
layout buckets the store by a hash of (band, bval) (the same
``prepare_bucketed_input`` contract the resumable extractor uses), so
the per-batch join co-locates against a pre-partitioned table and
only the arrival side moves. The batch logic here is unchanged by
that layout — it is purely a storage declaration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles_col
from .stream import _dedup_run_token

NUM_HASHES = 16
BANDS = 4  # rows per band = NUM_HASHES // BANDS


def minhash_sig_df(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 3,
                   num_hashes: int = NUM_HASHES) -> DataFrame:
    """(id, sig array<long>): explode + per-seed min aggregates (the
    measured-fast formulation from operators/dedup.py)."""
    sh = F.array_distinct(shingles_col(F.col(text_col), k))
    exploded = df.select(F.col(id_col), F.explode(sh).alias("s"))
    mins = exploded.groupBy(id_col).agg(*[
        F.min(F.xxhash64("s", F.lit(h))).alias(f"h{h}")
        for h in range(num_hashes)
    ])
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"h{h}") for h in range(num_hashes)])
        .alias("sig"))


def band_rows_df(sig_df: DataFrame, id_col: str = "doc_id",
                 num_hashes: int = NUM_HASHES,
                 bands: int = BANDS) -> DataFrame:
    """(id, band, bval array<long>, sig): one row per band; the band
    VALUE is the signature slice itself (array equality joins clean in
    any engine — no second-level hash to keep in sync)."""
    rows = num_hashes // bands
    return (sig_df.select(
        F.col(id_col), F.col("sig"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.slice("sig", b * rows + 1, rows).alias("bval"))
            for b in range(bands)
        ])).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"),
                F.col("bb.bval").alias("bval"), "sig"))


def _agreement(a, b):
    """Signature-agreement fraction — divides by the ACTUAL signature
    length (``F.size``), not the module default, so callers passing a
    non-default ``num_hashes`` to ``minhash_sig_df`` get correctly
    scaled Jaccard estimates."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    ) / F.size(a).cast("double")


def seed_band_store(docs: DataFrame, band_store: str,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> None:
    """Materialize the admitted corpus's band rows as the store's seed
    partition — the streaming job's initial state."""
    rows = band_rows_df(minhash_sig_df(docs, id_col, text_col), id_col)
    (rows.withColumnRenamed(id_col, "src_id")
     .write.mode("overwrite")
     .parquet(os.path.join(band_store, "batch_id=seed0")))


def run_neardup_dedup_stream(spark: SparkSession, input_path: str,
                             band_store: str, output_path: str,
                             checkpoint_path: str,
                             threshold: float = 0.7,
                             id_col: str = "doc_id",
                             text_col: str = "text"):
    """availableNow near-dup dedup over a parquet increment directory;
    see module docstring for semantics and replay safety."""
    schema = spark.read.parquet(input_path).schema
    inc = (spark.readStream.schema(schema).format("parquet")
           .load(input_path))
    run_token = _dedup_run_token(checkpoint_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        part = f"{run_token}_{batch_id}"
        sig = minhash_sig_df(batch_df, id_col, text_col)
        bands = band_rows_df(sig, id_col)
        store = (sess.read.parquet(band_store)
                 .filter(F.col("batch_id") != part)
                 .select("band", "bval",
                         F.col("sig").alias("sig_store")))
        vs_store = (bands.join(store, ["band", "bval"])
                    .filter(_agreement(F.col("sig"),
                                       F.col("sig_store"))
                            >= threshold)
                    .select(id_col).distinct())
        l, r = bands.alias("l"), bands.alias("r")
        vs_batch = (l.join(r, (F.col("l.band") == F.col("r.band"))
                           & (F.col("l.bval") == F.col("r.bval"))
                           & (F.col(f"l.{id_col}")
                              < F.col(f"r.{id_col}")))
                    .filter(_agreement(F.col("l.sig"), F.col("r.sig"))
                            >= threshold)
                    .select(F.col(f"r.{id_col}").alias(id_col))
                    .distinct())
        rejected = vs_store.unionByName(vs_batch).distinct()
        admitted = batch_df.join(rejected, id_col, "left_anti")
        admitted.persist()
        try:
            (admitted.write.mode("overwrite")
             .parquet(os.path.join(output_path, f"batch_id={part}")))
            adm_rows = (band_rows_df(
                minhash_sig_df(admitted, id_col, text_col), id_col)
                .withColumnRenamed(id_col, "src_id"))
            (adm_rows.write.mode("overwrite")
             .parquet(os.path.join(band_store, f"batch_id={part}")))
        finally:
            admitted.unpersist()

    q = (inc.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
