"""Bucketed band-store layout for streaming near-dup dedup (VERDICT
r4 #3): the store never shuffles — per-batch candidate joins either
broadcast the (small) arrival side, or SMJ against the store scan read
pre-partitioned on its bucket key."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.streaming.neardup import (
    band_rows_df,
    minhash_sig_df,
    run_neardup_dedup_stream,
    seed_band_store,
    seed_band_store_table,
    store_candidate_rejections,
    _with_bkey,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, " ".join(f"w{(i * 31 + j) % 97}" for j in range(40)))
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_scan_carries_no_exchange(spark, docs):
    """The load-bearing plan property: with broadcast disabled (forcing
    the worst case), the candidate join reads the bucketed store with
    NO Exchange above its scan — only the arrival side shuffles."""
    seed_band_store_table(docs, "nd_store_plan_t", n_buckets=8)
    try:
        arrivals = docs.limit(10)
        bands = band_rows_df(minhash_sig_df(arrivals))
        store = (spark.table("nd_store_plan_t")
                 .select("bkey", F.col("sig").alias("sig_store")))
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = store_candidate_rejections(bands, store, 0.7)
            plan = (j._jdf.queryExecution().executedPlan().toString())
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # the store scan is read pre-partitioned...
        assert "Bucketed: true" in plan, plan
        # ...and the join subtree holds exactly ONE shuffle: the
        # arrival side moving into the store's bucket layout. (The
        # trailing distinct's aggregate exchange sits ABOVE the join
        # and hashes doc_id, not bkey.)
        lines = plan.splitlines()
        scan_i = next(i for i, l in enumerate(lines)
                      if "FileScan" in l and "nd_store_plan_t" in l)
        join_i = max(i for i, l in enumerate(lines)
                     if "Join" in l and i < scan_i)
        shuffles = [l for l in lines[join_i:scan_i + 1]
                    if "Exchange hashpartitioning" in l]
        assert len(shuffles) == 1 and "bkey" in shuffles[0], plan
    finally:
        spark.sql("DROP TABLE IF EXISTS nd_store_plan_t")


def test_bucketed_store_stream_matches_legacy_path(spark, docs):
    """Differential: the table-store stream admits exactly the same
    set as the legacy path-store stream (two availableNow runs with a
    cross-run near-dup plant each)."""
    def run(store_kind: str) -> set[int]:
        base = tempfile.mkdtemp(prefix="nd_store_diff_")
        rev = F.concat_ws(" ", F.reverse(F.split(F.col("text"), " ")))
        recap = docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text")
        fresh = docs.filter(F.col("doc_id") % 5 == 1).select(
            (F.col("doc_id") + 2000).alias("doc_id"), rev.alias("text"))
        recap.unionByName(fresh).write.mode("overwrite").parquet(
            f"{base}/in")
        if store_kind == "table":
            seed_band_store_table(docs, "nd_store_diff_t", n_buckets=4)
            kw = {"store_table": "nd_store_diff_t", "store_buckets": 4}
            bs = None
        else:
            seed_band_store(docs, f"{base}/bs")
            kw = {}
            bs = f"{base}/bs"
        run_neardup_dedup_stream(spark, f"{base}/in", bs,
                                 f"{base}/out", f"{base}/ck", **kw)
        late = docs.filter(F.col("doc_id") % 5 == 1).select(
            (F.col("doc_id") + 3000).alias("doc_id"), rev.alias("text"))
        late.write.mode("append").parquet(f"{base}/in")
        run_neardup_dedup_stream(spark, f"{base}/in", bs,
                                 f"{base}/out", f"{base}/ck", **kw)
        out = {r.doc_id for r in
               spark.read.parquet(f"{base}/out").collect()}
        spark.sql("DROP TABLE IF EXISTS nd_store_diff_t")
        shutil.rmtree(base, ignore_errors=True)
        return out

    assert run("table") == run("path")


def test_exactly_one_store_kind_required(spark, docs):
    with pytest.raises(ValueError, match="exactly one"):
        run_neardup_dedup_stream(spark, "/tmp/x", None, "/tmp/y",
                                 "/tmp/z")


def test_bkey_is_write_read_consistent(spark, docs):
    """The bucket key computed at arrival time equals the stored one
    for identical (band, bval) — same expression, same hash seed."""
    rows = band_rows_df(minhash_sig_df(docs.limit(5)))
    a = _with_bkey(rows).select("band", "bval", "bkey")
    b = _with_bkey(rows.select("band", "bval", "sig")).select(
        "band", "bval", "bkey")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))
