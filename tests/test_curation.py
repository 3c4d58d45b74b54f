"""The materializing curation runner agrees with the single-dataflow
registry query and commits an honest manifest."""

import json
import os

from pyspark.sql import functions as F

from document_text_extraction_spark.curation import curate
from document_text_extraction_spark.queries import (
    _curation_docs,
    q_curate_corpus,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_curate_matches_registry_query(spark, tmp_path):
    out = str(tmp_path / "curated")
    manifest = curate(spark, _curation_docs(spark, SF), out,
                      run_id="t1")
    # stage monotonicity + honest totals
    st = manifest["stages"]
    assert (manifest["docs_in"] >= st["gate"]["out"]
            >= st["exact_dedup"]["out"] >= st["near_dedup"]["out"]
            == manifest["docs_out"])
    # the materializing runner keeps exactly the ids the one-dataflow
    # oracle-checked query keeps
    kept_ids = {r.doc_id for r in
                spark.read.parquet(f"{out}/t1/curated").collect()}
    query_ids = {r.doc_id for r in q_curate_corpus(spark, SF).collect()}
    assert kept_ids == query_ids
    # manifest committed atomically and consistent with the data
    with open(f"{out}/manifest_t1.json") as f:
        on_disk = json.load(f)
    assert on_disk["docs_out"] == len(kept_ids)


def test_curate_scrubs_real_pii(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, ("alpha beta " * 30)
          + f" mail user{i}@leak.example.com from 10.1.2.{i}")
         for i in range(4)],
        ["doc_id", "text"])
    out = str(tmp_path / "c2")
    manifest = curate(spark, docs, out, run_id="t2")
    rows = spark.read.parquet(f"{out}/t2/curated").collect()
    assert manifest["docs_out"] == len(rows) > 0
    for r in rows:
        assert "@leak.example.com" not in r.text
        assert "<EMAIL>" in r.text and "<IP>" in r.text
        # the stored count describes the stored (post-scrub) text
        assert r.n_tokens == len(r.text.split(" "))
    # a second run under its own run_id must not clobber the first
    again = curate(spark, docs, out, run_id="t3")
    assert again["docs_out"] == manifest["docs_out"]
    assert spark.read.parquet(f"{out}/t2/curated").count() == len(rows)
    import json as _json
    with open(f"{out}/manifest_t2.json") as f:
        assert _json.load(f)["docs_out"] == manifest["docs_out"]


def test_blocklist_filter_planted(spark):
    """Exact hosts drop via anti-join, suffix rules via the filter
    expression; everything else survives untouched."""
    from document_text_extraction_spark.operators import blocklist as bl

    pages = spark.createDataFrame(
        [
            (1, "https://bad.example.org/a"),
            (2, "https://good.example.org/b"),
            (3, "https://x.ads.example.net/c"),
            (4, "http://good.example.org/d"),
        ],
        "doc_id long, url string",
    )
    kept = bl.blocklist_filter(
        pages, blocked_hosts=["bad.example.org"],
        blocked_suffixes=[".ads.example.net"])
    assert {r.doc_id for r in kept.collect()} == {2, 4}
    assert kept.columns == ["doc_id", "url"]
    # empty blocklist = identity
    assert bl.blocklist_filter(pages).count() == 4


def test_blocklist_join_is_broadcast(spark):
    """Scale shape: the host anti-join must broadcast the blocklist
    (the corpus side never shuffles)."""
    from document_text_extraction_spark.operators import blocklist as bl

    pages = spark.createDataFrame(
        [(1, "https://h.example/a")], "doc_id long, url string")
    plan = (bl.blocklist_filter(pages, blocked_hosts=["h.example"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_contamination_planted(spark):
    """A doc containing a benchmark 8-gram is flagged; shifted/partial
    overlaps below 8 contiguous words are not; decontaminate drops
    exactly the flagged ids."""
    from document_text_extraction_spark.operators import contamination as ct

    words = [f"w{i}" for i in range(20)]
    bench_text = " ".join(words[0:8])          # one exact 8-gram
    docs = spark.createDataFrame(
        [
            (1, " ".join(words)),               # contains the 8-gram
            (2, "x " + " ".join(words[0:8]) + " y"),  # also contains it
            (3, " ".join(words[1:9])),          # different 8-gram, no hit
            (4, " ".join(words[0:7]) + " zz"),  # only 7-word overlap
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)],
                                  "bench_id long, text string")
    rep = {r.doc_id: r for r in
           ct.contamination_report(docs, bench, k=8).collect()}
    assert set(rep) == {1, 2}
    assert rep[1].n_hit_ngrams == 1 and rep[1].bench_ids == [100]
    kept = {r.doc_id for r in
            ct.decontaminate(docs, bench, k=8).collect()}
    assert kept == {3, 4}


def test_contamination_probe_is_broadcast(spark):
    """Scale shape: the benchmark probe join must be a broadcast hash
    join (the corpus side never shuffles for the probe)."""
    from document_text_extraction_spark.operators import contamination as ct

    docs = spark.createDataFrame([(1, "a b c d e f g h i")],
                                 "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d e f g h")],
                                  "bench_id long, text string")
    plan = (ct.contamination_report(docs, bench, k=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_curate_cluster_dedup_collapses_chains(spark, tmp_path):
    """A near-dup CHAIN A~B~C (A and C not directly similar) keeps two
    members under the pairwise policy but exactly one representative
    under cluster_dedup=True (connected components)."""
    # sliding 60-word windows, shift 10: adjacent jaccard ≈ 0.71
    # (pairs detected — LSH is deterministic for fixed input/seeds),
    # ends jaccard ≈ 0.49 < threshold → a genuine A~B~C chain. 60
    # words also passes the Gopher min-word gate.
    w = [f"tok{i:02d}" for i in range(80)]
    a, b, c = (" ".join(w[0:60]), " ".join(w[10:70]),
               " ".join(w[20:80]))
    # the MIDDLE of the chain gets the HIGHEST id: detected pairs are
    # (1,3) and (2,3), so the pairwise policy drops only doc 3 and
    # under-deduplicates (keeps 1 AND 2, transitively similar via 3)
    docs = spark.createDataFrame(
        [(1, a), (3, b), (2, c)], ["doc_id", "text"])
    pair_m = curate(spark, docs, str(tmp_path / "p"), run_id="pw",
                    near_threshold=0.5)
    clus_m = curate(spark, docs, str(tmp_path / "c"), run_id="cl",
                    near_threshold=0.5, cluster_dedup=True)
    assert pair_m["near_dedup_policy"] == "pairwise"
    assert clus_m["near_dedup_policy"] == "cluster"
    # chain detected: (1,2) and (2,3) pairs at least; pairwise drops the
    # id_b side only, cluster keeps exactly one of {1,2,3}
    assert clus_m["docs_out"] < pair_m["docs_out"]
    kept_ids = {
        r["doc_id"] for r in
        spark.read.parquet(str(tmp_path / "c" / "cl" / "curated"))
        .select("doc_id").collect()
    }
    assert len(kept_ids & {1, 2, 3}) == 1
