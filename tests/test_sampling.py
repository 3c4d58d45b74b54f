"""Deterministic hash-based stratified sampling (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.functions import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, stratum string")


def test_rates_approximately_hold(spark, docs):
    kept = sampling.stratified_sample(
        docs, {"a": 1_000_000, "b": 300_000}, "stratum", "doc_id")
    by = {r.stratum: r.n for r in
          kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by["a"] == 1000          # rate 1.0 keeps everything
    assert 230 <= by["b"] <= 370    # ~30% of 1000
    assert "c" not in by            # unlisted stratum drops


def test_deterministic_across_runs(spark, docs):
    def ids():
        return {r.doc_id for r in sampling.stratified_sample(
            docs, {"b": 500_000}, "stratum", "doc_id", seed="s").collect()}
    assert ids() == ids()


def test_seed_decorrelates(spark, docs):
    a = {r.doc_id for r in sampling.stratified_sample(
        docs, {"b": 500_000}, "stratum", "doc_id", seed="x").collect()}
    b = {r.doc_id for r in sampling.stratified_sample(
        docs, {"b": 500_000}, "stratum", "doc_id", seed="y").collect()}
    assert a != b
    # both still ~50%
    assert 400 <= len(a) <= 600 and 400 <= len(b) <= 600


def test_sample_is_pure_filter(spark, docs):
    """Scale shape: no shuffle — the sampler must compile to a plain
    filter over the scan (no Exchange in the plan)."""
    plan = (sampling.stratified_sample(
        docs, {"a": 10_000}, "stratum", "doc_id")
        ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# quota_cap — per-domain cap (C4/RefinedWeb mixture guard)
# ---------------------------------------------------------------------------

def _skewed_hosts(spark):
    # one Zipf-hot host (400 rows) + many small ones; unique sort col
    rows = [("hot", i) for i in range(400)]
    for h in range(20):
        rows += [(f"k{h:02d}", 1000 + h * 100 + j) for j in range(h % 7 + 1)]
    return spark.createDataFrame(rows, "host string, doc_id long")


def _brute_cap(rows, cap):
    by = {}
    for h, i in rows:
        by.setdefault(h, []).append(i)
    return {(h, i) for h, ids in by.items() for i in sorted(ids)[:cap]}


@pytest.mark.parametrize("skew_threshold", [None, 50])
def test_quota_cap_matches_brute(spark, skew_threshold):
    df = _skewed_hosts(spark)
    rows = [(r.host, r.doc_id) for r in df.collect()]
    got = {(r.host, r.doc_id)
           for r in sampling.quota_cap(
               df, ["host"], "doc_id", cap=5,
               skew_threshold=skew_threshold, n_bands=8).collect()}
    assert got == _brute_cap(rows, 5)


def test_quota_cap_larger_than_group(spark):
    df = _skewed_hosts(spark)
    n = df.count()
    kept = sampling.quota_cap(df, ["host"], "doc_id", cap=10_000,
                              skew_threshold=50, n_bands=8)
    assert kept.count() == n


def test_ranked_max_rank_hint_contract(spark):
    """With max_rank, ranks <= max_rank are complete and identical to
    the un-hinted output; rows beyond MAY be dropped (band
    granularity) — and on a banded hot key, SOME actually are (the
    prune is observable, not vacuous)."""
    from document_text_extraction_spark.operators import frontier as FR
    df = _skewed_hosts(spark)
    full = {(r.host, r.doc_id): r.rank_in_key
            for r in FR.ranked_in_key(
                df, ["host"], "doc_id",
                skew_threshold=50, n_bands=8).collect()}
    hinted = {(r.host, r.doc_id): r.rank_in_key
              for r in FR.ranked_in_key(
                  df, ["host"], "doc_id", skew_threshold=50,
                  n_bands=8, max_rank=5).collect()}
    for k, rk in full.items():
        if rk <= 5:
            assert hinted.get(k) == rk
    for k, rk in hinted.items():
        assert full[k] == rk
    # 400 hot rows / 8 bands → bands past the first are pruned
    assert len(hinted) < len(full)


def test_temperature_rates_exact_values():
    """alpha=0.5 on hand counts: rarest keeps 1.0; others sqrt-scaled."""
    import math
    rates = sampling.temperature_rates_ppm(
        {"en": 400, "de": 100, "si": 25})
    assert rates["si"] == 1_000_000
    assert rates["de"] == math.floor(1e6 * math.sqrt(25 / 100))  # 500000
    assert rates["en"] == math.floor(1e6 * math.sqrt(25 / 400))  # 250000


def test_temperature_sample_rebalances(spark):
    """Kept shares move toward sqrt(p): the head stratum's keep RATE
    is ~sqrt(n_min/n_head), rare strata keep everything."""
    rows = [(i, "head" if i % 10 else "tail") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    kept = sampling.temperature_sample(df, "stratum", "doc_id",
                                       alpha=0.5, seed="t")
    by = {r.stratum: r.n for r in
          kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by["tail"] == 500                      # rarest keeps all
    import math
    expect_head = 4500 * math.sqrt(500 / 4500)    # ~1500
    assert abs(by["head"] - expect_head) < 0.1 * expect_head


def test_temperature_sample_deterministic(spark):
    rows = [(i, ["a", "b"][i % 2]) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")

    def ids():
        return {r.doc_id for r in sampling.temperature_sample(
            df, "stratum", "doc_id", seed="s").collect()}
    assert ids() == ids()
