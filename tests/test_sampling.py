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
