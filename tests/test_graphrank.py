"""PageRank operator semantics (operators/graphrank.py)."""

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.operators.graphrank import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_ranks_sum_to_one_with_dangling(spark):
    # b is dangling (no out-edges): its mass must redistribute, keeping
    # the distribution normalized
    got = _ranks(spark, [("a", "b"), ("c", "b")], iterations=8)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["b"] > got["a"] == got["c"]


def test_symmetric_cycle_is_uniform(spark):
    got = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "a")],
                 iterations=12)
    assert max(got.values()) - min(got.values()) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_edges_shift_mass(spark):
    df = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0)],
        "src string, dst string, w double")
    got = {r.node: r.rank
           for r in pagerank(df, iterations=6, weight="w").collect()}
    assert got["b"] > got["c"]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iterations=2).count() == 0
