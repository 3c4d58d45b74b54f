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


def test_hits_matches_numpy_power_iteration(spark):
    """5 HITS rounds on a small weighted digraph must match the dense
    numpy computation (same normalization points) to float tolerance;
    hub/authority roles separate on a bipartite-ish graph."""
    import numpy as np
    from document_text_extraction_spark.operators.graphrank import hits

    edges = [("h1", "a1", 2.0), ("h1", "a2", 1.0), ("h2", "a1", 1.0),
             ("a2", "h2", 1.0)]
    nodes = sorted({n for e in edges for n in e[:2]})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d, w in edges:
        A[idx[s], idx[d]] = w
    hub = np.ones(len(nodes))
    for _ in range(5):
        auth = A.T @ hub
        auth = auth / np.sqrt((auth ** 2).sum())
        hub = A @ auth
        hub = hub / np.sqrt((hub ** 2).sum())

    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r.node: (r.hub, r.authority)
           for r in hits(df, iterations=5, weight="w").collect()}
    for n in nodes:
        assert got[n][0] == pytest.approx(hub[idx[n]], abs=1e-9)
        assert got[n][1] == pytest.approx(auth[idx[n]], abs=1e-9)
    # role separation: h1 is the strongest hub, a1 the top authority
    assert max(got, key=lambda n: got[n][0]) == "h1"
    assert max(got, key=lambda n: got[n][1]) == "a1"
