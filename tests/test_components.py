"""Connected components over duplicate-pair graphs: min-label
propagation with pointer jumping (operators/components.py)."""

import pytest

from document_text_extraction_spark.operators import components as cc


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = cc.connected_components(df).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_chain_is_one_cluster(spark):
    """A~B, B~C (no A~C pair): all three get cluster_id = min = 1 —
    exactly what pairwise higher-id dropping gets wrong."""
    got = _clusters(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_by_pointer_jumping(spark):
    """A 24-node path needs ~log2(24) rounds with path halving; the
    default max_rounds would NOT cover a linear-propagation pass if it
    were O(d)... assert the result, not the round count."""
    pairs = [(i, i + 1) for i in range(1, 24)]
    got = _clusters(spark, pairs)
    assert set(got.values()) == {1}
    assert len(got) == 24


def test_disjoint_clusters_and_reversed_pairs(spark):
    got = _clusters(spark, [(5, 2), (9, 8), (3, 2)])
    assert got == {2: 2, 3: 2, 5: 2, 8: 8, 9: 8}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert cc.connected_components(df).count() == 0


def test_keep_cluster_representative(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 7)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    kept = cc.keep_cluster_representative(docs, pairs)
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5}


def test_representative_drop_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "a")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = (cc.keep_cluster_representative(docs, pairs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
