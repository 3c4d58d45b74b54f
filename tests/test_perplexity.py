"""CCNet-style unigram surprisal scoring + bucketing
(operators/perplexity.py)."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.operators import perplexity as P


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [(1, "g", "a a b"), (2, "g", "b c")]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))


def test_model_is_a_distribution(spark, tiny):
    m = P.unigram_model(tiny).collect()
    probs = {r.word: math.exp(r.logp) for r in m}
    assert probs == pytest.approx({"a": 0.4, "b": 0.4, "c": 0.2})
    assert sum(probs.values()) == pytest.approx(1.0)


@pytest.mark.parametrize("broadcast_model", [True, False])
def test_surprisal_hand_computed(spark, tiny, broadcast_model):
    m = P.unigram_model(tiny)
    s = {r.doc_id: (r.mean_surprisal, r.n_tokens)
         for r in P.surprisal_scores(
             tiny, m, broadcast_model=broadcast_model).collect()}
    # d1: 3 tokens all with p=0.4; d2: mean of -ln(0.4), -ln(0.2)
    assert s[1][0] == pytest.approx(-math.log(0.4))
    assert s[2][0] == pytest.approx((-math.log(0.4) - math.log(0.2)) / 2)
    assert (s[1][1], s[2][1]) == (3, 2)


def test_oov_strict_vs_floor(spark, tiny):
    m = P.unigram_model(tiny)
    probe = spark.createDataFrame(
        pd.DataFrame([(9, "g", "a zzz")],
                     columns=["doc_id", "lang", "text"]))
    strict = P.surprisal_scores(probe, m).collect()[0]
    assert strict.mean_surprisal is None  # null propagates
    floor = P.surprisal_scores(probe, m, oov_logp=-10.0).collect()[0]
    assert floor.mean_surprisal == pytest.approx(
        (-math.log(0.4) + 10.0) / 2)
    # strict-mode null lands in tail, never head
    b = P.perplexity_buckets(
        P.surprisal_scores(probe, m), 100.0, 200.0).collect()[0]
    assert b.ppl_bucket == "tail"


def test_bucket_edges(spark):
    rows = [(1, 1.0), (2, 2.0), (3, 2.5), (4, 3.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "mean_surprisal"]))
    got = {r.doc_id: r.ppl_bucket for r in
           P.perplexity_buckets(df, head_below=2.0,
                                tail_from=3.0).collect()}
    # boundaries: s == head_below -> middle, s == tail_from -> tail
    assert got == {1: "head", 2: "middle", 3: "middle", 4: "tail"}


def test_model_groups_are_independent(spark):
    rows = [(1, "en", "x x"), (2, "fr", "x y y y")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))
    m = {(r.lang, r.word): math.exp(r.logp)
         for r in P.unigram_model(df).collect()}
    assert m[("en", "x")] == pytest.approx(1.0)
    assert m[("fr", "x")] == pytest.approx(0.25)
    assert m[("fr", "y")] == pytest.approx(0.75)


# ---------------------------------------------------------------------------
# DSIR importance weighting + deterministic Gumbel resampling
# ---------------------------------------------------------------------------

def test_importance_weights_hand_computed(spark):
    # target corpus: "a a"  -> p(a)=1; raw corpus: "a b b b" -> p(a)=.25
    target = spark.createDataFrame(
        pd.DataFrame([(1, "a a")], columns=["doc_id", "text"]))
    raw = spark.createDataFrame(
        pd.DataFrame([(1, "a b b b")], columns=["doc_id", "text"]))
    tm = P.unigram_model(target, group_cols=())
    rm = P.unigram_model(raw, group_cols=())
    probe = spark.createDataFrame(
        pd.DataFrame([(9, "a"), (10, "b"), (11, "zzz")],
                     columns=["doc_id", "text"]))
    got = {r.doc_id: r.log_importance for r in P.importance_weights(
        probe, tm, rm, group_cols=(), oov_logp=-20.0).collect()}
    # a: ln(1) - ln(0.25) = ln 4 (target-like, positive)
    assert got[9] == pytest.approx(math.log(4))
    # b: floor(-20) - ln(0.75) (absent from target -> strongly negative)
    assert got[10] == pytest.approx(-20.0 - math.log(0.75))
    # zzz: both floored -> 0 (unknown everywhere is neutral)
    assert got[11] == pytest.approx(0.0)


def test_dsir_sample_deterministic_and_weight_biased(spark):
    rows = [(i, 5.0 if i < 20 else -5.0) for i in range(200)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "log_importance"]))
    a = sorted(r.doc_id for r in P.dsir_sample(df, 30).collect())
    b = sorted(r.doc_id for r in P.dsir_sample(df, 30).collect())
    assert a == b  # rerun-stable
    # weight gap of 10 nats dwarfs Gumbel noise: all 20 heavy rows in
    assert set(range(20)) <= set(a)
    # different seed reshuffles the light tail
    c = sorted(r.doc_id for r in P.dsir_sample(df, 30, seed="s2").collect())
    assert set(range(20)) <= set(c)
    assert a != c
