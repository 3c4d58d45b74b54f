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
