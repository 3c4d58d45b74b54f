"""Context-window chunking (functions/chunking.py) and TF-IDF
distinctive terms (operators/terms.py)."""

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.functions.chunking import chunk_windows
from document_text_extraction_spark.operators.terms import tfidf_top_terms


def test_chunk_windows_cover_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    rows = {r.chunk_id: r for r in
            chunk_windows(docs, window=4, stride=3).collect()}
    # starts at 0,3,6,9
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0].text == "w0 w1 w2 w3" and rows[0].n_tokens == 4
    assert rows[1].text == "w3 w4 w5 w6"          # overlap of 1
    assert rows[3].text == "w9" and rows[3].n_tokens == 1  # tail
    # every token appears in some chunk
    seen = set(" ".join(r.text for r in rows.values()).split())
    assert seen == set(words)


def test_chunk_windows_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = chunk_windows(docs, window=64, stride=48).collect()
    assert len(rows) == 1 and rows[0].text == "a b"


def test_chunk_windows_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")],
                                 "doc_id long, text string")
    plan = (chunk_windows(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_tfidf_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pear plum"),
            (2, "pear pear plum plum plum"),
            (3, "plum kiwi kiwi"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df)
           for r in tfidf_top_terms(docs, k=2).collect()}
    # doc 1: apple tf=3 (df=1); then pear (tf=1, df=2) beats plum (df=3)
    assert got[(1, 1)] == ("apple", 3, 1)
    assert got[(1, 2)] == ("pear", 1, 2)
    # doc 3: kiwi tf=2; plum tf=1
    assert got[(3, 1)][0] == "kiwi"
    assert got[(3, 2)][0] == "plum"


def test_tfidf_df_join_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (tfidf_top_terms(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "BroadcastHashJoin" in plan
