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


def test_bm25_matches_bruteforce(spark):
    """bm25_topk vs a pure-python BM25 on a tiny corpus (Lucene 1+ln
    idf, k1=1.2, b=0.75); ranking and floored scores must agree."""
    import math
    texts = ["spark hash join spark", "window sort hash",
             "merge scan filter", "spark window window hash spark spark"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    from document_text_extraction_spark.operators.terms import bm25_topk
    got = [(r.doc_id, r.bm25, r.n_terms_hit)
           for r in bm25_topk(docs, ["spark", "hash", "window"],
                              k=10).collect()]
    n = len(texts)
    avgdl = sum(len(t.split(" ")) for t in texts) / n
    dfs = {}
    for t in ["spark", "hash", "window"]:
        dfs[t] = sum(1 for x in texts if t in x.split(" "))
    exp = []
    for i, x in enumerate(texts):
        toks = x.split(" ")
        s, hit = 0.0, 0
        for t in ["spark", "hash", "window"]:
            tf = toks.count(t)
            if not tf:
                continue
            hit += 1
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if hit:
            exp.append((i, math.floor(s * 1e4) / 1e4, hit))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert got == exp


def test_bm25_postings_filter_pushed_down(spark):
    """Scale shape: the query-term restriction must appear as a filter
    over the exploded terms (IN-list), not a join against the corpus;
    the df table joins back broadcast."""
    docs = spark.createDataFrame(
        [(0, "spark hash"), (1, "window scan")], "doc_id long, text string")
    from document_text_extraction_spark.operators.terms import bm25_topk
    plan = (bm25_topk(docs, ["spark", "hash", "window"], k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_cooccurrence_pmi_matches_bruteforce(spark):
    """Map-only pair generation vs a positions-loop reference."""
    import math
    texts = ["a b c a b", "b c d", "a b a b a b"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    from document_text_extraction_spark.operators.terms import (
        cooccurrence_pmi,
    )
    got = [(r.w1, r.w2, r.pair_count, r.pmi)
           for r in cooccurrence_pmi(docs, window=2, k=100,
                                     min_pair_count=2).collect()]
    from collections import Counter
    pc, uc, n_tok, n_pairs = Counter(), Counter(), 0, 0
    for t in texts:
        ws = t.split(" ")
        n_tok += len(ws)
        uc.update(ws)
        for i, a in enumerate(ws):
            for d in (1, 2):
                if i + d < len(ws):
                    b = ws[i + d]
                    pc[(min(a, b), max(a, b))] += 1
                    n_pairs += 1
    exp = sorted(
        ((w1, w2, c, round(math.log((c / n_pairs)
                                    / ((uc[w1] / n_tok)
                                       * (uc[w2] / n_tok))), 6))
         for (w1, w2), c in pc.items() if c >= 2),
        key=lambda r: (-r[2], r[0], r[1]))
    assert got == exp


def test_cooccurrence_pair_generation_is_map_only(spark):
    """Scale shape: no join/exchange before the pair-count aggregate —
    the only Exchanges in the plan belong to the two groupBys and the
    final top-k, and there is no SortMergeJoin of the corpus with
    itself."""
    docs = spark.createDataFrame([(0, "a b c d e")],
                                 "doc_id long, text string")
    from document_text_extraction_spark.operators.terms import (
        cooccurrence_pmi,
    )
    plan = (cooccurrence_pmi(docs, window=2, k=5, min_pair_count=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_vocab_coverage_bruteforce(spark):
    from document_text_extraction_spark.operators.terms import (
        vocab_coverage,
    )
    texts = ["a a b c", "a b b zz", "qq ww a"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    # vocab_size=2: counts a=4, b=3, c=1, zz=1, qq=1, ww=1 -> {a, b}
    got = {r.doc_id: (r.n_tokens, r.n_oov_tokens, r.n_oov_types,
                      r.coverage_pct)
           for r in vocab_coverage(docs, vocab_size=2).collect()}
    assert got[0] == (4, 1, 1, 75)       # c is OOV
    assert got[1] == (4, 1, 1, 75)       # zz
    assert got[2] == (3, 2, 2, 33)       # qq, ww
