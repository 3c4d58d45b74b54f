"""ExactSubstr dedup (Lee et al. 2022) vs a brute-force Python
reference: duplicated_spans must mark exactly the maximal runs of
tokens covered by a corpus-duplicated k-gram, and
remove_duplicated_spans must scrub exactly those tokens, returning
only the changed documents (delta contract).
"""

from hypothesis import given, settings, strategies as st

from document_text_extraction_spark.operators.dedup import (
    duplicated_spans,
    remove_duplicated_spans,
)


def py_spans(texts, k):
    """Brute-force reference: {doc_id: [(start, end)]} 1-based
    inclusive token spans of maximal duplicated runs."""
    from collections import Counter
    toks = {i: t.split(" ") for i, t in texts.items()}
    counts = Counter()
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            counts[" ".join(ts[i:i + k])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for s in range(len(ts) - k + 1):
            if counts[" ".join(ts[s:s + k])] >= 2:
                covered.update(range(s + 1, s + k + 1))
        spans = []
        for p in sorted(covered):
            if spans and p == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        if spans:
            out[i] = spans
    return out


def _got_spans(spark, texts, k):
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    rows = duplicated_spans(df, k=k).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
    return {i: sorted(v) for i, v in out.items()}


def test_exact_copy_yields_whole_doc_span(spark):
    t = " ".join(f"w{i}" for i in range(10))
    texts = {1: t, 2: t, 3: "totally different words here now ok"}
    got = _got_spans(spark, texts, k=4)
    assert got == {1: [(1, 10)], 2: [(1, 10)]}


def test_shared_passage_partial_span(spark):
    shared = " ".join(f"s{i}" for i in range(6))
    texts = {
        1: "a b c " + shared + " x y z",
        2: "p q " + shared + " r",
        3: "unrelated filler tokens only here",
    }
    got = _got_spans(spark, texts, k=6)
    # shared passage occupies tokens 4..9 in doc 1, 3..8 in doc 2
    assert got == {1: [(4, 9)], 2: [(3, 8)]}
    assert got == py_spans(texts, 6)


def test_short_docs_yield_nothing(spark):
    # both shorter than k: the sequence guard must produce an EMPTY
    # gram array (not a descending [1, 0] sequence)
    texts = {1: "a b", 2: "a b", 3: "a"}
    assert _got_spans(spark, texts, k=3) == {}


def test_adjacent_islands_merge(spark):
    # two disjoint dup passages separated by one unique token: two
    # spans; separated by zero tokens: one merged span
    p1 = " ".join(f"a{i}" for i in range(4))
    p2 = " ".join(f"b{i}" for i in range(4))
    texts = {
        1: p1 + " GAP1 " + p2,
        2: p1 + " GAP2 " + p2,
    }
    got = _got_spans(spark, texts, k=4)
    assert got == {1: [(1, 4), (6, 9)], 2: [(1, 4), (6, 9)]}
    texts2 = {1: p1 + " " + p2, 2: p1 + " " + p2}
    got2 = _got_spans(spark, texts2, k=4)
    assert got2 == {1: [(1, 8)], 2: [(1, 8)]}


def test_within_document_repeat_counts(spark):
    # the k-gram repeats WITHIN one doc: both occurrences marked, per
    # the every-occurrence rule
    p = " ".join(f"r{i}" for i in range(3))
    texts = {1: p + " mid " + p, 2: "other text entirely here"}
    got = _got_spans(spark, texts, k=3)
    assert got == {1: [(1, 3), (5, 7)]}


def test_remove_spans_delta_contract(spark):
    t = " ".join(f"w{i}" for i in range(8))
    texts = {1: t, 2: t, 3: "untouched unique document text body"}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, k=4).collect()}
    # delta: doc 3 unchanged, absent
    assert set(out) == {1, 2}
    for i in (1, 2):
        assert out[i]["dedup_text"] == ""
        assert out[i]["removed_tokens"] == 8


def test_remove_spans_partial_scrub(spark):
    shared = " ".join(f"s{i}" for i in range(5))
    texts = {1: "keep1 keep2 " + shared + " keep3",
             2: shared + " tail1 tail2 tail3"}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, k=5).collect()}
    assert out[1]["dedup_text"] == "keep1 keep2 keep3"
    assert out[1]["removed_tokens"] == 5
    assert out[2]["dedup_text"] == "tail1 tail2 tail3"
    assert out[2]["removed_tokens"] == 5


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12)
    .map(" ".join),
    min_size=2, max_size=6))
def test_spans_match_brute_force(spark, docs):
    # tiny alphabet → dense k-gram collisions within and across docs
    texts = {i: t for i, t in enumerate(docs) if t}
    if not texts:
        return
    assert _got_spans(spark, texts, k=3) == py_spans(texts, 3)
