"""Host-template line detection/scrubbing (operators/boilerplate.py)."""

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.operators import boilerplate as bp


def _mk(spark, rows):
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    lines = bp.doc_lines(
        df, F.split(F.col("text"), r"\|"), host_col="host")
    return lines


@pytest.fixture(scope="module")
def lines(spark):
    # host a: 4 docs, banner on 3 of 4 (75% >= 50%); unique body lines.
    # host b: 2 docs (< min_docs=3) sharing a line -> never templated.
    rows = [("a", i, ("BANNER|" if i < 3 else "") + f"body{i}|tail{i}")
            for i in range(4)]
    rows += [("b", 10 + i, "SHARED|own%d" % i) for i in range(2)]
    return _mk(spark, rows)


def test_detects_majority_line_only(spark, lines):
    tpl = bp.host_template_lines(lines, min_frac=0.5, min_docs=3).collect()
    assert {(r.host, r.line) for r in tpl} == {("a", "BANNER")}
    (row,) = tpl
    assert (row.n_docs, row.host_docs) == (3, 4)


def test_min_docs_guard(spark, lines):
    """Host b's 100%-shared line stays: 2 docs < min_docs."""
    tpl = bp.host_template_lines(lines, min_frac=0.5, min_docs=3)
    assert tpl.filter(F.col("host") == "b").count() == 0


def test_scrub_removes_only_template(spark, lines):
    tpl = bp.host_template_lines(lines, min_frac=0.5, min_docs=3)
    out = {r.doc_id: r for r in
           bp.scrub_template_lines(lines, tpl).collect()}
    assert out[0].cleaned_text == "body0\ntail0"
    assert out[0].n_template_lines == 1 and out[0].n_lines == 3
    # unbannered page of host a: untouched
    assert out[3].cleaned_text == "body3\ntail3"
    assert out[3].n_template_lines == 0
    # sub-threshold host: byte-identical passthrough
    assert out[10].cleaned_text == "SHARED\nown0"


def test_within_doc_repeat_is_one_vote(spark):
    """A line repeated inside ONE page counts one distinct doc —
    it must not reach a 50% threshold on a 3-doc host by itself."""
    rows = [("h", 0, "X|X|X|a"), ("h", 1, "b"), ("h", 2, "c")]
    lines = _mk(spark, rows)
    assert bp.host_template_lines(lines, min_frac=0.5,
                                  min_docs=3).count() == 0


def test_exact_threshold_boundary(spark):
    """n_docs == ceil(frac * host_docs) exactly: 2 of 4 at 0.5 IS
    template (>= semantics, both engines compare in double)."""
    rows = [("h", i, ("E|" if i < 2 else "") + f"u{i}") for i in range(4)]
    lines = _mk(spark, rows)
    tpl = bp.host_template_lines(lines, min_frac=0.5, min_docs=3)
    assert {r.line for r in tpl.collect()} == {"E"}


def test_scrub_join_is_not_cartesian(spark, lines):
    tpl = bp.host_template_lines(lines, min_frac=0.5, min_docs=3)
    plan = (bp.scrub_template_lines(lines, tpl)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan
