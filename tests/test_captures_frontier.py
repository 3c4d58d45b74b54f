"""Capture diffing + frontier politeness planning.

Includes the driver-style DuckDB parity runs for the two staged
registry queries (q_capture_diff / q_frontier_plan) — the registry
window is saturated this round (see queries.py staging comment), so
their oracle comparison lives here until the round-5 rotation.
"""

import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark import queries as Q
from document_text_extraction_spark.operators import captures as C
from document_text_extraction_spark.operators import frontier as FR

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# classify_captures
# ---------------------------------------------------------------------------

def _brute_classify(rows):
    """rows: (url, ts, digest) → {(url, ts, digest): change}."""
    out = {}
    by_url = {}
    for u, t, d in rows:
        by_url.setdefault(u, []).append((t, d))
    for u, hist in by_url.items():
        hist.sort()
        prev = None
        for t, d in hist:
            if prev is None:
                ch = "new"
            elif d == prev:
                ch = "unchanged"
            else:
                ch = "changed"
            out[(u, t, d)] = ch
            prev = d
    return out


def test_classify_captures_brute(spark):
    rng = random.Random(42)
    rows = []
    for u in range(30):
        ts = rng.sample(range(100), rng.randint(1, 8))
        d = None
        for t in sorted(ts):
            # drift sometimes, repeat otherwise
            if d is None or rng.random() < 0.5:
                d = f"d{rng.randint(0, 3)}"
            rows.append((f"u{u}", t, d))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts_epoch", "digest"]))
    got = {(r.url, r.ts_epoch, r.digest): r.change
           for r in C.classify_captures(df).collect()}
    assert got == _brute_classify(rows)


def test_change_summary_planted(spark):
    rows = [
        ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"),   # new, unchanged, changed
        ("b", 5, "z"),                                  # single capture
        ("c", 1, "p"), ("c", 9, "p"),                   # revisit only
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts_epoch", "digest"]))
    got = {r.url: (r.n_captures, r.n_versions, r.last_change_ts)
           for r in C.change_summary(df).collect()}
    assert got == {
        "a": (3, 2, 3),   # last CONTENT change at ts=3, not last fetch
        "b": (1, 1, 5),
        "c": (2, 1, 1),   # revisit does not advance last_change_ts
    }


# ---------------------------------------------------------------------------
# ranked_in_key / frontier_plan
# ---------------------------------------------------------------------------

def _mk_skewed(spark, n_hot=400, n_cold_keys=25):
    rng = random.Random(7)
    rows = [("hot", v) for v in rng.sample(range(10 * n_hot), n_hot)]
    for k in range(n_cold_keys):
        for v in rng.sample(range(1000), rng.randint(1, 6)):
            rows.append((f"k{k}", v))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "priority"]))


def test_ranked_banded_equals_plain(spark):
    df = _mk_skewed(spark)
    plain = {(r.host, r.priority): r.rank_in_key
             for r in FR.ranked_in_key(df, ["host"], "priority").collect()}
    banded = {(r.host, r.priority): r.rank_in_key
              for r in FR.ranked_in_key(
                  df, ["host"], "priority",
                  skew_threshold=50, n_bands=8).collect()}
    assert banded == plain
    # ranks are a permutation of 1..n per key
    hot_ranks = sorted(v for (h, _), v in banded.items() if h == "hot")
    assert hot_ranks == list(range(1, 401))


def test_ranked_banded_degenerate_range(spark):
    # all sort values of the hot key equal → census filters it out
    # (smax == smin) and it falls back to the plain window, arbitrary
    # but valid ranks
    rows = [("hot", 5)] * 100 + [("k", 1), ("k", 2)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "priority"]))
    out = FR.ranked_in_key(df, ["host"], "priority",
                           skew_threshold=10, n_bands=4).collect()
    hot = sorted(r.rank_in_key for r in out if r.host == "hot")
    assert hot == list(range(1, 101))


def test_frontier_plan_eta(spark):
    rows = [("h1", 3, 2.0), ("h1", 1, 2.0), ("h1", 2, 2.0),
            ("h2", 9, None)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["host", "priority", "crawl_delay_s"]))
    got = {(r.host, r.priority): (r.fetch_seq, r.eta_s)
           for r in FR.frontier_plan(
               df, "host", "priority", delay_col="crawl_delay_s",
               default_delay_s=1.5).collect()}
    assert got == {
        ("h1", 1): (0, 0.0), ("h1", 2): (1, 2.0), ("h1", 3): (2, 4.0),
        ("h2", 9): (0, 0.0),  # null delay → default, but seq 0 → eta 0
    }
    # default delay visible from seq>0: add a second h2 row
    df2 = spark.createDataFrame(pd.DataFrame(
        [("h2", 1, None), ("h2", 2, None)],
        columns=["host", "priority", "crawl_delay_s"]))
    got2 = {r.priority: r.eta_s for r in FR.frontier_plan(
        df2, "host", "priority", delay_col="crawl_delay_s",
        default_delay_s=1.5).collect()}
    assert got2 == {1: 0.0, 2: 1.5}


def test_frontier_no_cartesian(spark):
    df = _mk_skewed(spark)
    plan = FR.frontier_plan(df, "host", "priority",
                            skew_threshold=50, n_bands=8)
    txt = plan._jdf.queryExecution().toString()
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt


# ---------------------------------------------------------------------------
# driver-style DuckDB parity for the staged registry queries
# ---------------------------------------------------------------------------

def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("qfn,sql", [
    (Q.q_capture_diff, Q.SQL_CAPTURE_DIFF),
    (Q.q_frontier_plan, Q.SQL_FRONTIER_PLAN),
    (Q.q_domain_quota, Q.SQL_DOMAIN_QUOTA),
    (Q.q_perplexity_buckets, Q.SQL_PERPLEXITY_BUCKETS),
    (Q.q_dsir_select, Q.SQL_DSIR_SELECT),
    (Q.q_wat_roundtrip, Q.SQL_WAT_ROUNDTRIP),
    (Q.q_sitemap_entries, Q.SQL_SITEMAP_ENTRIES),
    (Q.q_host_hits, Q.SQL_HOST_HITS),
    (Q.q_registrable_domains, Q.SQL_REGISTRABLE_DOMAINS),
])
def test_staged_query_vs_oracle(spark, qfn, sql):
    df = qfn(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    res = con.execute(sql)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols)
    assert len(spark_rows) == len(ddb_rows)
    assert _rowset(spark_cols, spark_rows) == _rowset(ddb_cols, ddb_rows)
