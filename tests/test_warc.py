"""WARC container ingestion: parser roundtrips (plain + Common-Crawl
per-record gzip), framing robustness, and the distributed binaryFile →
pages → extraction path."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark import corpus, oracle, pipeline
from document_text_extraction_spark.sources import (
    make_warc,
    parse_warc,
    warc_pages_df,
)


def _ts(i: int) -> datetime:
    return datetime(2024, 3, 1, 12, 0, i, tzinfo=timezone.utc)


def _records(n: int = 6) -> list[dict]:
    recs = []
    for i in range(n):
        payload = corpus.make_html(i, corpus.synth_text(i))
        recs.append({"url": f"https://w{i}.example.org/p{i}",
                     "ts": _ts(i), "payload": payload})
    return recs


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = _records()
    data = make_warc(recs, per_record_gzip=gz)
    got = parse_warc(data)
    assert [(r["url"], r["warc_ts"]) for r in got] == \
        [(r["url"], r["ts"]) for r in recs]
    assert [r["html"] for r in got] == [r["payload"] for r in recs]


def test_warc_skips_non_response_and_binary_payloads():
    """Only response records surface; payload bytes containing the
    'WARC/1.0' magic must not desync Content-Length framing."""
    evil = b"binary WARC/1.0\r\nWARC-Type: response\r\n junk \x00\xff" * 3
    recs = [
        {"url": "meta:info", "ts": _ts(0), "payload": b"warcinfo body",
         "record_type": "warcinfo"},
        {"url": "https://a.example.org/x", "ts": _ts(1), "payload": evil},
        {"url": "https://b.example.org/y", "ts": _ts(2),
         "payload": b"<html><body><p>ok</p></body></html>"},
    ]
    got = parse_warc(make_warc(recs))
    assert [r["url"] for r in got] == [
        "https://a.example.org/x", "https://b.example.org/y"]
    assert got[0]["html"] == evil


def test_warc_status_filtering():
    """Non-2xx responses (404 pages, redirect stubs) are crawl noise:
    dropped by default, kept with their status when asked."""
    recs = [
        {"url": "https://a.example.org/ok", "ts": _ts(0),
         "payload": b"<p>ok</p>", "status": 200},
        {"url": "https://a.example.org/gone", "ts": _ts(1),
         "payload": b"<p>not found</p>", "status": 404},
        {"url": "https://a.example.org/moved", "ts": _ts(2),
         "payload": b"<p>moved</p>", "status": 301},
    ]
    data = make_warc(recs)
    assert [r["url"] for r in parse_warc(data)] == [
        "https://a.example.org/ok"]
    everything = parse_warc(data, ok_statuses_only=False)
    assert [(r["url"], r["http_status"]) for r in everything] == [
        ("https://a.example.org/ok", 200),
        ("https://a.example.org/gone", 404),
        ("https://a.example.org/moved", 301),
    ]


def test_warc_overlong_length_is_damaged_framing():
    """A record whose declared Content-Length overruns the buffer is a
    truncated tail: the broken record must NOT be emitted."""
    recs = _records(2)
    data = make_warc(recs)
    # cut into the SECOND record's payload: record 1 survives, record 2
    # (now overrunning) is dropped rather than emitted half-read
    second_start = data.index(b"WARC/1.0", 10)
    got = parse_warc(data[: second_start + 200])
    assert [r["url"] for r in got] == [recs[0]["url"]]


def test_warc_damaged_tail_never_raises():
    data = make_warc(_records(3))
    for cut in (len(data) - 7, len(data) // 2, 10, 3, 0):
        got = parse_warc(data[:cut])
        assert isinstance(got, list)  # partial tail → fewer records
    assert parse_warc(b"not a warc at all") == []


def test_warc_pages_to_extraction(spark, tmp_path):
    """binaryFile scan → record split → the SAME extraction pipeline:
    extracted text of a WARC-carried HTML page is byte-identical to the
    oracle on its payload."""
    recs = _records(8)
    (tmp_path / "a.warc").write_bytes(make_warc(recs[:4]))
    (tmp_path / "b.warc.gz").write_bytes(
        make_warc(recs[4:], per_record_gzip=True))
    pages = warc_pages_df(spark, str(tmp_path))
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 8
    out = pipeline.extract_df(pages, n_buckets=8)
    got = {r["url"]: r["extracted_text"]
           for r in out.filter(F.col("lineage.status") == "ok").collect()}
    for rec in recs:
        want = oracle.extract_document(rec["payload"])["extracted_text"]
        assert got[rec["url"]] == want
