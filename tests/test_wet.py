"""WET sink/source: publish extracted text as Common-Crawl-style
conversion records, re-ingest byte-identically, crash/retry hygiene."""

from datetime import datetime, timezone

import pytest

from document_text_extraction_spark import pipeline
from document_text_extraction_spark.sinks import wet_text_df, write_wet
from document_text_extraction_spark.sources import synth_web_pages
from document_text_extraction_spark.sources.warc import make_warc, parse_wet


def _ts(i: int) -> datetime:
    return datetime(2024, 3, 1, 12, 0, i, tzinfo=timezone.utc)


@pytest.mark.parametrize("gz", [False, True])
def test_parse_wet_roundtrip(gz):
    """Local grammar check: conversion records written by make_warc
    parse back with url/ts/text intact; response records interleaved in
    the same container are not surfaced by parse_wet."""
    recs = [
        {"url": "https://a.example/1", "ts": _ts(1),
         "payload": "first text\nwith lines".encode(),
         "record_type": "conversion"},
        {"url": "https://a.example/skip", "ts": _ts(2),
         "payload": b"<html>not text</html>"},  # response record
        {"url": "https://a.example/2", "ts": _ts(3),
         "payload": "unicode é世界".encode(),
         "record_type": "conversion"},
    ]
    got = parse_wet(make_warc(recs, per_record_gzip=gz))
    assert [(g["url"], g["warc_ts"], g["text"]) for g in got] == [
        ("https://a.example/1", _ts(1), "first text\nwith lines"),
        ("https://a.example/2", _ts(3), "unicode é世界"),
    ]


def test_write_wet_roundtrip_distributed(spark, tmp_path):
    """Extraction output → write_wet → wet_text_df tiles exactly the
    ok-status rows: every (url, text) comes back identical, parse
    failures (null text) are skipped, and the manifest's record count
    reconciles with the data."""
    pages = synth_web_pages(spark, 60, partitions=4)
    extracted = pipeline.extract_df(pages, n_buckets=4)
    out = str(tmp_path / "wet")
    manifest = write_wet(extracted, out, n_files=3).collect()
    n_ok = extracted.filter("extracted_text is not null").count()
    assert sum(m["records"] for m in manifest) == n_ok
    assert all(m["path"].endswith(".warc.wet.gz") for m in manifest)
    back = {r["url"]: r["text"]
            for r in wet_text_df(spark, out).collect()}
    want = {r["url"]: r["extracted_text"]
            for r in extracted.select("url", "extracted_text").collect()
            if r["extracted_text"] is not None}
    assert back == want
    # epoch sentinel for the ts-less write keeps bytes deterministic
    ts = {r["warc_ts"] for r in wet_text_df(spark, out)
          .select("warc_ts").collect()}
    assert ts == {datetime(1970, 1, 1)}
    # no temp litter: every visible file is a completed rename
    import os
    assert not [f for f in os.listdir(out) if f.startswith("._tmp")]


def test_write_wet_preserves_timestamps_and_plain(spark, tmp_path):
    """ts_col rides into WARC-Date (second granularity); compress=False
    writes plain .warc.wet; empty partitions yield no file."""
    rows = [("https://t.example/%d" % i, "text %d" % i, _ts(i))
            for i in range(4)]
    df = spark.createDataFrame(rows, ["url", "extracted_text", "ts"])
    out = str(tmp_path / "wetp")
    manifest = write_wet(df.repartition(8), out, ts_col="ts",
                         compress=False).collect()
    assert sum(m["records"] for m in manifest) == 4
    assert all(m["path"].endswith(".warc.wet") for m in manifest)
    back = sorted((r["url"], r["warc_ts"], r["text"]) for r in
                  wet_text_df(spark, out).collect())
    assert back == [(u, t.replace(tzinfo=None), x)
                    for u, x, t in sorted(rows)]
