"""WAT sink/source: publish link/meta metadata as Common-Crawl-style
metadata records (JSON envelope), re-ingest via from_json, roundtrip
identity with the live anchor-text arrays."""

import json
from datetime import datetime, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_text_extraction_spark.sinks import wat_links_df, write_wat
from document_text_extraction_spark.sinks.wat import _envelope
from document_text_extraction_spark.sources.warc import make_warc, parse_wat


def _ts(i: int) -> datetime:
    return datetime(2024, 3, 1, 12, 0, i, tzinfo=timezone.utc)


@pytest.mark.parametrize("gz", [False, True])
def test_parse_wat_grammar(gz):
    """metadata records parse back with url/ts/json intact; response
    records interleaved in the same container are not surfaced."""
    env = _envelope("https://a.example/1", ["/x"], ["X"], "noindex")
    recs = [
        {"url": "https://a.example/1", "ts": _ts(1),
         "payload": env.encode(), "record_type": "metadata",
         "content_type": "application/json"},
        {"url": "https://a.example/skip", "ts": _ts(2),
         "payload": b"<html>raw</html>"},  # response record
    ]
    got = parse_wat(make_warc(recs, per_record_gzip=gz))
    assert len(got) == 1
    assert got[0]["url"] == "https://a.example/1"
    assert got[0]["warc_ts"] == _ts(1)
    doc = json.loads(got[0]["json"])
    links = (doc["Envelope"]["Payload-Metadata"]
             ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"])
    assert links == [{"path": "A@/href", "url": "/x", "text": "X"}]


def _fields_df(spark):
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("fields", T.StructType([
            T.StructField("outlinks", T.ArrayType(T.StringType())),
            T.StructField("anchors", T.ArrayType(T.StringType())),
            T.StructField("meta_robots", T.StringType()),
        ])),
    ])
    rows = [
        ("https://h1.example/a",
         (["/x", "https://ads.example/z"], ["X link", "Z — ad"],
          "noindex")),
        ("https://h2.example/b", (["/y"], ["Y"], "")),
        ("https://h3.example/c", ([], [], "")),  # linkless page
    ]
    return spark.createDataFrame(rows, schema)


def test_write_wat_roundtrip_distributed(spark, tmp_path):
    src = _fields_df(spark)
    out = str(tmp_path / "wat")
    manifest = write_wat(src, out, n_files=2).collect()
    assert sum(m.records for m in manifest) == 3
    back = wat_links_df(spark, out)
    got = sorted((r.url, r.href, r.anchor) for r in back.collect())
    assert got == [
        ("https://h1.example/a", "/x", "X link"),
        ("https://h1.example/a", "https://ads.example/z", "Z — ad"),
        ("https://h2.example/b", "/y", "Y"),
    ]


def test_wat_bytes_deterministic(spark, tmp_path):
    src = _fields_df(spark).repartition(1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_wat(src, a, n_files=1, compress=False).collect()
    write_wat(src, b, n_files=1, compress=False).collect()
    fa = sorted((tmp_path / "a").glob("part-*"))
    fb = sorted((tmp_path / "b").glob("part-*"))
    assert [p.read_bytes() for p in fa] == [p.read_bytes() for p in fb]


def test_wat_envelope_meta_robots(spark, tmp_path):
    src = _fields_df(spark)
    out = str(tmp_path / "wat")
    write_wat(src, out, n_files=1, compress=False).collect()
    data = next((tmp_path / "wat").glob("part-*")).read_bytes()
    recs = parse_wat(data)
    metas = {r["url"]: json.loads(r["json"])["Envelope"]
             ["Payload-Metadata"]["HTTP-Response-Metadata"]
             ["HTML-Metadata"]["Head"]["Metas"] for r in recs}
    assert metas["https://h1.example/a"] == [
        {"name": "robots", "content": "noindex"}]
    assert metas["https://h2.example/b"] == []
