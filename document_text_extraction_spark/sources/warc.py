"""WARC container ingestion — the wire format real Common-Crawl data
arrives in, parsed with the stdlib only.

A production pipeline has one step BEFORE the bucketed web-pages table
the north rule describes: turning crawler output (WARC/1.0 files,
ISO 28500) into table rows. This module supplies that step Spark-first:

* :func:`parse_warc` — pure-Python single-file parser (the oracle
  form): WARC record framing via ``Content-Length``, ``response``
  records only, url/timestamp from ``WARC-Target-URI``/``WARC-Date``,
  payload = bytes after the embedded HTTP response header block.
  Handles both plain WARC and the Common-Crawl layout of one gzip
  member per record (a multi-member stream — ``zlib`` is looped over
  members; ``gzip.decompress`` already consumes all members).
* :func:`warc_pages_df` — the distributed form: ``binaryFile`` scan →
  ``mapInPandas`` running the same parser per file → rows in the
  ``web_pages`` shape ``(url, warc_ts, html, text, lang)`` with
  ``text``/``lang`` null (they are extraction *outputs* upstream crawls
  don't carry). One WARC file = one task — matching how Common Crawl
  shards its corpus (~1 GB gzip files); executors need file-sized
  memory, the standard trade of binaryFile ingestion (a custom
  streaming datasource would lift it; out of scope here).
* :func:`make_warc` — deterministic WARC bytes for tests/benches (we
  own the generator, so the parser has a closed grammar — same policy
  as the PDF/DOCX corpus, SURVEY.md §7.2).

Reference analogue: the reference's folder scan (O1,
``/root/reference/batch_multi_column.py:496-509``) enumerates loose
files; a web-scale crawl enumerates WARC containers instead.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def make_warc(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize ``[{url, ts (datetime), payload (bytes),
    status?, content_type?, record_type?}]`` into WARC/1.0 bytes.

    ``per_record_gzip=True`` emits the Common-Crawl layout: each record
    its own gzip member, concatenated."""
    out = []
    for r in records:
        rtype = r.get("record_type", "response")
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        if rtype == "response":
            http = (
                b"HTTP/1.1 %d OK\r\n"
                b"Content-Type: %s\r\n"
                b"Content-Length: %d\r\n\r\n" % (
                    r.get("status", 200),
                    r.get("content_type", "text/html").encode(),
                    len(r["payload"]),
                )
            )
            block = http + r["payload"]
            ctype = b""
        else:
            # conversion (WET) and other non-response records carry
            # their media type as a WARC header, not an HTTP block
            block = r["payload"]
            ctype = b"Content-Type: %s\r\n" % r.get(
                "content_type", "text/plain").encode()
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: %s\r\n"
            b"WARC-Target-URI: %s\r\n"
            b"WARC-Date: %s\r\n" % (
                rtype.encode(), r["url"].encode(), ts.encode())
            + ctype
            + b"Content-Length: %d\r\n\r\n" % len(block)
        )
        rec = head + block + _CRLF + _CRLF
        if per_record_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)


def _split_headers(block: bytes) -> tuple[dict[str, str], int]:
    """Parse a CRLF header block → (lowercased header map, body offset)."""
    end = block.find(_CRLF + _CRLF)
    if end < 0:
        return {}, len(block)
    headers: dict[str, str] = {}
    for line in block[:end].split(_CRLF)[1:]:  # [0] is the version line
        k, _, v = line.partition(b":")
        if v:
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1"))
    return headers, end + 4


def _http_status(body: bytes) -> int:
    """Status code from the embedded HTTP response's first line
    (``HTTP/1.1 200 OK``); 0 if unparseable."""
    line_end = body.find(_CRLF)
    parts = body[: line_end if line_end >= 0 else len(body)].split()
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
        try:
            return int(parts[1])
        except ValueError:
            return 0
    return 0


def _iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk WARC framing → ``(headers, body)`` per record.

    Framing is by the record header's ``Content-Length`` (mandatory per
    ISO 28500) — payload bytes are sliced exactly, so binary content
    containing ``WARC/1.0`` cannot desync the walk. Gzip input (single-
    or multi-member) is decompressed first. Damaged framing — a partial
    file tail, or a record whose declared length overruns the buffer —
    terminates the walk without emitting the broken record and never
    raises."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # consumes ALL members
    i, n = 0, len(data)
    while i < n:
        if data.startswith(_CRLF, i):
            i += 2
            continue
        if not data.startswith(b"WARC/", i):
            break
        head_end = data.find(_CRLF + _CRLF, i)
        if head_end < 0:
            break
        headers, _ = _split_headers(data[i:head_end + 4])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if head_end + 4 + length > n:
            break  # declared length overruns the buffer: truncated tail
        yield headers, data[head_end + 4: head_end + 4 + length]
        i = head_end + 4 + length


def _warc_ts(headers: dict[str, str]) -> datetime | None:
    try:
        return datetime.strptime(
            headers.get("warc-date", ""),
            "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def parse_warc(data: bytes, ok_statuses_only: bool = True) -> list[dict]:
    """WARC bytes → ``[{url, warc_ts, html, http_status}]`` for
    ``response`` records (framing semantics: :func:`_iter_records`).

    By default only 2xx responses surface (real crawls carry
    404/redirect stub bodies in response records too; ingesting them
    would pollute dedup and quality statistics — pass
    ``ok_statuses_only=False`` to keep every response with its
    ``http_status``)."""
    out: list[dict] = []
    for headers, body in _iter_records(data):
        if headers.get("warc-type") != "response":
            continue
        status = _http_status(body)
        if ok_statuses_only and not 200 <= status < 300:
            continue
        _, body_off = _split_headers(body)
        out.append({"url": headers.get("warc-target-uri", ""),
                    "warc_ts": _warc_ts(headers),
                    "html": body[body_off:],
                    "http_status": status})
    return out


def parse_wet(data: bytes) -> list[dict]:
    """WET bytes → ``[{url, warc_ts, text}]`` for ``conversion``
    records (the Common-Crawl extracted-text sidecar format; payload is
    UTF-8 plain text, no embedded HTTP block). Same framing and
    damage tolerance as :func:`parse_warc`."""
    return [{"url": h.get("warc-target-uri", ""),
             "warc_ts": _warc_ts(h),
             "text": body.decode("utf-8", errors="replace")}
            for h, body in _iter_records(data)
            if h.get("warc-type") == "conversion"]


def parse_wat(data: bytes) -> list[dict]:
    """WAT bytes → ``[{url, warc_ts, json}]`` for ``metadata``
    records (the Common-Crawl per-record metadata sidecar; payload is
    a JSON envelope). The JSON stays a STRING here — field extraction
    is a dataset-level ``from_json`` (JVM-side, schema-pruned), not a
    per-record Python parse."""
    return [{"url": h.get("warc-target-uri", ""),
             "warc_ts": _warc_ts(h),
             "json": body.decode("utf-8", errors="replace")}
            for h, body in _iter_records(data)
            if h.get("warc-type") == "metadata"]


def warc_pages_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingestion: ``binaryFile`` scan over a
    file/glob/directory → per-file record parse → web-pages rows.

    The scan is pruned to ``(path, content)``; record splitting runs
    inside the Arrow batch (one file per row). Write the result through
    :func:`..pipeline.prepare_bucketed_input` to land the bucketed
    table the extraction job reads."""
    files = spark.read.format("binaryFile").load(path) \
        .select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for content in b["content"]:
                for r in parse_warc(bytes(content)):
                    rows.append((r["url"], r["warc_ts"], r["html"],
                                 None, None))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(gen, schema=WARC_PAGES_SCHEMA)
