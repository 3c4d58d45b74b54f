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


def synth_media_row(i: int) -> tuple:
    """ONE deterministic synthetic media row for id ``i`` (images as
    header-valid PNGs, audio/video as sniffable stubs; durations use
    co-prime strides so small id ranges still spread across the full
    duration band). Pure function of ``i`` — generated executor-side
    by the registry's media queries, driver-side by tests."""
    kind = ["image", "audio", "video"][i % 3]
    if kind == "image":
        w, h = 16 + (i % 64) * 8, 16 + (i % 48) * 8
        return (i, kind, _png_bytes(w, h, i), "image/png", w, h, -1)
    if kind == "audio":
        payload = b"RIFF" + hashlib.md5(b"a:%d" % i).digest() * 32
        return (i, kind, payload, "audio/wav", -1, -1,
                1000 + (i * 797) % 60000)
    payload = (b"\x00\x00\x00\x18ftypmp42"
               + hashlib.md5(b"v:%d" % i).digest() * 64)
    return (i, kind, payload, "video/mp4", -1, -1,
            5000 + (i * 2311) % 300000)


def synth_media_rows(n: int):
    """Deterministic synthetic media rows 0..n-1."""
    return [synth_media_row(i) for i in range(n)]


def _decode_pixels(payload: bytes):  # pragma: no cover - stub
    """DEPLOYMENT HOOK: replace with PIL.Image.open / ffmpeg decode.
    Image/audio codecs are not installed in this environment."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg; not available in this container"
    )


_PNG_SIG = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
_JPEG_SIG = bytes([0xFF, 0xD8, 0xFF])


def _feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch feature extraction: real byte-level features, stubbed
    pixel decode. Numpy over the whole batch — byte histograms for every
    payload come from ONE global bincount over (row_id*256 + byte), no
    per-row Python in the entropy path (the template a real decoder
    deployment would follow)."""
    cols = [f.name for f in MEDIA_FEATURE_SCHEMA.fields]
    for b in batches:
        n = len(b)
        if n == 0:
            continue
        payloads = [bytes(p) if p is not None else b"" for p in b["payload"]]
        lens = np.array([len(p) for p in payloads], dtype=np.int64)
        # entropy: one C-level bincount PER ROW. The earlier global
        # formulation (bincount over row_id*256 + byte) was a single
        # call but materialized ~16 transient bytes of int64 per
        # payload byte — an OOM hazard once payloads are video-sized;
        # the per-row loop allocates a constant 256 longs per row and
        # each bincount is still a C pass over the payload
        counts = np.zeros((n, 256), dtype=np.int64)
        for i, p in enumerate(payloads):
            if p:
                counts[i] = np.bincount(
                    np.frombuffer(p, dtype=np.uint8), minlength=256)
        if counts.any():
            probs = counts / np.maximum(lens, 1)[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                plogp = np.where(counts > 0, probs * np.log2(probs), 0.0)
            entropy = -plogp.sum(axis=1)
        else:
            entropy = np.zeros(n)
        entropy = np.where(np.isnan(entropy), 0.0, entropy)
        # container sniff from bounded 24-byte heads (fixed tiny work)
        heads = [p[:24] for p in payloads]
        sniffed = np.full(n, "unknown", dtype=object)
        hw = np.full(n, -1, dtype=np.int64)
        hh = np.full(n, -1, dtype=np.int64)
        for i, h in enumerate(heads):
            if h[:3] == _JPEG_SIG:
                sniffed[i] = "jpeg"
            elif h[:8] == _PNG_SIG:
                sniffed[i] = "png"
                if len(h) >= 24 and h[12:16] == b"IHDR":
                    hw[i] = int.from_bytes(h[16:20], "big")
                    hh[i] = int.from_bytes(h[20:24], "big")
            elif h[:4] == b"RIFF":
                sniffed[i] = "riff"
            elif h[4:8] == b"ftyp":
                sniffed[i] = "mp4"
        status = np.where(lens == 0, "empty_payload", "ok")
        yield pd.DataFrame({
            "media_id": b["media_id"].to_numpy(),
            "kind": b["kind"].to_numpy(),
            "n_bytes": lens,
            "sniffed": sniffed,
            "byte_entropy": entropy,
            "header_width": hw,
            "header_height": hh,
            "status": status,
        }, columns=cols)


def extract_media_features(media: DataFrame,
                           partitions: int | None = None) -> DataFrame:
    """Partition by payload-size-aware key (big videos spread out, same
    salting idea as the main pipeline) → Arrow-batch feature map."""
    n = partitions or 64
    keyed = media.repartition(n, F.xxhash64("media_id"))
    return keyed.mapInPandas(_feature_batch, schema=MEDIA_FEATURE_SCHEMA)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode (documented stand-in for
    ``_decode_pixels`` — codecs absent in this container): an (h, w, 3)
    uint8 array derived from md5(payload), so the resize math downstream
    is real and testable while the codec is swapped in at deployment."""
    seed = hashlib.md5(payload or b"").digest()
    base = np.frombuffer(seed, dtype=np.uint8)
    n = max(1, width) * max(1, height) * 3
    reps = -(-n // len(base))
    tiled = np.tile(base, reps)[:n]
    # mix the byte position into the tiled digest: a bare 16-byte tile
    # makes downstream perceptual features degenerate (repeated
    # sampling offsets -> constant-gray planes and colliding aHashes);
    # the xor keeps the array a pure deterministic function of payload
    mixed = tiled ^ ((np.arange(n, dtype=np.int64) * 131) % 251
                     ).astype(np.uint8)
    return mixed.reshape(max(1, height), max(1, width), 3)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),
    T.StructField("status", T.StringType()),
])


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64,
                  partitions: int | None = None) -> DataFrame:
    """Image resize as an Arrow-batched map: header dims → decode
    (deployment hook; deterministic fake here) → vectorized
    nearest-neighbor resample → fixed-size pixel buffer per row.

    The resample is pure numpy index arithmetic over the whole image
    (no per-pixel Python); a deployment replaces ``_fake_pixels`` with
    the real decoder and keeps everything else."""
    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for b in batches:
            out = []
            for mid, payload, w, h in zip(
                b["media_id"], b["payload"], b["width"], b["height"]
            ):
                w = int(w) if w and w > 0 else 16
                h = int(h) if h and h > 0 else 16
                try:
                    px = _decode_pixels(bytes(payload or b""))
                except NotImplementedError:
                    px = _fake_pixels(bytes(payload or b""), w, h)
                # nearest-neighbor: one fancy-index gather
                ys = (np.arange(out_h) * px.shape[0]) // out_h
                xs = (np.arange(out_w) * px.shape[1]) // out_w
                resized = px[ys][:, xs]
                out.append((int(mid), out_w, out_h,
                            resized.tobytes(), "ok"))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             RESIZED_SCHEMA.fields])

    imgs = media.filter(F.col("kind") == "image")
    keyed = imgs.repartition(partitions or 64, F.xxhash64("media_id"))
    return keyed.mapInPandas(batch, schema=RESIZED_SCHEMA)


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking plan: one row per (media_id, chunk_start_ms) —
    JVM-side explode over the duration; decode happens per chunk in the
    deployment's decoder (same shape as frame_sample_plan)."""
    # duration_ms == -1 is the schema's 'n/a' sentinel: such rows have
    # nothing plannable (the old greatest() guard emitted a chunk whose
    # end preceded its start) — they are skipped, not given fake work
    return (
        media.filter((F.col("kind") == "audio")
                     & (F.col("duration_ms") > 0))
        .select(
            "media_id", "duration_ms",
            F.explode(
                F.sequence(F.lit(0),
                           F.col("duration_ms") - 1,
                           F.lit(chunk_ms))
            ).alias("chunk_start_ms"),
        )
        .withColumn(
            "chunk_end_ms",
            F.least(F.col("chunk_start_ms") + chunk_ms,
                    F.col("duration_ms")),
        )
        .drop("duration_ms")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) —
    the explode is JVM-side; actual frame decode is the stubbed hook."""
    # duration_ms <= 0 (the -1 'n/a' sentinel, or zero-length media)
    # has no frames to plan — and sequence(0, -1, step) is a runtime
    # error (> 0, matching audio_chunk_plan: a duration-0 video must
    # not emit a phantom t=0 frame)
    return (
        media.filter((F.col("kind") == "video")
                     & (F.col("duration_ms") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("ahash", T.LongType()),
    T.StructField("status", T.StringType()),
])


def _ahash_of(px: np.ndarray, side: int = 8) -> int:
    """Average hash (aHash) of an (h, w, 3) uint8 image: nearest-
    neighbor downsample to side x side, channel-mean grayscale, then
    one bit per cell (1 = above the 64-cell mean). Bit order: row-major
    from the MSB — bit (side*side - 1 - (y*side + x)). Pure numpy."""
    ys = (np.arange(side) * px.shape[0]) // side
    xs = (np.arange(side) * px.shape[1]) // side
    gray = px[ys][:, xs].astype(np.float64).mean(axis=2)
    bits = (gray > gray.mean()).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out - (1 << 64) if out >= (1 << 63) else out


def ahash_images(media: DataFrame,
                 partitions: int | None = None) -> DataFrame:
    """Perceptual hash (aHash) per image as an Arrow-batched map — the
    image-side fingerprint feeding near-dup detection, same role as
    ``dedup.fingerprint_col`` for text. Decode is the deployment hook
    (deterministic fake here, like ``resize_images``); everything
    after the decode — downsample, grayscale, threshold, bit-pack —
    is the real kernel a deployment keeps."""
    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload, w, h in zip(
                b["media_id"], b["payload"], b["width"], b["height"]
            ):
                w = int(w) if w and w > 0 else 16
                h = int(h) if h and h > 0 else 16
                try:
                    px = _decode_pixels(bytes(payload or b""))
                except NotImplementedError:
                    px = _fake_pixels(bytes(payload or b""), w, h)
                out.append((int(mid), _ahash_of(px), "ok"))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             AHASH_SCHEMA.fields])

    imgs = media.filter(F.col("kind") == "image")
    keyed = imgs.repartition(partitions or 64, F.xxhash64("media_id"))
    return keyed.mapInPandas(batch, schema=AHASH_SCHEMA)


def phash_near_duplicates(hashes: DataFrame, max_hamming: int = 3,
                          n_bands: int = 4,
                          id_col: str = "media_id",
                          hash_col: str = "ahash") -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(hash) <= max_hamming —
    the image near-dup join. Pigeonhole banding (the simhash scheme,
    ``dedup.simhash_near_duplicates``): the 64-bit hash splits into
    ``n_bands`` contiguous 16-bit bands; any pair within
    ``max_hamming <= n_bands - 1`` bit flips shares at least one
    UNCHANGED band, so a band equi-join generates every true pair and
    the exact popcount filter removes false candidates. Never an
    all-pairs join; at 10^12 images the band value is the cluster key."""
    if max_hamming > n_bands - 1:
        raise ValueError("pigeonhole guarantee needs "
                         "max_hamming <= n_bands - 1")
    width = 64 // n_bands
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col(hash_col), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
        ) for i in range(n_bands)
    ])
    b = (hashes.select(F.col(id_col), F.col(hash_col),
                       F.explode(bands).alias("b"))
         .select(id_col, hash_col, F.col("b.band").alias("band"),
                 F.col("b.val").alias("val")))
    l, r = b.alias("l"), b.alias("r")
    ham = F.bit_count(F.col(f"l.{hash_col}")
                      .bitwiseXOR(F.col(f"r.{hash_col}")))
    return (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.val") == F.col("r.val"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
