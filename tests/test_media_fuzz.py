"""No-crash + determinism fuzz for the media decoders — the same gate
the charset sniffer has (test_charset_sniff): at crawl scale malformed
payloads are guaranteed, and a decode kernel may reject them
(ValueError/NotImplementedError) but must never hang, segfault-level
crash, or behave nondeterministically. Seeds are fixed, so failures
reproduce."""

import numpy as np
import pytest

from document_text_extraction_spark.multimodal import av
from document_text_extraction_spark.multimodal import jpegcodec as J
from document_text_extraction_spark.multimodal import media as M

OK_ERRORS = (ValueError, NotImplementedError)


def _blobs(seed, n, max_len=4096):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ln = int(rng.integers(0, max_len))
        out.append(rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes())
    return out


def _call_twice(fn, payload):
    """Run the decoder twice; equal outcome (same exception type+msg or
    identical array) is the determinism contract."""
    outs = []
    for _ in range(2):
        try:
            r = fn(payload)
            outs.append(("ok", r.tobytes() if hasattr(r, "tobytes")
                         else repr(r)))
        except OK_ERRORS as e:
            outs.append((type(e).__name__, str(e)))
    assert outs[0] == outs[1]
    return outs[0]


class TestJpegFuzz:
    def test_random_blobs_never_crash(self):
        for i, blob in enumerate(_blobs(1234, 150)):
            _call_twice(J.decode_jpeg, blob)
            # SOI-prefixed garbage exercises the segment walk deeper
            _call_twice(J.decode_jpeg, b"\xff\xd8" + blob)

    def test_mutated_valid_streams_never_crash(self):
        base = J.encode_jpeg(M._synth_pixels(40, 24, 7), quality=85)
        prog = J.encode_jpeg(M._synth_pixels(40, 24, 7), quality=85,
                             progressive=True, successive=True)
        rng = np.random.default_rng(99)
        for src in (base, prog):
            arr = np.frombuffer(src, dtype=np.uint8)
            for _ in range(60):
                mut = arr.copy()
                k = int(rng.integers(1, 4))
                idx = rng.integers(0, len(mut), size=k)
                mut[idx] ^= rng.integers(1, 256, size=k).astype(np.uint8)
                _call_twice(J.decode_jpeg, mut.tobytes())

    def test_truncations_never_crash(self):
        enc = J.encode_jpeg(M._synth_pixels(40, 24, 7), quality=85)
        for cut in range(0, len(enc), 97):
            _call_twice(J.decode_jpeg, enc[:cut])


class TestPngFuzz:
    def test_sig_prefixed_garbage(self):
        for blob in _blobs(55, 150):
            _call_twice(M._decode_pixels, M._PNG_SIG + blob)

    def test_mutated_valid_png(self):
        base = M._png_bytes(48, 32, 3)
        rng = np.random.default_rng(7)
        arr = np.frombuffer(base, dtype=np.uint8)
        for _ in range(80):
            mut = arr.copy()
            idx = rng.integers(8, len(mut), size=2)  # keep the sig
            mut[idx] ^= rng.integers(1, 256, size=2).astype(np.uint8)
            _call_twice(M._decode_pixels, mut.tobytes())


class TestAvFuzz:
    def test_wav_garbage_and_mutations(self):
        for blob in _blobs(11, 100):
            _call_twice(av.decode_wav, b"RIFF" + blob)
            _call_twice(av.decode_wav,
                        b"RIFF\xff\xff\x00\x00WAVE" + blob)
        base = av.encode_wav(np.arange(500, dtype=np.int16))
        rng = np.random.default_rng(3)
        arr = np.frombuffer(base, dtype=np.uint8)
        for _ in range(60):
            mut = arr.copy()
            idx = rng.integers(0, len(mut), size=2)
            mut[idx] ^= rng.integers(1, 256, size=2).astype(np.uint8)
            _call_twice(av.decode_wav, mut.tobytes())

    def test_avi_garbage_and_mutations(self):
        fn = lambda p: av.decode_video_frame(p, 0)  # noqa: E731
        for blob in _blobs(21, 100):
            _call_twice(fn, b"RIFF\xff\xff\x00\x00AVI " + blob)
        frames = [J.encode_jpeg(M._synth_pixels(16, 16, s), 90)
                  for s in (1, 2)]
        base = av.encode_avi_mjpeg(frames, fps=2, size=(16, 16))
        rng = np.random.default_rng(13)
        arr = np.frombuffer(base, dtype=np.uint8)
        for _ in range(60):
            mut = arr.copy()
            idx = rng.integers(0, len(mut), size=2)
            mut[idx] ^= rng.integers(1, 256, size=2).astype(np.uint8)
            _call_twice(fn, mut.tobytes())

    def test_mp4_metadata_total_function(self):
        """mp4_metadata is best-effort: it may return None or a tuple
        but NEVER raises on arbitrary ftyp-prefixed bytes."""
        for blob in _blobs(31, 150):
            p = b"\x00\x00\x00\x10ftypmp42mp42" + blob
            a = av.mp4_metadata(p)
            assert a == av.mp4_metadata(p)
            assert a is None or (isinstance(a, tuple) and len(a) == 3)


class TestResourceBombs:
    """Corrupt headers must not become executor OOMs: dimension caps
    reject absurd geometry instantly, and PNG inflation is bounded by
    the declared geometry (zip-bomb IDATs cannot expand past it)."""

    def test_huge_png_dims_rejected_fast(self):
        import struct
        import zlib

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
        bomb = (M._PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
                + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="decode cap"):
            M._decode_pixels(bomb)

    def test_png_zip_bomb_inflation_bounded(self):
        import struct
        import zlib

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        # 2x2 image whose IDAT would inflate to 100 MB: the capped
        # decompress stops at the declared geometry's byte budget and
        # the first rows decode normally
        idat = zlib.compress(b"\x00" * (100 * 1024 * 1024), 9)
        assert len(idat) < 200_000  # it IS a bomb
        small = (M._PNG_SIG
                 + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2,
                                              0, 0, 0))
                 + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
        dec = M._decode_pixels(small)
        assert dec.shape == (2, 2, 3)

    def test_huge_jpeg_dims_rejected_fast(self):
        import struct
        hdr = (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 17)
               + struct.pack(">BHHB", 8, 65535, 65535, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
        with pytest.raises(ValueError, match="decode cap"):
            J.decode_jpeg(hdr + b"\xff\xd9")


def test_declared_short_segments_raise_valueerror():
    """ADVICE r5: declared-consistent-but-short marker segments (SOS
    with ns=5 but a 1-byte body, tiny SOF/DRI/DHT) must fail inside
    the ValueError/NotImplementedError contract the kernels catch,
    never IndexError/struct.error."""
    import struct

    import pytest

    from document_text_extraction_spark.multimodal.jpegcodec import (
        decode_jpeg,
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    soi = b"\xff\xd8"
    cases = [
        soi + seg(0xC0, b"\x08"),                      # 1-byte SOF
        soi + seg(0xC0, b"\x08\x00\x10\x00\x10\x03"),  # nc=3, no comps
        soi + seg(0xDD, b"\x01"),                      # short DRI
        soi + seg(0xC4, b"\x00\x01"),                  # short DHT header
        # SOF ok, then SOS declaring 5 components with a 1-byte body
        soi + seg(0xC0, b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
        + seg(0xDA, b"\x05"),
        soi + seg(0xDA, b""),                          # empty SOS body
    ]
    for payload in cases:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(payload)


def test_png_corrupt_headers_raise_valueerror():
    """ADVICE r5: IHDR with a lying length and out-of-range 8-bit
    palette indices must raise ValueError, not struct.error/IndexError."""
    import struct
    import zlib

    import pytest

    from document_text_extraction_spark.multimodal.media import (
        _decode_pixels,
    )

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    # IHDR length 12 (must be 13)
    bad_ihdr = sig + chunk(b"IHDR", struct.pack(">IIBBBB", 4, 4, 8, 0, 0, 0))
    with pytest.raises(ValueError):
        _decode_pixels(bad_ihdr)

    # valid 8-bit palette image whose pixel index exceeds the palette
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
    plte = chunk(b"PLTE", bytes([10, 20, 30]))       # 1 entry
    raw = b"\x00" + bytes([0, 5])                    # index 5 >= 1
    idat = chunk(b"IDAT", zlib.compress(raw))
    bad_pal = sig + ihdr + plte + idat + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        _decode_pixels(bad_pal)


def test_avi_deep_list_nesting_raises_valueerror():
    """ADVICE r5: a crafted AVI nesting a LIST every ~12 bytes must be
    rejected by the depth cap, not blow the recursion limit."""
    import struct

    import pytest

    from document_text_extraction_spark.multimodal.av import (
        _avi_frames_and_fps,
    )

    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"x   " + inner
    payload = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    with pytest.raises(ValueError):
        _avi_frames_and_fps(payload)


def test_mp4_tiny_tkhd_no_crash():
    """ADVICE r5: a size-8 tkhd at end of payload must not IndexError
    (mp4_metadata is a total function for the feature kernel)."""
    import struct

    from document_text_extraction_spark.multimodal.av import mp4_metadata

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8
               + struct.pack(">II", 1000, 2000) + b"\x00" * 80)
    moov = box(b"moov", mvhd + box(b"trak", box(b"tkhd", b"")))
    payload = box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom") + moov
    out = mp4_metadata(payload)     # must not raise
    assert out is not None and out[0] == 2000
