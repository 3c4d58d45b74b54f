"""Mutation fuzz: extract_document must never raise on corrupted
real-corpus payloads — bit flips, truncations, rotations, splices —
and every failure must land in a counted reason class (EP3 error-row
protocol). Complements the hypothesis grammar fuzz in
test_properties.py with a corpus-mutation generator (seeded, so
failures reproduce)."""

import random

from document_text_extraction_spark import corpus, oracle

_REASONS = {
    "unknown_route", "unsupported_filter", "encrypted", "bad_flate",
    "bad_objstm", "bad_container", "bad_transfer", "bad_magic",
    "no_streams", "parse_error", "bad_filter_data",
    # OCR-budget split: a mutation can blank a PDF's text layer
    "raster_only", "no_text_layer",
}


def _probe(payload: bytes) -> None:
    rec = oracle.extract_document(payload)
    assert rec["status"] in ("ok", "parse_failure")
    if rec["status"] == "parse_failure":
        assert rec["reason"] in _REASONS, rec["reason"]


def test_mutated_corpus_payloads_never_crash():
    rnd = random.Random(42)
    # 0..320 covers BOTH variants of every %160 slot (type3 14/174,
    # rotate 134/294) plus the matrix/annots/noindex slots
    base = [corpus.payload_for(i, corpus.synth_text(i))
            for i in range(0, 320)]
    for _ in range(1500):
        b = bytearray(rnd.choice(base))
        op = rnd.randint(0, 3)
        if op == 0 and b:
            for _ in range(rnd.randint(1, 8)):
                b[rnd.randrange(len(b))] ^= 1 << rnd.randint(0, 7)
        elif op == 1:
            b = b[: rnd.randint(0, len(b))]
        elif op == 2 and b:
            cut = rnd.randrange(len(b))
            b = b[cut:] + b[:cut]
        else:
            b += rnd.choice(base)[: rnd.randint(0, 200)]
        _probe(bytes(b))


def test_adversarial_feature_fragments_never_crash():
    """Random splices of the newest parser features (DecodeParms,
    inline images, Do, BOMs, TJ kerns, encodings)."""
    rnd = random.Random(7)
    base = [corpus.payload_for(i, corpus.synth_text(i))
            for i in range(0, 40)]
    frags = [b"/DecodeParms", b"/DP [null", b"BI ID", b"EI", b'"',
             b"Do", b"/Fx1 0 R", b"/Predictor 12", b"\xef\xbb\xbf",
             b"\xff\xfe", b"[(a) -500 (b)] TJ", b"/Encoding 9 0 R",
             b"/uni0066"]
    for _ in range(1500):
        parts = [b"%PDF-1.4\n"] + [
            rnd.choice(frags + base[:5])[:80]
            for _ in range(rnd.randint(1, 12))]
        _probe(b" ".join(parts))


def test_literal_unescape_total_on_arbitrary_bytes():
    """_unescape_pdf_literal is total: any byte sequence (however
    malformed its escapes) produces a string, never an exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64))
    def check(raw):
        out = oracle._unescape_pdf_literal(raw)
        assert isinstance(out, str)

    check()
