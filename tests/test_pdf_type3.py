"""Type3 user-defined fonts (PDF 1.7 §9.6.5): character mapping lives
only in /Encoding /Differences; glyph procedures must be ignored."""

from document_text_extraction_spark import corpus, oracle


def _golden(text: str) -> str:
    return "\n".join(corpus.chunk_text(text))


def test_type3_roundtrip_both_variants():
    """Variant 0 (flate, inline /Encoding) and variant 1 (raw stream,
    indirect /Encoding dict)."""
    for doc_id in (14, 174):
        text = corpus.synth_text(doc_id, 120, 240)
        rec = oracle.extract_document(corpus.make_pdf_type3(doc_id, text))
        assert rec["status"] == "ok", (doc_id, rec["reason"])
        assert rec["extracted_text"] == _golden(text), doc_id


def test_type3_substitution_is_load_bearing():
    """The stream really encodes remapped bytes: dropping the
    /Differences lookup would leave control codes, not letters."""
    text = "the intent of sparse tests"  # rich in e/t/a/o/i/n/s
    raw = corpus.make_pdf_type3(174, text)  # raw variant: inspectable
    streams = oracle.page_streams(raw)
    assert b"\x01" in streams[0]  # 'e' encoded as code 1
    rec = oracle.extract_document(raw)
    assert rec["extracted_text"] == _golden(text)
    assert "\x01" not in rec["extracted_text"]


def test_type3_glyph_procs_not_interpreted():
    """CharProcs drawing streams (m/l/f path ops, d1) contribute no
    shows even though they are stream-bearing objects."""
    text = "just a few words here"
    rec = oracle.extract_document(corpus.make_pdf_type3(14, text))
    assert rec["extracted_text"] == _golden(text)
    assert "700 700" not in rec["extracted_text"]


def test_type3_slot_in_corpus_route():
    doc_id = 334
    text = corpus.synth_text(doc_id)
    rec = oracle.extract_document(corpus.payload_for(doc_id, text))
    assert rec["status"] == "ok"
    assert rec["extracted_text"] == _golden(text)
