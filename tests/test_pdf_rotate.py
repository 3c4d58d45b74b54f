"""Page-level /Rotate display rotation (PDF 1.7 §14.4): reading order
must compose the rotation a viewer applies to scanned documents."""

from document_text_extraction_spark import corpus, oracle


def _golden(text: str) -> str:
    return "\n".join(corpus.chunk_text(text))


def test_rotate_roundtrip_all_angles():
    for doc_id in (134, 294, 454):  # 90 / 180 / 270
        text = corpus.synth_text(doc_id, 120, 240)
        rec = oracle.extract_document(
            corpus.make_pdf_rotated_page(doc_id, text))
        assert rec["status"] == "ok", (doc_id, rec["reason"])
        assert rec["extracted_text"] == _golden(text), doc_id


def test_rotate_is_load_bearing():
    """Without composing /Rotate the user-space coordinates are NOT the
    layout grid (an ignoring extractor would scramble the order)."""
    text = corpus.synth_text(134, 120, 240)
    raw = corpus.make_pdf_rotated_page(134, text)
    (content, _, _, _, geom) = oracle.page_contents(raw)[0]
    assert geom[0] == 90
    shows = oracle._interpret_page(content, 0)
    on_grid = [
        any(abs(s["x"] - cx) < 0.05 for cx in corpus.COL_X) for s in shows
    ]
    assert not any(on_grid)
    # and composing the rotation puts them back on the grid
    oracle._apply_page_rotation(shows, *geom)
    on_grid = [
        any(abs(s["x"] - cx) < 0.05 for cx in corpus.COL_X) for s in shows
    ]
    assert all(on_grid)


def test_rotate_zero_and_absent_are_noops():
    text = corpus.synth_text(16, 60, 120)
    plain = corpus.make_pdf(16, text)
    rec = oracle.extract_document(plain)
    assert rec["extracted_text"] == _golden(text)
    assert oracle._page_geometry(b"<< /Type /Page >>") == (0, 612.0, 792.0)
    assert oracle._page_geometry(
        b"<< /Type /Page /Rotate 360 /MediaBox [0 0 100 200] >>"
    ) == (0, 100.0, 200.0)


def test_rotate_slot_in_corpus_route():
    doc_id = 294
    text = corpus.synth_text(doc_id)
    rec = oracle.extract_document(corpus.payload_for(doc_id, text))
    assert rec["status"] == "ok"
    assert rec["extracted_text"] == _golden(text)
