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


def test_rotate_inherited_from_pages_node():
    """/Rotate on the /Pages node applies to kid pages that declare
    none; a kid's direct /Rotate overrides (PDF 1.7 Table 30)."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 /Rotate 90 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",  # inherits 90
        b"<< /Length 28 >>\nstream\nBT 700 -50 Td (in) Tj ET\nendstream",
        b"<< /Type /Page /Parent 2 0 R /Rotate 0 /Contents 6 0 R >>",
        b"<< /Length 29 >>\nstream\nBT 30 700 Td (ovr) Tj ET\nendstream",
    ]
    _, spans, _, _ = oracle.extract_pdf_full(corpus._assemble_pdf(objs))
    by = {s["text"]: (s["x0"], s["y0"]) for s in spans}
    # page 0 inherits /Rotate 90: viewed = (y, W - x) = (-50, -88)
    assert by["in"] == (-50.0, -88.0)
    # page 1 overrides to 0: coordinates unchanged
    assert by["ovr"] == (30.0, 700.0)


def test_resources_inherited_from_pages_node():
    """Fonts declared in the /Pages node's /Resources apply to kid
    pages without their own (PDF 1.7 Table 30) — including /Encoding
    interpretation."""
    enc_font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding << /Differences [1 /e /t] >> >>")
    content = b"BT /F1 11 Tf 50 700 Td (g\x01\x02) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 "
        b"792] /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content),
                                                      content),
        enc_font,
    ]
    text, _, _, _ = oracle.extract_pdf_full(corpus._assemble_pdf(objs))
    assert text == "get"


def test_rotate_slot_in_corpus_route():
    doc_id = 294
    text = corpus.synth_text(doc_id)
    rec = oracle.extract_document(corpus.payload_for(doc_id, text))
    assert rec["status"] == "ok"
    assert rec["extracted_text"] == _golden(text)
