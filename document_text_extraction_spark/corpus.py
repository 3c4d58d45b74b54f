"""Deterministic synthetic web-page corpus (Common-Crawl-style).

Generates the input table required by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Every byte is a pure function of ``(doc_id, text, source)`` — no wall clock,
no RNG state, no external data — so the Spark job, the pure-Python oracle and
the DuckDB oracle SQL can all regenerate / predict the same payloads.

Route mix (cf. FIXTURES.md §1): ``doc_id % 20`` → 0..13 HTML (slot 12 is
DOCX, every other one gzip-wrapped; slot 13 gzip HTML; ``%40 == 26``
UTF-16LE+BOM HTML), 14..18 PDF (even
ids FlateDecode-compressed; ``doc_id % 40 == 18`` is PDF 1.5 with
object + xref streams and ``%40 == 38`` is LZW-compressed;
``%40 == 34`` uses a Type0 font with a ToUnicode CMap;
``%40 == 35/36/37`` exercise the ASCIIHexDecode /
[ASCII85+Flate chain] / RunLengthDecode filters;
``%80 == 16/56`` Flate + PNG / TIFF /Predictor;
``%80 == 15`` WinAnsi + /Differences simple-font encoding;
``%80 == 57`` text in nested Form XObjects;
``%80 == 55`` word spacing as TJ kerns), 19 malformed
(JBIG2-declared / truncated / binary noise by ``doc_id % 3``).  The HTML route wraps the document's
main text in boilerplate (link-dense nav/header/aside/ads/footer — the
ground truth for the text-density/link-density classifier, the web-native
analogue of the reference's histogram-valley separators,
``/root/reference/grid_detector_v1.py:24-85``).  The PDF route emits a
closed PDF-1.4 subset (uncompressed streams, ``BT/Tf/Td/Tj/TJ/ET`` only,
1–3 columns) mirroring the block/column geometry the reference parses
(``/root/reference/new_approaches/final.py:44-100``).

Main-content ground truth: the document text split into 10-word lines
(``chunk_text``).  The SQL-expressible form of that transform is
``regexp_replace(text, '((?:\\S+ ){9}\\S+) ', '\\1' || chr(10), 'g')`` —
used by the driver's DuckDB cross-check.
"""

from __future__ import annotations

import datetime
import hashlib

WORDS_PER_LINE = 10

# bump when generated payload bytes change (bench corpora cache on it)
CORPUS_VERSION = 20

# ~50 hostnames with a cubic (Zipf-like) concentration: host 0 receives
# ~27% of documents, host 1 ~7%, ... — exercises the skew/salting path.
N_HOSTS = 50
HOSTS = [f"site{i:02d}.example.org" for i in range(N_HOSTS)]

EPOCH = datetime.datetime(2025, 1, 1, 0, 0, 0)

LANGS = ["en", "es", "de", "zh", "si"]

# Closed word list for standalone synthetic text (pipeline/scale tests).
_SYNTH_WORDS = (
    "the data spark table scan filter join group order window hash sort "
    "merge shuffle batch stream row column value key index page block text "
    "density link anchor span region grid column gap margin layout parse "
    "extract token fast slow small large query plan stage task core byte"
).split()


def host_for(doc_id: int) -> str:
    """Skewed host assignment: cubic inverse-CDF over 50 hosts."""
    x = (doc_id % 1000) / 1000.0
    return HOSTS[min(N_HOSTS - 1, int(N_HOSTS * x * x * x))]


def url_for(doc_id: int, source: str = "src") -> str:
    return f"https://{host_for(doc_id)}/{source}/{doc_id}"


def ts_for(doc_id: int) -> datetime.datetime:
    return EPOCH + datetime.timedelta(seconds=int(doc_id))


def route_for(doc_id: int) -> str:
    """Payload route by doc_id: 65% html (one slot gzip-encoded),
    5% docx, 25% pdf, 5% malformed."""
    m = doc_id % 20
    if m == 12:
        return "docx"
    if m < 14:
        return "html"
    if m < 19:
        return "pdf"
    return "junk"


def chunk_text(text: str, words_per_line: int = WORDS_PER_LINE) -> list[str]:
    """Split clean single-spaced text into lines of N words.

    This defines the main-content ground truth: ``'\\n'.join(chunk_text(t))``
    is the byte-identical extraction target for a page generated from ``t``.
    """
    words = text.split(" ")
    return [
        " ".join(words[i : i + words_per_line])
        for i in range(0, len(words), words_per_line)
    ]


# --------------------------------------------------------------------------
# HTML generator
# --------------------------------------------------------------------------

_NAV_ITEMS = [
    "Home", "News", "Sports", "World", "Business", "Tech",
    "Science", "Health", "Travel", "Opinion", "Video", "More",
]
_ASIDE_ITEMS = [
    "Trending now", "Most read", "Editor picks", "Related stories",
    "From the wire", "Top videos", "Newsletters", "Podcasts",
]


def make_html(doc_id: int, text: str) -> bytes:
    """One HTML page: link-dense boilerplate around the main paragraphs.

    Boilerplate blocks are short and/or link-dense; main paragraphs are
    10 plain words each — an unambiguous ground truth for the
    Readability/Boilerpipe-style classifier (SURVEY.md §7.1).
    Every 5th document renders its paragraphs as ``<li>`` list items to
    exercise the list path (reference analogue: Docling list groups,
    ``/root/reference/parse_cv_docling.py:150-160``).
    """
    import html as _h
    # escape markup characters so the chunk_text golden-text contract
    # holds for ANY input text (the extractor entity-unescapes, so the
    # roundtrip restores the original) — the HTML analogue of
    # _xml_escape (docx) and _pdf_escape (pdf). quote=False: quotes
    # need no escaping in element content
    paras = [_h.escape(p, quote=False) for p in chunk_text(text)]
    nav = "".join(
        f'<a href="/{w.lower()}">{w}</a> ' for w in _NAV_ITEMS
    )
    aside = "".join(
        f'<li><a href="/s/{i}">{w}</a></li>'
        for i, w in enumerate(_ASIDE_ITEMS)
    )
    if doc_id % 5 == 0:
        main = "<ul>" + "".join(f"\n    <li>{p}</li>" for p in paras) + "</ul>"
    else:
        main = "".join(f"\n    <p>{p}</p>" for p in paras)
    # every 16th-mod-6 doc asks crawlers not to index it — the
    # crawl-hygiene signal a pipeline must honor (robots meta tag)
    robots_meta = (
        '\n  <meta name="robots" content="noindex, nofollow">'
        if doc_id % 16 == 6 else ""
    )
    return _render_page(doc_id, main, nav, aside,
                        robots_meta).encode("utf-8")


def _render_page(doc_id: int, main: str, nav: str, aside: str,
                 extra_head: str = "") -> str:
    """The shared page shell (head/nav/header/aside/ad/main/footer) —
    one definition so charset/robots variants keep the exact block
    structure the boilerplate classifier is validated against."""
    ad = (
        '<div class="ad"><a href="https://ads.example.com/click?id=%d">'
        "Buy now! Limited offer — click here</a></div>" % (doc_id,)
    )
    return f"""<!DOCTYPE html>
<html lang="en">
<head>
  <title>Document {doc_id}</title>{extra_head}
  <style>body {{ margin: 0; }} .ad {{ color: red; }}</style>
  <script>var docId = {doc_id}; // tracking stub
    function track() {{ return docId * 2; }}</script>
</head>
<body>
  <nav>{nav}</nav>
  <header><h1>Document {doc_id}</h1></header>
  <aside><ul>{aside}</ul></aside>
  {ad}
  <main>{main}
  </main>
  <footer><a href="/about">About</a> <a href="/terms">Terms</a>
    <a href="/privacy">Privacy</a> &copy; 2025 Example Corp</footer>
</body>
</html>"""


# legacy-charset page variants: codec → (meta declaration as real
# pages write it — three syntactic forms exercised — and the
# non-ASCII quote decoration wrapped around each content line so a
# missed transcode is VISIBLE in extracted_text, not just in dropped
# boilerplate; all decorations encode in their codec and differ from
# their U+FFFD mojibake)
CHARSET_VARIANTS = {
    "shift_jis": (
        '\n  <meta http-equiv="Content-Type" '
        'content="text/html; charset=Shift_JIS">', "「", "」"),
    "euc_jp": ('\n  <meta charset=EUC-JP>', "「", "」"),
    "cp1251": ('\n  <meta charset="windows-1251">', "«", "»"),
}


def make_html_charset(doc_id: int, text: str,
                      codec: str = "shift_jis") -> bytes:
    """A legacy-charset page: same shell as :func:`make_html`, content
    lines wrapped in codec-native quote marks, ``<meta charset>``
    declared, whole page encoded with ``codec``. Golden text =
    ``open + line + close`` per chunk line — reconstructable by the
    DuckDB oracle, and NOT equal to the mojibake a missing transcode
    produces."""
    import html as _h
    meta, op, cl = CHARSET_VARIANTS[codec]
    paras = [op + _h.escape(p, quote=False) + cl for p in chunk_text(text)]
    nav = "".join(
        f'<a href="/{w.lower()}">{w}</a> ' for w in _NAV_ITEMS
    )
    aside = "".join(
        f'<li><a href="/s/{i}">{w}</a></li>'
        for i, w in enumerate(_ASIDE_ITEMS)
    )
    main = "".join(f"\n    <p>{p}</p>" for p in paras)
    # xmlcharrefreplace: shell glyphs outside the codec (the ad's em
    # dash in shift_jis) become numeric entities, exactly as a real
    # legacy-charset page serializer writes them
    return _render_page(doc_id, main, nav, aside, meta).encode(
        codec, errors="xmlcharrefreplace")


# --------------------------------------------------------------------------
# PDF generator — PDF 1.4 subset, uncompressed content streams
# --------------------------------------------------------------------------

PAGE_W, PAGE_H = 612.0, 792.0
MARGIN = 72.0
LINE_H = 14.0
FONT_SIZE = 11
TOP_Y = 720.0
COL_X = [72.0, 260.0, 448.0]       # column x-origins; gaps 188pt >> 40pt
MAX_LINES_PER_COL = 40


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def n_columns_for(doc_id: int) -> int:
    return 1 + (doc_id % 3)


def _pdf_layout(doc_id: int, text: str) -> list[list[tuple]]:
    """Column-major line placement shared by every PDF emitter:
    page → list of (x, y, line)."""
    lines = chunk_text(text)
    ncols = n_columns_for(doc_id)
    per_page = ncols * MAX_LINES_PER_COL
    pages: list[list[tuple[float, float, str]]] = []
    for p_start in range(0, len(lines), per_page):
        chunk = lines[p_start : p_start + per_page]
        placed = []
        n_per_col = (len(chunk) + ncols - 1) // ncols
        for i, ln in enumerate(chunk):
            col, row = divmod(i, n_per_col)
            placed.append((COL_X[col], TOP_Y - row * LINE_H, ln))
        pages.append(placed)
    if not pages:
        pages = [[]]
    return pages


def _pdf_content_streams(doc_id: int, text: str) -> list[bytes]:
    """Per-page content-stream bytes (shared by the 1.4 and 1.5
    assemblers). Lines laid out column-major across 1–3 columns; every
    3rd line is a TJ array with a kerning split."""
    pages = _pdf_layout(doc_id, text)

    streams = []
    for placed in pages:
        ops = [_show_op(li, x, y, ln)
               for li, (x, y, ln) in enumerate(placed)]
        streams.append("\n".join(ops).encode("latin-1"))
    return streams


def _rle_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder: literal chunks (≤128 bytes)
    plus run packing for repeats of 3+ — exercises both decode
    branches."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            for s in range(lit_start, i, 128):
                chunk = data[s : min(s + 128, i)]
                out += bytes([len(chunk) - 1]) + chunk
            out += bytes([257 - run, data[i]])
            i += run
            lit_start = i
        else:
            i += run
    for s in range(lit_start, n, 128):
        chunk = data[s : min(s + 128, n)]
        out += bytes([len(chunk) - 1]) + chunk
    out += b"\x80"
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """PDF-variant LZW encoder (MSB-first 9–12 bit codes, 256=clear,
    257=EOD, EarlyChange=1) — produces streams for the parser's
    ``oracle._lzw_decode`` and any spec-conforming reader."""
    CLEAR, EOD = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0
    bits = 9

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << bits) | code
        nbits += bits
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
            buf &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code == 4096:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            bits = 9
        else:
            table[wc] = next_code
            next_code += 1
            # EarlyChange=1 alignment: the decoder's table is one entry
            # behind the encoder's (its first code appends nothing), so
            # the encoder widens at 1<<bits exactly when the decoder's
            # early-change rule (size+1 >= 1<<bits) fires
            if next_code >= (1 << bits) and bits < 12:
                bits += 1
        w = c
    if w:
        emit(table[w])
    emit(EOD)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _encode_stream(content: bytes, filter_mode: str | None) -> tuple:
    """(stream bytes, /Filter dict fragment) for a content stream."""
    import zlib
    if filter_mode == "flate":
        return zlib.compress(content, 6), b" /Filter /FlateDecode"
    if filter_mode == "ahx":
        return (content.hex().encode("ascii") + b">",
                b" /Filter /ASCIIHexDecode")
    if filter_mode == "ahx+flate":
        # decoding order = listed order: AHx first, then Flate
        return (zlib.compress(content, 6).hex().encode("ascii") + b">",
                b" /Filter [/ASCIIHexDecode /FlateDecode]")
    if filter_mode == "a85+flate":
        import base64
        return (base64.a85encode(zlib.compress(content, 6)) + b"~>",
                b" /Filter [/ASCII85Decode /FlateDecode]")
    if filter_mode == "lzw":
        return _lzw_encode(content), b" /Filter /LZWDecode"
    if filter_mode == "rle":
        return _rle_encode(content), b" /Filter /RunLengthDecode"
    if filter_mode == "pred-png":
        cols = 59
        return (zlib.compress(_png_predict_encode(content, cols), 6),
                b" /Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 15 /Columns %d >>" % cols)
    if filter_mode == "pred-tiff":
        cols = 59
        return (zlib.compress(_tiff_predict_encode(content, cols), 6),
                b" /Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 2 /Columns %d >>" % cols)
    return content, b""


def _pad_rows(content: bytes, columns: int) -> bytes:
    """Pad to a whole number of predictor rows with spaces — harmless
    trailing whitespace in a content-stream token stream."""
    rem = len(content) % columns
    return content + b" " * (columns - rem) if rem else content


def _png_predict_encode(content: bytes, columns: int) -> bytes:
    """Apply PNG row filters (type cycling None/Sub/Up/Average/Paeth by
    row index, the /Predictor>=10 wire format of PDF 1.7 §7.4.4.4) so
    decode exercises every filter type. bpp=1 (Colors=1, 8-bit)."""
    content = _pad_rows(content, columns)
    out = bytearray()
    prev = bytes(columns)
    for base in range(0, len(content), columns):
        row = content[base: base + columns]
        ftype = (base // columns) % 5
        out.append(ftype)
        for i in range(columns):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ftype == 0:
                pr = 0
            elif ftype == 1:
                pr = a
            elif ftype == 2:
                pr = b
            elif ftype == 3:
                pr = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((row[i] - pr) & 0xFF)
        prev = row
    return bytes(out)


def _tiff_predict_encode(content: bytes, columns: int) -> bytes:
    """TIFF /Predictor 2 horizontal differencing per row (Colors=1)."""
    content = _pad_rows(content, columns)
    out = bytearray(content)
    for base in range(0, len(out), columns):
        end = min(base + columns, len(out))
        for i in range(end - 1, base, -1):
            out[i] = (out[i] - out[i - 1]) & 0xFF
    return bytes(out)



def _assemble_pdf(objs: list) -> bytes:
    """Classic-xref document assembly shared by every PDF-1.4 emitter
    (the 1.5 emitter builds an xref STREAM instead)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


def _assemble_text_pdf(streams: list, compress: bool,
                       page_extra=None, tail_objs=None,
                       font_obj: bytes | None = None) -> bytes:
    """Single-font paged assembly shared by the feature emitters:
    catalog(1), pages(2), per-page dict 3+2i / stream 4+2i, font at
    3+2n, then ``tail_objs`` in order (numbered font+1, font+2, …).
    ``page_extra(i)`` returns a fragment appended inside page i's dict;
    ``font_obj`` overrides the default Helvetica Type1 body. Emitters
    that compute object references must use this numbering."""
    import zlib
    npages = len(streams)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    font_num = 3 + 2 * npages
    for i, content in enumerate(streams):
        extra = page_extra(i) if page_extra else ""
        objs.append((
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> >>{extra} >>"
        ).encode())
        enc, filt = ((zlib.compress(content, 6), b" /Filter /FlateDecode")
                     if compress else (content, b""))
        objs.append(b"<< /Length %d%s >>\nstream\n%s\nendstream"
                    % (len(enc), filt, enc))
    objs.append(font_obj
                or b"<< /Type /Font /Subtype /Type1 /BaseFont "
                   b"/Helvetica >>")
    objs.extend(tail_objs or [])
    return _assemble_pdf(objs)


def make_pdf(doc_id: int, text: str,
             filter_mode: str | None = "auto") -> bytes:
    """A PDF-1.4 file whose text layer carries the 10-word lines.

    Lines are laid out column-major (all of column 1 top→bottom, then
    column 2, …), across 1–3 columns and as many pages as needed, so the
    correct reading order (column detection → per-column y-sort,
    ``/root/reference/new_approaches/final.py:75-104``) recovers the
    original line order.  Every 3rd line is emitted as a ``TJ`` array with
    a kerning split to exercise TJ parsing
    (``/root/reference`` never parses content streams — it delegates to
    MuPDF; our from-scratch parser is the honest Spark-side equivalent).
    ``filter_mode``: None (raw) | "flate" | "ahx" | "ahx+flate" | "rle"
    | "pred-png" | "pred-tiff" (Flate + /Predictor DecodeParms);
    "auto" = flate for even doc_ids (the historical default).
    """
    if filter_mode == "auto":
        filter_mode = "flate" if doc_id % 2 == 0 else None
    streams = _pdf_content_streams(doc_id, text)
    npages = len(streams)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode()
    )
    font_obj_num = 3 + 2 * npages
    for i, content in enumerate(streams):
        page_dict = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_obj_num} 0 R >> >> >>"
        ).encode()
        objs.append(page_dict)
        enc, filt = _encode_stream(content, filter_mode)
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(enc), filt, enc)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    return _assemble_pdf(objs)


def make_pdf_no_text(doc_id: int, raster: bool = False) -> bytes:
    """A structurally valid one-page PDF with NO text-showing operators
    — the OCR-budget shapes (VERDICT r3 #8):

    * ``raster=True``: the page draws an image XObject (``Do``) and
      nothing else — the scanned-document shape a future OCR route
      would address (classified ``raster_only``);
    * ``raster=False``: a text-capable page whose content stream is
      empty — "text layer present but empty" (``no_text_layer``).

    Used by the ``pdf_ocr_budget`` registry query and tests; NOT part
    of the standard corpus mix (payload bytes of existing slots are
    unchanged)."""
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    if raster:
        page = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents 4 0 R /Resources "
            "<< /XObject << /Im0 5 0 R >> >> >>"
        ).encode()
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (
            int(PAGE_W), int(PAGE_H))
        objs.append(page)
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
        pixels = hashlib.md5(b"scan:%d" % doc_id).digest() * 4  # 8x8 gray
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length %d "
            b">>\nstream\n%s\nendstream" % (len(pixels), pixels))
    else:
        page = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents 4 0 R /Resources "
            "<< /Font << /F1 5 0 R >> >> >>"
        ).encode()
        objs.append(page)
        objs.append(b"<< /Length 0 >>\nstream\n\nendstream")
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_pdf(objs)


# /Differences substitutions for make_pdf_winansi: frequent letters are
# shown as remapped codes, so extraction MUST interpret the encoding
# (bare glyph names and uniXXXX forms both exercised). Codes 1-7 sit
# outside every base encoding, so no representable character is
# shadowed and the roundtrip holds for all cp1252 text.
_WINANSI_SUBS = {"e": 1, "t": 2, "a": 3, "o": 4, "i": 5, "n": 6, "s": 7}
_WINANSI_DIFFS = b"[1 /e /t /a /o /uni0069 /n /uni0073]"


def make_pdf_winansi(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file whose simple Type1 font carries an /Encoding dict
    (/BaseEncoding /WinAnsiEncoding + /Differences) remapping seven
    frequent letters to codes 1-7 (outside every base encoding, so no
    representable character is shadowed) — the legacy-font layout MuPDF
    handles for the reference (``/root/reference/approach4_v1.py:21-31``;
    PDF 1.7 §9.6.6). Odd doc_ids reference the encoding dict
    indirectly; even ids inline it and Flate-compress the streams.
    Same layout/golden-text contract as :func:`make_pdf`."""
    import zlib
    pages = _pdf_layout(doc_id, text)
    compress = doc_id % 2 == 0
    indirect_enc = doc_id % 2 == 1

    def enc_line(ln: str) -> str:
        # substituted letters → their /Differences code; the rest →
        # true cp1252 bytes (kept as latin-1 chars for _pdf_escape)
        return "".join(
            chr(_WINANSI_SUBS[c]) if c in _WINANSI_SUBS
            else c.encode("cp1252", errors="replace").decode("latin-1")
            for c in ln)

    streams = []
    for placed in pages:
        ops = [_show_op(li, x, y, enc_line(ln))
               for li, (x, y, ln) in enumerate(placed)]
        streams.append("\n".join(ops).encode("latin-1"))

    npages = len(streams)
    font_num = 3 + 2 * npages
    enc_num = font_num + 1
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    for i, content in enumerate(streams):
        objs.append((
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode())
        enc, filt = ((zlib.compress(content, 6), b" /Filter /FlateDecode")
                     if compress else (content, b""))
        objs.append(b"<< /Length %d%s >>\nstream\n%s\nendstream"
                    % (len(enc), filt, enc))
    enc_dict = (b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
                b"/Differences " + _WINANSI_DIFFS + b" >>")
    enc_entry = (b"%d 0 R" % enc_num) if indirect_enc else enc_dict
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding " + enc_entry + b" >>")
    if indirect_enc:
        objs.append(enc_dict)

    return _assemble_pdf(objs)


def make_pdf_rotated_page(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file whose pages carry a /Rotate display rotation
    (PDF 1.7 §14.4) — the scanned-document shape: a portrait MediaBox
    with sideways-authored text that reads correctly only after the
    viewer (or extractor) composes the page rotation. Line coordinates
    are the VIEWED layout grid inverse-mapped into user space, so an
    extractor that ignores /Rotate sees scrambled reading order while a
    composing one recovers the golden text. Rotation cycles 90/180/270
    with ``doc_id//160``; compression alternates on the same index."""
    rot = (90, 180, 270)[(doc_id // 160) % 3]
    if rot == 90:
        def inv(vx, vy):
            return (PAGE_W - vy, vx)
    elif rot == 180:
        def inv(vx, vy):
            return (PAGE_W - vx, PAGE_H - vy)
    else:
        def inv(vx, vy):
            return (vy, PAGE_H - vx)

    pages = _pdf_layout(doc_id, text)
    streams = []
    for placed in pages:
        ops = []
        for li, (x, y, ln) in enumerate(placed):
            ux, uy = inv(x, y)
            ops.append(_show_op(li, ux, uy, ln))
        streams.append("\n".join(ops).encode("latin-1"))

    return _assemble_text_pdf(
        streams, compress=(doc_id // 160) % 2 == 0,
        page_extra=lambda i: f" /Rotate {rot}")


def make_pdf_type3(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file whose text uses a /Subtype /Type3 user-defined
    font (PDF 1.7 §9.6.5): glyphs are little content-stream procedures
    in /CharProcs with a /FontMatrix, and the character mapping lives
    ONLY in the font's /Encoding /Differences (Type3 has no base font
    program). Seven frequent letters map to codes 1–7; extraction must
    resolve them through the Differences+AGL path (bare names and
    uniXXXX forms) while ignoring the glyph-drawing procedures
    entirely. ``doc_id//160`` parity alternates stream compression and
    an indirect /Encoding dict. Same layout/golden-text contract as
    :func:`make_pdf`."""
    pages = _pdf_layout(doc_id, text)
    variant = (doc_id // 160) % 2
    indirect_enc = variant == 1

    def enc_line(ln: str) -> str:
        return "".join(
            chr(_WINANSI_SUBS[c]) if c in _WINANSI_SUBS else c
            for c in ln)

    streams = []
    for placed in pages:
        ops = [_show_op(li, x, y, enc_line(ln))
               for li, (x, y, ln) in enumerate(placed)]
        streams.append("\n".join(ops).encode("latin-1"))

    glyph_names = ["e", "t", "a", "o", "uni0069", "n", "uni0073"]
    font_num = 3 + 2 * len(streams)
    charprocs_num = font_num + 1
    glyph0 = charprocs_num + 1
    enc_num = glyph0 + len(glyph_names)
    enc_dict = (b"<< /Type /Encoding /Differences "
                + _WINANSI_DIFFS + b" >>")
    enc_entry = (b"%d 0 R" % enc_num) if indirect_enc else enc_dict
    font_obj = (
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 750 750] "
        b"/FontMatrix [0.001 0 0 0.001 0 0] /CharProcs %d 0 R "
        b"/FirstChar 1 /LastChar 7 "
        b"/Widths [600 600 600 600 600 600 600] "
        b"/Encoding " % charprocs_num + enc_entry + b" >>")
    tail: list[bytes] = [b"<< " + b" ".join(
        b"/%s %d 0 R" % (g.encode(), glyph0 + i)
        for i, g in enumerate(glyph_names)) + b" >>"]
    for i in range(len(glyph_names)):
        proc = (b"600 0 0 0 700 700 d1\n50 50 m 650 650 l "
                b"%d 350 l h f" % (100 + i * 50))
        tail.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(proc), proc))
    if indirect_enc:
        tail.append(enc_dict)
    return _assemble_text_pdf(streams, compress=variant == 0,
                              font_obj=font_obj, tail_objs=tail)


def _show_op(li: int, x: float, y: float, ln: str) -> str:
    """One line's BT..ET show op (TJ kerning split every 3rd line) —
    shared by the plain and form-XObject emitters."""
    esc = _pdf_escape(ln)
    if li % 3 == 2 and len(esc) > 4:
        mid = len(esc) // 2
        while mid < len(esc) and esc[mid - 1] == "\\":
            mid += 1
        show = f"[({esc[:mid]}) -15 ({esc[mid:]})] TJ"
    else:
        show = f"({esc}) Tj"
    return f"BT /F1 {FONT_SIZE} Tf {x:.1f} {y:.1f} Td {show} ET"


def make_pdf_tj_spacing(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file that encodes every inter-word space as a large
    negative TJ kern instead of a space glyph — the layout LaTeX/
    InDesign-style generators emit (PDF 1.7 §9.4.3). Extraction must
    reinsert the word breaks from the kern magnitude (oracle
    ``TJ_WORD_GAP``). The kern varies per doc (-150 - doc_id%200) to
    exercise the threshold range; golden text is unchanged."""
    pages = _pdf_layout(doc_id, text)
    gap = -(150 + doc_id % 200)
    streams = []
    for placed in pages:
        ops = []
        for x, y, ln in placed:
            arr = f" {gap} ".join(
                f"({_pdf_escape(w)})" for w in ln.split(" "))
            ops.append(f"BT /F1 {FONT_SIZE} Tf {x:.1f} {y:.1f} Td "
                       f"[{arr}] TJ ET")
        streams.append("\n".join(ops).encode("latin-1"))

    npages = len(streams)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    font_num = 3 + 2 * npages
    for i, content in enumerate(streams):
        objs.append((
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode())
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    return _assemble_pdf(objs)


def annot_uris_for(doc_id: int) -> list[str]:
    """Deterministic /Annots link URIs: 1 + doc_id%3 links per doc (the
    SQL-expressible ground truth for the extract_pdf_links oracle)."""
    return [f"https://links.example.net/{doc_id}/{k}"
            for k in range(1 + doc_id % 3)]


def make_pdf_annots(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file whose hyperlinks live in /Annots Link annotations
    (PDF 1.7 §12.5.6.5) — where real-world PDF links are, invisible to
    the text layer. Page 0 carries one /Subtype /Link per
    ``annot_uris_for`` URI (the first one's /A action dict is INDIRECT)
    plus a /Subtype /Text note annotation that must contribute nothing;
    the /Annots array itself is indirect on alternating ``doc_id//80``
    parity. Text layer and golden text are the plain ``make_pdf``
    layout; streams Flate-compress on the same parity."""
    uris = annot_uris_for(doc_id)
    variant = (doc_id // 80) % 2
    streams = _pdf_content_streams(doc_id, text)
    font_num = 3 + 2 * len(streams)
    # tail layout after the font: [annots-array (variant 1 only)],
    # text-note annot, link annots, indirect action for link 0
    arr_num = font_num + 1
    note_num = arr_num + (1 if variant == 1 else 0)
    link0 = note_num + 1
    action0 = link0 + len(uris)
    annot_refs = " ".join(
        f"{n} 0 R" for n in [note_num, *range(link0, link0 + len(uris))])
    annots_entry = (f"/Annots {arr_num} 0 R" if variant == 1
                    else f"/Annots [{annot_refs}]")
    tail: list[bytes] = []
    if variant == 1:
        tail.append(b"[" + annot_refs.encode() + b"]")
    tail.append(b"<< /Type /Annot /Subtype /Text /Rect [0 0 10 10] "
                b"/Contents (reviewer note) >>")
    for k, uri in enumerate(uris):
        rect = f"[72 {40 + 14 * k} 172 {52 + 14 * k}]"
        esc = uri.replace("(", r"\(").replace(")", r"\)")
        if k == 0:
            tail.append((f"<< /Type /Annot /Subtype /Link /Rect {rect} "
                         f"/A {action0} 0 R >>").encode())
        else:
            tail.append((f"<< /Type /Annot /Subtype /Link /Rect {rect} "
                         f"/A << /Type /Action /S /URI /URI ({esc}) >> "
                         f">>").encode())
    esc0 = uris[0].replace("(", r"\(").replace(")", r"\)")
    tail.append(f"<< /Type /Action /S /URI /URI ({esc0}) >>".encode())
    return _assemble_text_pdf(
        streams, compress=variant == 0,
        page_extra=lambda i: f" {annots_entry}" if i == 0 else "",
        tail_objs=tail)


_MATRIX_VARIANTS = [(90, 1.0), (180, 2.0), (270, 0.5), (30, 1.0), (60, 2.0)]


def make_pdf_matrix(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file whose text renders through a rotated+scaled
    coordinate system (PDF 1.7 §8.3.4) — scanned-and-OCRed or
    landscape-generated documents ship this shape. Each page's content
    wraps in ``q <rot·scale> cm … Q``; lines place via
    inverse-transformed ``Td`` coordinates, every 4th line via a full
    six-element ``Tm`` (inverse rotation in the linear part), and lines
    ``li%4==1`` nest an extra ``q 1 0 0 1 5 -3 cm … Q`` translation to
    exercise the graphics-state stack. DEVICE-space geometry equals
    ``make_pdf``'s layout, so a full-matrix interpreter recovers the
    golden reading order while a translation-only reader sees scrambled
    coordinates. Rotation angle / scale cycle with ``doc_id//80``;
    streams Flate-compress on alternating ``doc_id//160`` parity (the
    corpus slot is %160==54, so a //80 parity would never alternate)."""
    import math
    import zlib
    theta_deg, s = _MATRIX_VARIANTS[(doc_id // 80) % len(_MATRIX_VARIANTS)]
    th = math.radians(theta_deg)
    ca, sa = math.cos(th), math.sin(th)

    def inv(dx: float, dy: float) -> tuple:
        # the parser reads the written %.6f/%.4f decimals; the inverse
        # here uses full precision, so device error stays ~1e-3 pt —
        # far below LINE_H (14) and the 40pt column gap
        return ((ca * dx + sa * dy) / s, (-sa * dx + ca * dy) / s)

    pages = _pdf_layout(doc_id, text)
    streams = []
    for placed in pages:
        ops = [f"q {s * ca:.6f} {s * sa:.6f} {-s * sa:.6f} "
               f"{s * ca:.6f} 0 0 cm"]
        for li, (x, y, ln) in enumerate(placed):
            esc = _pdf_escape(ln)
            tx, ty = inv(x, y)
            if li % 4 == 0:
                ops.append(
                    f"BT /F1 {FONT_SIZE} Tf {ca / s:.6f} {-sa / s:.6f} "
                    f"{sa / s:.6f} {ca / s:.6f} {tx:.4f} {ty:.4f} Tm "
                    f"({esc}) Tj ET")
            elif li % 4 == 1:
                ops.append(
                    f"q 1 0 0 1 5 -3 cm BT /F1 {FONT_SIZE} Tf "
                    f"{tx - 5:.4f} {ty + 3:.4f} Td ({esc}) Tj ET Q")
            else:
                ops.append(f"BT /F1 {FONT_SIZE} Tf {tx:.4f} {ty:.4f} Td "
                           f"({esc}) Tj ET")
        ops.append("Q")
        streams.append("\n".join(ops).encode("latin-1"))

    return _assemble_text_pdf(streams, compress=(doc_id // 160) % 2 == 0)


def make_pdf_form(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file that carries part of its text inside Form
    XObjects invoked with ``Do`` (PDF 1.7 §8.10) — the letterhead/
    stamp/LaTeX layout. Per page: lines ``li%4==1`` live in form /Fx1,
    of which ``li%8==5`` live in a NESTED form /Fx2 (which declares no
    /Resources, exercising font inheritance); an image XObject /Im1 is
    also invoked and must contribute nothing. Reading order is
    recovered purely from coordinates, so the split is invisible in
    the golden text. Even doc_ids Flate-compress all streams."""
    import zlib
    pages = _pdf_layout(doc_id, text)
    compress = doc_id % 2 == 0

    page_ops, fa_ops, fb_ops = [], [], []
    for placed in pages:
        po, fa, fb = [], [], []
        for li, (x, y, ln) in enumerate(placed):
            op = _show_op(li, x, y, ln)
            (fb if li % 8 == 5 else fa if li % 4 == 1 else po).append(op)
        po.append("/Im1 Do")   # image XObject: a text no-op
        po.append("/Fx1 Do")
        fa.append("/Fx2 Do")
        page_ops.append("\n".join(po).encode("latin-1"))
        fa_ops.append("\n".join(fa).encode("latin-1"))
        fb_ops.append("\n".join(fb).encode("latin-1"))

    npages = len(pages)
    font_num = 3 + 2 * npages
    img_num = font_num + 1 + 2 * npages

    def stream_obj(content: bytes, extra: bytes = b"") -> bytes:
        enc, filt = ((zlib.compress(content, 6), b" /Filter /FlateDecode")
                     if compress else (content, b""))
        return (b"<< %s/Length %d%s >>\nstream\n%s\nendstream"
                % (extra, len(enc), filt, enc))

    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    for i, content in enumerate(page_ops):
        fa_num = font_num + 1 + 2 * i
        objs.append((
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> /XObject "
            f"<< /Fx1 {fa_num} 0 R /Im1 {img_num} 0 R >> >> >>"
        ).encode())
        objs.append(stream_obj(content))
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(npages):
        fb_num = font_num + 2 + 2 * i
        objs.append(stream_obj(
            fa_ops[i],
            (f"/Type /XObject /Subtype /Form /BBox [0 0 {PAGE_W:.0f} "
             f"{PAGE_H:.0f}] /Resources << /Font << /F1 {font_num} 0 R >> "
             f"/XObject << /Fx2 {fb_num} 0 R >> >> ").encode()))
        # nested form: deliberately NO /Resources (inherits the parent's)
        objs.append(stream_obj(
            fb_ops[i],
            (f"/Type /XObject /Subtype /Form /BBox [0 0 {PAGE_W:.0f} "
             f"{PAGE_H:.0f}] ").encode()))
    objs.append(
        b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Length 1 >>\n"
        b"stream\n\x00\nendstream")

    return _assemble_pdf(objs)


def make_pdf_cmap(doc_id: int, text: str) -> bytes:
    """A PDF-1.4 file whose text is shown as 2-byte codes through a
    /Type0 font with a /ToUnicode CMap — the layout real readers use
    for non-latin text (PDF 1.7 §9.10.3; the reference gets this free
    from MuPDF, ``/root/reference/approach4_v1.py:21-31``). The code
    space is a per-document codebook (first-appearance order), so
    extraction MUST interpret the CMap to recover the text.
    Same layout/golden-text contract as :func:`make_pdf`.
    """
    import zlib
    pages = _pdf_layout(doc_id, text)
    compress = doc_id % 2 == 0
    codes: dict[str, int] = {}
    for placed in pages:
        for _, _, ln in placed:
            for ch in ln:
                if ch not in codes:
                    codes[ch] = len(codes) + 1

    def hexshow(s: str) -> str:
        return "".join(format(codes[ch], "04x") for ch in s)

    streams = []
    for placed in pages:
        ops = []
        for li, (x, y, ln) in enumerate(placed):
            if li % 3 == 2 and len(ln) > 4:
                mid = len(ln) // 2
                show = f"[<{hexshow(ln[:mid])}> -15 <{hexshow(ln[mid:])}>] TJ"
            else:
                show = f"<{hexshow(ln)}> Tj"
            ops.append(f"BT /F1 {FONT_SIZE} Tf {x:.1f} {y:.1f} Td {show} ET")
        streams.append("\n".join(ops).encode("latin-1"))

    npages = len(streams)
    font_num = 3 + 2 * npages
    cmap_num = font_num + 1
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    for i, content in enumerate(streams):
        objs.append((
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode())
        if compress:
            cz = zlib.compress(content, 6)
            objs.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(cz), cz))
        else:
            objs.append(
                b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(content), content))
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
        b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cmap_num)
    # ToUnicode CMap: <=100 bfchar mappings per block (spec limit)
    items = sorted(codes.items(), key=lambda kv: kv[1])
    blocks = []
    for i in range(0, len(items), 100):
        batch = items[i : i + 100]
        body = "\n".join(
            f"<{code:04x}> <{ch.encode('utf-16-be').hex()}>"
            for ch, code in batch
        )
        blocks.append(f"{len(batch)} beginbfchar\n{body}\nendbfchar")
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        + "\n".join(blocks)
        + "\nendcmap\nCMapName currentdict /CMap defineresource pop\n"
        "end\nend"
    ).encode("latin-1")
    objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(cmap), cmap))

    return _assemble_pdf(objs)


def make_pdf15(doc_id: int, text: str) -> bytes:
    """A PDF-1.5 file: catalog/page dicts packed in an object stream
    (/Type /ObjStm), cross-reference as a compressed xref *stream*
    (/Type /XRef, W [1 4 2]) — the post-2005 layout most real crawls
    hit (reference reads these through MuPDF, ``approach4_v1.py:21-31``;
    our parser expands the ObjStm in ``oracle._expand_object_streams``).
    Same text layer ground truth as :func:`make_pdf`.
    """
    import struct
    import zlib

    content = [zlib.compress(s, 6) for s in _pdf_content_streams(
        doc_id, text)]
    npages = len(content)
    # numbering: 1 catalog, 2 pages, 3..2+n page dicts (all in ObjStm);
    # 3+n..2+2n content streams; 3+2n font (ObjStm);
    # 4+2n ObjStm container; 5+2n XRef stream
    first_content = 3 + npages
    font_num = 3 + 2 * npages
    objstm_num = 4 + 2 * npages
    xref_num = 5 + 2 * npages

    kids = " ".join(f"{3 + i} 0 R" for i in range(npages))
    inner: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode()),
    ]
    for i in range(npages):
        inner.append((3 + i, (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:.0f} "
            f"{PAGE_H:.0f}] /Contents {first_content + i} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()))
    inner.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    bodies = b" ".join(body for _, body in inner)
    offs, pos = [], 0
    for _, body in inner:
        offs.append(pos)
        pos += len(body) + 1  # the joining space
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(inner, offs)
    ).encode()
    objstm_payload = header + b"\n" + bodies
    first = len(header) + 1
    objstm_z = zlib.compress(objstm_payload, 6)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    for i, cz in enumerate(content):
        emit(first_content + i,
             b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
             % (len(cz), cz))
    emit(objstm_num,
         b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
         b"/Length %d >>\nstream\n%s\nendstream"
         % (len(inner), first, len(objstm_z), objstm_z))

    # xref stream: W [1 4 2]; entries for object numbers 0..xref_num
    size = xref_num + 1
    offsets[xref_num] = len(out)  # the xref stream is emitted next
    rows = []
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        else:  # compressed object: (in objstm_num, at index i)
            idx = next(i for i, (n, _) in enumerate(inner) if n == num)
            rows.append((2, objstm_num, idx))
    xref_payload = b"".join(
        struct.pack(">B", t) + struct.pack(">I", f2) + struct.pack(">H", f3)
        for t, f2, f3 in rows
    )
    xref_z = zlib.compress(xref_payload, 6)
    xref_pos = len(out)
    emit(xref_num,
         b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R /Filter "
         b"/FlateDecode /Length %d >>\nstream\n%s\nendstream"
         % (size, len(xref_z), xref_z))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


# --------------------------------------------------------------------------
# DOCX generator — minimal OOXML (stdlib zipfile, deterministic)
# --------------------------------------------------------------------------

_DOCX_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    b'content-types"><Default Extension="xml" ContentType="application/'
    b'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    b'+xml"/></Types>'
)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def docx_link_uris_for(doc_id: int) -> list[str]:
    """Deterministic DOCX hyperlink targets for the ``%40==12`` slot:
    1 + (doc_id//40)%2 links (SQL-expressible oracle ground truth)."""
    return [f"https://docs.example.net/{doc_id}/{k}"
            for k in range(1 + (doc_id // 40) % 2)]


def make_docx(doc_id: int, text: str) -> bytes:
    """Minimal .docx: a zip with word/document.xml, one <w:p> per
    10-word line (reference analogue: python-docx paragraph read,
    ``/root/reference/approach4_v1.py:33-42``). Fixed zip timestamps
    keep the bytes a pure function of (doc_id, text).

    The ``doc_id%40==12`` slot wraps its first paragraphs' runs in
    ``<w:hyperlink r:id>`` elements resolved through an external-mode
    ``word/_rels/document.xml.rels`` part — where real .docx hyperlinks
    live; golden text is unchanged (the runs keep their text)."""
    import io
    import zipfile
    uris = docx_link_uris_for(doc_id) if doc_id % 40 == 12 else []

    def para(idx: int, p: str) -> str:
        run = f"<w:r><w:t>{_xml_escape(p)}</w:t></w:r>"
        if idx < len(uris):
            return (f'<w:p><w:hyperlink r:id="rId{idx + 1}">{run}'
                    "</w:hyperlink></w:p>")
        return f"<w:p>{run}</w:p>"

    paras = "".join(para(i, p) for i, p in enumerate(chunk_text(text)))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships"><w:body>'
        f"{paras}</w:body></w:document>"
    ).encode("utf-8")
    members = [
        ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
        ("word/document.xml", document),
    ]
    if uris:
        rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{k + 1}" Type="http://schemas.'
                "openxmlformats.org/officeDocument/2006/relationships/"
                f'hyperlink" Target="{_xml_escape(u)}" '
                'TargetMode="External"/>'
                for k, u in enumerate(uris))
            + "</Relationships>"
        ).encode("utf-8")
        members.append(("word/_rels/document.xml.rels", rels))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, payload in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, payload)
    return buf.getvalue()


# --------------------------------------------------------------------------
# Malformed payloads
# --------------------------------------------------------------------------

def _make_raster_pdf(doc_id: int, filter_name: bytes,
                     seed: bytes) -> bytes:
    """Structurally-valid single-page PDF whose content stream declares
    a raster-image codec filter we intentionally do not implement —
    extraction must yield reason=unsupported_filter, never a crash or
    silent garbage (LIMITS.md §1)."""
    payload = hashlib.md5(seed + b":%d" % doc_id).digest() * 4
    return (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length %d /Filter /%s >>\nstream\n%s\n"
        b"endstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%%%EOF\n"
        % (len(payload), filter_name, payload)
    )


def make_junk(doc_id: int) -> bytes:
    """Malformed/unsupported payloads: must yield
    ``status='parse_failure'`` rows with a stable ``lineage.reason``,
    never job failures (reference error-row protocol,
    ``/root/reference/batch_multi_column.py:573-592``).

    Variants by (doc_id // 20) % 6 model a real crawl's PDF failure
    budget (the junk slot is 5% of documents → ~0.83% per class):
    0 → /JBIG2Decode, 3 → /DCTDecode (scanned JPEG page),
    4 → /CCITTFaxDecode (fax scan) — raster codecs the text-layer
    parser refuses (reason=unsupported_filter; the reference's S3/S4
    paths rasterize+OCR these, out of scope by the byte-identity rule);
    1 → PDF magic truncated mid-structure (reason=no_streams);
    5 → /Encrypt in the trailer (reason=encrypted);
    2 → binary noise (reason=unknown_route)."""
    v = (doc_id // 20) % 6
    if v == 0:
        return _make_raster_pdf(doc_id, b"JBIG2Decode", b"jbig2")
    if v == 3:
        return _make_raster_pdf(doc_id, b"DCTDecode", b"dct")
    if v == 4:
        return _make_raster_pdf(doc_id, b"CCITTFaxDecode", b"ccitt")
    if v == 1:
        # PDF magic but truncated mid-structure
        return b"%PDF-1.4\n1 0 obj\n<< /Type /Cat"
    if v == 5:
        # standard-security-handler encrypted document: the parser
        # refuses up front (decryption out of scope) with a counted
        # reason instead of tokenizing ciphertext into garbage
        payload = hashlib.md5(b"enc:%d" % doc_id).digest() * 4
        return (
            b"%%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            b"endobj\n"
            b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\n"
            b"endstream\nendobj\n"
            b"5 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 >>\n"
            b"endobj\n"
            b"trailer\n<< /Root 1 0 R /Encrypt 5 0 R >>\n%%%%EOF\n"
            % (len(payload), payload)
        )
    # \x00\xff prefix guarantees the sniffer routes this 'unknown'
    return b"\x00\xff" + hashlib.md5(str(doc_id).encode()).digest() * 8


# --------------------------------------------------------------------------
# Row assembly
# --------------------------------------------------------------------------

def payload_for(doc_id: int, text: str) -> bytes:
    route = route_for(doc_id)
    if route == "html":
        raw = make_html(doc_id, text)
        if doc_id % 40 == 26:
            # UTF-16LE + BOM charset variant (a steady share of real
            # WARC payloads); same logical route, same golden text
            return raw.decode("utf-8").encode("utf-16")
        if doc_id % 20 == 13:
            # gzip transfer-encoding variant (Common-Crawl WARC payloads
            # are frequently gzip) — same logical route, same golden text
            import gzip
            return gzip.compress(raw, compresslevel=6, mtime=0)
        return raw
    if route == "docx":
        raw = make_docx(doc_id, text)
        if doc_id % 40 == 32:
            # gzip-wrapped DOCX: sniff routes by decompressed head
            import gzip
            return gzip.compress(raw, compresslevel=6, mtime=0)
        return raw
    if route == "pdf":
        if doc_id % 40 == 18:
            # PDF 1.5: object streams + xref stream
            return make_pdf15(doc_id, text)
        if doc_id % 40 == 38:
            return make_pdf(doc_id, text, filter_mode="lzw")
        if doc_id % 40 == 34:
            # Type0 font + ToUnicode CMap (non-latin-capable route)
            return make_pdf_cmap(doc_id, text)
        if doc_id % 40 == 35:
            return make_pdf(doc_id, text, filter_mode="ahx")
        if doc_id % 40 == 36:
            return make_pdf(doc_id, text, filter_mode="a85+flate")
        if doc_id % 40 == 37:
            return make_pdf(doc_id, text, filter_mode="rle")
        if doc_id % 80 == 15:
            # simple-font /Encoding: WinAnsi base + /Differences remap
            return make_pdf_winansi(doc_id, text)
        if doc_id % 80 == 16:
            # Flate + PNG predictor (row filters cycle through all 5)
            return make_pdf(doc_id, text, filter_mode="pred-png")
        if doc_id % 80 == 56:
            # Flate + TIFF predictor 2
            return make_pdf(doc_id, text, filter_mode="pred-tiff")
        if doc_id % 80 == 57:
            # text split across nested Form XObjects (Do operator)
            return make_pdf_form(doc_id, text)
        if doc_id % 160 == 134:
            # page-level /Rotate display rotation (scanned-doc shape)
            return make_pdf_rotated_page(doc_id, text)
        if doc_id % 80 == 54:
            # rotated/scaled CTM + full Tm matrices + q/Q nesting
            return make_pdf_matrix(doc_id, text)
        if doc_id % 80 == 17:
            # hyperlinks as /Annots Link annotations
            return make_pdf_annots(doc_id, text)
        if doc_id % 160 == 14:
            # Type3 user-defined font: CharProcs glyphs + /Differences
            return make_pdf_type3(doc_id, text)
        if doc_id % 80 == 55:
            # word spacing encoded as TJ kerns, no space glyphs
            return make_pdf_tj_spacing(doc_id, text)
        return make_pdf(doc_id, text)
    return make_junk(doc_id)


def make_page(doc_id: int, text: str, source: str = "src",
              lang: str | None = None) -> dict:
    """One input-table row from a (doc_id, text) pair."""
    return {
        "url": url_for(doc_id, source),
        "warc_ts": ts_for(doc_id),
        "html": payload_for(doc_id, text),
        "text": text,
        "lang": lang if lang is not None else LANGS[doc_id % len(LANGS)],
    }


def synth_text(doc_id: int, min_words: int = 8, max_words: int = 120) -> str:
    """Deterministic word-soup text for standalone corpora (seedless:
    derived from md5(doc_id))."""
    h = hashlib.md5(b"text:%d" % doc_id).digest()
    n = min_words + (int.from_bytes(h[:4], "big") % (max_words - min_words))
    words = []
    stream = b""
    i = 0
    while len(words) < n:
        if not stream:
            stream = hashlib.md5(b"w:%d:%d" % (doc_id, i)).digest()
            i += 1
        words.append(_SYNTH_WORDS[stream[0] % len(_SYNTH_WORDS)])
        stream = stream[1:]
    return " ".join(words)


def synth_rows(n: int, big_doc_every: int = 97):
    """Generator of n input rows; every ``big_doc_every``-th doc is large
    enough to span multiple PDF pages / long HTML."""
    for doc_id in range(n):
        if (big_doc_every
                and doc_id % big_doc_every == big_doc_every - 1):
            text = synth_text(doc_id, 600, 1200)
        else:
            text = synth_text(doc_id)
        yield make_page(doc_id, text)
