"""Byte-distribution charset sniff for BOM-less, declaration-free
pages (oracle._sniff_charset — LIMITS.md §2 tail). Deterministic
chardet-style scoring; kernel and oracle share the code path via
_decode_transfer_html."""

from __future__ import annotations

from document_text_extraction_spark import corpus as C
from document_text_extraction_spark import oracle

JA = ("日本語のページです。文字コードの宣言はありません。"
      "今日はとても良い天気ですね。近くの公園まで散歩に行きましょう。")
RU = ("Это страница на русском языке без объявления кодировки. "
      "Сегодня хорошая погода, и мы идём гулять в парк возле дома.")
KO = ("이것은 인코딩 선언이 없는 한국어 페이지입니다. "
      "오늘은 날씨가 좋네요. 공원에 산책하러 갑시다.")
ZH_S = ("这是一个没有声明编码的中文网页。今天天气很好，"
        "我们去公园散步吧。这里有很多文字内容可以阅读。")
ZH_T = ("這是一個沒有聲明編碼的中文網頁。今天天氣很好，"
        "我們去公園散步吧。這裡有很多文字內容可以閱讀。")
FR = ("Voici une page française avec des accents : é è à ç ù. "
      "Le café est délicieux près de la forêt et la journée était "
      "très agréable.")


def _page(text: str, codec: str) -> bytes:
    return ("<html><body><p>" + text + "</p></body></html>").encode(codec)


def test_sniffs_every_supported_codec():
    assert oracle._sniff_charset(_page(JA, "shift_jis")) == "shift_jis"
    assert oracle._sniff_charset(_page(JA, "euc_jp")) == "euc_jp"
    assert oracle._sniff_charset(_page(KO, "euc_kr")) == "euc_kr"
    assert oracle._sniff_charset(_page(ZH_S, "gbk")) == "gbk"
    assert oracle._sniff_charset(_page(ZH_T, "big5")) == "big5"
    assert oracle._sniff_charset(_page(RU, "cp1251")) == "cp1251"
    assert oracle._sniff_charset(_page(RU, "koi8-r")) == "koi8-r"
    assert oracle._sniff_charset(_page(FR, "cp1252")) == "cp1252"


def test_sniff_negatives():
    # valid UTF-8 (incl. multibyte), ASCII, low signal, binary noise
    assert oracle._sniff_charset(_page(JA, "utf-8")) is None
    assert oracle._sniff_charset(b"<html>plain ascii</html>") is None
    assert oracle._sniff_charset(b"almost ascii \xe9 once") is None
    assert oracle._sniff_charset(bytes(range(256)) * 40) is None


def test_sniff_window_cut_multibyte_tail_is_tolerated():
    # a UTF-8 page whose 64 KiB window ends mid-codepoint must still
    # be recognized as UTF-8 (None), not shunted into legacy scoring
    body = ("x" * (oracle._SNIFF_WINDOW - 2)).encode() + "日".encode()
    assert oracle._sniff_charset(body) is None


def test_declared_label_wins_over_sniff():
    # meta says cp1251 → honored even though the bytes would also
    # sniff; and a declared utf-8 label suppresses sniffing entirely
    page = ('<html><head><meta charset="windows-1251"></head>'
            '<body><p>' + RU + "</p></body></html>").encode("cp1251")
    out = oracle._decode_transfer_html(page)
    assert RU in out.decode("utf-8")
    sj = ('<html><head><meta charset="utf-8"></head><body><p>'
          + JA + "</p></body></html>").encode("shift_jis")
    # declared (wrongly) utf-8: declaration wins, no sniff rescue —
    # browser behavior; the mojibake is the page author's bug
    out = oracle._decode_transfer_html(sj)
    assert JA not in out.decode("utf-8", "replace")


def test_undeclared_pages_transcode_via_sniff():
    for codec, text in (("shift_jis", JA), ("euc_jp", JA),
                        ("cp1251", RU), ("gbk", ZH_S)):
        out = oracle._decode_transfer_html(_page(text, codec))
        assert text in out.decode("utf-8")


def test_extraction_golden_for_declaration_free_corpus_pages():
    """End-to-end: the registry plant — make_html_charset minus its
    declaration plus a native paragraph — extracts byte-identical
    golden text through the full oracle."""
    natives = {"shift_jis": JA, "euc_jp": JA, "cp1251": RU}
    for n, r in enumerate(C.synth_rows(9)):
        i = int(r["url"].rsplit("/", 1)[-1])
        codec = ["shift_jis", "euc_jp", "cp1251"][i % 3]
        page = C.make_html_charset(i, r["text"], codec)
        meta = C.CHARSET_VARIANTS[codec][0].encode(codec)
        tail = "\n  </main>".encode(codec)
        bare = page.replace(meta, b"", 1).replace(
            tail, ("\n    <p>" + natives[codec] + "</p>").encode(codec)
            + tail, 1)
        rec = oracle.extract_document(bare)
        op, cl = C.CHARSET_VARIANTS[codec][1:3]
        golden = "\n".join(op + p + cl for p in C.chunk_text(r["text"]))
        assert rec["status"] == "ok"
        assert rec["extracted_text"] == golden + "\n" + natives[codec]


def test_sniff_never_crashes_and_is_deterministic_on_noise():
    """Fuzz: arbitrary byte blobs (valid or not in every candidate
    codec) must never raise, and repeated calls must agree — the
    detector is a pure function running on the extraction hot path."""
    import random

    rng = random.Random(20260818)
    for n in (0, 1, 7, 64, 1024, 70000):
        for _ in range(8):
            blob = bytes(rng.randrange(256) for _ in range(n))
            a = oracle._sniff_charset(blob)
            b = oracle._sniff_charset(blob)
            assert a == b
            if a is not None:
                # whatever it picked must actually decode
                blob.decode(a, errors="replace")
            # and the full decode stack must never raise either
            oracle._transcode_sniffed_charset(blob)
