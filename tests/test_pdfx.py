"""PDF path tests (P1-P3): object parse, layout order, decode, separators."""

from __future__ import annotations

import pytest

from engine.fixtures import build_pdf, make_pdf, make_pathological
from engine.pdfx import PdfError, extract_pdf, extract_pdf_text
import random


def test_simple_page_lines_and_blocks():
    pdf = build_pdf([[(72, 720, ["line one", "line two"]), (72, 600, ["block two"])]])
    text, spans = extract_pdf(pdf)
    assert text == "line one\nline two\n\nblock two"
    assert [s["kind"] for s in spans] == ["para", "para"]
    assert text.encode()[spans[1]["start"]:spans[1]["end"]] == b"block two"


def test_flate_compressed_stream():
    pdf = build_pdf([[(72, 720, ["compressed text"])]], compress=True)
    assert extract_pdf_text(pdf) == "compressed text"


@pytest.mark.parametrize("style", ["tm", "td", "tj", "quote"])
def test_all_emission_styles_equivalent(style):
    blocks = [[(72, 720, ["alpha beta", "gamma delta"]), (72, 560, ["second block"])]]
    text = extract_pdf_text(build_pdf(blocks, style=style))
    assert text == "alpha beta\ngamma delta\n\nsecond block"


def test_multipage_formfeed_separator():
    pdf = build_pdf([[(72, 720, ["page one"])], [(72, 720, ["page two"])]])
    assert extract_pdf_text(pdf) == "page one\x0cpage two"


def test_two_column_reading_order():
    # same top y: left column block sorts before right (policy: (-y, x))
    page = [(400, 720, ["right top"]), (72, 720, ["left top"]),
            (72, 560, ["left low"]), (400, 560, ["right low"])]
    text = extract_pdf_text(build_pdf([page]))
    assert text == "left top\n\nright top\n\nleft low\n\nright low"


def test_winansi_decoding():
    pdf = build_pdf([[(72, 720, ["café naïve ©"])]])
    assert extract_pdf_text(pdf) == "café naïve ©"


def test_escapes_in_literal_strings():
    pdf = build_pdf([[(72, 720, ["paren (x) and \\ back"])]])
    assert extract_pdf_text(pdf) == "paren (x) and \\ back"


def test_truncated_pdf_raises():
    with pytest.raises(PdfError):
        extract_pdf(make_pathological(random.Random(0), 2)[0])


def test_garbage_after_header_raises_or_empty():
    with pytest.raises(PdfError):
        extract_pdf(b"%PDF-1.4\ntotal garbage here")


def test_generator_roundtrip_all_variants():
    for v in range(8):
        pdf, _src = make_pdf(random.Random(v), v)
        text = extract_pdf_text(pdf)
        assert len(text) > 50


def test_flate_bomb_rejected():
    """A small FlateDecode stream expanding past the cap raises PdfError
    instead of ballooning worker memory (ADVICE: decompression bound)."""
    import zlib

    import pytest

    from engine.pdfx import objects as ob

    bomb = zlib.compress(b"\x00" * (16 * 1024 * 1024))  # 16 MiB of zeros
    s = ob.Stream({"Filter": ob.Name("FlateDecode")}, bomb)
    with pytest.raises(ob.PdfError):
        ob._bounded_inflate(bomb, limit=1024 * 1024)
    # under the default cap it still round-trips
    assert s.data() == b"\x00" * (16 * 1024 * 1024)


def test_pdf_info_title():
    from engine.extract import extract_row
    from engine.fixtures import build_pdf
    from engine.pdfx import extract_pdf_doc

    pdf = build_pdf([[(72.0, 720.0, ["hello world"])]],
                    title="My (Quarterly) Report")
    title, text, spans = extract_pdf_doc(pdf)
    assert title == "My (Quarterly) Report"
    assert text == "hello world"
    row = extract_row(pdf)
    assert row["status"] == "ok"
    assert row["title"] == "My (Quarterly) Report"
    # no /Info -> empty title, unchanged text
    pdf2 = build_pdf([[(72.0, 720.0, ["hello world"])]])
    t2, x2, _ = extract_pdf_doc(pdf2)
    assert t2 == "" and x2 == "hello world"


def test_lzw_roundtrip():
    import random as _random

    from engine.fixtures import lzw_encode
    from engine.pdfx.objects import _lzw_decode

    rng = _random.Random(3)
    cases = [
        b"",
        b"a",
        b"aaaaaaaaaaaaaaaaaaaaaaa",
        b"abcabcabcabcabc" * 100,
        bytes(rng.randrange(256) for _ in range(5000)),
        (b"the quick brown fox " * 400),  # grows table past 9->10->11 bits
    ]
    for data in cases:
        assert _lzw_decode(lzw_encode(data)) == data


def test_filter_variants_extract_identically():
    """LZW / ASCIIHex / Flate / raw streams all decode to the same text."""
    from engine.fixtures import build_pdf
    from engine.pdfx import extract_pdf_text

    pages = [[(72.0, 720.0, ["line one here", "line two here"]),
              (72.0, 600.0, ["second block"])]]
    expected = extract_pdf_text(build_pdf(pages))
    for flt in ("FlateDecode", "LZWDecode", "ASCIIHexDecode"):
        assert extract_pdf_text(build_pdf(pages, stream_filter=flt)) == expected


def test_objstm_xref_stream_layout():
    """PDF 1.5: dicts inside a compressed /ObjStm, trailer keys in the xref
    STREAM dict (no trailer keyword) — parses identically to the classic
    layout, including /Info /Title resolved out of the ObjStm."""
    from engine.fixtures import build_pdf, build_pdf_objstm
    from engine.pdfx import extract_pdf_doc, extract_pdf_text

    pages = [[(72.0, 720.0, ["alpha beta", "gamma delta"])],
             [(72.0, 720.0, ["page two"])]]
    classic = extract_pdf_text(build_pdf(pages))
    modern = build_pdf_objstm(pages, title="Modern Layout")
    assert b"trailer" not in modern
    title, text, spans = extract_pdf_doc(modern)
    assert text == classic
    assert title == "Modern Layout"
    assert len(spans) == 2


def test_cid_tounicode_decode():
    from engine.fixtures import build_pdf_cid
    from engine.pdfx import extract_pdf_doc

    lines = ["Héllo wörld", "数据 处理 — ΣΔ", "plain ascii line"]
    title, text, _ = extract_pdf_doc(build_pdf_cid(lines, title="CID Doc"))
    assert text == "\n".join(lines)
    assert title == "CID Doc"


def test_content_tokenizer_nested_and_escaped_strings():
    """The single-pass tokenizer must fall back to the lexer for nested
    literal strings (incl. inside TJ arrays) and decode escapes exactly."""
    from engine.pdfx.content import interpret

    stream = (
        b"BT\n/F1 12 Tf\n14 TL\n1 0 0 1 72 720 Tm\n"
        b"(outer (nested) tail) Tj\n"
        b"T*\n"
        b"[(array (deep (deeper)) part ) -120 (and \\(escaped\\))] TJ\n"
        b"T*\n"
        b"(octal \\101 newline\\n) Tj\n"
        b"ET"
    )
    runs = interpret(stream)
    texts = [r.text for r in runs]
    assert texts[0] == "outer (nested) tail"
    assert texts[1] == "array (deep (deeper)) part and (escaped)"
    assert texts[2] == "octal A newline\n"
    # positions advanced by T* (leading 14) per line
    assert [round(r.y) for r in runs] == [720, 706, 692]
