"""Charset sniffing (engine/htmlx/charset.py) — BOM → meta prescan → utf-8.

Pins the WHATWG-subset label table, the 1024-byte prescan window, decode
determinism on garbage, and stdlib/fast parser parity on non-UTF-8 payloads.
"""

from __future__ import annotations

import pytest

from engine.extract import extract_row
from engine.htmlx.boilerplate import strip_boilerplate
from engine.htmlx.charset import decode_html, normalize_label, sniff_charset
from engine.htmlx.fastparser import parse_html_fast
from engine.htmlx.parser import parse_html
from engine.mdserialize import serialize


RU = ('<html><head><meta charset="windows-1251"><title>Заголовок</title>'
      '</head><body><article><p>Привет, мир! Это тест кодировки.</p>'
      '</article></body></html>').encode('cp1251')


@pytest.mark.parametrize("payload,want", [
    (b'\xef\xbb\xbf<html><p>bom</p></html>', "utf-8-sig"),
    ('<html><p>x</p></html>'.encode('utf-16'), "utf-16"),
    (RU, "cp1251"),
    ('<html><head><meta http-equiv="Content-Type" content="text/html; '
     'charset=Shift_JIS"></head><body><p>日本語</p></body></html>'
     .encode('cp932'), "cp932"),
    (b'<html><meta charset=GB2312><p>x</p></html>', "gbk"),       # unquoted
    (b"<html><meta charset='EUC-KR'><p>x</p></html>", "cp949"),   # single-quoted
    (b'<html><meta charset="latin-1"><p>caf\xe9</p></html>', "cp1252"),
    (b'<html><meta charset="ISO-8859-9"><p>x</p></html>', "cp1254"),
    (b'<html><meta charset="utf-16"><p>lie</p></html>', "utf-8"),  # spec: meta utf-16 -> utf-8
    (b'<html><meta charset="no-such-enc"><p>x</p></html>', "utf-8"),
    (b'<html><p>plain</p></html>', "utf-8"),
])
def test_sniff_charset(payload, want):
    assert sniff_charset(payload) == want


def test_prescan_window_is_1024_bytes():
    far = (b'<html>' + b'<!-- padding -->' * 80
           + b'<meta charset="windows-1251"><p>\xcf\xf0\xe8\xe2\xe5\xf2</p></html>')
    assert len(far) > 1024
    assert sniff_charset(far) == "utf-8"  # declaration is out of window


def test_normalize_label_table():
    assert normalize_label("  UTF-8 ") == "utf-8"
    assert normalize_label("ascii") == "cp1252"       # WHATWG: ascii -> 1252
    assert normalize_label("gb2312") == "gbk"
    assert normalize_label("shift-jis") == "cp932"
    assert normalize_label("ks_c_5601-1987") == "cp949"
    assert normalize_label("macintosh") == "mac_roman"
    assert normalize_label("utf16") == "utf-8"
    assert normalize_label("x-user-defined") is None
    assert normalize_label("") is None


def test_decode_strips_boms():
    assert decode_html(b'\xef\xbb\xbfhi') == "hi"
    assert decode_html('hi'.encode('utf-16')) == "hi"


def test_decode_garbage_is_deterministic_and_total():
    junk = bytes(range(256)) * 4
    assert decode_html(junk) == decode_html(junk)
    # declared charset + undecodable sequence (cp932 lead byte with an
    # invalid trail): replacement, never a raise
    lie = b'<meta charset="shift_jis"><p>bad \x81<i>x</i></p>'
    assert "�" in decode_html(lie)


def test_extract_row_decodes_declared_charset():
    row = extract_row(RU)
    assert row["status"] == "ok"
    assert row["title"] == "Заголовок"
    assert "Привет, мир!" in row["markdown_text"]


def test_parser_parity_on_non_utf8():
    for payload in (RU, '<html><body><p>日本語のテキストです。</p></body></html>'
                    .encode('cp932')):
        a = serialize(strip_boilerplate(parse_html(payload)))
        b = serialize(strip_boilerplate(parse_html_fast(payload)))
        assert a == b


def test_utf16_alias_spellings_and_utf32_fall_back():
    # python alias spellings must not bypass the utf-16 lie guard
    for lab in ("utf_16", "u16", "utf-32", "utf_32"):
        assert normalize_label(lab) == "utf-8", lab
    assert sniff_charset(b'<meta charset="utf_16"><p>x</p>') == "utf-8"


def test_commented_out_meta_is_skipped():
    # WHATWG prescan tokenizes past comments: a commented legacy header
    # must not win over the live declaration
    page = (b'<!-- <meta charset="windows-1251"> -->'
            b'<meta charset="utf-8"><p>x</p>')
    assert sniff_charset(page) == "utf-8"
    # unterminated comment swallows the rest of the window
    assert sniff_charset(b'<!-- <meta charset="windows-1251">') == "utf-8"
    # ...but a real declaration BEFORE the comment still wins
    assert sniff_charset(
        b'<meta charset="koi8-r"><!-- junk -->') == "koi8-r"
