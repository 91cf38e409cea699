"""WHATWG-subset charset sniffing for ``html:binary`` payloads.

The reference's HTML path (MarkItDown → BeautifulSoup, SURVEY.md §2.2 H1)
decodes bytes via bs4's UnicodeDammit: BOM first, then the ``<meta charset>``
declaration from the document prefix, then UTF-8. Real Common-Crawl payloads
are a large minority non-UTF-8 (cp1251 RU, shift_jis JA, gbk ZH, cp1252
legacy western …), so a UTF-8-only decode silently mojibakes them at
10^12-row scale. This module reproduces the *deterministic* part of that
stack — BOM → WHATWG 1024-byte meta prescan → UTF-8 fallback — and
deliberately omits chardet-style statistical guessing (non-reproducible
across library versions; the reference pins no detector either).

Cost: one compiled-regex search over ≤1024 bytes + a dict lookup per
document — noise next to the DOM parse that follows.
"""

from __future__ import annotations

import codecs
import re

# WHATWG prescan window (https://html.spec.whatwg.org/#determining-the-character-encoding)
SNIFF_LIMIT = 1024

# <meta charset=...> or <meta http-equiv=... content="...; charset=...">
# over raw bytes (every supported encoding is ASCII-compatible in the
# prescan window; UTF-16 inputs are caught by the BOM branch first).
_META_RE = re.compile(
    rb"""<meta[^>]{0,500}?charset\s*=\s*["']?\s*([a-zA-Z0-9_.:\-]+)""",
    re.IGNORECASE,
)

_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)

# WHATWG label → Python codec, the subset that covers the web's head.
# Notable spec-mandated mappings: ascii/latin-1 → windows-1252,
# shift_jis → windows-31j (cp932), euc-kr → windows-949 (cp949),
# gb2312 → GBK. Label comparison is lowercase, whitespace-stripped.
_LABELS: dict[str, str] = {
    # utf-8
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # western / ascii family → windows-1252 per spec
    "ascii": "cp1252", "us-ascii": "cp1252", "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252", "iso_8859-1": "cp1252", "iso88591": "cp1252",
    "iso-ir-100": "cp1252", "csisolatin1": "cp1252", "latin1": "cp1252",
    "latin-1": "cp1252", "latin_1": "cp1252",
    "l1": "cp1252", "cp819": "cp1252", "windows-1252": "cp1252",
    "x-cp1252": "cp1252", "cp1252": "cp1252",
    # other windows codepages
    "windows-1250": "cp1250", "cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251", "x-cp1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "windows-874": "cp874", "tis-620": "cp874", "dos-874": "cp874",
    # iso-8859 rest (python accepts these labels directly, listed for
    # explicitness of the supported set)
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-5": "iso8859-5", "iso-8859-7": "iso8859-7",
    "iso-8859-9": "cp1254",  # spec: iso-8859-9 → windows-1254
    "iso-8859-15": "iso8859-15",
    # cyrillic
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8-u": "koi8-u",
    # cjk
    "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "csgb2312": "gbk", "gbk": "gbk", "x-gbk": "gbk", "chinese": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5", "cn-big5": "big5",
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "ms_kanji": "cp932", "windows-31j": "cp932",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "euc-kr": "cp949", "korean": "cp949", "ks_c_5601-1987": "cp949",
    "ksc_5601": "cp949", "windows-949": "cp949",
    # mac
    "macintosh": "mac_roman", "x-mac-roman": "mac_roman",
    "x-mac-cyrillic": "mac_cyrillic",
}

# Meta-declared UTF-16 is a lie the spec corrects: if the document really
# were UTF-16 the ASCII prescan could not have read the label — treat as
# UTF-8 (https://html.spec.whatwg.org/#character-encodings).
_UTF16_LABELS = frozenset({"utf-16", "utf-16le", "utf-16be", "utf16"})


def normalize_label(label: str) -> str | None:
    """WHATWG label → Python codec name, or None for unknown/invalid."""
    lab = label.strip().strip("'\"").lower()
    if not lab:
        return None
    if lab in _UTF16_LABELS:
        return "utf-8"
    codec = _LABELS.get(lab)
    if codec is not None:
        return codec
    # any remaining label Python itself knows (rare tail); x-user-defined
    # and garbage labels fall through to None → utf-8 fallback.
    try:
        codec = codecs.lookup(lab).name
    except (LookupError, ValueError):
        return None
    # the UTF-16 lie guard must also catch Python alias spellings the
    # _UTF16_LABELS set misses ('utf_16', 'u16', …), and WHATWG has no
    # utf-32 label at all — an ASCII prescan could read neither.
    if codec.startswith(("utf-16", "utf-32")):
        return "utf-8"
    return codec


def sniff_charset(payload: bytes) -> str:
    """BOM → meta prescan (first 1024 bytes) → 'utf-8'. Deterministic."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    # the utf-16 python codec consumes its BOM and picks the byte order
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    head = payload[:SNIFF_LIMIT]
    # the WHATWG prescan tokenizes PAST comments; a commented-out legacy
    # '<!-- <meta charset=…> -->' must not win (real crawl pattern). An
    # unterminated '<!--' swallows the rest of the window.
    if b"<!--" in head:
        head = _COMMENT_RE.sub(b" ", head)
        i = head.find(b"<!--")
        if i >= 0:
            head = head[:i]
    m = _META_RE.search(head)
    if m:
        codec = normalize_label(m.group(1).decode("ascii", "replace"))
        if codec is not None:
            return codec
    return "utf-8"


def decode_html(payload: bytes | bytearray | memoryview) -> str:
    """Decode an HTML payload per the sniffed charset, replacement errors."""
    data = bytes(payload)
    return data.decode(sniff_charset(data), errors="replace")
