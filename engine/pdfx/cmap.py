"""P3 breadth — /ToUnicode CMap decode for composite (Type0/CID) fonts.

The reference converts arbitrary PDFs via pdfminer (requirements.txt:7 →
app/main.py:383), which resolves per-font ToUnicode CMaps; this is the same
capability on the stdlib: parse begincodespacerange / beginbfchar /
beginbfrange sections out of the (already de-filtered) CMap stream and build
a code→unicode table. Fonts without a ToUnicode stream fall back to the
WinAnsi single-byte path (engine/pdfx/content.py).
"""

from __future__ import annotations

import re

from engine.pdfx.objects import Stream, _Lexer, resolve

_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f \r\n]*)>")


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return "�"


def parse_tounicode(data: bytes) -> tuple[int, dict[int, str]]:
    """CMap bytes → (code_bytes, {code: unicode string})."""
    code_bytes = 1
    m = _CODESPACE_RE.search(data)
    if m:
        first = _HEX_RE.search(m.group(1))
        if first:
            code_bytes = max(1, len(first.group(1).replace(b" ", b"")) // 2)

    table: dict[int, str] = {}
    for sec in _BFCHAR_RE.finditer(data):
        toks = _HEX_RE.findall(sec.group(1))
        for i in range(0, len(toks) - 1, 2):
            src = int(toks[i].translate(None, b" \r\n"), 16)
            dst = bytes.fromhex(toks[i + 1].translate(None, b" \r\n").decode())
            table[src] = _utf16be(dst)
    for sec in _BFRANGE_RE.finditer(data):
        lex = _Lexer(sec.group(1))
        items: list = []
        while True:
            lex.skip_ws()
            if lex.pos >= len(lex.data):
                break
            try:
                items.append(lex.parse_value())
            except Exception:
                break
        i = 0
        while i + 3 <= len(items):
            lo, hi, dst = items[i : i + 3]
            i += 3
            if not isinstance(lo, bytes) or not isinstance(hi, bytes):
                continue
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if isinstance(dst, list):  # one dst string per code
                for off, d in enumerate(dst):
                    if isinstance(d, bytes):
                        table[lo_i + off] = _utf16be(d)
            elif isinstance(dst, bytes):  # incrementing last code unit
                base = int.from_bytes(dst, "big")
                width = len(dst)
                for off in range(hi_i - lo_i + 1):
                    table[lo_i + off] = _utf16be(
                        (base + off).to_bytes(width, "big"))
    return code_bytes, table


class FontDecoder:
    """Per-font string decoder: ToUnicode table when present, else WinAnsi."""

    __slots__ = ("code_bytes", "table")

    def __init__(self, code_bytes: int = 1,
                 table: dict[int, str] | None = None):
        self.code_bytes = code_bytes
        self.table = table

    def decode(self, raw: bytes) -> str:
        if self.table is None:
            from engine.pdfx.content import decode_pdf_string

            return decode_pdf_string(raw)
        step = self.code_bytes
        out = []
        for i in range(0, len(raw) - step + 1, step):
            code = int.from_bytes(raw[i : i + step], "big")
            out.append(self.table.get(code, "�"))
        return "".join(out)


def build_page_fonts(objects: dict, page: dict) -> dict[str, FontDecoder]:
    """Page /Resources /Font → {font name: FontDecoder}. Fonts without a
    usable ToUnicode stream get the WinAnsi fallback decoder."""
    fonts: dict[str, FontDecoder] = {}
    res = resolve(objects, page.get("Resources"))
    if not isinstance(res, dict):
        return fonts
    fdict = resolve(objects, res.get("Font"))
    if not isinstance(fdict, dict):
        return fonts
    for name, ref in fdict.items():
        fd = resolve(objects, ref)
        decoder = FontDecoder()
        if isinstance(fd, dict):
            tu = resolve(objects, fd.get("ToUnicode"))
            if isinstance(tu, Stream):
                try:
                    code_bytes, table = parse_tounicode(tu.data())
                    if table:
                        decoder = FontDecoder(code_bytes, table)
                except Exception:
                    pass  # malformed CMap → WinAnsi fallback, not a row error
        fonts[str(name)] = decoder
    return fonts
