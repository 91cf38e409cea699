"""P2/P3 — content-stream interpretation: positioned text runs (SURVEY.md §2.2).

Interprets the text-positioning subset: BT/ET, Tf, TL, Td, TD, Tm, T*, Tj,
TJ, '. Positions track the translation components only (the fixture subset
never rotates/scales text — FIXTURES.md F1b). Strings decode as WinAnsi
(cp1252), the encoding our generator declares (P3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from engine.pdfx.objects import Name, PdfError, _Lexer


@dataclass(frozen=True)
class TextRun:
    x: float
    y: float
    text: str


def decode_pdf_string(raw: bytes) -> str:
    """P3 — WinAnsiEncoding ≈ cp1252; undefined bytes pass through latin-1."""
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")

# Single-pass content tokenizer: one finditer over the stream instead of a
# per-token Python lexer round trip (the lexer remains the fallback for
# nested literal strings, which the 'lit' alternative deliberately fails to
# match — it stops at the first unescaped paren).
_CONTENT_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\n]*)"
    rb"|(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<lit>\((?:[^()\\]|\\.)*\))"
    rb"|(?P<hex><[0-9A-Fa-f\x00\t\n\x0c\r ]*>)"
    rb"|(?P<open>\[)"
    rb"|(?P<close>\])"
    rb"|(?P<op>[A-Za-z'\"*]+)"
    rb"|(?P<other>.)",
    re.S,
)
_HEX_WS_RE = re.compile(rb"[\x00\t\n\x0c\r ]")


def _tokens(data: bytes):
    """Yield ('val', value) and ('op', name) tokens from a content stream.

    Array operands ([...] for TJ) are assembled here and yielded as one
    ('val', list) token, matching the old lexer's parse_value behavior."""
    arrays: list[list] = []

    def out(value):
        if arrays:
            arrays[-1].append(value)
            return None
        return ("val", value)

    pos = 0
    n = len(data)
    while pos < n:
        for m in _CONTENT_RE.finditer(data, pos):
            kind = m.lastgroup
            if kind is None:  # whitespace / comment
                continue
            if kind == "num":
                tok = m.group()
                v = out(float(tok) if b"." in tok else int(tok))
            elif kind == "op":
                yield ("op", m.group().decode("latin-1"))
                continue
            elif kind == "lit":
                raw = m.group()
                if b"\\" in raw:
                    lex = _Lexer(data, m.start())
                    v = out(lex._parse_literal_string())
                else:
                    v = out(raw[1:-1])
            elif kind == "hex":
                hexstr = _HEX_WS_RE.sub(b"", m.group()[1:-1])
                if len(hexstr) % 2:
                    hexstr += b"0"
                v = out(bytes.fromhex(hexstr.decode("ascii", "replace")))
            elif kind == "name":
                raw = m.group()
                if b"#" in raw:
                    lex = _Lexer(data, m.start())
                    v = out(lex._parse_name())
                else:
                    v = out(Name(raw[1:].decode("latin-1")))
            elif kind == "open":
                arrays.append([])
                continue
            elif kind == "close":
                if arrays:
                    arr = arrays.pop()
                    v = out(arr)
                else:
                    continue  # stray ] — tolerant skip
            else:  # 'other': nested literal string or junk byte
                b = m.group()
                if b == b"(":
                    lex = _Lexer(data, m.start())
                    try:
                        v = out(lex._parse_literal_string())
                    except PdfError:
                        pos = m.start() + 1
                        break
                    pos = lex.pos
                    if v is not None:
                        yield v
                    break  # restart finditer past the lexer's end
                continue  # tolerant: skip unknown byte
            if v is not None:
                yield v
        else:
            return  # finditer exhausted without a resync break


def interpret(data: bytes, fonts: dict | None = None) -> list[TextRun]:
    """Run the text subset; return runs with absolute (x, y) positions.

    ``fonts``: optional {font name: FontDecoder} from
    engine.pdfx.cmap.build_page_fonts — strings shown under a font with a
    /ToUnicode CMap decode through it (Type0/CID path); otherwise WinAnsi."""
    runs: list[TextRun] = []
    stack: list = []
    lx = ly = 0.0  # line-matrix translation
    cx = cy = 0.0  # current position
    leading = 0.0
    in_text = False
    cur_decode = decode_pdf_string  # active font's string decoder

    def emit(value) -> None:
        nonlocal cx
        if isinstance(value, bytes):
            text = cur_decode(value)
        elif isinstance(value, list):  # TJ array: strings + kerning numbers
            text = "".join(
                cur_decode(v) for v in value if isinstance(v, bytes)
            )
        else:
            return
        if text:
            runs.append(TextRun(cx, cy, text))

    for kind, tok in _tokens(data):
        if kind == "val":
            stack.append(tok)
            continue
        op = tok
        try:
            if op == "BT":
                in_text = True
                lx = ly = cx = cy = 0.0
            elif op == "ET":
                in_text = False
            elif op == "Td" and len(stack) >= 2:
                ty, tx = stack.pop(), stack.pop()
                lx += float(tx)
                ly += float(ty)
                cx, cy = lx, ly
            elif op == "TD" and len(stack) >= 2:
                ty, tx = stack.pop(), stack.pop()
                leading = -float(ty)
                lx += float(tx)
                ly += float(ty)
                cx, cy = lx, ly
            elif op == "Tm" and len(stack) >= 6:
                f, e = stack.pop(), stack.pop()
                stack[-4:] = []  # a b c d ignored (no rotation in subset)
                lx, ly = float(e), float(f)
                cx, cy = lx, ly
            elif op == "T*":
                ly -= leading
                cx, cy = lx, ly
            elif op == "TL" and stack:
                leading = float(stack.pop())
            elif op == "Tj" and stack:
                if in_text:
                    emit(stack.pop())
                else:
                    stack.pop()
            elif op == "TJ" and stack:
                if in_text:
                    emit(stack.pop())
                else:
                    stack.pop()
            elif op == "'" and stack:
                ly -= leading
                cx, cy = lx, ly
                if in_text:
                    emit(stack.pop())
                else:
                    stack.pop()
            elif op == "Tf" and len(stack) >= 2:
                stack.pop()  # size
                fname = stack.pop()
                if fonts:
                    fd = fonts.get(str(fname))
                    cur_decode = fd.decode if fd is not None \
                        else decode_pdf_string
            else:
                stack.clear()  # unknown operator: drop its operands
        except (TypeError, ValueError) as exc:
            raise PdfError(f"bad content op {op}: {exc}") from exc
    return runs
