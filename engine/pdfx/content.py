"""P2/P3 — content-stream interpretation: positioned text runs (SURVEY.md §2.2).

Interprets the text-positioning subset: BT/ET, Tf, TL, Td, TD, Tm, T*, Tj,
TJ, '. Positions track the translation components only (the fixture subset
never rotates/scales text — FIXTURES.md F1b). Strings decode as WinAnsi
(cp1252), the encoding our generator declares (P3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from engine.pdfx.objects import PdfError, _Lexer


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


def _tokens(data: bytes):
    """Yield ('val', value) and ('op', name) tokens from a content stream."""
    lex = _Lexer(data)
    n = len(data)
    while True:
        lex.skip_ws()
        if lex.pos >= n:
            return
        c = data[lex.pos : lex.pos + 1]
        if c in b"([</+-.0123456789":
            yield ("val", lex.parse_value())
        else:
            m = _OP_RE.match(data, lex.pos)
            if not m:
                # unknown byte: skip it (tolerant per-row behavior)
                lex.pos += 1
                continue
            lex.pos = m.end()
            yield ("op", m.group(0).decode("latin-1"))


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
