"""PDF path: object parse (P1), layout ordering (P2), text decode (P3).

Stdlib-only rebuild of what the reference gets from pdfminer.six via
MarkItDown (SURVEY.md §2.2 P1-P3). Supports the PDF subset the fixture
generator emits (FIXTURES.md F1b): classic xref files, direct /Length,
uncompressed and /FlateDecode content streams, Type1/WinAnsi text, operators
BT/ET, Tf, Td, TD, Tm, T*, TL, Tj, TJ, '.

Separator policy (frozen, pdfminer-style): '\\n' between lines, '\\n\\n'
between blocks, '\\x0c' between pages.
"""

from engine.pdfx.extract import (extract_pdf, extract_pdf_doc,
                                 extract_pdf_text, PdfError)

__all__ = ["extract_pdf", "extract_pdf_doc", "extract_pdf_text", "PdfError"]
