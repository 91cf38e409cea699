"""DOCX path (D1): stdlib zipfile + xml.etree over word/document.xml.

Rebuilds what the reference gets from mammoth via MarkItDown (SURVEY.md §2.2
D1): Heading N styles → h1-h6, bold/italic runs, numbered/bulleted lists with
levels, tables — emitted as the same Node tree the HTML path produces, so the
markdown serializer (H3) is shared.
"""

from engine.docxx.extract import (docx_core_properties, docx_document,
                                  docx_to_tree, DocxError)

__all__ = ["docx_core_properties", "docx_document", "docx_to_tree",
           "DocxError"]
