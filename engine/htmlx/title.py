"""H4 — title extraction: <title> first, else first <h1> (SURVEY.md §2.2 H4).

Mirrors the intended document_metadata.title of the reference's design docs
(.trae/documents/document_converter_api_architecture.md §6.2).
"""

from __future__ import annotations

import re

from engine.htmlx.dom import Node

_WS = re.compile(r"\s+")


def _collapsed_text(node: Node) -> str:
    return _WS.sub(" ", "".join(node.iter_text())).strip()


def extract_title(root: Node) -> str:
    for tag in ("title", "h1"):
        found = root.find_first(tag)
        if found is not None:
            text = _collapsed_text(found)
            if text:
                return text
    return ""
