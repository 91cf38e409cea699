"""D1 — DOCX → Node tree (SURVEY.md §2.2 D1).

Parses ``word/document.xml`` from the zip container with xml.etree:
- ``w:p`` paragraphs; ``w:pStyle w:val="HeadingN"`` → <hN>; ``w:numPr`` →
  list items at ``w:ilvl`` depth (bullet vs ordered decided by ``w:numId``
  parity — our generator uses numId 1=bullet, 2=ordered; real numbering.xml
  resolution is out of the fixture subset and documented as such);
- ``w:r`` runs with ``w:b``/``w:i`` → <strong>/<em>;
- ``w:tbl``/``w:tr``/``w:tc`` → <table>/<tr>/<td>;
- ``w:br`` → <br>, ``w:tab`` → a space.

The output tree reuses the HTML serializer (engine.mdserialize) unchanged.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from engine.htmlx.dom import Node

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
WP = "{http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing}"
_CP = "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
_DC = "{http://purl.org/dc/elements/1.1/}"
_HEADING_RE = re.compile(r"^(?:Heading|heading)\s*([1-6])$")


class DocxError(ValueError):
    pass


def _run_to_nodes(run: ET.Element) -> list[Node | str]:
    rpr = run.find(f"{W}rPr")
    bold = italic = False
    if rpr is not None:
        b = rpr.find(f"{W}b")
        i = rpr.find(f"{W}i")
        bold = b is not None and b.get(f"{W}val", "true") not in ("false", "0")
        italic = i is not None and i.get(f"{W}val", "true") not in ("false", "0")
    parts: list[Node | str] = []
    for el in run:
        tag = el.tag
        if tag == f"{W}t":
            parts.append(el.text or "")
        elif tag == f"{W}br":
            parts.append(Node("br"))
        elif tag == f"{W}tab":
            parts.append(" ")
        elif tag == f"{W}drawing":
            # embedded image → alt text (what mammoth/MarkItDown surfaces,
            # requirements.txt:6 via app/main.py:383): wp:docPr descr, else
            # its name; binary payloads are not decoded (no media libs)
            for docpr in el.iter(f"{WP}docPr"):
                alt = docpr.get("descr") or docpr.get("name") or ""
                if alt:
                    img = Node("img", {"alt": alt})
                    parts.append(img)
                break
    if not parts:
        return []
    if bold or italic:
        inner = parts
        if italic:
            em = Node("em")
            em.children = inner
            inner = [em]
        if bold:
            strong = Node("strong")
            strong.children = inner
            inner = [strong]
        return inner
    return parts


def _para_inline(p: ET.Element) -> list[Node | str]:
    out: list[Node | str] = []
    for child in p:
        if child.tag == f"{W}r":
            out.extend(_run_to_nodes(child))
        elif child.tag == f"{W}hyperlink":
            a = Node("a")  # relationship targets not resolved in the subset
            for run in child.findall(f"{W}r"):
                a.children.extend(_run_to_nodes(run))
            out.append(a)
    return out


def _para_style(p: ET.Element) -> tuple[str | None, int | None, int | None]:
    """Returns (heading_tag, list_ilvl, list_numid)."""
    ppr = p.find(f"{W}pPr")
    if ppr is None:
        return None, None, None
    heading = None
    style = ppr.find(f"{W}pStyle")
    if style is not None:
        m = _HEADING_RE.match(style.get(f"{W}val", ""))
        if m:
            heading = f"h{m.group(1)}"
    numpr = ppr.find(f"{W}numPr")
    ilvl = numid = None
    if numpr is not None:
        lvl = numpr.find(f"{W}ilvl")
        nid = numpr.find(f"{W}numId")
        ilvl = int(lvl.get(f"{W}val", "0")) if lvl is not None else 0
        numid = int(nid.get(f"{W}val", "1")) if nid is not None else 1
    return heading, ilvl, numid


def _close_lists(stack: list[tuple[Node, int]], to_level: int) -> None:
    while stack and stack[-1][1] >= to_level:
        stack.pop()


# Zip-bomb / entity-expansion guards: a tiny payload can declare a multi-GB
# document.xml (checked against ZipInfo.file_size BEFORE reading), and
# xml.etree is documented vulnerable to billion-laughs DTD expansion — OOXML
# never legitimately carries a DTD, so any <!DOCTYPE is rejected outright.
from engine.schema import MAX_FILE_SIZE as _MAX_FILE_SIZE

MAX_DOCUMENT_XML = 4 * _MAX_FILE_SIZE


def _read_member_guarded(zf: zipfile.ZipFile, name: str) -> bytes:
    """Read one zip member with the size-declaration + actual-size guards;
    raises DocxError on violation, KeyError when absent."""
    info = zf.getinfo(name)
    if info.file_size > MAX_DOCUMENT_XML:
        raise DocxError(
            f"{name} declares {info.file_size} bytes (cap {MAX_DOCUMENT_XML})")
    with zf.open(info) as f:
        xml_bytes = f.read(MAX_DOCUMENT_XML + 1)
    if len(xml_bytes) > MAX_DOCUMENT_XML:  # lying zip header
        raise DocxError(f"{name} exceeds size cap")
    if b"<!DOCTYPE" in xml_bytes[:4096]:
        raise DocxError(f"{name} carries a DTD (rejected)")
    return xml_bytes


def _props_from_xml(xml_bytes: bytes) -> dict:
    out = {"title": "", "author": "", "modified_by": ""}
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return out
    title = root.find(f"{_DC}title")
    creator = root.find(f"{_DC}creator")
    modby = root.find(f"{_CP}lastModifiedBy")
    out["title"] = (title.text or "") if title is not None else ""
    out["author"] = (creator.text or "") if creator is not None else ""
    out["modified_by"] = (modby.text or "") if modby is not None else ""
    return out


def docx_core_properties(data: bytes) -> dict:
    """docProps/core.xml → {'title', 'author', 'modified_by'} (the
    document_metadata surface of the reference architecture doc §6.2; absent
    file or fields → empty strings, never an error)."""
    empty = {"title": "", "author": "", "modified_by": ""}
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml_bytes = _read_member_guarded(zf, "docProps/core.xml")
    except (zipfile.BadZipFile, KeyError, OSError, DocxError):
        return empty
    return _props_from_xml(xml_bytes)


def docx_document(data: bytes) -> tuple[Node, dict]:
    """One-pass DOCX read: (body tree, core properties) from a single zip
    open — the hot extraction kernel must not parse the container twice.
    Raises DocxError when document.xml is unreadable; missing/bad core.xml
    degrades to empty properties."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            doc_xml = _read_member_guarded(zf, "word/document.xml")
            try:
                core_xml = _read_member_guarded(zf, "docProps/core.xml")
            except (KeyError, DocxError):
                core_xml = None
    except (zipfile.BadZipFile, KeyError, OSError) as exc:
        raise DocxError(f"not a DOCX container: {exc}") from exc
    props = _props_from_xml(core_xml) if core_xml is not None else {
        "title": "", "author": "", "modified_by": ""}
    return _tree_from_xml(doc_xml), props


def docx_to_tree(data: bytes) -> Node:
    """DOCX bytes → Node tree rooted at <body>. Raises DocxError when the zip
    or document.xml is unreadable (per-row failed status for the caller)."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml_bytes = _read_member_guarded(zf, "word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError) as exc:
        raise DocxError(f"not a DOCX container: {exc}") from exc
    return _tree_from_xml(xml_bytes)


def _tree_from_xml(xml_bytes: bytes) -> Node:
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        raise DocxError(f"bad document.xml: {exc}") from exc

    body_el = root.find(f"{W}body")
    body = Node("body")
    if body_el is None:
        return body

    # open list containers: [(ul/ol Node, ilvl)]
    list_stack: list[tuple[Node, int]] = []

    def append_block(node: Node) -> None:
        list_stack.clear()
        body.children.append(node)

    for el in body_el:
        if el.tag == f"{W}p":
            heading, ilvl, numid = _para_style(el)
            inline = _para_inline(el)
            if heading:
                h = Node(heading)
                h.children = inline
                append_block(h)
            elif ilvl is not None:
                tag = "ol" if (numid is not None and numid % 2 == 0) else "ul"
                # find/open the list container at this level
                while list_stack and list_stack[-1][1] > ilvl:
                    list_stack.pop()
                if not list_stack or list_stack[-1][1] < ilvl or list_stack[-1][0].tag != tag:
                    new_list = Node(tag)
                    if list_stack and list_stack[-1][1] < ilvl:
                        # nest under the last <li> of the parent list
                        parent_list = list_stack[-1][0]
                        if parent_list.children and isinstance(parent_list.children[-1], Node):
                            parent_list.children[-1].children.append(new_list)
                        else:
                            body.children.append(new_list)
                    else:
                        if list_stack and list_stack[-1][0].tag != tag and list_stack[-1][1] == ilvl:
                            list_stack.pop()
                        body.children.append(new_list)
                    list_stack.append((new_list, ilvl))
                li = Node("li")
                li.children = inline
                list_stack[-1][0].children.append(li)
            else:
                p = Node("p")
                p.children = inline
                append_block(p)
        elif el.tag == f"{W}tbl":
            table = Node("table")
            for tr_el in el.findall(f"{W}tr"):
                tr = Node("tr")
                for tc_el in tr_el.findall(f"{W}tc"):
                    td = Node("td")
                    for p_el in tc_el.findall(f"{W}p"):
                        td.children.extend(_para_inline(p_el))
                        td.children.append(" ")
                    if td.children and td.children[-1] == " ":
                        td.children.pop()
                    tr.children.append(td)
                table.children.append(tr)
            append_block(table)
    return body
