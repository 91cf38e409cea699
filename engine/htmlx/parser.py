"""H1 — tolerant HTML → Node tree on stdlib ``html.parser.HTMLParser``.

Replaces the BeautifulSoup parse MarkItDown performs for the reference
(SURVEY.md §2.2 H1). Tolerates malformed markup: unclosed tags auto-close,
stray end tags are ignored, unquoted attributes are handled by the stdlib
tokenizer, character/entity references are decoded (convert_charrefs=True).
"""

from __future__ import annotations

from html.parser import HTMLParser

from engine.htmlx.charset import decode_html
from engine.htmlx.dom import Node

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Tags whose start implicitly closes an open <p> (HTML5 §8.1.2.4 subset)
_P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset figure footer form "
    "h1 h2 h3 h4 h5 h6 header hr main nav ol p pre section table ul".split()
)

# start tag -> (tags it implicitly closes, scope barrier tags)
_IMPLICIT_CLOSE = {
    "li": (frozenset({"li"}), frozenset({"ul", "ol"})),
    "td": (frozenset({"td", "th"}), frozenset({"tr", "table"})),
    "th": (frozenset({"td", "th"}), frozenset({"tr", "table"})),
    "tr": (frozenset({"tr"}), frozenset({"table", "thead", "tbody", "tfoot"})),
    "option": (frozenset({"option"}), frozenset({"select"})),
    "dt": (frozenset({"dt", "dd"}), frozenset({"dl"})),
    "dd": (frozenset({"dt", "dd"}), frozenset({"dl"})),
}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    # -- helpers ------------------------------------------------------------
    def _close_implicit(self, closers: frozenset, barriers: frozenset) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            tag = self.stack[i].tag
            if tag in barriers:
                return
            if tag in closers:
                del self.stack[i:]
                return

    # -- HTMLParser callbacks ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _P_CLOSERS:
            self._close_implicit(frozenset({"p"}), frozenset())
        rule = _IMPLICIT_CLOSE.get(tag)
        if rule:
            self._close_implicit(*rule)
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments, PIs, declarations: dropped
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse_html(payload: bytes | str) -> Node:
    """Parse an HTML payload into a Node tree rooted at '#root'.

    Bytes are decoded per the sniffed charset (BOM → meta prescan → UTF-8,
    engine/htmlx/charset.py) with replacement errors — deterministic for any
    input including binary garbage (FIXTURES.md F1d requires no crash).
    """
    if isinstance(payload, (bytes, bytearray, memoryview)):
        payload = decode_html(payload)
    # HTML spec: NUL in the input stream → U+FFFD. Also keeps NUL from
    # colliding with the serializer's <br> placeholder byte.
    if "\x00" in payload:
        payload = payload.replace("\x00", "�")
    builder = _TreeBuilder()
    try:
        builder.feed(payload)
        builder.close()
    except Exception:
        # html.parser is highly tolerant already; any residual failure leaves
        # the partial tree, which is the tolerant behavior we want per-row.
        pass
    return builder.root
