"""Fast-parser equivalence with the stdlib build (engine/htmlx/fastparser.py).

Exact equivalence is enforced on the golden corpus, the curated tolerance
cases, and every EOF-truncated construct; the documented deviation class
(tag-like text inside an *unterminated* quote/comment, e.g. '<a href="x<b>')
is excluded from the strict check and covered by no-crash/determinism fuzz.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from engine.fixtures import gen_pages_table
from engine.htmlx import strip_boilerplate, extract_title
from engine.htmlx.fastparser import parse_html_fast
from engine.htmlx.parser import parse_html as parse_html_stdlib
from engine.mdserialize import serialize


def _out(parser, payload: bytes):
    root = parser(payload)
    title = extract_title(root)
    md, spans = serialize(strip_boilerplate(root))
    return title, md, spans


def test_equivalence_on_golden_corpus():
    pages = gen_pages_table(200, seed=42)
    checked = 0
    for i in range(200):
        p = pages["html"][i].as_py() or b""
        if p[:5] == b"%PDF-" or p[:4] == b"PK\x03\x04":
            continue
        assert _out(parse_html_stdlib, p) == _out(parse_html_fast, p), \
            pages["url"][i].as_py()
        checked += 1
    assert checked > 150


CURATED = [
    "<p>a <b>bold",                        # unclosed inline
    "<p>text</div></p>",                   # stray end tag
    "<p class=big id=x>hi</p>",            # unquoted attrs
    "<p>fish &amp; caf&eacute; &#x27;</p>",  # entities
    "<ul><li>a<li>b</ul>",                 # implicit li close
    "<p>one<p>two",                        # implicit p close
    "<script>if (a<b) x();</script><p>k</p>",  # rawtext with '<'
    "<style>.a{content:'<'}</style><p>k</p>",
    "<br/><img src=x alt='y'/>",           # void + self-closing
    "<table><tr><td>1<td>2<tr><td>3</table>",
    "<A HREF='X'>caps</A>",                # case folding
    "plain text no tags",
    "",
    "</", "<", "<!", "<a", "</ x>", "<p", "&", "&amp",
    "<p>a</", "<b x", "<!doctype", "<!--abc", "<?php", "<a href=",
    "<!-- ok --><p>after comment</p>",
    "<?pi data?><p>after pi</p>",
    "<div><p>nested <em>em <strong>strong</strong></em></p></div>",
]


def test_equivalence_on_curated_cases():
    for case in CURATED:
        assert _out(parse_html_stdlib, case.encode()) == \
            _out(parse_html_fast, case.encode()), repr(case)


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_fast_parser_never_crashes_and_is_deterministic(payload):
    a = _out(parse_html_fast, payload)
    b = _out(parse_html_fast, payload)
    assert a == b
    assert isinstance(a[1], str)


WELLFORMED = st.recursive(
    st.text(alphabet=st.characters(blacklist_characters="<>&\x00",
                                   blacklist_categories=("Cs",)), max_size=20),
    lambda children: st.builds(
        lambda tag, kids: f"<{tag}>" + "".join(kids) + f"</{tag}>",
        st.sampled_from(["p", "b", "i", "em", "div", "span", "li", "ul"]),
        st.lists(children, max_size=3),
    ),
    max_leaves=12,
)


@given(WELLFORMED)
@settings(max_examples=300, deadline=None)
def test_equivalence_on_wellformed_html(html):
    assert _out(parse_html_stdlib, html.encode()) == \
        _out(parse_html_fast, html.encode())
