"""HTML path unit tests: parser tolerance (H1), boilerplate strip (H2),
serializer spec (H3), title (H4). SURVEY.md §2.2."""

from __future__ import annotations

from engine.htmlx import parse_html, strip_boilerplate, extract_title
from engine.htmlx.dom import Node
from engine.mdserialize import serialize


def md_of(html: str) -> str:
    root = parse_html(html.encode())
    return serialize(strip_boilerplate(root))[0]


# ---- parser tolerance ------------------------------------------------------

def test_unclosed_tags_autoclose():
    assert md_of("<p>a <b>bold") == "a **bold**"


def test_stray_end_tag_ignored():
    assert md_of("<p>text</div></p>") == "text"


def test_unquoted_attrs():
    assert md_of("<p class=big id=x>hi</p>") == "hi"


def test_entities_decoded():
    assert md_of("<p>fish &amp; chips caf&eacute; &#x27;q&#x27;</p>") == "fish & chips café 'q'"


def test_binary_garbage_no_crash():
    out = md_of("\x00￾ garbage")
    assert isinstance(out, str)


def test_implicit_p_close():
    assert md_of("<p>one<p>two") == "one\n\ntwo"


def test_li_implicit_close():
    assert md_of("<ul><li>a<li>b</ul>") == "- a\n- b"


# ---- boilerplate strip -----------------------------------------------------

def test_script_style_stripped():
    assert md_of("<body><script>x=1</script><style>.a{}</style><p>keep</p></body>") == "keep"


def test_nav_footer_aside_stripped():
    html = "<body><nav><a href='/'>H</a></nav><p>keep</p><aside>side</aside><footer>foot</footer></body>"
    assert md_of(html) == "keep"


def test_class_id_boilerplate_stripped():
    html = '<body><div class="sidebar-ads"><a href="/b">Buy</a></div><p>keep</p></body>'
    assert md_of(html) == "keep"
    html2 = '<body><div id="cookie-banner">cookies</div><p>keep</p></body>'
    assert md_of(html2) == "keep"


def test_maybe_candidate_kept():
    # class matches 'nav' but also 'content' → kept
    html = '<body><div class="nav-content"><p>keep me</p></div></body>'
    assert "keep me" in md_of(html)


def test_link_farm_pruned():
    html = ('<body><ul><li><a href="/1">one</a></li><li><a href="/2">two</a></li>'
            '<li><a href="/3">three</a></li></ul><p>real paragraph of content here</p></body>')
    out = md_of(html)
    assert out == "real paragraph of content here"


def test_content_with_some_links_kept():
    html = ('<body><p>a long paragraph of real text that happens to contain '
            '<a href="/x">one link</a> among many many words of content</p></body>')
    assert "one link" in md_of(html)


def test_article_becomes_content_root():
    html = "<body><div><p>outside</p></div><article><p>inside</p></article></body>"
    assert md_of(html) == "inside"


def test_all_boilerplate_page_empty():
    html = "<body><nav><a href='/'>x</a></nav><footer>c</footer></body>"
    assert md_of(html) == ""


def test_empty_body():
    assert md_of("<html><body></body></html>") == ""


# ---- serializer spec -------------------------------------------------------

def test_heading_levels():
    assert md_of("<h1>a</h1><h6>b</h6>") == "# a\n\n###### b"


def test_inline_markers():
    assert md_of("<p><strong>b</strong> <em>i</em> <code>c</code></p>") == "**b** *i* `c`"


def test_edge_space_moved_outside_markers():
    assert md_of("<p>a<b> b</b>c</p>") == "a **b**c"


def test_link_and_image():
    assert md_of('<p><a href="http://u">t</a> <img src="s.png" alt="alt"></p>') == "[t](http://u) ![alt](s.png)"
    assert md_of("<p><a>no href</a></p>") == "no href"


def test_nested_list_indentation():
    html = "<ul><li>a<ul><li>b</li></ul></li><li>c</li></ul>"
    assert md_of(html) == "- a\n  - b\n- c"


def test_ordered_list_numbering():
    assert md_of("<ol><li>x</li><li>y</li></ol>") == "1. x\n2. y"


def test_table_pipes_escaped():
    html = "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>p|q</td></tr></table>"
    assert md_of(html) == "| A | B |\n| --- | --- |\n| 1 | p\\|q |"


def test_pre_preserves_whitespace():
    assert md_of("<pre>a\n  b</pre>") == "```\na\n  b\n```"


def test_blockquote_prefix():
    assert md_of("<blockquote><p>q1</p><p>q2</p></blockquote>") == "> q1\n>\n> q2"


def test_br_newline():
    assert md_of("<p>a<br>b</p>") == "a\nb"


def test_whitespace_collapse():
    assert md_of("<p>a\n   b\t\tc</p>") == "a b c"


def test_spans_cover_blocks_byte_offsets():
    html = "<h1>Tïtle</h1><p>para</p>"
    root = parse_html(html.encode())
    md, spans = serialize(strip_boilerplate(root))
    data = md.encode("utf-8")
    assert [s["kind"] for s in spans] == ["heading", "para"]
    for s in spans:
        seg = data[s["start"]:s["end"]].decode("utf-8")
        assert seg  # decodable at byte offsets
    assert data[spans[0]["start"]:spans[0]["end"]] == "# Tïtle".encode()
    # non-overlap & separation by exactly 2 bytes
    assert spans[1]["start"] == spans[0]["end"] + 2


# ---- title -----------------------------------------------------------------

def test_title_from_title_tag():
    root = parse_html(b"<head><title> My  Page </title></head><body><h1>H</h1></body>")
    assert extract_title(root) == "My Page"


def test_title_falls_back_to_h1():
    root = parse_html(b"<body><h1>The H1</h1></body>")
    assert extract_title(root) == "The H1"


def test_title_empty():
    assert extract_title(parse_html(b"<body><p>x</p></body>")) == ""
