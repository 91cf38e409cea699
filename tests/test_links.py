"""Outlink extraction tests (engine/links.py).

Pins the vectorized Arrow kernel to a scalar ``re.finditer`` reference
(the RE2-twin semantics the DuckDB oracle replays), plus resolution-rule,
dedup, ordinal and parallelism-invariance checks.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

from engine.links import _edges_from_batch, extract_outlinks


def _scalar_reference(url: str, html: str) -> list[tuple[str, int, str]]:
    origin = re.match(r"^(https?://[^/]+)", url).group(1)
    scheme = re.match(r"^(https?):", url).group(1)
    base = re.match(r"^(.*/)", url).group(1)
    seen, out = set(), []
    for i, h in enumerate(re.findall(r'href="([^"]*)"', html), 1):
        if h == "" or h.startswith(("#", "mailto:", "javascript:", "data:")):
            continue
        if h.startswith(("http://", "https://")):
            d = h
        elif h.startswith("//"):
            d = scheme + ":" + h
        elif h.startswith("/"):
            d = origin + h
        else:
            d = base + h
        d = re.sub(r"#.*$", "", d, flags=re.S)
        if d == "" or d in seen:
            continue
        seen.add(d)
        out.append((url, i, d))
    return out


DOCS = [
    ("https://ex1.com/d2/p5",
     '<a href="https://ex3.com/a/b">x</a> <a href="/root/x">y</a> '
     '<a href="rel.html#sec">z</a> <a href="#top">f</a> '
     '<a href="mailto:a@b.c">m</a> <a href="//cdn.ex.com/l.js">s</a> '
     '<a href="https://ex3.com/a/b#frag">dup</a> <a href="">e</a> '
     '<a href="javascript:void(0)">j</a> <a href="data:text/plain,x">d</a>'),
    ("https://h.com/p/q", "no links at all"),
    ("https://h.com/p/q2", '<a href="unterminated'),  # no closing quote
    ("https://h.com/x/y", '<a href="a.html"><a href="a.html">'),  # dup
    ("http://plain.org/a/b/c.html",
     '<p href="weird.html">attr on non-anchor still counts</p> '
     '<a href="../up.html">no dot-normalization (documented)</a>'),
    ("https://q.com/r/", ""),  # empty html
]


def _table() -> pa.Table:
    return pa.table({"url": pa.array([d[0] for d in DOCS]),
                     "html": pa.array([d[1] for d in DOCS])})


def _expected() -> list[tuple[str, int, str]]:
    return [e for u, h in DOCS for e in _scalar_reference(u, h)]


def test_kernel_matches_scalar_reference():
    out = _edges_from_batch(_table(), "url", "html")
    got = list(zip(out["src"].to_pylist(), out["pos"].to_pylist(),
                   out["dst"].to_pylist()))
    assert got == _expected()


def test_resolution_rules():
    out = _edges_from_batch(_table(), "url", "html")
    d = dict(zip(out["pos"].to_pylist()[:4], out["dst"].to_pylist()[:4]))
    assert d[1] == "https://ex3.com/a/b"                  # absolute
    assert d[2] == "https://ex1.com/root/x"               # root-relative
    assert d[3] == "https://ex1.com/d2/rel.html"          # dir-relative+frag
    assert d[6] == "https://cdn.ex.com/l.js"              # protocol-relative
    # pos 4/5 (fragment-only, mailto) dropped; pos 7 dup dropped after
    # fragment strip; unterminated href yields nothing.
    pairs = set(zip(out["src"].to_pylist(), out["pos"].to_pylist()))
    assert ("https://ex1.com/d2/p5", 7) not in pairs
    assert all(s != "https://h.com/p/q2" for s, _ in pairs)
    # scheme of a http (not https) base carries into relative resolution
    assert "http://plain.org/a/b/../up.html" in out["dst"].to_pylist()


def test_empty_batch():
    t = pa.table({"url": pa.array([], pa.string()),
                  "html": pa.array([], pa.string())})
    out = _edges_from_batch(t, "url", "html")
    assert out.num_rows == 0
    assert out.column_names == ["src", "pos", "dst"]


def test_anchor_texts_kernel():
    from engine.links import _anchors_from_batch

    t = pa.table({
        "url": ["https://a.com/p/1", "https://a.com/p/2"],
        "html": [
            '<a href="/x">first</a> mid <a href="y.html" class="c">se co</a>'
            '<a href="#f">frag</a>',
            '<a href="/unclosed"no-gt-here',  # tag never closes -> null text
        ]})
    out = _anchors_from_batch(t, "url", "html")
    got = list(zip(out["src"].to_pylist(), out["pos"].to_pylist(),
                   out["href"].to_pylist(), out["text"].to_pylist()))
    assert got == [
        ("https://a.com/p/1", 1, "/x", "first"),
        ("https://a.com/p/1", 2, "y.html", "se co"),
        ("https://a.com/p/1", 3, "#f", "frag"),
        ("https://a.com/p/2", 1, "/unclosed", None),
    ]


def test_anchor_pos_aligns_with_outlinks():
    from engine.links import _anchors_from_batch

    t = _table()
    anchors = _anchors_from_batch(t, "url", "html")
    edges = _edges_from_batch(t, "url", "html")
    # every edge's (src, pos) appears in the anchor rows with the raw href
    amap = {(s, p): h for s, p, h in zip(
        anchors["src"].to_pylist(), anchors["pos"].to_pylist(),
        anchors["href"].to_pylist())}
    for s, p, d in zip(edges["src"].to_pylist(), edges["pos"].to_pylist(),
                       edges["dst"].to_pylist()):
        assert (s, p) in amap
        assert d.endswith(amap[(s, p)].split("#")[0].lstrip("/")) or \
            amap[(s, p)].startswith(("http://", "https://", "//", "/"))


def test_dataset_parallelism_invariance(ray_session):
    many = DOCS * 40
    t = pa.table({"url": pa.array([d[0] for d in many]),
                  "html": pa.array([d[1] for d in many])})
    base = None
    for nparts in (1, 7):
        ds = rd.from_arrow(t).repartition(nparts)
        got = sorted(
            extract_outlinks(ds).to_pandas().itertuples(index=False))
        if base is None:
            base = got
        else:
            assert got == base
    assert len(base) == 40 * len(_expected())


# --- image-text pair mining --------------------------------------------------

def _img_table():
    import pyarrow as pa

    return pa.table({
        "url": ["https://ex1.com/d/p1", "https://ex2.com/p2",
                "https://ex3.com/x"],
        "html": [
            '<html><img src="/a.png" alt="hero image"><p>x</p>'
            '<img class="b" src="b.jpg">'
            '<img src="https://cdn.ex/c.gif" alt="c!">'
            '<img alt="no src"><img src="">'
            '<img src="data:image/png;base64,xx" alt="inline">'
            '<img src="//cdn2.ex/d.png" alt="proto">',
            '<img src="e.png" alt="tag never closes',
            '<html>no images</html>',
        ]})


def test_image_refs_kernel():
    from engine.links import _imgs_from_batch

    out = _imgs_from_batch(_img_table(), "url", "html").to_pylist()
    assert [(r["pos"], r["img"], r["alt"]) for r in out
            if r["src"] == "https://ex1.com/d/p1"] == [
        (1, "https://ex1.com/a.png", "hero image"),   # root-relative
        (2, "https://ex1.com/d/b.jpg", None),         # dir-rel, no alt
        (3, "https://cdn.ex/c.gif", "c!"),            # absolute
        (4, "https://cdn2.ex/d.png", "proto"),        # protocol-relative
    ]
    # src-less / empty / data: dropped; unterminated tag dropped
    assert all(r["src"] == "https://ex1.com/d/p1" for r in out)


def test_image_refs_dataset_parallelism(ray_session):
    import ray.data as rd

    from engine.links import extract_image_refs

    rows = [{"url": f"https://h{i % 3}.ex/p/{i}",
             "html": f'<img src="/i{i}.png" alt="a{i}">' * (i % 4)}
            for i in range(60)]
    a = (extract_image_refs(rd.from_items(rows).repartition(1))
         .to_pandas().sort_values(["src", "pos"]).reset_index(drop=True))
    b = (extract_image_refs(rd.from_items(rows).repartition(11))
         .to_pandas().sort_values(["src", "pos"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a.groupby("src")["pos"].apply(
        lambda s: list(s) == list(range(1, len(s) + 1)))).all()


# --- head metadata -----------------------------------------------------------

def test_head_meta_kernel():
    import pyarrow as pa

    from engine.links import _head_meta_from_batch

    t = pa.table({
        "url": ["https://ex.com/a/b", "https://y.ex/p"],
        "html": [
            '<html><head><meta property="og:title" content="My Page">'
            '<meta property="og:image" content="/img/hero.jpg">'
            '<meta name="description" content="A desc, with commas">'
            '<link rel="canonical" href="page-canon"></head></html>',
            '<html><head><title>nothing structured</title></head></html>',
        ]})
    out = _head_meta_from_batch(t, "url", "html").to_pylist()
    assert out[0] == {"url": "https://ex.com/a/b", "og_title": "My Page",
                      "og_image": "https://ex.com/img/hero.jpg",
                      "description": "A desc, with commas",
                      "canonical": "https://ex.com/a/page-canon"}
    assert out[1] == {"url": "https://y.ex/p", "og_title": None,
                      "og_image": None, "description": None,
                      "canonical": None}


def test_head_meta_first_match_wins_and_absolute_canonical():
    import pyarrow as pa

    from engine.links import _head_meta_from_batch

    t = pa.table({
        "url": ["https://ex.com/x"],
        "html": ['<meta property="og:title" content="first">'
                 '<meta property="og:title" content="second">'
                 '<link rel="canonical" href="https://other.ex/c#frag">'],
    })
    row = _head_meta_from_batch(t, "url", "html").to_pylist()[0]
    assert row["og_title"] == "first"
    assert row["canonical"] == "https://other.ex/c"  # fragment stripped


def test_robots_meta_kernel():
    import pyarrow as pa

    from engine.links import _robots_from_batch

    t = pa.table({
        "url": [f"u{i}" for i in range(7)],
        "html": [
            '<meta name="robots" content="index, follow">',
            '<meta name="robots" content="noindex">',
            '<meta name="robots" content="nofollow,noarchive">',
            '<meta name="robots" content="NOINDEX, NOFOLLOW">',
            '<meta name="robots" content="none">',
            '<html>no robots tag</html>',
            # substring must NOT match: 'nonoindexy' is not a directive
            '<meta name="robots" content="nonoindexy">',
        ]})
    out = _robots_from_batch(t, "url", "html").to_pylist()
    flags = [(r["noindex"], r["nofollow"]) for r in out]
    assert flags == [(False, False), (True, False), (False, True),
                     (True, True), (True, True), (False, False),
                     (False, False)]


def test_jsonld_kernel():
    import pyarrow as pa

    from engine.links import _jsonld_from_batch

    t = pa.table({
        "url": [f"u{i}" for i in range(6)],
        "html": [
            '<script type="application/ld+json">'
            '{"@type": "Article", "name": "My Story"}</script>',
            '<script type="application/ld+json">{"@type": "Product"}'
            '</script>',
            '<script type="application/ld+json">{broken</script>',
            '<html>none</html>',
            '<script type="application/ld+json">[1,2]</script>',  # array root
            '<script type="application/ld+json">'
            '{"@type": 7, "name": ["x"]}</script>',  # non-string fields
        ]})
    out = _jsonld_from_batch(t, "url", "html").to_pylist()
    got = [(r["jsonld_type"], r["jsonld_name"]) for r in out]
    assert got == [("Article", "My Story"), ("Product", None),
                   (None, None), (None, None), (None, None), (None, None)]


# ---------------------------------------------------------------------------
# published-date extraction (engine.links.extract_pub_dates)
# ---------------------------------------------------------------------------

def _pub(url: str, html: str):
    import pyarrow as pa

    from engine.links import _pub_dates_from_batch

    t = pa.table({"url": [url], "html": [html]})
    r = _pub_dates_from_batch(t, "url", "html").to_pylist()[0]
    return r["pub_date"], r["pub_source"]


def test_pub_date_priority_meta_over_time():
    assert _pub(
        "https://a.ex/p",
        '<meta property="article:published_time" content="2020-01-02T08:00Z">'
        '<time datetime="2019-12-31">x</time>') == ("2020-01-02", "meta")


def test_pub_date_time_beats_jsonld_and_url():
    assert _pub(
        "https://a.ex/2022/02/09/y",
        '<time datetime="2019-12-31">x</time>'
        '<script type="application/ld+json">{"datePublished": "2018-06-07"}'
        "</script>") == ("2019-12-31", "time")


def test_pub_date_invalid_candidates_fall_through():
    # implausible month/day and non-date strings are rejected per signal
    assert _pub(
        "https://a.ex/2021/05/03/x",
        '<meta property="article:published_time" content="2020-13-45">'
        '<time datetime="yesterday">x</time>') == ("2021-05-03", "url")


def test_pub_date_url_day_32_not_matched():
    assert _pub("https://a.ex/2021/05/32/x", "<p>n</p>") == (None, None)


def test_pub_date_no_signal_is_null():
    assert _pub("https://a.ex/p", "<p>n</p>") == (None, None)


def test_extract_sitemap(ray_session):
    import ray.data as rd

    from engine.links import extract_sitemap

    xml1 = ('<?xml version="1.0"?><urlset>\n'
            '<url><loc> https://a/1 </loc>'
            '<lastmod>2024-01-02</lastmod></url>\n'
            '<url><loc>https://a/2</loc></url>\n'
            '<url><lastmod>2024-01-03</lastmod></url>\n'   # loc-less: drop
            '<url><loc>https://a/3</loc><lastmod></lastmod></url>\n'
            '</urlset>')
    xml2 = ('<sitemapindex><sitemap><loc>https://b/s1.xml</loc>'
            '<lastmod>2023-12-31</lastmod></sitemap>\n'
            '<sitemap><loc>https://b/s2.xml</loc></sitemap></sitemapindex>')
    ds = rd.from_arrow(pa.table({
        "url": ["https://a/sm.xml", "https://b/sm.xml", "https://c/x"],
        "xml": [xml1, xml2, "no entries"],
    }))
    out = extract_sitemap(ds).to_pandas()
    rows = {(r.src, r.kind, r.pos): (r.loc, r.lastmod)
            for r in out.itertuples()}
    assert len(rows) == 5
    assert rows[("https://a/sm.xml", "url", 1)] == \
        ("https://a/1", "2024-01-02")
    assert rows[("https://a/sm.xml", "url", 2)] == ("https://a/2", None)
    # loc-less entry dropped; ordinal counts kept entries; empty lastmod
    # normalizes to null
    assert rows[("https://a/sm.xml", "url", 3)] == ("https://a/3", None)
    assert rows[("https://b/sm.xml", "sitemap", 1)] == \
        ("https://b/s1.xml", "2023-12-31")
    assert rows[("https://b/sm.xml", "sitemap", 2)] == \
        ("https://b/s2.xml", None)


def test_code_blocks_extraction(ray_session):
    import ray.data as rd

    from engine.links import extract_code_blocks

    pages = pa.table({"url": ["u1", "u2", "u3", "u4"], "html": [
        '<p>x</p><pre><code class="language-py">a = 1&lt;2\nb</code></pre>'
        "<pre>plain\ntext</pre>",
        'no blocks here <prefix>not a tag</prefix>',
        '<pre class="lang-cpp highlight">int x;</pre><pre>never closes',
        None,
    ]})
    out = (extract_code_blocks(rd.from_arrow(pages))
           .to_pandas().sort_values(["url", "pos"]).reset_index(drop=True))
    assert list(out["url"]) == ["u1", "u1", "u3"]
    assert list(out["pos"]) == [1, 2, 1]
    assert list(out["text"]) == ["a = 1<2\nb", "plain\ntext", "int x;"]
    import pandas as pd

    assert out["lang"][0] == "py" and pd.isna(out["lang"][1])
    assert out["lang"][2] == "cpp"  # class on the pre tag itself
    assert list(out["n_lines"]) == [2, 2, 1]
    assert list(out["n_chars"]) == [9, 10, 6]


def test_code_blocks_entity_order_and_parallelism(ray_session):
    import ray.data as rd

    from engine.links import extract_code_blocks

    # &amp;lt; must decode to the literal '&lt;', not '<'
    pages = pa.table({"url": [f"u{i}" for i in range(30)], "html": [
        f"<pre>v{i} &amp;lt; &quot;q&#39;</pre>" for i in range(30)]})
    one = (extract_code_blocks(rd.from_arrow(pages))
           .to_pandas().sort_values("url").reset_index(drop=True))
    par = (extract_code_blocks(rd.from_arrow(pages).repartition(7))
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert one.equals(par)
    assert one["text"][0] == "v0 &lt; \"q'"
