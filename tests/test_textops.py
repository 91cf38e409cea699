"""Exact-behavior tests for the wrapper ops (SURVEY.md §2.3, §5.2 item 2).

Quirk coverage: chunk-only-if->10k-chars (app/main.py:394), google-docs replace
order (:272-276), '...' preview suffix (:547), empty-string single chunk.
"""

from __future__ import annotations

import pyarrow as pa

from engine import textops as t


# ---- M4 chunking -----------------------------------------------------------

def test_chunk_exact_1000_lines():
    text = "\n".join(f"line{i}" for i in range(1000))
    assert t.chunk_text(text) == [text]


def test_chunk_1001_lines():
    lines = [f"line{i}" for i in range(1001)]
    chunks = t.chunk_text("\n".join(lines))
    assert len(chunks) == 2
    assert chunks[0] == "\n".join(lines[:1000])
    assert chunks[1] == "line1000"


def test_chunk_2500_lines_rejoin_identity():
    text = "\n".join(f"l{i}" for i in range(2500))
    chunks = t.chunk_text(text)
    assert len(chunks) == 3
    assert "\n".join(chunks) == text


def test_chunk_empty_string_yields_one_empty_chunk():
    assert t.chunk_text("") == [""]


def test_chunk_trailing_newline():
    assert t.chunk_text("a\n") == ["a\n"]  # ['a',''] rejoined


def test_chunk_gate_at_10k_chars():
    short = "x" * 10_000  # not > 10000 → single chunk even though 1 line
    long = "y\n" * 5001  # 10002 chars, 5002 lines (trailing '')
    assert t.chunk_text_gated(short) == [short]
    assert len(t.chunk_text_gated(long)) == 6  # ceil(5002/1000)


def test_explode_chunks_batch():
    text = "y\n" * 5001
    batch = pa.table({"url": ["u1", "u2"], "markdown_text": [text, "tiny"]})
    out = t.explode_chunks_batch(batch)
    assert out.num_rows == 7
    assert out["chunk_index"].to_pylist() == [0, 1, 2, 3, 4, 5, 0]
    rejoined = "\n".join(out.filter(pa.compute.equal(out["url"], "u1"))["content"].to_pylist())
    assert rejoined == text
    assert out["char_count"].to_pylist()[-1] == 4


# ---- M5 sanitize -----------------------------------------------------------

def test_sanitize_filename():
    assert t.sanitize_filename("My Report (final).docx") == "My-Report-final"
    assert t.sanitize_filename("--weird  name!!.pdf") == "weird-name"
    assert t.sanitize_filename("a_b-c.pdf") == "a_b-c"


def test_sanitize_batch_matches_scalar():
    names = ["My Report (final).docx", "--weird  name!!.pdf", "a_b-c.pdf", "no-ext"]
    got = t.sanitize_batch(pa.array(names)).to_pylist()
    assert got == [t.sanitize_filename(n) for n in names]


# ---- M6 plain-text strip ---------------------------------------------------

def test_plain_strip_order_and_unanchored_headers():
    md = "# Title\n\nmid # line\n**bold with *inner* stars** and [a link](http://x) plus `code`"
    expect = t.markdown_to_plain(md)
    # header strip is unanchored: 'mid # line' loses '# ' too
    assert "mid line" in expect
    assert expect.startswith("Title")
    assert "[a link]" not in expect and "a link" in expect
    assert "`" not in expect
    # bold before italic: '**bold with *inner* stars**' → 'bold with inner stars'
    assert "bold with inner stars" in expect


def test_plain_strip_batch_matches_scalar():
    cases = [
        "# H\ntext **b** *i* [l](u) `c`",
        "###### deep\n#nospace stays",
        "*solo star pair* and ** empty-ish**",
        "no markdown at all",
        "",
    ]
    got = t.markdown_to_plain_batch(pa.array(cases)).to_pylist()
    assert got == [t.markdown_to_plain(c) for c in cases]


# ---- M7 google-docs chain --------------------------------------------------

def test_gdocs_buggy_order():
    # '# ' replace fires first, so '## x' → '#x' (not 'x'); reproduce exactly
    assert t.markdown_to_gdocs("## x") == "#x"
    assert t.markdown_to_gdocs("# x") == "x"
    assert t.markdown_to_gdocs("**b** *i*") == "b i"


def test_gdocs_batch_matches_scalar():
    cases = ["## x", "# x", "### y ## z # w", "**b** *i*", "a * b"]
    got = t.markdown_to_gdocs_batch(pa.array(cases)).to_pylist()
    assert got == [t.markdown_to_gdocs(c) for c in cases]


def test_format_dispatch():
    assert t.format_content_for_output("# a", "markdown") == "# a"
    assert t.format_content_for_output("# a", "plain_text") == "a"
    assert t.format_content_for_output("# a", "google_docs") == "a"


# ---- M8/M9/M10 -------------------------------------------------------------

def test_preview():
    assert t.content_preview("x" * 500) == "x" * 500
    assert t.content_preview("x" * 501) == "x" * 500 + "..."
    got = t.content_preview_batch(pa.array(["x" * 501, "short"])).to_pylist()
    assert got == ["x" * 500 + "...", "short"]


def test_estimated_time():
    mib = 1024 * 1024
    assert t.estimated_time_minutes(10) == 1
    assert t.estimated_time_minutes(3 * mib + 5) == 3
    got = t.estimated_time_batch(pa.array([10, 3 * mib + 5, 50 * mib])).to_pylist()
    assert got == [1, 3, 50]


def test_extension_for_format():
    assert t.extension_for_format("markdown") == ".md"
    assert t.extension_for_format("plain_text") == ".txt"
    assert t.extension_for_format("google_docs") == ".txt"


def test_normalize_text():
    import unicodedata

    from engine.textops import normalize_text

    # decomposed é (e + combining acute) → composed; control chars dropped;
    # \t \n \r kept
    decomposed = "école"
    assert normalize_text(decomposed) == "école"
    assert normalize_text("a\x07b\x1fc\td\ne") == "abc\td\ne"
    assert normalize_text("plain ascii") == "plain ascii"
    # agrees with unicodedata on mixed content
    s = "café \x00über\x7f"
    assert normalize_text(s) == unicodedata.normalize("NFC", s) \
        .replace("\x00", "").replace("\x7f", "")
