"""Exact wrapper-op semantics from the reference (SURVEY.md §2.3, M4-M10).

Each scalar function reproduces the reference byte-for-byte (citations are to
``/root/reference/app/main.py``); each ``*_batch`` companion is the vectorized
form used inside ``map_batches`` over Arrow batches.

Quirks preserved on purpose:

- ``chunk_text`` of ``""`` yields one empty chunk (``''.split('\\n') == ['']``).
- Chunking only happens when the markdown exceeds 10 000 chars
  (``app/main.py:394``); below that the whole text is one chunk.
- The plain-text header strip regex is **unanchored** — ``#{1,6}\\s+`` fires
  mid-line too (``app/main.py:264`` has no ``^`` and no MULTILINE flag).
- The google-docs chain runs ``'# '`` replace before ``'## '`` so ``'## x'``
  becomes ``'#x'`` (``app/main.py:272-274``) — buggy, reproduced exactly.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc

from engine.schema import CHUNK_MIN_CHARS, CHUNK_SIZE, PREVIEW_CHARS

# ---------------------------------------------------------------------------
# M4 — chunk_text (app/main.py:243-250) + the >10k gate (app/main.py:394)
# ---------------------------------------------------------------------------


def chunk_text(text: str, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """Split every ``chunk_size`` lines; rejoining with '\\n' restores the text."""
    lines = text.split("\n")
    return ["\n".join(lines[i : i + chunk_size]) for i in range(0, len(lines), chunk_size)]


def chunk_text_gated(text: str, chunk_size: int = CHUNK_SIZE) -> list[str]:
    """The reference only chunks when len(text) > 10 000 chars (app/main.py:394)."""
    if len(text) > CHUNK_MIN_CHARS:
        return chunk_text(text, chunk_size)
    return [text]


def explode_chunks_batch(batch: pa.Table, text_col: str = "markdown_text",
                         key_col: str = "url", gated: bool = True,
                         chunk_size: int = CHUNK_SIZE) -> pa.Table:
    """pages-of-text batch → chunk rows (url, chunk_index, content, char_count)."""
    keys: list = []
    idxs: list[int] = []
    contents: list[str] = []
    fn = chunk_text_gated if gated else chunk_text
    key_arr = batch[key_col].to_pylist()
    txt_arr = batch[text_col].to_pylist()
    for key, text in zip(key_arr, txt_arr):
        if text is None:
            text = ""
        for i, chunk in enumerate(fn(text, chunk_size)):
            keys.append(key)
            idxs.append(i)
            contents.append(chunk)
    return pa.table(
        {
            key_col: pa.array(keys, type=batch.schema.field(key_col).type),
            "chunk_index": pa.array(idxs, type=pa.int32()),
            "content": pa.array(contents, type=pa.string()),
            "char_count": pa.array([len(c) for c in contents], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# M5 — sanitize_filename (app/main.py:252-258)
# ---------------------------------------------------------------------------

_SANITIZE_UNSAFE = re.compile(r"[^\w\s-]")
_SANITIZE_DASHES = re.compile(r"[-\s]+")


def sanitize_filename(filename: str) -> str:
    name = os.path.splitext(filename)[0]
    name = _SANITIZE_UNSAFE.sub("", name)
    name = _SANITIZE_DASHES.sub("-", name)
    return name.strip("-")


def sanitize_batch(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized sanitize via pyarrow regex kernels (ASCII-equivalent of \\w:
    callers feeding non-ASCII should use the scalar form; fixtures are ASCII)."""
    out = pc.replace_substring_regex(arr, pattern=r"\.[^.]*$", replacement="")
    out = pc.replace_substring_regex(out, pattern=r"[^\w\s-]", replacement="")
    out = pc.replace_substring_regex(out, pattern=r"[-\s]+", replacement="-")
    out = pc.utf8_trim(out, characters="-")
    return out


# ---------------------------------------------------------------------------
# M6 — plain-text strip chain (app/main.py:262-269) — exact regex order
# ---------------------------------------------------------------------------

_PLAIN_CHAIN: list[tuple[re.Pattern, str]] = [
    (re.compile(r"#{1,6}\s+"), ""),  # headers (unanchored — fires mid-line too)
    (re.compile(r"\*\*(.*?)\*\*"), r"\1"),  # bold
    (re.compile(r"\*(.*?)\*"), r"\1"),  # italic (after bold — order matters)
    (re.compile(r"\[([^\]]+)\]\([^\)]+\)"), r"\1"),  # links
    (re.compile(r"`([^`]+)`"), r"\1"),  # inline code
]


def markdown_to_plain(content: str) -> str:
    for pat, repl in _PLAIN_CHAIN:
        content = pat.sub(repl, content)
    return content


_PLAIN_CHAIN_PA: list[tuple[str, str]] = [
    (r"#{1,6}\s+", ""),
    (r"\*\*(.*?)\*\*", r"\1"),
    (r"\*(.*?)\*", r"\1"),
    (r"\[([^\]]+)\]\([^\)]+\)", r"\1"),
    (r"`([^`]+)`", r"\1"),
]


def markdown_to_plain_batch(arr: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Vectorized strip chain (pyarrow uses RE2: same non-greedy semantics;
    ``.`` does not match newline in either engine by default).

    Semantics note: RE2's ``\\s`` is ASCII-only while Python re's is
    Unicode-aware, so this batch form is byte-identical to the scalar
    reference form on ASCII whitespace only (e.g. a NBSP after ``#`` is
    stripped by the scalar chain but not here). The extraction kernel
    (engine.extract) uses the scalar form — Python-re semantics ARE the
    reference's (app/main.py:262-269)."""
    for pat, repl in _PLAIN_CHAIN_PA:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    return arr


# ---------------------------------------------------------------------------
# M7 — google-docs chain (app/main.py:270-277) — naive replaces, buggy order
# ---------------------------------------------------------------------------

_GDOC_CHAIN = [("# ", ""), ("## ", ""), ("### ", ""), ("**", ""), ("*", "")]


def markdown_to_gdocs(content: str) -> str:
    for old, new in _GDOC_CHAIN:
        content = content.replace(old, new)
    return content


def markdown_to_gdocs_batch(arr: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    for old, new in _GDOC_CHAIN:
        arr = pc.replace_substring(arr, pattern=old, replacement=new)
    return arr


def format_content_for_output(content: str, output_format: str) -> str:
    """Dispatch matching app/main.py:260-280; format names are the enum values
    (app/main.py:74-77): markdown | plain_text | google_docs."""
    if output_format == "plain_text":
        return markdown_to_plain(content)
    if output_format == "google_docs":
        return markdown_to_gdocs(content)
    return content


# ---------------------------------------------------------------------------
# M8 — content preview (app/main.py:547)
# ---------------------------------------------------------------------------


def content_preview(content: str, limit: int = PREVIEW_CHARS) -> str:
    return content[:limit] + "..." if len(content) > limit else content


def content_preview_batch(arr: pa.ChunkedArray | pa.Array,
                          limit: int = PREVIEW_CHARS) -> pa.Array | pa.ChunkedArray:
    sliced = pc.utf8_slice_codeunits(arr, start=0, stop=limit)
    long = pc.greater(pc.utf8_length(arr), limit)
    return pc.if_else(long, pc.binary_join_element_wise(sliced, "...", ""), arr)


# ---------------------------------------------------------------------------
# M9 — estimated processing time (app/main.py:676, :517)
# ---------------------------------------------------------------------------


def estimated_time_minutes(size_bytes: int) -> int:
    return max(1, size_bytes // (1024 * 1024))


def estimated_time_batch(sizes: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    mins = pc.floor(pc.divide(pc.cast(sizes, pa.float64()), 1024.0 * 1024.0))
    return pc.cast(pc.max_element_wise(mins, 1.0), pa.int64())


# ---------------------------------------------------------------------------
# M10 — extension for output format (app/main.py:345-347)
# ---------------------------------------------------------------------------


def extension_for_format(output_format: str) -> str:
    return ".md" if output_format == "markdown" else ".txt"


# ---------------------------------------------------------------------------
# Text normalization (training-data cleaning stage): Unicode NFC + control-
# character strip. SQL twin: regexp_replace(nfc_normalize(text), ...) —
# both engines implement Unicode NFC (unicodedata / utf8proc) and the
# control class is pure ASCII, so RE2-vs-Python semantics agree.
# ---------------------------------------------------------------------------

_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")


def normalize_text(s: str) -> str:
    """NFC-normalize, then strip C0 control chars (keeping \\t \\n \\r)."""
    import unicodedata

    if not s.isascii():  # ASCII is NFC by definition — skip the pass
        s = unicodedata.normalize("NFC", s)
    return _CTRL_RE.sub("", s)


def normalize_text_batch(t: pa.Table, text_col: str = "text",
                         out_col: str = "text_norm") -> pa.Table:
    out = [normalize_text(s or "") for s in t[text_col].to_pylist()]
    return t.append_column(out_col, pa.array(out, type=pa.string()))


# ---------------------------------------------------------------------------
# URL parsing (web-corpus provenance stage): domain extraction, fully
# vectorized via Arrow's RE2 extract — no Python per row.
# ---------------------------------------------------------------------------


def url_domain(col: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray":
    """Extract the host from an absolute http(s) URL column (empty string
    when the pattern misses — scheme-less or malformed URLs)."""
    # Arrow's extract_regex requires NAMED capture groups
    ex = pc.extract_regex(col, pattern=r"^https?://(?P<host>[^/]+)")
    return pc.coalesce(pc.struct_field(ex, "host"), "")


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing stage): email / phone masking, fully
# vectorized via Arrow's RE2 kernels — no Python per row. Patterns are kept
# RE2-compatible AND ASCII-explicit so the DuckDB regexp_replace twin (also
# RE2) is byte-identical; Python-re Unicode classes are deliberately avoided
# (the \s/\w divergence documented at the top of this module).
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def redact_pii_batch(t: pa.Table, text_col: str = "text",
                     out_col: str = "text_clean") -> pa.Table:
    """Mask every PII_PATTERNS match in ``text_col`` and count matches per
    kind (counted on the ORIGINAL text, each kind independently; replacement
    applied sequentially in PII_PATTERNS order — the email pattern cannot
    produce new phone matches or vice versa, but the order is still part of
    the contract and mirrored by the SQL twin's nesting)."""
    cleaned = t[text_col]
    counts = {}
    for name, pattern, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(t[text_col], pattern=pattern),
            pa.int64())
        cleaned = pc.replace_substring_regex(
            cleaned, pattern=pattern, replacement=repl)
    out = t.append_column(out_col, cleaned)
    for cname, arr in counts.items():
        out = out.append_column(cname, arr)
    return out


__all__ = [
    "normalize_text",
    "normalize_text_batch",
    "url_domain",
    "redact_pii_batch",
    "PII_PATTERNS",
    "chunk_text",
    "chunk_text_gated",
    "explode_chunks_batch",
    "sanitize_filename",
    "sanitize_batch",
    "markdown_to_plain",
    "markdown_to_plain_batch",
    "markdown_to_gdocs",
    "markdown_to_gdocs_batch",
    "format_content_for_output",
    "content_preview",
    "content_preview_batch",
    "estimated_time_minutes",
    "estimated_time_batch",
    "extension_for_format",
]


def normalize_url(col: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray":
    """Canonical URL form — the pre-dedup URL normalization of a web
    pipeline: strip fragment, remove utm_* tracking params, strip default
    ports (:80/:443), lowercase scheme+host (path/query case preserved).
    Scheme-less/malformed rows pass through unchanged.

    Every step is ONE RE2 GlobalReplace whose single-pass non-overlap
    semantics the DuckDB twin reproduces verbatim (same engine, same
    pattern, same pass count — the interior utm pass runs twice so up to
    ~4 consecutive tracking params clear; more survive identically on
    both sides).
    """
    u = col
    # 1. fragment
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    # 2. utm params: interior passes + trailing + dangling '?'
    for _ in range(2):
        u = pc.replace_substring_regex(u, pattern=r"([?&])utm_[^&]*&",
                                       replacement="\\1")
    u = pc.replace_substring_regex(u, pattern=r"[?&]utm_[^&]*$",
                                   replacement="")
    u = pc.replace_substring_regex(u, pattern=r"\?$", replacement="")
    # 3. default ports — anchored to the authority so ':80/'-like
    # sequences in the path or query are never touched
    u = pc.replace_substring_regex(
        u, pattern=r"^((?i:https?)://[^/?#:]*):(?:80|443)(/|\?|$)",
        replacement="\\1\\2")
    # 4. lowercase scheme://host
    head = pc.extract_regex(u, pattern=r"^(?P<head>(?i:https?)://[^/?#]*)")
    head_s = pc.coalesce(pc.struct_field(head, "head"), "")
    rest = pc.replace_substring_regex(u, pattern=r"^(?i:https?)://[^/?#]*",
                                      replacement="")
    return pc.binary_join_element_wise(pc.utf8_lower(head_s), rest, "")
