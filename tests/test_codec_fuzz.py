"""Fuzz-hardening for the stdlib codecs: arbitrary bytes must either decode
or raise ValueError — never any other exception (the media stages map
ValueError/MediaDecodeError to their per-row error channel; anything else
kills a whole Ray task)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.audiocodec import decode_wav
from engine.htmlx.charset import decode_html, sniff_charset
from engine.imagecodec import PNG_SIG, decode_bmp, decode_png, decode_ppm


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_png_total(data):
    for payload in (data, PNG_SIG + data):
        try:
            out = decode_png(payload)
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_bmp_ppm_wav_total(data):
    for prefix, dec in ((b"BM", decode_bmp), (b"P6", decode_ppm),
                        (b"RIFF", decode_wav)):
        try:
            dec(prefix + data)
        except ValueError:
            pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_charset_sniff_and_decode_total(data):
    enc = sniff_charset(data)
    assert isinstance(enc, str)
    out = decode_html(data)          # replacement errors: never raises
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_jpeg_total(data):
    from engine.jpegcodec import decode_jpeg, encode_jpeg

    import numpy as np  # noqa: F811 (local for self-containment)

    for payload in (data, b"\xff\xd8" + data):
        try:
            out = decode_jpeg(payload)
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass
    # valid prefix + garbage tail must also be total
    valid = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
    try:
        decode_jpeg(valid[: max(2, len(valid) - len(data) % 40)] + data)
    except ValueError:
        pass
