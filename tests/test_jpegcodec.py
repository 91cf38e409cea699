"""Baseline JPEG codec tests: exact constant-block decode, lossy-path
tolerance, restart markers, stuffing, rejection paths, magic routing."""

from __future__ import annotations

import numpy as np
import pytest

from engine.jpegcodec import decode_jpeg, encode_jpeg


def _up(p):
    return np.repeat(np.repeat(p, 8, 0), 8, 1).astype(np.uint8)


def test_gray_constant_blocks_exact():
    rng = np.random.default_rng(7)
    y = _up(rng.integers(0, 256, (3, 4)))
    img = decode_jpeg(encode_jpeg(y))
    assert img.shape == (24, 32, 3)
    assert (img[:, :, 0] == y).all()
    assert (img[:, :, 1] == y).all() and (img[:, :, 2] == y).all()


def test_color_constant_blocks_exact_jfif():
    rng = np.random.default_rng(11)
    yb, cbb, crb = (rng.integers(0, 256, (2, 3)) for _ in range(3))
    y, cb, cr = _up(yb), _up(cbb), _up(crb)
    img = decode_jpeg(encode_jpeg(y, cb, cr))
    yf, cbf, crf = (p.astype(np.float64) for p in (y, cb, cr))
    exp_r = np.clip(np.floor(yf + 1.402 * (crf - 128) + 0.5), 0, 255)
    exp_g = np.clip(np.floor(yf - 0.344136 * (cbf - 128)
                             - 0.714136 * (crf - 128) + 0.5), 0, 255)
    exp_b = np.clip(np.floor(yf + 1.772 * (cbf - 128) + 0.5), 0, 255)
    assert (img[:, :, 0] == exp_r).all()
    assert (img[:, :, 1] == exp_g).all()
    assert (img[:, :, 2] == exp_b).all()


def test_lossy_roundtrip_tolerance():
    # arbitrary content exercises AC symbols, runs and ZRL; with all-ones
    # quantization the only loss is FDCT coefficient rounding (<= 2 gray)
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    img = decode_jpeg(encode_jpeg(y))
    err = np.abs(img[:, :, 0].astype(int) - y.astype(int))
    assert err.max() <= 2


def test_restart_markers_bitstream_equal():
    rng = np.random.default_rng(5)
    y = _up(rng.integers(0, 256, (2, 4)))
    a = decode_jpeg(encode_jpeg(y))
    b = decode_jpeg(encode_jpeg(y, restart_interval=3))
    assert (a == b).all()


def test_byte_stuffing_roundtrip():
    # 0xFF-heavy entropy data: white blocks give large positive DC diffs
    y = _up(np.full((2, 2), 255, dtype=np.int64))
    img = decode_jpeg(encode_jpeg(y))
    assert (img == 255).all()


def test_encode_deterministic():
    rng = np.random.default_rng(13)
    y = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    assert encode_jpeg(y) == encode_jpeg(y)


def test_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    # lossless (SOF3) stays rejected; progressive (SOF2) is supported now
    with pytest.raises(ValueError, match="lossless/arithmetic"):
        decode_jpeg(b"\xff\xd8\xff\xc3\x00\x08\x08\x00\x08\x00\x08\x00")
    # sampling factor 3: beyond the supported 1/2 range
    sof = b"\x08\x00\x10\x00\x10\x01" + bytes([1, 0x33, 0])
    payload = b"\xff\xd8\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(payload)
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(_up(np.zeros((1, 1), np.int64)))[:-20])


def test_encoder_input_guard():
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg(np.zeros((10, 16), dtype=np.uint8))


def test_magic_routing_in_multimodal():
    from engine.multimodal import _decode_image

    y = _up(np.full((1, 1), 77, dtype=np.int64))
    img = _decode_image(encode_jpeg(y))
    assert (img == 77).all()


def test_420_constant_macroblocks_exact():
    rng = np.random.default_rng(17)

    def up(p, k):
        return np.repeat(np.repeat(p, k, 0), k, 1).astype(np.uint8)

    yb = rng.integers(0, 256, (4, 6))   # 8x8 Y blocks -> 32x48
    cbm = rng.integers(0, 256, (2, 3))  # 16x16 macro chroma
    crm = rng.integers(0, 256, (2, 3))
    y = up(yb, 8)
    img = decode_jpeg(encode_jpeg(y, up(cbm, 8), up(crm, 8),
                                  subsample=True))
    cbf = up(cbm, 16).astype(np.float64)
    crf = up(crm, 16).astype(np.float64)
    yf = y.astype(np.float64)
    exp_r = np.clip(np.floor(yf + 1.402 * (crf - 128) + 0.5), 0, 255)
    assert img.shape == (32, 48, 3)
    assert (img[:, :, 0] == exp_r).all()
    # restart markers interleave Y/Cb/Cr MCUs identically
    img2 = decode_jpeg(encode_jpeg(y, up(cbm, 8), up(crm, 8),
                                   subsample=True, restart_interval=2))
    assert (img2 == img).all()


def test_420_input_guards():
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_jpeg(np.zeros((8, 8), np.uint8), np.zeros((4, 4), np.uint8),
                    np.zeros((4, 4), np.uint8), subsample=True)
    with pytest.raises(ValueError, match="half-resolution"):
        encode_jpeg(np.zeros((16, 16), np.uint8),
                    np.zeros((16, 16), np.uint8),
                    np.zeros((16, 16), np.uint8), subsample=True)


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------

def _prog():
    from engine.jpegcodec import encode_progressive_jpeg

    return encode_progressive_jpeg


@pytest.mark.parametrize("al_dc,al_ac,ri,bs", [
    (0, 0, 0, 6),    # pure spectral selection, no refinement scans
    (1, 1, 0, 6),    # libjpeg-style one-bit successive approximation
    (2, 3, 0, 2),    # deep approximation ladder, tiny first band
    (1, 1, 2, 6),    # restart markers inside every scan
    (2, 2, 3, 64),   # single AC band + restarts
])
def test_progressive_matches_baseline_gray(al_dc, al_ac, ri, bs):
    """Progressive decode of the same quantized coefficients must be
    byte-identical to the oracle-pinned baseline decode — every scan kind
    (DC first/refine interleaved, AC first/refine with EOB runs) crosses
    the same IDCT/color tail."""
    rng = np.random.default_rng(101)
    y = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(y))
    prog = decode_jpeg(_prog()(y, al_dc=al_dc, al_ac=al_ac,
                               restart_interval=ri, band_split=bs))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("al_dc,al_ac,ri", [(0, 0, 0), (1, 1, 0), (2, 1, 2)])
def test_progressive_matches_baseline_color(al_dc, al_ac, ri):
    rng = np.random.default_rng(202)
    y = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    cb = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    cr = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(y, cb, cr))
    prog = decode_jpeg(_prog()(y, cb, cr, al_dc=al_dc, al_ac=al_ac,
                               restart_interval=ri))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("al_dc,al_ac,ri", [(0, 0, 0), (1, 2, 1), (2, 2, 3)])
def test_progressive_matches_baseline_420(al_dc, al_ac, ri):
    """4:2:0: interleaved DC scans walk 4 Y + Cb + Cr blocks per MCU while
    the non-interleaved AC scans walk each component's own block grid."""
    rng = np.random.default_rng(303)
    y = rng.integers(0, 256, (32, 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (16, 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (16, 8)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(y, cb, cr, subsample=True))
    prog = decode_jpeg(_prog()(y, cb, cr, subsample=True, al_dc=al_dc,
                               al_ac=al_ac, restart_interval=ri))
    assert np.array_equal(base, prog)


def test_progressive_spec_vector_eob_run():
    """Hand-derived T.81 EOBn bytes: 3 all-constant blocks produce one
    AC-first scan that is a single EOB3 — symbol EOB1 (0x10, Huffman code
    '0' in the minimal 1-bit table) + 1 extension bit (3 - 2 = 1), padded
    with 1s => exactly b'\\x7f'. Pins the encoder's EOB-run arithmetic to
    the spec by hand, independent of the decoder."""
    from engine.jpegcodec import _ScanWriter, _SymCollector, _scan_ac_first

    grid = np.zeros((3, 1, 64), dtype=np.int64)
    grid[:, :, 0] = 400  # DC only: every block is all-EOB in band [1,63]
    col = _SymCollector()
    _scan_ac_first(col, grid, 1, 63, 0, 0)
    assert col.syms == {0x10}
    out = bytearray()
    w = _ScanWriter(out, {0x10: (0, 1)})
    _scan_ac_first(w, grid, 1, 63, 0, 0)
    w.finish()
    assert bytes(out) == b"\x7f"


def test_progressive_spec_vector_ac_refine():
    """Hand-derived refinement bytes: band [1,5], history all zero at
    Al=1, true coefficients +1 at k=1 and -1 at k=3. The Ah=1->Al=0 scan
    emits (0,1)+sign(1), (1,1)+sign(0), then EOB1 for the trailing zeros:
    symbols sorted [0x00,0x01,0x11] at 2 bits => bits 01 1 10 0 00 — exactly
    one byte, 0x70."""
    from engine.jpegcodec import _ScanWriter, _scan_ac_refine

    grid = np.zeros((1, 1, 64), dtype=np.int64)
    grid[0, 0, 1] = 1
    grid[0, 0, 3] = -1
    out = bytearray()
    w = _ScanWriter(out, {0x00: (0, 2), 0x01: (1, 2), 0x11: (2, 2)})
    _scan_ac_refine(w, grid, 1, 5, 0, 0)
    w.finish()
    assert bytes(out) == b"\x70"


def test_progressive_correction_bits_buffered_after_eob():
    """History coefficients inside an EOB run receive their correction
    bits right after the EOBn symbol (libjpeg BE buffering): one block
    whose band is all history (|v| > 1) emits EOB1 then the correction
    bits, nothing else."""
    from engine.jpegcodec import _ScanWriter, _scan_ac_refine

    grid = np.zeros((1, 1, 64), dtype=np.int64)
    grid[0, 0, 1] = 6   # |6|>>0 = 6 -> history, correction bit 0
    grid[0, 0, 2] = -7  # correction bit 1
    out = bytearray()
    w = _ScanWriter(out, {0x00: (0, 1)})
    _scan_ac_refine(w, grid, 1, 5, 0, 0)
    w.finish()
    # EOB1 ('0') + correction bits 0,1 + 1-padding -> 0b00111111
    assert bytes(out) == b"\x3f"


def test_progressive_multimodal_routing():
    from engine.multimodal import _decode_image

    y = _up(np.full((1, 2), 77, dtype=np.int64))
    img = _decode_image(_prog()(y, al_dc=1, al_ac=1))
    assert (img == 77).all()


def test_progressive_truncation_total():
    rng = np.random.default_rng(404)
    y = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    payload = _prog()(y, al_dc=1, al_ac=1)
    assert np.array_equal(decode_jpeg(payload),
                          decode_jpeg(encode_jpeg(y)))
    for cut in (10, len(payload) // 3, len(payload) // 2,
                len(payload) - 8):
        try:
            decode_jpeg(payload[:cut])
        except ValueError:
            pass  # raising ValueError (not IndexError) is the contract
