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
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05\x08\x00\x08")
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
