"""Lossless-WebP (VP8L) codec tests: encoder↔decoder roundtrips plus
hand-built bitstreams for every decode path the fixture encoder does not
emit (LZ77 backrefs, color cache, palette packing, predictor and
cross-color transforms, meta prefix groups)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from engine.webpcodec import (BitWriter, _balanced_lengths, _DIST_MAP,
                              _write_prefix_code, decode_webp,
                              encode_webp_lossless)


def test_distance_map_spot_pins():
    # spec-table prefix and spot values (plane code = index + 1)
    assert _DIST_MAP[:10] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
                              (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1)]
    assert _DIST_MAP[34] == (0, 5)        # code 35
    assert _DIST_MAP[96] == (8, 0)        # code 97
    assert _DIST_MAP[119] == (8, 7)       # code 120
    assert _DIST_MAP[92] == (5, 6)        # norm-61 tie: y desc
    assert _DIST_MAP[94] == (6, 5)
    assert len(set(_DIST_MAP)) == 120


def test_roundtrip_shapes_and_transform():
    rng = np.random.RandomState(1)
    for h, w in [(1, 1), (3, 5), (8, 8), (16, 7), (2, 31)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for sg in (False, True):
            out = decode_webp(encode_webp_lossless(img, subtract_green=sg))
            assert out.shape == img.shape
            assert (out == img).all()


def test_roundtrip_degenerate_palettes():
    rng = np.random.RandomState(2)
    img = np.full((4, 6, 3), 77, dtype=np.uint8)        # single-symbol
    assert (decode_webp(encode_webp_lossless(img)) == img).all()
    img = np.where(rng.rand(5, 9, 3) > .5, 200, 13).astype(np.uint8)
    assert (decode_webp(encode_webp_lossless(img)) == img).all()


# --------------------------------------------------------------------------
# hand-built bitstream helpers

def _wrap(bw: BitWriter) -> bytes:
    body = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _trees(bw: BitWriter, greens, reds, blues, alphas, dists,
           green_alphabet: int = 280):
    out = []
    for used, alphabet in ((greens, green_alphabet), (reds, 256),
                           (blues, 256), (alphas, 256), (dists, 40)):
        used = sorted(set(used))
        out.append(_write_prefix_code(
            bw, _balanced_lengths(used, alphabet), used))
    return out


def _emit(bw: BitWriter, table, symbol: int) -> None:
    code, nbits = table[symbol]
    bw.write_code(code, nbits)


def test_lz77_backref_row_copy():
    # 4x3: one literal row, then length-8 backref at plane code 1
    # ((0,1) => dist = xsize) copies rows 1-2 from above.
    bw = BitWriter()
    _header(bw, 4, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    greens = [10, 20, 30, 40, 261]  # 261 = length prefix code 5
    g, r, b, a, d = _trees(bw, greens, [11, 21, 31, 41],
                           [12, 22, 32, 42], [255], [0])
    for gg in (10, 20, 30, 40):
        _emit(bw, g, gg)
        _emit(bw, r, gg + 1)
        _emit(bw, b, gg + 2)
        _emit(bw, a, 255)
    _emit(bw, g, 261)   # length code 5: offset 6 + extra bit + 1
    bw.write(1, 1)      # extra bit -> length 8
    _emit(bw, d, 0)     # 0 bits (single); prefix value 1 -> plane (0,1)
    out = decode_webp(_wrap(bw))
    row = np.array([[11, 10, 12], [21, 20, 22], [31, 30, 32],
                    [41, 40, 42]], dtype=np.uint8)
    assert (out == np.stack([row] * 3)).all()


def test_color_cache_hit():
    argb = (255 << 24) | (5 << 16) | (6 << 8) | 7
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 28  # cache_bits = 4
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)      # no transforms
    bw.write(1, 1)      # cache present
    bw.write(4, 4)      # cache_bits = 4
    bw.write(0, 1)      # no meta
    g, r, b, a, d = _trees(bw, [6, 280 + idx], [5], [7], [255], [0],
                           green_alphabet=280 + 16)
    _emit(bw, g, 6)
    _emit(bw, r, 5)
    _emit(bw, b, 7)
    _emit(bw, a, 255)
    _emit(bw, g, 280 + idx)   # cache hit reproduces the same pixel
    out = decode_webp(_wrap(bw))
    assert (out == np.array([[[5, 6, 7], [5, 6, 7]]], dtype=np.uint8)).all()


def test_palette_with_packed_indices():
    # 6x1, 3-color palette => xbits=2 (four 2-bit indices per byte)
    pal = [(255, 10, 20, 30), (255, 50, 60, 70), (255, 90, 15, 200)]
    deltas = [pal[0]]
    for i in (1, 2):
        deltas.append(tuple((pal[i][c] - pal[i - 1][c]) % 256
                            for c in range(4)))
    indices = [0, 1, 2, 1, 0, 2]
    packed = [indices[0] | indices[1] << 2 | indices[2] << 4
              | indices[3] << 6,
              indices[4] | indices[5] << 2]
    bw = BitWriter()
    _header(bw, 6, 1)
    bw.write(1, 1)      # a transform
    bw.write(3, 2)      # COLOR_INDEXING
    bw.write(2, 8)      # palette size - 1
    # palette sub-stream (3x1, not level0): cache bit + 5 trees + literals
    bw.write(0, 1)
    pg, pr, pb, pa, _ = _trees(bw, [x[2] for x in deltas],
                               [x[1] for x in deltas],
                               [x[3] for x in deltas],
                               [x[0] for x in deltas], [0])
    for al, re, gr, bl in deltas:
        _emit(bw, pg, gr)
        _emit(bw, pr, re)
        _emit(bw, pb, bl)
        _emit(bw, pa, al)
    bw.write(0, 1)      # end of transforms
    bw.write(0, 1)      # no cache
    bw.write(0, 1)      # no meta
    g, r, b, a, d = _trees(bw, packed, [0], [0], [255], [0])
    for p in packed:
        _emit(bw, g, p)
        _emit(bw, r, 0)
        _emit(bw, b, 0)
        _emit(bw, a, 255)
    out = decode_webp(_wrap(bw))
    want = np.array([[pal[i][1:4] for i in indices]], dtype=np.uint8)
    assert (out == want).all()


def _predict_ref(res: np.ndarray, mode: int) -> np.ndarray:
    """Independent scalar reference for the 14 predictor modes over one
    block (whole image), ARGB int arrays."""
    h, w, _ = res.shape
    out = np.zeros_like(res, dtype=np.int64)

    def avg2(p, q):
        return [(pi + qi) >> 1 for pi, qi in zip(p, q)]

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = [255, 0, 0, 0]
            elif y == 0:
                pred = list(out[0, x - 1])
            elif x == 0:
                pred = list(out[y - 1, 0])
            else:
                L = list(out[y, x - 1])
                T = list(out[y - 1, x])
                TL = list(out[y - 1, x - 1])
                TR = (list(out[y - 1, x + 1]) if x + 1 < w
                      else list(out[y, 0]))  # linear neighbour
                if mode == 0:
                    pred = [255, 0, 0, 0]
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    pm = sum(abs(li - tli) - abs(ti - tli)
                             for ti, li, tli in zip(T, L, TL))
                    pred = T if pm <= 0 else L
                elif mode == 12:
                    pred = [min(255, max(0, li + ti - tli))
                            for ti, li, tli in zip(T, L, TL)]
                else:
                    pred = []
                    for li, ti, tli in zip(L, T, TL):
                        ave = (li + ti) >> 1
                        delta = ave - tli
                        half = delta // 2 if delta >= 0 else -((-delta) // 2)
                        pred.append(min(255, max(0, ave + half)))
            out[y, x] = [(rv + pv) & 0xFF for rv, pv in zip(res[y, x], pred)]
    return out


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_match_reference(mode):
    rng = np.random.RandomState(40 + mode)
    h = w = 4
    res = np.zeros((h, w, 4), dtype=np.int64)  # ARGB residuals
    res[:, :, 1:] = rng.randint(0, 256, (h, w, 3))
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)      # PREDICTOR
    bw.write(0, 3)      # size_bits = 2 -> 4x4 blocks -> 1x1 sub-image
    bw.write(0, 1)      # sub-stream: no cache
    sg, sr, sb, sa, _ = _trees(bw, [mode], [0], [0], [0], [0])
    _emit(bw, sg, mode)
    _emit(bw, sr, 0)
    _emit(bw, sb, 0)
    _emit(bw, sa, 0)
    bw.write(0, 1)      # end transforms
    bw.write(0, 1)      # no cache
    bw.write(0, 1)      # no meta
    g, r, b, a, d = _trees(bw, list(res[:, :, 2].reshape(-1)),
                           list(res[:, :, 1].reshape(-1)),
                           list(res[:, :, 3].reshape(-1)), [0], [0])
    for y in range(h):
        for x in range(w):
            _emit(bw, g, int(res[y, x, 2]))
            _emit(bw, r, int(res[y, x, 1]))
            _emit(bw, b, int(res[y, x, 3]))
            _emit(bw, a, 0)
    out = decode_webp(_wrap(bw))
    res[:, :, 0] = 0
    want = _predict_ref(res, mode)[:, :, 1:4]
    assert (out == want).all(), mode


def test_color_transform_inverse():
    def s8(v):
        return v - 256 if v > 127 else v

    g2r, g2b, r2b = 200, 31, 140
    res = (255, 77, 130, 9)  # ARGB residual
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)      # COLOR transform
    bw.write(1, 3)      # size_bits = 3 -> 1x1 sub-image
    bw.write(0, 1)      # sub-stream: no cache
    # cte pixel: red=r2b, green=g2b, blue=g2r
    sg, sr, sb, sa, _ = _trees(bw, [g2b], [r2b], [g2r], [0], [0])
    _emit(bw, sg, g2b)
    _emit(bw, sr, r2b)
    _emit(bw, sb, g2r)
    _emit(bw, sa, 0)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g, r, b, a, d = _trees(bw, [res[2]], [res[1]], [res[3]], [res[0]], [0])
    _emit(bw, g, res[2])
    _emit(bw, r, res[1])
    _emit(bw, b, res[3])
    _emit(bw, a, res[0])
    out = decode_webp(_wrap(bw))
    red = (res[1] + ((s8(g2r) * s8(res[2])) >> 5)) & 0xFF
    blue = (res[3] + ((s8(g2b) * s8(res[2])) >> 5)) & 0xFF
    blue = (blue + ((s8(r2b) * s8(red)) >> 5)) & 0xFF
    assert tuple(out[0, 0]) == (red, res[2], blue)


def test_meta_prefix_groups():
    # 8x1, meta blocks of 4 -> 2 groups, all trees single-symbol:
    # the pixel loop consumes zero bits and still routes per block.
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)      # no transforms
    bw.write(0, 1)      # no cache
    bw.write(1, 1)      # meta present
    bw.write(0, 3)      # meta_bits = 2 -> 2x1 meta image
    bw.write(0, 1)      # meta sub-stream: no cache
    mg, mr, mb, ma, _ = _trees(bw, [0, 1], [0], [0], [0], [0])
    for gidx in (0, 1):  # meta index = (red<<8)|green
        _emit(bw, mg, gidx)
        _emit(bw, mr, 0)
        _emit(bw, mb, 0)
        _emit(bw, ma, 0)
    for base in (50, 150):  # two groups, distinct constant colors
        _trees(bw, [base], [base + 1], [base + 2], [255], [0])
    out = decode_webp(_wrap(bw))
    want = np.array([[[51, 50, 52]] * 4 + [[151, 150, 152]] * 4],
                    dtype=np.uint8)
    assert (out == want).all()


def test_container_paths():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = encode_webp_lossless(img)
    # VP8X-extended container: prepend a VP8X chunk, still decodes
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    ext = (payload[:12] + vp8x + payload[12:])
    ext = ext[:4] + struct.pack("<I", len(ext) - 8) + ext[8:]
    assert (decode_webp(ext) == img).all()
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(payload[:20])  # truncated chunk
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_webp(lossy)


def test_decode_image_routes_webp():
    from engine.multimodal import MediaDecodeError, _decode_image

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (_decode_image(encode_webp_lossless(img)) == img).all()
    import engine.multimodal as mm
    if mm._PILImage is None:
        with pytest.raises(MediaDecodeError):
            _decode_image(b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                          + b"VP8 " + struct.pack("<I", 0))


def test_webp_through_image_stats(ray_session):
    import ray.data as rd

    from engine.multimodal import image_stats

    rows, want = [], {}
    rng = np.random.RandomState(11)
    for i in range(8):
        h, w = 2 + i % 3, 3 + i % 4
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        rows.append({"media_id": i,
                     "payload": encode_webp_lossless(img, i % 2 == 0)})
        want[i] = (w, h, int(img[:, :, 0].sum()), int(img[:, :, 1].sum()),
                   int(img[:, :, 2].sum()))
    out = (image_stats(rd.from_items(rows), batch_size=3)
           .to_pandas().set_index("media_id"))
    for i, (w, h, sr, sg, sb) in want.items():
        assert (out.loc[i, "width"], out.loc[i, "height"]) == (w, h)
        assert (out.loc[i, "sum_r"], out.loc[i, "sum_g"],
                out.loc[i, "sum_b"]) == (sr, sg, sb)
