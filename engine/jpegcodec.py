"""REAL baseline + progressive JPEG (ITU-T T.81) codec on stdlib + numpy.

The last 'deployment-gated' image format: PNG/BMP/PPM decode went real in
round 4 (engine/imagecodec.py); this module does the same for JPEG — THE
dominant crawl image format. Round 5 adds full progressive (SOF2) decode
(spectral selection + successive approximation, the libjpeg default
progression style — 10-20 % of wild crawl JPEGs), so the multimodal
decode story needs pillow only for arithmetic-coded JPEG, WebP etc.

Decoder support matrix (raises ``ValueError`` outside it; the media stages
map that to their per-row error channel):
- baseline sequential DCT (SOF0) and extended sequential (SOF1, identical
  at 8-bit precision); progressive (SOF2) with DC first/refinement
  (interleaved or single-component), AC first/refinement band scans, EOB
  runs, per-scan Huffman tables, and restart markers inside every scan
  kind (T.81 annex G / libjpeg jdphuff semantics). Arithmetic-coded,
  lossless and hierarchical frames are rejected with a clear message
  (pillow deployment path). 8-bit precision only.
- 1-component (grayscale, replicated to RGB) and 3-component YCbCr with
  sampling factors 1 and 2 — 4:4:4, 4:2:0, 4:2:2, 4:4:0. Subsampled
  chroma upsamples by pixel REPLICATION (nearest): the spec leaves the
  upsample filter to the codec; libjpeg's default 'fancy' triangular
  filter would make pixels library-specific, replication keeps them
  closed-form (and exact on constant-chroma fixtures). Factors > 2
  rejected.
- arbitrary DQT (8- and 16-bit precision) and DHT tables, multi-table
  segments, interleaved single-scan, restart markers (DRI/RSTn with DC
  predictor reset), APPn/COM skip, 0xFF00 byte-unstuffing.

Exactness convention (the SQL-twin discipline): IDCT runs in float64 via
the separable orthonormal DCT-III matrix; pixel reconstruction and the
JFIF YCbCr→RGB conversion both round with ``floor(x + 0.5)`` (NOT
banker's np.round — CLAUDE.md float trap) and clamp to [0, 255], so a
DuckDB twin using the same double literals computes identical pixels.
Planted constant-8x8-block fixtures decode EXACTLY (DC-only blocks: the
1/8 IDCT scale is within 1e-13 of exact at |DC| <= 1024, then rounds).

Entropy decoding walks bits with a numpy ``unpackbits`` array + an index
loop per Huffman symbol — per-SYMBOL Python, like the PNG Paeth row loop
(documented honest-kernel exception; crawl-scale JPEG decode runs under
pillow where installed, this is the correctness reference + in-sandbox
real path).

The encoder (fixtures + tests) is a REAL forward path — level shift,
float64 FDCT, quantization, differential DC, canonical Huffman with
custom minimal tables (12 DC categories at 4 bits; AC: EOB at 1 bit plus
the (run,size) symbols actually present, built per image), byte stuffing,
optional restart interval — restricted to 4:4:4 / grayscale with
multiple-of-8 dimensions. ``encode_progressive_jpeg`` emits the same
quantized coefficients as a multi-scan SOF2 stream (libjpeg-style scan
script, per-scan minimal DHT, EOB-run and buffered-correction-bit
encoding pinned to hand-derived spec vectors in tests) so progressive
decode is testable against the oracle-pinned baseline decode without any
external library.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag index -> raster index (public spec data)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_A = None  # lazy 8x8 DCT-II matrix (JPEG scaling)


def _dct_matrix() -> np.ndarray:
    global _A
    if _A is None:
        u = np.arange(8).reshape(8, 1).astype(np.float64)
        x = np.arange(8).reshape(1, 8).astype(np.float64)
        a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
        a[0, :] *= 1.0 / np.sqrt(2.0)
        _A = a
    return _A


def _round_half_up_clip(v: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

class _Huff:
    """Canonical Huffman table: (code length run) -> symbol, decoded by
    walking a sorted (length, code) table with the spec's MINCODE/MAXCODE
    arithmetic — O(16) per symbol, no tree objects."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.min_code = np.zeros(17, dtype=np.int64)
        self.max_code = np.full(17, -1, dtype=np.int64)
        self.val_ptr = np.zeros(17, dtype=np.int64)
        self.symbols = np.frombuffer(symbols, dtype=np.uint8)
        code = 0
        k = 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            if n:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += n
                k += n
                self.max_code[ln] = code - 1
            code <<= 1
        if k != len(self.symbols):
            raise ValueError("jpeg: DHT count/symbol mismatch")


class _BitReader:
    def __init__(self, bits: np.ndarray):
        self.bits = bits
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits
        p = self.pos
        if p + n > len(b):
            raise ValueError("jpeg: entropy data exhausted")
        v = 0
        for i in range(n):
            v = (v << 1) | int(b[p + i])
        self.pos = p + n
        return v

    def huff(self, h: _Huff) -> int:
        b = self.bits
        p = self.pos
        code = 0
        for ln in range(1, 17):
            if p + ln > len(b):
                raise ValueError("jpeg: entropy data exhausted")
            code = (code << 1) | int(b[p + ln - 1])
            if h.max_code[ln] >= code >= h.min_code[ln]:
                self.pos = p + ln
                return int(h.symbols[h.val_ptr[ln] + code - h.min_code[ln]])
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → HxWx3 uint8 (grayscale replicated).
    Any malformed input raises ``ValueError`` (the codec-fuzz contract —
    short reads / bad indices are normalized, never IndexError)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"jpeg: malformed stream ({exc})") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos, n = 2, len(payload)
    qt: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _Huff] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coeffs = None  # per-component zigzag coefficient grids (progressive)
    geom = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:  # RSTn/TEM: no segment
            continue
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        end_of_seg = pos + seglen
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tbl.astype(np.int64)
                qt[tq] = raster.reshape(8, 8)
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = seg[i + 1:i + 17]
                nsym = sum(counts)
                syms = seg[i + 17:i + 17 + nsym]
                huffs[(tc, th)] = _Huff(counts, syms)
                i += 17 + nsym
        elif m in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline; SOF1 extended sequential (identical decode
            # at 8-bit precision); SOF2 progressive (multi-scan)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(
                        "jpeg: sampling factors beyond 2 unsupported "
                        "(deployment path: pillow)")
                comps.append((cid, tq, hs, vs))
            if nc not in (1, 3):
                raise ValueError("jpeg: 1 or 3 components only")
            frame = (h, w, comps)
            progressive = m == 0xC2
        elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: lossless/arithmetic/hierarchical frame "
                "unsupported — deployment path: pillow")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                scomp.append((cs, tdta >> 4, tdta & 0x0F))
            if not progressive:
                return _decode_scan(payload, end_of_seg, frame, scomp,
                                    qt, huffs, restart_interval)
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            bits, segments, pos = _entropy_bits(payload, end_of_seg)
            if coeffs is None:
                coeffs, geom = _prog_init(frame)
            _prog_scan(bits, segments, frame, scomp, huffs, coeffs,
                       geom, ss, se, ahl >> 4, ahl & 0x0F,
                       restart_interval)
            continue  # pos already advanced past the entropy data
        # APPn / COM / others: skip
        pos = end_of_seg
    if progressive and coeffs is not None:
        return _prog_finish(frame, coeffs, qt, geom)
    raise ValueError("jpeg: no scan data")


def _entropy_bits(payload: bytes, pos: int):
    """Collect one scan's entropy bytes starting at ``pos``, unstuffing
    FF00 and recording RSTn boundaries. Returns (bit array, list of bit
    offsets where DC predictors / EOB runs reset, position of the
    terminating marker byte)."""
    data = bytearray()
    segments = [0]
    n = len(payload)
    while pos + 1 < n:
        b = payload[pos]
        if b != 0xFF:
            data.append(b)
            pos += 1
            continue
        m = payload[pos + 1]
        if m == 0x00:
            data.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(len(data) * 8)
            pos += 2
        else:  # EOI or next marker ends the scan
            break
    bits = np.unpackbits(np.frombuffer(bytes(data), dtype=np.uint8))
    return bits, segments, pos


def _finish(planes, comps, hmax: int, vmax: int, h: int, w: int) -> np.ndarray:
    """Round planes to integer samples, upsample subsampled chroma by
    pixel replication, crop and color-convert (shared decode tail)."""
    up = []
    for p, c in zip(planes, comps):
        fy, fx = vmax // c[3], hmax // c[2]
        if fy > 1:
            p = np.repeat(p, fy, axis=0)
        if fx > 1:
            p = np.repeat(p, fx, axis=1)
        up.append(_round_half_up_clip(p[:h, :w]).astype(np.float64))
    planes = up
    if len(comps) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes
    # JFIF conversion, floor(x+0.5) rounding (SQL-twin convention)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([_round_half_up_clip(r), _round_half_up_clip(g),
                     _round_half_up_clip(b)], axis=2)


def _decode_scan(payload: bytes, pos: int, frame, scomp, qt, huffs,
                 restart_interval: int) -> np.ndarray:
    h, w, comps = frame
    if len(scomp) != len(comps):
        raise ValueError("jpeg: non-interleaved multi-scan unsupported")
    bits, segments, _ = _entropy_bits(payload, pos)
    rd = _BitReader(bits)

    ncomp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c[3] * 8, mcux * c[2] * 8),
                       dtype=np.float64) for c in comps]
    tabs = []
    for (cid, tq, _, _), (cs, td, ta) in zip(comps, scomp):
        if cid != cs:
            raise ValueError("jpeg: scan/frame component order mismatch")
        if tq not in qt or (0, td) not in huffs or (1, ta) not in huffs:
            raise ValueError("jpeg: missing quant/Huffman table")
        tabs.append((qt[tq], huffs[(0, td)], huffs[(1, ta)]))
    a = _dct_matrix()
    pred = [0] * ncomp
    seg_i = 1
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                if seg_i < len(segments):
                    rd.pos = segments[seg_i]
                    seg_i += 1
                    pred = [0] * ncomp
            for ci in range(ncomp):
                q, hdc, hac = tabs[ci]
                ch, cv = comps[ci][2], comps[ci][3]
                for vy in range(cv):
                    for vx in range(ch):
                        coeffs = np.zeros(64, dtype=np.int64)
                        size = rd.huff(hdc)
                        diff = _extend(rd.read(size), size)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.huff(hac)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            coeffs[k] = _extend(rd.read(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = coeffs
                        s_mat = blk.reshape(8, 8) * q
                        pix = a.T @ s_mat @ a + 128.0
                        py = (my * cv + vy) * 8
                        px = (mx * ch + vx) * 8
                        planes[ci][py:py + 8, px:px + 8] = pix
            mcu += 1

    # round each plane to integer samples FIRST (standard decode order,
    # and it keeps the color conversion's floor(x+0.5) away from the
    # 1e-13 IDCT noise — both oracle sides then start from exact ints),
    # then upsample subsampled chroma by pixel REPLICATION (nearest —
    # the documented convention; libjpeg's default 'fancy' triangular
    # filter is codec-specific and not oracle-provable)
    return _finish(planes, comps, hmax, vmax, h, w)


# ---------------------------------------------------------------------------
# Progressive decode (ITU-T T.81 annex G, Huffman successive approximation)
# ---------------------------------------------------------------------------

def _prog_init(frame):
    """Zero coefficient grids per component, sized to the FULL interleaved
    MCU-padded block grid (interleaved DC scans write every padded block);
    non-interleaved scans touch only the ceil(comp_dim/8) prefix."""
    h, w, comps = frame
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coeffs = []
    grids = []
    for cid, tq, hs, vs in comps:
        bwf, bhf = mcux * hs, mcuy * vs
        cw = (w * hs + hmax - 1) // hmax
        ch_ = (h * vs + vmax - 1) // vmax
        bw, bh = (cw + 7) // 8, (ch_ + 7) // 8
        coeffs.append(np.zeros((bhf, bwf, 64), dtype=np.int64))
        grids.append((bw, bh))
    return coeffs, (hmax, vmax, mcux, mcuy, grids)


def _prog_scan(bits, segments, frame, scomp, huffs, coeffs, geom,
               ss: int, se: int, ah: int, al: int, ri: int) -> None:
    h, w, comps = frame
    hmax, vmax, mcux, mcuy, grids = geom
    rd = _BitReader(bits)
    idxs = []
    for cs, td, ta in scomp:
        ci = next((i for i, c in enumerate(comps) if c[0] == cs), None)
        if ci is None:
            raise ValueError("jpeg: scan names unknown component")
        idxs.append(ci)
    ns = len(idxs)
    if se > 63 or ss > se:
        raise ValueError("jpeg: bad spectral selection")
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: DC scan must have Se=0")
        _prog_dc(rd, segments, comps, scomp, idxs, huffs, coeffs,
                 grids, mcux, mcuy, ah, al, ri)
    else:
        if ns != 1:
            raise ValueError("jpeg: AC scan must be single-component")
        _prog_ac(rd, segments, idxs[0], scomp[0][2], huffs, coeffs,
                 grids, ss, se, ah, al, ri)


def _prog_dc(rd, segments, comps, scomp, idxs, huffs, coeffs, grids,
             mcux, mcuy, ah, al, ri) -> None:
    ns = len(idxs)
    tabs = []
    if ah == 0:
        for cs, td, ta in scomp:
            if (0, td) not in huffs:
                raise ValueError("jpeg: missing DC Huffman table")
            tabs.append(huffs[(0, td)])
    pred = [0] * ns
    seg_i = 1
    unit = 0
    if ns > 1:  # interleaved: MCU traversal, cv x ch blocks per comp
        units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
    else:  # non-interleaved: the component's own ceil block grid
        bw, bh = grids[idxs[0]]
        units = [(by, bx) for by in range(bh) for bx in range(bw)]
    for uy, ux in units:
        if ri and unit and unit % ri == 0 and seg_i < len(segments):
            rd.pos = segments[seg_i]
            seg_i += 1
            pred = [0] * ns
        for si, ci in enumerate(idxs):
            ch, cv = comps[ci][2], comps[ci][3]
            if ns > 1:
                blocks = [(uy * cv + vy, ux * ch + vx)
                          for vy in range(cv) for vx in range(ch)]
            else:
                blocks = [(uy, ux)]
            for by, bx in blocks:
                if ah == 0:
                    size = rd.huff(tabs[si])
                    diff = _extend(rd.read(size), size)
                    pred[si] += diff
                    coeffs[ci][by, bx, 0] = pred[si] << al
                else:  # refinement: one bit appended at position al
                    if rd.read(1):
                        coeffs[ci][by, bx, 0] |= 1 << al
        unit += 1


def _prog_ac(rd, segments, ci, ta, huffs, coeffs, grids,
             ss, se, ah, al, ri) -> None:
    if (1, ta) not in huffs:
        raise ValueError("jpeg: missing AC Huffman table")
    hac = huffs[(1, ta)]
    bw, bh = grids[ci]
    carr = coeffs[ci]
    eobrun = 0
    seg_i = 1
    unit = 0
    p1, m1 = 1 << al, -(1 << al)
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0 and seg_i < len(segments):
                rd.pos = segments[seg_i]
                seg_i += 1
                eobrun = 0
            blk = carr[by, bx]
            if ah == 0:  # first scan for this band
                if eobrun:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = rd.huff(hac)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.read(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("jpeg: AC index overflow")
                        blk[k] = _extend(rd.read(s), s) << al
                        k += 1
            else:  # refinement scan (T.81 G.1.2.3 / libjpeg semantics)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = rd.huff(hac)
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "jpeg: bad AC-refinement size")
                            val = p1 if rd.read(1) else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.read(r)
                            break
                        # advance over r zero-history coefficients,
                        # emitting correction bits for nonzero-history
                        while k <= se:
                            c = int(blk[k])
                            if c:
                                if rd.read(1) and (c & p1) == 0:
                                    blk[k] = c + (p1 if c >= 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun:
                    while k <= se:  # correction bits through the EOB run
                        c = int(blk[k])
                        if c:
                            if rd.read(1) and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1
            unit += 1


def _prog_finish(frame, coeffs, qt, geom) -> np.ndarray:
    h, w, comps = frame
    hmax, vmax, mcux, mcuy, grids = geom
    a = _dct_matrix()
    planes = []
    for carr, (cid, tq, hs, vs) in zip(coeffs, comps):
        if tq not in qt:
            raise ValueError("jpeg: missing quantization table")
        q = qt[tq].astype(np.float64)
        bhf, bwf = carr.shape[:2]
        n = bhf * bwf
        raster = np.zeros((n, 64), dtype=np.float64)
        raster[:, ZIGZAG] = carr.reshape(n, 64)
        s = raster.reshape(n, 8, 8) * q[None, :, :]
        # per-block a.T @ s @ a, NOT a batched einsum/matmul: the baseline
        # decoder uses this exact expression, and a different float
        # summation order flips floor(x+0.5) at half-integer IDCT values —
        # progressive and baseline decodes of the same coefficients must
        # be byte-identical (test-pinned)
        pix = np.empty_like(s)
        for i in range(n):
            pix[i] = a.T @ s[i] @ a
        pix += 128.0
        planes.append(pix.reshape(bhf, bwf, 8, 8)
                      .transpose(0, 2, 1, 3).reshape(bhf * 8, bwf * 8))
    return _finish(planes, comps, hmax, vmax, h, w)


# ---------------------------------------------------------------------------
# Encode (fixtures + tests)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _enc_tables(dc_syms: list[int], ac_syms: list[int]):
    """Canonical tables: DC categories at 4 bits; AC symbols at uniform
    length ceil(log2(n))+? — assign all AC symbols the same length L with
    2^L >= n (Kraft-legal, decoder-agnostic)."""
    dc_counts = [0] * 16
    dc_counts[3] = len(dc_syms)  # all at length 4
    dc_codes = {s: (i, 4) for i, s in enumerate(sorted(dc_syms))}
    ln = 1
    while (1 << ln) < len(ac_syms) + 1:  # +1 keeps the all-ones code free
        ln += 1
    ac_counts = [0] * 16
    ac_counts[ln - 1] = len(ac_syms)
    ac_codes = {s: (i, ln) for i, s in enumerate(sorted(ac_syms))}
    return (bytes(dc_counts), bytes(sorted(dc_syms)), dc_codes,
            bytes(ac_counts), bytes(sorted(ac_syms)), ac_codes)


def encode_jpeg(y: np.ndarray, cb: "np.ndarray | None" = None,
                cr: "np.ndarray | None" = None,
                restart_interval: int = 0,
                subsample: bool = False,
                std_huffman: bool = False) -> bytes:
    """Planes (uint8; grayscale when cb/cr are None) → baseline JFIF
    bytes with all-ones quantization (integer DCT coefficients round
    exactly for constant blocks — the oracle fixtures) and minimal
    canonical Huffman tables built from the symbols present. A REAL
    forward path (level shift, float64 FDCT, quantization, differential
    DC, run-length AC, byte stuffing, optional DRI/RSTn).

    ``subsample=True`` writes 4:2:0: y is (H, W) with H, W multiples of
    16; cb/cr are the HALF-resolution (H/2, W/2) chroma planes (caller
    downsamples — constant-block fixtures are downsample-invariant).
    Otherwise all planes share (H, W) with multiples of 8 (4:4:4)."""
    h, w = y.shape
    if cb is None and subsample:
        raise ValueError("encoder: subsample needs chroma planes")
    if subsample:
        if h % 16 or w % 16:
            raise ValueError("encoder: dimensions must be multiples of 16")
        if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
            raise ValueError("encoder: chroma must be half-resolution")
        planes = [y, cb, cr]
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        if h % 8 or w % 8:
            raise ValueError("encoder: dimensions must be multiples of 8")
        planes = [y] if cb is None else [y, cb, cr]
        factors = [(1, 1)] * len(planes)
    a = _dct_matrix()
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    nmcu = mcux * mcuy

    # pass 1: quantized coefficient blocks per component, in MCU
    # traversal order (per MCU: ch x cv blocks row-major)
    blocks: list[list[np.ndarray]] = []
    for p, (ch, cv) in zip(planes, factors):
        comp_blocks = []
        shifted = p.astype(np.float64) - 128.0
        for my in range(mcuy):
            for mx in range(mcux):
                for vy in range(cv):
                    for vx in range(ch):
                        r0 = (my * cv + vy) * 8
                        c0 = (mx * ch + vx) * 8
                        s = a @ shifted[r0:r0 + 8, c0:c0 + 8] @ a.T
                        comp_blocks.append(
                            np.round(s).astype(np.int64)
                            .reshape(64)[ZIGZAG])
        blocks.append(comp_blocks)
    bpm = [f[0] * f[1] for f in factors]

    # pass 2: collect symbols (DC prediction resets at restart MCUs)
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}
    for comp_blocks, per_mcu in zip(blocks, bpm):
        pred = 0
        for bi, blk in enumerate(comp_blocks):
            if restart_interval and bi and \
                    bi % (restart_interval * per_mcu) == 0:
                pred = 0
            dc_syms.add(_category(int(blk[0]) - pred))
            pred = int(blk[0])
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _category(v))
                run = 0
    if std_huffman:
        # T.81 Annex K tables (MJPEG/AVI1 convention): luma tables for
        # component 0, chroma tables for components 1-2. Every symbol the
        # image emits must exist in them (AC size <= 10, DC category <=
        # 11 — violated only by pathological coefficient magnitudes).
        dc_l, ac_l = _codes_from_spec(_STD_DC_LUMA), \
            _codes_from_spec(_STD_AC_LUMA)
        dc_c, ac_c = _codes_from_spec(_STD_DC_CHROMA), \
            _codes_from_spec(_STD_AC_CHROMA)
        bad = [s for s in dc_syms if s not in dc_l] + \
            [s for s in ac_syms if s not in ac_l or s not in ac_c]
        if bad:
            raise ValueError(
                f"encoder: symbols outside Annex K tables: {bad[:4]}")
        dc_codes_pc = [dc_l] + [dc_c] * (len(planes) - 1)
        ac_codes_pc = [ac_l] + [ac_c] * (len(planes) - 1)
    else:
        (dcc, dcs, dc_codes, acc_, acs, ac_codes) = _enc_tables(
            sorted(dc_syms), sorted(ac_syms))
        dc_codes_pc = [dc_codes] * len(planes)
        ac_codes_pc = [ac_codes] * len(planes)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    ones = bytes(np.ones(64, dtype=np.uint8))
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + ones
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (factors[ci][0] << 4) | factors[ci][1], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    if std_huffman:
        out += std_dht_segment()
    else:
        dht = b"\x00" + dcc + dcs + b"\x10" + acc_ + acs
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x11 if std_huffman and ci else 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bwr = _BitWriter()
    preds = [0] * nc
    for mcu in range(nmcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bwr.flush()
            out += bytes(bwr.out)
            bwr = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            preds = [0] * nc
        for ci in range(nc):
            dc_codes_c, ac_codes_c = dc_codes_pc[ci], ac_codes_pc[ci]
            for j in range(bpm[ci]):
                blk = blocks[ci][mcu * bpm[ci] + j]
                dc = int(blk[0])
                diff = dc - preds[ci]
                preds[ci] = dc
                cat = _category(diff)
                code, ln = dc_codes_c[cat]
                bwr.write(code, ln)
                if cat:
                    v = diff if diff >= 0 else diff + (1 << cat) - 1
                    bwr.write(v, cat)
                run = 0
                for k in range(1, 64):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes_c[0xF0]
                        bwr.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes_c[(run << 4) | s]
                    bwr.write(code, ln)
                    vv = v if v >= 0 else v + (1 << s) - 1
                    bwr.write(vv, s)
                    run = 0
                if run:
                    code, ln = ac_codes_c[0x00]
                    bwr.write(code, ln)
    bwr.flush()
    out += bytes(bwr.out)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encode (fixtures + tests)
# ---------------------------------------------------------------------------

class _SymCollector:
    """Pass-1 scan interface: records which Huffman symbols a scan emits
    (appended value bits and restarts are bitstream-only — ignored)."""

    def __init__(self):
        self.syms: set[int] = set()

    def symbol(self, s: int) -> None:
        self.syms.add(s)

    def bits(self, v: int, n: int) -> None:
        pass

    def restart(self) -> None:
        pass


class _ScanWriter:
    """Pass-2 scan interface: real bit emission with byte stuffing, plus
    RSTn handling (flush + marker + fresh bit accumulator)."""

    def __init__(self, out: bytearray, codes: dict):
        self.out = out
        self.codes = codes
        self.bwr = _BitWriter()
        self.rst = 0

    def symbol(self, s: int) -> None:
        code, ln = self.codes[s]
        self.bwr.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bwr.write(v, n)

    def restart(self) -> None:
        self.bwr.flush()
        self.out += bytes(self.bwr.out)
        self.bwr = _BitWriter()
        self.out += bytes([0xFF, 0xD0 + self.rst % 8])
        self.rst += 1

    def finish(self) -> None:
        self.bwr.flush()
        self.out += bytes(self.bwr.out)


def _mk_table(syms):
    """Uniform-length canonical table over the symbols present
    (Kraft-legal: 2^L >= n+1 keeps the all-ones code unused)."""
    syms = sorted(syms)
    ln = 1
    while (1 << ln) < len(syms) + 1:
        ln += 1
    counts = [0] * 16
    counts[ln - 1] = len(syms)
    codes = {s: (i, ln) for i, s in enumerate(syms)}
    return bytes(counts), bytes(syms), codes


def _comp_coeff_grid(p: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) → (bh, bw, 64) zigzag-ordered quantized
    (all-ones) coefficient grid — the same FDCT/rounding as encode_jpeg."""
    a = _dct_matrix()
    h, w = p.shape
    bh, bw = h // 8, w // 8
    shifted = p.astype(np.float64) - 128.0
    # per-block a @ blk @ a.T, NOT a batched einsum: encode_jpeg uses this
    # exact expression and a different float summation order flips
    # banker's np.round at .5-boundary FDCT values — both encoders must
    # quantize identically for progressive-vs-baseline decode equality
    out = np.empty((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            s = a @ shifted[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ a.T
            out[by, bx] = np.round(s).astype(np.int64).reshape(64)[ZIGZAG]
    return out


def _scan_dc_first(wio, grids, factors, mcux, mcuy, al, ri) -> None:
    nc = len(grids)
    preds = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu and mcu % ri == 0:
                wio.restart()
                preds = [0] * nc
            for ci in range(nc):
                ch, cv = factors[ci]
                for vy in range(cv):
                    for vx in range(ch):
                        dc = int(grids[ci][my * cv + vy,
                                           mx * ch + vx, 0]) >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        cat = _category(diff)
                        wio.symbol(cat)
                        if cat:
                            v = diff if diff >= 0 \
                                else diff + (1 << cat) - 1
                            wio.bits(v & ((1 << cat) - 1), cat)
            mcu += 1


def _scan_dc_refine(wio, grids, factors, mcux, mcuy, al, ri) -> None:
    nc = len(grids)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu and mcu % ri == 0:
                wio.restart()
            for ci in range(nc):
                ch, cv = factors[ci]
                for vy in range(cv):
                    for vx in range(ch):
                        dc = int(grids[ci][my * cv + vy, mx * ch + vx, 0])
                        wio.bits((dc >> al) & 1, 1)
            mcu += 1


def _scan_ac_first(wio, grid, ss, se, al, ri) -> None:
    bh, bw = grid.shape[:2]
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            wio.symbol(r << 4)
            wio.bits(eobrun - (1 << r), r)
            eobrun = 0

    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                flush_eob()
                wio.restart()
            blk = grid[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    wio.symbol(0xF0)  # ZRL
                    run -= 16
                s = t.bit_length()
                wio.symbol((run << 4) | s)
                enc = t if v >= 0 else (-t) + (1 << s) - 1
                wio.bits(enc & ((1 << s) - 1), s)
                run = 0
            if run:  # band ends in zeros → block joins the EOB run
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
            unit += 1
    flush_eob()


def _scan_ac_refine(wio, grid, ss, se, al, ri) -> None:
    """libjpeg jcphuff encode_mcu_AC_refine semantics: correction bits
    for already-nonzero coefficients are buffered and emitted after the
    Huffman symbol (ZRL / run-size / EOBn) they trail."""
    bh, bw = grid.shape[:2]
    eobrun = 0
    be: list[int] = []  # correction bits pending behind the EOB run

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            wio.symbol(r << 4)
            wio.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in be:
            wio.bits(b, 1)
        be = []

    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                flush_eob()
                wio.restart()
            blk = grid[by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index AFTER the last newly-significant coefficient
            for j, t in enumerate(absv):
                if t == 1:
                    eob = j + 1
            r = 0
            br: list[int] = []  # corrections pending within this block
            for j, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and j < eob:
                    flush_eob()
                    wio.symbol(0xF0)
                    r -= 16
                    for b in br:
                        wio.bits(b, 1)
                    br = []
                if t > 1:  # history coefficient: correction bit only
                    br.append(t & 1)
                    continue
                flush_eob()  # newly significant: (run, 1) + sign bit
                wio.symbol((r << 4) | 1)
                wio.bits(1 if int(blk[ss + j]) >= 0 else 0, 1)
                for b in br:
                    wio.bits(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
            unit += 1
    flush_eob()


def encode_progressive_jpeg(y: np.ndarray, cb: "np.ndarray | None" = None,
                            cr: "np.ndarray | None" = None,
                            subsample: bool = False,
                            restart_interval: int = 0,
                            al_dc: int = 1, al_ac: int = 1,
                            band_split: int = 6) -> bytes:
    """Planes → progressive (SOF2) JFIF bytes with all-ones quantization.

    Scan script (libjpeg-style spectral selection + successive
    approximation): interleaved DC first at Al=al_dc, per-component AC
    bands [1, band_split-1] and [band_split, 63] at Al=al_ac, then DC and
    AC refinement scans stepping Al down one bit at a time. ``al_dc=0`` /
    ``al_ac=0`` yields pure spectral selection (no refinement scans).
    Same geometry/plane contract as :func:`encode_jpeg` (4:4:4 or
    grayscale with multiple-of-8 dims; ``subsample=True`` 4:2:0 with
    multiple-of-16 luma). Each scan carries its own minimal DHT; restart
    markers (DRI) apply inside every scan."""
    h, w = y.shape
    if cb is None and subsample:
        raise ValueError("encoder: subsample needs chroma planes")
    if subsample:
        if h % 16 or w % 16:
            raise ValueError("encoder: dimensions must be multiples of 16")
        if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
            raise ValueError("encoder: chroma must be half-resolution")
        planes = [y, cb, cr]
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        if h % 8 or w % 8:
            raise ValueError("encoder: dimensions must be multiples of 8")
        planes = [y] if cb is None else [y, cb, cr]
        factors = [(1, 1)] * len(planes)
    nc = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    grids = [_comp_coeff_grid(p) for p in planes]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    ones = bytes(np.ones(64, dtype=np.uint8))
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + ones
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (factors[ci][0] << 4) | factors[ci][1], 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    lo, hi = max(1, min(band_split - 1, 63)), min(band_split, 63)
    scans: list[tuple] = [("dcf", None, 0, 0, 0, al_dc)]
    for ci in range(nc):
        scans.append(("acf", ci, 1, lo, 0, al_ac))
        if hi <= 63 and hi > lo:
            scans.append(("acf", ci, hi, 63, 0, al_ac))
    for a in range(al_dc, 0, -1):
        scans.append(("dcr", None, 0, 0, a, a - 1))
    for a in range(al_ac, 0, -1):
        for ci in range(nc):
            scans.append(("acr", ci, 1, lo, a, a - 1))
            if hi <= 63 and hi > lo:
                scans.append(("acr", ci, hi, 63, a, a - 1))

    ri = restart_interval
    for kind, ci, ss, se, ah, al in scans:

        def run(wio):
            if kind == "dcf":
                _scan_dc_first(wio, grids, factors, mcux, mcuy, al, ri)
            elif kind == "dcr":
                _scan_dc_refine(wio, grids, factors, mcux, mcuy, al, ri)
            elif kind == "acf":
                _scan_ac_first(wio, grids[ci], ss, se, al, ri)
            else:
                _scan_ac_refine(wio, grids[ci], ss, se, al, ri)

        codes: dict = {}
        if kind != "dcr":  # refinement-DC scans emit no Huffman symbols
            col = _SymCollector()
            run(col)
            if col.syms:
                counts, symbols, codes = _mk_table(col.syms)
                tclass = 0 if kind == "dcf" else 1
                dht = bytes([tclass << 4]) + counts + symbols
                out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
        if kind in ("dcf", "dcr"):
            sos = bytes([nc])
            for c in range(nc):
                sos += bytes([c + 1, 0x00])
        else:
            sos = bytes([1, ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        wio = _ScanWriter(out, codes)
        run(wio)
        wio.finish()

    out += b"\xff\xd9"
    return bytes(out)


# zigzag index for raster position (inverse scan): raster -> zigzag slot
ZIGZAG_INV = np.argsort(ZIGZAG)


# ---------------------------------------------------------------------------
# ITU-T T.81 Annex K "typical" Huffman tables (public spec data) and the
# MJPEG/AVI1 missing-DHT convention.
#
# Motion-JPEG frames inside AVI ('MJPG' fourcc, the OpenDML "AVI1" form)
# conventionally OMIT the DHT segment: every frame implicitly uses the
# Annex K tables (luma tables as id 0, chroma as id 1, both classes), and
# the demuxer re-inserts them before handing the frame to a stills
# decoder. `inject_std_huffman` is that re-insertion; `encode_jpeg`'s
# `std_huffman=True` emits a stream coded WITH these tables so the
# stripped form is producible (and the injection path testable) in-sandbox.
# ---------------------------------------------------------------------------

_STD_DC_LUMA = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_STD_DC_CHROMA = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_STD_AC_LUMA = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)
_STD_AC_CHROMA = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)


def _codes_from_spec(spec: "tuple[bytes, bytes]") -> dict:
    """(bits, vals) DHT spec → {symbol: (code, length)} via the canonical
    JPEG code assignment (T.81 C.2)."""
    bits, vals = spec
    codes: dict = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return codes


def std_dht_segment() -> bytes:
    """The single DHT marker segment carrying all four Annex K tables
    (DC0/AC0 luma, DC1/AC1 chroma) — what an MJPEG demuxer splices into
    an AVI1 frame."""
    body = b""
    for tclass, tid, spec in ((0, 0, _STD_DC_LUMA), (1, 0, _STD_AC_LUMA),
                              (0, 1, _STD_DC_CHROMA),
                              (1, 1, _STD_AC_CHROMA)):
        bits, vals = spec
        body += bytes([(tclass << 4) | tid]) + bits + vals
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _walk_to_sos(payload: bytes):
    """Yield (marker, seg_start) for each marker segment from SOI up to and
    including the first SOS; raises ValueError on malformed streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        m = payload[pos + 1]
        seg = pos
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            yield m, seg
            continue
        size = struct.unpack(">H", payload[pos:pos + 2])[0]
        yield m, seg
        if m == 0xDA:
            return
        pos += size
    raise ValueError("jpeg: no SOS marker")


def has_dht(payload: bytes) -> bool:
    return any(m == 0xC4 for m, _ in _walk_to_sos(payload))


def inject_std_huffman(payload: bytes) -> bytes:
    """AVI1/MJPEG convention: if the frame carries no DHT before its first
    SOS, splice the Annex K tables in front of the SOS; otherwise return
    the frame unchanged."""
    sos_at = None
    for m, seg in _walk_to_sos(payload):
        if m == 0xC4:
            return payload
        if m == 0xDA:
            sos_at = seg
    if sos_at is None:
        raise ValueError("jpeg: no SOS marker")
    return payload[:sos_at] + std_dht_segment() + payload[sos_at:]


def strip_dht(payload: bytes) -> bytes:
    """Remove every DHT segment before the first SOS (the AVI1 writer's
    side of the convention — tests/fixtures twin of
    :func:`inject_std_huffman`)."""
    cuts = []
    for m, seg in _walk_to_sos(payload):
        if m == 0xC4:
            size = struct.unpack(">H", payload[seg + 2:seg + 4])[0]
            cuts.append((seg, seg + 2 + size))
    out = bytearray()
    prev = 0
    for s, e in cuts:
        out += payload[prev:s]
        prev = e
    out += payload[prev:]
    return bytes(out)
