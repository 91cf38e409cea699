"""REAL video codec on the stdlib: AVI with uncompressed-DIB or
Motion-JPEG frames.

The multimodal verdict line was 'video decode = stub' because the sandbox
ships no ffmpeg — but an uncompressed AVI is just RIFF chunking (the WAV
container, engine/audiocodec.py) over BMP pixel arrays (engine/imagecodec.py
conventions: BGR, bottom-up, 4-byte row stride), and an MJPEG AVI is the
same chunking over per-frame JPEGs, which engine/jpegcodec.py decodes for
real (baseline + progressive). Round 5 adds the MJPG lane, making
COMPRESSED video decode real in-sandbox for the one codec whose frame
format the repo already implements; ffmpeg stays the deployment-gated
path for H.264/VP9/… (engine/multimodal.py).

Support matrix (raises ``ValueError`` outside it):
- RIFF/'AVI ' container, one video stream, frames in '00db'/'00dc' chunks
  of the 'movi' list.
- 'strf' BITMAPINFOHEADER with biCompression=0 and biBitCount=24: raw DIB
  frames (a '00dc' chunk is accepted only because encoders write raw DIB
  under either id when biCompression=0).
- biCompression='MJPG': each frame chunk is a JPEG. The OpenDML "AVI1"
  convention is honored: frames with no DHT segment implicitly use the
  T.81 Annex K tables, re-injected per frame via
  ``jpegcodec.inject_std_huffman`` before decoding.
- The encoder (fixtures/tests twin) writes a minimal deterministic header
  set: avih + strh/strf + movi; no index chunk ('idx1' is optional per the
  spec and ignored by this decoder). ``codec="MJPG"`` encodes frames
  through ``jpegcodec.encode_jpeg`` — exact for grayscale input (all-ones
  quantization), BT.601 4:4:4 for color; ``avi1=True`` writes the
  stripped-DHT Annex-K form.
"""

from __future__ import annotations

import struct

import numpy as np

_MJPG = struct.unpack("<I", b"MJPG")[0]


def _chunks(buf: bytes, start: int, end: int):
    """Iterate (fourcc, data_start, data_end) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        data_start = pos + 8
        data_end = min(data_start + size, end)
        yield cid, data_start, data_end
        pos = data_start + size + (size & 1)  # chunks are word-aligned


def _find_strf_and_frames(buf: bytes, start: int, end: int,
                          state: dict) -> None:
    for cid, s, e in _chunks(buf, start, end):
        if cid == b"LIST":
            _find_strf_and_frames(buf, s + 4, e, state)
        elif cid == b"strf" and "header" not in state:
            state["header"] = buf[s:e]
        elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
            state.setdefault("frames", []).append((s, e))


def decode_avi(payload: bytes) -> "list[np.ndarray]":
    """AVI bytes → list of HxWx3 uint8 RGB frames (see module matrix)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    state: dict = {}
    _find_strf_and_frames(payload, 12, len(payload), state)
    hdr = state.get("header")
    if hdr is None or len(hdr) < 40:
        raise ValueError("AVI: missing/truncated strf BITMAPINFOHEADER")
    w, h = struct.unpack("<ii", hdr[4:12])
    bpp = struct.unpack("<H", hdr[14:16])[0]
    comp = struct.unpack("<I", hdr[16:20])[0]
    if comp == _MJPG:
        from engine.jpegcodec import decode_jpeg, inject_std_huffman

        frames = []
        for s, e in state.get("frames", []):
            try:
                frames.append(decode_jpeg(inject_std_huffman(payload[s:e])))
            except ValueError as exc:
                raise ValueError(f"AVI/MJPG: bad frame ({exc})") from exc
        if not frames:
            raise ValueError("AVI: no video frames")
        return frames
    if bpp != 24 or comp != 0:
        raise ValueError(f"AVI: unsupported stream (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("AVI: bad frame dimensions")
    stride = (w * 3 + 3) & ~3
    frames = []
    for s, e in state.get("frames", []):
        raw = payload[s:e]
        if len(raw) < stride * h:
            raise ValueError("AVI: truncated frame chunk")
        rows = np.frombuffer(raw[:stride * h], np.uint8).reshape(h, stride)
        img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
        if not top_down:
            img = img[::-1]
        frames.append(np.ascontiguousarray(img))
    if not frames:
        raise ValueError("AVI: no video frames")
    return frames


def _rgb_to_jpeg(img: np.ndarray, std_huffman: bool) -> bytes:
    """One RGB frame → JPEG bytes: grayscale plane when R==G==B everywhere
    (EXACT through the all-ones-quantization codec), else BT.601 4:4:4."""
    from engine.jpegcodec import _round_half_up_clip, encode_jpeg

    if (img[..., 0] == img[..., 1]).all() and \
            (img[..., 1] == img[..., 2]).all():
        return encode_jpeg(img[..., 0], std_huffman=std_huffman)
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = _round_half_up_clip(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _round_half_up_clip(128.0 - 0.168735892 * r - 0.331264108 * g
                             + 0.5 * b)
    cr = _round_half_up_clip(128.0 + 0.5 * r - 0.418687589 * g
                             - 0.081312411 * b)
    return encode_jpeg(y, cb, cr, std_huffman=std_huffman)


def encode_avi(frames: "list[np.ndarray]", fps: int = 10,
               codec: str = "DIB", avi1: bool = False) -> bytes:
    """HxWx3 uint8 RGB frames → deterministic AVI bytes (fixtures/tests
    twin of :func:`decode_avi`). ``codec="MJPG"`` writes Motion-JPEG
    frames (dimensions must be multiples of 8); ``avi1=True`` additionally
    strips the DHT segments (the Annex-K implicit-table form real MJPEG
    AVIs use), exercising the decoder's injection path."""
    if not frames:
        raise ValueError("encode_avi: no frames")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"encode_avi: unsupported codec {codec!r}")
    if avi1 and codec != "MJPG":
        raise ValueError("encode_avi: avi1 requires codec='MJPG'")
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for f in frames:
        img = np.asarray(f, dtype=np.uint8)
        if img.shape != (h, w, 3):
            raise ValueError("encode_avi: inconsistent frame shapes")
        if codec == "MJPG":
            from engine.jpegcodec import strip_dht

            data = _rgb_to_jpeg(img, std_huffman=avi1)
            if avi1:
                data = strip_dht(data)
            body += b"00dc" + struct.pack("<I", len(data)) + data
        else:
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR
            data = rows.tobytes()
            body += b"00db" + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
    movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + bytes(body)

    comp = _MJPG if codec == "MJPG" else 0
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp,
                       stride * h, 0, 0, 0, 0)
    strh = (b"vids" + (b"MJPG" if codec == "MJPG" else b"DIB ")
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames), 0, 0,
                                            0, 0))
    strl_body = (b"strh" + struct.pack("<I", len(strh)) + strh
                 + b"strf" + struct.pack("<I", len(strf)) + strf)
    strl = b"LIST" + struct.pack("<I", 4 + len(strl_body)) + b"strl" \
        + strl_body
    avih = struct.pack("<IIIIIIIIIIIIII", 1_000_000 // fps, 0, 0, 0,
                       len(frames), 0, 1, 0, w, h, 0, 0, 0, 0)
    hdrl_body = b"avih" + struct.pack("<I", len(avih)) + avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" \
        + hdrl_body

    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
