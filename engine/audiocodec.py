"""REAL audio codec on the stdlib: WAV (RIFF) PCM decode/encode.

Same motivation as engine/imagecodec.py: the sandbox ships no soundfile,
but uncompressed WAV is just a RIFF header over raw PCM — stdlib struct +
numpy decode it exactly. Compressed audio (mp3/ogg/flac) stays behind the
soundfile deployment gate in engine/multimodal.py.

Support: RIFF/WAVE with
- fmt tag 1 (integer PCM), 16-bit samples, any channel count (downmixed to
  mono by exact integer sum — sum fits int32 for ≤ 65536 channels, and the
  mean is taken in float64), any sample rate;
- fmt tags 6/7 (G.711 A-law / µ-law), 8-bit: decoded by the standard
  CCITT segment/mantissa expansion via a 256-entry int16 table (exact
  integer math, so the DuckDB oracle can reproduce every sample in
  closed form);
- fmt tag 0x11 (IMA/DVI ADPCM), 4-bit: block-structured decode with the
  89-entry step table, per-block (predictor, step-index) header, mono or
  stereo (stereo interleaves 4-byte words per channel).

Raises ``ValueError`` outside the matrix; the media stages map that to the
per-row error channel.
"""

from __future__ import annotations

import struct

import numpy as np


def _build_ulaw_table() -> np.ndarray:
    """G.711 µ-law byte → linear int16 (CCITT expansion, BIAS=0x84)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    """G.711 A-law byte → linear int16 (CCITT expansion, XOR 0x55)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 0x07
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW = _build_ulaw_table()
_ALAW = _build_alaw_table()

# IMA/DVI ADPCM quantizer step table (89 entries) and index adjustments.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_channel(pred: int, index: int,
                        nibbles: np.ndarray) -> np.ndarray:
    """One IMA ADPCM channel: (header predictor, step index, 4-bit codes)
    → int32 samples. The header predictor IS the first output sample
    (samples_per_block = nibbles + 1, the standard WAV convention)."""
    out = np.empty(len(nibbles) + 1, dtype=np.int32)
    out[0] = pred
    for k, d in enumerate(nibbles):
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if d & 1:
            diff += step >> 2
        if d & 2:
            diff += step >> 1
        if d & 4:
            diff += step
        pred = pred - diff if (d & 8) else pred + diff
        pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
        index += int(_IMA_INDEX[d & 7])
        index = 0 if index < 0 else (88 if index > 88 else index)
        out[k + 1] = pred
    return out


def _decode_ima_adpcm(data: bytes, channels: int,
                      block_align: int) -> np.ndarray:
    """fmt 0x11 data chunk → int32 samples, channel-interleaved blocks
    decoded and downmixed by exact integer sum (mono/stereo)."""
    if channels not in (1, 2):
        raise ValueError(f"unsupported ADPCM channel count {channels}")
    header = 4 * channels
    if block_align <= header or block_align % (4 * channels):
        raise ValueError(f"bad ADPCM block align {block_align}")
    mono_parts = []
    for off in range(0, len(data) - (len(data) % block_align), block_align):
        block = data[off:off + block_align]
        chans = []
        for c in range(channels):
            pred, index, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if index > 88:
                raise ValueError(f"bad ADPCM step index {index}")
            # data words: 4 bytes per channel, round-robin by channel
            words = np.frombuffer(block, dtype=np.uint8, offset=header)
            words = words.reshape(-1, 4 * channels)[:, 4 * c:4 * c + 4]
            by = words.reshape(-1)
            nib = np.empty(2 * len(by), dtype=np.uint8)
            nib[0::2] = by & 0x0F          # low nibble first (IMA WAV)
            nib[1::2] = by >> 4
            chans.append(_ima_decode_channel(pred, index, nib))
        mono_parts.append(chans[0] if channels == 1
                          else chans[0] + chans[1])
    if not mono_parts:
        raise ValueError("empty ADPCM data chunk")
    return np.concatenate(mono_parts)


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """WAV bytes → (float32 mono PCM in [-1, 1), sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
            break  # data is the payload; trailing chunks don't matter
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, align, bits = fmt
    if channels < 1:
        raise ValueError("bad WAV channel count")
    if audio_fmt == 1 and bits == 16:
        usable = len(data) - (len(data) % (2 * channels))
        pcm = np.frombuffer(data, dtype="<i2", count=usable // 2)
    elif audio_fmt in (6, 7) and bits == 8:
        table = _ALAW if audio_fmt == 6 else _ULAW
        usable = len(data) - (len(data) % channels)
        pcm = table[np.frombuffer(data, dtype=np.uint8, count=usable)]
    elif audio_fmt == 0x11 and bits == 4:
        mono = _decode_ima_adpcm(data, channels, align).astype(np.float64)
        mono /= channels * 32768.0
        return mono.astype(np.float32), rate
    else:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if channels > 1:
        pcm = pcm.reshape(-1, channels).astype(np.int32).sum(axis=1)
        mono = pcm.astype(np.float64) / (channels * 32768.0)
    else:
        mono = pcm.astype(np.float64) / 32768.0
    return mono.astype(np.float32), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (fixture/test writer, deterministic)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                   rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def encode_wav_g711(encoded: bytes, law: str = "ulaw",
                    rate: int = 8000) -> bytes:
    """Already-G.711-encoded mono bytes → fmt 6/7 WAV container
    (fixture/test writer; the bytes ARE the codewords)."""
    tag = {"alaw": 6, "ulaw": 7}[law]
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(encoded)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, tag, 1, rate,
                                   rate, 1, 8)
           + b"data" + struct.pack("<I", len(encoded)))
    return hdr + encoded


def encode_wav_adpcm(pred: int, index: int, nibbles: "np.ndarray",
                     rate: int = 8000) -> bytes:
    """One mono IMA-ADPCM block (header predictor, step index, 4-bit
    codes, low nibble first) → fmt 0x11 WAV container (fixture writer).
    len(nibbles) must be even (whole data bytes)."""
    nib = np.asarray(nibbles, dtype=np.uint8)
    if len(nib) % 8:
        raise ValueError("nibble count must be a multiple of 8 "
                         "(whole 4-byte data words)")
    by = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8).tobytes()
    block = struct.pack("<hBB", pred, index, 0) + by
    align = len(block)
    spb = len(nib) + 1  # samples per block incl. header predictor
    # fmt extension carries wSamplesPerBlock (cbSize=2), per the WAV spec
    fmtc = struct.pack("<IHHIIHHHH", 20, 0x11, 1, rate,
                       (rate * align) // max(spb, 1), align, 4, 2, spb)
    hdr = (b"RIFF" + struct.pack("<I", 8 + len(fmtc) + 8 + len(block))
           + b"WAVE" + b"fmt " + fmtc
           + b"data" + struct.pack("<I", len(block)))
    return hdr + block
