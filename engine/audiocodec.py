"""REAL audio codec on the stdlib: WAV (RIFF) PCM decode/encode.

Same motivation as engine/imagecodec.py: the sandbox ships no soundfile,
but uncompressed WAV is just a RIFF header over raw PCM — stdlib struct +
numpy decode it exactly. Compressed audio (mp3/ogg/flac) stays behind the
soundfile deployment gate in engine/multimodal.py.

Support: RIFF/WAVE, fmt tag 1 (integer PCM) with 16-bit samples, any
channel count (downmixed to mono by exact integer sum — sum fits int32 for
≤ 65536 channels, and the mean is taken in float64), any sample rate.
Raises ``ValueError`` outside the matrix; the media stages map that to the
per-row error channel.
"""

from __future__ import annotations

import struct

import numpy as np


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
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if channels < 1:
        raise ValueError("bad WAV channel count")
    usable = len(data) - (len(data) % (2 * channels))
    pcm = np.frombuffer(data, dtype="<i2", count=usable // 2)
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
