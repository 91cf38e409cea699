"""Real stdlib WAV codec (engine/audiocodec.py) + the audio stats stage."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from engine.audiocodec import decode_wav, encode_wav
from engine.multimodal import MediaDecodeError, _decode_audio


def test_mono_roundtrip_exact():
    s = np.array([0, 1, -1, 32767, -32768, 123, -456], dtype=np.int16)
    pcm, rate = decode_wav(encode_wav(s, rate=22050))
    assert rate == 22050
    assert pcm.dtype == np.float32
    assert (np.round(pcm.astype(np.float64) * 32768).astype(np.int16)
            == s).all()


def _stereo_wav(left: np.ndarray, right: np.ndarray, rate: int) -> bytes:
    inter = np.empty(len(left) * 2, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    pcm = inter.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate,
                                    rate * 4, 4, 16)
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def test_stereo_downmix_is_exact_mean():
    left = np.array([100, -200, 300], dtype=np.int16)
    right = np.array([300, 200, -100], dtype=np.int16)
    pcm, _ = decode_wav(_stereo_wav(left, right, 16000))
    want = (left.astype(np.float64) + right) / (2 * 32768.0)
    assert np.allclose(pcm, want, atol=0)


def test_extra_chunks_and_word_alignment():
    # a 3-byte odd-sized LIST chunk before fmt/data must be skipped with pad
    body = encode_wav(np.array([7, -7], dtype=np.int16))
    injected = (body[:12] + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
                + body[12:])
    fixed = injected[:4] + struct.pack("<I", len(injected) - 8) + injected[8:]
    pcm, _ = decode_wav(fixed)
    assert (np.round(pcm * 32768).astype(int) == [7, -7]).all()


@pytest.mark.parametrize("bad", [
    b"", b"RIFFxxxxWAVE",                                   # no chunks
    b"RIFX" + b"\x00" * 40,                                  # bad magic
    encode_wav(np.array([1], dtype=np.int16))[:20],          # truncated
])
def test_error_paths(bad):
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_decode_audio_routes_riff():
    s = np.arange(-5, 5, dtype=np.int16)
    pcm = _decode_audio(encode_wav(s))
    assert (np.round(pcm * 32768).astype(np.int16) == s).all()
    with pytest.raises(MediaDecodeError):
        _decode_audio(b"RIFF" + b"\x00" * 30)  # corrupt RIFF never stubs


def test_audio_stats_stage(ray_session):
    import ray.data as rd

    from engine.multimodal import audio_stats

    rows, want = [], {}
    for i in range(20):
        s = (np.arange(16 + i, dtype=np.int64) * (1 + i % 3) - 7)
        rows.append({"media_id": i,
                     "payload": encode_wav(s.astype(np.int16))})
        want[i] = (len(s), int(s.sum()))
    out = (audio_stats(rd.from_items(rows), batch_size=6)
           .to_pandas().set_index("media_id"))
    for i, (n, tot) in want.items():
        assert (out.loc[i, "n_samples"], out.loc[i, "sum_s"]) == (n, tot)
        assert out.loc[i, "status"] == "ok"
