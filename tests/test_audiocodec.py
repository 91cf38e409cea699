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


# --- G.711 (fmt 6/7) and IMA ADPCM (fmt 0x11) -------------------------------

def _ulaw_ref(b: int) -> int:
    # independent µ-law expansion (G.711 spec form, not the table builder)
    b ^= 0xFF
    mag = 4 * (((2 * (b & 15) + 33) << ((b >> 4) & 7)) - 33)
    return -mag if b & 0x80 else mag


def _alaw_ref(b: int) -> int:
    a = b ^ 0x55
    seg, mant = (a >> 4) & 7, a & 15
    mag = 8 * (2 * mant + 1 if seg == 0 else (2 * mant + 33) << (seg - 1))
    return mag if a & 0x80 else -mag


def test_g711_tables_match_spec():
    from engine.audiocodec import _ALAW, _ULAW

    for b in range(256):
        assert _ULAW[b] == _ulaw_ref(b)
        assert _ALAW[b] == _alaw_ref(b)


def test_g711_container_decode_exact():
    from engine.audiocodec import _ALAW, _ULAW, encode_wav_g711

    enc = bytes(range(256))
    for law, table in (("ulaw", _ULAW), ("alaw", _ALAW)):
        pcm, rate = decode_wav(encode_wav_g711(enc, law, rate=8000))
        assert rate == 8000
        got = np.round(pcm.astype(np.float64) * 32768).astype(int)
        assert (got == table[np.arange(256)]).all()


def _ima_ref(pred: int, idx: int, nibs: list) -> list:
    from engine.audiocodec import _IMA_INDEX, _IMA_STEPS

    out = [pred]
    for d in nibs:
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if d & 1:
            diff += step >> 2
        if d & 2:
            diff += step >> 1
        if d & 4:
            diff += step
        pred = max(-32768, min(32767, pred - diff if d & 8 else pred + diff))
        idx = max(0, min(88, idx + int(_IMA_INDEX[d & 7])))
        out.append(pred)
    return out


def test_adpcm_mono_matches_scalar_reference():
    from engine.audiocodec import encode_wav_adpcm

    rng = np.random.RandomState(3)
    for _ in range(25):
        pred = int(rng.randint(-32768, 32768))
        idx = int(rng.randint(0, 89))
        nibs = rng.randint(0, 16, 8 * int(rng.randint(1, 12))).astype(np.uint8)
        pcm, _ = decode_wav(encode_wav_adpcm(pred, idx, nibs))
        got = np.round(pcm.astype(np.float64) * 32768).astype(int)
        assert list(got) == _ima_ref(pred, idx, list(nibs))


def test_adpcm_clamps_saturate():
    from engine.audiocodec import encode_wav_adpcm

    # all-7 nibbles from a high predictor walk the step index up to 88
    # and the predictor into the +32767 clamp; all-15 down to -32768
    up = np.full(32, 7, dtype=np.uint8)
    pcm, _ = decode_wav(encode_wav_adpcm(30000, 88, up))
    assert int(round(float(pcm[-1]) * 32768)) == 32767
    down = np.full(32, 15, dtype=np.uint8)
    pcm, _ = decode_wav(encode_wav_adpcm(-30000, 88, down))
    assert int(round(float(pcm[-1]) * 32768)) == -32768


def test_adpcm_stereo_interleave_and_downmix():
    import struct

    from engine.audiocodec import decode_wav

    rng = np.random.RandomState(9)
    chans = []
    for _ in range(2):
        nib = rng.randint(0, 16, 16).astype(np.uint8)
        chans.append((int(rng.randint(-1000, 1000)), 20, nib))
    parts = []
    bodies = []
    for pred, idx, nib in chans:
        parts.append(struct.pack("<hBB", pred, idx, 0))
        bodies.append((nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
                      .tobytes())
    body = b"".join(bodies[0][w:w + 4] + bodies[1][w:w + 4]
                    for w in range(0, len(bodies[0]), 4))
    data = parts[0] + parts[1] + body
    fmtc = struct.pack("<IHHIIHHHH", 20, 0x11, 2, 8000, 8000, len(data),
                       4, 2, 17)
    payload = (b"RIFF" + struct.pack("<I", 8 + len(fmtc) + 8 + len(data))
               + b"WAVE" + b"fmt " + fmtc
               + b"data" + struct.pack("<I", len(data)) + data)
    pcm, _ = decode_wav(payload)
    got = np.round(pcm.astype(np.float64) * 2 * 32768).astype(int)
    want = [a + b for a, b in zip(
        _ima_ref(chans[0][0], chans[0][1], list(chans[0][2])),
        _ima_ref(chans[1][0], chans[1][1], list(chans[1][2])))]
    assert list(got) == want


def test_adpcm_error_paths():
    from engine.audiocodec import encode_wav_adpcm

    good = encode_wav_adpcm(0, 0, np.zeros(8, dtype=np.uint8))
    # corrupt step index (> 88) in the block header
    bad = bytearray(good)
    bad[-10] = 120  # index byte of the 12-byte block (header at -12)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        encode_wav_adpcm(0, 0, np.zeros(6, dtype=np.uint8))  # partial word


def test_g711_adpcm_through_audio_stats(ray_session):
    import ray.data as rd

    from engine.audiocodec import (_ULAW, encode_wav_adpcm, encode_wav_g711)
    from engine.multimodal import audio_stats

    rows, want = [], {}
    for i in range(12):
        if i % 2:
            by = bytes((5 * i + 3 * k) % 256 for k in range(40))
            rows.append({"media_id": i, "payload": encode_wav_g711(by)})
            want[i] = (40, int(_ULAW[np.frombuffer(by, np.uint8)].sum()))
        else:
            nib = ((i + np.arange(16)) % 16).astype(np.uint8)
            rows.append({"media_id": i,
                         "payload": encode_wav_adpcm(i * 100 - 600, i % 89,
                                                     nib)})
            want[i] = (17, sum(_ima_ref(i * 100 - 600, i % 89, list(nib))))
    out = (audio_stats(rd.from_items(rows), batch_size=5)
           .to_pandas().set_index("media_id"))
    for i, (n, tot) in want.items():
        assert (out.loc[i, "n_samples"], out.loc[i, "sum_s"]) == (n, tot)
