"""FLAC codec tests (engine/flaccodec.py): the full subframe/residual/
stereo decode matrix via encoder roundtrips, CRC tamper detection, and
the distributed audio_stats stage."""

from __future__ import annotations

import numpy as np
import pytest

from engine.flaccodec import (BitReaderMSB, BitWriterMSB, crc8, crc16,
                              _read_utf8_number, _write_utf8_number,
                              decode_flac, encode_flac)


def _check(chans, rate=16000, **kw):
    payload = encode_flac(chans, rate=rate, **kw)
    pcm, r = decode_flac(payload)
    assert r == rate
    want = np.stack([np.asarray(c, np.int64) for c in chans]).sum(0)
    got = np.round(pcm.astype(np.float64) * len(chans) * 32768) \
        .astype(np.int64)
    assert len(got) == len(want)
    assert (got == want).all()
    return payload


def test_subframe_modes_roundtrip():
    rng = np.random.RandomState(5)
    mono = rng.randint(-3000, 3000, 700)
    _check([mono], mode="verbatim")
    for order in range(5):
        _check([mono], mode="fixed", order=order, rice_param=3 + order)
    _check([np.full(500, -123)], mode="constant")
    _check([mono], mode="lpc", lpc_coefs=[5, -3, 1], lpc_shift=2,
           rice_param=6)
    _check([mono], mode="lpc", lpc_coefs=[1], lpc_shift=0, rice_param=6)


def test_residual_variants_roundtrip():
    rng = np.random.RandomState(6)
    mono = rng.randint(-3000, 3000, 768)
    _check([mono], mode="fixed", order=2, porder=2, blocksize=256)
    _check([mono], mode="fixed", order=2, rice2=True, rice_param=7)
    _check([mono], mode="fixed", order=2, escape_raw_bits=17)


def test_stereo_decorrelations_roundtrip():
    rng = np.random.RandomState(7)
    L = rng.randint(-2000, 2000, 600)
    R = rng.randint(-2000, 2000, 600)
    for sm in (None, "left_side", "right_side", "mid_side"):
        _check([L, R], stereo_mode=sm, mode="fixed")
    # odd mid/side values exercise the reconstruction LSB carry
    _check([np.array([1, 2, 5]), np.array([0, -3, 2])],
           stereo_mode="mid_side", mode="verbatim", blocksize=4)


def test_multichannel_and_multiframe():
    rng = np.random.RandomState(8)
    chans = [rng.randint(-100, 100, 1000) for _ in range(3)]
    _check(chans, blocksize=192)  # 6 frames, UTF-8 single-byte numbers
    # >127 frames: multi-byte UTF-8 frame numbers
    long = rng.randint(-50, 50, 200 * 140)
    _check([long], blocksize=200, mode="fixed", order=1)


def test_wasted_bits():
    samples = (np.arange(300, dtype=np.int64) - 150) << 3
    _check([samples], mode="fixed", order=2, wasted=3)
    _check([samples], mode="verbatim", wasted=3)
    with pytest.raises(ValueError):
        encode_flac([samples + 1], mode="verbatim", wasted=3)


def test_utf8_number_roundtrip():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1):
        bw = BitWriterMSB()
        _write_utf8_number(bw, v)
        assert _read_utf8_number(BitReaderMSB(bw.tobytes())) == v


def test_crc_tamper_detection():
    payload = bytearray(_check([np.arange(100, dtype=np.int64)],
                               mode="verbatim"))
    # flip a bit inside the (single) frame body — CRC-16 must catch it
    bad = bytearray(payload)
    bad[-20] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    assert crc8(b"") == 0 and crc16(b"") == 0
    assert crc8(b"\x01") == 0x07
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + bytes(40))
    with pytest.raises(ValueError):
        decode_flac(bytes(payload[:30]))  # truncated metadata/frames


def test_decode_audio_routes_flac():
    from engine.multimodal import MediaDecodeError, _decode_audio

    s = np.arange(-50, 50, dtype=np.int64)
    pcm = _decode_audio(encode_flac([s], mode="fixed", order=1))
    assert (np.round(pcm.astype(np.float64) * 32768).astype(np.int64)
            == s).all()
    with pytest.raises(MediaDecodeError):
        _decode_audio(b"fLaC" + b"\x00" * 10)


def test_flac_through_audio_stats(ray_session):
    import ray.data as rd

    from engine.multimodal import audio_stats

    rows, want = [], {}
    rng = np.random.RandomState(12)
    for i in range(12):
        s = rng.randint(-1000, 1000, 150 + 30 * (i % 4))
        mode = ("fixed", "verbatim", "constant")[i % 3]
        if mode == "constant":
            s = np.full(len(s), int(s[0]))
        rows.append({"media_id": i,
                     "payload": encode_flac([s], blocksize=128, mode=mode)})
        want[i] = (len(s), int(s.sum()))
    out = (audio_stats(rd.from_items(rows), batch_size=5)
           .to_pandas().set_index("media_id"))
    for i, (n, tot) in want.items():
        assert (out.loc[i, "n_samples"], out.loc[i, "sum_s"]) == (n, tot)
        assert out.loc[i, "status"] == "ok"
