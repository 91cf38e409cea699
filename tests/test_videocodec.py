"""AVI (uncompressed DIB) codec tests."""

import numpy as np
import pytest

from engine.videocodec import decode_avi, encode_avi

RNG = np.random.RandomState(5)


def test_avi_roundtrip_padded_and_aligned():
    for w in (6, 7, 8):  # strides 20(pad), 24(pad from 21), 24(aligned)
        frames = [RNG.randint(0, 256, (9, w, 3)).astype(np.uint8)
                  for _ in range(4)]
        out = decode_avi(encode_avi(frames))
        assert len(out) == 4
        for a, b in zip(frames, out):
            assert (a == b).all()


def test_avi_single_frame_and_fps():
    f = [np.full((2, 2, 3), 9, np.uint8)]
    assert (decode_avi(encode_avi(f, fps=30))[0] == f[0]).all()


def test_avi_error_paths():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x10\x00\x00\x00WAVEdata")      # not AVI
    good = encode_avi([np.zeros((3, 3, 3), np.uint8)])
    with pytest.raises(ValueError):
        decode_avi(good[:80])                             # truncated
    with pytest.raises(ValueError):
        encode_avi([])
    with pytest.raises(ValueError):
        encode_avi([np.zeros((3, 3, 3), np.uint8),
                    np.zeros((4, 3, 3), np.uint8)])       # shape mismatch
