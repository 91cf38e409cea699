"""Round-5b operator tests: Motion-JPEG AVI decode (the compressed-video
lane) and the T.81 Annex K standard-table / AVI1 missing-DHT machinery."""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Annex K standard tables + inject/strip (jpegcodec)
# ---------------------------------------------------------------------------

def test_std_tables_kraft_and_sizes():
    from engine.jpegcodec import (_STD_AC_CHROMA, _STD_AC_LUMA,
                                  _STD_DC_CHROMA, _STD_DC_LUMA,
                                  _codes_from_spec, std_dht_segment)

    for spec, nsyms in ((_STD_DC_LUMA, 12), (_STD_DC_CHROMA, 12),
                        (_STD_AC_LUMA, 162), (_STD_AC_CHROMA, 162)):
        codes = _codes_from_spec(spec)
        assert len(codes) == nsyms
        # Kraft sum strictly < 1 (the all-ones code is reserved)
        assert sum(2.0 ** -ln for _, ln in codes.values()) < 1.0
        # prefix-free: no code is a prefix of another
        as_bits = sorted(format(c, f"0{ln}b") for c, ln in codes.values())
        for a, b in zip(as_bits, as_bits[1:]):
            assert not b.startswith(a)
    # the classic fixed-DHT blob is 0x01A2 = 418 payload bytes
    assert len(std_dht_segment()) == 420


def test_std_huffman_encode_decodes_identically():
    from engine.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    y = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg(y, std_huffman=True))
            == decode_jpeg(encode_jpeg(y))).all()
    # color 4:4:4 exercises the chroma tables
    planes = [rng.randint(0, 256, (16, 16)).astype(np.uint8)
              for _ in range(3)]
    assert (decode_jpeg(encode_jpeg(*planes, std_huffman=True))
            == decode_jpeg(encode_jpeg(*planes))).all()
    # restart markers under std tables
    assert (decode_jpeg(encode_jpeg(y, restart_interval=2,
                                    std_huffman=True))
            == decode_jpeg(encode_jpeg(y))).all()


def test_strip_and_inject_roundtrip():
    from engine.jpegcodec import (decode_jpeg, encode_jpeg, has_dht,
                                  inject_std_huffman, strip_dht)

    rng = np.random.RandomState(11)
    y = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    full = encode_jpeg(y, std_huffman=True)
    bare = strip_dht(full)
    assert has_dht(full) and not has_dht(bare)
    assert len(bare) == len(full) - 420
    with pytest.raises(ValueError):
        decode_jpeg(bare)  # no tables, no decode
    assert (decode_jpeg(inject_std_huffman(bare))
            == decode_jpeg(full)).all()
    # already has tables -> unchanged
    assert inject_std_huffman(full) == full


def test_std_huffman_covers_extreme_images():
    # Annex K coverage is total for 8-bit input: the max |AC| any uint8
    # image can produce under all-ones quantization is ~924 (< 1024, AC
    # size <= 10) and |DC diff| <= 2040 (< 2048, DC category <= 11), so
    # even max-contrast patterns encode — pin that with the worst cases.
    from engine.jpegcodec import decode_jpeg, encode_jpeg

    checker = np.zeros((8, 8), np.uint8)
    checker[::2, ::2] = 255
    checker[1::2, 1::2] = 255
    cols = np.zeros((8, 16), np.uint8)
    cols[:, ::2] = 255
    for y in (checker, cols):
        assert (decode_jpeg(encode_jpeg(y, std_huffman=True))
                == decode_jpeg(encode_jpeg(y))).all()


# ---------------------------------------------------------------------------
# MJPEG AVI lane (videocodec)
# ---------------------------------------------------------------------------

def test_mjpg_grayscale_roundtrip_exact():
    from engine.videocodec import decode_avi, encode_avi

    frames = [np.full((16, 24, 3), v, np.uint8) for v in (0, 133, 255)]
    back = decode_avi(encode_avi(frames, codec="MJPG"))
    assert len(back) == 3
    for f, b in zip(frames, back):
        assert b.shape == (16, 24, 3) and (b == f).all()


def test_mjpg_avi1_stripped_dht_roundtrip():
    from engine.videocodec import decode_avi, encode_avi

    frames = [np.full((8, 8, 3), v, np.uint8) for v in (5, 250)]
    full = encode_avi(frames, codec="MJPG")
    bare = encode_avi(frames, codec="MJPG", avi1=True)
    # the avi1 frames carry no DHT at all (the non-avi1 form carries the
    # compact custom tables, so it is longer even before Annex K padding)
    assert len(bare) < len(full)
    from engine.jpegcodec import has_dht

    movi = bare.split(b"movi", 1)[1]
    at = movi.find(b"\xff\xd8")
    assert at >= 0 and not has_dht(movi[at:])
    back = decode_avi(bare)
    for f, b in zip(frames, back):
        assert (b == f).all()


def test_mjpg_color_roundtrip_close():
    from engine.videocodec import decode_avi, encode_avi

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    back = decode_avi(encode_avi([img], codec="MJPG"))[0]
    # all-ones quantization: the only loss is the BT.601 there-and-back
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 3


def test_mjpg_mixed_frame_content():
    from engine.videocodec import decode_avi, encode_avi

    rng = np.random.RandomState(5)
    gray = np.full((8, 16, 3), 77, np.uint8)
    noise = rng.randint(0, 256, (8, 16, 3)).astype(np.uint8)
    back = decode_avi(encode_avi([gray, noise, gray], codec="MJPG"))
    assert (back[0] == 77).all() and (back[2] == 77).all()
    assert np.abs(back[1].astype(int) - noise.astype(int)).max() <= 3


def test_mjpg_errors():
    from engine.videocodec import decode_avi, encode_avi

    g = np.full((8, 8, 3), 9, np.uint8)
    with pytest.raises(ValueError, match="codec"):
        encode_avi([g], codec="H264")
    with pytest.raises(ValueError, match="avi1"):
        encode_avi([g], avi1=True)
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_avi([np.full((6, 6, 3), 1, np.uint8)], codec="MJPG")
    # corrupt frame payload inside an MJPG AVI -> clear error
    avi = bytearray(encode_avi([g], codec="MJPG"))
    at = avi.find(b"\xff\xd8")
    avi[at] = 0x00
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi(bytes(avi))


def test_mjpg_through_video_stats(ray_session):
    import ray.data as rd

    from engine.multimodal import video_stats
    from engine.videocodec import encode_avi

    rows = []
    for i in range(12):
        g = np.full((8, 8 * (1 + i % 2), 3), (i * 17) % 256, np.uint8)
        rows.append({
            "media_id": i,
            "payload": encode_avi([g] * (1 + i % 3), codec="MJPG",
                                  avi1=(i % 2 == 0)),
        })
    out = video_stats(rd.from_items(rows).repartition(3)).to_pandas() \
        .set_index("media_id").sort_index()
    for i in range(12):
        w = 8 * (1 + i % 2)
        assert out.loc[i, "status"] == "ok"
        assert out.loc[i, "n_frames"] == 1 + i % 3
        assert out.loc[i, "width"] == w
        assert out.loc[i, "sum_r"] == 8 * w * ((i * 17) % 256)
