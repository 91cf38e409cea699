"""Multimodal plumbing tests: schema, actor signature, error channel.

Decode is stubbed (no codec libs in the container — engine/multimodal.py);
the Ray-side plumbing is real and exercised here.
"""

from __future__ import annotations

import numpy as np

from engine import multimodal as mm


def test_decode_stubs_deterministic():
    img = mm._decode_image(b"payload-bytes")
    img2 = mm._decode_image(b"payload-bytes")
    assert (img == img2).all()
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8


def test_feature_kernels_shape():
    img = mm._decode_image(b"x" * 100)
    f = mm.image_features(img)
    assert f.shape == (mm.FEATURE_DIM,)
    pcm = mm._decode_audio(b"y" * 100)
    fa = mm.audio_features(pcm)
    assert fa.shape == (mm.FEATURE_DIM,)


def test_media_pipeline(ray_session):
    import ray.data as rd

    table = mm.gen_media_table(30, seed=5)
    ds = rd.from_arrow(table)
    out = mm.media_features(ds, batch_size=8, concurrency=(1, 2)).take_all()
    assert len(out) == 30
    by_id = {r["media_id"]: r for r in out}
    # empty payloads (every 17th row) land in the error channel, others ok
    assert by_id[0]["status"] == "failed"
    assert "empty" in by_id[0]["error"]
    assert by_id[1]["status"] == "ok"
    assert len(by_id[1]["features"]) == mm.FEATURE_DIM
    # determinism: same payload → same features
    out2 = mm.media_features(rd.from_arrow(table), batch_size=4,
                             concurrency=(1, 1)).take_all()
    by_id2 = {r["media_id"]: r for r in out2}
    for i in (1, 2, 3):
        assert by_id[i]["features"] == by_id2[i]["features"]
        assert by_id[i]["sha256"] == by_id2[i]["sha256"]


def test_features_compose_with_similarity(ray_session):
    import ray.data as rd
    from engine import similarity

    table = mm.gen_media_table(31, seed=6)
    feats = mm.media_features(rd.from_arrow(table), batch_size=8,
                              concurrency=(1, 2))
    ok = feats.map_batches(
        lambda t: t.filter(
            __import__("pyarrow").compute.equal(t["status"], "ok")
        ),
        batch_format="pyarrow",
    ).materialize()
    row = ok.take(1)[0]
    out = similarity.knn_brute(ok, np.array([row["features"]]), k=3,
                               id_col="media_id", vec_col="features")
    assert out["vec_id"].iloc[0] == row["media_id"]  # self-match first


def test_resize_stage(ray_session):
    import numpy as np
    import ray.data as rd

    from engine.multimodal import (gen_media_table, resize_image,
                                   resize_images, _decode_image)

    # kernel: exact nearest-neighbor semantics
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = resize_image(img, 2, 3)
    assert small.shape == (2, 3, 3)
    assert (small[0, 0] == img[0, 0]).all()
    assert (small[1, 2] == img[2, 4]).all()
    up = resize_image(img, 8, 8)
    assert up.shape == (8, 8, 3)

    # stage: images only, fixed-size tensors, per-row failure isolation
    import pyarrow.compute as _pc

    media = rd.from_arrow(gen_media_table(30, seed=7))
    imgs = media.map_batches(
        lambda t: t.filter(_pc.equal(t["kind"], "image")),
        batch_format="pyarrow")
    payloads = {r["media_id"]: r["payload"] for r in imgs.take_all()}
    out = resize_images(imgs, target_h=16, target_w=16).take_all()
    # the fixture plants empty payloads: those fail PER ROW, the rest resize
    for r in out:
        if payloads[r["media_id"]]:
            assert r["status"] == "ok"
            assert len(r["tensor"]) == 16 * 16 * 3
            expected = resize_image(
                _decode_image(payloads[r["media_id"]]), 16, 16).tobytes()
            assert r["tensor"] == expected
        else:
            assert r["status"] == "failed" and r["tensor"] == b""
    assert any(r["status"] == "ok" for r in out)


def test_video_frames_real_avi():
    import numpy as np

    from engine.multimodal import _sample_video_frames
    from engine.videocodec import encode_avi

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (8, 6, 3)).astype(np.uint8)
              for _ in range(10)]
    payload = encode_avi(frames)
    got = _sample_video_frames(payload, num_frames=4)
    # evenly sampled: indices 0, 2, 5, 7
    for g, idx in zip(got, [0, 2, 5, 7]):
        assert (g == frames[idx]).all()
