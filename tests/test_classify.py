"""Hashed linear classifier (engine/classify.py) — broadcast-weight scoring."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from engine.classify import (DEFAULT_DIM, _hash_buckets, hashed_linear_scores,
                             planted_weights)


def _ref_score(text: str, w: np.ndarray) -> int:
    s = 0
    for tok in text.split():
        b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % len(w)
        s += int(w[b])
    return s


def test_planted_weights():
    w = planted_weights(8)
    assert w.dtype == np.int64
    assert list(w) == [(b % 1001) - 500 for b in range(8)]


def test_hash_buckets_match_md5_slice():
    toks = np.array(["alpha", "beta", "汉字"], dtype=object)
    got = _hash_buckets(toks, 4096)
    want = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 4096
            for t in toks]
    assert list(got) == want


ROWS = [
    {"doc_id": 0, "text": "the quick brown fox jumps"},
    {"doc_id": 1, "text": "  leading and   irregular  spacing "},
    {"doc_id": 2, "text": ""},                      # zero tokens -> score 0
    {"doc_id": 3, "text": "repeated repeated repeated"},
    {"doc_id": 4, "text": "unicode tökens müssen zählen"},
]


def test_scores_match_scalar_reference(ray_session):
    import ray.data as rd

    w = planted_weights(DEFAULT_DIM)
    out = hashed_linear_scores(rd.from_items(ROWS), w).to_pandas()
    got = dict(zip(out["doc_id"], out["score"]))
    for r in ROWS:
        assert got[r["doc_id"]] == _ref_score(r["text"], w), r


def test_broadcast_ref_parity_and_parallelism_invariance(ray_session):
    import ray
    import ray.data as rd

    w = planted_weights(DEFAULT_DIM)
    ref = ray.put(w)
    many = [{"doc_id": i, "text": f"tok{i % 7} tok{i % 13} filler word"}
            for i in range(200)]
    a = (hashed_linear_scores(rd.from_items(many).repartition(1), w)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (hashed_linear_scores(
            rd.from_items(many).repartition(16), ref, dim=DEFAULT_DIM)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_ref_requires_dim(ray_session):
    import ray
    import ray.data as rd

    with pytest.raises(ValueError):
        hashed_linear_scores(rd.from_items(ROWS), ray.put(planted_weights()))


def test_null_text_scores_zero(ray_session):
    import pyarrow as pa
    import ray.data as rd

    w = planted_weights(64)
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1], "text": pa.array(["hello", None])}))
    out = hashed_linear_scores(ds, w).to_pandas().set_index("doc_id")
    assert out.loc[1, "score"] == 0
