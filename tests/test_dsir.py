"""DSIR hashed-token importance weights (engine/dsir.py).

Pins the md5 bucket hash, the bit-length ladder, the occurrence (not df)
counting, empty/null-text handling, and Ray parallelism invariance against
a scalar Python reference.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from engine.dsir import (DSIR_BUCKETS, bucket_counts, dsir_score_table,
                         dsir_weights)


def _bucket(tok: str, num_buckets: int = DSIR_BUCKETS) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:4],
                          "big") % num_buckets


def _scalar_weights(raw: list[tuple[int, str | None]],
                    target_ids: set[int],
                    num_buckets: int = DSIR_BUCKETS) -> dict[int, int]:
    tc = np.zeros(num_buckets, dtype=np.int64)
    rc = np.zeros(num_buckets, dtype=np.int64)
    toks = {}
    for i, s in raw:
        toks[i] = [t for t in re.split(r"\s+", s or "") if t]
        for t in toks[i]:
            b = _bucket(t, num_buckets)
            rc[b] += 1
            if i in target_ids:
                tc[b] += 1
    score = np.asarray([int(x + 1).bit_length() for x in tc]) - \
        np.asarray([int(x + 1).bit_length() for x in rc])
    return {i: int(sum(score[_bucket(t, num_buckets)] for t in ts))
            for i, ts in toks.items()}


def test_score_table_ladder():
    got = dsir_score_table(np.array([0, 1, 7]), np.array([3, 0, 7]))
    assert got.tolist() == [-2, 1, 0]


def test_bucket_counts_are_occurrences(ray_session):
    ds = rd.from_items([{"text": "a a b"}, {"text": " a  "},
                        {"text": None}])
    df = bucket_counts(ds).to_pandas()
    got = dict(zip(df["bucket"], df["n"]))
    assert got == {_bucket("a"): 3, _bucket("b"): 1}


def test_dsir_weights_match_scalar_reference(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    raw = []
    for i in range(120):
        n = int(rng.integers(0, 12))
        raw.append((i, " ".join(rng.choice(vocab, size=n)) if n else
                    (None if i % 11 == 0 else "")))
    target_ids = {i for i, _ in raw if i % 7 == 0}
    expected = _scalar_weights(raw, target_ids)

    t = pa.table({"doc_id": [i for i, _ in raw],
                  "text": [s for _, s in raw]})
    for par in (1, 6):
        ds = rd.from_arrow(t).repartition(par)

        def tgt(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(d % 7 == 0))

        out = dsir_weights(ds, ds.map_batches(
            tgt, batch_format="pyarrow")).to_pandas()
        got = dict(zip(out["doc_id"], out["dsir_weight"]))
        assert got == expected
    # null/empty docs present and weigh exactly 0
    assert any(s is None or s == "" for _, s in raw)
    assert all(expected[i] == 0 for i, s in raw if not s)
