"""url-hash partitioning tests (north_rule explicit-repartitioning feature)."""

from __future__ import annotations

import glob
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from engine import partition as part


def test_url_bucket_deterministic_and_md5_based():
    u = "https://x.example/a"
    expect = int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 64
    assert part.url_bucket(u) == expect
    assert part.url_bucket(u) == part.url_bucket(u)
    assert 0 <= part.url_bucket("anything", 16) < 16


def test_add_url_hash_batch():
    t = pa.table({"url": ["a", "b", "c"]})
    out = part.add_url_hash_batch(t, num_buckets=8)
    assert out.column_names == ["url", "url_hash", "bucket"]
    assert all(0 <= b < 8 for b in out["bucket"].to_pylist())
    assert [h % 8 for h in out["url_hash"].to_pylist()] == out["bucket"].to_pylist()


def test_buckets_roughly_uniform():
    buckets = [part.url_bucket(f"https://s{i}.example/d{i}", 16)
               for i in range(4000)]
    counts = [buckets.count(b) for b in range(16)]
    assert min(counts) > 150  # 250 expected; gross skew would fail


def test_write_partitioned_layout(ray_session, tmp_path):
    import ray.data as rd

    urls = [f"https://site{i}.example/doc{i}" for i in range(200)]
    ds = rd.from_arrow(pa.table({"url": urls, "val": list(range(200))}))
    out = str(tmp_path / "parts")
    part.write_partitioned(ds, out, num_buckets=8)

    files = glob.glob(f"{out}/bucket=*/*.parquet")
    assert files
    seen = set()
    total = 0
    for f in files:
        bucket = int(f.split("bucket=")[1].split("/")[0])
        t = pq.read_table(f, columns=["url"])
        total += t.num_rows
        for u in t["url"].to_pylist():
            assert part.url_bucket(u, 8) == bucket  # co-location holds
        seen.add(bucket)
    assert total == 200
    assert len(seen) >= 6  # most buckets populated


def test_bucket_filter(ray_session):
    import ray.data as rd

    urls = [f"https://site{i}.example/doc{i}" for i in range(100)]
    ds = rd.from_arrow(pa.table({"url": urls}))
    got = part.bucket_filter(ds, bucket=3, num_buckets=8).take_all()
    expect = [u for u in urls if part.url_bucket(u, 8) == 3]
    assert sorted(r["url"] for r in got) == sorted(expect)


def test_stable_split(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from engine.partition import stable_split, stable_split_batch

    ds = rd.from_arrow(pa.table({"doc_id": list(range(2000))}))
    out = stable_split(ds).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15
    # deterministic across invocations and independent of batching
    again = stable_split_batch(pa.table({"doc_id": list(range(2000))}))
    assert out.sort_values("doc_id")["split"].tolist() == \
        again["split"].to_pylist()
    # corpus growth never migrates existing ids
    bigger = stable_split(rd.from_arrow(
        pa.table({"doc_id": list(range(4000))}))).to_pandas()
    merged = out.merge(bigger, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()


def test_fast_hash_path():
    """method='fast' (vectorized siphash/xxhash): deterministic across
    calls, roughly uniform buckets, and bucket == url_hash % B — the same
    layout contract as the md5 oracle path."""
    import numpy as np

    urls = pa.table({"url": [f"https://e{i % 37}.com/p/{i}" for i in range(4000)]})
    a = part.add_url_hash_batch(urls, num_buckets=16, method="fast")
    b = part.add_url_hash_batch(urls, num_buckets=16, method="fast")
    assert a["url_hash"].to_pylist() == b["url_hash"].to_pylist()
    bk = np.asarray(a["bucket"].to_pylist())
    assert (bk == np.asarray(a["url_hash"].to_pylist()) % 16).all()
    counts = np.bincount(bk, minlength=16)
    assert counts.min() > 0 and counts.max() < 3 * counts.mean()
    # differs from md5 (it's a different hash family) but same dtype/shape
    m = part.add_url_hash_batch(urls, num_buckets=16, method="md5")
    assert m["url_hash"].type == a["url_hash"].type


def test_hash_sample(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": list(range(2000))}))
    a = set(r["doc_id"] for r in part.hash_sample(ds, pct=10).take_all())
    b = set(r["doc_id"] for r in part.hash_sample(ds, pct=10).take_all())
    assert a == b                       # deterministic
    assert 120 < len(a) < 280           # ~10 %
    # growth-stability: kept ids stay kept when the corpus grows
    big = rd.from_arrow(pa.table({"doc_id": list(range(4000))}))
    c = set(r["doc_id"] for r in part.hash_sample(big, pct=10).take_all())
    assert a <= c
    # pct=25 superset of pct=10 (same salt)
    d = set(r["doc_id"] for r in part.hash_sample(ds, pct=25).take_all())
    assert a <= d
