"""Dedup-at-corpus-scale bench (the BASELINE.md "Dedup at corpus scale"
numbers, reproducible): exact + MinHash-LSH dedup over the generated pages
corpus at the bench sf, with ~15 % planted duplicates.

The MinHash path runs the SCALE CONTRACT end-to-end: candidate discovery →
verification → ``minhash_lsh_pairs_ds`` → ``write_parquet`` — no driver
DataFrame of the pair set ever exists.

Usage: python scripts/bench_dedup.py   (env GRAFT_SF_DIR / RAY_GRAFT_CPUS
as bench.py; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import NUM_CPUS, SF_DIR, ensure_bench_pages, sf_of  # noqa: E402

DUP_PCT = 15  # target duplicate rate; realized via a power-of-two modulus


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from engine.dedup import exact_dedup, minhash_lsh_pairs_ds

    sf = sf_of(SF_DIR)
    pages_dir = ensure_bench_pages(sf)

    import hashlib

    import numpy as np

    def as_docs(t: pa.Table) -> pa.Table:
        # collision-free deterministic ids: 63-bit blake2b of the url
        # (trailing-digit extraction collided across url variants, planting
        # accidental duplicate ids — dedup documents unique ids as its
        # input precondition)
        ids = np.fromiter(
            (int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8)
                            .digest(), "big") >> 1
             for u in t["url"].to_pylist()),
            dtype=np.int64, count=t.num_rows)
        return pa.table({"doc_id": pa.array(ids), "text": t["text"]})

    base = rd.read_parquet(pages_dir, columns=["url", "text"]) \
        .map_batches(as_docs, batch_format="pyarrow")

    # DUP_PCT as a power-of-two modulus: id & 127 < round(128 * pct/100)
    dup_threshold = round(128 * DUP_PCT / 100)  # 19 → ~14.8 % realized

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(pc.bit_wise_and(t["doc_id"], 127),
                               dup_threshold))
        # twin ids in a disjoint id space: flip bit 62 (base ids are 63-bit
        # hashes with bit 62 ~uniform, so xor keeps them unique w.h.p.
        # while staying positive int64)
        return pa.table({
            "doc_id": pc.bit_wise_xor(sel["doc_id"],
                                      pa.scalar(1 << 62, pa.int64())),
            "text": sel["text"]})

    # coalesce before materializing: the 64-file read splits into ~384
    # blocks; per-block overhead would dominate the narrow shuffles below
    docs = base.union(base.map_batches(plant, batch_format="pyarrow")) \
        .repartition(2 * NUM_CPUS).materialize()
    n_docs = docs.count()

    t0 = time.time()
    kept = exact_dedup(docs, text_col="text", id_col="doc_id").count()
    exact_s = time.time() - t0

    plan = "auto"
    if os.environ.get("RAY_GRAFT_FORCE_JOIN_PLAN"):
        # force the fully-distributed verification plan (what a 10^9-doc
        # corpus would run) regardless of candidate volume
        from engine import dedup as _dedup

        _dedup.VERIFY_DRIVER_MAX = -1
        _dedup.FETCH_DRIVER_MAX = -1
        plan = "forced-join"

    out_dir = "/tmp/graft_dedup_pairs"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    minhash_lsh_pairs_ds(docs, text_col="text", id_col="doc_id",
                         threshold=0.7, num_bands=8).write_parquet(out_dir)
    minhash_s = time.time() - t0
    import pyarrow.parquet as pq

    n_pairs = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet")
    )

    ray.shutdown()
    from bench import calibrate_single_thread

    print(json.dumps({
        "metric": "dedup_corpus_bench",
        "docs": n_docs,
        "exact_sec": round(exact_s, 2),
        "exact_docs_per_sec": round(n_docs / exact_s, 1),
        "exact_kept": kept,
        "minhash_pairs_ds_sec": round(minhash_s, 2),
        "minhash_docs_per_sec": round(n_docs / minhash_s, 1),
        "verified_pairs": n_pairs,
        "minhash_plan": plan,
        "num_bands": 8,
        "num_cpus": NUM_CPUS,
        "sf": sf,
        "calib_1t_sec": calibrate_single_thread(),
    }))


if __name__ == "__main__":
    main()
