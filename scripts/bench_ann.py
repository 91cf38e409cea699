"""ANN-at-scale bench: brute-force GEMM vs IVF (compute-side prune) vs the
cell-partitioned IVF INDEX (storage-side prune) over a deterministic
synthetic embedding table — evidence that the similarity scale path holds
beyond the tiny testdata embeddings (2k rows).

Corpus: N seeded vectors (default 100k × 64d, clustered so IVF has
structure: 256 seed directions + per-vector noise). 8 queries × nprobe 4
over 256 cells probe ≤ 12.5 % of the cell directories, so the INDEXED
path demonstrates a real storage-side prune (the whole point at 100 TB:
non-probed cells' bytes never leave disk). Reports wall per path and IVF
recall@k against the exact brute-force answer.

Usage: python scripts/bench_ann.py   (env RAY_GRAFT_CPUS, GRAFT_ANN_ROWS;
prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import NUM_CPUS, calibrate_single_thread  # noqa: E402

N_ROWS = int(os.environ.get("GRAFT_ANN_ROWS", "100000"))
DIM = 64
N_CLUSTERS = 256
N_QUERIES = 8
K = 10


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from engine.similarity import (build_ivf_index, knn_brute, knn_ivf,
                                   knn_ivf_indexed, train_ivf_centroids)

    rng = np.random.RandomState(42)
    seeds = rng.normal(size=(N_CLUSTERS, DIM))
    assign = rng.randint(0, N_CLUSTERS, N_ROWS)
    vecs = seeds[assign] + 0.3 * rng.normal(size=(N_ROWS, DIM))
    queries = seeds[rng.randint(0, N_CLUSTERS, N_QUERIES)] \
        + 0.3 * rng.normal(size=(N_QUERIES, DIM))

    # write the corpus as multi-file parquet (the realistic input shape)
    src = "/tmp/graft_ann_corpus"
    shutil.rmtree(src, ignore_errors=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N_ROWS, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
    })
    rd.from_arrow(tbl).repartition(64).write_parquet(src)
    ds = rd.read_parquet(src)
    ds.count()  # warm

    t0 = time.time()
    exact = knn_brute(ds, queries, k=K)
    brute_s = time.time() - t0

    cents = train_ivf_centroids(ds, num_cells=256)
    t0 = time.time()
    ivf = knn_ivf(ds, queries, k=K, num_cells=256, nprobe=4, centroids=cents)
    ivf_s = time.time() - t0

    idx_dir = "/tmp/graft_ann_index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_ivf_index(ds, idx_dir, num_cells=256)
    build_s = time.time() - t0
    t0 = time.time()
    ivf_idx = knn_ivf_indexed(idx_dir, queries, k=K, nprobe=4)
    idx_s = time.time() - t0

    # the scale-relevant metric: bytes the probed cells occupy vs the whole
    # index — at 100 TB this ratio IS the I/O bill; wall time at 100 MB is
    # dominated by fixed per-directory open costs instead
    def dir_bytes(d):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(d) for f in fs)

    cents_idx = np.load(os.path.join(idx_dir, "_centroids.npy"))
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    probed = set(np.argsort(-(qn @ cents_idx.T), axis=1)[:, :4].ravel())
    total_b = dir_bytes(idx_dir)
    probed_b = sum(dir_bytes(os.path.join(idx_dir, f"cell={c}"))
                   for c in probed
                   if os.path.isdir(os.path.join(idx_dir, f"cell={c}")))

    def recall(approx) -> float:
        hits = tot = 0
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["vec_id"])
            got = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(truth & got)
            tot += len(truth)
        return round(hits / tot, 4)

    ray.shutdown()
    print(json.dumps({
        "metric": "ann_corpus_bench",
        "rows": N_ROWS, "dim": DIM, "queries": N_QUERIES, "k": K,
        "brute_sec": round(brute_s, 2),
        "ivf_sec": round(ivf_s, 2),
        "ivf_recall": recall(ivf),
        "index_build_sec": round(build_s, 2),
        "ivf_indexed_sec": round(idx_s, 2),
        "ivf_indexed_recall": recall(ivf_idx),
        "probed_cells": len(probed),
        "bytes_read_fraction": round(probed_b / total_b, 4),
        "num_cells": 256, "nprobe": 4,
        "num_cpus": NUM_CPUS,
        "calib_1t_sec": calibrate_single_thread(),
    }))


if __name__ == "__main__":
    main()
