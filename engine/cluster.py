"""Distributed k-means (Lloyd) over embedding columns.

The full-corpus training path that similarity.train_ivf_centroids (a
driver-side O(sample) shortcut) deliberately avoids: every Lloyd iteration
is ONE streaming pass over the Dataset — centroids (k x d float64, tiny)
are broadcast via ray.put + worker-cached get (engine/broadcast.py), each
block emits at most k*d narrow (cell, s, n) partial-sum rows, and a
groupby-Sum merges them. The driver holds k x d floats and never sees a
vector, so the same loop runs unchanged over 10^12 rows: per-iteration
exchange is O(k * d * blocks) regardless of corpus size.

Determinism: nearest-centroid ties break to the LOWEST cluster index
(np.argmax on the negated-distance score keeps the first maximum), and
partial sums of integer-valued embeddings are float64-exact, which is what
lets q_kmeans pin the whole loop against a DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

from engine.broadcast import get_broadcast
from engine.similarity import _to_matrix


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid by euclidean distance, vectorized.

    argmin |v - c|^2 == argmax (v.c - |c|^2 / 2); |v|^2 is constant per
    row and drops out. Ties -> lowest cluster index (argmax keeps the
    first maximum)."""
    scores = vecs @ cents.T - 0.5 * (cents * cents).sum(axis=1)
    return scores.argmax(axis=1)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    # one normalization-with-zero-guard invariant across the vector family
    from engine.similarity import _normalize

    return _normalize(m)


def kmeans_iterate(ds: "ray.data.Dataset", init_centroids: np.ndarray,
                   vec_col: str = "embedding", iters: int = 5,
                   tol: float = 0.0, spherical: bool = False,
                   ) -> "tuple[np.ndarray, pa.Table]":
    """Lloyd iterations; returns (centroids, last_stats).

    ``last_stats`` is the final iteration's merged partial-sum table
    (cluster int64, dim int64, s float64, n int64) — per-cluster vector
    sums and sizes under the FINAL assignment, exactly what a caller needs
    to audit convergence or hand to an oracle. An empty cluster keeps its
    previous centroid (the standard Lloyd guard). Stops early when every
    centroid moved <= tol in L-inf norm.

    ``spherical=True`` runs spherical k-means (the IVF/cosine contract):
    rows are unit-normalized map-side and centroids re-normalized after
    every update, so euclidean argmin == cosine argmax throughout.
    """
    cents = np.ascontiguousarray(np.asarray(init_centroids,
                                            dtype=np.float64))
    if spherical:
        cents = _unit_rows(cents)
    k, d = cents.shape
    stats: pa.Table | None = None
    for _ in range(max(1, iters)):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = get_broadcast(ref)
            vecs = _to_matrix(t[vec_col])
            if spherical and len(vecs):
                vecs = _unit_rows(vecs)
            if len(vecs) == 0:
                return pa.table({"cell": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.float64()),
                                 "n": pa.array([], type=pa.int64())})
            a = _assign(vecs, c)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, vecs)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            present = counts > 0
            idx = np.flatnonzero(present)
            # composite cell id = cluster*d + dim: one narrow int64 key
            cell = (idx[:, None] * d + np.arange(d)[None, :]).ravel()
            return pa.table({
                "cell": pa.array(cell, type=pa.int64()),
                "s": pa.array(sums[idx].ravel(), type=pa.float64()),
                "n": pa.array(np.repeat(counts[idx], d), type=pa.int64()),
            })

        merged = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby("cell")
                  .aggregate(Sum("s", alias_name="s"),
                             Sum("n", alias_name="n"))
                  .take_all())  # <= k*d rows by construction
        new_cents = cents.copy()
        cl = np.array([r["cell"] // d for r in merged], dtype=np.int64)
        dim = np.array([r["cell"] % d for r in merged], dtype=np.int64)
        s = np.array([r["s"] for r in merged], dtype=np.float64)
        n = np.array([r["n"] for r in merged], dtype=np.int64)
        if len(cl):
            new_cents[cl, dim] = s / n
        if spherical:
            new_cents = _unit_rows(new_cents)
        stats = pa.table({
            "cluster": pa.array(cl, type=pa.int64()),
            "dim": pa.array(dim, type=pa.int64()),
            "s": pa.array(s, type=pa.float64()),
            "n": pa.array(n, type=pa.int64()),
        })
        delta = np.abs(new_cents - cents).max() if len(cl) else 0.0
        cents = new_cents
        if delta <= tol:
            break
    return cents, stats


def kmeans_assign(ds: "ray.data.Dataset", centroids: np.ndarray,
                  id_col: str, vec_col: str = "embedding",
                  ) -> "ray.data.Dataset":
    """(id, cluster) assignment under fixed centroids — one streaming pass,
    centroids broadcast once."""
    cents = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = get_broadcast(ref)
        vecs = _to_matrix(t[vec_col])
        a = (_assign(vecs, c) if len(vecs)
             else np.array([], dtype=np.int64))
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow")
