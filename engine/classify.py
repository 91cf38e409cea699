"""Model-based document scoring: a hashed bag-of-tokens linear classifier.

The fastText-style quality/language filter every LLM corpus pipeline runs
(CCNet, RefinedWeb, DCLM all gate documents on a linear model over hashed
token features). The reference repo has no model stage — this is a scale
addition in the same family as the Gopher rules (engine/textstats.py), but
with LEARNED state: a weight vector that must be shipped to every task.

Distribution shape (the 100 TB contract):
- The model is BROADCAST state — ``ray.put`` once on the driver, each worker
  process fetches it once via the plasma-cached ``engine.broadcast`` path
  (zero-copy for numpy), never re-shipped per batch. A real fastText model
  is 100 MB+; closure-capturing it would serialize it into every task spec.
- Scoring is map-side only: no shuffle, one narrow (id, score) row out per
  document.
- Per batch the md5 feature hash runs over the batch's UNIQUE tokens only
  (pandas factorize → hash uniques → take), not per occurrence — the same
  vocabulary-bounded trick as textstats.doc_frequency.

Feature hash is the SQL-twin md5 discipline (engine/partition.py): bucket =
int(md5(token)[:15 hex], 16) % dim — 60 bits, BIGINT-safe, so a DuckDB
oracle computes the identical bucket. Integer weights keep the score exact
in any summation order.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from engine.broadcast import get_broadcast

DEFAULT_DIM = 4096


def planted_weights(dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic int64 weights: w[b] = (b % 1001) - 500.

    Stands in for a trained model; the rule is reproducible in SQL so the
    oracle can re-derive every weight from the bucket id alone.
    """
    b = np.arange(dim, dtype=np.int64)
    return (b % 1001) - 500


def _hash_buckets(tokens: "pd.Index | np.ndarray", dim: int) -> np.ndarray:
    """md5-slice bucket per token (60-bit hex prefix, SQL-twin-able)."""
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(t.encode()).hexdigest()[:15], 16) % dim for t in tokens),
        dtype=np.int64, count=len(tokens))


def hashed_linear_scores(
    ds: "ray.data.Dataset",
    weights: "np.ndarray | ray.ObjectRef",
    dim: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(id, score) — integer linear score per document, map-side only.

    ``weights``: int64 vector of length ``dim``; pass a ``ray.ObjectRef``
    (from ``ray.put``) so each worker fetches it once — passing the array
    directly also works (it rides the task closure; fine for small models,
    wrong for real ones).
    """
    is_ref = isinstance(weights, ray.ObjectRef)
    if dim is None:
        if is_ref:
            raise ValueError("dim is required when weights is an ObjectRef")
        dim = len(weights)

    def score(t: pa.Table) -> pa.Table:
        w = get_broadcast(weights) if is_ref else weights
        toks = pc.split_pattern_regex(
            pc.fill_null(pc.cast(t[text_col], pa.string()), ""),
            pattern=r"\s+")
        flat = toks.combine_chunks().flatten() if isinstance(
            toks, pa.ChunkedArray) else toks.flatten()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        vals = flat.to_numpy(zero_copy_only=False)
        keep = vals != ""  # split_pattern_regex emits empty edge tokens
        vals, seg = vals[keep], seg[keep]
        scores = np.zeros(len(t), dtype=np.int64)
        if len(vals):
            codes, uniques = pd.factorize(vals)
            w_tok = w[_hash_buckets(uniques, dim)][codes]
            np.add.at(scores, seg, w_tok)
        return pa.table({id_col: t[id_col],
                         "score": pa.array(scores, type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")
