"""Positional phrase search over the flat token stream.

The phrase-query sibling of ``textstats.term_search``: find documents
containing an EXACT n-token phrase (benchmark sentences, attribution
strings, license boilerplate) — the positional-index read path of targeted
decontamination. Same design rules: map-side only until a tiny final
rank; no Python loop over tokens (the phrase test is n-1 shifted Arrow
comparisons, the window_dup_stats discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from engine.textstats import _flat_tokens, _text_column


def phrase_search(ds: "ray.data.Dataset", phrase: "tuple[str, ...]",
                  text_col: str = "text", id_col: str = "doc_id",
                  ) -> "ray.data.Dataset":
    """Documents containing the exact token sequence ``phrase``
    (whitespace tokenization), with occurrence counts, ranked by
    (-n_hits, doc_id). Output: (doc_id, n_hits, rank).

    Plan: per block, ONE flat token scan; a phrase start is a position
    where token[i+k] == phrase[k] for every k — evaluated as k shifted
    vectorized equality tests ANDed together, with row-boundary guards
    exactly like the k-token window builder (window_dup_stats). Only
    matching (doc_id, n_hits) rows leave the block; the global rank is
    one pass over the tiny hit set."""
    n = len(phrase)
    if n == 0:
        raise ValueError("phrase must have at least one token")

    def score(t: pa.Table) -> pa.Table:
        toks, lens = _flat_tokens(_text_column(t, text_col), r"\s+")
        total = len(toks)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "n_hits": pa.array([], type=pa.int64())})
        if total < n:
            return empty
        nwin = total - n + 1
        match = np.ones(nwin, dtype=bool)
        for k in range(n):
            eq = pc.equal(toks.slice(k, nwin), phrase[k])
            match &= np.asarray(eq.to_numpy(zero_copy_only=False),
                                dtype=bool)
        if not match.any():
            return empty
        # row-boundary guard: a window must sit inside one document
        row_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        srow = np.repeat(np.arange(len(lens)), lens)[:nwin]
        lpos = np.arange(nwin) - row_start[srow]
        inside = lpos <= (lens[srow] - n)
        match &= inside
        if not match.any():
            return empty
        hits = np.bincount(srow[match], minlength=len(lens))
        sel = np.flatnonzero(hits)
        return pa.table({
            id_col: pa.array(ids[sel], type=pa.int64()),
            "n_hits": pa.array(hits[sel].astype(np.int64)),
        })

    found = ds.map_batches(score, batch_format="pyarrow")

    def rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        nh = t["n_hits"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nh))
        rnk = np.empty(len(ids), dtype=np.int64)
        rnk[order] = np.arange(1, len(ids) + 1)
        return t.append_column("rank", pa.array(rnk, type=pa.int64()))

    # zero-hit guard: a 0-row exchange loses its schema in Ray 2.49
    # (repartition emits a column-less block). A sentinel row keeps every
    # stage schema-ful; it sorts LAST (n_hits=0 < any real hit) so real
    # ranks are unaffected, and the final filter drops it.
    sentinel = ray.data.from_arrow(pa.table({
        id_col: pa.array([-1], type=pa.int64()),
        "n_hits": pa.array([0], type=pa.int64()),
    }))
    ranked = found.union(sentinel).repartition(1) \
        .map_batches(rank, batch_format="pyarrow")
    return ranked.map_batches(
        lambda t: t.filter(pc.greater_equal(t[id_col], 0)),
        batch_format="pyarrow")
