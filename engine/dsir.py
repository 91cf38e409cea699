"""DSIR-style hashed-token importance weights (Xie et al. 2023,
arXiv:2302.03169 "Data Selection for Language Models via Importance
Resampling" — public method).

Estimate token-bucket unigram distributions over a small TARGET corpus
(the quality domain you want more of) and over the RAW corpus, then score
every raw document by the sum over its token occurrences of
log(p_target / p_raw) of the token's hash bucket. High-weight documents
are the ones importance resampling keeps.

Integer-exact ladder for the oracle (the tfidf idf-ladder trick,
CLAUDE.md): log2 via BIT LENGTH —

    score[b] = bit_length(cnt_target[b] + 1) - bit_length(cnt_raw[b] + 1)

so the per-document weight is an exact BIGINT on both sides (DuckDB:
``length(bin(x))``). The float log-ratio differs from the real DSIR weight
only by the log base and rounding of the ladder; the SHAPE of the pipeline
(two distribution passes, one broadcast score table, one scoring pass) is
the production one.

100 TB shape:
- Distribution passes emit ONE partial (bucket, n) table of at most
  ``num_buckets`` rows per block — the groupby-Sum exchange is
  O(num_buckets x blocks), never O(token occurrences).
- The score table is ``num_buckets`` int64 scalars: driver state and the
  broadcast are O(1) in the corpus.
- Scoring is one streaming map_batches pass: RE2 split -> dictionary
  encode -> md5 per UNIQUE token (vocab-bounded per batch, the
  doc_frequency discipline) -> vectorized bucket-score scatter ->
  exact per-doc segment sums from list offsets.

Tokenization is RE2 ``\\s+`` split with empty edge tokens ignored —
exactly DuckDB's ``regexp_extract_all(text, '\\S+')`` (the bigram_counts
twin; engine/textops.py documents the RE2-vs-Python Unicode divergence).
Bucket hash is the SQL-checkable md5 prefix (engine.partition._hash_array):
first 4 digest bytes big-endian == ``CAST('0x' || substr(md5(t), 1, 8) AS
BIGINT)``, mod num_buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from engine.partition import _hash_array

DSIR_BUCKETS = 1024


def _token_lists(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):  # an all-None block types as null
        col = col.cast(pa.string())
    return pc.split_pattern_regex(pc.fill_null(col, ""), pattern=r"\s+")


def _bucket_of_unique(tokens: pa.Array, num_buckets: int) -> np.ndarray:
    if len(tokens) == 0:
        return np.empty(0, dtype=np.int64)
    return _hash_array(tokens, "md5") % num_buckets


def bucket_counts(ds: "ray.data.Dataset", text_col: str = "text",
                  num_buckets: int = DSIR_BUCKETS) -> "ray.data.Dataset":
    """(bucket, n) token-OCCURRENCE counts per md5 hash bucket."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        lists = _token_lists(t[text_col])
        vals = lists.flatten()  # flatten (not .values): respects slices
        if len(vals) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        enc = vals.dictionary_encode()
        buckets = _bucket_of_unique(enc.dictionary, num_buckets)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        weights = np.asarray(
            pc.not_equal(vals, "").to_numpy(zero_copy_only=False),
            dtype=np.int64)  # empty edge tokens contribute nothing
        counts = np.bincount(buckets[idx], weights=weights,
                             minlength=num_buckets).astype(np.int64)
        nz = np.nonzero(counts)[0]
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "n": pa.array(counts[nz], type=pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n", alias_name="n")))


def _counts_vector(counts: "ray.data.Dataset",
                   num_buckets: int) -> np.ndarray:
    """Dense num_buckets-sized int64 vector from a (bucket, n) Dataset —
    driver state is num_buckets scalars, O(1) in the corpus."""
    df = counts.to_pandas()
    out = np.zeros(num_buckets, dtype=np.int64)
    if len(df):
        out[df["bucket"].to_numpy()] = df["n"].to_numpy()
    return out


def _bitlen(v: np.ndarray) -> np.ndarray:
    return np.asarray([int(x).bit_length() for x in v], dtype=np.int64)


def dsir_score_table(target_counts: np.ndarray,
                     raw_counts: np.ndarray) -> np.ndarray:
    """Integer importance ladder per bucket (see module docstring)."""
    return _bitlen(target_counts + 1) - _bitlen(raw_counts + 1)


def dsir_weights(raw: "ray.data.Dataset", target: "ray.data.Dataset",
                 id_col: str = "doc_id", text_col: str = "text",
                 num_buckets: int = DSIR_BUCKETS) -> "ray.data.Dataset":
    """(id, dsir_weight) for every raw document.

    Three passes total: bucket histogram over target (small corpus),
    bucket histogram over raw, then one streaming scoring pass over raw
    with the num_buckets-int64 score table broadcast once.
    """
    from engine.broadcast import get_broadcast

    t_vec = _counts_vector(bucket_counts(target, text_col, num_buckets),
                           num_buckets)
    r_vec = _counts_vector(bucket_counts(raw, text_col, num_buckets),
                           num_buckets)
    ref = ray.put(dsir_score_table(t_vec, r_vec))

    def score(t: pa.Table) -> pa.Table:
        table = get_broadcast(ref)
        lists = _token_lists(t[text_col])
        vals = lists.flatten()  # flatten (not .values): respects slices
        off = lists.offsets.to_numpy().astype(np.int64)
        off = off - off[0]  # rebase sliced offsets to the flattened values
        if len(vals) == 0:
            tok_scores = np.empty(0, dtype=np.int64)
        else:
            enc = vals.dictionary_encode()
            buckets = _bucket_of_unique(enc.dictionary, num_buckets)
            idx = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tok_scores = table[buckets[idx]]
            empty = np.asarray(
                pc.equal(vals, "").to_numpy(zero_copy_only=False))
            tok_scores = np.where(empty, 0, tok_scores)
        csum = np.concatenate([[0], np.cumsum(tok_scores)])
        doc_sums = csum[off[1:]] - csum[off[:-1]]
        return pa.table({
            id_col: t[id_col],
            "dsir_weight": pa.array(doc_sums, type=pa.int64()),
        })

    return raw.map_batches(score, batch_format="pyarrow")
