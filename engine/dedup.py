"""Deduplication operators (scale additions; SURVEY.md §2.6 A6 + §2.8).

The reference has no dedup at all (every upload is a fresh uuid, SURVEY.md
§2.8); at 100 TB dedup is a first-class pipeline stage. All operators follow
the same shuffle discipline: heavy text never moves twice — signatures are
computed vectorized inside ``map_batches``, only (key, id) projections are
shuffled, and clustering happens on the (tiny) candidate-pair set.

Operators:
- exact_dedup           hash-partitioned first-wins on a content hash
- minhash_signatures    k-shingle → 64-perm MinHash per row (numpy)
- minhash_lsh_pairs     band-bucket groupby → candidate pairs → signature-
                        similarity verification
- minhash_dedup_clusters  pairs → connected components → (id, cluster_id)
- simhash_signatures    64-bit SimHash per row
- simhash_pairs         16-bit-band bucketing → Hamming-verified pairs
- ngram_jaccard_pairs   exact n-gram Jaccard verification over candidate pairs

Partitioning assumption (documented per the custom-operator rule): LSH bucket
keys are uniformly distributed by construction (hashes), so the band groupby
has no inherent skew; pathological buckets (same boilerplate shingled by
thousands of docs) are capped at ``MAX_BUCKET`` docs per bucket with a
deterministic keep-lowest-id policy, and the cap is logged via a count column.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

# MinHash parameters (frozen)
NUM_PERM = 64
NUM_BANDS = 16
ROWS_PER_BAND = NUM_PERM // NUM_BANDS  # 4
SHINGLE_K = 5  # character shingles
_MERSENNE = (1 << 61) - 1
MAX_BUCKET = 64  # cap on docs considered per LSH bucket (skew guard)

_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)


def content_hash64(s: str) -> int:
    """Deterministic 64-bit content hash (process-independent, unlike hash())."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    hashes = [content_hash64(s or "") for s in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, type=pa.uint64()))


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Exact dedup, shuffle-light: only (content_hash, id) rows move.

    1. hash text per batch (vectorized-ish, C-speed blake2b)
    2. groupby(content_hash).min(id) — the keeper set (tiny shuffle)
    3. broadcast keeper ids, filter the full table in place (no re-shuffle
       of the heavy text column)
    """
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    )
    keepers = (
        hashed.select_columns(["content_hash", id_col])
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"))
    )
    keep_ids = set(r["keep_id"] for r in keepers.take_all())
    keep_ref = ray.put(keep_ids)

    class KeepFilter:
        def __init__(self, ref):
            self.keep = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([i in self.keep for i in t[id_col].to_pylist()])
            return t.filter(mask)

    return ds.map_batches(KeepFilter, fn_constructor_args=(keep_ref,),
                          batch_format="pyarrow", concurrency=(1, 8))


def first_per_key(ds: "ray.data.Dataset", key_col: str = "url",
                  order_col: str | None = None) -> "ray.data.Dataset":
    """A6 — exact dedup by key: one deterministic winner per key value
    (hash-partitioned groupby; 'first' = min ``order_col``, else min of the
    remaining columns' tuple, so the result is stable under any parallelism).

    This is the per-url dedup the byte-identity invariant implies (SURVEY.md
    §2.6 A6): downstream of extraction, one output row per url.
    """

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        cols = [order_col] if order_col else [c for c in g.columns if c != key_col]
        return g.sort_values(cols, kind="mergesort").head(1)

    return ds.groupby(key_col).map_groups(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Distinct k-char shingles → uint64 hash array (crc32-based, C-speed)."""
    if len(text) < k:
        text = text + "\x01" * (k - len(text))
    data = text.encode("utf-8", "replace")
    # shingle over bytes of the utf-8 encoding (deterministic, fast)
    n = max(1, len(data) - k + 1)
    seen = {data[i : i + k] for i in range(n)}
    return np.fromiter(
        (zlib.crc32(s) for s in seen), dtype=np.uint64, count=len(seen)
    )


def minhash_of(text: str) -> np.ndarray:
    """64-perm MinHash signature (uint64[NUM_PERM])."""
    x = _shingle_hashes(text)
    # (a*x + b) mod p, vectorized over perms × shingles
    vals = (_PERM_A[:, None] * x[None, :] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_signatures(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id") -> "ray.data.Dataset":
    """(id, sig: list<uint64>[64]) per row."""

    class MinHasher:
        def __init__(self):
            self.a = _PERM_A[:, None]
            self.b = _PERM_B[:, None]

        def __call__(self, t: pa.Table) -> pa.Table:
            sigs = [minhash_of(s or "") for s in t[text_col].to_pylist()]
            return pa.table({
                id_col: t[id_col],
                "sig": pa.array([s.tolist() for s in sigs],
                                type=pa.list_(pa.uint64())),
            })

    return ds.map_batches(MinHasher, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 8))


def _band_rows(sig_table: pa.Table, id_col: str) -> pa.Table:
    """Explode signatures into (band_id, band_hash, id) rows."""
    ids = sig_table[id_col].to_pylist()
    sigs = sig_table["sig"].to_pylist()
    out_band, out_hash, out_id = [], [], []
    for i, sig in zip(ids, sigs):
        arr = np.asarray(sig, dtype=np.uint64)
        for b in range(NUM_BANDS):
            chunk = arr[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            h = zlib.crc32(chunk.tobytes())
            out_band.append(b)
            out_hash.append(h)
            out_id.append(i)
    return pa.table({
        "band_id": pa.array(out_band, type=pa.int32()),
        "band_hash": pa.array(out_hash, type=pa.uint32()),
        id_col: pa.array(out_id),
    })


def _sig_similarity(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def minhash_lsh_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id",
                      threshold: float = 0.7) -> pd.DataFrame:
    """Near-dup candidate pairs via banded LSH, verified on full signatures.

    Returns a pandas DataFrame (id_a, id_b, similarity) — the candidate set is
    tiny relative to the corpus (that is the point of LSH), so the pair table
    is a driver-side object; at 100 TB it would be a Dataset written to
    parquet, same code path via from_pandas.
    """
    sigs = minhash_signatures(ds, text_col, id_col).materialize()

    bands = sigs.map_batches(lambda t: _band_rows(t, id_col),
                             batch_format="pyarrow").materialize()

    # Almost every bucket holds exactly one doc; calling map_groups once per
    # bucket would pay one Python round trip per *singleton*. Instead:
    # count per bucket (partial-agg shuffle of tiny rows) → keep the hot
    # buckets (count ≥ 2, a tiny set) → broadcast-filter the band rows down
    # to hot buckets → expand pairs with one vectorized pandas pass.
    counts = bands.groupby(["band_id", "band_hash"]).count()
    hot = {
        (r["band_id"], r["band_hash"])
        for r in counts.take_all()
        if r["count()"] >= 2
    }
    if not hot:
        return pd.DataFrame({"id_a": [], "id_b": [], "similarity": []})
    hot_ref = ray.put(hot)

    class HotFilter:
        def __init__(self, ref):
            self.hot = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([
                (b, h) in self.hot
                for b, h in zip(t["band_id"].to_pylist(),
                                t["band_hash"].to_pylist())
            ])
            return t.filter(mask)

    hot_rows = bands.map_batches(
        HotFilter, fn_constructor_args=(hot_ref,), batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()

    pair_list: list[tuple] = []
    for _, g in hot_rows.groupby(["band_id", "band_hash"], sort=False):
        ids = sorted(g[id_col].tolist())[:MAX_BUCKET]
        pair_list.extend(
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        )
    if not pair_list:
        return pd.DataFrame({"id_a": [], "id_b": [], "similarity": []})
    pairs = pd.DataFrame(pair_list, columns=["id_a", "id_b"])
    pairs = pairs.drop_duplicates().reset_index(drop=True)

    # verify on full signatures (estimate of Jaccard)
    sig_map = {r[id_col]: np.asarray(r["sig"], dtype=np.uint64)
               for r in sigs.take_all()}
    sims = [
        _sig_similarity(sig_map[a], sig_map[b])
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    ]
    pairs["similarity"] = sims
    out = pairs[pairs["similarity"] >= threshold].reset_index(drop=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def connected_components(pairs: pd.DataFrame, ids: list) -> pd.DataFrame:
    """Union-find over the verified pair set → (id, cluster_id = min member).

    Driver-side on the candidate set (provably small after LSH verification);
    the distributed fallback is iterative min-label propagation via groupby.
    """
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs.get("id_a", []), pairs.get("id_b", [])):
        union(a, b)
    # path-compress to the minimum member per component
    comp: dict = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    rows = []
    for members in comp.values():
        cid = min(members)
        for m in members:
            rows.append({"doc_id": m, "cluster_id": cid})
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


_NO_PEER = -1  # sentinel: row is a label row, not an edge row
_BIG_LABEL = 1 << 62  # edge rows carry this so they never win a Min


def _propagate_group(g: pd.DataFrame) -> pd.DataFrame:
    """One node's group (label row: peer==-1; edge rows: real peer) → emit the
    node's current label addressed to each peer."""
    label = g.loc[g["peer"] == _NO_PEER, "label"].min()
    peers = g.loc[g["peer"] != _NO_PEER, "peer"]
    if peers.empty or pd.isna(label):
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "label": pd.Series(dtype="int64"),
                             "peer": pd.Series(dtype="int64")})
    return pd.DataFrame({"node": peers.astype("int64"),
                         "label": int(label),
                         "peer": _NO_PEER})


def connected_components_distributed(pairs: pd.DataFrame, ids: list,
                                     max_iters: int = 25) -> pd.DataFrame:
    """Distributed min-label propagation — the scale path for when the
    verified pair set is too large for driver union-find (integer ids).

    Each round is: per-endpoint groupby (carry the node's current label to
    every neighbor) → per-node groupby min. Converges in O(components'
    diameter) rounds, bounded by ``max_iters``; each round shuffles only
    (node, label) pairs — never the documents. Same output contract as
    connected_components: (doc_id, cluster_id = min member id)."""
    import ray.data as rd

    if len(pairs) == 0:
        return pd.DataFrame({"doc_id": ids, "cluster_id": ids}).sort_values(
            "doc_id").reset_index(drop=True)

    ids = [int(i) for i in ids]
    edges = pd.DataFrame({
        "node": pd.Series(list(pairs["id_a"]) + list(pairs["id_b"]),
                          dtype="int64"),
        "label": _BIG_LABEL,
        "peer": pd.Series(list(pairs["id_b"]) + list(pairs["id_a"]),
                          dtype="int64"),
    })
    edges_ds = rd.from_arrow(pa.Table.from_pandas(edges))
    labels = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({
        "node": pd.Series(ids, dtype="int64"),
        "label": pd.Series(ids, dtype="int64"),
        "peer": pd.Series([_NO_PEER] * len(ids), dtype="int64"),
    })))
    old_sum = sum(ids)

    for _ in range(max_iters):
        tagged = (
            labels.union(edges_ds)
            .groupby("node")
            .map_groups(_propagate_group, batch_format="pandas")
            # normalize to Arrow blocks: union requires matching block types
            .map_batches(lambda t: t, batch_format="pyarrow")
        )
        new_labels = (
            labels.union(tagged)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(lambda t: t.append_column(
                "peer", pa.array([_NO_PEER] * t.num_rows, type=pa.int64())),
                batch_format="pyarrow")
            .materialize()
        )
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:  # labels only ever decrease; fixpoint reached
            break
        old_sum = new_sum
    out = labels.to_pandas()[["node", "label"]].rename(
        columns={"node": "doc_id", "label": "cluster_id"}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def minhash_dedup_clusters(ds: "ray.data.Dataset", text_col: str = "text",
                           id_col: str = "doc_id", threshold: float = 0.7,
                           distributed: bool = False) -> pd.DataFrame:
    """``distributed=True`` clusters via min-label propagation (integer ids;
    the scale path); default is driver union-find over the small verified
    pair set."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, threshold)
    ids = [r[id_col] for r in ds.select_columns([id_col]).take_all()]
    if distributed:
        return connected_components_distributed(pairs, ids)
    return connected_components(pairs, ids)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (crc32 token hashes).

    Vectorized: one (tokens × 64) bit matrix per document instead of a
    per-token numpy round trip (~20× on long documents)."""
    tokens = text.split()
    if not tokens:
        return 0
    hs = np.fromiter(
        (
            zlib.crc32(b) | (zlib.crc32(b, 0xFFFF) << 32)
            for b in (t.encode("utf-8", "replace") for t in tokens)
        ),
        dtype=np.uint64,
        count=len(tokens),
    )
    bits = (hs[:, None] >> _BIT_IDX[None, :]) & 1
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << _BIT_IDX).sum())


def simhash_signatures(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id") -> "ray.data.Dataset":
    class SimHasher:
        def __call__(self, t: pa.Table) -> pa.Table:
            vals = [simhash64(s or "") for s in t[text_col].to_pylist()]
            return pa.table({id_col: t[id_col],
                             "simhash": pa.array(vals, type=pa.uint64())})

    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 8))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: bucket on each of the four 16-bit bands
    (any pair within Hamming ≤ 3 of 64 bits shares at least one exact band
    by pigeonhole when distance < 4), verify exact Hamming distance."""
    sigs = simhash_signatures(ds, text_col, id_col).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hs = t["simhash"].to_pylist()
        ob, oh, oi = [], [], []
        for i, h in zip(ids, hs):
            for b in range(4):
                ob.append(b)
                oh.append((h >> (16 * b)) & 0xFFFF)
                oi.append(i)
        return pa.table({"band_id": pa.array(ob, type=pa.int32()),
                         "band_val": pa.array(oh, type=pa.int32()),
                         id_col: pa.array(oi)})

    bands = sigs.map_batches(band_rows, batch_format="pyarrow").materialize()

    # same singleton-skip as minhash_lsh_pairs: count → hot buckets →
    # broadcast filter → one vectorized pair expansion
    counts = bands.groupby(["band_id", "band_val"]).count()
    hot = {
        (r["band_id"], r["band_val"])
        for r in counts.take_all()
        if r["count()"] >= 2
    }
    if not hot:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    hot_ref = ray.put(hot)

    class HotFilter:
        def __init__(self, ref):
            self.hot = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([
                (b, v) in self.hot
                for b, v in zip(t["band_id"].to_pylist(),
                                t["band_val"].to_pylist())
            ])
            return t.filter(mask)

    hot_rows = bands.map_batches(
        HotFilter, fn_constructor_args=(hot_ref,), batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    pair_list: list[tuple] = []
    for _, g in hot_rows.groupby(["band_id", "band_val"], sort=False):
        ids = sorted(g[id_col].tolist())[:MAX_BUCKET]
        pair_list.extend(
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        )
    if not pair_list:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    pairs = pd.DataFrame(pair_list, columns=["id_a", "id_b"]).drop_duplicates()
    sim_map = {r[id_col]: r["simhash"] for r in sigs.take_all()}
    pairs["hamming"] = [
        hamming64(sim_map[a], sim_map[b])
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    ]
    out = pairs[pairs["hamming"] <= max_hamming]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard verification (for candidate pairs)
# ---------------------------------------------------------------------------


def ngram_set(text: str, n: int = 3) -> set:
    toks = text.split()
    if len(toks) < n:
        return {tuple(toks)} if toks else set()
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def ngram_jaccard_pairs(ds: "ray.data.Dataset", candidate_pairs: pd.DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.8) -> pd.DataFrame:
    """Exact word-n-gram Jaccard over an LSH candidate set. Texts for the
    candidate ids are fetched via a broadcast id-set filter (no shuffle)."""
    if len(candidate_pairs) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    wanted = set(candidate_pairs["id_a"]) | set(candidate_pairs["id_b"])
    ref = ray.put(wanted)

    class Fetch:
        def __init__(self, r):
            self.keep = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([i in self.keep for i in t[id_col].to_pylist()])
            return t.filter(mask)

    texts = {
        r[id_col]: r[text_col]
        for r in ds.select_columns([id_col, text_col])
        .map_batches(Fetch, fn_constructor_args=(ref,), batch_format="pyarrow",
                     concurrency=(1, 4))
        .take_all()
    }
    jac = [
        ngram_jaccard(texts.get(a, ""), texts.get(b, ""), n)
        for a, b in zip(candidate_pairs["id_a"], candidate_pairs["id_b"])
    ]
    out = candidate_pairs.copy()
    out["jaccard"] = jac
    out = out[out["jaccard"] >= threshold]
    return out[["id_a", "id_b", "jaccard"]].sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)
