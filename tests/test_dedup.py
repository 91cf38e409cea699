"""Dedup operator tests: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from engine import dedup

BASE = ("the quick brown fox jumps over the lazy dog and runs far away into "
        "the woods tonight under a pale moon while owls watch silently")
TEXTS = [
    BASE,                                   # 0
    BASE,                                   # 1 exact dup of 0
    BASE + " with one extra clause",        # 2 near dup of 0
    BASE.replace("quick", "swift"),         # 3 near dup of 0
    "completely different content about ray data pipelines and arrow tables "
    "streaming through the object store with backpressure",  # 4
    "completely different content about ray data pipelines and arrow batches "
    "streaming through the object store with backpressure",  # 5 near dup of 4
    "unique snowflake text nothing like the others at all whatsoever",  # 6
]


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    )


def test_content_hash_deterministic():
    assert dedup.content_hash64("abc") == dedup.content_hash64("abc")
    assert dedup.content_hash64("abc") != dedup.content_hash64("abd")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 2, 3, 4, 5, 6]  # doc 1 (exact dup, higher id) dropped


def test_minhash_identical_signatures():
    a = dedup.minhash_of(BASE)
    b = dedup.minhash_of(BASE)
    assert (a == b).all()
    c = dedup.minhash_of(TEXTS[2])
    assert 0.5 < (a == c).mean() < 1.0  # near dup: high but not full overlap


def test_minhash_lsh_pairs(docs):
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    pairset = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in pairset  # exact dup always found
    assert (4, 5) in pairset  # near dup found
    assert all(a < b for a, b in pairset)
    # unrelated docs never pair
    assert not any(6 in p for p in pairset)
    sim_01 = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]["similarity"].iloc[0]
    assert sim_01 == 1.0


def test_minhash_clusters(docs):
    clusters = dedup.minhash_dedup_clusters(docs, threshold=0.5).to_pandas()
    cl = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert cl[0] == cl[1] == 0  # exact dups share cluster 0
    assert cl[4] == cl[5] == 4
    assert cl[6] == 6  # singleton keeps own id


def test_simhash_properties():
    assert dedup.simhash64(BASE) == dedup.simhash64(BASE)
    d_near = dedup.hamming64(dedup.simhash64(BASE), dedup.simhash64(TEXTS[2]))
    d_far = dedup.hamming64(dedup.simhash64(BASE), dedup.simhash64(TEXTS[4]))
    assert d_near < d_far


def test_simhash_pairs(docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=10)
    pairset = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in pairset
    ham_01 = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]["hamming"].iloc[0]
    assert ham_01 == 0


def test_ngram_jaccard_math():
    assert dedup.ngram_jaccard("a b c d", "a b c d") == 1.0
    assert dedup.ngram_jaccard("a b c", "x y z") == 0.0
    assert dedup.ngram_jaccard("", "") == 1.0


def test_ngram_jaccard_pairs(docs):
    cand = pd.DataFrame({"id_a": [0, 0, 4], "id_b": [1, 6, 5]})
    out = dedup.ngram_jaccard_pairs(docs, cand, threshold=0.5)
    got = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in got
    assert (0, 6) not in got  # below threshold


def test_first_per_key(docs, ray_session):
    import ray.data as rd
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u1", "u3", "u2"],
        "val": [5, 1, 3, 9, 0],
    }))
    out = dedup.first_per_key(ds, key_col="url", order_col="val").take_all()
    got = {r["url"]: r["val"] for r in out}
    assert got == {"u1": 3, "u2": 0, "u3": 9}


def test_connected_components_distributed_matches_union_find(ray_session):
    # chain + pair + singleton; distributed label propagation must equal
    # the driver union-find exactly
    pairs = pd.DataFrame({"id_a": [0, 1, 2, 10], "id_b": [1, 2, 3, 11]})
    ids = [0, 1, 2, 3, 10, 11, 20]
    a = dedup.connected_components(pairs, ids)
    b = dedup.connected_components_distributed(pairs, ids)
    assert a.values.tolist() == b.values.tolist()
    empty = dedup.connected_components_distributed(
        pd.DataFrame({"id_a": [], "id_b": []}), [5, 6])
    assert empty.values.tolist() == [[5, 5], [6, 6]]


def test_minhash_clusters_distributed(docs):
    def canon(ds):
        return (ds.to_pandas().sort_values("doc_id")
                .reset_index(drop=True).values.tolist())

    a = dedup.minhash_dedup_clusters(docs, threshold=0.5, distributed=False)
    b = dedup.minhash_dedup_clusters(docs, threshold=0.5, distributed=True)
    assert canon(a) == canon(b)


def test_pairs_ds_write_parquet_no_driver_frame(docs, monkeypatch, tmp_path):
    """The scale contract: *_pairs_ds → write_parquet with ZERO driver
    DataFrame of the pair set, on both the candidate-bounded and the
    forced fully-distributed join plan; bytes on disk match the collected
    convenience API."""
    import pyarrow.parquet as pq

    ref = dedup.minhash_lsh_pairs(docs, threshold=0.5)

    for plan, cap in (("driver", dedup.VERIFY_DRIVER_MAX), ("join", -1)):
        monkeypatch.setattr(dedup, "VERIFY_DRIVER_MAX", cap)
        out = str(tmp_path / f"pairs_{plan}")
        dedup.minhash_lsh_pairs_ds(docs, threshold=0.5).write_parquet(out)
        got = (pq.read_table(out).to_pandas()
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        assert got[["id_a", "id_b"]].values.tolist() == \
            ref[["id_a", "id_b"]].values.tolist()
        assert (got["similarity"].to_numpy()
                == ref["similarity"].to_numpy()).all()

    # simhash + ngram _ds variants share the plan machinery: schema + rows
    monkeypatch.setattr(dedup, "VERIFY_DRIVER_MAX", -1)
    sim = dedup.simhash_pairs_ds(docs, max_hamming=10)
    assert set(sim.schema().names) == {"id_a", "id_b", "hamming"}
    cand = dedup.minhash_lsh_pairs_ds(docs, threshold=0.5)
    ng = dedup.ngram_jaccard_pairs_ds(docs, cand, threshold=0.5)
    out2 = str(tmp_path / "ngram_join")
    ng.write_parquet(out2)
    got2 = pq.read_table(out2).to_pandas()
    assert {(0, 1), (4, 5)} <= set(zip(got2["id_a"], got2["id_b"]))


def test_candidate_pairs_no_self_pairs(ray_session, monkeypatch):
    """Duplicate ids in the input must not produce id_a == id_b pairs on
    ANY expansion path: size-2 aggregate, ≥3 driver self-merge, and the
    forced fully-distributed expand (which once emitted (x, x) from
    distinct positions of a duplicated id)."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": [7, 7, 8, 8, 8],
        "text": [BASE] * 2 + [TEXTS[4]] * 3,
    }))
    for cap in (dedup.VERIFY_DRIVER_MAX, -1):
        monkeypatch.setattr(dedup, "VERIFY_DRIVER_MAX", cap)
        pairs = dedup.minhash_lsh_pairs(ds, threshold=0.5)
        if len(pairs):
            assert (pairs["id_a"] < pairs["id_b"]).all()
            assert not (pairs["id_a"] == pairs["id_b"]).any()


def test_join_plan_matches_driver_plan(docs, monkeypatch):
    """Forcing VERIFY_DRIVER_MAX below any candidate count routes pairs
    through the fully-distributed join plan and clustering through min-label
    propagation; outputs must be identical to the candidate-bounded plan."""
    a_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    a_sim = dedup.simhash_pairs(docs, max_hamming=10)
    cand = pd.DataFrame({"id_a": [0, 0, 4], "id_b": [1, 6, 5]})
    a_ng = dedup.ngram_jaccard_pairs(docs, cand, threshold=0.5)
    a_cl = dedup.minhash_dedup_clusters(docs, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    monkeypatch.setattr(dedup, "VERIFY_DRIVER_MAX", -1)
    b_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    b_sim = dedup.simhash_pairs(docs, max_hamming=10)
    b_ng = dedup.ngram_jaccard_pairs(docs, cand, threshold=0.5)
    b_cl = dedup.minhash_dedup_clusters(docs, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    for a, b in ((a_pairs, b_pairs), (a_sim, b_sim), (a_ng, b_ng)):
        assert a.reset_index(drop=True).astype(str).values.tolist() == \
            b.reset_index(drop=True).astype(str).values.tolist()
    assert a_cl.values.tolist() == b_cl.values.tolist()


def test_minhash_cross_pairs_sides_and_tagging(ray_session):
    import pandas as pd
    import ray.data as rd

    from engine import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    corpus = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [base + "v0", base + "v1",
                 "totally different content " * 12],
    })
    bench = pd.DataFrame({"doc_id": [7], "text": [base + "v9"]})
    out = dedup.minhash_cross_pairs_ds(
        rd.from_pandas(corpus).repartition(2), rd.from_pandas(bench),
        threshold=0.7).to_pandas()
    # only CROSS pairs survive (0-1 intra-corpus dup is filtered out);
    # bench id is de-tagged back to its original value
    assert sorted(map(tuple, out[["doc_id", "bench_id"]].values.tolist())) \
        == [(0, 7), (1, 7)]
    assert (out["similarity"] >= 0.7).all()


def test_minhash_cross_pairs_rejects_huge_ids(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine import dedup

    corpus = pd.DataFrame({"doc_id": [dedup.CROSS_TAG + 1],
                           "text": ["abc def " * 10]})
    bench = pd.DataFrame({"doc_id": [1], "text": ["abc def " * 10]})
    with pytest.raises(Exception, match="2\\^40|RayTaskError|ids must"):
        dedup.minhash_cross_pairs_ds(
            rd.from_pandas(corpus), rd.from_pandas(bench)).to_pandas()
