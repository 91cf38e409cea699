"""Round-5 operator tests: the profile_columns cardinality gate and the
integer-exact HLL estimate (VERDICT r4 #4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _mixed_df(n: int = 3000) -> pd.DataFrame:
    rng = np.random.RandomState(11)
    return pd.DataFrame({
        "uniq": np.arange(n, dtype=np.int64),              # high-card probe
        "lowc": rng.randint(0, 20, n).astype(np.int64),    # low-card
        "nully": pd.array(
            [None if i % 7 == 0 else i % 13 for i in range(n)],
            dtype="Int64"),
    })


def test_profile_gate_routes_high_cardinality_to_hll():
    from engine.stats import hll_estimate_int, profile_columns

    df = _mixed_df()
    out = profile_columns(
        rd.from_pandas(df).repartition(6),
        ["uniq", "lowc", "nully"],
        approx="auto", distinct_cap=700, hll_m=256, hll_method="md5",
    ).to_pandas().set_index("col")

    # low-cardinality columns take the exact path
    assert bool(out.loc["lowc", "distinct_exact"])
    assert out.loc["lowc", "n_distinct"] == 20
    assert bool(out.loc["nully", "distinct_exact"])
    assert out.loc["nully", "n_distinct"] == 13          # nulls excluded
    assert out.loc["nully", "n_null"] == len(df[df.index % 7 == 0])

    # the unique-key probe trips the gate: HLL estimate, never the
    # O(rows) exact-domain exchange
    assert not bool(out.loc["uniq", "distinct_exact"])
    est = int(out.loc["uniq", "n_distinct"])
    assert abs(est - 3000) / 3000 < 0.15                 # ~1.04/sqrt(256)
    assert est > 700                                      # consistent gate


def test_profile_gate_partitioning_invariant():
    """The gate compares a merged-HLL estimate — partitioning-independent —
    so the WHOLE output (including which columns went approx) is identical
    at any block layout."""
    from engine.stats import profile_columns

    df = _mixed_df(1500)
    outs = []
    for parts in (1, 2, 8):
        outs.append(profile_columns(
            rd.from_pandas(df).repartition(parts),
            ["uniq", "lowc"], approx="auto", distinct_cap=700,
            hll_m=256, hll_method="md5").to_pandas())
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])


def test_profile_approx_modes():
    from engine.stats import profile_columns

    df = _mixed_df(1200)
    ds = rd.from_pandas(df).repartition(4)

    never = profile_columns(ds, ["uniq", "lowc"], approx="never") \
        .to_pandas().set_index("col")
    assert never["distinct_exact"].all()
    assert never.loc["uniq", "n_distinct"] == 1200

    always = profile_columns(ds, ["uniq", "lowc"], approx="always",
                             hll_method="md5").to_pandas().set_index("col")
    assert not always["distinct_exact"].any()

    with pytest.raises(ValueError):
        profile_columns(ds, ["lowc"], approx="auto", distinct_cap=100,
                        hll_m=256)  # cap below the small-range region
    with pytest.raises(ValueError):
        profile_columns(ds, ["lowc"], approx="bogus")


def test_hll_estimate_int_matches_float_form():
    """The integer ladder is the floor of the float estimator wherever the
    float form takes the raw (non-linear-counting) branch."""
    from engine.stats import hll_estimate, hll_estimate_int

    rng = np.random.RandomState(3)
    regs = pa.table({
        "register": pa.array(np.arange(256, dtype=np.int64)),
        "rho_max": pa.array(rng.randint(1, 20, 256).astype(np.int64)),
    })
    f = hll_estimate(regs, 256)
    i = hll_estimate_int(regs, 256)
    assert f > 2.5 * 256            # raw branch (no register is zero)
    # rational alpha vs float alpha differ only in the last ulp region
    assert abs(i - f) <= max(2.0, f * 1e-9)

    # empty register table: the small-range region — integer form still
    # returns a deterministic value (callers gate it to the exact path)
    empty = pa.table({"register": pa.array([], type=pa.int64()),
                      "rho_max": pa.array([], type=pa.int64())})
    assert hll_estimate_int(empty, 256) == 7213 * 256 * 256 // 2570790


# --- user-password PDF decryption (VERDICT r4 #8) ---------------------------
# fixtures come from the INDEPENDENT test encryptors in test_round4_ops
# (same files that pin the empty-password paths); only the password
# parameter plumbing is new engine surface.


def _pw_fixtures():
    from tests.test_round4_ops import (_encrypt_pdf_aes256,
                                       _encrypt_pdf_rc4, _plain_pdf)

    plain = _plain_pdf()
    return plain, _encrypt_pdf_rc4, _encrypt_pdf_aes256


@pytest.mark.parametrize("r,length", [(2, 40), (3, 128)])
def test_rc4_real_password_roundtrip(r, length):
    from engine.pdfx.extract import extract_pdf_doc
    from engine.pdfx.objects import PdfError

    plain, enc_rc4, _ = _pw_fixtures()
    want = extract_pdf_doc(plain)
    enc = enc_rc4(plain, r=r, length=length, password=b"hunter2")
    assert b"encrypted page one" not in enc
    assert extract_pdf_doc(enc, password=b"hunter2") == want
    assert extract_pdf_doc(enc, password="hunter2") == want  # str form
    with pytest.raises(PdfError, match="password required"):
        extract_pdf_doc(enc)
    with pytest.raises(PdfError, match="wrong password"):
        extract_pdf_doc(enc, password=b"nope")


@pytest.mark.parametrize("r", [5, 6])
def test_aes256_real_password_roundtrip(r):
    from engine.pdfx.extract import extract_pdf_doc
    from engine.pdfx.objects import PdfError

    plain, _, enc_aes = _pw_fixtures()
    want = extract_pdf_doc(plain)
    enc = enc_aes(plain, r=r, password=b"s3cret pass")
    assert b"encrypted page one" not in enc
    assert extract_pdf_doc(enc, password=b"s3cret pass") == want
    with pytest.raises(PdfError, match="password required"):
        extract_pdf_doc(enc)
    with pytest.raises(PdfError, match="wrong password"):
        extract_pdf_doc(enc, password=b"wrong")


def test_empty_password_paths_unchanged():
    """The default (no password) behavior is byte-identical to round 4:
    empty-password documents still open with no argument."""
    from engine.pdfx.extract import extract_pdf_doc

    plain, enc_rc4, enc_aes = _pw_fixtures()
    want = extract_pdf_doc(plain)
    assert extract_pdf_doc(enc_rc4(plain, r=3, length=128)) == want
    assert extract_pdf_doc(enc_aes(plain, r=6)) == want


# ---------------------------------------------------------------------------
# select_cluster_representatives (keep-best dedup policy)
# ---------------------------------------------------------------------------

def _rep_ref(ids, scores, edge_list):
    """Brute-force keep-best: union-find components, max score / min id."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i, s in zip(ids, scores):
        c = find(i)
        best = out.get(c)
        if best is None or s > best[1] or (s == best[1] and i < best[0]):
            out[c] = (i, s)
    return {c: v for c, v in out.items()}


@pytest.mark.parametrize("nparts", [1, 5])
def test_cluster_rep_matches_bruteforce(ray_session, nparts):
    from engine.dedup import select_cluster_representatives

    rng = np.random.RandomState(23)
    ids = list(range(60))
    scores = [int(rng.randint(0, 50)) for _ in ids]
    edge_list = [(i, i + 1) for i in ids if i % 10 != 9 and i + 1 in ids]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": ids, "score": scores})).repartition(nparts)
    edges = rd.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edge_list],
         "dst": [b for _, b in edge_list]})).repartition(nparts)
    got = select_cluster_representatives(docs, edges).to_pandas() \
        .sort_values("cluster").reset_index(drop=True)
    ref = _rep_ref(ids, scores, edge_list)
    assert len(got) == len(ref)
    for _, row in got.iterrows():
        assert ref[row["cluster"]] == (row["doc_id"], row["score"])


def test_cluster_rep_unlabeled_docs_survive(ray_session):
    from engine.dedup import select_cluster_representatives

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1, 2, 7], "score": [5, 9, 9, 1]}))
    edges = rd.from_pandas(pd.DataFrame({"src": [1], "dst": [2]}))
    got = select_cluster_representatives(docs, edges).to_pandas() \
        .sort_values("cluster").reset_index(drop=True)
    # cluster {1,2}: tie on score -> lowest id (1); singletons keep selves
    assert list(got["cluster"]) == [0, 1, 7]
    assert list(got["doc_id"]) == [0, 1, 7]
    assert list(got["score"]) == [5, 9, 1]


def test_cluster_rep_bounds_guard(ray_session):
    from engine.dedup import select_cluster_representatives

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "score": [1 << 30, 0]}))
    edges = rd.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(Exception, match="2\\^30"):
        select_cluster_representatives(docs, edges).to_pandas()


# ---------------------------------------------------------------------------
# bm25_search (integer-exact BM25 top-k)
# ---------------------------------------------------------------------------

def _bm25_ref(texts, terms, k):
    docs = {i: t.split() for i, t in enumerate(texts)}
    n = len(docs)
    dls = {i: len(t) for i, t in docs.items()}
    avgdl = max(1, sum(dls.values()) // n)
    df = {q: sum(1 for t in docs.values() if q in t) for q in terms}
    scores = {}
    for i, toks in docs.items():
        s = 0
        for q in terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = n.bit_length() - df[q].bit_length() + 1
            s += (idf * 22 * tf * avgdl * 4096) \
                // (10 * tf * avgdl + 3 * avgdl + 9 * dls[i])
        if s:
            scores[i] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


@pytest.mark.parametrize("nparts", [1, 4])
def test_bm25_matches_bruteforce(ray_session, nparts):
    from engine.textstats import bm25_search

    rng = np.random.RandomState(31)
    vocab = ["hash", "merge", "window", "the", "a", "data", "page"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 30)))
             for _ in range(40)]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(40), "text": texts})).repartition(nparts)
    got = bm25_search(docs, ("hash", "merge"), n_docs=40, k=5).to_pandas()
    ref = _bm25_ref(texts, ("hash", "merge"), 5)
    assert list(zip(got["doc_id"], got["score"])) == ref


def test_bm25_disjunctive_and_ties(ray_session):
    from engine.textstats import bm25_search

    texts = ["hash hash", "merge", "nothing here", "hash hash"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(4), "text": texts}))
    got = bm25_search(docs, ("hash", "merge"), n_docs=4, k=10).to_pandas()
    # doc 2 has no query term -> absent; the rarer term 'merge' carries a
    # higher idf so doc 1 wins; identical docs 0 and 3 tie -> id order
    assert list(got["doc_id"]) == [1, 0, 3]
    assert 2 not in set(got["doc_id"])
    assert got["score"][1] == got["score"][2]
