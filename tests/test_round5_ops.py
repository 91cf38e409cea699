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
