"""Round-4 operator tests: KLL quantile sketch, PDF needs_ocr / decrypt."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine import stats as st


def test_kll_weight_and_bound_property():
    rng = np.random.RandomState(11)
    for _ in range(8):
        n = rng.randint(3000, 80000)
        data = rng.uniform(0, 1000, n)
        k = int(rng.choice([256, 512, 1024]))
        nb = rng.randint(1, 40)
        parts = (np.split(data, np.sort(rng.choice(n, nb - 1, replace=False)))
                 if nb > 1 else [data])
        sketches = [st.kll_build(p, k) for p in parts]
        rng.shuffle(sketches)
        while len(sketches) > 1:  # arbitrary tree-merge order
            sketches = [st.kll_merge(sketches[i:i + 2], k)
                        for i in range(0, len(sketches), 2)]
        sk = sketches[0]
        assert st.kll_total_weight(sk) == n  # weight exactly preserved
        bound = st.kll_rank_error_bound(n, k)
        assert bound < 0.05 * n
        srt = np.sort(data)
        for q in (0.01, 0.2, 0.5, 0.8, 0.99):
            v = st.kll_quantile_values(sk, [q])[0]
            target = int(np.ceil(q * n)) or 1
            lo = np.searchsorted(srt, v, side="left") + 1
            hi = np.searchsorted(srt, v, side="right")
            err = (0 if lo <= target <= hi
                   else min(abs(target - lo), abs(target - hi)))
            assert err <= bound, (q, err, bound, n, k)


def test_kll_small_input_exact():
    # below capacity the sketch never compacts: answers == quantile_disc
    data = np.arange(100, dtype=float)
    sk = st.kll_build(data, k=512)
    for q in (0.01, 0.25, 0.5, 0.9, 1.0):
        target = int(np.ceil(q * 100)) or 1
        assert st.kll_quantile_values(sk, [q])[0] == float(target - 1)


def test_kll_partials_pipeline(ray_session):
    import ray.data as rd

    n = 20000
    vals = np.repeat(np.arange(10), n // 10).astype(float)
    rng = np.random.RandomState(3)
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"val": vals})).repartition(8)
    pairs = st.kll_quantiles(ds, "val", [0.05, 0.45, 0.95], k=1024)
    # mid-run targets: sketch value pinned to the exact quantile
    assert [v for _, v in pairs] == [0.0, 4.0, 9.0]


# ---------------------------------------------------------------------------
# PDF round-4: needs_ocr channel + empty-password RC4 decryption
# ---------------------------------------------------------------------------

IMAGE_ONLY_PDF = (
    b"%PDF-1.4\n"
    b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
    b"/Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
    b"4 0 obj\n<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
    b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Length 4 >>\n"
    b"stream\n\x00\x01\x02\x03\nendstream\nendobj\n"
    b"5 0 obj\n<< /Length 31 >>\nstream\n"
    b"q 100 0 0 100 0 0 cm /Im1 Do Q\nendstream\nendobj\n"
    b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
)


def test_image_only_pdf_raises_needs_ocr():
    import pytest

    from engine.pdfx.extract import extract_pdf
    from engine.pdfx.objects import PdfNeedsOcr

    with pytest.raises(PdfNeedsOcr):
        extract_pdf(IMAGE_ONLY_PDF)


def test_needs_ocr_status_channel():
    from engine.extract import extract_row

    row = extract_row(IMAGE_ONLY_PDF)
    assert row["status"] == "needs_ocr"
    assert "image XObjects" in row["error"]
    assert row["markdown_text"] == ""


def test_needs_ocr_with_inherited_resources():
    # /Resources hoisted to the /Pages tree node (ISO 32000 inheritable
    # attribute — common scanner output): the page inherits it, so the
    # image-only gate must still fire
    import pytest

    from engine.pdfx.extract import extract_pdf
    from engine.pdfx.objects import PdfNeedsOcr

    pdf = IMAGE_ONLY_PDF.replace(
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /XObject << /Im1 4 0 R >> >> >>",
    ).replace(
        b"/Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R",
        b"/Contents 5 0 R",
    )
    with pytest.raises(PdfNeedsOcr):
        extract_pdf(pdf)


def test_text_pdf_with_images_is_not_needs_ocr():
    # text + images: extracts normally (OCR only for image-ONLY pages)
    from engine.fixtures import build_pdf
    from engine.extract import extract_row

    pdf = build_pdf([[(72.0, 720.0, ["hello scanned world"])]])
    row = extract_row(pdf)
    assert row["status"] == "ok" and "hello" in row["markdown_text"]


def test_empty_pdf_without_images_still_ok():
    # no text AND no images: empty output, not needs_ocr
    from engine.extract import extract_row

    pdf = IMAGE_ONLY_PDF.replace(
        b"/Resources << /XObject << /Im1 4 0 R >> >> ", b"")
    row = extract_row(pdf)
    assert row["status"] == "ok" and row["markdown_text"] == ""


# --- empty-password RC4 encryption roundtrip -------------------------------
# The encryptor below is written INDEPENDENTLY of engine/pdfx/objects.py's
# decrypt path (own RC4, own key derivation) so the roundtrip actually
# validates the spec algorithms, not a shared implementation.

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _mini_rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    i = j = 0
    out = []
    for b in data:
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) % 256])
    return bytes(out)


def _ser(v) -> bytes:
    from engine.pdfx.objects import Name, Ref, Stream

    if isinstance(v, Name):
        return b"/" + str(v).encode()
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, float):
        return b"%.4f" % v
    if isinstance(v, bytes):
        return b"<" + v.hex().encode() + b">"
    if isinstance(v, Ref):
        return b"%d 0 R" % v.num
    if isinstance(v, list):
        return b"[ " + b" ".join(_ser(x) for x in v) + b" ]"
    if isinstance(v, dict):
        return (b"<< " + b" ".join(b"/" + k.encode() + b" " + _ser(x)
                                   for k, x in v.items()) + b" >>")
    if v is None:
        return b"null"
    raise AssertionError(type(v))


def _encrypt_pdf_rc4(plain: bytes, r: int = 2, length: int = 40,
                     password: bytes = b"") -> bytes:
    import hashlib
    import struct

    from engine.pdfx.objects import Name, Ref, Stream, parse_objects

    objects, trailer = parse_objects(plain)
    n = length // 8
    file_id = bytes(range(16))
    p = -44
    pad_pw = (password + _PAD)[:32]   # owner == user password here

    def iter_md5(d):
        for _ in range(50):
            d = hashlib.md5(d).digest()
        return d

    d = hashlib.md5(pad_pw).digest()
    key_o = (iter_md5(d) if r >= 3 else d)[:n]
    o_entry = _mini_rc4(key_o, pad_pw)
    if r >= 3:
        for i in range(1, 20):
            o_entry = _mini_rc4(bytes(b ^ i for b in key_o), o_entry)

    h = hashlib.md5(pad_pw + o_entry + struct.pack("<I", p & 0xFFFFFFFF)
                    + file_id).digest()
    key = h[:n]
    if r >= 3:  # R3+: 50 rounds of md5 over the truncated key
        k = h
        for _ in range(50):
            k = hashlib.md5(k[:n]).digest()
        key = k[:n]

    if r == 2:
        u_entry = _mini_rc4(key, _PAD)
    else:
        u_entry = _mini_rc4(key, hashlib.md5(_PAD + file_id).digest())
        for i in range(1, 20):
            u_entry = _mini_rc4(bytes(b ^ i for b in key), u_entry)
        u_entry += b"\x00" * 16

    def obj_key(num):
        ext = key + struct.pack("<I", num)[:3] + b"\x00\x00"
        return hashlib.md5(ext).digest()[:min(n + 5, 16)]

    def enc_value(v, ok):
        from engine.pdfx.objects import Name as _N, Ref as _R
        if isinstance(v, bytes):
            return _mini_rc4(ok, v)
        if isinstance(v, list):
            return [enc_value(x, ok) for x in v]
        if isinstance(v, dict):
            return {k: enc_value(x, ok) for k, x in v.items()}
        return v

    enc_num = max(objects) + 1
    out = [b"%PDF-1.4\n"]
    for num in sorted(objects):
        obj = objects[num]
        ok = obj_key(num)
        out.append(b"%d 0 obj\n" % num)
        if isinstance(obj, Stream):
            raw = _mini_rc4(ok, obj.raw)
            d2 = enc_value({k: v for k, v in obj.dict.items()
                            if k != "Length"}, ok)
            d2["Length"] = len(raw)
            out.append(_ser(d2) + b"\nstream\n" + raw + b"\nendstream")
        else:
            out.append(_ser(enc_value(obj, ok)))
        out.append(b"\nendobj\n")
    enc_dict = {"Filter": Name("Standard"), "V": 1 if r == 2 else 2,
                "R": r, "Length": length, "P": p,
                "O": o_entry, "U": u_entry}
    out.append(b"%d 0 obj\n" % enc_num + _ser(enc_dict) + b"\nendobj\n")
    tr = dict(trailer)
    tr["Encrypt"] = Ref(enc_num)
    tr["ID"] = [file_id, file_id]
    out.append(b"trailer\n" + _ser(tr) + b"\n%%EOF\n")
    return b"".join(out)


def _plain_pdf(**kw):
    from engine.fixtures import build_pdf

    return build_pdf(
        [[(72.0, 720.0, ["encrypted page one", "second line"])],
         [(72.0, 700.0, ["page two content"])]],
        title="Secret Title", **kw)


def test_rc4_roundtrip_r2_and_r3():
    from engine.pdfx.extract import extract_pdf_doc

    plain = _plain_pdf()
    want = extract_pdf_doc(plain)
    assert "encrypted page one" in want[1]
    for r, length in ((2, 40), (3, 128)):
        enc = _encrypt_pdf_rc4(plain, r=r, length=length)
        assert b"encrypted page one" not in enc  # ciphertext on disk
        assert extract_pdf_doc(enc) == want
    # compressed streams decrypt before inflate
    plain_z = _plain_pdf(compress=True)
    assert extract_pdf_doc(_encrypt_pdf_rc4(plain_z, r=3, length=128)) \
        == extract_pdf_doc(plain_z)


def test_rc4_wrong_password_raises():
    import pytest

    from engine.pdfx.extract import extract_pdf_doc
    from engine.pdfx.objects import PdfError

    enc = _encrypt_pdf_rc4(_plain_pdf())
    bad = enc.replace(b"/U <", b"/U <ff", 1)  # corrupt the /U entry
    with pytest.raises(PdfError, match="password required"):
        extract_pdf_doc(bad)


def test_unsupported_encryption_raises():
    import pytest

    from engine.pdfx.extract import extract_pdf_doc
    from engine.pdfx.objects import PdfError

    enc = _encrypt_pdf_rc4(_plain_pdf())
    # V6/R7 does not exist in the spec and must fail loudly; a V5/R6
    # label on RC4-length /O//U (malformed AESV3) must also fail loudly
    # rather than silently mis-decrypt (AESV3 itself IS supported —
    # test_aes256_pdf_roundtrip below covers the real path)
    bogus = enc.replace(b"/V 1", b"/V 6").replace(b"/R 2", b"/R 7")
    with pytest.raises(PdfError, match="unsupported"):
        extract_pdf_doc(bogus)
    mangled = enc.replace(b"/V 1", b"/V 5").replace(b"/R 2", b"/R 6")
    with pytest.raises(PdfError, match="malformed V5"):
        extract_pdf_doc(mangled)


def test_encrypted_status_channel():
    from engine.extract import extract_row

    enc = _encrypt_pdf_rc4(_plain_pdf())
    row = extract_row(enc)
    assert row["status"] == "ok"
    assert "encrypted page one" in row["markdown_text"]
    assert row["title"] == "Secret Title"


def test_kll_by_key_pipeline(ray_session):
    import ray.data as rd

    n = 10000
    ids = np.arange(n)
    t = pa.table({"key": ids % 5, "val": (ids % 10).astype(float)})
    ds = rd.from_arrow(t).repartition(6)
    out = st.kll_quantiles_by_key(ds, "key", "val", [0.25, 0.75], k=1024)
    got = {(k, q): v for k, q, v in zip(out["key"].to_pylist(),
                                        out["q"].to_pylist(),
                                        out["value"].to_pylist())}
    # key k holds two equal runs (k, k+5): q<0.5 -> k, q>0.5 -> k+5
    for k in range(5):
        assert got[(k, 0.25)] == float(k)
        assert got[(k, 0.75)] == float(k + 5)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _mg_truth(keys, min_fraction):
    import collections
    import math

    c = collections.Counter(keys.tolist())
    t = int(math.ceil(min_fraction * len(keys)))
    return sorted((k, v) for k, v in c.items() if v >= t)


def test_heavy_hitters_exact_vs_truth(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    for _ in range(4):
        n = int(rng.randint(5000, 30000))
        # zipf-ish: a few hot keys over a long singleton tail
        hot = rng.randint(0, 12, size=n // 2)
        cold = rng.randint(10_000, 10_000_000, size=n - n // 2)
        keys = np.concatenate([hot, cold]).astype(np.int64)
        rng.shuffle(keys)
        ds = rd.from_arrow(pa.table({"k": keys})).repartition(
            int(rng.randint(1, 24)))
        out = st.heavy_hitters(ds, "k", min_fraction=0.02, k=128,
                               n=n).take_all()
        got = sorted((r["k"], r["n"]) for r in out)
        assert got == _mg_truth(keys, 0.02)


def test_heavy_hitters_parallelism_invariant(ray_session):
    import ray.data as rd

    ids = np.arange(20000, dtype=np.int64)
    keys = np.where(ids % 10 < 5, ids % 7, ids)
    expected = _mg_truth(keys, 0.01)
    for parts in (1, 7, 64):
        ds = rd.from_arrow(pa.table({"k": keys})).repartition(parts)
        out = st.heavy_hitters(ds, "k", min_fraction=0.01, k=256,
                               n=len(keys)).take_all()
        assert sorted((r["k"], r["n"]) for r in out) == expected


def test_heavy_hitters_guarantee_guard(ray_session):
    import pytest
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": np.arange(100, dtype=np.int64)}))
    with pytest.raises(ValueError):
        # min_fraction <= 1/(k+1): superset guarantee void
        st.heavy_hitters(ds, "k", min_fraction=0.001, k=128, n=100)


def test_mg_partial_trim_bound():
    # per-block MG trim: <= k survivors, undercount <= n/(k+1)
    rng = np.random.RandomState(3)
    v = rng.zipf(1.3, size=20000)
    v = v[v < 10**6].astype(np.int64)
    k = 64
    vals, counts = np.unique(v, return_counts=True)
    cut = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    kept = counts - cut
    keep = kept > 0
    assert keep.sum() <= k
    assert cut <= len(v) // (k + 1) + 1
    true = dict(zip(vals.tolist(), counts.tolist()))
    for val, est in zip(vals[keep].tolist(), kept[keep].tolist()):
        assert true[val] - est <= len(v) // (k + 1) + 1


# ---------------------------------------------------------------------------
# Distributed k-means
# ---------------------------------------------------------------------------


def _planted_vectors(n, k=4, d=8):
    doc = np.arange(n, dtype=np.int64)
    vecs = np.empty((n, d), dtype=np.float64)
    for i in range(d):
        jit = (doc // (i + 1)) % 3 - 1
        vecs[:, i] = np.where(doc % k == i, 12, jit)
    return doc, vecs


def _vec_table(doc, vecs):
    d = vecs.shape[1]
    offsets = pa.array(np.arange(len(doc) + 1, dtype=np.int32) * d)
    emb = pa.ListArray.from_arrays(offsets, pa.array(vecs.ravel()))
    return pa.table({"doc_id": doc, "embedding": emb})


def test_kmeans_recovers_planted_means(ray_session):
    import ray.data as rd

    from engine.cluster import kmeans_assign, kmeans_iterate

    doc, vecs = _planted_vectors(4000)
    ds = rd.from_arrow(_vec_table(doc, vecs)).repartition(16)
    cents, stats = kmeans_iterate(ds, np.eye(4, 8), iters=5, tol=1e-12)
    for c in range(4):
        np.testing.assert_allclose(cents[c], vecs[doc % 4 == c].mean(axis=0),
                                   atol=1e-12)
    asg = kmeans_assign(ds, cents, "doc_id").take_all()
    assert all(r["cluster"] == r["doc_id"] % 4 for r in asg)


def test_kmeans_parallelism_invariant(ray_session):
    import ray.data as rd

    from engine.cluster import kmeans_iterate

    doc, vecs = _planted_vectors(3000)
    t = _vec_table(doc, vecs)
    ref = None
    for parts in (1, 5, 32):
        ds = rd.from_arrow(t).repartition(parts)
        cents, _ = kmeans_iterate(ds, np.eye(4, 8), iters=3, tol=1e-12)
        if ref is None:
            ref = cents
        else:
            np.testing.assert_array_equal(cents, ref)


def test_kmeans_perturbed_init_recovers(ray_session):
    import ray.data as rd

    from engine.cluster import kmeans_iterate

    doc, vecs = _planted_vectors(2000)
    ds = rd.from_arrow(_vec_table(doc, vecs)).repartition(8)
    rng = np.random.RandomState(9)
    init = np.eye(4, 8) + rng.uniform(-0.5, 0.5, size=(4, 8))
    cents, _ = kmeans_iterate(ds, init, iters=6, tol=1e-12)
    for c in range(4):
        np.testing.assert_allclose(cents[c], vecs[doc % 4 == c].mean(axis=0),
                                   atol=1e-12)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd

    from engine.cluster import kmeans_iterate

    # all points near axis 0: clusters 1-3 never win a point
    vecs = np.zeros((50, 4))
    vecs[:, 0] = 10.0
    doc = np.arange(50, dtype=np.int64)
    ds = rd.from_arrow(_vec_table(doc, vecs))
    init = np.eye(4, 4) * 100.0
    init[0] = [10, 0, 0, 0]
    cents, stats = kmeans_iterate(ds, init, iters=2, tol=-1.0)
    np.testing.assert_allclose(cents[0], [10, 0, 0, 0])
    for c in range(1, 4):
        np.testing.assert_allclose(cents[c], init[c])  # untouched
    assert set(stats["cluster"].to_pylist()) == {0}


# --- empty-password AES (V4/R4, AESV2) roundtrip ----------------------------
# Key derivation below is written independently of objects.py (same pattern
# as _encrypt_pdf_rc4); the AES-128 primitive itself is pinned externally by
# the FIPS-197 Appendix B vector (test_aes_fips_vector), and the CBC
# encryptor is the mathematical inverse exercised both ways here.


def test_aes_fips_vector():
    from engine.pdfx.aes import _decrypt_block, _encrypt_block, _expand_key

    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "3925841d02dc09fbdc118597196a0b32"
    assert _decrypt_block(ct, _expand_key(key)) == pt


def test_aes_cbc_padding_rejected():
    import pytest

    from engine.pdfx.aes import aes128_cbc_decrypt, aes128_cbc_encrypt

    key = bytes(range(16))
    enc = aes128_cbc_encrypt(key, b"\x07" * 16, b"hello world")
    assert aes128_cbc_decrypt(key, enc) == b"hello world"
    with pytest.raises(ValueError):
        aes128_cbc_decrypt(key, enc[:16])          # too short
    with pytest.raises(ValueError):
        aes128_cbc_decrypt(bytes(16), enc)         # wrong key → bad pad


def _encrypt_pdf_aes(plain: bytes) -> bytes:
    """Independent V4/R4 AESV2 encryptor (empty user password)."""
    import hashlib
    import struct

    from engine.pdfx.aes import aes128_cbc_encrypt
    from engine.pdfx.objects import Name, Ref, Stream, parse_objects

    objects, trailer = parse_objects(plain)
    n = 16  # Length 128
    file_id = bytes(range(16))
    p = -44

    d = hashlib.md5(_PAD).digest()
    for _ in range(50):
        d = hashlib.md5(d).digest()
    key_o = d[:n]
    o_entry = _mini_rc4(key_o, _PAD)
    for i in range(1, 20):
        o_entry = _mini_rc4(bytes(b ^ i for b in key_o), o_entry)

    h = hashlib.md5(_PAD + o_entry + struct.pack("<I", p & 0xFFFFFFFF)
                    + file_id).digest()
    k = h
    for _ in range(50):
        k = hashlib.md5(k[:n]).digest()
    key = k[:n]

    u_entry = _mini_rc4(key, hashlib.md5(_PAD + file_id).digest())
    for i in range(1, 20):
        u_entry = _mini_rc4(bytes(b ^ i for b in key), u_entry)
    u_entry += b"\x00" * 16

    def obj_key(num):
        ext = (key + struct.pack("<I", num)[:3] + b"\x00\x00" + b"sAlT")
        return hashlib.md5(ext).digest()[:16]

    def iv_for(num, tag):
        import hashlib as _h
        return _h.md5(b"iv%d%s" % (num, tag)).digest()  # deterministic IV

    def enc_value(v, num, ok):
        if isinstance(v, bytes):
            return aes128_cbc_encrypt(ok, iv_for(num, b"s"), v)
        if isinstance(v, list):
            return [enc_value(x, num, ok) for x in v]
        if isinstance(v, dict):
            return {kk: enc_value(x, num, ok) for kk, x in v.items()}
        return v

    enc_num = max(objects) + 1
    out = [b"%PDF-1.6\n"]
    for num in sorted(objects):
        obj = objects[num]
        ok = obj_key(num)
        out.append(b"%d 0 obj\n" % num)
        if isinstance(obj, Stream):
            raw = aes128_cbc_encrypt(ok, iv_for(num, b"m"), obj.raw)
            d2 = enc_value({kk: v for kk, v in obj.dict.items()
                            if kk != "Length"}, num, ok)
            d2["Length"] = len(raw)
            out.append(_ser(d2) + b"\nstream\n" + raw + b"\nendstream")
        else:
            out.append(_ser(enc_value(obj, num, ok)))
        out.append(b"\nendobj\n")
    enc_dict = {
        "Filter": Name("Standard"), "V": 4, "R": 4, "Length": 128, "P": p,
        "O": o_entry, "U": u_entry,
        "CF": {"StdCF": {"CFM": Name("AESV2"), "Length": 16}},
        "StmF": Name("StdCF"), "StrF": Name("StdCF"),
    }
    out.append(b"%d 0 obj\n" % enc_num + _ser(enc_dict) + b"\nendobj\n")
    tr = dict(trailer)
    tr["Encrypt"] = Ref(enc_num)
    tr["ID"] = [file_id, file_id]
    out.append(b"trailer\n" + _ser(tr) + b"\n%%EOF\n")
    return b"".join(out)


def test_aes_pdf_roundtrip():
    from engine.pdfx.extract import extract_pdf_doc

    plain = _plain_pdf()
    want = extract_pdf_doc(plain)
    enc = _encrypt_pdf_aes(plain)
    assert b"encrypted page one" not in enc
    assert extract_pdf_doc(enc) == want
    # compressed streams: decrypt-then-inflate ordering
    plain_z = _plain_pdf(compress=True)
    assert extract_pdf_doc(_encrypt_pdf_aes(plain_z)) \
        == extract_pdf_doc(plain_z)


def test_aes_wrong_password_raises():
    import pytest

    from engine.pdfx.extract import extract_pdf_doc
    from engine.pdfx.objects import PdfError

    enc = _encrypt_pdf_aes(_plain_pdf())
    bad = enc.replace(b"/U <", b"/U <ff", 1)
    with pytest.raises(PdfError, match="password required"):
        extract_pdf_doc(bad)


def test_aes_empty_string_passes_through():
    # empty PDF strings appear un-wrapped in the wild; the RC4 path
    # tolerated them (rc4(key, b'') == b'') and AES must too
    from engine.pdfx.objects import _aes_decrypt

    assert _aes_decrypt(bytes(16), b"") == b""


# --- empty-password AES-256 (V5/R6, AESV3) roundtrip ------------------------
# The R6 hash ladder below is written from the ISO 32000-2 Algorithm 2.B
# text independently of engine.pdfx.aes.hash_r6 (loop structure, digest
# selection and termination re-derived); only the externally-FIPS-pinned
# block primitives are shared.


def _hash_2b_independent(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    import hashlib

    from engine.pdfx.aes import _encrypt_block, _expand_key

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        unit = pw + k + udata
        k1 = unit * 64
        # AES-128-CBC over k1, key=k[:16], iv=k[16:32], hand-rolled here
        rks = _expand_key(k[:16])
        prev = k[16:32]
        e = bytearray()
        for off in range(0, len(k1), 16):
            blk = bytes(a ^ b for a, b in zip(k1[off:off + 16], prev))
            prev = _encrypt_block(blk, rks)
            e += prev
        pick = sum(e[:16]) % 3
        if pick == 0:
            k = hashlib.sha256(e).digest()
        elif pick == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _encrypt_pdf_aes256(plain: bytes, r: int = 6,
                        password: bytes = b"") -> bytes:
    """Independent V5 AESV3 encryptor (R=5 or 6, optional user password)."""
    import hashlib

    from engine.pdfx.aes import aes_cbc_encrypt_raw
    from engine.pdfx.objects import Name, Ref, Stream, parse_objects

    objects, trailer = parse_objects(plain)
    file_key = bytes(range(1, 33))            # 32-byte content key
    vsalt = b"VALSALT!"
    ksalt = b"KEYSALT!"
    pw = password[:127]
    if r == 5:
        digest = hashlib.sha256(pw + vsalt).digest()
        inter = hashlib.sha256(pw + ksalt).digest()
    else:
        digest = _hash_2b_independent(pw, vsalt)
        inter = _hash_2b_independent(pw, ksalt)
    u_entry = digest + vsalt + ksalt
    ue_entry = aes_cbc_encrypt_raw(inter, bytes(16), file_key)
    # owner entries are present but arbitrary (empty-USER-password readers
    # never consult them)
    o_entry, oe_entry = b"\xAA" * 48, b"\xBB" * 32

    def iv_for(num, tag):
        return hashlib.md5(b"iv%d%s" % (num, tag)).digest()

    def aes_pad_encrypt(num, tag, data):
        from engine.pdfx.aes import aes128_cbc_encrypt
        iv = iv_for(num, tag)
        # aes128_cbc_encrypt pads + prefixes the IV; key len selects AES-256
        return aes128_cbc_encrypt(file_key, iv, data)

    def enc_value(v, num):
        if isinstance(v, bytes):
            return aes_pad_encrypt(num, b"s", v)
        if isinstance(v, list):
            return [enc_value(x, num) for x in v]
        if isinstance(v, dict):
            return {kk: enc_value(x, num) for kk, x in v.items()}
        return v

    enc_num = max(objects) + 1
    out = [b"%PDF-2.0\n"]
    for num in sorted(objects):
        obj = objects[num]
        out.append(b"%d 0 obj\n" % num)
        if isinstance(obj, Stream):
            raw = aes_pad_encrypt(num, b"m", obj.raw)
            d2 = enc_value({kk: v for kk, v in obj.dict.items()
                            if kk != "Length"}, num)
            d2["Length"] = len(raw)
            out.append(_ser(d2) + b"\nstream\n" + raw + b"\nendstream")
        else:
            out.append(_ser(enc_value(obj, num)))
        out.append(b"\nendobj\n")
    enc_dict = {
        "Filter": Name("Standard"), "V": 5, "R": r, "Length": 256, "P": -44,
        "O": o_entry, "U": u_entry, "OE": oe_entry, "UE": ue_entry,
        "CF": {"StdCF": {"CFM": Name("AESV3"), "Length": 32}},
        "StmF": Name("StdCF"), "StrF": Name("StdCF"),
    }
    out.append(b"%d 0 obj\n" % enc_num + _ser(enc_dict) + b"\nendobj\n")
    tr = dict(trailer)
    tr["Encrypt"] = Ref(enc_num)
    tr["ID"] = [bytes(range(16)), bytes(range(16))]
    out.append(b"trailer\n" + _ser(tr) + b"\n%%EOF\n")
    return b"".join(out)


def test_aes256_fips_vector():
    # FIPS-197 Appendix C.3 (AES-256) pins the widened key schedule
    from engine.pdfx.aes import _decrypt_block, _encrypt_block, _expand_key

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(ct, _expand_key(key)) == pt


def test_hash_r6_matches_independent():
    # engine ladder vs the test's independently-written Algorithm 2.B
    from engine.pdfx.aes import hash_r6

    for pw, salt in [(b"", b"\x00" * 8), (b"", b"VALSALT!"),
                     (b"pw", b"12345678")]:
        assert hash_r6(pw, salt) == _hash_2b_independent(pw, salt)
        assert hash_r6(pw, salt, b"u" * 48) == \
            _hash_2b_independent(pw, salt, b"u" * 48)


def test_aes256_pdf_roundtrip():
    from engine.pdfx.extract import extract_pdf_doc

    plain = _plain_pdf()
    want = extract_pdf_doc(plain)
    for r in (5, 6):
        enc = _encrypt_pdf_aes256(plain, r=r)
        assert b"encrypted page one" not in enc
        assert extract_pdf_doc(enc) == want
    # compressed streams: decrypt-then-inflate ordering
    plain_z = _plain_pdf(compress=True)
    assert extract_pdf_doc(_encrypt_pdf_aes256(plain_z)) \
        == extract_pdf_doc(plain_z)


def test_aes256_wrong_password_raises():
    import pytest

    from engine.pdfx.extract import extract_pdf_doc
    from engine.pdfx.objects import PdfError

    enc = _encrypt_pdf_aes256(_plain_pdf())
    bad = enc.replace(b"/U <", b"/U <ff", 1)
    with pytest.raises(PdfError, match="password required"):
        extract_pdf_doc(bad)
