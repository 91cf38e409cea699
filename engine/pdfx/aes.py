"""Pure-Python AES-128/256 (FIPS-197) + CBC, for PDF AESV2/AESV3 filters.

The PDF 1.6+ standard security handler wraps streams/strings in
AES-128-CBC with a per-object key and a 16-byte IV prefix (PDF 1.7 spec
§7.6.2). The sandbox has no `cryptography`/`pycryptodome`, and AES-128 is
~100 lines with generated tables — so, like engine/imagecodec.py, the
kernel is REAL here, not a stub. Throughput is Python-speed; it's paid
only on the encrypted minority of crawl rows (same note as RC4 in
objects.py). Tables are generated from the GF(2^8) structure at import —
no typed constant blocks to mistype.

Verified against the FIPS-197 Appendix B vector in tests/test_round4_ops.py.
"""

from __future__ import annotations

# --- table generation (GF(2^8), generator 3) -------------------------------

_EXP = [0] * 512
_LOG = [0] * 256
_p = 1
for _i in range(255):
    _EXP[_i] = _p
    _LOG[_p] = _i
    _p ^= ((_p << 1) ^ 0x1B) & 0xFF if _p & 0x80 else (_p << 1)
for _i in range(255, 512):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rotl8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF


SBOX = [0] * 256
INV_SBOX = [0] * 256
for _a in range(256):
    _inv = 0 if _a == 0 else _EXP[255 - _LOG[_a]]
    _s = (_inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2) ^ _rotl8(_inv, 3)
          ^ _rotl8(_inv, 4) ^ 0x63)
    SBOX[_a] = _s
    INV_SBOX[_s] = _a

_RCON = [0x01]
for _i in range(13):
    _r = _RCON[-1]
    _RCON.append(((_r << 1) ^ 0x1B) & 0xFF if _r & 0x80 else (_r << 1))


def _expand_key(key: bytes) -> list[list[int]]:
    """128/192/256-bit key → Nr+1 round keys (each 16 ints, FIPS-197 §5.2)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError("AES requires a 16/24/32-byte key")
    nr = nk + 6
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _add_rk(s: list[int], rk: list[int]) -> None:
    for i in range(16):
        s[i] ^= rk[i]


# state is column-major (s[4*c + r] = row r, col c), matching FIPS layout
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    nr = len(rks) - 1
    _add_rk(s, rks[0])
    for rnd in range(1, nr):
        s = [SBOX[s[_SHIFT[i]]] for i in range(16)]
        t = s
        s = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c + 0] = _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3
            s[4 * c + 1] = a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3
            s[4 * c + 2] = a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3)
            s[4 * c + 3] = _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2)
        _add_rk(s, rks[rnd])
    s = [SBOX[s[_SHIFT[i]]] for i in range(16)]
    _add_rk(s, rks[nr])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    nr = len(rks) - 1
    _add_rk(s, rks[nr])
    for rnd in range(nr - 1, 0, -1):
        s = [INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        _add_rk(s, rks[rnd])
        t = s
        s = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c + 0] = (_gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13)
                            ^ _gmul(a3, 9))
            s[4 * c + 1] = (_gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11)
                            ^ _gmul(a3, 13))
            s[4 * c + 2] = (_gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14)
                            ^ _gmul(a3, 11))
            s[4 * c + 3] = (_gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9)
                            ^ _gmul(a3, 14))
    s = [INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
    _add_rk(s, rks[0])
    return bytes(s)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2/AESV3 layout: data = IV(16) || ciphertext; PKCS#7 unpad.

    Key length selects the variant (16 → AES-128, 32 → AES-256)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    rks = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for off in range(16, len(data), 16):
        blk = data[off:off + 16]
        plain = _decrypt_block(blk, rks)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding")
    return bytes(out[:-pad])


def aes128_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_decrypt` (fixture writer)."""
    rks = _expand_key(key)
    pad = 16 - len(plain) % 16
    plain = plain + bytes([pad]) * pad
    prev = iv
    out = bytearray(iv)
    for off in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[off:off + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


# Back-compat alias (the AESV2 path and its tests predate the generic name).
aes128_cbc_decrypt = aes_cbc_decrypt


def aes_cbc_encrypt_raw(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """CBC encrypt with NO padding and NO IV prefix (len % 16 == 0).

    Used by the R6 hash ladder (Algorithm 2.B) and the /UE key wrap,
    both of which operate on exact block multiples."""
    if len(plain) % 16:
        raise ValueError("raw CBC requires a block-multiple input")
    rks = _expand_key(key)
    prev = iv
    out = bytearray()
    for off in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[off:off + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt with NO padding and NO IV prefix (inverse of the raw
    encryptor; the /UE → file-key unwrap)."""
    if len(data) % 16:
        raise ValueError("raw CBC requires a block-multiple input")
    rks = _expand_key(key)
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        blk = data[off:off + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    return bytes(out)


def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the R6 password hash ladder.

    SHA-256 seeded, then ≥64 rounds of (repeat-64 → AES-128-CBC encrypt →
    SHA-{256,384,512} picked by the first 16 bytes mod 3), terminating when
    round ≥ 64 and the last ciphertext byte ≤ round-32. R5 callers use a
    single SHA-256 instead (see objects._v5_file_key)."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_raw(k[:16], k[16:32], k1)
        k = [hashlib.sha256, hashlib.sha384,
             hashlib.sha512][sum(e[:16]) % 3](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]
