"""PDF standard-security-handler decryption (ISO 32000-1/-2 §7.6).

The reference only DETECTS encryption (src/root.zig:292-302: /Encrypt in
the trailer -> error record, extraction proceeds on ciphertext). Real
crawls carry a large class of "permissions-encrypted" documents —
publishers set an OWNER password but leave the USER password empty, so
the standard handler's Algorithm 2/2.A recovers the file key without any
secret and their text is fully extractable. This module closes that gap
from scratch, from public specification text only:

- RC4 (the /V1 /V2 cipher) — pinned against the classic published
  vectors (tests/test_kernel.py::TestCrypto).
- AES-128/256 block cipher (FIPS-197) + CBC (SP 800-38A) — pinned
  against the FIPS-197 App. C and SP 800-38A F.2 vectors in tests.
- The Standard security handler:
  * /R 2/3/4 — Algorithm 2 file key (MD5 KDF), Algorithms 4/5 user-
    password verification, Algorithm 3 owner-key path (empty owner
    password attempted when the empty user password fails), per-object
    keys (Algorithm 1), RC4 and AESV2 (AES-128-CBC, IV-prefixed) crypt
    filters, /EncryptMetadata salt, /Identity StmF/StrF.
  * /R 5/6 — SHA-256 validation salts, the Algorithm 2.B hardened hash
    (R6), file key unwrap from /UE//OE via AES-256-CBC (Algorithm 2.A),
    IV-prefixed AES-256-CBC data, no per-object derivation.

Integration contract: `build_crypt_context` returns a CryptContext only
when an EMPTY password authenticates (user first, then owner). Callers
install it in the resolution cache under CRYPT_CACHE_KEY; resolve_ref
applies `transform_object` once per indirect object (streams decrypt
their raw bytes BEFORE filter decoding; strings decrypt in place; ObjStm
members are never re-decrypted — their container already was, per spec).
When authentication fails the caller keeps the reference's posture
(detection-only error record). Nothing here ever raises on hostile
input; failures surface as None / unchanged bytes.

Speed posture: pure-Python AES runs ~1 MB/s — encrypted PDFs are a
small minority class and each decrypts only its own streams once;
unencrypted documents pay one dict .get per resolved object.
"""
from __future__ import annotations

import hashlib
from typing import Callable, Optional

from .objects import Name, Stream

# -- RC4 -------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    if klen == 0:
        return bytes(data)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# -- AES (FIPS-197) ---------------------------------------------------------
# S-box built algorithmically (GF(2^8) inverse + affine transform) rather
# than pasted, so the derivation itself is checked by the NIST vectors.

def _build_tables():
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 0x03 = x * 2 ^ x
        x ^= ((x << 1) ^ 0x1B) & 0xFF if x & 0x80 else (x << 1)
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox = [0] * 256
    for a in range(256):
        s = exp[255 - log[a]] if a else 0
        r = s
        for _ in range(4):
            s = ((s << 1) | (s >> 7)) & 0xFF
            r ^= s
        sbox[a] = r ^ 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    mul = {c: bytes(gmul(c, x) for x in range(256))
           for c in (2, 3, 9, 11, 13, 14)}
    return sbox, inv, mul


_SBOX, _INV_SBOX, _MUL = _build_tables()
_M2, _M3 = _MUL[2], _MUL[3]
_M9, _M11, _M13, _M14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]


def _expand_key(key: bytes):
    nk = len(key) // 4
    if nk not in (4, 6, 8) or len(key) % 4:
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        prev = w[i - nk]
        w.append([prev[0] ^ t[0], prev[1] ^ t[1], prev[2] ^ t[2], prev[3] ^ t[3]])
    # flatten to one 16-byte round key per round
    rks = []
    for r in range(nr + 1):
        rk = w[4 * r] + w[4 * r + 1] + w[4 * r + 2] + w[4 * r + 3]
        rks.append(rk)
    return rks, nr


# byte i of the flat state belongs to column i//4, row i%4 (FIPS-197 §3.4)
_SHIFT = [((i // 4 + i % 4) % 4) * 4 + i % 4 for i in range(16)]
_INV_SHIFT = [((i // 4 - i % 4) % 4) * 4 + i % 4 for i in range(16)]


def _encrypt_block(block, rks, nr):
    rk = rks[0]
    s = [block[i] ^ rk[i] for i in range(16)]
    for rnd in range(1, nr):
        t = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
        rk = rks[rnd]
        for c in (0, 4, 8, 12):
            a0, a1, a2, a3 = t[c], t[c + 1], t[c + 2], t[c + 3]
            s[c] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3 ^ rk[c]
            s[c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3 ^ rk[c + 1]
            s[c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3] ^ rk[c + 2]
            s[c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3] ^ rk[c + 3]
    rk = rks[nr]
    return bytes(_SBOX[s[_SHIFT[i]]] ^ rk[i] for i in range(16))


def _decrypt_block(block, rks, nr):
    rk = rks[nr]
    s = [block[i] ^ rk[i] for i in range(16)]
    for rnd in range(nr - 1, 0, -1):
        t = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        rk = rks[rnd]
        for i in range(16):
            t[i] ^= rk[i]
        for c in (0, 4, 8, 12):
            a0, a1, a2, a3 = t[c], t[c + 1], t[c + 2], t[c + 3]
            s[c] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    rk = rks[0]
    return bytes(_INV_SBOX[s[_INV_SHIFT[i]]] ^ rk[i] for i in range(16))


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    rks, nr = _expand_key(key)
    return _encrypt_block(block, rks, nr)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    rks, nr = _expand_key(key)
    return _decrypt_block(block, rks, nr)


def _aes_cbc_encrypt_py(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Pure-Python CBC encrypt WITHOUT padding — the from-scratch
    reference implementation (FIPS-197/SP 800-38A vector-pinned)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt needs 16-byte-aligned input")
    rks, nr = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        prev = _encrypt_block(blk, rks, nr)
        out += prev
    return bytes(out)


def _aes_cbc_decrypt_py(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Pure-Python CBC decrypt WITHOUT padding removal (truncates
    ragged tails) — the from-scratch reference implementation."""
    n = len(data) - (len(data) % 16)
    rks, nr = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, n, 16):
        blk = data[off:off + 16]
        pt = _decrypt_block(blk, rks, nr)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = blk
    return bytes(out)


def _load_libcrypto():
    """Optional AES fast path through the PLATFORM's OpenSSL libcrypto
    (the library CPython's own ssl module links — no new dependency,
    public EVP API only). The ISO 32000-2 Algorithm 2.B hardened KDF
    encrypts ~18k AES blocks per R6 document; at ~40 µs/block the
    pure-Python reference costs ~0.75 s/doc, which a crawl-scale
    extraction job cannot pay per encrypted PDF. Both implementations
    are pinned to the same published vectors and cross-checked in
    tests; every call falls back to the reference on any failure."""
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("crypto")
        if not name:
            return None
        lib = ctypes.CDLL(name)
        lib.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        for fn in ("EVP_aes_128_cbc", "EVP_aes_192_cbc",
                   "EVP_aes_256_cbc"):
            getattr(lib, fn).restype = ctypes.c_void_p
        for fn in ("EVP_EncryptInit_ex", "EVP_DecryptInit_ex"):
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_char_p, ctypes.c_char_p]
        lib.EVP_CIPHER_CTX_set_padding.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_int]
        for fn in ("EVP_EncryptUpdate", "EVP_DecryptUpdate"):
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
                ctypes.c_int]
        for fn in ("EVP_EncryptFinal_ex", "EVP_DecryptFinal_ex"):
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int)]
        # smoke: one known FIPS-197 block must round-trip before the
        # fast path is trusted
        k = bytes(range(16))
        pt = bytes(range(16))
        ct = _evp_cbc(lib, k, b"\x00" * 16, pt, True)
        if ct is None or _evp_cbc(lib, k, b"\x00" * 16, ct, False) != pt:
            return None
        if ct != _aes_cbc_encrypt_py(k, b"\x00" * 16, pt):
            return None
        return lib
    except Exception:
        return None


def _evp_cbc(lib, key: bytes, iv: bytes, data: bytes, encrypt: bool):
    """One EVP CBC pass (padding disabled); None on any EVP failure."""
    import ctypes

    cipher = {16: lib.EVP_aes_128_cbc, 24: lib.EVP_aes_192_cbc,
              32: lib.EVP_aes_256_cbc}.get(len(key))
    if cipher is None:
        return None
    ctx = lib.EVP_CIPHER_CTX_new()
    if not ctx:
        return None
    try:
        init = (lib.EVP_EncryptInit_ex if encrypt
                else lib.EVP_DecryptInit_ex)
        update = (lib.EVP_EncryptUpdate if encrypt
                  else lib.EVP_DecryptUpdate)
        final = (lib.EVP_EncryptFinal_ex if encrypt
                 else lib.EVP_DecryptFinal_ex)
        if init(ctx, cipher(), None, key, iv) != 1:
            return None
        lib.EVP_CIPHER_CTX_set_padding(ctx, 0)
        out = ctypes.create_string_buffer(len(data) + 16)
        n1 = ctypes.c_int(0)
        if update(ctx, out, ctypes.byref(n1), data, len(data)) != 1:
            return None
        n2 = ctypes.c_int(0)
        tail = ctypes.create_string_buffer(16)
        if final(ctx, tail, ctypes.byref(n2)) != 1:
            return None
        return out.raw[:n1.value] + tail.raw[:n2.value]
    finally:
        lib.EVP_CIPHER_CTX_free(ctx)


_LIBCRYPTO = _load_libcrypto()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt WITHOUT padding (len(data) must be a multiple of 16).
    Used by Algorithm 2.B and by the fixture encryptor (which pads).
    Platform-OpenSSL fast path when available; pure-Python reference
    otherwise (identical output, cross-pinned in tests)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt needs 16-byte-aligned input")
    if _LIBCRYPTO is not None:
        out = _evp_cbc(_LIBCRYPTO, key, iv, data, True)
        if out is not None:
            return out
    return _aes_cbc_encrypt_py(key, iv, data)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt WITHOUT padding removal (truncates ragged tails).
    Platform-OpenSSL fast path when available; pure-Python reference
    otherwise (identical output, cross-pinned in tests)."""
    n = len(data) - (len(data) % 16)
    if _LIBCRYPTO is not None and n:
        out = _evp_cbc(_LIBCRYPTO, key, iv, data[:n], False)
        if out is not None:
            return out
    return _aes_cbc_decrypt_py(key, iv, data)


def _strip_pkcs7(data: bytes) -> bytes:
    """Permissive PKCS#5/7 unpad: strip only a well-formed pad."""
    if not data:
        return data
    k = data[-1]
    if 1 <= k <= 16 and k <= len(data) and data.endswith(bytes([k]) * k):
        return data[:-k]
    return data


# -- Standard security handler ----------------------------------------------

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])

CRYPT_CACHE_KEY = ("crypt",)

RC4_CFM = "rc4"
AESV2_CFM = "aesv2"
AESV3_CFM = "aesv3"
IDENTITY_CFM = "identity"


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def _p_bytes(p: int) -> bytes:
    return (p & 0xFFFFFFFF).to_bytes(4, "little")


def _alg2_file_key(pw: bytes, o: bytes, p: int, id0: bytes, r: int,
                   key_len: int, encrypt_metadata: bool) -> bytes:
    """Algorithm 2: file key from (padded) user password, /R 2-4."""
    h = hashlib.md5()
    h.update(_pad_password(pw))
    h.update(o[:32])
    h.update(_p_bytes(p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def _check_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4 (R2) / 5 (R>=3): recompute /U and compare."""
    if r == 2:
        return rc4(key, _PAD) == u[:32]
    x = hashlib.md5(_PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x == u[:16]


def _alg3_owner_key(owner_pw: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 3 steps a-d: the RC4 key derived from the owner password."""
    d = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    return d[:key_len]


def _alg7_user_pw_from_o(okey: bytes, o: bytes, r: int) -> bytes:
    """Algorithm 7 step b: decrypt /O back to the padded user password."""
    data = o[:32]
    if r == 2:
        return rc4(okey, data)
    for i in range(19, -1, -1):
        data = rc4(bytes(b ^ i for b in okey), data)
    return data


def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 hardened hash)."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r56_hash(pw: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    if r == 5:
        return hashlib.sha256(pw + salt + udata).digest()
    return _hash_2b(pw, salt, udata)


class CryptContext:
    """Authenticated decryption state for one document."""

    __slots__ = ("file_key", "stm_cfm", "str_cfm", "v", "r", "encrypt_num")

    def __init__(self, file_key: bytes, stm_cfm: str, str_cfm: str,
                 v: int, r: int):
        self.file_key = file_key
        self.stm_cfm = stm_cfm
        self.str_cfm = str_cfm
        self.v = v
        self.r = r
        self.encrypt_num = -1  # object number of /Encrypt (never decrypted)

    # Algorithm 1 / 1.A
    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.v == 5:
            return self.file_key
        h = hashlib.md5()
        h.update(self.file_key)
        h.update((num & 0xFFFFFF).to_bytes(3, "little"))
        h.update((gen & 0xFFFF).to_bytes(2, "little"))
        if aes:
            h.update(b"sAlT")
        return h.digest()[:min(len(self.file_key) + 5, 16)]

    def _decrypt(self, cfm: str, num: int, gen: int, data: bytes) -> bytes:
        if cfm == IDENTITY_CFM or not data:
            return data
        if cfm == RC4_CFM:
            return rc4(self._object_key(num, gen, False), data)
        # AESV2 / AESV3: 16-byte IV prefix, CBC, PKCS padding
        if len(data) <= 16:
            return b""
        key = self._object_key(num, gen, True)
        return _strip_pkcs7(aes_cbc_decrypt(key, data[:16], data[16:]))

    def decrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        return self._decrypt(self.stm_cfm, num, gen, data)

    def decrypt_string(self, num: int, gen: int, data: bytes) -> bytes:
        return self._decrypt(self.str_cfm, num, gen, data)


def _stream_skips_decryption(d: dict) -> bool:
    """/Filter /Crypt with /Name /Identity (or default) — e.g. the
    plaintext-metadata stream when /EncryptMetadata false."""
    filt = d.get("Filter")
    parms = d.get("DecodeParms")
    filts = filt if isinstance(filt, list) else [filt]
    parmss = parms if isinstance(parms, list) else [parms]
    for i, f in enumerate(filts):
        if isinstance(f, Name) and f == b"Crypt":
            pp = parmss[i] if i < len(parmss) else None
            if not isinstance(pp, dict):
                return True
            name = pp.get("Name")
            return not isinstance(name, Name) or name == b"Identity"
    return False


def transform_object(obj, num: int, gen: int, ctx: CryptContext):
    """Decrypt every string / stream payload of a freshly parsed indirect
    object, in place where possible. Applied exactly once per object by
    resolve_ref (and to ObjStm CONTAINERS only — members are covered by
    the container's encryption, ISO 32000-1 §7.6.2)."""
    t = type(obj)
    if t is bytes:
        return ctx.decrypt_string(num, gen, obj)
    if t is list:
        for i, v in enumerate(obj):
            obj[i] = transform_object(v, num, gen, ctx)
        return obj
    if t is dict:
        for k, v in obj.items():
            obj[k] = transform_object(v, num, gen, ctx)
        return obj
    if t is Stream:
        if not _stream_skips_decryption(obj.dict):
            obj.raw = ctx.decrypt_stream(num, gen, obj.raw)
        transform_object(obj.dict, num, gen, ctx)
        return obj
    return obj


def _cf_method(enc: dict, which: str, resolve: Callable, default_len: int):
    """Resolve /StmF or /StrF through /CF to a (cfm, key_bits) pair."""
    name = enc.get(which)
    if not isinstance(name, Name) or name == b"Identity":
        return IDENTITY_CFM, default_len
    cf = resolve(enc.get("CF"))
    if not isinstance(cf, dict):
        return None
    entry = resolve(cf.get(name.decode("latin-1")))
    if not isinstance(entry, dict):
        return None
    cfm = entry.get("CFM")
    if not isinstance(cfm, Name):
        return None
    length = entry.get("Length")
    bits = default_len
    if type(length) is int:
        # /CF lengths appear both in bytes (spec) and bits (the wild)
        bits = length * 8 if length <= 40 else length
    if cfm == b"V2":
        return RC4_CFM, bits
    if cfm == b"AESV2":
        return AESV2_CFM, 128
    if cfm == b"AESV3":
        return AESV3_CFM, 256
    if cfm == b"None":
        return IDENTITY_CFM, bits
    return None


def build_crypt_context(enc: dict, id0: bytes,
                        resolve: Callable) -> Optional[CryptContext]:
    """Authenticate the EMPTY password (user, then owner) against the
    Standard handler and return a ready CryptContext, or None (unknown
    handler / bad dict / password actually required)."""
    try:
        filt = enc.get("Filter")
        if not isinstance(filt, Name) or filt != b"Standard":
            return None
        v = enc.get("V")
        r = enc.get("R")
        if type(v) is not int or type(r) is not int:
            return None
        o = enc.get("O")
        u = enc.get("U")
        if not (isinstance(o, bytes) and not isinstance(o, Name)):
            return None
        if not (isinstance(u, bytes) and not isinstance(u, Name)):
            return None

        if v in (1, 2) or (v == 4 and r in (2, 3, 4)):
            p = enc.get("P")
            if type(p) is not int:
                return None
            encrypt_metadata = enc.get("EncryptMetadata")
            encrypt_metadata = (encrypt_metadata is not False)
            bits = enc.get("Length")
            bits = bits if type(bits) is int else 40
            stm_cfm, str_cfm = RC4_CFM, RC4_CFM
            if v == 4:
                got = _cf_method(enc, "StmF", resolve, bits)
                if got is None:
                    return None
                stm_cfm, bits = got
                got = _cf_method(enc, "StrF", resolve, bits)
                if got is None:
                    return None
                str_cfm, _ = got
                if AESV3_CFM in (stm_cfm, str_cfm):
                    return None  # AESV3 is a V5 method
            key_len = 5 if r == 2 else max(5, min(16, bits // 8))

            def try_user(pw: bytes) -> Optional[bytes]:
                key = _alg2_file_key(pw, o, p, id0, r, key_len,
                                     encrypt_metadata)
                if _check_user_password(key, u, id0, r):
                    return key
                return None

            key = try_user(b"")
            if key is None:
                # empty OWNER password -> recover the user password
                okey = _alg3_owner_key(b"", r, key_len)
                key = try_user(_alg7_user_pw_from_o(okey, o, r))
            if key is None:
                return None
            return CryptContext(key, stm_cfm, str_cfm, v, r)

        if v == 5 and r in (5, 6):
            if len(o) < 48 or len(u) < 48:
                return None
            ue = enc.get("UE")
            oe = enc.get("OE")
            file_key = None
            # user password check: hash(pw, validation salt)
            if _r56_hash(b"", u[32:40], b"", r) == u[:32]:
                if not (isinstance(ue, bytes) and len(ue) >= 32):
                    return None
                ikey = _r56_hash(b"", u[40:48], b"", r)
                file_key = aes_cbc_decrypt(ikey, b"\x00" * 16, ue[:32])
            elif _r56_hash(b"", o[32:40], u[:48], r) == o[:32]:
                if not (isinstance(oe, bytes) and len(oe) >= 32):
                    return None
                ikey = _r56_hash(b"", o[40:48], u[:48], r)
                file_key = aes_cbc_decrypt(ikey, b"\x00" * 16, oe[:32])
            if file_key is None:
                return None
            stm_cfm = str_cfm = AESV3_CFM
            got = _cf_method(enc, "StmF", resolve, 256)
            if got is not None:
                stm_cfm = got[0]
            got = _cf_method(enc, "StrF", resolve, 256)
            if got is not None:
                str_cfm = got[0]
            return CryptContext(file_key, stm_cfm, str_cfm, v, r)

        return None
    except Exception:
        return None
