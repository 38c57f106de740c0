"""Pure-NumPy AES-CTR — the cipher under per-column encryption.

The reference encrypts column streams with AES/CTR, a per-column local
key, and an IV derived from stream identity (apache/orc
java/core/src/java/org/apache/orc/impl/writer/EncryptionTreeWriter.java,
impl/CryptoUtils.java; ORC spec "Column Encryption").  That environment
has javax.crypto; this one has no cipher library at all, so the cipher
itself is implemented here from the public FIPS-197 specification,
vectorized over blocks with NumPy: the S-box is generated from the GF(2^8)
inverse + affine map, SubBytes is a table gather, ShiftRows a fixed index
permutation, MixColumns four xtime/xor lanes, and CTR mode is one
encrypt-the-counter-stream pass XORed into the payload.  Correctness is
pinned to the published NIST SP 800-38A F.5.1/F.5.5 CTR vectors and the
FIPS-197 appendix-C block vectors (tests/test_aes.py) — no code is derived
from any cipher implementation.

Throughput note: ~40 vector ops per round x 10/14 rounds over an (n, 16)
uint8 state — a few hundred MiB/s per core, comparable to the framing
codecs it composes with, and embarrassingly parallel across chunks.

CTR gives confidentiality, not integrity — same as the reference; the
store's content-addressed chunk ids (sha256 of ciphertext) detect
tampering, and keyed reads verify them by DEFAULT (decode_dataset flips
verify_checksums on whenever keys are supplied — CTR is malleable, so a
ciphertext bit-flip would otherwise decode to silently wrong rows).  A
wrong key surfaces as a framing/codec parse error or checksum mismatch.
"""

from __future__ import annotations

import hashlib
import hmac

import numpy as np

__all__ = ["aes_ctr_xor", "derive_local_key", "derive_iv", "LocalKeyProvider"]


# ---------------------------------------------------------------------------
# S-box generated from the spec: multiplicative inverse in GF(2^8) mod
# x^8+x^4+x^3+x+1, then the affine transform b ^ rot1..4(b) ^ 0x63.

def _gf_mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return p


def _build_sbox() -> np.ndarray:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = np.empty(256, dtype=np.uint8)
    for x in range(256):
        b = inv[x]
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[x] = s ^ 0x63
    return sbox


_SBOX = _build_sbox()

# ShiftRows on the flat 16-byte state (byte i = row i%4, col i//4):
# row r rotates left by r columns.
_SHIFT_IDX = np.array(
    [(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)], dtype=np.intp
)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _key_schedule(key: bytes) -> np.ndarray:
    """Expanded round keys, shape (rounds+1, 16) uint8.  AES-128 or AES-256."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    sb = _SBOX
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(sb[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [int(sb[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    flat = np.array(words, dtype=np.uint8).reshape(nr + 1, 16)
    return flat


def _xtime(a: np.ndarray) -> np.ndarray:
    # GF(2^8) doubling; uint8 shift wraps mod 256, reduce with 0x1b on carry
    return (a << 1) ^ (((a >> 7) & 1) * np.uint8(0x1B))


def _encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """ECB-encrypt an (n, 16) uint8 array of blocks in place-ish."""
    s = blocks ^ rk[0]
    nr = rk.shape[0] - 1
    for rnd in range(1, nr):
        s = _SBOX[s]
        s = s[:, _SHIFT_IDX]
        a = s.reshape(-1, 4, 4)  # [n, col, row]
        x2 = _xtime(a)
        a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
        b0, b1, b2, b3 = x2[:, :, 0], x2[:, :, 1], x2[:, :, 2], x2[:, :, 3]
        n0 = b0 ^ (b1 ^ a1) ^ a2 ^ a3
        n1 = a0 ^ b1 ^ (b2 ^ a2) ^ a3
        n2 = a0 ^ a1 ^ b2 ^ (b3 ^ a3)
        n3 = (b0 ^ a0) ^ a1 ^ a2 ^ b3
        s = np.stack([n0, n1, n2, n3], axis=2).reshape(-1, 16)
        s ^= rk[rnd]
    s = _SBOX[s]
    s = s[:, _SHIFT_IDX]
    s ^= rk[nr]
    return s


def _counter_blocks(iv: bytes, n: int) -> np.ndarray:
    """(n, 16) uint8 CTR inputs: the 128-bit big-endian IV incremented 0..n-1."""
    base = int.from_bytes(iv, "big")
    hi0, lo0 = base >> 64, base & ((1 << 64) - 1)
    idx = np.arange(n, dtype=np.uint64)
    lo = (np.uint64(lo0) + idx).astype(np.uint64)  # wraps mod 2^64
    carry = lo < np.uint64(lo0)
    hi = (np.uint64(hi0 & ((1 << 64) - 1)) + carry.astype(np.uint64)).astype(np.uint64)
    both = np.empty((n, 2), dtype=">u8")
    both[:, 0] = hi
    both[:, 1] = lo
    return both.view(np.uint8).reshape(n, 16)


def aes_ctr_xor(key: bytes, iv: bytes, data: bytes | memoryview) -> bytes:
    """Encrypt or decrypt (same operation) ``data`` with AES-CTR."""
    if len(iv) != 16:
        raise ValueError("CTR IV must be 16 bytes")
    buf = np.frombuffer(data, dtype=np.uint8)
    n = len(buf)
    if n == 0:
        return b""
    nblocks = (n + 15) // 16
    rk = _key_schedule(key)
    ks = _encrypt_blocks(_counter_blocks(iv, nblocks), rk).reshape(-1)[:n]
    return (buf ^ ks).tobytes()


# ---------------------------------------------------------------------------
# Key handling — the KeyProvider / InMemoryKeystore analog.

def derive_local_key(master: bytes, column: str, nonce: str) -> bytes:
    """Per-column local key from a master key.

    The reference generates a random local key per encrypted column and
    stores it KMS-wrapped in the file footer; with no KMS in this
    environment the local key is instead derived deterministically
    (HKDF-style sha256 of master || column || store nonce), so nothing
    secret is persisted and re-encoding a unit stays byte-identical for
    the resumability contract."""
    return hashlib.sha256(b"orc-ray-lk\x00" + master + b"\x00" + column.encode() + b"\x00" + nonce.encode()).digest()[: len(master)]


def derive_iv(key: bytes, column: str, stream_index: int, plaintext_digest: bytes) -> bytes:
    """Deterministic synthetic IV per encrypted stream, keyed.

    The reference builds the IV from (column, stream kind, stripe id);
    a content-addressed store has no stable stripe counter across
    re-encodes, so the IV binds (column, stream index, sha256 of the
    plaintext stream) — SIV-style deterministic encryption.  Identical
    plaintexts yield identical ciphertexts, which the content-addressed
    chunk ids expose anyway (dedup requires it); distinct streams never
    share an (IV, key) pair because the digest differs.

    The derivation is a keyed PRF (HMAC-SHA256 under the column's local
    key), as in real SIV: the IV is persisted in the public chunk header,
    and an UNKEYED digest there would let a keyless reader confirm a
    guessed plaintext offline by recomputing it — a practical oracle for
    low-cardinality or sorted encrypted columns.  With the keyed MAC the
    header value is indistinguishable from random without the key, while
    decode (which reads the stored IV) and the resume contract (same
    key + plaintext → same bytes) are unchanged."""
    h = hmac.new(key, b"orc-ray-iv\x00" + column.encode() + b"\x00" + stream_index.to_bytes(4, "little") + plaintext_digest, hashlib.sha256)
    return h.digest()[:16]


class LocalKeyProvider:
    """In-memory named master keys — the InMemoryKeystore test analog
    (apache/orc java/.../org/apache/orc/impl/InMemoryKeystore.java)."""

    def __init__(self, keys: dict[str, bytes] | None = None):
        self._keys: dict[str, bytes] = {}
        for name, material in (keys or {}).items():
            self.add_key(name, material)

    def add_key(self, name: str, material: bytes) -> None:
        if len(material) not in (16, 32):
            raise ValueError(f"key {name!r}: AES key material must be 16 or 32 bytes")
        self._keys[name] = material

    def get_key(self, name: str) -> bytes | None:
        return self._keys.get(name)

    def names(self) -> list[str]:
        return sorted(self._keys)
