"""Block-parallel NumPy SHA-256 (FIPS 180-4) over whole Arrow columns.

The sha256 mask (reference analog: SHA256MaskFactory,
java/core/.../org/apache/orc/impl/mask/SHA256MaskFactory.java) and any
SQL-parity sha256 fingerprinting must compute REAL SHA-256 — DuckDB's
``sha256()`` is the oracle.  The r3 implementation looped
``hashlib.sha256`` per row; like the md5 family (md5vec.py) that loop is
the map-stage bottleneck at 10^12 rows.  This module vectorizes the
SHA-256 compression function across all rows of a batch using the same
layout as md5vec: messages padded into one (n_rows, max_blocks*64) byte
matrix, the 48-step message schedule and 64-round compression run as
uint32 vector ops over all lanes at once, and lanes with fewer blocks
stop updating their state (per-lane active mask) — exact multi-block
chaining.

Pure public math: round constants are the fractional parts of the cube
roots of the first 64 primes and the initial state is the fractional
parts of the square roots of the first 8 primes, both computed here with
exact integer root extraction (no table is copied from anywhere).
Equality with ``hashlib.sha256`` is property-tested across lengths
0..300 including multi-block and non-ASCII (tests/test_sha256vec.py).

Honest cost note (measured, this host): ~0.9 us/row on 1-block ids and
~2.1 us/row on 2-block rows at the tuned CH=16384 lane chunk — about 2x
SLOWER single-thread than hashlib's per-row C loop (~0.4-0.6 us/row),
unlike md5vec which beats its loop: SHA-256's ~2.5x op count over MD5
eats the vectorization margin on this memory-bandwidth-limited host.
What the kernel buys is the elimination of per-row Python object churn
(no .as_py()/list building — zero allocations per row) and pure
GIL-free numpy kernels; the mask path is not a throughput hot spot, so
the no-object-churn shape is preferred.  If a future host profiles the
mask as hot, hashlib's loop remains a valid per-actor fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .md5vec import _as_large_binary, _HEXCHARS


def _primes(n: int) -> list[int]:
    ps: list[int] = []
    c = 2
    while len(ps) < n:
        if all(c % p for p in ps):
            ps.append(c)
        c += 1
    return ps


def _iroot(x: int, k: int) -> int:
    """Exact floor k-th root of a nonnegative int (Newton on integers)."""
    if x == 0:
        return 0
    r = 1 << ((x.bit_length() + k - 1) // k)
    while True:
        nr = ((k - 1) * r + x // r ** (k - 1)) // k
        if nr >= r:
            return r
        r = nr


_P64 = _primes(64)
# K[i] = first 32 fractional bits of cbrt(prime_i); exact via icbrt(p << 96)
_K = np.array([_iroot(p << 96, 3) & 0xFFFFFFFF for p in _P64], dtype=np.uint32)
# H0[i] = first 32 fractional bits of sqrt(prime_i)
_H0 = np.array([_iroot(p << 64, 2) & 0xFFFFFFFF for p in _P64[:8]], dtype=np.uint32)


def sha256_digests(col) -> np.ndarray:
    """(n, 32) uint8 SHA-256 digests of a string/binary column, vectorized.

    Null rows hash the empty string — callers needing null propagation
    mask afterwards (apply_masks does).
    """
    arr = _as_large_binary(col)
    n = len(arr)
    if n == 0:
        return np.empty((0, 32), np.uint8)
    off = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    lens = np.diff(off)
    data_buf = arr.buffers()[2]
    values = (
        np.frombuffer(data_buf, np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    )
    flat = values[off[0] : off[-1]]

    # padded layout: msg || 0x80 || zeros || 8-byte BIG-endian bit length
    nblocks = (lens + 8) // 64 + 1
    maxb = int(nblocks.max())
    M = np.zeros((n, maxb * 64), np.uint8)
    if flat.size:
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(flat.size, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        M[rows, cols] = flat
    lane = np.arange(n)
    M[lane, lens] = 0x80
    bitlen = lens.astype(np.uint64) * 8
    pos = nblocks * 64 - 1
    for j in range(8):
        M[lane, pos - j] = ((bitlen >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    # big-endian message words -> native uint32, (n, maxb, 16)
    W = M.view(">u4").astype(np.uint32).reshape(n, maxb, 16)

    out = np.empty((n, 32), np.uint8)
    CH = 16384  # same L2-residency chunking as md5vec
    for lo in range(0, n, CH):
        hi = min(lo + CH, n)
        _compress_lanes(W[lo:hi], nblocks[lo:hi], out[lo:hi])
    return out


def _rotr(x: np.ndarray, s: int, t1: np.ndarray, t2: np.ndarray) -> np.ndarray:
    """t2 = x rotr s (t1 is scratch)."""
    np.right_shift(x, np.uint32(s), out=t2)
    np.left_shift(x, np.uint32(32 - s), out=t1)
    np.bitwise_or(t2, t1, out=t2)
    return t2


def _compress_lanes(W: np.ndarray, nblocks: np.ndarray, out: np.ndarray) -> None:
    """SHA-256 compression over one lane chunk: W (m, maxb, 16) uint32
    message words (native order), per-lane block counts, digests written
    into out (m, 32) u8, big-endian per state word."""
    m, maxb, _ = W.shape
    H = [np.full(m, _H0[i], np.uint32) for i in range(8)]
    regs = [np.empty(m, np.uint32) for _ in range(8)]
    t1 = np.empty(m, np.uint32)
    t2 = np.empty(m, np.uint32)
    t3 = np.empty(m, np.uint32)
    t4 = np.empty(m, np.uint32)
    Ws = np.empty((64, m), np.uint32)
    for blk in range(maxb):
        Ws[:16] = W[:, blk, :].T
        # message schedule: W[t] = s1(W[t-2]) + W[t-7] + s0(W[t-15]) + W[t-16]
        for t in range(16, 64):
            x = Ws[t - 15]
            _rotr(x, 7, t1, t2)
            _rotr(x, 18, t1, t3)
            np.bitwise_xor(t2, t3, out=t2)
            np.right_shift(x, np.uint32(3), out=t3)
            np.bitwise_xor(t2, t3, out=t2)  # s0
            y = Ws[t - 2]
            _rotr(y, 17, t1, t3)
            _rotr(y, 19, t1, t4)
            np.bitwise_xor(t3, t4, out=t3)
            np.right_shift(y, np.uint32(10), out=t4)
            np.bitwise_xor(t3, t4, out=t3)  # s1
            np.add(t2, t3, out=t2)
            np.add(t2, Ws[t - 7], out=t2)
            np.add(t2, Ws[t - 16], out=Ws[t])
        for i in range(8):
            np.copyto(regs[i], H[i])
        a, b, c, d, e, f, g, h = regs
        for t in range(64):
            # T1 = h + S1(e) + Ch(e,f,g) + K[t] + W[t]
            _rotr(e, 6, t1, t2)
            _rotr(e, 11, t1, t3)
            np.bitwise_xor(t2, t3, out=t2)
            _rotr(e, 25, t1, t3)
            np.bitwise_xor(t2, t3, out=t2)  # S1(e)
            np.bitwise_xor(f, g, out=t3)
            np.bitwise_and(t3, e, out=t3)
            np.bitwise_xor(t3, g, out=t3)  # Ch = g ^ (e & (f ^ g))
            np.add(t2, t3, out=t2)
            np.add(t2, h, out=t2)
            np.add(t2, _K[t], out=t2)
            np.add(t2, Ws[t], out=t2)  # t2 = T1
            # T2 = S0(a) + Maj(a,b,c)
            _rotr(a, 2, t1, t3)
            _rotr(a, 13, t1, t4)
            np.bitwise_xor(t3, t4, out=t3)
            _rotr(a, 22, t1, t4)
            np.bitwise_xor(t3, t4, out=t3)  # S0(a)
            np.bitwise_or(b, c, out=t4)
            np.bitwise_and(t4, a, out=t4)
            np.bitwise_and(b, c, out=t1)
            np.bitwise_or(t4, t1, out=t4)  # Maj = (a & (b|c)) | (b & c)
            np.add(t3, t4, out=t3)  # t3 = T2
            # register rotate: old h's buffer becomes the new a
            np.add(d, t2, out=d)  # new e
            np.add(t2, t3, out=h)  # new a (into h's buffer)
            a, b, c, d, e, f, g, h = h, a, b, c, d, e, f, g
        fin = (a, b, c, d, e, f, g, h)
        active = nblocks > blk
        if active.all():
            for i in range(8):
                H[i] += fin[i]
        else:
            for i in range(8):
                H[i][active] += fin[i][active]
    for i in range(8):
        out[:, 4 * i : 4 * i + 4] = (
            H[i].astype(">u4").view(np.uint8).reshape(m, 4)
        )


def sha256_hex(col) -> pa.Array:
    """64-char lowercase hex SHA-256 per row as an Arrow string array."""
    dg = sha256_digests(col)
    n = dg.shape[0]
    Hx = np.empty((n, 64), np.uint8)
    Hx[:, 0::2] = _HEXCHARS[dg >> 4]
    Hx[:, 1::2] = _HEXCHARS[dg & 15]
    offsets = np.arange(n + 1, dtype=np.int32) * 64
    return pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(Hx.tobytes())]
    )
