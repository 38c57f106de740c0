"""Vectorized LEB128 varints + zigzag — the SerializationUtils analog.

The reference serializes bases, deltas, patch values and stream headers
as base-128 varints with zigzag for signed values (apache/orc java
impl/SerializationUtils.java writeVslong/readVulong, ≈1350 LoC of
value-at-a-time loops; C++ inline in RleEncoderV2.cc).  This module is
the array-at-a-time equivalent: encode/decode whole uint64 arrays in at
most 10 vectorized passes (one per possible varint byte), no per-value
Python.  Used by the int codec for its per-block metadata streams —
bases / extras / patch lists — where fixed 8-byte words were the one
remaining size regression vs the reference on header-dense streams.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAXB = 10  # ceil(64 / 7)
# value-length thresholds: k bytes iff value <= 2**(7k) - 1
_THRESH_U = np.array([min((1 << (7 * k)) - 1, (1 << 64) - 1) for k in range(1, _MAXB)], dtype=_U64)


def varint_lengths(u: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (1..10)."""
    u = np.ascontiguousarray(u, dtype=_U64)
    # length = #thresholds <= value, +1  (thresholds are 2^7k - 1 upper
    # bounds inclusive: value <= 2^7k - 1 encodes in k bytes)
    return np.searchsorted(_THRESH_U, u, side="left") + 1


def encode_varints(u: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (concatenated, no count prefix)."""
    u = np.ascontiguousarray(u, dtype=_U64)
    if u.size == 0:
        return b""
    lens = varint_lengths(u)
    offs = np.zeros(u.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    total = int(offs[-1] + lens[-1])
    out = np.empty(total, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for j in range(_MAXB):
            active = lens > j
            if not active.any():
                break
            vals = (u[active] >> _U64(7 * j)) & _U64(0x7F)
            cont = (lens[active] - 1 > j).astype(np.uint8) << 7  # continuation bit
            out[offs[active] + j] = vals.astype(np.uint8) | cont
    return out.tobytes()


def decode_varints(data, count: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``count`` varints from ``data`` starting at ``offset``.
    Returns (uint64 array, bytes consumed)."""
    if count == 0:
        return np.empty(0, dtype=_U64), 0
    buf = np.frombuffer(data, np.uint8, offset=offset)
    # terminators: bytes with the continuation bit clear; the first
    # ``count`` of them delimit our values
    term = np.flatnonzero((buf & 0x80) == 0)
    if term.size < count:
        raise ValueError("truncated varint stream")
    ends = term[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    if int(lens.max()) > _MAXB:
        raise ValueError("varint longer than 10 bytes")
    out = np.zeros(count, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max())):
            active = lens > j
            out[active] |= (buf[starts[active] + j].astype(_U64) & _U64(0x7F)) << _U64(7 * j)
    return out, int(ends[-1] + 1)


def zigzag64(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.int64)
    with np.errstate(over="ignore"):
        return (x.view(_U64) << _U64(1)) ^ (x >> np.int64(63)).view(_U64)


def unzigzag64(u: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(u, dtype=_U64)
    with np.errstate(over="ignore"):
        return ((u >> _U64(1)) ^ (_U64(0) - (u & _U64(1)))).view(np.int64)


def encode_svarints(x: np.ndarray) -> bytes:
    """Signed (zigzag) varints — writeVslong analog."""
    return encode_varints(zigzag64(x))


def decode_svarints(data, count: int, offset: int = 0) -> tuple[np.ndarray, int]:
    u, used = decode_varints(data, count, offset)
    return unzigzag64(u), used
