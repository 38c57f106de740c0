"""Vectorized bit-packing for widths 1..64.

The analog of the reference's bit-pack kernels
(apache/orc c++/src/BpackingDefault.cc — unrolled per-width read/write
loops; SIMD variant BpackingAvx512.cc).  Here the whole array is packed in
one shot with numpy kernels, so throughput is array-at-a-time rather than
value-at-a-time — the Python-level requirement SURVEY.md §7.4.2 calls out.

Fast byte-level kernels exist for the *aligned* widths
{1, 2, 4, 8, 16, 24, 32, 48, 64} — the same alignment set idea as ORC's
SPEED compression strategy (RleEncoderV2 aligns percentile widths to
{1,2,4,8,16,24,32,40,48,56,64}); other widths fall back to a generic
unpackbits/packbits path (exact, slower — used by the COMPRESSION
strategy).

Values are treated as unsigned; callers apply zigzag / frame-of-reference
shifts first.  All functions are exact round-trips for any width 1..64.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bit_width", "pack", "unpack", "align_width", "ALIGNED_WIDTHS"]

_BYTE_WIDTHS = {8: "u1", 16: "<u2", 32: "<u4", 64: "<u8"}

ALIGNED_WIDTHS = np.array([0, 1, 2, 4, 8, 16, 24, 32, 48, 64], dtype=np.int64)


def align_width(w):
    """Round width(s) up to the nearest fast aligned width."""
    idx = np.searchsorted(ALIGNED_WIDTHS, w, side="left")
    return ALIGNED_WIDTHS[idx]


def bit_width(max_value: int) -> int:
    """Minimum bits needed to represent ``max_value`` (>=0). 0 -> 0 bits."""
    if max_value < 0:
        raise ValueError("bit_width expects a non-negative value")
    return int(max_value).bit_length()


def _pack_subbyte(v: np.ndarray, width: int) -> bytes:
    per = 8 // width
    pad = (-v.size) % per
    b = v.astype(np.uint8)
    if pad:
        b = np.concatenate([b, np.zeros(pad, np.uint8)])
    b = b.reshape(-1, per)
    acc = np.zeros(b.shape[0], dtype=np.uint8)
    for i in range(per):
        acc |= b[:, i] << np.uint8(8 - width * (i + 1))
    return acc.tobytes()


def _unpack_subbyte(buf: np.ndarray, n: int, width: int, out_dtype) -> np.ndarray:
    per = 8 // width
    mask = np.uint8((1 << width) - 1)
    out = np.empty((buf.size, per), dtype=np.uint8)
    for i in range(per):
        out[:, i] = (buf >> np.uint8(8 - width * (i + 1))) & mask
    return out.ravel()[:n].astype(out_dtype)


def _pack_bytes_trunc(v: np.ndarray, width: int) -> bytes:
    # 24-bit from low 3 bytes of u4; 48-bit from low 6 bytes of u8 (LE)
    if width == 24:
        return np.ascontiguousarray(v.astype("<u4").view(np.uint8).reshape(-1, 4)[:, :3]).tobytes()
    return np.ascontiguousarray(v.astype("<u8").view(np.uint8).reshape(-1, 8)[:, :6]).tobytes()


def _unpack_bytes_trunc(buf: np.ndarray, n: int, width: int, out_dtype) -> np.ndarray:
    nbytes = width // 8
    full = np.zeros((n, 8 if width == 48 else 4), dtype=np.uint8)
    full[:, :nbytes] = buf[: n * nbytes].reshape(n, nbytes)
    dt = "<u8" if width == 48 else "<u4"
    return full.view(dt).ravel().astype(out_dtype, copy=False)


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` (any unsigned dtype, values < 2**width) at
    ``width`` bits each.  width == 0 means all values are 0 and packs to
    b''.  The input dtype is preserved through the fast byte-level paths
    (an uint32 source is never widened to 8 bytes — memory-traffic parity
    with the 32-bit codec lane)."""
    if width == 0:
        return b""
    if not 1 <= width <= 64:
        raise ValueError(f"width out of range: {width}")
    v = np.ascontiguousarray(values)
    if v.size == 0:
        return b""
    fast = _BYTE_WIDTHS.get(width)
    if fast is not None:
        # memoryview, not tobytes(): callers b"".join / compress straight
        # from the converted array without an extra copy (cast to a byte
        # view so len() is the byte length)
        return np.ascontiguousarray(v.astype(fast, copy=False)).data.cast("B")
    if width in (1, 2, 4):
        return _pack_subbyte(v, width)
    if width == 24:
        return np.ascontiguousarray(v.astype("<u4", copy=False).view(np.uint8).reshape(-1, 4)[:, :3]).tobytes()
    if width == 48:
        return np.ascontiguousarray(v.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8)[:, :6]).tobytes()
    # generic path: big-endian byte view -> bit matrix -> keep low `width` bits
    bits = np.unpackbits(v.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    return np.packbits(bits[:, 64 - width :]).tobytes()


def packed_nbytes(n: int, width: int) -> int:
    """Exact byte length :func:`pack` produces for n values at width bits."""
    if width == 0 or n == 0:
        return 0
    if width in (1, 2, 4):
        per = 8 // width
        return (n + per - 1) // per
    if width % 8 == 0 and width in (8, 16, 24, 32, 48, 64):
        return n * (width // 8)
    return (n * width + 7) // 8


def unpack(data: bytes | np.ndarray, n: int, width: int, out_dtype=np.uint64) -> np.ndarray:
    """Inverse of :func:`pack`; returns an array of length ``n`` in
    ``out_dtype`` (uint64 default; pass uint32 for the 32-bit codec lane —
    widths must then be <= 32)."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=out_dtype)
    fast = _BYTE_WIDTHS.get(width)
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    if fast is not None:
        nbytes = n * (width // 8)
        return np.frombuffer(buf[:nbytes].tobytes(), dtype=fast).astype(out_dtype, copy=False)
    if width in (1, 2, 4):
        return _unpack_subbyte(buf, n, width, out_dtype)
    if width in (24, 48):
        return _unpack_bytes_trunc(buf, n, width, out_dtype)
    bits = np.unpackbits(buf, count=n * width).reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    return np.packbits(full, axis=1).view(">u8").ravel().astype(out_dtype, copy=False)
