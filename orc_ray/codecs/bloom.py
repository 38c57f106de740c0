"""Per-chunk Bloom filters — membership pushdown for equality predicates.

The analog of the reference's BloomFilterUtf8 index streams
(apache/orc c++/src/BloomFilter.cc + Murmur3.cc; written per row-index
stride, consulted by SargsApplier for EQUALS/IN predicates).  Here one
filter per (chunk, column) is stored in the lineage manifest, so equality
predicates can skip whole chunks without reading them — complementing the
min/max stats pruning (pipeline/decode.py).

Same construction as the reference: k index pairs derived from one 64-bit
hash split into two halves (Kirsch-Mitzenmacher double hashing), k chosen
from the target false-positive probability (default fpp 0.05, the
reference's default — probe [P1]).  Hashing is vectorized over the whole
column (splitmix64 on uint64 keys / FNV over bytes).
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa

__all__ = ["build", "might_contain", "serialize", "deserialize"]


def _mix64(h: np.ndarray) -> np.ndarray:
    from .hashmix import splitmix64_mix

    return splitmix64_mix(h)


def _hash_column(arr: pa.Array) -> np.ndarray:
    """uint64 hash per value (nulls dropped)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.null_count:
        arr = arr.drop_null()
    ty = arr.type
    if pa.types.is_integer(ty) or pa.types.is_temporal(ty) or pa.types.is_boolean(ty):
        if ty.equals(pa.uint64()):
            # checked cast to int64 would raise on values >= 2**63; the
            # bit pattern is what we hash, so view without conversion
            v = arr.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        else:
            v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        return _mix64(v.copy())
    if (
        pa.types.is_string(ty)
        or pa.types.is_large_string(ty)
        or pa.types.is_binary(ty)
        or pa.types.is_large_binary(ty)
    ):
        from ..functions.dedup import _varbytes

        concat, offsets = _varbytes(pa.table({"x": arr}).column("x"))
        from ..functions.text import _fnv1a_segmented

        return _fnv1a_segmented(concat, offsets)
    raise TypeError(f"bloom unsupported for {ty}")


def _hash_value(val) -> int:
    if isinstance(val, (int, np.integer)):
        # mask to the 64-bit pattern: matches the column-side view for both
        # signed (two's complement) and unsigned >= 2**63 values
        return int(_mix64(np.array([int(val) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64))[0])
    data = val.encode() if isinstance(val, str) else bytes(val)
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) % (1 << 64)
    return h


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    n_items = max(n_items, 1)
    m = int(np.ceil(-n_items * np.log(fpp) / (np.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, int(round(m / n_items * np.log(2))))
    return m, min(k, 8)


def build(arr: pa.Array, fpp: float = 0.05, *, m: int | None = None, k: int | None = None) -> bytes:
    """Serialized bloom filter for a column chunk.

    Passing explicit ``m`` (bits, multiple of 64) and ``k`` fixes the
    filter geometry so partial filters built on different batches can be
    OR-merged (``merge``) — the distributed semi-join build: every batch
    emits one fixed-size filter, merge is an element-wise byte OR."""
    h = _hash_column(arr)
    if m is None or k is None:
        m, k = _params(h.size, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bytes([k]) + bits.tobytes()


def might_contain(filt: bytes, value) -> bool:
    """Conservative membership: False means definitely absent."""
    k = filt[0]
    bits = np.frombuffer(filt, np.uint8, offset=1)
    m = bits.size * 8
    h = _hash_value(value)
    h1, h2 = h & 0xFFFFFFFF, h >> 32
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def might_contain_many(filt: bytes, arr: pa.Array) -> np.ndarray:
    """Vectorized conservative membership for a whole column: one bool
    per row (False = definitely absent).  One hash pass + k gather-AND
    passes over the bit array — no per-value Python.  This is the
    semi-join pruning kernel: probe a batch of the big join side against
    the small side's filter before the shuffle.  Null rows probe False
    (a null key matches nothing in an equi-join)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    valid = None
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        fill = (
            ""
            if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type))
            else (
                b""
                if (pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type))
                else 0
            )
        )
        arr = arr.fill_null(fill)
    k = filt[0]
    bits = np.frombuffer(filt, np.uint8, offset=1)
    m = bits.size * 8
    h = _hash_column(arr)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64)
    ok = np.ones(h.size, dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            ok &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
    if valid is not None:
        ok &= valid
    return ok


def merge(parts: list[bytes]) -> bytes:
    """OR-merge fixed-geometry partial filters (same m and k)."""
    k = parts[0][0]
    acc = np.frombuffer(parts[0], np.uint8, offset=1).copy()
    for p in parts[1:]:
        if p[0] != k or len(p) != len(parts[0]):
            raise ValueError("bloom merge requires identical geometry")
        np.bitwise_or(acc, np.frombuffer(p, np.uint8, offset=1), out=acc)
    return bytes([k]) + acc.tobytes()


def serialize(filt: bytes) -> str:
    return base64.b64encode(filt).decode()


def deserialize(s: str) -> bytes:
    return base64.b64decode(s)
