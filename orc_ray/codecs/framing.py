"""Generic block compression framing — second stage over encoded streams.

The analog of the reference's compression framing
(apache/orc c++/src/Compression.cc + io/OutputStream.cc `CompressionStream`):
every stream is chopped into fixed-size blocks, each independently
compressed and preceded by a small header whose low bit marks an
*incompressible* block stored raw (the `is_original` bit — verified against
the reference in SURVEY.md [P5]).  Block-at-a-time framing bounds the
decompress working set and keeps random access to a chunk cheap.

Header per block: 4-byte little-endian ``(stored_len << 1) | is_original``.
Stream prefix: 1 byte codec id, 8-byte LE total uncompressed length,
4-byte LE block size.
"""

from __future__ import annotations

import struct

import pyarrow as pa

__all__ = ["compress", "decompress", "decompress_ranges", "LazyBuffer", "DEFAULT_BLOCK_SIZE"]

DEFAULT_BLOCK_SIZE = 256 * 1024

_CODEC_IDS = {"none": 0, "zstd": 5, "lz4": 4, "snappy": 2, "gzip": 1}
_ID_CODECS = {v: k for k, v in _CODEC_IDS.items()}

_codec_cache: dict[tuple[str, int | None], pa.Codec] = {}


def _codec(name: str, level: int | None) -> pa.Codec:
    key = (name, level)
    c = _codec_cache.get(key)
    if c is None:
        c = pa.Codec(name) if level is None else pa.Codec(name, compression_level=level)
        _codec_cache[key] = c
    return c


def compress(
    data: bytes,
    codec: str = "zstd",
    level: int | None = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> bytes:
    """Frame ``data`` into independently-compressed blocks."""
    if codec == "none":
        return struct.pack("<BQI", 0, len(data), block_size) + data
    c = _codec(codec, level)
    mv = memoryview(data)  # zero-copy block slices (bytes slicing copies)
    out = [struct.pack("<BQI", _CODEC_IDS[codec], len(data), block_size)]
    for off in range(0, len(data), block_size):
        blk = mv[off : off + block_size]
        comp = c.compress(blk, asbytes=True)
        if len(comp) < len(blk):
            out.append(struct.pack("<I", (len(comp) << 1) | 0))
            out.append(comp)
        else:
            out.append(struct.pack("<I", (len(blk) << 1) | 1))
            out.append(blk)
    return b"".join(out)


class LazyBuffer:
    """A still-framed buffer handed through decode so a range-aware codec
    can decompress only the blocks its rows touch (see decompress_ranges)."""

    __slots__ = ("framed",)

    def __init__(self, framed: memoryview):
        self.framed = framed


RANGE_STATS = {"blocks_decompressed": 0, "blocks_total": 0}


def decompress_ranges(data: bytes | memoryview, ranges: list) -> bytes:
    """Bytes of sorted disjoint [a, b) ranges of the UNCOMPRESSED stream,
    concatenated — decompressing only the framing blocks the ranges touch
    (each block at most once).  The random-access payoff of block-
    independent framing: a stride-pruned read of a big string column pays
    for ~1 block, not the whole stream."""
    data = memoryview(data)
    codec_id, total, block_size = struct.unpack_from("<BQI", data, 0)
    off = 13
    if codec_id == 0:
        base = data[off : off + total]
        return b"".join(bytes(base[a:b]) for a, b in ranges)
    c = _codec(_ID_CODECS[codec_id], None)
    blocks = []  # (stored_off, stored_len, is_original, ulen)
    remaining = total
    while remaining > 0:
        (hdr,) = struct.unpack_from("<I", data, off)
        off += 4
        stored = hdr >> 1
        ulen = min(block_size, remaining)
        blocks.append((off, stored, hdr & 1, ulen))
        off += stored
        remaining -= ulen
    RANGE_STATS["blocks_total"] += len(blocks)
    out = []
    cache_bi = -1
    cache = b""
    for a, b in ranges:
        cur = a
        while cur < b:
            bi = cur // block_size
            soff, stored, orig, ulen = blocks[bi]
            if bi != cache_bi:
                cache = (
                    bytes(data[soff : soff + stored])
                    if orig
                    else c.decompress(data[soff : soff + stored], decompressed_size=ulen, asbytes=True)
                )
                cache_bi = bi
                RANGE_STATS["blocks_decompressed"] += 1
            u0 = bi * block_size
            end = min(b, u0 + ulen)
            out.append(cache[cur - u0 : end - u0])
            cur = end
    return b"".join(out)


def decompress(data: bytes | memoryview) -> bytes:
    """Inverse of :func:`compress`."""
    data = memoryview(data)
    codec_id, total, block_size = struct.unpack_from("<BQI", data, 0)
    off = 13
    name = _ID_CODECS[codec_id]
    if codec_id == 0:
        return bytes(data[off : off + total])
    c = _codec(name, None)
    out = []
    remaining = total
    while remaining > 0:
        (hdr,) = struct.unpack_from("<I", data, off)
        off += 4
        stored = hdr >> 1
        raw_len = min(block_size, remaining)
        if hdr & 1:
            out.append(bytes(data[off : off + stored]))
        else:
            out.append(c.decompress(data[off : off + stored], decompressed_size=raw_len, asbytes=True))
        off += stored
        remaining -= raw_len
    return b"".join(out)
