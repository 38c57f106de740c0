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

__all__ = ["compress", "decompress", "DEFAULT_BLOCK_SIZE"]

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
