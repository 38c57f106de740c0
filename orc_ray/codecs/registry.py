"""Codec registry — the engine's user-extension surface.

The analog of the reference's pluggable surfaces (SURVEY.md §2.9: ORC's
pluggable Dictionary implementations, BatchFilter SPI, PhysicalWriter) in
the shape §2.9 prescribes for this engine: a registry of
name -> (encode, decode) kernel pairs so new codecs (ALP variants,
delta-of-delta, custom sketches) plug in without touching chunk.py.

A registered codec is selected by forcing it for a column:

    register(ColumnCodec("mycodec", my_encode, my_decode))
    EncodeOptions(column_codecs={"colname": "mycodec"})

Contracts:
    encode(arr: pa.Array, opts) -> (meta: dict-json-safe, bufs: list[bytes])
        meta must NOT set keys used by the container ("n", "valid",
        "codec", "name", "_nbuf", "buf_lens").
    decode(meta: dict, bufs: list[bytes], ty: pa.DataType) -> pa.Array
        must return exactly meta-described rows of type ``ty``.

Validity (nulls) is handled by the container: encode receives the array
with nulls filled per its type; the validity bitmap is stored and
re-applied outside the codec.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

__all__ = ["ColumnCodec", "register", "get", "names"]


@dataclass(frozen=True)
class ColumnCodec:
    name: str
    encode: Callable
    decode: Callable
    n_buffers: int = 1  # fixed buffer count the codec emits


_REGISTRY: dict[str, ColumnCodec] = {}

_BUILTIN = {"int", "raw", "rawsh", "fdec", "str", "bin", "dict", "fsst", "list", "map", "struct"}


def register(codec: ColumnCodec) -> None:
    if codec.name in _BUILTIN:
        raise ValueError(f"'{codec.name}' is a builtin codec tag")
    _REGISTRY[codec.name] = codec


def get(name: str) -> ColumnCodec | None:
    return _REGISTRY.get(name)


def names() -> list[str]:
    return sorted(_BUILTIN | set(_REGISTRY))
