"""Codec-registry extension surface (SURVEY §2.9): a user codec plugs in
by name and participates in chunk encode/decode untouched internals."""

import numpy as np
import pyarrow as pa

from orc_ray.chunk import EncodeOptions, decode_chunk, encode_chunk, read_chunk_header
from orc_ray.codecs.registry import ColumnCodec, get, names, register


def _xor_encode(arr: pa.Array, opts):
    # toy codec: xor-with-previous then raw bytes (delta-of-delta family)
    v = arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    x = v.copy()
    x[1:] ^= v[:-1]
    return {"xn": int(v.size)}, [x.tobytes()]


def _xor_decode(meta, bufs, ty):
    x = np.frombuffer(bufs[0], np.uint64).copy()
    for i in range(1, x.size):
        x[i] ^= x[i - 1]
    return pa.array(x.view(np.int64), pa.int64()).cast(ty)


def test_register_and_roundtrip():
    if get("xorprev") is None:
        register(ColumnCodec("xorprev", _xor_encode, _xor_decode))
    assert "xorprev" in names()
    rng = np.random.default_rng(3)
    t = pa.table({"a": pa.array(rng.integers(0, 1000, 500)), "b": pa.array(rng.normal(size=500))})
    opts = EncodeOptions(column_codecs={"a": "xorprev"})
    blob = encode_chunk(t, opts)
    hdr = read_chunk_header(blob)
    codecs = {c["name"]: c["codec"] for c in hdr["columns"]}
    assert codecs["a"] == "xorprev"
    out = decode_chunk(blob)
    assert out.column("a").combine_chunks().equals(t.column("a").combine_chunks())
    assert out.column("b").combine_chunks().equals(t.column("b").combine_chunks())


def test_builtin_names_protected():
    import pytest

    with pytest.raises(ValueError):
        register(ColumnCodec("int", _xor_encode, _xor_decode))
