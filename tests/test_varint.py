"""Varint/zigzag codec — SerializationUtils analog (SURVEY.md §2.1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_ray.codecs.varint import (
    decode_svarints,
    decode_varints,
    encode_svarints,
    encode_varints,
    varint_lengths,
)


def _ref_encode(v: int) -> bytes:
    """Scalar reference LEB128 (the SerializationUtils writeVulong loop)."""
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_matches_scalar_reference():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1]
    arr = np.array(vals, dtype=np.uint64)
    enc = encode_varints(arr)
    assert enc == b"".join(_ref_encode(v) for v in vals)
    dec, used = decode_varints(enc, len(vals))
    assert used == len(enc)
    np.testing.assert_array_equal(dec, arr)


def test_lengths_boundaries():
    vals = np.array([0, 127, 128, (1 << 14) - 1, 1 << 14, (1 << 63), 2**64 - 1], np.uint64)
    lens = varint_lengths(vals)
    assert lens.tolist() == [1, 1, 2, 2, 3, 10, 10]


def test_empty_and_offset():
    assert encode_varints(np.empty(0, np.uint64)) == b""
    a, used = decode_varints(b"", 0)
    assert a.size == 0 and used == 0
    # decode mid-buffer with offset
    payload = b"\xff" + encode_varints(np.array([300, 7], np.uint64))
    dec, used = decode_varints(payload, 2, offset=1)
    assert dec.tolist() == [300, 7] and used == len(payload) - 1


def test_truncated_raises():
    enc = encode_varints(np.array([2**40], np.uint64))
    with pytest.raises(ValueError):
        decode_varints(enc[:-1], 1)


def test_signed_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.integers(-(2**62), 2**62, 4096)
    x[:8] = [0, -1, 1, 2**62, -(2**62), np.iinfo(np.int64).max, np.iinfo(np.int64).min, 63]
    enc = encode_svarints(x)
    dec, used = decode_svarints(enc, x.size)
    assert used == len(enc)
    np.testing.assert_array_equal(dec, x)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_property_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = encode_varints(arr)
    assert enc == b"".join(_ref_encode(int(v)) for v in vals)
    dec, used = decode_varints(enc, arr.size)
    assert used == len(enc)
    np.testing.assert_array_equal(dec, arr)
