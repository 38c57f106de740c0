"""Vectorized md5 == hashlib.md5, property-tested (the oracle-parity
contract every sampling/split/fingerprint consumer relies on)."""

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.functions.md5vec import (
    md5_digests,
    md5_first_hex,
    md5_hex,
    md5_hex15_int,
)


def _ref_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_digests_match_hashlib_all_lengths():
    # every length 0..200 crosses the 1-block/2-block/3-block boundaries
    strs = ["x" * L for L in range(201)]
    dg = md5_digests(pa.array(strs))
    for i, s in enumerate(strs):
        assert dg[i].tobytes() == hashlib.md5(s.encode()).digest(), i


def test_random_unicode_strings():
    rng = random.Random(7)
    strs = [
        "".join(rng.choices("abcXYZ019 .,é中\t", k=rng.randint(0, 150))) for _ in range(300)
    ]
    assert md5_hex(pa.array(strs)).to_pylist() == [_ref_hex(s) for s in strs]


def test_hex15_and_first_digit():
    strs = [f"doc_{i:07d}" for i in range(50)] + ["", "a"]
    arr = pa.array(strs)
    h15 = md5_hex15_int(arr)
    fh = md5_first_hex(arr)
    for i, s in enumerate(strs):
        hx = _ref_hex(s)
        assert h15[i] == int(hx[:15], 16)
        assert fh[i] == hx[0]


def test_int_column_casts_to_varchar():
    ids = pa.array([0, 1, 42, 99999, 123456789], pa.int64())
    assert md5_hex(ids).to_pylist() == [_ref_hex(str(v)) for v in [0, 1, 42, 99999, 123456789]]


def test_nulls_hash_empty_string():
    # callers re-mask; the kernel itself must not crash or misalign lanes
    arr = pa.array(["a", None, "b"])
    hx = md5_hex(arr).to_pylist()
    assert hx == [_ref_hex("a"), _ref_hex(""), _ref_hex("b")]


def test_binary_input():
    payloads = [b"", b"\x00\xff" * 40, bytes(range(256))]
    dg = md5_digests(pa.array(payloads, pa.binary()))
    for i, p in enumerate(payloads):
        assert dg[i].tobytes() == hashlib.md5(p).digest()


def test_chunk_boundary_exact():
    # exactly 55 / 56 / 64 bytes: the padding one-vs-two-block edge
    for L in (54, 55, 56, 57, 63, 64, 65, 119, 120, 121):
        s = "q" * L
        assert md5_hex(pa.array([s])).to_pylist() == [_ref_hex(s)]


def test_lane_chunking_consistent():
    # > one 16384-lane chunk: chunk seams must not corrupt lanes
    n = 40000
    strs = [f"id{i}" for i in range(n)]
    h15 = md5_hex15_int(pa.array(strs))
    for i in (0, 16383, 16384, 32767, 32768, n - 1):
        assert h15[i] == int(_ref_hex(strs[i])[:15], 16)
