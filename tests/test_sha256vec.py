"""Vectorized SHA-256 equals hashlib bit-for-bit, across block boundaries
and through the sha256 mask path (null preservation included)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_ray.functions.mask import apply_masks
from orc_ray.functions.sha256vec import sha256_digests, sha256_hex


def _ref(msgs):
    return np.stack([np.frombuffer(hashlib.sha256(m).digest(), np.uint8) for m in msgs])


def test_all_lengths_0_to_300():
    """Every length through 300 bytes — crosses the 1/2/3/4/5-block
    padding boundaries (55/56, 119/120, 183/184, 247/248)."""
    msgs = [bytes((i + j) % 256 for j in range(i)) for i in range(301)]
    got = sha256_digests(pa.array(msgs, pa.binary()))
    assert (got == _ref(msgs)).all()


def test_utf8_and_hex():
    texts = ["", "abc", "héllo wörld", "日本語テキスト", "a" * 200]
    col = pa.array(texts)
    hx = sha256_hex(col)
    for t, h in zip(texts, hx):
        assert h.as_py() == hashlib.sha256(t.encode()).hexdigest()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=50))
def test_property_vs_hashlib(msgs):
    got = sha256_digests(pa.array(msgs, pa.large_binary()))
    assert (got == _ref(msgs)).all()


def test_int_column_stringified():
    vals = [0, 1, -7, 2**40, None]
    got = sha256_hex(pa.array(vals, pa.int64()))
    for v, h in zip(vals, got):
        s = "" if v is None else str(v)
        assert h.as_py() == hashlib.sha256(s.encode()).hexdigest()


def test_mask_sha256_null_preserving():
    t = pa.table({"ssn": pa.array(["123-45-6789", None, "987-65-4321"])})
    out = apply_masks(t, {"ssn": "sha256"}).column("ssn")
    assert out[0].as_py() == hashlib.sha256(b"123-45-6789").hexdigest()
    assert out[1].as_py() is None
    assert out[2].as_py() == hashlib.sha256(b"987-65-4321").hexdigest()


def test_sliced_column():
    msgs = [f"row {i}".encode() for i in range(100)]
    col = pa.array(msgs, pa.binary()).slice(17, 40)
    got = sha256_digests(col)
    assert (got == _ref(msgs[17:57])).all()


@pytest.mark.parametrize("n", [0, 1, 16385])
def test_lane_chunk_edges(n):
    msgs = [f"id-{i}".encode() for i in range(n)]
    got = sha256_digests(pa.array(msgs, pa.binary()))
    if n:
        assert (got == _ref(msgs)).all()
    else:
        assert got.shape == (0, 32)
