"""Property-based round-trip tests (hypothesis) — the analog of the
reference's seeded randomized corpora (TestVectorOrcFile random suites,
TestNewIntegerEncoding fuzz; SURVEY §5.4), upgraded to real property
testing."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from orc_ray.chunk import decode_chunk, encode_chunk
from orc_ray.codecs.intcodec import decode_int64, encode_int64

ints = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(ints, max_size=1500))
def test_intcodec_any_int64(xs):
    v = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(decode_int64(encode_int64(v)), v)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(ints, min_size=1, max_size=40),  # run values
    st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40),
)
def test_intcodec_runny(vals, lens):
    n = min(len(vals), len(lens))
    v = np.repeat(np.array(vals[:n], np.int64), np.array(lens[:n], np.int64))
    np.testing.assert_array_equal(decode_int64(encode_int64(v)), v)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=30), max_size=300))
def test_string_column_roundtrip(xs):
    t = pa.table({"s": pa.array(xs, pa.string())})
    out = decode_chunk(encode_chunk(t))
    assert out.column("s").combine_chunks().equals(t.column("s").combine_chunks())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=40), max_size=200))
def test_binary_column_roundtrip(xs):
    t = pa.table({"b": pa.array(xs, pa.binary())})
    out = decode_chunk(encode_chunk(t))
    assert out.column("b").combine_chunks().equals(t.column("b").combine_chunks())


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=20)),
        max_size=150,
    )
)
def test_nullable_list_int32_roundtrip(xs):
    t = pa.table({"l": pa.array(xs, pa.list_(pa.int32()))})
    out = decode_chunk(encode_chunk(t))
    assert out.column("l").combine_chunks().equals(t.column("l").combine_chunks())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=False)), max_size=300))
def test_float_roundtrip(xs):
    t = pa.table({"f": pa.array(xs, pa.float64())})
    out = decode_chunk(encode_chunk(t))
    assert out.column("f").combine_chunks().equals(t.column("f").combine_chunks())
