"""RLEv1-analog write path (EncodeOptions.file_version="0.11";
apache/orc c++/src/RLEv1.cc, probe [P9]): maximal fixed-delta runs of
3..130 values with delta in [-128, 127] plus <=128-value varint literal
spans, stream-grouped for vectorized decode.  Readers dispatch on the
layout byte — no reader knob, stores mixing versions decode transparently
(ORC reader semantics for old file versions).
"""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.codecs.intcodec import (
    INT_V1,
    INT_V1_32,
    decode_ints,
    decode_ints_ranges,
    encode_ints,
)


def _rt(v, dtype=np.int64):
    v = np.asarray(v, dtype)
    b = encode_ints(v, version="0.11")
    assert b[0] == (INT_V1_32 if dtype == np.int32 else INT_V1)
    out = decode_ints(b)
    assert out.dtype == v.dtype
    np.testing.assert_array_equal(out, v)
    return b


def test_empty_and_single():
    _rt([])
    _rt([42])
    _rt([-1], np.int32)


def test_constant_run_is_delta_zero_run():
    b = _rt([7] * 1000)
    # a constant run encodes as ~8 run records (1000/130), tiny stream
    assert len(b) < 64


def test_monotonic_run():
    _rt(np.arange(100000))
    _rt(np.arange(0, 300, 3))
    _rt(np.arange(500, 0, -1))  # delta -1


def test_delta_out_of_range_is_literal():
    v = np.arange(0, 2000, 129)  # delta 129 > 127: all literals
    b = _rt(v)
    v2 = np.arange(0, 2000, 127)  # delta 127: one run family
    b2 = _rt(v2)
    assert len(b2) < len(b)


def test_int64_extremes_no_overflow_misdetection():
    lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    _rt([lo, hi, lo, hi, 0, -1, 1, lo + 1, hi - 1] * 10)
    # wrapped diff of (hi, lo) is small — must NOT be mistaken for a run
    _rt([hi, lo, hi, lo, hi, lo])


def test_mixed_runs_and_literals_fuzz():
    rng = np.random.default_rng(11)
    parts = []
    for _ in range(60):
        kind = rng.integers(0, 3)
        n = int(rng.integers(1, 400))
        if kind == 0:
            parts.append(np.full(n, int(rng.integers(-(2**40), 2**40))))
        elif kind == 1:
            start = int(rng.integers(-(2**40), 2**40))
            step = int(rng.integers(-128, 128))
            parts.append(start + step * np.arange(n))
        else:
            parts.append(rng.integers(-(2**50), 2**50, n))
    v = np.concatenate(parts)
    _rt(v)
    _rt(np.clip(v, -(2**30), 2**30).astype(np.int32), np.int32)


def test_range_decode_slices_correctly():
    v = np.concatenate([np.arange(5000), np.full(3000, 9), np.random.default_rng(3).integers(0, 10**9, 2000)])
    b = encode_ints(v, version="0.11")
    for ranges in ([(0, 10)], [(4990, 5010), (7990, 8050)], [(0, 10000)], []):
        got = decode_ints_ranges(b, ranges)
        exp = np.concatenate([v[a:bnd] for a, bnd in ranges]) if ranges else v[:0]
        np.testing.assert_array_equal(got, exp)


def test_chunk_level_file_version_knob():
    from orc_ray.chunk import EncodeOptions, decode_chunk, encode_chunk

    t = pa.table(
        {
            "k": pa.array(np.arange(4000)),
            "flag": pa.array(([1] * 100 + [0] * 100) * 20),
            "s": pa.array([f"s{i % 5}" for i in range(4000)]),
            "f": pa.array(np.linspace(0, 1, 4000)),
        }
    )
    old = encode_chunk(t, EncodeOptions(file_version="0.11"))
    new = encode_chunk(t, EncodeOptions())
    assert decode_chunk(old).equals(t)  # v0.11 streams decode transparently
    assert decode_chunk(new).equals(t)
    assert old != new  # the knob actually changed the written bytes


def test_v1_size_is_sane_on_runny_data():
    """On run-dominated data the v1 layout must be compact (the RLEv1
    value proposition), within ~4x of the modern layout."""
    v = np.repeat(np.arange(100), 100)  # 10k values, 100 runs
    b_v1 = encode_ints(v, version="0.11")
    b_v2 = encode_ints(v)
    assert len(b_v1) < 4 * len(b_v2) and len(b_v1) < 2000, (len(b_v1), len(b_v2))
