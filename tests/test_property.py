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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62 - 1)),
        max_size=400,
    ),
    st.sampled_from(["ms", "us", "ns"]),
)
def test_timestamp_roundtrip_property(xs, unit):
    arr = pa.array(xs, pa.int64()).cast(pa.timestamp(unit))
    t = pa.table({"ts": arr})
    out = decode_chunk(encode_chunk(t))
    assert out.column("ts").combine_chunks().equals(t.column("ts").combine_chunks())


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-(10**17), max_value=10**17)),
        max_size=300,
    )
)
def test_decimal_roundtrip_property(xs):
    import decimal

    vals = [None if x is None else decimal.Decimal(x).scaleb(-3) for x in xs]
    t = pa.table({"d": pa.array(vals, pa.decimal128(21, 3))})
    out = decode_chunk(encode_chunk(t))
    assert out.column("d").combine_chunks().equals(t.column("d").combine_chunks())


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=3000),
    st.data(),
)
def test_range_decode_property(xs, data):
    """decode_ints_ranges == full decode sliced, for arbitrary ranges."""
    from orc_ray.codecs.intcodec import decode_ints, decode_ints_ranges, encode_ints

    v = np.array(xs, dtype=np.int64)
    blob = encode_ints(v)
    n = v.size
    k = data.draw(st.integers(min_value=0, max_value=3))
    cuts = sorted(data.draw(st.lists(st.integers(0, n), min_size=2 * k, max_size=2 * k)))
    ranges = [(cuts[2 * i], cuts[2 * i + 1]) for i in range(k) if cuts[2 * i] < cuts[2 * i + 1]]
    got = decode_ints_ranges(blob, ranges)
    exp = np.concatenate([v[a:b] for a, b in ranges]) if ranges else v[:0]
    np.testing.assert_array_equal(got, exp)


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=400),
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=100),
)
def test_bloom_no_false_negatives_property(members, probes):
    import pyarrow as pa

    from orc_ray.codecs import bloom

    f = bloom.build(pa.array(members))
    mask = bloom.might_contain_many(f, pa.array(members))
    assert mask.all()  # zero false negatives, always
    # vectorized probe agrees with the scalar probe on arbitrary values
    vm = bloom.might_contain_many(f, pa.array(probes))
    for v, m in zip(probes, vm):
        assert m == bloom.might_contain(f, v)


@given(
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), min_size=2, max_size=2000),
    st.integers(min_value=2, max_value=6),
)
def test_tdigest_weight_conservation_and_rank_property(xs, nparts):
    import numpy as np

    from orc_ray.functions.sketch import tdigest_merge, tdigest_partial, tdigest_quantile

    v = np.asarray(xs)
    parts = [tdigest_partial(v[i::nparts]) for i in range(nparts)]
    m, w = tdigest_merge(parts)
    assert w.sum() == v.size  # weight conserved through merge+compress
    assert (np.diff(m) >= 0).all()  # centroid means stay sorted
    med = tdigest_quantile((m, w), [0.5])[0]
    assert v.min() <= med <= v.max()


@settings(max_examples=60, deadline=None)
@given(st.lists(ints, max_size=1500))
def test_intcodec_v011_any_int64(xs):
    from orc_ray.codecs.intcodec import decode_ints, encode_ints

    v = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(decode_ints(encode_ints(v, version="0.11")), v)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(ints, min_size=1, max_size=40),
    st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40),
    st.integers(min_value=-128, max_value=127),
)
def test_intcodec_v011_runny_and_delta(vals, lens, delta):
    """Run/delta-heavy inputs through the RLEv1-analog lane, including
    fixed-delta ramps at every legal delta byte value."""
    from orc_ray.codecs.intcodec import decode_ints, encode_ints

    n = min(len(vals), len(lens))
    v = np.repeat(np.array(vals[:n], np.int64), np.array(lens[:n], np.int64))
    with np.errstate(over="ignore"):
        ramp = vals[0] + delta * np.arange(lens[0], dtype=np.int64)
    v = np.concatenate([v, ramp])
    np.testing.assert_array_equal(decode_ints(encode_ints(v, version="0.11")), v)


# --- substring-dedup kernels (functions/substring.py), Ray-free ---

from orc_ray.functions.substring import (  # noqa: E402
    _all_window_hashes,
    _cut_arrays,
    _gram_words,
    _window_starts,
)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=600), st.sampled_from([8, 16, 32]))
def test_substring_hash_equal_bytes_equal_hash(data, L):
    b = np.frombuffer(data, np.uint8)
    h = _all_window_hashes(b, L)
    assert h.size == max(b.size - L + 1, 0)
    seen = {}
    for i in range(h.size):
        g = bytes(b[i : i + L])
        assert seen.setdefault(g, int(h[i])) == int(h[i])


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(st.characters(codec="ascii"), max_size=60),
             min_size=1, max_size=12),
    st.data(),
)
def test_substring_cut_arrays_matches_bruteforce(docs, data):
    # ASCII corpus: the operator contract is a string column (cuts are
    # byte-windowed; the module docstring pins the char/byte
    # correspondence to ASCII)
    L = 8
    raw = [d.encode() for d in docs]
    offs = np.zeros(len(raw) + 1, np.int64)
    np.cumsum([len(d) for d in raw], out=offs[1:])
    flat = np.frombuffer(b"".join(raw), np.uint8)
    # arbitrary flagged in-doc window starts (the operator only ever
    # flags valid starts; the kernel must cut exactly their span union)
    fs = []
    for i, d in enumerate(raw):
        nwin = max(len(d) - L + 1, 0)
        if nwin:
            picks = data.draw(st.lists(st.integers(0, nwin - 1), max_size=5))
            fs.extend(int(offs[i]) + p for p in picks)
    fs = np.array(sorted(set(fs)), np.int64)
    out, new_lens = _cut_arrays(flat, offs, fs, L)
    for i, d in enumerate(raw):
        cov = np.zeros(len(d), bool)
        for f in fs:
            if offs[i] <= f < offs[i + 1]:
                cov[f - offs[i] : f - offs[i] + L] = True
        want = bytes(np.frombuffer(d, np.uint8)[~cov]) if d else b""
        assert out[i].as_py().encode() == want
        assert new_lens[i] == len(want)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=10), st.sampled_from([8, 16]))
def test_substring_window_starts_and_grams(lens, L):
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, int(offs[-1])).astype(np.uint8)
    starts, nwin = _window_starts(offs, L)
    assert nwin.tolist() == [max(n - L + 1, 0) for n in lens]
    assert starts.size == int(nwin.sum())
    # every window stays inside its doc
    doc_of = np.repeat(np.arange(len(lens)), nwin)
    assert (starts >= offs[doc_of]).all()
    assert (starts + L <= offs[doc_of + 1]).all()
    words = _gram_words(data, starts, L)
    for k in range(min(starts.size, 20)):
        assert words[k].tobytes() == data[starts[k] : starts[k] + L].tobytes()
