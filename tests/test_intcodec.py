"""Integer codec tests — mirrors the reference's RLEv2 pattern matrices
(apache/orc java TestNewIntegerEncoding.java, impl/TestRunLengthIntegerReaderV2.java,
c++/test/TestRleEncoder.cc; FIXTURES.md F2)."""

import numpy as np
import pytest

from orc_ray.codecs.bitpack import pack, unpack
from orc_ray.codecs.intcodec import (
    BLOCK,
    INT_BLOCKS,
    INT_RLE,
    T_CONST,
    T_DELTA,
    T_DIRECT,
    T_PATCHED,
    _decode_blocks,
    _encode_blocks,
    decode_int64,
    encode_int64,
)

rng = np.random.default_rng(7)


def roundtrip(v, **kw):
    v = np.asarray(v, dtype=np.int64)
    enc = encode_int64(v, **kw)
    dec = decode_int64(enc)
    np.testing.assert_array_equal(dec, v)
    return enc


@pytest.mark.parametrize("width", list(range(1, 65)))
def test_bitpack_roundtrip(width):
    n = 1000
    if width == 64:
        v = rng.integers(0, 2**63, n, dtype=np.uint64) * 2 + rng.integers(0, 2, n, dtype=np.uint64)
    else:
        v = rng.integers(0, 2**width, n, dtype=np.uint64)
    packed = pack(v, width)
    assert len(packed) == (n * width + 7) // 8
    np.testing.assert_array_equal(unpack(packed, n, width), v)


def test_bitpack_empty_and_zero_width():
    assert pack(np.array([], dtype=np.uint64), 13) == b""
    assert unpack(b"", 0, 13).size == 0
    assert pack(np.zeros(10, dtype=np.uint64), 0) == b""
    np.testing.assert_array_equal(unpack(b"", 10, 0), np.zeros(10, dtype=np.uint64))


# --- F2 pattern matrix ------------------------------------------------------

def _tags(v):
    """Chosen sub-encodings for the block layout of v."""
    import struct

    data = _encode_blocks(np.asarray(v, dtype=np.int64))
    n, _ = struct.unpack_from("<QI", data, 0)
    nb = (n + BLOCK - 1) // BLOCK
    return np.frombuffer(data, np.uint8, nb, 28)  # after the <QI4I head


def test_const_long_uses_rle_or_const():
    v = np.full(20000, 7, dtype=np.int64)
    enc = roundtrip(v)
    assert enc[0] == INT_RLE
    assert len(enc) < 200  # 20k constants collapse to almost nothing


def test_const_short_runs_use_rle():
    # runs of 3-10 identical values — ORC SHORT_REPEAT territory
    parts = []
    for i in range(2000):
        parts.append(np.full(int(rng.integers(3, 11)), int(rng.integers(0, 100)), dtype=np.int64))
    v = np.concatenate(parts)
    enc = roundtrip(v)
    assert enc[0] == INT_RLE
    assert len(enc) < v.size  # beats 1 byte per value comfortably


def test_monotonic_uses_delta():
    v = np.arange(20000, dtype=np.int64)
    enc = roundtrip(v)
    assert enc[0] == INT_BLOCKS
    assert set(_tags(v)) <= {T_DELTA}
    assert len(enc) < 2500
    v3 = np.arange(0, 60000, 3, dtype=np.int64)
    roundtrip(v3)
    assert set(_tags(v3)) <= {T_DELTA}


def test_random_wide_uses_direct():
    v = rng.integers(0, 2**31, 20000, dtype=np.int64)
    roundtrip(v)
    assert set(_tags(v)) <= {T_DIRECT}


def test_small_range_direct_narrow():
    v = rng.integers(0, 16, 20000, dtype=np.int64)
    enc = roundtrip(v)
    # 4 bits/value + headers
    assert len(enc) < 20000 * 4 / 8 * 1.15


def test_patched_base():
    v = rng.integers(0, 100, 15000, dtype=np.int64)
    v[::97] = 2**45 + np.arange(len(v[::97]))
    roundtrip(v)
    tags = _tags(v)
    assert (tags == T_PATCHED).mean() > 0.8
    # patched must beat plain direct on these blocks
    enc = _encode_blocks(v)
    assert len(enc) < 15000 * 2  # direct would need 46 bits ≈ 5.75 B/value


def test_frame_of_reference_shift():
    v = rng.integers(10**9, 10**9 + 128, 20000, dtype=np.int64)
    enc = roundtrip(v)
    # FOR base removes ~30 bits: 8 bits/value (speed-aligned) + headers ≪ raw
    assert len(enc) < 20000 * 8 / 8 * 1.15
    # compression strategy packs at the exact 7-bit width
    enc_c = encode_int64(v, strategy="compression")
    np.testing.assert_array_equal(decode_int64(enc_c), v)
    assert len(enc_c) < 20000 * 7 / 8 * 1.15


def test_negatives_and_extremes():
    v = np.array([-1, 0, 1, np.iinfo(np.int64).min, np.iinfo(np.int64).max, -2**62, 2**62], dtype=np.int64)
    roundtrip(v)
    v2 = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    roundtrip(v2)
    # alternating extremes stress zigzag-delta wraparound
    v3 = np.empty(2000, dtype=np.int64)
    v3[::2] = np.iinfo(np.int64).min
    v3[1::2] = np.iinfo(np.int64).max
    roundtrip(v3)


@pytest.mark.parametrize("n", [0, 1, 2, 511, 512, 513, 1024, 1025])
def test_edge_sizes(n):
    roundtrip(rng.integers(-1000, 1000, n, dtype=np.int64))


def test_fixed_delta_runs():
    v = np.repeat(np.arange(40, dtype=np.int64) * 1000, 512)  # block-aligned constants
    enc = roundtrip(v)
    assert len(enc) < 1500


def test_zipf_tokens_shape():
    # the north-star token distribution: zipf mod vocab
    v = (rng.zipf(1.3, 50000) % 50257).astype(np.int64)
    enc = roundtrip(v)
    assert len(enc) < 50000 * 2.1  # ≤ ~16-17 bits/value before zstd


# ---------------------------------------------------------------------------
# round-2: 32-bit codec lane + partial (seek-style) block decode

from orc_ray.codecs.intcodec import INT_BLOCKS32, INT_BLOCKS32_SHUF, decode_ints, encode_ints


def test_int32_lane_roundtrip_patterns():
    rng = np.random.default_rng(7)
    cases = [
        np.arange(5000, dtype=np.int32),
        rng.integers(-(2**31), 2**31, 5000).astype(np.int32),
        np.array([2**31 - 1, -(2**31), 0, -1, 1] * 300, dtype=np.int32),  # wraparound deltas
        np.zeros(2000, dtype=np.int32),
        rng.integers(0, 16, 7000).astype(np.int32),
        np.array([], dtype=np.int32),
        np.array([42], dtype=np.int32),
        # sparse outliers -> PATCHED in 32-bit domain
        np.where(rng.random(4000) < 0.01, 2**30, rng.integers(0, 100, 4000)).astype(np.int32),
    ]
    for v in cases:
        blob = encode_ints(v)
        out = decode_ints(blob)
        np.testing.assert_array_equal(out.astype(np.int64), v.astype(np.int64))


def test_int32_lane_selected_for_int32():
    v = np.arange(1000, dtype=np.int32)
    assert encode_ints(v, min_run_ratio=1e9)[0] == INT_BLOCKS32
    v64 = np.arange(1000, dtype=np.int64)
    assert encode_ints(v64, min_run_ratio=1e9)[0] == INT_BLOCKS


def test_partial_block_decode_matches_full():
    rng = np.random.default_rng(11)
    for dtype in (np.int32, np.int64):
        v = np.concatenate(
            [
                np.arange(512),                      # DELTA
                rng.integers(0, 50, 512),            # DIRECT narrow
                np.full(512, 7),                     # CONST
                np.where(rng.random(512) < 0.02, 2**28, rng.integers(0, 9, 512)),  # PATCHED
                rng.integers(0, 1000, 300),          # tail (short block)
            ]
        ).astype(dtype)
        blob = encode_ints(v, min_run_ratio=1e9)  # force block layout
        for sel in ([0], [1, 3], [4], [0, 2, 4], [2], [0, 1, 2, 3, 4]):
            sel_arr = np.array(sel, dtype=np.int64)
            got = decode_ints(blob, block_sel=sel_arr)
            exp = np.concatenate([v[i * 512 : (i + 1) * 512] for i in sel])
            np.testing.assert_array_equal(got.astype(np.int64), exp.astype(np.int64))


def test_partial_decode_compression_strategy_widths():
    # exact (non-aligned) widths exercise the generic unpack fallback
    rng = np.random.default_rng(13)
    v = rng.integers(0, 1 << 21, 2048).astype(np.int32)
    blob = encode_ints(v, min_run_ratio=1e9, strategy="compression")
    got = decode_ints(blob, block_sel=np.array([1, 2]))
    np.testing.assert_array_equal(got, v[512:1536])


# ---------------------------------------------------------------------------
# round-5: byte-shuffled block payloads (SHUF layouts)

from orc_ray.codecs.intcodec import _SHUF_MIN_N, INT_BLOCKS_SHUF  # noqa: E402


def test_shuf_layout_selected_by_measurement():
    """Streams >= _SHUF_MIN_N values probe both layouts through the
    second-stage compressor and take the smaller; sub-threshold streams
    and streams whose interleaved bytes compress better stay plain."""
    rng = np.random.default_rng(5)
    big32 = (rng.zipf(1.3, 1 << 16) % 50257).astype(np.int32)
    assert encode_ints(big32, min_run_ratio=1e9)[0] == INT_BLOCKS32_SHUF
    small32 = big32[: _SHUF_MIN_N - 1]
    assert encode_ints(small32, min_run_ratio=1e9)[0] == INT_BLOCKS32
    big64 = big32.astype(np.int64)
    assert encode_ints(big64, min_run_ratio=1e9)[0] == INT_BLOCKS_SHUF
    # selection optimality: whatever the probe picks must frame no larger
    # than the rejected layout (checked on the full stream, not the sample)
    from orc_ray.codecs import framing
    from orc_ray.codecs.intcodec import _DT64, _encode_blocks

    per = np.empty(1 << 16, dtype=np.int64)
    per[::2] = -1
    per[1::2] = -800_000_000 + np.arange(1 << 15) * 3_794_708
    for v in (per, big64):
        chosen = encode_ints(v, min_run_ratio=1e9)
        np.testing.assert_array_equal(decode_ints(chosen), v)
        f_shuf = len(framing.compress(bytes(_encode_blocks(v, "speed", _DT64, shuffle=True)), "zstd", level=1))
        f_plain = len(framing.compress(bytes(_encode_blocks(v, "speed", _DT64, shuffle=False)), "zstd", level=1))
        f_chosen = f_shuf if chosen[0] == INT_BLOCKS_SHUF else f_plain
        assert f_chosen <= min(f_shuf, f_plain) * 1.02  # sample probe, full-stream check


def test_shuf_roundtrip_all_tags():
    """Every sub-encoding through the shuffled lane: DIRECT narrow (<=8 bit,
    transpose skipped), DIRECT wide, PATCHED, DELTA (never shuffled),
    CONST, fixed-delta, tail block — values must round-trip exactly."""
    rng = np.random.default_rng(6)
    reps = _SHUF_MIN_N // 512 // 8 + 1
    parts = [
        rng.integers(0, 50257, 512),                    # DIRECT 16-bit
        rng.integers(0, 50, 512),                       # DIRECT narrow
        np.arange(512) * 3 + 7,                         # fixed delta
        np.full(512, -9),                               # CONST
        np.where(rng.random(512) < 0.02, 2**28, rng.integers(0, 9, 512)),  # PATCHED
        np.cumsum(rng.integers(-300, 300, 512)),        # DELTA
        rng.integers(-(2**40), 2**40, 512),             # DIRECT wide (64-bit lane)
        rng.integers(0, 70000, 300),                    # tail
    ]
    for dtype in (np.int64,):
        v = np.concatenate(parts * reps).astype(dtype)
        assert v.size >= _SHUF_MIN_N
        blob = encode_ints(v, min_run_ratio=1e9)
        assert blob[0] == INT_BLOCKS_SHUF
        np.testing.assert_array_equal(decode_ints(blob), v)
        # selective block decode crosses shuffled and plain groups
        sel = np.array([0, 1, 4, 6, v.size // 512], dtype=np.int64)
        got = decode_ints(blob, block_sel=sel)
        exp = np.concatenate([v[i * 512 : (i + 1) * 512] for i in sel])
        np.testing.assert_array_equal(got, exp)
    reps32 = _SHUF_MIN_N // 512 // 6 + 1
    v32 = np.concatenate(parts[:6] * reps32 + [parts[7]]).astype(np.int32)
    blob = encode_ints(v32, min_run_ratio=1e9)
    assert blob[0] == INT_BLOCKS32_SHUF
    np.testing.assert_array_equal(decode_ints(blob), v32)


def test_shuf_compresses_better_on_zipf():
    """The point of the layout: framed (zstd level 1) size of the shuffled
    token stream beats the plain layout by a real margin."""
    from orc_ray.codecs import framing
    from orc_ray.codecs.intcodec import _encode_blocks, _DT32

    rng = np.random.default_rng(7)
    v = (rng.zipf(1.3, 500_000) % 50257).astype(np.int32)
    shuf = framing.compress(bytes(_encode_blocks(v, "speed", _DT32, shuffle=True)), "zstd", level=1)
    plain = framing.compress(bytes(_encode_blocks(v, "speed", _DT32, shuffle=False)), "zstd", level=1)
    assert len(shuf) < 0.95 * len(plain)
