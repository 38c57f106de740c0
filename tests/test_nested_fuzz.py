"""Seeded nested-schema fuzz: random compositions of ints/floats/strings/
bools/nulls under lists, structs and maps, round-tripped through the chunk
codec plus random projected + ranged decodes — the TestVectorOrcFile
randomized-corpus idea extended to arbitrary nesting."""

import numpy as np
import pyarrow as pa

from orc_ray.chunk import EncodeOptions, decode_chunk, encode_chunk


def _rand_array(rng, n, depth=0):
    kind = rng.integers(0, 8 if depth < 2 else 5)
    if kind == 0:
        return pa.array(rng.integers(-(10**9), 10**9, n))
    if kind == 1:
        return pa.array(rng.uniform(-10, 10, n))
    if kind == 2:
        return pa.array(
            ["".join(chr(97 + c) for c in rng.integers(0, 26, int(l))) for l in rng.integers(0, 20, n)]
        )
    if kind == 3:
        return pa.array(rng.integers(0, 2, n).astype(bool))
    if kind == 4:
        a = pa.array(rng.integers(0, 1000, n))
        mask = rng.random(n) < 0.15
        return a.take(pa.array(np.arange(n), mask=mask)) if n else a
    if kind == 5:
        lens = rng.integers(0, 4, n)
        child = _rand_array(rng, int(lens.sum()), depth + 1)
        off = np.zeros(n + 1, np.int32)
        np.cumsum(lens, out=off[1:])
        return pa.ListArray.from_arrays(pa.array(off, pa.int32()), child)
    if kind == 6:
        return pa.StructArray.from_arrays(
            [_rand_array(rng, n, depth + 1) for _ in range(2)], names=["a", "b"]
        )
    lens = rng.integers(0, 3, n)
    m = int(lens.sum())
    off = np.zeros(n + 1, np.int32)
    np.cumsum(lens, out=off[1:])
    return pa.MapArray.from_arrays(
        pa.array(off, pa.int32()),
        pa.array([f"k{i}" for i in range(m)]),
        pa.array(rng.integers(0, 100, m)),
    )


def _eq(a: pa.Array, b: pa.Array) -> bool:
    if a.equals(b):
        return True
    if pa.types.is_floating(b.type):  # Table.equals treats NaN != NaN
        return np.array_equal(
            a.to_numpy(zero_copy_only=False), b.to_numpy(zero_copy_only=False), equal_nan=True
        )
    return False


def test_nested_schema_fuzz_roundtrip_and_ranges():
    rng = np.random.default_rng(77)
    for trial in range(40):
        n = int(rng.integers(1, 1200))
        ncols = int(rng.integers(1, 4))
        t = pa.table({f"c{j}": _rand_array(rng, n) for j in range(ncols)})
        blob = encode_chunk(t, EncodeOptions(compression_level=1))
        back = decode_chunk(blob)
        for j in range(ncols):
            assert _eq(
                back.column(f"c{j}").combine_chunks(), t.column(f"c{j}").combine_chunks()
            ), (trial, j, t.column(f"c{j}").type)
        if n > 4:
            a0 = int(rng.integers(0, n - 2))
            b0 = int(rng.integers(a0 + 1, n))
            cols = [f"c{j}" for j in range(ncols) if rng.random() < 0.7] or ["c0"]
            part = decode_chunk(blob, columns=cols, row_ranges=[(a0, b0)])
            assert part.num_rows == b0 - a0
            for c in cols:
                assert _eq(
                    part.column(c).combine_chunks(),
                    t.column(c).slice(a0, b0 - a0).combine_chunks(),
                ), (trial, c)
