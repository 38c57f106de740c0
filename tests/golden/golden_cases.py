"""Golden-corpus case definitions: deterministic fixture tables + pinned
encode options.  The analog of the reference's checked-in ``examples/*.orc``
+ ``examples/expected/*.jsn.gz`` conformance suite (SURVEY.md §5 level 3):
the committed chunk blobs pin the on-disk format — any codec edit that
changes bytes or decoded values within a FORMAT_VERSION fails the test.

Regenerate (ONLY on a deliberate format bump) with:
    python tests/golden/gen_golden.py
"""

from __future__ import annotations

import datetime
import decimal
import hashlib

import numpy as np
import pyarrow as pa

from orc_ray.chunk import EncodeOptions


def _ints_table() -> pa.Table:
    rng = np.random.default_rng(1234)
    n = 5000
    outliers = np.arange(0, 100, dtype=np.int64).repeat(50)
    outliers[::97] = 1 << 45  # patched-base shape (probe [P4])
    return pa.table(
        {
            "monotonic": pa.array(np.arange(n, dtype=np.int64)),  # DELTA
            "random64": pa.array(rng.integers(-(1 << 60), 1 << 60, n)),  # DIRECT
            "narrow": pa.array(rng.integers(0, 16, n).astype(np.int32)),
            "patched": pa.array(outliers),  # PATCHED_BASE
            "const": pa.array(np.full(n, 42, dtype=np.int64)),  # RLE const
            "short_rep": pa.array(np.repeat(rng.integers(0, 9, n // 5), 5)),
            "u64": pa.array(rng.integers(0, 1 << 63, n).astype(np.uint64) * 2, pa.uint64()),
            "i8": pa.array(rng.integers(-128, 128, n).astype(np.int8)),
        }
    )


def _strings_table() -> pa.Table:
    rng = np.random.default_rng(99)
    n = 4000
    lowcard = [f"cat-{i % 7}" for i in range(n)]
    highcard = [f"id-{rng.integers(0, 1 << 48):012x}-{i}" for i in range(n)]
    fsst = [
        f"https://example.com/path/{'ab' * int(rng.integers(1, 6))}/item{i % 100}"
        for i in range(n)
    ]
    nullable = [None if i % 11 == 0 else f"v{i % 13}" for i in range(n)]
    return pa.table(
        {
            "lowcard": pa.array(lowcard),     # DICTIONARY_V2 analog
            "highcard": pa.array(highcard),   # DIRECT_V2 analog
            "shared": pa.array(fsst),         # FSST candidate
            "nullable": pa.array(nullable),   # PRESENT stream analog
        }
    )


def _temporal_decimal_table() -> pa.Table:
    n = 3000
    base = 1_420_070_400_000_000  # 2015-01-01 epoch us (ORC BASE_TIMESTAMP)
    ts = base + np.arange(n, dtype=np.int64) * 1_000_000 + (np.arange(n) % 3) * 250_000
    dates = np.arange(16000, 16000 + n, dtype=np.int32)
    dec = [decimal.Decimal(int(v)) / 100 for v in range(-n // 2, n - n // 2)]
    wide = [
        # genuinely >64-bit unscaled magnitudes -> the dec128 word-pair codec
        decimal.Decimal(int(v) * (10**25 if v % 7 == 0 else 1)) / 100
        for v in range(-n // 2, n - n // 2)
    ]
    return pa.table(
        {
            "ts_us": pa.array(ts, pa.timestamp("us")),
            "d32": pa.array(dates, pa.date32()),
            "dec64": pa.array(dec, pa.decimal128(18, 2)),
            "dec_wide": pa.array(wide, pa.decimal128(38, 2)),
        }
    )


def _nested_table() -> pa.Table:
    rng = np.random.default_rng(7)
    n = 2000
    lens = rng.integers(0, 30, n)
    offs = np.zeros(n + 1, np.int32)
    np.cumsum(lens, out=offs[1:])
    flat = rng.integers(0, 50257, int(offs[-1])).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offs), pa.array(flat))
    structs = pa.StructArray.from_arrays(
        [pa.array(rng.integers(0, 100, n)), pa.array([f"s{i % 5}" for i in range(n)])],
        names=["a", "b"],
    )
    bools = pa.array((np.arange(n) % 3 == 0))
    floats = pa.array(rng.normal(size=n).astype(np.float32))
    doubles = pa.array(rng.normal(size=n))
    binary = pa.array([bytes([i % 256]) * (i % 17) for i in range(n)], pa.binary())
    return pa.table(
        {
            "tokens": tokens,
            "rec": structs,
            "flag": bools,
            "f32": floats,
            "f64": doubles,
            "payload": binary,
        }
    )


# fixed demo key: golden fixtures pin FORMAT bytes, not secrecy
GOLDEN_MASTER_KEY = hashlib.sha256(b"orc-ray-golden-master").digest()


def _encrypted_table() -> pa.Table:
    rng = np.random.default_rng(41)
    n = 1500
    return pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "secret": pa.array(
                [None if i % 13 == 0 else f"Body {i} with PIN {i * 7 % 10000}" for i in range(n)]
            ),
            "balance": pa.array(rng.integers(-(1 << 40), 1 << 40, n)),
        }
    )


def _ints_shuf_table() -> pa.Table:
    """>= _SHUF_MIN_N values per stream: pins the byte-shuffled (SHUF)
    block layouts introduced in format v5 — Zipf tokens (the north-star
    shape), a uniform 17-bit lane, and a tail block crossing shuffled and
    narrow (non-shuffled) groups."""
    rng = np.random.default_rng(2025)
    n = (1 << 16) + 300  # tail block included
    return pa.table(
        {
            "zipf32": pa.array((rng.zipf(1.3, n) % 50257).astype(np.int32)),
            "uni17": pa.array(rng.integers(0, 1 << 17, n).astype(np.int32)),
            "mixed64": pa.array(
                np.where(rng.random(n) < 0.3, rng.integers(0, 50, n), rng.integers(0, 1 << 40, n))
            ),
        }
    )


def _floats_shuf_table() -> pa.Table:
    """Pins the rawsh (byte-plane shuffled raw float) lane added in
    format v5: unit-norm float32 embedding values and wide float64
    gaussians, both over the probe floor, plus a sub-floor plain-raw
    column so the selection boundary is pinned too."""
    rng = np.random.default_rng(77)
    n = 6000
    vecs = rng.standard_normal(n).astype(np.float32)
    vecs /= np.abs(vecs).max()
    g64 = rng.standard_normal(n) * 1e10
    g64[8] = float("inf")  # NaN stays out: Table.equals is the gen sanity
    g64[9] = -1e-310       # subnormal; NaN roundtrip is pinned in test_chunk
    gvals = rng.standard_normal(n)
    nul = [None if i % 13 == 0 else float(gvals[i]) for i in range(n)]  # rawsh + PRESENT
    prices = np.round(rng.uniform(0, 1000, n), 2)  # fdec wins over rawsh
    return pa.table(
        {
            "emb32": pa.array(vecs),
            "g64": pa.array(g64),
            "nul64": pa.array(nul, pa.float64()),
            "price": pa.array(prices),
        }
    )


CASES: dict[str, tuple] = {
    # name -> (table builder, EncodeOptions)
    "ints_zstd1": (_ints_table, EncodeOptions()),
    "ints_shuf": (_ints_shuf_table, EncodeOptions()),
    "floats_shuf": (_floats_shuf_table, EncodeOptions()),
    "ints_lz4": (_ints_table, EncodeOptions(compression="lz4", compression_level=None)),
    "strings_zstd1": (_strings_table, EncodeOptions()),
    "strings_plain": (_strings_table, EncodeOptions(compression="none")),
    "temporal_decimal": (_temporal_decimal_table, EncodeOptions()),
    "nested": (_nested_table, EncodeOptions()),
    # v0.11 (RLEv1-analog) integer streams: pins the old-file-version
    # layout bytes so the v1 run/literal decomposition can't drift
    "ints_v011": (_ints_table, EncodeOptions(file_version="0.11")),
    "encrypted_dual": (
        _encrypted_table,
        EncodeOptions(
            encrypt={"secret": "k", "balance": "k"},
            encryption_keys={"k": GOLDEN_MASTER_KEY},
            encryption_masks={"secret": "redact"},
        ),
    ),
}

# cases whose blobs carry encrypted columns: {case -> decode keys}.  The
# committed NAME.json pins the KEYLESS (masked public) view; NAME.keyed.json
# pins the exact plaintext recovered with these keys.
CASE_KEYS: dict[str, dict] = {"encrypted_dual": {"k": GOLDEN_MASTER_KEY}}


def canon_val(v):
    """JSON-safe canonical value: floats as bit-exact hex, bytes as hex,
    temporals as ISO strings, decimals as strings; recursive for nested."""
    if isinstance(v, bool) or v is None or isinstance(v, (int, str)):
        return v
    if isinstance(v, float):
        return float(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dict):
        return {str(k): canon_val(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [canon_val(x) for x in v]
    if isinstance(v, np.generic):
        return canon_val(v.item())
    raise TypeError(f"unhandled golden value type {type(v)}")


def canon_table(t: pa.Table) -> dict:
    out = {}
    for name in t.column_names:
        col = t.column(name)
        if pa.types.is_float32(col.type):
            # to_pylist would widen f32 to double; hex the f32 bit pattern
            out[name] = [
                None if x is None else np.float32(x).item().hex()
                for x in col.to_pylist()
            ]
        else:
            out[name] = [canon_val(v) for v in col.to_pylist()]
    return out
