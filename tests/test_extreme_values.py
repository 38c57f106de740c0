"""Extreme-value conformance through the full encode/decode stack.

int64 endpoints, ±inf / NaN / -0.0 / denormal doubles, epoch-edge
timestamps (year 1 and 9999), NUL-bearing and 10 kB strings, and
0x00/0xFF binary blobs must survive the chunk store bit-exactly.
Comparison is bitwise (Arrow's Array.equals is NaN != NaN, which would
mask nothing here but fails spuriously on the NaN row).
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _table() -> pa.Table:
    return pa.table({
        "i": pa.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0, -1, 1,
                       None, 42, -9999999999999], pa.int64()),
        "f": pa.array([float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
                       None, 1e308, 5e-324], pa.float64()),
        "s": pa.array(["", None, "\x00\x01", "a" * 10000, "é \U0001F600",
                       "normal", "\n\t", "x"], pa.string()),
        "ts": pa.array([0, None, -62135596800000000, 253402300799000000, 1,
                        -1, 86400000000, 1700000000000000], pa.timestamp("us")),
        "b": pa.array([b"", None, b"\x00" * 100, b"\xff" * 100, b"abc",
                       b"\x80", b"q", b"z"], pa.binary()),
    })


def test_extreme_values_roundtrip_bit_exact(ray_session, tmp_path):
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    src_path = str(tmp_path / "extreme.parquet")
    store = str(tmp_path / "store")
    t = _table()
    pq.write_table(t, src_path)
    shutil.rmtree(store, ignore_errors=True)
    encode_dataset([src_path], store)
    out = pa.concat_tables(
        list(decode_dataset(store).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert out.num_rows == t.num_rows
    for col in t.column_names:
        a = t.column(col).combine_chunks()
        b = out.column(col).combine_chunks()
        assert a.is_valid().equals(b.is_valid()), col
        if pa.types.is_floating(a.type):
            av = a.to_numpy(zero_copy_only=False).view(np.uint64)
            bv = b.to_numpy(zero_copy_only=False).view(np.uint64)
            valid = a.is_valid().to_numpy(zero_copy_only=False)
            assert (av[valid] == bv[valid]).all(), col
        else:
            assert a.cast(b.type).drop_null().equals(b.drop_null()), col


def test_nan_inf_stats_never_false_prune(ray_session, tmp_path):
    """Chunk/stride min-max pruning over a float column CONTAINING NaN and
    ±inf must stay conservative (a NaN-poisoned stat comparing False must
    KEEP the chunk, never drop it), and the row-level filter must treat
    NaN like SQL (every comparison False)."""
    import pyarrow.parquet as _pq

    from orc_ray.pipeline.decode import decode_dataset, list_chunks
    from orc_ray.pipeline.encode import encode_dataset

    rng = np.random.default_rng(3)
    v = rng.normal(0, 100, 4000)
    v[::97] = np.nan
    v[5], v[13] = np.inf, -np.inf
    src = str(tmp_path / "nan.parquet")
    store = str(tmp_path / "store")
    _pq.write_table(pa.table({"k": np.arange(4000, dtype=np.int64), "v": v}), src)
    encode_dataset([src], store, batch_size=500)

    ops = {"<=": np.less_equal, ">": np.greater, ">=": np.greater_equal}
    for pred in [("v", ">", 50.0), ("v", "<=", -150.0), ("v", ">=", 0.0)]:
        _, kept, total = list_chunks(store, [pred])
        out = pa.concat_tables(list(
            decode_dataset(store, predicates=[pred]).iter_batches(
                batch_format="pyarrow", batch_size=None)
        ))
        with np.errstate(invalid="ignore"):
            want = int(ops[pred[1]](v, pred[2]).sum())
        assert out.num_rows == want, (pred, kept, total, out.num_rows, want)
