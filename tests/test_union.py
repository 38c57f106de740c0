"""Union column support — the UnionColumnWriter/Reader analog
(apache/orc c++/src/ColumnWriter.cc ~1700: tag stream + per-child offsets
+ recursive children).  Unreachable from parquet input, but reachable
through the engine's ``ds=`` Dataset encode path and the chunk API."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.chunk import decode_chunk, encode_chunk, read_chunk_header


def _dense_union(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2, n).astype(np.int8)
    n0, n1 = int((codes == 0).sum()), int((codes == 1).sum())
    offs = np.zeros(n, np.int32)
    offs[codes == 0] = np.arange(n0, dtype=np.int32)
    offs[codes == 1] = np.arange(n1, dtype=np.int32)
    ints = pa.array(rng.integers(0, 10**6, n0), pa.int64())
    strs = pa.array([f"s{i}" for i in range(n1)])
    return pa.UnionArray.from_dense(
        pa.array(codes, pa.int8()), pa.array(offs, pa.int32()), [ints, strs], ["i", "s"], [0, 1]
    )


def _sparse_union(n=2000, seed=6):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2, n).astype(np.int8)
    ints = pa.array(rng.integers(0, 10**6, n), pa.int64())
    floats = pa.array(rng.uniform(size=n), pa.float64())
    return pa.UnionArray.from_sparse(
        pa.array(codes, pa.int8()), [ints, floats], ["i", "f"], [0, 1]
    )


def test_dense_union_roundtrip():
    u = _dense_union()
    t = pa.table({"u": u, "k": pa.array(np.arange(len(u)))})
    blob = encode_chunk(t)
    hdr = read_chunk_header(blob)
    assert {c["name"]: c["codec"] for c in hdr["columns"]}["u"] == "union"
    got = decode_chunk(blob)
    assert got.column("u").combine_chunks().equals(u)
    # projection away from the union still works
    assert decode_chunk(blob, columns=["k"]).num_rows == len(u)


def test_sparse_union_roundtrip():
    u = _sparse_union()
    t = pa.table({"u": u})
    got = decode_chunk(encode_chunk(t))
    assert got.column("u").combine_chunks().equals(u)


def test_union_with_null_children():
    codes = pa.array(np.array([0, 1, 0, 1], np.int8), pa.int8())
    offs = pa.array(np.array([0, 0, 1, 1], np.int32), pa.int32())
    ints = pa.array([7, None], pa.int64())  # nulls live in the children
    strs = pa.array(["a", None])
    u = pa.UnionArray.from_dense(codes, offs, [ints, strs], ["i", "s"], [0, 1])
    got = decode_chunk(encode_chunk(pa.table({"u": u})))
    assert got.column("u").combine_chunks().equals(u)


def test_union_through_dataset_pipeline(tmp_path, ray_session):
    import ray

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    u = _dense_union(1000)
    t = pa.table({"id": pa.array(np.arange(1000)), "u": u})
    out = str(tmp_path / "ustore")
    encode_dataset(None, out, ds=ray.data.from_arrow(t), batch_size=300)
    got = pa.concat_tables(
        list(decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("id")
    assert got.num_rows == 1000
    # compare per-row values (chunk boundaries re-slice the union)
    assert got.column("u").to_pylist() == t.column("u").to_pylist()
