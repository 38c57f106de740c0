"""IS NULL / IS NOT NULL predicate leaves with null-count stats pruning
(ORC PredicateLeaf IS_NULL + hasNull analog) and the orc-tools `merge`
analog over content-addressed stores."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from orc_ray.pipeline.decode import NO, YES, MAYBE, _truth, decode_dataset, list_chunks
from orc_ray.pipeline.encode import encode_dataset
from orc_ray.state.manifest import merge_stores


def test_truth_isnull_leaves():
    assert _truth({"x": {"n": 10, "nulls": 0}}, ("x", "isnull")) == NO
    assert _truth({"x": {"n": 10, "nulls": 10}}, ("x", "isnull")) == YES
    assert _truth({"x": {"n": 10, "nulls": 3}}, ("x", "isnull")) == MAYBE
    assert _truth({"x": {"n": 10, "nulls": 0}}, ("x", "notnull")) == YES
    assert _truth({"x": {"n": 10, "nulls": 10}}, ("x", "notnull")) == NO
    assert _truth({"x": {"min": 1, "max": 2}}, ("x", "isnull")) == MAYBE  # no counts


def _write(tmp_path, name, table):
    p = tmp_path / f"{name}.parquet"
    pq.write_table(table, p)
    return str(p)


def test_isnull_pruning_end_to_end(tmp_path, ray_session):
    n = 4000
    # file A: no nulls; file B: half null
    a = pa.table({"id": pa.array(np.arange(n)), "v": pa.array(np.arange(n, dtype=np.float64))})
    vals = pa.array(np.arange(n, dtype=np.float64)).take(
        pa.array(np.arange(n), mask=(np.arange(n) % 2 == 0))
    )
    b = pa.table({"id": pa.array(np.arange(n, 2 * n)), "v": vals})
    src_a, src_b = _write(tmp_path, "a", a), _write(tmp_path, "b", b)
    out = str(tmp_path / "store")
    encode_dataset([src_a, src_b], out, batch_size=n)
    # isnull: the all-valid chunk is pruned at the manifest
    _, kept, total = list_chunks(out, [("v", "isnull")])
    assert (kept, total) == (1, 2)
    ds = decode_dataset(out, predicates=[("v", "isnull")])
    got = pa.concat_tables(
        [x for x in ds.iter_batches(batch_format="pyarrow", batch_size=None) if x.num_rows]
    )
    assert got.num_rows == n // 2
    assert got.column("v").null_count == n // 2
    # notnull keeps both chunks but filters exactly
    ds2 = decode_dataset(out, predicates=[("v", "notnull")])
    got2 = pa.concat_tables(
        [x for x in ds2.iter_batches(batch_format="pyarrow", batch_size=None) if x.num_rows]
    )
    assert got2.num_rows == n + n // 2 and got2.column("v").null_count == 0


def test_merge_stores(tmp_path, ray_session):
    n = 3000
    t1 = pa.table({"id": pa.array(np.arange(n)), "s": pa.array([f"x{i}" for i in range(n)])})
    t2 = pa.table({"id": pa.array(np.arange(n, 2 * n)), "s": pa.array([f"y{i}" for i in range(n)])})
    s1, s2 = _write(tmp_path, "one", t1), _write(tmp_path, "two", t2)
    st1, st2 = str(tmp_path / "st1"), str(tmp_path / "st2")
    encode_dataset(s1, st1)
    encode_dataset(s2, st2)
    out = str(tmp_path / "merged")
    rec = merge_stores(out, [st1, st2])
    assert rec["totals"]["rows"] == 2 * n and rec["totals"]["committed_files"] == 2
    got = pa.concat_tables(
        list(decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("id")
    exp = pa.concat_tables([t1, t2]).sort_by("id")
    assert got.equals(exp)
    # merging a store with itself dedups (content-addressed chunk ids)
    out2 = str(tmp_path / "merged2")
    rec2 = merge_stores(out2, [st1, st1])
    assert rec2["totals"]["rows"] == n


def test_sort_store_tightens_pruning(tmp_path, ray_session):
    """After sort_store on a key, a range predicate prunes most chunks;
    on the unsorted store (random key order) it prunes none."""
    from orc_ray.pipeline.encode import sort_store

    n = 8000
    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "k": pa.array(rng.permutation(n)),  # random order
            "p": pa.array(rng.uniform(size=n)),
        }
    )
    src = _write(tmp_path, "rnd", t)
    st = str(tmp_path / "unsorted")
    encode_dataset(src, st, batch_size=1000)
    pred = [("k", "<", 500)]
    _, kept_u, total_u = list_chunks(st, pred)
    assert kept_u == total_u == 8  # random order: every chunk may match
    st2 = str(tmp_path / "sorted")
    sort_store(st, st2, "k", batch_size=1000)
    _, kept_s, total_s = list_chunks(st2, pred)
    assert total_s >= 8 and kept_s <= 2  # sorted: only the head chunk(s)
    ds = decode_dataset(st2, predicates=pred)
    got = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    )
    assert got.num_rows == 500
    assert sorted(got.column("k").to_pylist()) == list(range(500))


def test_sort_store_rerun_and_merge_refuse_foreign(tmp_path, ray_session):
    import pytest as _pytest

    from orc_ray.pipeline.encode import sort_store

    t = pa.table({"k": pa.array(np.arange(500))})
    src = _write(tmp_path, "t", t)
    st = str(tmp_path / "st")
    encode_dataset(src, st)
    out = str(tmp_path / "sorted")
    sort_store(st, out, "k")
    rec = sort_store(st, out, "k")  # re-run must not double-count
    assert rec["totals"]["rows"] == 500
    # merge into a dir already holding an encoded store refuses loudly
    with _pytest.raises(FileExistsError):
        merge_stores(st, [out])


def test_checksum_verification_detects_corruption(tmp_path, ray_session):
    import glob as _glob
    import os

    t = pa.table({"v": pa.array(np.arange(2000))})
    src = _write(tmp_path, "c", t)
    st = str(tmp_path / "cstore")
    encode_dataset(src, st)
    # clean store passes with verification on
    ds = decode_dataset(st, verify_checksums=True)
    n = sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert n == 2000
    # flip one byte mid-payload -> verified decode fails loudly
    chunk = sorted(_glob.glob(os.path.join(st, "chunks", "*.oray")))[0]
    blob = bytearray(open(chunk, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(chunk, "wb").write(bytes(blob))
    import pytest as _pytest
    import ray.exceptions

    ds2 = decode_dataset(st, verify_checksums=True)
    with _pytest.raises(Exception) as ei:
        list(ds2.iter_batches(batch_format="pyarrow", batch_size=None))
    assert "checksum" in str(ei.value)
