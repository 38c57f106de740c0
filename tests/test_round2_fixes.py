"""Round-2 regression tests for the r1 ADVICE findings: map-null decode,
uint64 logical-domain stats/bloom, missing-predicate-column error, and
resume across a batch_size change (stale unit parts)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import decode_chunk, encode_chunk, read_chunk_header
from orc_ray.codecs import bloom
from orc_ray.fixtures import write_f1_parquet
from orc_ray.pipeline.decode import NO, _truth, decode_dataset
from orc_ray.pipeline.encode import encode_dataset
from orc_ray.state import manifest as mstate


def _roundtrip(t: pa.Table) -> pa.Table:
    out = decode_chunk(encode_chunk(t))
    assert out.num_rows == t.num_rows
    for name in t.column_names:
        a, b = t.column(name).combine_chunks(), out.column(name).combine_chunks()
        assert a.equals(b), f"column {name} mismatch"
    return out


def test_map_with_nulls_roundtrip():
    """ADVICE r1 (high): nullable map columns crashed on decode
    (pc.if_else has no map kernel) — null reinsertion now uses take."""
    t = pa.table(
        {
            "mp": pa.array(
                [[("a", 1), ("b", 2)], None, [], [("c", 3)], None],
                pa.map_(pa.string(), pa.int64()),
            ),
            "lst": pa.array([[1, 2], None, [], [3], None], pa.list_(pa.int32())),
            "st": pa.array(
                [{"x": 1}, None, {"x": 3}, None, {"x": 5}],
                pa.struct([("x", pa.int64())]),
            ),
        }
    )
    _roundtrip(t)


def test_uint64_stats_logical_domain():
    """ADVICE r1 (high): uint64 >= 2**63 must not record negative min/max
    (which made equality predicates prune matching chunks)."""
    big = np.array([2**63 + 5, 2**63 + 9, 2**64 - 1], dtype=np.uint64)
    t = pa.table({"u": pa.array(big, pa.uint64())})
    hdr = read_chunk_header(encode_chunk(t))
    meta = hdr["columns"][0]
    assert meta["min"] == 2**63 + 5
    assert meta["max"] == 2**64 - 1
    # the equality predicate that previously mis-pruned:
    stats = {"u": {"min": meta["min"], "max": meta["max"]}}
    assert _truth(stats, ("u", "==", 2**63 + 9)) != NO
    # and the round-trip itself stays bit-identical
    _roundtrip(t)


def test_bloom_uint64_large_values():
    arr = pa.array(np.array([2**63 + 1, 7, 2**64 - 2], dtype=np.uint64), pa.uint64())
    f = bloom.build(arr)
    assert bloom.might_contain(f, 2**63 + 1)
    assert bloom.might_contain(f, 7)
    # signed columns keep working and match negative literals bit-wise
    f2 = bloom.build(pa.array([-1, -5, 3], pa.int64()))
    assert bloom.might_contain(f2, -5)


def test_uint64_predicate_through_pipeline(ray_session, tmp_path):
    """The exact-filter path: pa.scalar(int >= 2**63) overflows int64
    inference — literals must be typed to the unsigned column."""
    src = str(tmp_path / "u64.parquet")
    t = pa.table(
        {
            "id": pa.array(range(1000), pa.int64()),
            "u": pa.array(np.arange(2**63, 2**63 + 1000, dtype=np.uint64), pa.uint64()),
        }
    )
    pq.write_table(t, src)
    out = str(tmp_path / "store")
    encode_dataset([src], out, batch_size=300)
    got = pa.concat_tables(
        p
        for p in decode_dataset(out, predicates=[("u", "==", 2**63 + 700)]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if p.num_rows
    )
    assert got.num_rows == 1
    assert got.column("id")[0].as_py() == 700


def test_missing_predicate_column_raises(ray_session, tmp_path):
    """ADVICE r1 (low): a typo'd predicate column must fail loudly, not
    silently return the unfiltered dataset."""
    src = str(tmp_path / "src")
    write_f1_parquet(src, 300, n_files=1)
    out = str(tmp_path / "store")
    encode_dataset(src, out, batch_size=200)
    ds = decode_dataset(out, predicates=[("n_tokk", ">", 10)])  # typo
    with pytest.raises(Exception) as ei:
        ds.count()
    assert "n_tokk" in str(ei.value)


def test_resume_across_batch_size_change(ray_session, tmp_path):
    """ADVICE r1 (medium): resuming with a different batch_size changes the
    unit plan; stale unit manifest parts must be dropped or the per-file
    row sums exceed the parquet metadata and commit loops forever."""
    src = str(tmp_path / "src")
    paths = write_f1_parquet(src, 3000, n_files=3)
    out = str(tmp_path / "store")
    # interrupted run at batch_size=500 over the first file only
    encode_dataset(paths[:1], out, batch_size=500)
    assert len(mstate.load_committed(out)["files"]) == 1
    # simulate a partially-written second file: encode it, then un-commit it
    encode_dataset(paths[:2], out, batch_size=500, resume=True)
    rec = mstate.load_committed(out)
    rec["files"].pop(paths[1])
    import json

    with open(mstate.committed_path(out), "w") as f:
        json.dump(rec, f)
    # resume the full input at a DIFFERENT batch size
    rec2 = encode_dataset(paths, out, batch_size=300, resume=True)
    assert rec2["totals"]["committed_files"] == 3
    assert rec2["totals"]["rows"] == 3000
    got = pa.concat_tables(
        decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    exp = pa.concat_tables([pq.read_table(p) for p in paths]).sort_by("doc_id")
    assert got.combine_chunks().equals(exp.combine_chunks())
    # and a further resume is a no-op
    rec3 = encode_dataset(paths, out, batch_size=300, resume=True)
    assert rec3["totals"]["rows"] == 3000


def test_vacuum_orphans(tmp_path):
    out = str(tmp_path / "store")
    os.makedirs(mstate.chunk_dir(out), exist_ok=True)
    os.makedirs(mstate.manifest_dir(out), exist_ok=True)
    with open(os.path.join(mstate.chunk_dir(out), "deadbeef.oray"), "wb") as f:
        f.write(b"x")
    assert mstate.vacuum_orphans(out) == 1
    assert not os.listdir(mstate.chunk_dir(out))
