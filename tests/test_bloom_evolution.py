"""Bloom-filter membership pruning (BloomFilterUtf8/SargsApplier analog)
and read-time schema evolution (SchemaEvolution/ConvertColumnReader analog)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import EncodeOptions
from orc_ray.codecs import bloom
from orc_ray.fixtures import write_f1_parquet
from orc_ray.pipeline.decode import decode_dataset, list_chunks
from orc_ray.pipeline.encode import encode_dataset


def test_bloom_basics_int_and_string():
    arr = pa.array([1, 5, 99, 12345, -7])
    f = bloom.build(arr)
    for v in [1, 5, 99, 12345, -7]:
        assert bloom.might_contain(f, v)
    absent = sum(bloom.might_contain(f, v) for v in range(1000, 2000))
    assert absent < 100  # fpp well under 10%

    sarr = pa.array([f"doc-{i:08d}" for i in range(5000)])
    f = bloom.build(sarr)
    assert bloom.might_contain(f, "doc-00000042")
    misses = sum(bloom.might_contain(f, f"zz-{i}") for i in range(1000))
    assert misses < 120


def test_bloom_pruning_in_pipeline(ray_session, tmp_path):
    src = str(tmp_path / "in")
    write_f1_parquet(src, 4000, n_files=4)
    out = str(tmp_path / "store")
    opts = EncodeOptions(bloom_columns=("doc_id",))
    encode_dataset(src, out, opts, batch_size=500)
    # equality on a doc_id that exists in exactly one chunk
    target = "doc-0000000000001234"
    _, kept, total = list_chunks(out, predicates=[("doc_id", "==", target)])
    assert total >= 8
    assert kept < total  # bloom skipped chunks without the key
    got = list(
        decode_dataset(out, predicates=[("doc_id", "==", target)]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    rows = pa.concat_tables(got)
    assert rows.num_rows == 1
    assert rows.column("doc_id")[0].as_py() == target
    # absent key -> (almost) all chunks pruned; a few false positives are
    # inherent to the fpp target
    _, kept0, total0 = list_chunks(out, predicates=[("doc_id", "==", "nope-123")])
    assert kept0 <= max(1, total0 // 4)


def test_schema_evolution_cast(ray_session, tmp_path):
    src = str(tmp_path / "in")
    paths = write_f1_parquet(src, 500, n_files=1)
    out = str(tmp_path / "store")
    encode_dataset(src, out, batch_size=250)
    ds = decode_dataset(
        out,
        columns=["doc_id", "n_tok"],
        cast_schema={"n_tok": pa.int64()},  # numeric widening int32 -> int64
    )
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert t.schema.field("n_tok").type == pa.int64()
    exp = pq.read_table(paths[0], columns=["doc_id", "n_tok"])
    # decoded chunk order is arbitrary (content-addressed files): sort by key
    t = t.sort_by("doc_id")
    exp = exp.sort_by("doc_id")
    assert t.column("n_tok").combine_chunks().cast(pa.int32()).equals(
        exp.column("n_tok").combine_chunks()
    )
    # string -> numeric style conversion: n_tok to string
    ds2 = decode_dataset(out, columns=["n_tok"], cast_schema={"n_tok": pa.string()})
    t2 = pa.concat_tables(list(ds2.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert t2.schema.field("n_tok").type == pa.string()
