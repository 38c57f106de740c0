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


def test_bloom_vectorized_probe_matches_scalar():
    arr = pa.array([3, 17, 999, 2**40, -5])
    f = bloom.build(arr)
    probe = pa.array(list(range(50)) + [2**40, -5, None])
    mask = bloom.might_contain_many(f, probe)
    for i, v in enumerate(probe):
        if v.as_py() is None:
            assert not mask[i]  # null key matches nothing
        else:
            assert mask[i] == bloom.might_contain(f, v.as_py())

    sarr = pa.array([f"doc-{i}" for i in range(100)])
    fs = bloom.build(sarr)
    sp = pa.array(["doc-7", "nope", "doc-99", "zz"])
    ms = bloom.might_contain_many(fs, sp)
    assert list(ms) == [bloom.might_contain(fs, v.as_py()) for v in sp]


def test_bloom_fixed_geometry_merge_equals_single_build():
    import numpy as np

    a = pa.array(np.arange(0, 500, dtype=np.int64))
    b = pa.array(np.arange(500, 1000, dtype=np.int64))
    m, k = bloom._params(1000, 0.01)
    merged = bloom.merge([bloom.build(a, m=m, k=k), bloom.build(b, m=m, k=k)])
    single = bloom.build(pa.array(np.arange(1000, dtype=np.int64)), m=m, k=k)
    assert merged == single  # OR of partials == one-shot build
    probe = pa.array(np.arange(0, 2000, dtype=np.int64))
    mask = bloom.might_contain_many(merged, probe)
    assert mask[:1000].all()  # zero false negatives
    assert mask[1000:].mean() < 0.05  # fpp holds after merge


def test_bloom_join_prunes_and_is_exact(ray_session):
    """q_bloom_join: bloom keeps ~sel+fpp of the probe side; result is
    exact vs a direct duckdb join."""
    import duckdb

    from orc_ray.queries import ORACLE_SQL, q_bloom_join

    sf = "/root/testdata/sf0.001"
    stats = {}
    t = q_bloom_join(sf, stats_out=stats).to_pandas()
    assert stats["rows_after_bloom"] < stats["rows_in"] * 0.25  # pruning engaged
    con = duckdb.connect()
    for tb in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{sf}/{tb}.parquet')")
    o = con.execute(ORACLE_SQL["bloom_join"]).df()
    pd_t = t.sort_values("o_orderpriority").reset_index(drop=True)
    pd_o = o.sort_values("o_orderpriority").reset_index(drop=True)
    assert pd_t["rev_e4"].astype("int64").tolist() == pd_o["rev_e4"].astype("int64").tolist()
    assert pd_t["n_items"].astype("int64").tolist() == pd_o["n_items"].astype("int64").tolist()


def test_bloom_large_binary_keys():
    """ADVICE r3: large_binary columns (with nulls) must probe cleanly."""
    import numpy as np

    from orc_ray.codecs import bloom

    keys = pa.array([b"k%d" % i for i in range(100)], pa.large_binary())
    f = bloom.build(keys, fpp=0.01)
    probe = pa.array([b"k1", None, b"absent", b"k99"], pa.large_binary())
    got = bloom.might_contain_many(f, probe)
    assert bool(got[0]) and bool(got[3])
    assert not bool(got[1])  # null matches nothing
