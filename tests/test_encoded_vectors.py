"""Encoded-vector decode (ORC setEncodedVectorAllowed /
EncodedStringVectorBatch analog — apache/orc c++/src/Reader.cc encoded
vector batches): eligible string columns come back dictionary<int32,str>
with NO flat-string expansion for dict-coded chunks; other string codecs
post-encode so the reader schema stays stable across chunks."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.encode import encode_dataset


@pytest.fixture(scope="module")
def ev_store(tmp_path_factory, ray_session):
    rng = np.random.default_rng(11)
    n = 20000
    cat = pa.array(
        [f"cat-{i}" if i % 7 else None for i in rng.integers(0, 30, n)]
    )  # low cardinality + nulls -> dict codec
    txt = pa.array([f"unique text {i}" for i in range(n)])  # high card -> str/fsst
    t = pa.table(
        {
            "k": np.arange(n, dtype=np.int64),
            "cat": cat,
            "txt": txt,
            "v": rng.integers(0, 1000, n),
        }
    )
    src = str(tmp_path_factory.mktemp("evsrc") / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path_factory.mktemp("evstore"))
    encode_dataset([src], out, batch_size=2048)
    return out, t


def _collect(ds) -> pa.Table:
    parts = [p for p in ds.iter_batches(batch_format="pyarrow", batch_size=None) if p.num_rows]
    return pa.concat_tables(parts).combine_chunks()


def test_encoded_roundtrip_and_schema(ev_store):
    out, t = ev_store
    got = _collect(decode_dataset(out, encoded_vectors=True))
    assert pa.types.is_dictionary(got.schema.field("cat").type)
    assert pa.types.is_dictionary(got.schema.field("txt").type)
    assert got.schema.field("cat").type.index_type == pa.int32()
    flat = pa.table(
        {
            "k": got.column("k"),
            "cat": got.column("cat").cast(pa.string()),
            "txt": got.column("txt").cast(pa.string()),
            "v": got.column("v"),
        }
    ).sort_by("k")
    assert flat.equals(t.cast(flat.schema))


def test_encoded_codes_aggregation_matches_flat(ev_store):
    """The encoded-vector consumer idiom: aggregate over int32 codes
    (np.bincount — no string hashing at all), map code -> label once per
    dictionary.  Matches the flat-decode group_by exactly."""
    out, _ = ev_store
    enc = _collect(decode_dataset(out, encoded_vectors=True))
    flat = _collect(decode_dataset(out))

    sums: dict = {}
    darr = enc.column("cat").combine_chunks()
    codes = darr.indices.to_numpy(zero_copy_only=False)
    vals = enc.column("v").to_numpy(zero_copy_only=False)
    labels = darr.dictionary.to_pylist()
    valid = ~np.isnan(codes) if codes.dtype.kind == "f" else darr.indices.is_valid().to_numpy(zero_copy_only=False)
    per_code = np.bincount(
        codes[valid].astype(np.int64), weights=vals[valid], minlength=len(labels)
    )
    n_code = np.bincount(codes[valid].astype(np.int64), minlength=len(labels))
    for c, s in enumerate(per_code):
        if n_code[c]:  # the null-fill "" label stays in the dictionary with 0 uses
            sums[labels[c]] = int(s)
    sums[None] = int(vals[~valid].sum())

    gf = flat.group_by("cat").aggregate([("v", "sum")])
    expect = dict(zip(gf.column("cat").to_pylist(), gf.column("v_sum").to_pylist()))
    assert sums == expect


def test_encoded_predicate_column_stays_flat(ev_store):
    out, t = ev_store
    ds = decode_dataset(out, encoded_vectors=True, predicates=[("cat", "==", "cat-8")])
    got = _collect(ds)
    assert got.schema.field("cat").type == pa.string()  # predicate col excluded
    assert pa.types.is_dictionary(got.schema.field("txt").type)
    exp = t.filter(pc.equal(t.column("cat"), "cat-8"))
    assert got.num_rows == exp.num_rows


def test_encoded_stride_ranges(ev_store):
    """Predicate on k (stride-prunable) + encoded vectors: the dict branch
    takes the decode_ints_ranges path and validity realigns per range."""
    out, t = ev_store
    ds = decode_dataset(out, encoded_vectors=True, predicates=[("k", "<", 700)])
    got = _collect(ds).sort_by("k")
    assert got.num_rows == 700
    exp = t.slice(0, 700)
    assert (
        got.column("cat").cast(pa.string()).to_pylist()
        == exp.column("cat").to_pylist()
    )


def test_encoded_rejects_cast_schema(ev_store):
    out, _ = ev_store
    with pytest.raises(ValueError, match="incompatible"):
        _collect(decode_dataset(out, encoded_vectors=True, cast_schema={"v": pa.int32()}))
