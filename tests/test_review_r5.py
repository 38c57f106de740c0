"""Regression pins for the round-5 backbone review findings (encrypted
isnull pruning, null-value SUM semantics, median empty paths, bytes-mode
checksum verification, sort-retry error matching)."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_encrypted_isnull_predicate_not_pruned(ray_session, tmp_path):
    """isnull/notnull predicates on an encrypted column must never prune
    by the fabricated public stats: a keyless masked read returns ALL
    rows (everything masks to null); a keyed read returns exact counts."""
    from orc_ray.chunk import EncodeOptions
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    key = hashlib.sha256(b"t").digest()
    t = pa.table(
        {"id": pa.array(np.arange(3000)),
         "ssn": pa.array([None if i % 5 == 0 else f"s{i}" for i in range(3000)])}
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store,
                   EncodeOptions(encrypt={"ssn": "k"}, encryption_keys={"k": key}),
                   batch_size=500)
    assert decode_dataset(store, predicates=[("ssn", "isnull")]).count() == 3000
    assert decode_dataset(store, predicates=[("ssn", "isnull")], keys={"k": key}).count() == 600
    assert decode_dataset(store, predicates=[("ssn", "notnull")], keys={"k": key}).count() == 2400
    # plain columns keep sharp isnull pruning (nulls=0 recorded)
    assert decode_dataset(store, predicates=[("id", "isnull")]).count() == 0


def test_null_values_in_sum_family(ray_session):
    """SUM-family kernels skip nulls like pc.sum (no NaN->int64 garbage)."""
    import ray

    from orc_ray.functions.aggregates import sum_by_keys, with_prefix_sum

    t = pa.table(
        {"k": pa.array(["a", "a", "b", "b", "b"]),
         "o": pa.array([1, 2, 1, 2, 3]),
         "v": pa.array([1, None, 2, None, 5], pa.int64())}
    )
    out = pa.concat_tables(
        list(sum_by_keys(ray.data.from_arrow(t), ["k"], "v", out="s")
             .iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("k")
    assert out.column("s").to_pylist() == [1, 7]
    sc = pa.concat_tables(
        list(with_prefix_sum(ray.data.from_arrow(t), ["k", "o"], "v")
             .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert sorted(sc.column("cum_prev").to_pylist()) == [0, 1, 1, 3, 3]


def test_cummin_refuses_null_values(ray_session):
    """MIN has no fill identity: a null value in the scanned column fails
    loudly instead of producing garbage (callers pre-fill sentinels)."""
    import ray

    from orc_ray.functions.aggregates import with_group_cummin

    t = pa.table({"k": pa.array(["a", "a"]), "o": pa.array([1, 2]),
                  "v": pa.array([3, None], pa.int64())})
    with pytest.raises(Exception, match="null values"):
        pa.concat_tables(
            list(with_group_cummin(ray.data.from_arrow(t), ["k"], ["o"], "v")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
        )


def test_group_median_all_null_groups(ray_session):
    """Every group's values null -> empty typed result, not a concat crash."""
    import ray

    from orc_ray.functions.aggregates import group_median_disc

    t = pa.table({"k": pa.array(["a", "b"]),
                  "o": pa.array([1, 2]),
                  "v": pa.array([None, None], pa.int64())})
    out = group_median_disc(ray.data.from_arrow(t), "k", "v", "o",
                            emit_null_groups=False)
    assert out.num_rows == 0
    assert set(out.column_names) == {"k", "v"}


def test_bytes_mode_checksum_verification(ray_session, tmp_path):
    """Bytes-mode decode input verifies against a chunk_id column; without
    one, verify_checksums fails loudly instead of silently skipping."""
    import ray

    from orc_ray.chunk import encode_chunk
    from orc_ray.pipeline.decode import _DecodeChunks

    t = pa.table({"x": pa.array(np.arange(100))})
    blob = encode_chunk(t)
    cid = hashlib.sha256(blob).hexdigest()[:24]
    dec = _DecodeChunks(None, None, None, True, None, False, "raise")
    batch = pa.table({"bytes": pa.array([blob], pa.large_binary()),
                      "chunk_id": pa.array([cid])})
    out = dec(batch)
    assert out.num_rows == 100
    # tampered blob fails
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(IOError, match="checksum"):
        dec(pa.table({"bytes": pa.array([bytes(bad)], pa.large_binary()),
                      "chunk_id": pa.array([cid])}))
    # no chunk_id column -> loud refusal, not silent skip
    with pytest.raises(ValueError, match="chunk_id"):
        dec(pa.table({"bytes": pa.array([blob], pa.large_binary())}))
