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


# --- round-5 joins/dedup review pins ---------------------------------------

def test_asof_empty_build_and_null_times(ray_session):
    """Empty build side (globally or per hash partition) yields LEFT-join
    nulls, never IndexError; null probe key/time never matches."""
    import ray

    from orc_ray.functions.joins import AsofIndex, asof_join, asof_join_partitioned

    idx = AsofIndex(np.array([], np.int64), np.array([], np.int64))
    i, m = idx.asof(np.array([1, 2]), np.array([10, 20]))
    assert m.tolist() == [False, False]

    probe = pa.table({"k": pa.array([1, 2, 1, None], pa.int64()),
                      "t": pa.array([10, 10, None, 10], pa.int64())})
    out = pa.concat_tables(list(
        asof_join(ray.data.from_arrow(probe), np.array([1], np.int64),
                  np.array([5], np.int64), "k", "t")
        .iter_batches(batch_format="pyarrow", batch_size=None))).sort_by("k")
    vals = dict(zip(out.column("k").to_pylist(), out.column("asof_time").to_pylist()))
    # k=1,t=10 -> 5; k=2 unmatched; null t / null k -> null
    rows = sorted(zip(out.column("k").to_pylist(), out.column("asof_time").to_pylist()),
                  key=lambda r: (r[0] is None, r[0]))
    assert rows == [(1, 5), (1, None), (2, None), (None, None)]

    # partitioned arm: build keys {1}, probe keys {1,2} -> some partitions
    # have probe rows but zero build rows
    build = pa.table({"bk": pa.array([1], pa.int64()), "bt": pa.array([5], pa.int64())})
    out2 = pa.concat_tables(list(
        asof_join_partitioned(ray.data.from_arrow(probe.drop_null()),
                              ray.data.from_arrow(build), "bk", "bt", "k", "t",
                              num_partitions=16)
        .iter_batches(batch_format="pyarrow", batch_size=None))).sort_by("k")
    assert sorted(zip(out2.column("k").to_pylist(), out2.column("asof_time").to_pylist())) \
        == [(1, 5), (2, None)]


def test_semi_anti_string_keys_partitioned_arm(ray_session):
    """String keys must work on BOTH arms (the int64 hash cast crashed
    the partitioned arm the first time it engaged)."""
    import ray

    from orc_ray.functions.joins import join_semi_anti

    big = pa.table({"u": pa.array([f"url{i % 7}" for i in range(200)]),
                    "x": pa.array(np.arange(200))})
    keys = pa.table({"u": pa.array(["url1", "url3"])})
    for thr in (500_000, 0):  # broadcast arm, then forced partitioned arm
        out = pa.concat_tables(list(
            join_semi_anti(ray.data.from_arrow(big), ray.data.from_arrow(keys),
                           "u", "u", threshold_rows=thr)
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        assert sorted(set(out.column("u").to_pylist())) == ["url1", "url3"]
        assert out.num_rows == sum(1 for i in range(200) if i % 7 in (1, 3))


def test_join_adaptive_arm_schema_parity(ray_session):
    """Both arms emit the big side's columns + exactly payload_cols."""
    import ray

    from orc_ray.functions.joins import join_adaptive

    big = pa.table({"k": pa.array([1, 2, 3]), "v": pa.array([10, 20, 30])})
    small = pa.table({"sk": pa.array([1, 2]), "p": pa.array(["a", "b"]),
                      "extra": pa.array([9.0, 8.0])})
    outs = []
    for thr in (10, 0):
        out = pa.concat_tables(list(
            join_adaptive(ray.data.from_arrow(big), ray.data.from_arrow(small),
                          "k", "sk", ["p"], threshold_rows=thr)
            .iter_batches(batch_format="pyarrow", batch_size=None))).sort_by("k")
        outs.append(out)
    assert set(outs[0].column_names) == set(outs[1].column_names) == {"k", "v", "p"}
    assert outs[0].select(["k", "v", "p"]).equals(outs[1].select(["k", "v", "p"]))


def test_simhash_independent_of_batch_neighbors():
    from orc_ray.functions.dedup import _varbytes, simhash64

    def sig(texts):
        concat, offsets = _varbytes(pa.table({"t": pa.array(texts)}).column("t"))
        return simhash64(concat, offsets)

    assert sig(["abcdef", "zzzzzzzz"])[0] == sig(["abcdef", "qqqqqqqq"])[0] == sig(["abcdef"])[0]


def test_bloom_stream_merges_all_partials(ray_session):
    """Multi-row partial-filter blocks must ALL merge (row-0-only dropped
    filters and produced bloom false negatives = silently lost join rows)."""
    import ray

    from orc_ray.codecs import bloom
    from orc_ray.functions.joins import build_bloom_stream

    t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
    # many small blocks force several partials per output block
    ds = ray.data.from_arrow(t).repartition(2).map_batches(
        lambda b: b, batch_size=100, batch_format="pyarrow")
    f = build_bloom_stream(ds, "k", expected_items=5000)
    hits = bloom.might_contain_many(f, pa.array(np.arange(5000, dtype=np.int64)))
    assert bool(np.asarray(hits).all()), "false negatives: partial filters dropped"


# --- round-5 similarity/search review pins ---------------------------------

def test_bm25_index_has_no_empty_token(ray_session, tmp_path):
    """Empty/whitespace/null docs must not plant a '' posting."""
    from orc_ray.functions.search import _postings_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hello world", "   ", None])})
    p = _postings_batch(t, "doc_id", "text")
    toks = p.column("token").to_pylist()
    assert "" not in toks
    assert sorted(toks) == ["hello", "world"]


def test_topk_cosine_empty_and_zero_norm(ray_session):
    """Empty candidate sets return a TYPED empty table; zero-norm vectors
    drop like null ones (SQL cosine is undefined for both)."""
    import ray

    from orc_ray.functions.similarity import drop_invalid_embeddings, topk_cosine

    q = np.array([[1.0, 0.0]], np.float32)
    empty_ds = ray.data.from_arrow(pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = topk_cosine(empty_ds, q, k=3)
    assert out.num_rows == 0
    assert out.column("sim").type == pa.float64()

    t = pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                  "embedding": pa.array([[0.0, 0.0], [1.0, 0.0], None],
                                        pa.list_(pa.float32()))})
    kept = drop_invalid_embeddings(t, "embedding")
    assert kept.column("vec_id").to_pylist() == [2]


# --- round-5 sampling/sketch/substring/graph review pins --------------------

def test_cut_spans_utf8_boundary():
    """A dup span starting mid-character cuts the whole character instead
    of leaving invalid UTF-8 (ArrowInvalid on the string cast)."""
    from orc_ray.functions.substring import _cut_arrays

    data = np.frombuffer(b"yyyy" + "é".encode() + b"z" * 31, np.uint8)
    out, lens = _cut_arrays(data.copy(), np.array([0, data.size], np.int64),
                            np.array([5], np.int64), 32)
    assert out.to_pylist() == ["yyyy"]


def test_es_priority_tiny_weight_no_wraparound():
    """Weights below ~5e-9 used to overflow the e9 priority to INT64_MIN,
    whose negation wraps and sorts FIRST — inverting the selection."""
    from orc_ray.functions.sampling import es_priority_e9

    pri = es_priority_e9(pa.array(["a", "b"]), np.array([1e-12, 1.0]))
    assert pri[0] > np.iinfo(np.int64).min  # clipped, not wrapped
    assert pri[0] < pri[1]  # tiny weight = worst priority, stays worst


def test_tdigest_and_cms_degenerate_inputs():
    from orc_ray.functions.sketch import cms_estimate, cms_partial, tdigest_merge

    m, w = tdigest_merge([(np.empty(0), np.empty(0))])
    assert m.size == 0
    regs = cms_partial(pa.array(["a", "a", "b"]))
    est = cms_estimate(regs, pa.array(["a", None, "b"]))
    assert len(est) == 3 and est[1] == 0 and est[0] >= 2  # row-aligned


def test_connected_components_backend_type_parity(ray_session):
    import ray

    from orc_ray.functions.graph import connected_components

    edges = pa.table({"a": pa.array([1, 2], pa.int32()), "b": pa.array([2, 3], pa.int32())})
    lo = connected_components(ray.data.from_arrow(edges))  # driver backend
    hi = connected_components(ray.data.from_arrow(edges), driver_threshold=0)
    tl = pa.concat_tables(list(lo.iter_batches(batch_format="pyarrow", batch_size=None)))
    th = pa.concat_tables(list(hi.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert tl.column("node").type == th.column("node").type
    assert sorted(tl.to_pylist(), key=str) == sorted(th.to_pylist(), key=str)
