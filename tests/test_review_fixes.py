"""Regressions for the round-2 self-review findings: boundary-exact
numeric conversions, null-text token counts, probe-key overflow in the
temporal join index, string upper-bound truncation soundness, degenerate
range decode, and merge dedup semantics."""

import numpy as np
import pyarrow as pa

from orc_ray.convert import convert_column
from orc_ray.functions.joins import AsofIndex


def test_uint64_to_int64_nulls_not_crash():
    a = pa.array([2**63, 5, 2**64 - 1, None], pa.uint64())
    got = convert_column(a, pa.int64()).to_pylist()
    assert got == [None, 5, None, None]


def test_float_to_int_boundary_nulls_not_wraps():
    # float64(2**63 - 1) rounds UP to 2**63: must null, not wrap to INT64_MIN
    a = pa.array([9.223372036854776e18, -9.3e18, 1.0], pa.float64())
    assert convert_column(a, pa.int64()).to_pylist() == [None, None, 1]
    b = pa.array([1.8446744073709552e19, 5.0], pa.float64())
    assert convert_column(b, pa.uint64()).to_pylist() == [None, 5]


def test_token_counts_null_text():
    from orc_ray.functions.text import quality_score, token_counts

    t = pa.table({"doc_id": pa.array([1, 2]), "text": pa.array(["a b", None])})
    got = token_counts(t)
    assert got.column("n_ws_tokens").to_pylist() == [2, 0]
    assert got.column("n_bpe_tokens").to_pylist()[1] == 0  # was INT64_MIN
    q = quality_score(t)
    assert all(np.isfinite(q.column("quality").to_numpy()))


def test_asof_probe_key_outside_build_domain():
    # huge span * out-of-domain probe key would overflow the packing
    keys = np.array([1, 2], dtype=np.int64)
    times = np.array([0, 10**14], dtype=np.int64)  # span ~1e14
    ix = AsofIndex(keys, times)
    big = np.array([10**6, -(10**6), 1], dtype=np.int64)
    n = ix.range_count(big, np.zeros(3, np.int64), np.full(3, 10**14))
    assert n.tolist() == [0, 0, 1]
    _, m = ix.asof(big, np.full(3, 10**14))
    assert m.tolist() == [False, False, True]


def test_s_hi_is_a_true_upper_bound():
    from orc_ray.chunk import _s_hi

    # 65th code point IS U+10FFFF: old scheme produced a bound < value
    s = "a" * 64 + "\U0010FFFF" + "tail"
    hi = _s_hi(s)
    assert hi is not None and hi > s
    # increment lands on the surrogate gap -> skips to U+E000
    s2 = "b" * 63 + "퟿" + "\U0010FFFFx"
    hi2 = _s_hi(s2)
    assert hi2 is not None and hi2 > s2
    # all-max prefix: no finite bound
    assert _s_hi("\U0010FFFF" * 65) is None
    # short strings unchanged
    assert _s_hi("abc") == "abc"


def test_s_hi_pathological_column_roundtrip():
    from orc_ray.chunk import decode_chunk, encode_chunk, read_chunk_header

    s = "\U0010FFFF" * 70
    t = pa.table({"x": pa.array([s, "a"])})
    blob = encode_chunk(t)
    (c,) = read_chunk_header(blob)["columns"]
    assert "max" not in c  # no unsound bound recorded
    assert decode_chunk(blob).column("x").to_pylist() == [s, "a"]


def test_range_decode_degenerate_interval():
    from orc_ray.codecs.intcodec import decode_ints_ranges, encode_ints

    v = np.arange(5000, dtype=np.int64)
    blob = encode_ints(v)
    assert decode_ints_ranges(blob, [(5, 5)]).size == 0
    np.testing.assert_array_equal(decode_ints_ranges(blob, [(5, 5), (7, 9)]), v[7:9])


def test_merge_keeps_identical_content_across_files(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.state.manifest import merge_stores

    t = pa.table({"v": pa.array(np.arange(100))})
    pq.write_table(t, tmp_path / "f1.parquet")
    pq.write_table(t, tmp_path / "f2.parquet")  # identical content
    st1, st2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    encode_dataset(str(tmp_path / "f1.parquet"), st1)
    encode_dataset(str(tmp_path / "f2.parquet"), st2)
    out = str(tmp_path / "m")
    rec = merge_stores(out, [st1, st2])
    assert rec["totals"]["rows"] == 200  # both files' rows survive
    got = pa.concat_tables(
        list(decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert got.num_rows == 200
