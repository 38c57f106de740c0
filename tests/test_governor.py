"""Writer memory governor (pipeline/governor.py) — MemoryManagerImpl
analog: batch sizing must react to row width, concurrency, and budget."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.pipeline.governor import MAX_ROWS, MIN_ROWS, avg_row_bytes, plan_batch_size


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("gov")
    rng = np.random.default_rng(3)
    narrow = root / "narrow.parquet"
    pq.write_table(
        pa.table({"a": rng.integers(0, 100, 5000), "b": rng.integers(0, 100, 5000)}), narrow
    )
    wide = root / "wide.parquet"
    payload = [rng.integers(0, 256, 4096, dtype=np.uint8).tobytes() for _ in range(2000)]
    pq.write_table(
        pa.table({"a": np.arange(2000), "blob": pa.array(payload, pa.binary())}), wide
    )
    return str(narrow), str(wide)


def test_row_bytes_reflect_width(corpora):
    narrow, wide = corpora
    rb_n = avg_row_bytes([narrow])
    rb_w = avg_row_bytes([wide])
    assert rb_w > 50 * rb_n  # 4 KiB blobs vs two small ints
    # column projection shrinks the estimate
    assert avg_row_bytes([wide], columns=["a"]) < rb_w / 100


def test_batch_size_scales_inversely(corpora):
    narrow, wide = corpora
    budget = 1 << 30
    bn = plan_batch_size([narrow], budget_bytes=budget, concurrency=32)
    bw = plan_batch_size([wide], budget_bytes=budget, concurrency=32)
    assert bn > bw  # wide rows -> smaller batches
    # more concurrent writers -> smaller per-writer batches (the
    # MemoryManagerImpl scale-down behavior)
    b8 = plan_batch_size([wide], budget_bytes=budget, concurrency=8)
    assert b8 >= 4 * bw * 0.9
    # clamps
    assert plan_batch_size([wide], budget_bytes=1, concurrency=32) == MIN_ROWS
    assert plan_batch_size([narrow], budget_bytes=1 << 45, concurrency=1) == MAX_ROWS


def test_worker_budget_holds(corpora):
    """The governed batch's working set (rows x row_bytes x scratch) must
    fit inside the per-writer share of the budget."""
    _, wide = corpora
    budget, conc = 1 << 30, 32
    rows = plan_batch_size([wide], budget_bytes=budget, concurrency=conc)
    if rows > MIN_ROWS:  # clamp floor may exceed the share by design
        assert rows * avg_row_bytes([wide]) * 6 <= budget / conc * 1.01


def test_encode_dataset_engages_governor(tmp_path, ray_session, corpora):
    """batch_size=None routes through the governor and still produces a
    correct, committed store."""
    import pyarrow.parquet as _pq

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    narrow, _ = corpora
    out = tmp_path / "store"
    rec = encode_dataset([narrow], str(out), batch_size=None)
    assert rec["totals"]["rows"] == 5000
    got = pa.concat_tables(
        list(decode_dataset(str(out)).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert got.sort_by("a").num_rows == 5000


def test_partial_typo_projection_raises(corpora):
    """ADVICE r3: one valid + one typo'd column must raise, not silently
    undercount bytes."""
    import pytest

    from orc_ray.pipeline.governor import avg_row_bytes

    narrow, _ = corpora
    with pytest.raises(KeyError, match="no top-level"):
        avg_row_bytes([narrow], columns=["a", "no_such_column"])
