"""Z-order clustering: after zorder_store, min/max chunk pruning works on
EVERY participating column; a linear sort only prunes its leading key."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from orc_ray.pipeline.decode import decode_dataset, list_chunks
from orc_ray.pipeline.encode import encode_dataset, sort_store, zorder_store


def _mk_store(tmp_path, n=40000):
    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "x": rng.integers(0, 10000, n),
            "y": rng.integers(0, 10000, n),
            "payload": rng.integers(0, 1 << 40, n),
        }
    )
    src = str(tmp_path / "xy.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=4096)
    return src, store, t


def test_zorder_prunes_both_columns(ray_session, tmp_path):
    src, store, t = _mk_store(tmp_path)
    zdir = str(tmp_path / "zstore")
    zorder_store(store, zdir, ["x", "y"], batch_size=2048)

    # pruning on x AND on y: narrow range predicates skip most chunks
    _, kx, total = list_chunks(zdir, predicates=[("and", ("x", ">=", 1000), ("x", "<", 1500))])
    _, ky, _ = list_chunks(zdir, predicates=[("and", ("y", ">=", 1000), ("y", "<", 1500))])
    assert total >= 8
    assert kx < total * 0.6, (kx, total)
    assert ky < total * 0.6, (ky, total)

    # linear sort on x: y predicates prune (almost) nothing
    ldir = str(tmp_path / "lstore")
    sort_store(store, ldir, ["x"], batch_size=2048)
    _, lkx, ltotal = list_chunks(ldir, predicates=[("and", ("x", ">=", 1000), ("x", "<", 1500))])
    _, lky, _ = list_chunks(ldir, predicates=[("and", ("y", ">=", 1000), ("y", "<", 1500))])
    assert lkx < ltotal * 0.3  # leading key prunes hard
    assert lky > ltotal * 0.9  # non-leading key does not

    # content identical to the source (clustering only reorders)
    ds = decode_dataset(zdir)
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.num_rows == t.num_rows
    assert got.sort_by([("x", "ascending"), ("y", "ascending"), ("payload", "ascending")]).equals(
        t.sort_by([("x", "ascending"), ("y", "ascending"), ("payload", "ascending")])
    )


def test_zorder_rejects_single_column(ray_session, tmp_path):
    import pytest

    src, store, _ = _mk_store(tmp_path, n=2000)
    with pytest.raises(ValueError, match="zorder needs"):
        zorder_store(store, str(tmp_path / "z1"), ["x"])


def test_zorder_four_columns_defaults_avoid_sign_bit(ray_session, tmp_path):
    """4-column default must stay within 63 bits (int64 sign bit unused)
    and still prune on a non-leading column."""
    rng = np.random.default_rng(17)
    n = 20000
    t = pa.table({c: rng.integers(0, 1000, n) for c in ("a", "b", "c", "d")})
    src = str(tmp_path / "abcd.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "s4")
    encode_dataset([src], store, batch_size=2048)
    zdir = str(tmp_path / "z4")
    zorder_store(store, zdir, ["a", "b", "c", "d"], batch_size=1024)
    _, kd, total = list_chunks(zdir, predicates=[("and", ("d", ">=", 100), ("d", "<", 200))])
    assert total >= 8
    assert kd < total  # last curve column still prunes
    ds = decode_dataset(zdir)
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.num_rows == n


def test_zorder_timestamp_column(ray_session, tmp_path):
    """ADVICE r3: a temporal z-order column must work (Arrow has no
    timestamp->double cast; the engine routes through the epoch int)."""
    rng = np.random.default_rng(5)
    n = 8000
    t = pa.table(
        {
            "ts": pa.array(
                rng.integers(1_600_000_000, 1_700_000_000, n) * 1_000_000,
                pa.timestamp("us"),
            ),
            "x": rng.integers(0, 1000, n),
        }
    )
    src = str(tmp_path / "ts.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "tstore")
    encode_dataset([src], store, batch_size=1000)
    zdir = str(tmp_path / "tz")
    zorder_store(store, zdir, ["ts", "x"], batch_size=1000)
    # both curve columns must prune
    mid_ts = 1_650_000_000 * 1_000_000
    _, kept_ts, total = list_chunks(zdir, [("ts", "<", mid_ts)])
    _, kept_x, _ = list_chunks(zdir, [("x", "<", 500)])
    assert kept_ts < total and kept_x < total
    # decoded rows round-trip exactly
    out = pa.concat_tables(
        decode_dataset(zdir).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("ts")
    assert out.sort_by([("ts", "ascending"), ("x", "ascending")]).equals(
        t.sort_by([("ts", "ascending"), ("x", "ascending")])
    )
