"""ORC file interop: stripe-parallel read, projection pushdown, the
content-addressed partitioned sink, and full-fidelity roundtrips against
the compiled ORC C++ core (pyarrow.orc — the live oracle)."""

import glob
import os

import pyarrow as pa
import pyarrow.orc as po
import pytest

from orc_ray.pipeline.orcio import plan_orc_units, read_orc, write_orc


def _table(n=12000):
    import numpy as np

    rng = np.random.default_rng(7)
    return pa.table(
        {
            "k": pa.array(np.arange(n)),
            "v": pa.array(rng.integers(0, 1000, n)),
            "s": pa.array([f"row {i % 97}" for i in range(n)]),
        }
    )


@pytest.fixture(scope="module")
def multi_stripe_orc(tmp_path_factory):
    """An uncompressed multi-stripe .orc file (stripe_size accounting is
    against compressed bytes, so uncompressed + small stripe_size forces
    several stripes)."""
    path = str(tmp_path_factory.mktemp("orcio") / "multi.orc")
    t = _table()
    po.write_table(t, path, stripe_size=64 * 1024)
    assert po.ORCFile(path).nstripes >= 3
    return path, t


def test_plan_units_per_stripe(multi_stripe_orc):
    path, _ = multi_stripe_orc
    units = plan_orc_units(path)
    assert len(units) == po.ORCFile(path).nstripes
    assert {u["path"] for u in units} == {path}


def test_read_orc_roundtrip(ray_session, multi_stripe_orc):
    path, t = multi_stripe_orc
    got = pa.concat_tables(
        read_orc(path).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert got.equals(t)


def test_read_orc_projection(ray_session, multi_stripe_orc):
    path, t = multi_stripe_orc
    got = pa.concat_tables(
        read_orc(path, columns=["k", "s"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("k")
    assert got.column_names == ["k", "s"]
    assert got.equals(t.select(["k", "s"]))


def test_read_orc_directory(ray_session, tmp_path):
    t = _table(3000)
    po.write_table(t.slice(0, 1500), str(tmp_path / "a.orc"))
    po.write_table(t.slice(1500), str(tmp_path / "b.orc"))
    got = pa.concat_tables(
        read_orc(str(tmp_path)).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert got.equals(t)


def test_write_orc_partitioned_and_resumable(ray_session, tmp_path):
    import ray

    t = _table(9000)
    out = str(tmp_path / "sink")
    ds = ray.data.from_arrow(t)
    man = write_orc(ds, out, batch_size=2048)
    parts = sorted(glob.glob(os.path.join(out, "part-*.orc")))
    assert parts == man.column("path").to_pylist()
    assert len(parts) >= 2  # partitioned output, never one giant file
    assert sum(man.column("rows").to_pylist()) == 9000
    # every part is a valid ORC file readable by the C++ core
    back = pa.concat_tables([po.ORCFile(p).read() for p in parts]).sort_by("k")
    assert back.equals(t)
    # idempotent resume: re-running writes nothing new (content-addressed)
    mtimes = {p: os.path.getmtime(p) for p in parts}
    man2 = write_orc(ray.data.from_arrow(t), out, batch_size=2048)
    assert sorted(glob.glob(os.path.join(out, "part-*.orc"))) == parts
    assert {p: os.path.getmtime(p) for p in parts} == mtimes
    assert sum(man2.column("rows").to_pylist()) == 9000


def test_timestamp_cast_schema(ray_session, tmp_path):
    import datetime

    t = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i) for i in range(100)],
                pa.timestamp("us"),
            )
        }
    )
    path = str(tmp_path / "ts.orc")
    po.write_table(t, path)
    got = pa.concat_tables(
        read_orc(path, cast_schema={"ts": pa.timestamp("us")}).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    assert got.equals(t)


def test_store_to_orc_to_store(ray_session, tmp_path):
    """Chunk store -> .orc parts -> chunk store: both directions compose."""
    from orc_ray.chunk import EncodeOptions
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    import pyarrow.parquet as pq

    t = _table(5000)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store1 = str(tmp_path / "store1")
    encode_dataset([src], store1, EncodeOptions(), batch_size=1024)
    orc_dir = str(tmp_path / "orcparts")
    write_orc(decode_dataset(store1), orc_dir, batch_size=1024)
    store2 = str(tmp_path / "store2")
    encode_dataset([], store2, EncodeOptions(), ds=read_orc(orc_dir), batch_size=1024)
    got = pa.concat_tables(
        decode_dataset(store2).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert got.equals(t)


def test_write_parquet_parts_partitioned_and_resumable(ray_session, tmp_path):
    import ray
    import pyarrow.parquet as pq

    from orc_ray.pipeline.orcio import write_parquet_parts

    t = _table(9000)
    out = str(tmp_path / "pqsink")
    man = write_parquet_parts(ray.data.from_arrow(t), out, batch_size=2048)
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert parts == man.column("path").to_pylist()
    assert len(parts) >= 2  # partitioned output, never one giant file
    assert sum(man.column("rows").to_pylist()) == 9000
    back = pa.concat_tables([pq.read_table(p) for p in parts]).sort_by("k")
    assert back.equals(t)
    # idempotent resume: re-running writes nothing new (content-addressed)
    mtimes = {p: os.path.getmtime(p) for p in parts}
    write_parquet_parts(ray.data.from_arrow(t), out, batch_size=2048)
    assert sorted(glob.glob(os.path.join(out, "part-*.parquet"))) == parts
    assert {p: os.path.getmtime(p) for p in parts} == mtimes


def test_store_to_parquet_export_cli(ray_session, tmp_path):
    """store --export-parquet--> parts --re-encode--> store: exact loop."""
    import pyarrow.parquet as pq

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.pipeline.orcio import write_parquet_parts

    t = _table(4000)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store1 = str(tmp_path / "store1")
    encode_dataset(src, store1, batch_size=1024)
    pq_dir = str(tmp_path / "pq")
    write_parquet_parts(decode_dataset(store1), pq_dir, batch_size=1024)
    store2 = str(tmp_path / "store2")
    encode_dataset(pq_dir, store2, batch_size=1024)
    a = pa.concat_tables(
        decode_dataset(store2).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert a.equals(t)
