"""Timezone-aware timestamp support (the reference's Timezone layer:
apache/orc c++/src/Timezone.cc, TestTimezone.cc; TIMESTAMP vs
TIMESTAMP_INSTANT, SURVEY.md §1.2).

Contract: a tz-aware Arrow column (`timestamp[us, tz=...]`) is an absolute
instant (TIMESTAMP_INSTANT); a naive column is a wall clock (TIMESTAMP).
The chunk format preserves the zone in its IPC schema header; the convert
layer implements the reader-tz semantics (naive localizes IN the target
zone, instant -> naive yields the SOURCE zone's wall clock); ORC interop
maps TIMESTAMP_INSTANT to tz-aware Arrow and preserves instants across
non-UTC writers (the writer-tz adjustment lives in the compiled core).
"""

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import DEFAULT_OPTIONS, decode_chunk, encode_chunk
from orc_ray.convert import convert_column

US = 1_000_000


def _vals(n=200, start=1_600_000_000 * US, step=37 * US):
    return [start + i * step for i in range(n)]


def _table():
    v = _vals()
    return pa.table(
        {
            "k": pa.array(range(len(v)), pa.int64()),
            "inst_utc": pa.array(v, pa.timestamp("us", tz="UTC")),
            "inst_ny": pa.array(v, pa.timestamp("us", tz="America/New_York")),
            "wall": pa.array(v, pa.timestamp("us")),
        }
    )


def test_chunk_roundtrip_preserves_zone():
    t = _table()
    back = decode_chunk(encode_chunk(t, DEFAULT_OPTIONS))
    assert back.schema.equals(t.schema)  # tz survives the IPC header
    assert back.equals(t)


def test_store_roundtrip_and_predicate(ray_session, tmp_path):
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    t = _table()
    src = str(tmp_path / "tz.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, DEFAULT_OPTIONS, batch_size=64)
    back = pa.concat_tables(
        decode_dataset(store).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert back.schema.equals(t.schema)
    assert back.equals(t)
    # predicates over a tz-aware column compare epoch-us instants
    cut = _vals()[100]
    got = pa.concat_tables(
        decode_dataset(store, predicates=[("inst_ny", ">=", cut)]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    assert got.num_rows == 100


def test_convert_naive_localizes_in_target_zone():
    # 2020-09-13 12:26:40 wall clock, localized as New York time ->
    # the instant is 16:26:40 UTC (EDT, UTC-4)
    wall = pa.array([1_600_000_000 * US], pa.timestamp("us"))
    out = convert_column(wall, pa.timestamp("us", tz="America/New_York"))
    assert out.type == pa.timestamp("us", tz="America/New_York")
    assert out.cast(pa.int64())[0].as_py() == (1_600_000_000 + 4 * 3600) * US


def test_convert_instant_to_naive_is_source_wall_clock():
    inst = pa.array([1_600_000_000 * US], pa.timestamp("us", tz="America/New_York"))
    out = convert_column(inst, pa.timestamp("us"))
    assert out.type == pa.timestamp("us")
    # the New York wall clock of that instant is 08:26:40 (EDT)
    assert out.cast(pa.int64())[0].as_py() == (1_600_000_000 - 4 * 3600) * US


def test_convert_zone_to_zone_preserves_instant():
    inst = pa.array(_vals(16), pa.timestamp("us", tz="America/New_York"))
    out = convert_column(inst, pa.timestamp("us", tz="Asia/Tokyo"))
    assert out.type == pa.timestamp("us", tz="Asia/Tokyo")
    assert out.cast(pa.int64()).equals(inst.cast(pa.int64()))


def test_convert_zone_with_precision_change():
    inst = pa.array([1_600_000_000 * US + 123_456], pa.timestamp("us", tz="UTC"))
    out = convert_column(inst, pa.timestamp("ms", tz="America/New_York"))
    assert out.type == pa.timestamp("ms", tz="America/New_York")
    assert out.cast(pa.int64())[0].as_py() == 1_600_000_000_000 + 123  # truncated


def test_convert_dst_ambiguous_resolves_earliest():
    # 2021-11-07 01:30 occurs twice in New York (fall back); the reference
    # resolves via the zone's variant lower bound — we pin "earliest"
    wall = pa.array([pa.scalar("2021-11-07 01:30:00").cast(pa.timestamp("us"))])
    out = convert_column(wall.cast(pa.timestamp("us")), pa.timestamp("us", tz="America/New_York"))
    # earliest = still EDT (UTC-4): 05:30 UTC
    import datetime

    utc = out.cast(pa.timestamp("us", tz="UTC"))[0].as_py()
    assert utc.hour == 5 and utc.minute == 30


def test_decode_cast_schema_applies_reader_tz(ray_session, tmp_path):
    """decode_dataset(cast_schema=...) is the reader-tz hook: reading a
    stored instant column as a different zone preserves the instant."""
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    t = _table()
    src = str(tmp_path / "tz.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, DEFAULT_OPTIONS, batch_size=64)
    back = pa.concat_tables(
        decode_dataset(
            store, cast_schema={"inst_ny": pa.timestamp("us", tz="Asia/Tokyo")}
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    col = back.column("inst_ny")
    assert col.type == pa.timestamp("us", tz="Asia/Tokyo")
    assert col.cast(pa.int64()).to_pylist() == _vals()


ORC_WRITER = """
import pyarrow as pa, pyarrow.orc as po
v = [1_600_000_000_000_000 + i * 1_000_000 for i in range(100)]
t = pa.table({
    "k": pa.array(range(100), pa.int64()),
    "wall": pa.array(v, pa.timestamp("us")),
    "inst": pa.array(v, pa.timestamp("us", tz="America/New_York")),
})
po.write_table(t, PATH)
"""


def test_import_orc_from_non_utc_writer(ray_session, tmp_path):
    """A .orc file written by a session in a non-UTC timezone reads back
    with identical instants: TIMESTAMP_INSTANT maps to tz-aware Arrow
    (tz=UTC from the core), and the wall-clock TIMESTAMP is not shifted
    (the writer-tz adjustment recorded in the stripe footer is applied by
    the compiled core — the Timezone.cc behavior orcio relies on)."""
    from orc_ray.pipeline.orcio import read_orc

    path = str(tmp_path / "ny.orc")
    env = dict(os.environ, TZ="America/New_York")
    p = subprocess.run(
        [sys.executable, "-c", f"PATH = {path!r}\n" + ORC_WRITER],
        env=env,
        capture_output=True,
        text=True,
    )
    assert p.returncode == 0, p.stderr[-500:]

    t = pa.concat_tables(
        read_orc(
            path,
            cast_schema={
                "wall": pa.timestamp("us"),
                "inst": pa.timestamp("us", tz="UTC"),
            },
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    v = [1_600_000_000 * US + i * US for i in range(100)]
    # TIMESTAMP_INSTANT -> tz-aware, instant preserved
    assert t.column("inst").type == pa.timestamp("us", tz="UTC")
    assert t.column("inst").cast(pa.int64()).to_pylist() == v
    # TIMESTAMP (wall clock) not shifted by the writer's zone
    assert t.column("wall").type == pa.timestamp("us")
    assert t.column("wall").cast(pa.int64()).to_pylist() == v


def test_orc_export_import_tz_roundtrip(ray_session, tmp_path):
    """Engine store -> .orc -> engine: tz-aware columns survive the format
    round-trip as instants (ns precision cast back via the reader schema)."""
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.pipeline.orcio import read_orc, write_orc

    t = _table()
    src = str(tmp_path / "tz.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, DEFAULT_OPTIONS, batch_size=64)
    out = str(tmp_path / "orc_out")
    write_orc(decode_dataset(store), out, batch_size=64)
    back = pa.concat_tables(
        read_orc(
            out,
            cast_schema={
                "inst_utc": pa.timestamp("us", tz="UTC"),
                "inst_ny": pa.timestamp("us", tz="America/New_York"),
                "wall": pa.timestamp("us"),
            },
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert back.equals(t)
