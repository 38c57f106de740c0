"""Versioned keyed tables (Hive-ACID analog): merge-on-read with deletes,
last-writer-wins across deltas, time travel, compaction, vacuum."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.state.table import (
    append_delta,
    compact_table,
    create_table,
    load_meta,
    read_table,
    vacuum_table,
)


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    t = pa.concat_tables(parts).combine_chunks() if parts else pa.table({})
    return t.sort_by("k")


def _base(n=2000):
    return pa.table(
        {
            "k": pa.array(np.arange(n)),
            "v": pa.array(np.arange(n) * 10),
            "tag": pa.array([f"t{i % 5}" for i in range(n)]),
        }
    )


@pytest.fixture()
def table_dir(ray_session, tmp_path):
    src = str(tmp_path / "base.parquet")
    pq.write_table(_base(), src, row_group_size=500)
    d = str(tmp_path / "tbl")
    create_table(d, [src], key="k", batch_size=400)
    return d


def _delta(ks, op, v=None):
    n = len(ks)
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "v": pa.array([None] * n if v is None else v, pa.int64()),
            "tag": pa.array(["upd"] * n, pa.string()),
            "_op": pa.array([op] * n, pa.string()),
        }
    )


def test_upsert_and_delete(table_dir):
    append_delta(table_dir, _delta([5, 10, 2500], "u", [555, 1010, 25000]))
    append_delta(table_dir, _delta([7, 10], "d"))
    got = _collect(read_table(table_dir))
    d = dict(zip(got.column("k").to_pylist(), got.column("v").to_pylist()))
    # +insert(2500), -delete(7), -delete(10 — upserted then deleted)
    assert got.num_rows == 2000 + 1 - 2
    assert d[5] == 555 and d[2500] == 25000
    assert 7 not in d and 10 not in d
    assert d[6] == 60  # untouched base row


def test_last_writer_wins_and_resurrect(table_dir):
    append_delta(table_dir, _delta([1], "d"))
    append_delta(table_dir, _delta([1], "u", [111]))  # resurrects the key
    append_delta(table_dir, _delta([2], "u", [222]))
    append_delta(table_dir, _delta([2], "u", [223]))  # later write wins
    got = _collect(read_table(table_dir))
    d = dict(zip(got.column("k").to_pylist(), got.column("v").to_pylist()))
    assert d[1] == 111 and d[2] == 223
    assert got.num_rows == 2000


def test_time_travel(table_dir):
    append_delta(table_dir, _delta([0], "u", [999]))
    append_delta(table_dir, _delta([0], "d"))
    v0 = _collect(read_table(table_dir, version=0))
    v1 = _collect(read_table(table_dir, version=1))
    v2 = _collect(read_table(table_dir))
    assert v0.column("v")[0].as_py() == 0
    assert v1.column("v")[0].as_py() == 999
    assert v2.column("k")[0].as_py() == 1  # key 0 deleted at head
    with pytest.raises(KeyError):
        read_table(table_dir, version=99)


def test_compaction_preserves_content_and_history(table_dir):
    append_delta(table_dir, _delta([3, 4], "u", [33, 44]))
    append_delta(table_dir, _delta([8], "d"))
    before = _collect(read_table(table_dir))
    meta = compact_table(table_dir)
    assert load_meta(table_dir)["versions"][-1]["deltas"] == []
    after = _collect(read_table(table_dir))
    assert after.equals(before)
    # pre-compaction version still readable (time travel)
    v1 = _collect(read_table(table_dir, version=1))
    assert dict(zip(v1.column("k").to_pylist(), v1.column("v").to_pylist()))[3] == 33
    assert 8 in v1.column("k").to_pylist()  # v1 predates the delete
    # vacuum to the head drops the old base and deltas
    removed = vacuum_table(table_dir, keep_versions=1)
    assert "base-0" in removed and any(r.startswith("delta-") for r in removed)
    assert not os.path.isdir(os.path.join(table_dir, "base-0"))
    assert _collect(read_table(table_dir)).equals(after)
    with pytest.raises(KeyError):
        read_table(table_dir, version=1)


def test_delta_validation(table_dir):
    with pytest.raises(ValueError):  # missing _op
        append_delta(table_dir, _base(3))
    with pytest.raises(ValueError):  # bad op value
        append_delta(table_dir, _delta([1], "x"))
    with pytest.raises(ValueError):  # duplicate key in one delta
        bad = pa.concat_tables([_delta([1], "u", [1]), _delta([1], "d")])
        append_delta(table_dir, bad)


def test_projection_requires_key(table_dir):
    append_delta(table_dir, _delta([5], "u", [555]))
    got = _collect(read_table(table_dir, columns=["k", "v"]))
    assert got.column_names == ["k", "v"]
    assert dict(zip(got.column("k").to_pylist(), got.column("v").to_pylist()))[5] == 555
    with pytest.raises(ValueError):
        read_table(table_dir, columns=["v"])


def test_erase_key_across_all_versions(table_dir):
    """GDPR hard erasure: the key disappears from EVERY version (time
    travel included), other rows and versions stay intact, and a second
    erase is a no-op."""
    from orc_ray.state.table import erase_key

    append_delta(table_dir, _delta([7, 100], "u", v=[777, 1000]))
    append_delta(table_dir, _delta([7], "d"))

    # pre-check: key 7 visible at v0 and v1, deleted (logically) at v2
    assert 7 in _collect(read_table(table_dir, version=0)).column("k").to_pylist()
    assert 7 in _collect(read_table(table_dir, version=1)).column("k").to_pylist()

    rec = erase_key(table_dir, 7)
    # base-0 + both deltas contained key 7
    assert rec["stores_rewritten"] == 3 and rec["rows_erased"] == 3

    for v in (0, 1, 2):
        got = _collect(read_table(table_dir, version=v))
        assert 7 not in got.column("k").to_pylist(), v
    # everything else survives: v1 still shows key 100's upsert
    t1 = _collect(read_table(table_dir, version=1))
    assert t1.num_rows == 1999  # 2000 - the erased key
    row100 = t1.filter(pa.compute.equal(t1.column("k"), 100))
    assert row100.column("v").to_pylist() == [1000]
    # v0 is the pre-delta base without key 7: key 100 still has its BASE value
    t0 = _collect(read_table(table_dir, version=0))
    assert t0.num_rows == 1999
    assert t0.filter(pa.compute.equal(t0.column("k"), 100)).column("v").to_pylist() == [1000]
    # idempotent: nothing left to erase
    rec2 = erase_key(table_dir, 7)
    assert rec2 == {"stores_rewritten": 0, "rows_erased": 0}
