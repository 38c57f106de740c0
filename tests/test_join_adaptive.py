"""join_adaptive: broadcast arm below the threshold, hash-shuffle arm
above it — both must produce the same inner-join result."""

import pyarrow as pa
import ray


def _mk(ray_session):
    big = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3, 4, 5, 6, 2, 3], "v": [10, 20, 30, 40, 50, 60, 21, 31]})
    )
    small = ray.data.from_arrow(
        pa.table({"sk": [2, 3, 9], "p": ["b", "c", "z"]})
    )
    return big, small


def _collect(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return sorted(zip(t.column("k").to_pylist(), t.column("v").to_pylist(), t.column("p").to_pylist()))


def test_broadcast_and_shuffle_arms_agree(ray_session):
    from orc_ray.functions.joins import join_adaptive

    big, small = _mk(ray_session)
    bres = _collect(join_adaptive(big, small, "k", "sk", ["p"], threshold_rows=100))
    big, small = _mk(ray_session)
    sres = _collect(join_adaptive(big, small, "k", "sk", ["p"], threshold_rows=0, num_partitions=2))
    expect = [(2, 20, "b"), (2, 21, "b"), (3, 30, "c"), (3, 31, "c")]
    assert bres == expect
    assert sres == expect


def test_empty_small_side(ray_session):
    from orc_ray.functions.joins import join_adaptive

    big = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [1, 2]}))
    small = ray.data.from_arrow(pa.table({"sk": [], "p": []}))
    out = join_adaptive(big, small, "k", "sk", ["p"], threshold_rows=100)
    assert out.count() == 0


def test_asof_partitioned_arm_parity(ray_session):
    """asof_join_auto's hash-partitioned arm (threshold 0) must match the
    broadcast searchsorted arm row-for-row, including unmatched nulls."""
    import numpy as np

    from orc_ray.functions.joins import asof_join, asof_join_auto

    rng = np.random.default_rng(11)
    bk = rng.integers(0, 40, 400)
    bt = rng.integers(0, 5_000, 400)
    probe_t = pa.table(
        {
            "eid": np.arange(1500, dtype=np.int64),
            "uid": rng.integers(0, 55, 1500),  # some uids have no build rows
            "ts": rng.integers(0, 5_000, 1500),
        }
    )
    probe = ray.data.from_arrow(probe_t).repartition(5)
    b = pa.concat_tables(
        asof_join(probe, bk, bt, "uid", "ts", "asof").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("eid")
    probe = ray.data.from_arrow(probe_t).repartition(5)
    p = pa.concat_tables(
        asof_join_auto(
            probe, bk, bt, "uid", "ts", "asof", broadcast_threshold_rows=0, num_partitions=7
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("eid")
    assert b.select(["eid", "asof"]).equals(p.select(["eid", "asof"]))
    # unmatched probes must exist in this fixture (uids 40..54) and be null
    assert p.column("asof").null_count > 0
