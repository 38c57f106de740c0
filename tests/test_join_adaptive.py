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


def _semi_anti_fixture():
    import numpy as np

    rng = np.random.default_rng(11)
    big = pa.table(
        {
            "k": pa.array(
                [None if i % 29 == 0 else int(rng.integers(0, 40)) for i in range(300)],
                pa.int64(),
            ),
            "v": pa.array(range(300)),
        }
    )
    keys = pa.table({"fk": pa.array(list(rng.integers(0, 40, 120)) + [None], pa.int64())})
    kset = set(x for x in keys.column("fk").to_pylist() if x is not None)
    semi = sorted(v for k, v in zip(big.column("k").to_pylist(), big.column("v").to_pylist()) if k in kset)
    anti = sorted(v for k, v in zip(big.column("k").to_pylist(), big.column("v").to_pylist()) if k not in kset)
    return big, keys, semi, anti


def _vcol(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return sorted(t.column("v").to_pylist())


def test_join_semi_anti_broadcast(ray_session):
    from orc_ray.functions.joins import join_semi_anti

    big, keys, semi, anti = _semi_anti_fixture()
    bds, kds = ray.data.from_arrow(big), ray.data.from_arrow(keys)
    assert _vcol(join_semi_anti(bds, kds, "k", "fk")) == semi
    bds, kds = ray.data.from_arrow(big), ray.data.from_arrow(keys)
    assert _vcol(join_semi_anti(bds, kds, "k", "fk", anti=True)) == anti


def test_join_semi_anti_partitioned_parity(ray_session):
    """threshold_rows=0 forces the hash-partitioned arm; results must
    match the broadcast arm exactly (incl. null big-side keys: semi
    drops them, anti keeps them — NOT EXISTS semantics)."""
    from orc_ray.functions.joins import join_semi_anti

    big, keys, semi, anti = _semi_anti_fixture()
    for anti_flag, expect in [(False, semi), (True, anti)]:
        bds, kds = ray.data.from_arrow(big), ray.data.from_arrow(keys)
        got = _vcol(
            join_semi_anti(
                bds, kds, "k", "fk", anti=anti_flag, threshold_rows=0, num_partitions=4
            )
        )
        assert got == expect, anti_flag


def test_join_semi_anti_empty_key_side(ray_session):
    from orc_ray.functions.joins import join_semi_anti

    big = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [1, 2]}))
    keys = ray.data.from_arrow(pa.table({"fk": pa.array([], pa.int64())}))
    assert join_semi_anti(big, keys, "k", "fk").count() == 0
    big = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [1, 2]}))
    keys = ray.data.from_arrow(pa.table({"fk": pa.array([], pa.int64())}))
    assert _vcol(join_semi_anti(big, keys, "k", "fk", anti=True)) == [1, 2]


def test_left_join_arms_agree(ray_session):
    """how='left': unmatched big rows survive with null payload on BOTH
    arms (broadcast index_in take nulls; shuffle left_outer)."""
    from orc_ray.functions.joins import join_adaptive

    def got(threshold, parts=2):
        big, small = _mk(ray_session)
        ds = join_adaptive(big, small, "k", "sk", ["p"], threshold_rows=threshold,
                           num_partitions=parts, how="left")
        t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
        return sorted(
            zip(t.column("k").to_pylist(), t.column("v").to_pylist(), t.column("p").to_pylist()),
            key=lambda r: (r[0], r[1]),
        )

    expect = [
        (1, 10, None), (2, 20, "b"), (2, 21, "b"), (3, 30, "c"), (3, 31, "c"),
        (4, 40, None), (5, 50, None), (6, 60, None),
    ]
    assert got(100) == expect  # broadcast arm
    assert got(0) == expect  # shuffle arm


def test_left_join_empty_small_side(ray_session):
    from orc_ray.functions.joins import join_adaptive

    big = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [1, 2]}))
    small = ray.data.from_arrow(pa.table({"sk": pa.array([], pa.int64()), "p": pa.array([], pa.string())}))
    out = join_adaptive(big, small, "k", "sk", ["p"], threshold_rows=100, how="left")
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow", batch_size=None))
    assert t.num_rows == 2 and t.column("p").null_count == 2
