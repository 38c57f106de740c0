"""Merge-on-read upsert: reconciliation semantics + duplicate-key guard."""

import numpy as np
import pyarrow as pa
import ray


def test_upsert_read_replaces_and_unions(ray_session):
    from orc_ray.functions.upsert import upsert_read

    base = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    ).repartition(2)
    delta = ray.data.from_arrow(pa.table({"k": [2, 5], "v": ["B", "E"]}))
    out = pa.concat_tables(
        upsert_read(base, delta, "k").iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert out.column("k").to_pylist() == [1, 2, 3, 4, 5]
    assert out.column("v").to_pylist() == ["a", "B", "c", "d", "E"]


def test_upsert_rejects_duplicate_delta_keys(ray_session):
    import pytest

    from orc_ray.functions.upsert import upsert_read

    base = ray.data.from_arrow(pa.table({"k": [1], "v": ["a"]}))
    delta = ray.data.from_arrow(pa.table({"k": [2, 2], "v": ["x", "y"]}))
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_read(base, delta, "k")


def test_upsert_empty_delta_is_identity(ray_session):
    from orc_ray.functions.upsert import upsert_read

    base = ray.data.from_arrow(pa.table({"k": [1, 2], "v": ["a", "b"]}))
    delta = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())}))
    out = pa.concat_tables(
        upsert_read(base, delta, "k").iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert out.column("v").to_pylist() == ["a", "b"]


def test_upsert_partitioned_arm_parity(ray_session):
    """Large-delta arm (hash-partitioned LEFT ANTI) must reproduce the
    broadcast arm exactly — threshold forced to 0 (the dedup_ngram
    small_join_threshold=0 pattern)."""
    import numpy as np

    from orc_ray.functions.upsert import upsert_read

    base = ray.data.from_arrow(
        pa.table({"k": np.arange(800, dtype=np.int64), "v": np.arange(800) * 3})
    ).repartition(4)
    delta = ray.data.from_arrow(
        pa.table(
            {"k": np.arange(0, 800, 13, dtype=np.int64), "v": np.arange(0, 800, 13) * 100}
        )
    ).repartition(2)
    bc = pa.concat_tables(
        upsert_read(base, delta, "k").iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    pt = pa.concat_tables(
        upsert_read(base, delta, "k", broadcast_threshold_rows=0).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("k")
    assert bc.equals(pt)


def test_upsert_partitioned_arm_validation(ray_session):
    import numpy as np
    import pytest

    from orc_ray.functions.upsert import upsert_read

    base = ray.data.from_arrow(pa.table({"k": np.arange(10, dtype=np.int64), "v": np.arange(10)}))
    dup = ray.data.from_arrow(pa.table({"k": pa.array([1, 1], pa.int64()), "v": [5, 6]}))
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_read(base, dup, "k", broadcast_threshold_rows=0).materialize()
    nul = ray.data.from_arrow(pa.table({"k": pa.array([1, None], pa.int64()), "v": [5, 6]}))
    with pytest.raises(ValueError, match="null keys"):
        upsert_read(base, nul, "k", broadcast_threshold_rows=0).materialize()
