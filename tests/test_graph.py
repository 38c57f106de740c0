"""Distributed connected components (min-label propagation) vs the
driver union-find — equivalence on random graphs, chains, and types."""

import numpy as np
import pyarrow as pa
import ray


def _cc(edges_tbl, **kw):
    from orc_ray.functions.graph import connected_components

    kw.setdefault("driver_threshold", 0)  # force the distributed path
    ds = ray.data.from_arrow(edges_tbl)
    out = pa.concat_tables(
        connected_components(ds, **kw).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return dict(zip(out.column("node").to_pylist(), out.column("label").to_pylist()))


def _uf_labels(pairs):
    from orc_ray.functions.dedup import _UnionFind

    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {n: uf.find(n) for n in list(uf.parent)}


def test_cc_chain_and_pair(ray_session):
    got = _cc(pa.table({"a": [1, 2, 3, 10], "b": [2, 3, 4, 11]}))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_string_nodes(ray_session):
    got = _cc(pa.table({"a": ["d", "b", "x"], "b": ["b", "a", "y"]}))
    assert got == {"a": "a", "b": "a", "d": "a", "x": "x", "y": "x"}


def test_cc_matches_union_find_on_random_graphs(ray_session):
    rng = np.random.default_rng(7)
    n = 60
    m = 45
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b  # self-loops are allowed but add nothing
    pairs = list(zip(a[keep].tolist(), b[keep].tolist()))
    got = _cc(pa.table({"a": a[keep], "b": b[keep]}))
    assert got == _uf_labels(pairs)


def test_cc_nonconvergence_raises(ray_session):
    # a 12-chain cannot converge in 3 min-propagation rounds
    import pytest

    a = list(range(12))
    b = list(range(1, 13))
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(pa.table({"a": a, "b": b}), max_iters=3)


def test_cc_driver_backend_matches_distributed(ray_session):
    tbl = pa.table({"a": [1, 2, 3, 10, 7], "b": [2, 3, 4, 11, 7]})
    assert _cc(tbl) == _cc(tbl, driver_threshold=10_000)


def test_cc_pointer_doubling_collapses_chains(ray_session):
    """a 40-chain needs ~40 min-propagation rounds; shortcut messages
    finish in O(log): assert well under the linear budget."""
    import ray as _ray

    from orc_ray.functions.graph import connected_components

    a = list(range(40))
    b = list(range(1, 41))
    st = {}
    ds = _ray.data.from_arrow(pa.table({"a": a, "b": b}))
    out = pa.concat_tables(
        connected_components(ds, driver_threshold=0, stats_out=st).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    labels = set(out.column("label").to_pylist())
    assert labels == {0}
    assert st["rounds"] <= 12
