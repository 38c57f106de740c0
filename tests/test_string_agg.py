"""string_agg_by_key: the order-sensitive distributed STRING_AGG.

String concatenation is not commutative, so this operator's healing pass
is the risky part: a window split across sorted blocks must re-join its
partials in block (i.e. ORDER BY) order, replayed from the carried first
order value per partial.  Pinned here against a brute-force driver-side
join on inputs engineered to straddle many block boundaries, plus the
O(blocks) driver ceiling and null-key behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from orc_ray.functions.aggregates import string_agg_by_key


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(
        [p for p in parts if p.num_rows], promote_options="default"
    ) if any(p.num_rows for p in parts) else pa.table({})


def _brute(keys, orders, vals, ns, sep=" "):
    rows = sorted(zip(keys, orders, vals, ns), key=lambda r: (r[0], r[1]))
    out = {}
    for k, _, v, n in rows:
        t, c = out.get(k, ("", 0))
        out[k] = (t + (sep if t else "") + v, c + n)
    return out


def test_string_agg_matches_bruteforce_across_blocks(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.integers(0, 40, n)  # long runs -> many groups straddle blocks
    orders = rng.permutation(n).astype(np.int64)
    vals = np.array([f"w{k}-{o}" for k, o in zip(keys, orders)], dtype=object)
    ns = rng.integers(1, 5, n).astype(np.int64)
    t = pa.table(
        {
            "k": pa.array(keys),
            "g": pa.array(orders),
            "v": pa.array(vals.tolist(), pa.string()),
            "n": pa.array(ns),
        }
    )
    ds = ray.data.from_arrow(t).repartition(16)
    stats = {}
    got = _collect(
        string_agg_by_key(ds, "k", "g", "v", "n", out="txt", n_out="cnt",
                          stats_out=stats)
    )
    exp = _brute(keys.tolist(), orders.tolist(), vals.tolist(), ns.tolist())
    assert got.num_rows == len(exp)
    # driver ceiling: <=2 boundary runs per block, never O(groups)
    assert stats["boundary_rows"] <= 2 * 16 + 2
    for k, txt, cnt in zip(
        got.column("k").to_pylist(),
        got.column("txt").to_pylist(),
        got.column("cnt").to_pylist(),
    ):
        et, ec = exp[k]
        assert txt == et, f"key {k}: order-broken join"
        assert cnt == ec


def test_string_agg_single_group_spanning_every_block(ray_session):
    # the worst case for healing: ONE key across all blocks — the full
    # result is assembled on the driver from per-block partials in order
    n = 2000
    t = pa.table(
        {
            "k": pa.array(np.zeros(n, np.int64)),
            "g": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array([str(i) for i in range(n)], pa.string()),
            "n": pa.array(np.ones(n, np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = _collect(string_agg_by_key(ds, "k", "g", "v", "n"))
    assert got.num_rows == 1
    assert got.column("joined")[0].as_py() == " ".join(str(i) for i in range(n))
    assert got.column("n")[0].as_py() == n
