"""Tie-aware RANK / DENSE_RANK (with_group_tie_ranks) vs DuckDB, with the
block size forced small so tie runs and keys span many block boundaries
(the carry walk's hard cases: a key crossing blocks mid-run, whole blocks
inside one run, key changes at block edges)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
from orc_ray.functions.aggregates import with_group_tie_ranks


def _mk(n, n_keys, n_vals, seed):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys, n).astype(np.int64)),
            "v": pa.array(rng.integers(0, n_vals, n).astype(np.int64)),
            "rowid": pa.array(np.arange(n)),
        }
    )


def _oracle(t, dense):
    import duckdb

    fn = "DENSE_RANK" if dense else "RANK"
    con = duckdb.connect()
    con.register("t", t)
    return con.execute(
        f"SELECT rowid, {fn}() OVER (PARTITION BY k ORDER BY v) AS rnk FROM t ORDER BY rowid"
    ).arrow()


def _collect(ds):
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("rowid")


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("n,n_keys,n_vals,seed", [
    (20000, 5, 8, 1),     # massive ties, few keys: runs span many blocks
    (20000, 500, 4, 2),   # many keys: key changes at block edges
    (5000, 1, 1, 3),      # single key, single value: one global run
    (3000, 3000, 1000, 4),  # mostly unique: rank == row_number
])
def test_vs_duckdb(ray_session, dense, n, n_keys, n_vals, seed):
    t = _mk(n, n_keys, n_vals, seed)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024  # force many sorted blocks
    try:
        got = _collect(with_group_tie_ranks(ray.data.from_arrow(t), ["k"], ["v"], dense=dense))
    finally:
        ctx.target_max_block_size = old
    exp = _oracle(t, dense)
    assert got.column("rnk").to_pylist() == exp.column("rnk").to_pylist()


def test_descending_and_multi_order(ray_session):
    t = _mk(8000, 10, 6, 7)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        got = _collect(
            with_group_tie_ranks(
                ray.data.from_arrow(t), ["k"], ["v"], descending=[True], dense=True
            )
        )
    finally:
        ctx.target_max_block_size = old
    import duckdb

    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT rowid, DENSE_RANK() OVER (PARTITION BY k ORDER BY v DESC) AS rnk "
        "FROM t ORDER BY rowid"
    ).arrow()
    assert got.column("rnk").to_pylist() == exp.column("rnk").to_pylist()
