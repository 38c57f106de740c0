"""Distributed vectorized aggregation helpers.

``sum_by_keys`` is the scale-path replacement for
``ds.groupby(keys).aggregate(Sum/Count)`` when the number of DISTINCT
groups is large: Ray's aggregate pays per-group Python overhead in the
reduce phase (measured ~30 s for 175 k groups over 250 k rows at 32 cpus,
vs ~1 s for the same rows in 5 k groups), while this helper's cost is one
range sort plus one fully vectorized numpy pass per block.  Groups that
straddle a block boundary (at most 2 per block) are healed on the driver
— the same O(blocks) boundary pattern the minhash/ngram emitters use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _group_starts(cols: list[np.ndarray]) -> np.ndarray:
    """Start indices of equal-key runs over already-sorted key columns."""
    n = cols[0].size
    brk = np.zeros(n, dtype=bool)
    brk[0] = True
    for c in cols:
        brk[1:] |= c[1:] != c[:-1]
    return np.flatnonzero(brk)


def _run_sums(cols: list[np.ndarray], v: np.ndarray):
    """(starts, per-run sums) for sorted key columns — one cumsum pass."""
    starts = _group_starts(cols)
    ends = np.r_[starts[1:], v.size]
    csum = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(v, out=csum[1:])
    return starts, csum[ends] - csum[starts]


def sum_by_keys(ds, keys: list[str], val: str, out: str | None = None,
                stats_out: dict | None = None):
    """SUM(val) GROUP BY keys, returned as a ray.data.Dataset.

    One range sort on ``keys`` is the only shuffle; per-block aggregation
    is vectorized; only the <=2 groups per block that touch a block edge
    reach the driver, are re-summed with the same kernel, and re-enter as
    a tiny dataset.  ``out`` renames the value column.  ``stats_out``
    receives {"boundary_rows": ...} so callers can assert the O(blocks)
    driver ceiling."""
    import ray
    import pyarrow.compute as pc

    out = out or val

    def stage(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                **{k: pa.array([], pa.int64()) for k in keys},
                "_v": pa.array([], pa.int64()),
                "_edge": pa.array([], pa.bool_()),
            }
        )
        if t.num_rows == 0:
            return empty
        cols = [t.column(k).to_numpy(zero_copy_only=False) for k in keys]
        v = t.column(val).to_numpy(zero_copy_only=False).astype(np.int64)
        starts, sums = _run_sums(cols, v)
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True  # first/last group may continue in neighbour blocks
        idx = starts
        return pa.table(
            {
                **{k: pa.array(c[idx]) for k, c in zip(keys, cols)},
                "_v": pa.array(sums),
                "_edge": pa.array(edge),
            }
        )

    mixed = (
        ds.sort(keys)
        .map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def interior_rows(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.invert(t.column("_edge").combine_chunks()))
        return pa.table({**{k: keep.column(k) for k in keys}, out: keep.column("_v")})

    interior_ds = mixed.map_batches(interior_rows, batch_format="pyarrow", zero_copy_batch=True)

    def edge_rows(t: pa.Table) -> pa.Table:
        sub = t.filter(t.column("_edge").combine_chunks())
        return pa.table({**{k: sub.column(k) for k in keys}, val: sub.column("_v")})

    bparts = [
        p
        for p in mixed.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if p.num_rows
    ]
    if stats_out is not None:
        stats_out["boundary_rows"] = sum(p.num_rows for p in bparts)
    if not bparts:
        return interior_ds
    # heal: <=2 partial rows per block; resort and re-sum with the same
    # kernel, keeping every group (no interior split on the driver side)
    b = pa.concat_tables(bparts).combine_chunks()
    cols = [b.column(k).to_numpy(zero_copy_only=False) for k in keys]
    order = np.lexsort(tuple(reversed(cols)))
    cols = [c[order] for c in cols]
    v = b.column(val).to_numpy(zero_copy_only=False).astype(np.int64)[order]
    starts, sums = _run_sums(cols, v)
    healed = pa.table(
        {
            **{k: pa.array(c[starts]) for k, c in zip(keys, cols)},
            out: pa.array(sums),
        }
    )
    return interior_ds.union(ray.data.from_arrow(healed))
