"""Merge-on-read upsert — CDC reconciliation at decode time.

The lakehouse MERGE pattern without rewriting the base store: a (small)
delta store holds new versions of keyed rows; reading reconciles by
suppressing base rows whose key appears in the delta and unioning the
delta rows in.  The base chunks are immutable (content-addressed, so
snapshots and resume semantics are untouched); an upsert is just a new
delta store, and compaction (fold delta into base) is `merge` + a
re-encode — both existing tools.

Scale shape: the delta KEY SET is broadcast once (``ray.put``) and each
base batch drops matching rows with one vectorized ``is_in`` — the base
never shuffles.  A bloom filter fronts the exact set so the common case
(no match in this batch) costs one hash pass.  For a delta too large to
broadcast, hash-partition both sides on the key and reconcile per
partition (the join_adaptive fallback shape) — documented, not needed
below ~10^7 delta keys.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def upsert_read(base_ds, delta_ds, key: str):
    """Reconciled Dataset: delta rows replace base rows with equal key.

    Both inputs must share a schema; delta must have at most one row per
    key (enforced here — last-writer-wins ordering would need a version
    column, the documented extension).
    """
    import ray

    from ..codecs import bloom

    parts = [b for b in delta_ds.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    if not parts:
        return base_ds  # empty delta: nothing to reconcile
    delta_t = pa.concat_tables(parts).combine_chunks()
    keys = delta_t.column(key).combine_chunks()
    if keys.null_count:
        raise ValueError("delta contains null keys — an equi-key upsert cannot match them")
    if pc.count_distinct(keys).as_py() != len(keys):
        raise ValueError("delta has duplicate keys — add a version column and pre-dedup")
    filt = bloom.build(keys, fpp=0.01)
    ref = ray.put((filt, keys))

    def drop_overwritten(t: pa.Table, *, ref, key) -> pa.Table:
        filt, keys = ray.get(ref)
        col = t.column(key)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        maybe = bloom.might_contain_many(filt, col)
        if not maybe.any():
            return t  # bloom fast path: nothing to reconcile in this batch
        hit = pc.is_in(col, value_set=keys)
        return t.filter(pc.invert(hit))

    reconciled = base_ds.map_batches(
        functools.partial(drop_overwritten, ref=ref, key=key),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return reconciled.union(ray.data.from_arrow(delta_t))
