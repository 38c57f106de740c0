"""Merge-on-read upsert — CDC reconciliation at decode time.

The lakehouse MERGE pattern without rewriting the base store: a (small)
delta store holds new versions of keyed rows; reading reconciles by
suppressing base rows whose key appears in the delta and unioning the
delta rows in.  The base chunks are immutable (content-addressed, so
snapshots and resume semantics are untouched); an upsert is just a new
delta store, and compaction (fold delta into base) is `merge` + a
re-encode — both existing tools.

Scale shape, two arms selected by delta size (the join_adaptive
pattern):

- small delta (default <= 10^7 keys): the delta KEY SET is broadcast
  once (``ray.put``) and each base batch drops matching rows with one
  vectorized ``is_in`` — the base never shuffles.  A bloom filter
  fronts the exact set so the common case (no match in this batch)
  costs one hash pass.
- large delta: hash-partitioned LEFT ANTI join of the base against the
  delta's key column (both sides co-partitioned by Ray's shuffle join)
  plus a distributed key-validity check — nothing delta-sized ever
  touches the driver.  Parity of the two arms is pinned by
  tests/test_upsert.py with the threshold forced to 0.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_THRESHOLD_ROWS = 10_000_000


def _validate_delta_distributed(delta, key: str) -> None:
    """Null/duplicate key checks without a driver-side delta copy: a
    streaming null count plus a keyed count whose max must be 1."""
    from .aggregates import agg_by_keys

    def null_ct(t: pa.Table) -> pa.Table:
        col = t.column(key)
        return pa.table({"n": pa.array([col.null_count], pa.int64())})

    nulls = int(
        delta.map_batches(null_ct, batch_format="pyarrow", zero_copy_batch=True).sum("n") or 0
    )
    if nulls:
        raise ValueError("delta contains null keys — an equi-key upsert cannot match them")
    counts = agg_by_keys(
        delta.select_columns([key]), [key], [(key, "count_all", "c")]
    )
    if int(counts.max("c") or 0) > 1:
        raise ValueError("delta has duplicate keys — add a version column and pre-dedup")


def upsert_read(
    base_ds,
    delta_ds,
    key: str,
    broadcast_threshold_rows: int = BROADCAST_THRESHOLD_ROWS,
    num_partitions: int = 8,
):
    """Reconciled Dataset: delta rows replace base rows with equal key.

    Both inputs must share a schema; delta must have at most one row per
    key (enforced on both arms — last-writer-wins ordering would need a
    version column, the documented extension).
    """
    import ray

    from ..codecs import bloom

    delta = delta_ds.materialize()
    n_delta = delta.count()
    if n_delta == 0:
        return base_ds  # empty delta: nothing to reconcile

    if n_delta > broadcast_threshold_rows:
        # partitioned arm: base LEFT ANTI delta-keys, then union the delta
        _validate_delta_distributed(delta, key)
        survivors = base_ds.join(
            delta.select_columns([key]),
            join_type="left_anti",
            num_partitions=num_partitions,
            on=(key,),
        )
        return survivors.union(delta)

    delta_t = pa.concat_tables(
        b for b in delta.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows
    ).combine_chunks()
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
