"""Temporal joins the Dataset API lacks: as-of join and range join.

Both follow the broadcast-small-side pattern (no all-to-all shuffle): the
small side — sorted by (key, time) and packed into ONE composite int64
per row — is put in the object store once (``ray.put``); each probe batch
resolves every row with a single vectorized ``np.searchsorted`` against
the packed keys.  The composite packing ``key * span + (t - tmin)`` is
exact for any time resolution as long as ``(max_key + 1) * span < 2**63``
(asserted at build); clipping the probe offset into ``[-1, span]`` makes
out-of-window probes fall outside the key's block, so the key-match check
turns them into nulls/zeros.

Partitioning assumption at 100 TB: the build side must fit in one
object-store copy per node (it is a lookup table, shipped once — not per
batch).  For a large build side, ``asof_join_partitioned`` hash-partitions
BOTH sides on the key and runs the same searchsorted kernel per
partition (groupby(part).map_groups co-location — one shuffle, nothing
driver-side); ``asof_join_auto`` picks the arm by build-side row count.
Parity of the two arms is pinned by tests/test_join_adaptive.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class AsofIndex:
    """Sorted (key, time) index over the small side, composite-packed."""

    def __init__(self, keys: np.ndarray, times: np.ndarray):
        keys = np.asarray(keys, np.int64)
        times = np.asarray(times, np.int64)
        order = np.lexsort((times, keys))
        self.keys = keys[order]
        self.times = times[order]
        self.order = order  # into the caller's payload columns
        if keys.size:
            self.tmin = int(self.times.min())
            self.span = int(self.times.max()) - self.tmin + 2
            self.kmin, self.kmax = int(self.keys.min()), int(self.keys.max())
            if (self.kmax + 1) * self.span >= 2**63 or self.kmin * self.span <= -(2**63):
                raise OverflowError(
                    "composite (key, time) domain exceeds int64 — use "
                    "asof_join_partitioned (hash-partitions both sides; "
                    "per-partition key ranges shrink the composite domain)"
                )
        else:
            self.tmin, self.span = 0, 2
            self.kmin, self.kmax = 0, -1
        self.packed = self.keys * self.span + (self.times - self.tmin)

    def _domain(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(clipped keys, in-domain mask): PROBE keys outside the build key
        range would overflow the composite packing (keys * span wraps) and
        could land inside another key's block — clip them out first."""
        ok = (keys >= self.kmin) & (keys <= self.kmax)
        return np.where(ok, keys, self.kmin), ok

    def asof(self, keys: np.ndarray, times: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """For each (key, t): index of the LAST build row with the same key
        and time <= t.  Returns (idx into sorted order, matched bool)."""
        keys = np.asarray(keys, np.int64)
        if self.keys.size == 0:  # empty build side: LEFT semantics, no match
            return np.full(keys.size, -1, np.int64), np.zeros(keys.size, bool)
        ckeys, ok = self._domain(keys)
        off = np.clip(np.asarray(times, np.int64) - self.tmin, -1, self.span - 1)
        probe = ckeys * self.span + off
        idx = np.searchsorted(self.packed, probe, side="right") - 1
        matched = ok & (idx >= 0) & (self.keys[np.maximum(idx, 0)] == keys)
        return idx, matched

    def range_count(self, keys: np.ndarray, t_lo: np.ndarray, t_hi: np.ndarray) -> np.ndarray:
        """Per probe row: count of build rows with the same key and
        time in [t_lo, t_hi]."""
        keys = np.asarray(keys, np.int64)
        ckeys, ok = self._domain(keys)
        lo = np.clip(np.asarray(t_lo, np.int64) - self.tmin, 0, self.span)
        hi = np.clip(np.asarray(t_hi, np.int64) - self.tmin, -1, self.span - 1)
        left = np.searchsorted(self.packed, ckeys * self.span + lo, side="left")
        right = np.searchsorted(self.packed, ckeys * self.span + hi, side="right")
        return np.where(ok, np.maximum(right - left, 0), 0)


def asof_join(
    ds,
    build_keys: np.ndarray,
    build_times: np.ndarray,
    probe_key: str,
    probe_time: str,
    out_col: str = "asof_time",
):
    """ASOF LEFT JOIN: for each probe row, the latest build time <= probe
    time for the same key (null when none).  Returns a Dataset with
    ``out_col`` appended (epoch-int64 of the matched build time)."""
    import functools

    import ray

    iref = ray.put(AsofIndex(build_keys, build_times))

    def _probe(t: pa.Table, *, iref, probe_key, probe_time, out_col) -> pa.Table:
        index: AsofIndex = ray.get(iref)  # local zero-copy fetch
        k, kv = _int64_valid(t.column(probe_key))
        tt, tv = _int64_valid(t.column(probe_time))
        idx, matched = index.asof(k, tt)
        matched &= kv & tv  # NULL key/time never matches (SQL ASOF)
        times = index.times[np.maximum(idx, 0)] if index.times.size else np.zeros(len(k), np.int64)
        vals = pa.array(times, pa.int64())
        # null out unmatched probes (LEFT semantics) via take-with-null-idx
        sel = pa.array(np.arange(len(k), dtype=np.int64), mask=~matched)
        return t.append_column(out_col, vals.take(sel))

    return ds.map_batches(
        functools.partial(_probe, iref=iref, probe_key=probe_key, probe_time=probe_time, out_col=out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _int64_valid(col) -> tuple[np.ndarray, np.ndarray]:
    """(int64 values with nulls filled as 0, validity mask) for a join
    key/time column.  The bare to_numpy path converts a null-bearing int
    column through float64 NaN, and NaN.astype(int64) is ~INT64_MIN —
    which the composite-packing clip then WRAPS into a spurious match at
    the key's latest build time.  SQL join/ASOF conditions never match on
    NULL, so callers AND the validity mask into `matched`."""
    import pyarrow.compute as pc

    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col)
    col = col.cast(pa.int64())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
        col = pc.fill_null(col, 0)
    else:
        valid = np.ones(len(col), dtype=bool)
    return col.to_numpy(zero_copy_only=False).astype(np.int64), valid


def _hash_part(k: np.ndarray, num_partitions: int) -> np.ndarray:
    """Fibonacci-mix hash partition of int64 keys (structured key values
    like user ids must not alias a partition stripe)."""
    x = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    return (x % np.uint64(num_partitions)).astype(np.int64)


def _key_partition(arr, num_partitions: int) -> np.ndarray:
    """Per-row hash partition for ANY join-key type — the partitioned
    semi/anti arm must accept string/binary keys, not force an int64
    cast that raises the first time the arm engages in production.
    Nulls land in partition 0 (null keys never match; they just need a
    deterministic home)."""
    import pyarrow.compute as pc

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    ty = arr.type
    if pa.types.is_integer(ty) or pa.types.is_temporal(ty) or pa.types.is_boolean(ty):
        k, _ = _int64_valid(arr)
        return _hash_part(k, num_partitions)
    if (
        pa.types.is_string(ty)
        or pa.types.is_large_string(ty)
        or pa.types.is_binary(ty)
        or pa.types.is_large_binary(ty)
    ):
        if arr.null_count:
            arr = pc.fill_null(arr, "" if pa.types.is_string(ty) or pa.types.is_large_string(ty) else b"")
        from .dedup import _varbytes
        from .text import _fnv1a_segmented

        concat, offsets = _varbytes(pa.table({"x": arr}).column("x"))
        return (_fnv1a_segmented(concat, offsets) % np.uint64(num_partitions)).astype(np.int64)
    raise TypeError(f"semi/anti join key type {ty} is not hash-partitionable")


def asof_join_partitioned(
    probe_ds,
    build_ds,
    build_key: str,
    build_time: str,
    probe_key: str,
    probe_time: str,
    out_col: str = "asof_time",
    num_partitions: int = 16,
):
    """ASOF LEFT JOIN with a build side too large to broadcast: both
    sides are hash-partitioned on the key and co-located with ONE
    groupby(part).map_groups shuffle; each partition builds a local
    sorted composite index and probes it with the same vectorized
    searchsorted kernel as the broadcast arm.  Nothing is materialized
    on the driver.  The int64 composite-packing bound applies per
    partition (narrower key range than the global build side)."""
    probe_fields = list(probe_ds.schema().base_schema)

    def tag_probe(t: pa.Table) -> pa.Table:
        kcast = t.column(probe_key).cast(pa.int64())  # nulls preserved
        kfill, _ = _int64_valid(kcast)
        cols = {f.name: t.column(f.name) for f in probe_fields}
        cols["_k"] = kcast
        cols["_t"] = t.column(probe_time).cast(pa.int64())
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["_part"] = pa.array(_hash_part(kfill, num_partitions))
        return pa.table(cols)

    def tag_build(t: pa.Table) -> pa.Table:
        kcast = t.column(build_key).cast(pa.int64())
        kfill, _ = _int64_valid(kcast)
        cols = {f.name: pa.nulls(t.num_rows, f.type) for f in probe_fields}
        cols["_k"] = kcast
        cols["_t"] = t.column(build_time).cast(pa.int64())
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["_part"] = pa.array(_hash_part(kfill, num_partitions))
        return pa.table(cols)

    tagged = probe_ds.map_batches(
        tag_probe, batch_format="pyarrow", zero_copy_batch=True
    ).union(build_ds.map_batches(tag_build, batch_format="pyarrow", zero_copy_batch=True))

    out_fields = [(f.name, f.type) for f in probe_fields] + [(out_col, pa.int64())]

    def per_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return pa.table({n: pa.array([], t) for n, t in out_fields})
        side = g.column("_side").combine_chunks()
        b = g.filter(pc.equal(side, 0))
        p = g.filter(pc.equal(side, 1))
        if p.num_rows == 0:
            return pa.table({n: pa.array([], t) for n, t in out_fields})
        bk, bkv = _int64_valid(b.column("_k"))
        bt, btv = _int64_valid(b.column("_t"))
        keep = bkv & btv  # null build key/time can never match — drop
        index = AsofIndex(bk[keep], bt[keep])
        k, kv = _int64_valid(p.column("_k"))
        tt, tv = _int64_valid(p.column("_t"))
        idx, matched = index.asof(k, tt)
        matched &= kv & tv
        times = index.times[np.maximum(idx, 0)] if index.times.size else np.zeros(len(k), np.int64)
        vals = pa.array(times, pa.int64())
        sel = pa.array(np.arange(len(k), dtype=np.int64), mask=~matched)
        cols = {f.name: p.column(f.name) for f in probe_fields}
        cols[out_col] = vals.take(sel)
        return pa.table(cols)

    return tagged.groupby("_part").map_groups(per_part, batch_format="pyarrow")


def asof_join_auto(
    probe_ds,
    build_keys: np.ndarray,
    build_times: np.ndarray,
    probe_key: str,
    probe_time: str,
    out_col: str = "asof_time",
    broadcast_threshold_rows: int = 5_000_000,
    num_partitions: int = 16,
):
    """Arm selection for the as-of join: a build side at most
    ``broadcast_threshold_rows`` rows is broadcast once (one object-store
    copy per node); above that both sides hash-partition.  The two arms
    are parity-tested with the threshold forced to 0."""
    import ray

    if len(build_keys) <= broadcast_threshold_rows:
        return asof_join(probe_ds, build_keys, build_times, probe_key, probe_time, out_col)
    build_ds = ray.data.from_arrow(
        pa.table({"_bk": np.asarray(build_keys, np.int64), "_bt": np.asarray(build_times, np.int64)})
    )
    return asof_join_partitioned(
        probe_ds, build_ds, "_bk", "_bt", probe_key, probe_time, out_col, num_partitions
    )


def range_count_join(
    ds,
    build_keys: np.ndarray,
    build_times: np.ndarray,
    probe_key: str,
    probe_time: str,
    window: int,
    out_col: str = "n_in_window",
):
    """Range join + count: per probe row, how many build rows share the key
    with time in [probe_time - window, probe_time] (window in the time
    column's units)."""
    import functools

    import ray

    iref = ray.put(AsofIndex(build_keys, build_times))

    def _probe(t: pa.Table, *, iref, probe_key, probe_time, window, out_col) -> pa.Table:
        index: AsofIndex = ray.get(iref)
        k, kv = _int64_valid(t.column(probe_key))
        tt, tv = _int64_valid(t.column(probe_time))
        n = index.range_count(k, tt - window, tt)
        n = np.where(kv & tv, n, 0)  # NULL key/time joins nothing
        return t.append_column(out_col, pa.array(n.astype(np.int64)))

    return ds.map_batches(
        functools.partial(
            _probe, iref=iref, probe_key=probe_key, probe_time=probe_time, window=window, out_col=out_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def build_bloom_stream(ds, col: str, expected_items: int, fpp: float = 0.01) -> bytes:
    """Distributed Bloom-filter build over a Dataset column.

    The semi-join build side: every batch emits ONE fixed-geometry
    partial filter (geometry derived from ``expected_items``/``fpp`` so
    partials are OR-mergeable), and the driver merges O(batches) filters
    of a few KiB each — row count never matters driver-side.  The merged
    filter is the broadcast probe object for ``bloom.might_contain_many``
    inside the big side's ``map_batches``: rows whose key is definitely
    absent never enter the join shuffle.  The analog of the reference's
    BloomFilterUtf8 index consulted by SargsApplier (SURVEY.md §2.5),
    lifted from chunk pruning to join pruning.
    """
    import functools

    from ..codecs import bloom

    m, k = bloom._params(max(int(expected_items), 1), fpp)

    def part(t: pa.Table, *, col, m, k) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"f": pa.array([], pa.large_binary())})
        f = bloom.build(t.column(col), m=m, k=k)
        return pa.table({"f": pa.array([f], pa.large_binary())})

    # EVERY row of every block is a partial filter: a task that processed
    # several batches coalesces its 1-row partials into one multi-row
    # block, and taking only row 0 would drop the rest — bloom false
    # NEGATIVES, i.e. silently deleted join rows
    parts = [
        f
        for p in ds.map_batches(
            functools.partial(part, col=col, m=m, k=k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if p.num_rows
        for f in p.column("f").to_pylist()
    ]
    if not parts:
        return bloom.build(pa.array([], pa.int64()), m=m, k=k)
    return bloom.merge(parts)


def join_adaptive(
    big_ds,
    small_ds,
    big_key: str,
    small_key: str,
    payload_cols: list[str],
    threshold_rows: int = 500_000,
    num_partitions: int = 8,
    how: str = "inner",
):
    """Inner equi-join with runtime strategy selection — the optimizer
    move every host engine applies around ORC scans (SURVEY.md §2.8).

    The (presumed) small side is materialized first; if it holds at most
    ``threshold_rows`` rows it is broadcast ONCE (``ray.put``) and the
    big side probes it with a vectorized ``index_in`` inside
    ``map_batches`` — the big side never shuffles.  Above the threshold
    it falls back to a hash-shuffle ``Dataset.join`` (both sides
    co-partitioned).  The threshold is a per-node object-store budget:
    one (key + payload) copy per node, NOT per batch.

    Returns a Dataset with the big side's columns plus ``payload_cols``.
    ``how="left"`` keeps unmatched big-side rows with null payload (LEFT
    OUTER): on the broadcast arm the index_in take yields nulls for
    misses naturally; the shuffle arm maps to Dataset.join left_outer.
    Duplicate keys on the small side are NOT supported on the broadcast
    path (index_in resolves one match) — callers pre-aggregate, as every
    pipeline here already does.
    """
    import functools

    import pyarrow.compute as pc
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    small = small_ds.materialize()
    if small.count() <= threshold_rows:
        t = pa.concat_tables(
            small.iter_batches(batch_format="pyarrow", batch_size=None)
        ).combine_chunks() if small.count() else None
        if t is None:
            if how == "left":
                sch = small.schema().base_schema
                types = {f.name: f.type for f in sch}

                def all_null(b: pa.Table, *, types, payload_cols) -> pa.Table:
                    for c in payload_cols:
                        b = b.append_column(c, pa.nulls(b.num_rows, types[c]))
                    return b

                return big_ds.map_batches(
                    functools.partial(all_null, types=types, payload_cols=payload_cols),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            # empty build side + inner join -> no rows; emit empty slices
            # (schema-preserving, vectorized) rather than a per-row filter
            return big_ds.map_batches(
                lambda b: b.slice(0, 0), batch_format="pyarrow", zero_copy_batch=True
            )
        ref = ray.put((t.column(small_key).combine_chunks(),
                       {c: t.column(c).combine_chunks() for c in payload_cols}))

        def probe(b: pa.Table, *, ref, big_key, payload_cols, how) -> pa.Table:
            keys, payload = ray.get(ref)
            bk = b.column(big_key)
            pos = pc.index_in(bk, value_set=keys)
            # SQL equality NEVER matches NULL = NULL, but Arrow's index_in
            # pairs a null probe with a null build key: force the miss
            if bk.null_count and keys.null_count:
                pos = pc.if_else(pc.is_valid(bk), pos, pa.scalar(None, pos.type))
            if how == "inner":
                hit = pc.is_valid(pos)
                b = b.filter(hit)
                pos = pos.filter(hit)
            for c in payload_cols:
                b = b.append_column(c, pc.take(payload[c], pos))
            return b

        return big_ds.map_batches(
            functools.partial(probe, ref=ref, big_key=big_key, payload_cols=payload_cols, how=how),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # project the small side to key + payload BEFORE the shuffle: the two
    # arms must emit the same schema (the broadcast arm appends exactly
    # payload_cols), and non-payload columns have no business in the
    # exchange anyway
    return big_ds.join(
        small.select_columns([small_key] + list(payload_cols)),
        join_type="left_outer" if how == "left" else "inner",
        num_partitions=num_partitions,
        on=(big_key,),
        right_on=(small_key,),
        # 0-CPU aggregators: the shuffle pool is memory-bound, and join
        # aggregator actors LINGER after execution — a reserved-CPU pool
        # left behind by one join can deadlock every later pipeline on a
        # small cluster (substring._join_parallelism has the incident)
        aggregator_ray_remote_args={"num_cpus": 0},
    )


def join_semi_anti(
    big_ds,
    keys_ds,
    big_key: str,
    keys_key: str,
    *,
    anti: bool = False,
    threshold_rows: int = 500_000,
    num_partitions: int = 16,
):
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) equi-join:
    keep the big side's rows whose key does (not) appear in ``keys_ds``.
    The host-engine EXISTS / NOT EXISTS rewrite around an ORC scan
    (SURVEY.md §2.8), as a first-class operator.

    Two arms, selected by the key-side's distinct count:
    - *broadcast* (<= threshold_rows distinct keys): the deduplicated key
      set ships to the object store ONCE (``ray.put``); each probe batch
      filters with one vectorized ``is_in``.  The big side never moves.
    - *partitioned* (above threshold): both sides are hash-partitioned on
      a Fibonacci-mixed key hash and co-located with ONE
      groupby(part).map_groups shuffle; each partition probes its local
      key set — nothing is materialized on the driver (the dedup_ngram /
      asof_join_partitioned shape).

    Null big-side keys never match: semi drops them, anti keeps them
    (NOT-IN SQL semantics differ — mirror with NOT EXISTS, not NOT IN).
    Arm parity is pinned by tests (threshold_rows=0 forces the
    partitioned arm on small fixtures).
    """
    import functools

    import pyarrow.compute as pc
    import ray

    # distinct keys, distributed: per-batch unique -> one concat of the
    # (much smaller) uniques stream; bounded by the true distinct count
    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({keys_key: pc.unique(t.column(keys_key).combine_chunks())})

    # arm decision with a BOUNDED driver footprint: accumulate per-batch
    # uniques with periodic re-dedup and bail to the partitioned arm the
    # moment the running distinct count exceeds the threshold — the old
    # collect-everything-then-count defeated the partitioned arm's whole
    # purpose (a billion-distinct-key side OOM'd the driver before the
    # arm was ever chosen).  Peak driver rows: ~2x threshold + one batch.
    kparts: list[pa.Table] = []
    running = 0
    overflow = False
    for p in keys_ds.map_batches(
        uniq, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if not p.num_rows:
            continue
        kparts.append(p)
        running += p.num_rows
        if running > threshold_rows:
            merged = pc.unique(pa.concat_tables(kparts).column(keys_key).combine_chunks())
            kparts = [pa.table({keys_key: merged})]
            running = len(merged)
            if running > threshold_rows:
                overflow = True
                break
    kset = (
        pc.unique(pa.concat_tables(kparts).column(keys_key).combine_chunks())
        if kparts and not overflow
        else None
    )
    if kset is not None and kset.null_count:
        kset = kset.drop_null()

    if not overflow and (kset is None or len(kset) <= threshold_rows):
        ref = ray.put(kset)

        def probe(b: pa.Table, *, ref) -> pa.Table:
            ks = ray.get(ref)
            if ks is None or len(ks) == 0:
                return b if anti else b.slice(0, 0)
            m = pc.is_in(b.column(big_key), value_set=ks)
            if anti:
                m = pc.invert(m)  # is_in yields false (not null) for null probes
            return b.filter(m)

        return big_ds.map_batches(
            functools.partial(probe, ref=ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    big_fields = list(big_ds.schema().base_schema)

    def tag_big(t: pa.Table) -> pa.Table:
        cols = {f.name: t.column(f.name) for f in big_fields}
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["_part"] = pa.array(_key_partition(t.column(big_key), num_partitions))
        return pa.table(cols)

    big_key_type = next(f.type for f in big_fields if f.name == big_key)

    def tag_keys(t: pa.Table) -> pa.Table:
        kc = pc.unique(t.column(keys_key).combine_chunks()).drop_null()
        kc = kc.cast(big_key_type)
        cols = {f.name: pa.nulls(len(kc), f.type) for f in big_fields}
        cols[big_key] = kc
        cols["_side"] = pa.array(np.zeros(len(kc), np.int8))
        cols["_part"] = pa.array(_key_partition(kc, num_partitions))
        return pa.table(cols)

    tagged = big_ds.map_batches(
        tag_big, batch_format="pyarrow", zero_copy_batch=True
    ).union(keys_ds.map_batches(tag_keys, batch_format="pyarrow", zero_copy_batch=True))

    def per_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in big_fields})
        side = g.column("_side").combine_chunks()
        ks = pc.unique(g.filter(pc.equal(side, 0)).column(big_key).combine_chunks())
        b = g.filter(pc.equal(side, 1)).drop_columns(["_side", "_part"])
        if len(ks) == 0:
            return b if anti else b.slice(0, 0)
        m = pc.is_in(b.column(big_key), value_set=ks)
        if anti:
            m = pc.invert(m)
        return b.filter(m)

    return tagged.groupby("_part").map_groups(per_part, batch_format="pyarrow")
