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


def _zero_scalar(t: pa.DataType):
    """A canonical constant of type ``t`` used to fill null sort keys.
    The value never surfaces: it only has to be identical across batches
    so null-keyed rows stay contiguous after the range sort."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, t)
    return pa.scalar(0, t)  # ints/floats/temporal/decimal


def _nullsafe_sorted(ds, keys: list[str], order_by: list[str] | None = None,
                     order_desc: list[bool] | None = None):
    """``ds.sort(keys + order_by)`` that tolerates null values in the
    ``keys`` (PARTITION BY / GROUP BY) columns.

    Ray Data's sort compares boundary samples with Python ``<`` and
    raises TypeError the moment two null keys (or a null and a value)
    meet, so nulls cannot ride through the shuffle directly.  Each key
    gains a companion ``__nn_<k>`` int8 flag and is filled with a
    type-canonical constant; the sort runs on the interleaved
    (flag, filled) columns — a total order on key tuples with nulls
    LAST — and ``_restore_null_keys`` re-nulls the flagged rows inside
    the per-block stage.  Cost: one int8 column per key in the shuffle
    payload and one vectorized is_null/fill_null pass.  ``order_by``
    columns are sorted as-is (null ORDER BY values stay unsupported —
    their SQL semantics need an explicit NULLS FIRST/LAST decision)."""
    import pyarrow.compute as pc

    order_by = order_by or []
    aux = [f"__nn_{k}" for k in keys]

    def tag(t: pa.Table) -> pa.Table:
        cols = {}
        for k, a in zip(keys, aux):
            col = t.column(k)
            cols[a] = pc.cast(pc.is_null(col), pa.int8())
            if col.null_count:
                col = pc.fill_null(col, _zero_scalar(col.type))
            cols[k] = col
        for c in t.column_names:
            if c not in cols:
                cols[c] = t.column(c)
        return pa.table(cols)

    sort_cols = [c for pair in zip(aux, keys) for c in pair] + list(order_by)
    desc = [False] * (2 * len(keys)) + list(order_desc or [False] * len(order_by))
    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).sort(
            sort_cols, descending=desc
        ),
        aux,
    )


def _restore_null_keys(t: pa.Table, keys: list[str], aux: list[str]) -> pa.Table:
    """Undo ``_nullsafe_sorted``'s fill: re-null flagged key rows and
    drop the flag columns."""
    import pyarrow.compute as pc

    for k, a in zip(keys, aux):
        if a not in t.column_names:
            return t  # schema-less empty sort partition
        flag = pc.cast(t.column(a), pa.bool_())
        if pc.any(flag).as_py():
            col = t.column(k)
            typ = col.type
            restored = pc.if_else(flag, pa.scalar(None, typ), col.combine_chunks())
            t = t.set_column(t.schema.get_field_index(k), k, restored)
    return t.drop_columns(aux)


def _key_detection_np(t: pa.Table, keys: list[str]) -> list[np.ndarray]:
    """Numpy arrays for run detection over sorted blocks: one
    (filled value, is-null flag) PAIR per key — never exposing None/NaN
    to numpy comparisons (an int64 column with nulls reaches numpy as
    float NaN, and NaN != NaN would split the null group row-by-row).
    Always pairs, even for null-free columns, so cross-block key tuples
    built from these arrays have a stable arity."""
    import pyarrow.compute as pc

    det: list[np.ndarray] = []
    for k in keys:
        col = t.column(k)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flag = pc.is_null(col).to_numpy(zero_copy_only=False)
        if col.null_count:
            col = pc.fill_null(col, _zero_scalar(col.type))
        det.append(col.to_numpy(zero_copy_only=False))
        det.append(flag)
    return det


def _det_tuple(det: list[np.ndarray], i: int) -> tuple:
    """Comparable key tuple at row ``i`` from detection arrays, ordered
    (flag, filled) per key so tuple '<' realizes the null-LAST total
    order without ever comparing None."""
    out = []
    for j in range(0, len(det), 2):
        out.append(bool(det[j + 1][i]))
        out.append(det[j][i])
    return tuple(out)


def _sorted_for_keys(ds, keys: list[str], order_by: list[str] | None = None,
                     order_desc: list[bool] | None = None):
    """Materialized ``ds.sort(keys + order_by)`` tolerating null keys,
    at zero cost on the common (null-free) path.

    Fast path: plain Ray sort.  With null keys it either (a) raises
    TypeError while sorting boundary SAMPLES with Python '<', or
    (b) completes with the null-greatest total order (block-internal
    pyarrow sorts are nulls-last and find_partition_index maps null
    boundaries/rows through NULL_SENTINEL) — stress-tested across null
    densities: raise-or-correct, never silent misplacement; downstream
    stages additionally force null groups onto the healing path or
    assert block ordering, so (b) is verified, not assumed.  On (a) we
    retry through ``_nullsafe_sorted`` (tagged flag+filled sort) and
    return its aux column names for the per-block restore."""
    order_by = order_by or []
    desc = [False] * len(keys) + list(order_desc or [False] * len(order_by))
    try:
        return ds.sort(keys + order_by, descending=desc).materialize(), []
    except TypeError:
        pass  # driver-side sample comparison (rare: local/tiny datasets)
    except Exception as e:  # RayTaskError wraps the worker-side TypeError
        # match the exact null-comparison signature ("'<' not supported
        # between instances of 'NoneType' and ..."), not the bare word
        # "TypeError": an unrelated TypeError raised in an upstream
        # map_batches UDF must propagate, not trigger a silent re-execute
        # of the whole pipeline through the tagged-sort retry
        if "'<' not supported" not in str(e):
            raise
    sorted_ds, aux = _nullsafe_sorted(ds, keys, order_by, order_desc)
    return sorted_ds.materialize(), aux


def _block_total(t: pa.Table, val: str) -> int:
    import pyarrow.compute as pc

    if t.num_rows == 0:  # empty sort partitions may be schema-less
        return 0
    s = pc.sum(t.column(val)).as_py()
    return int(s or 0)


def _sum_values_np(col) -> np.ndarray:
    """int64 view of a SUM-family value column with SQL null semantics:
    nulls contribute 0 (identical to pc.sum's null-skipping, which
    _block_total already uses — the two lanes must agree or block
    offsets desynchronize).  Without the fill, Arrow->numpy converts a
    null-bearing int column through float64 NaN and astype(int64) turns
    each null into ~INT64_MIN garbage."""
    import pyarrow.compute as _pc

    if getattr(col, "null_count", 0):
        col = _pc.fill_null(col, 0)
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _add_scan(t: pa.Table, val: str, out: str, offset: int, inclusive: bool) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({})  # dropped by consumers (0 rows)
    v = _sum_values_np(t.column(val))
    c = np.cumsum(v) + np.int64(offset)
    if not inclusive:
        c -= v
    return t.append_column(out, pa.array(c))


def with_prefix_sum(ds, sort_keys: list[str], val: str, out: str = "cum_prev",
                    inclusive: bool = False):
    """Global running sum of ``val`` in ``sort_keys`` order — the window
    `SUM(val) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)` analog
    (exclusive by default: each row sees the sum of STRICTLY preceding
    rows).

    Shape: one range sort; per-block totals are tiny Ray tasks; the
    driver holds only the O(blocks) exclusive scan of block totals; a
    second task per block adds its offset + local cumsum and the result
    re-enters as a Dataset (``from_arrow_refs`` — blocks never touch the
    driver).  Raw tasks are justified here: a global scan is a carried
    dependency the Dataset API cannot express (SURVEY.md §2.8 rule (c)).
    """
    import ray

    sorted_ds = ds.sort(sort_keys).materialize()
    refs = [r for b in sorted_ds.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return sorted_ds
    total_task = ray.remote(num_cpus=0.5)(_block_total)
    totals = ray.get([total_task.remote(r, val) for r in refs])
    offsets = np.zeros(len(totals), dtype=np.int64)
    np.cumsum(np.asarray(totals[:-1], dtype=np.int64), out=offsets[1:])
    scan_task = ray.remote(num_cpus=1)(_add_scan)
    out_refs = [
        scan_task.remote(r, val, out, int(off), inclusive) for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def _check_block_order(first_last_pairs) -> None:
    """O(blocks) sanity check on the fast-path sort: consecutive blocks'
    (first, last) key tuples must be non-decreasing under the null-LAST
    order the detection tuples realize.  A violation would mean the
    sort scattered a key group across non-adjacent blocks (never
    observed: Ray raises instead when null keys reach its boundary
    samples) and the carry walk would silently mis-rank — fail loudly."""
    prev_last = None
    for pair in first_last_pairs:
        if pair is None:
            continue
        first_key, last_key = pair
        if prev_last is not None and first_key < prev_last:
            raise RuntimeError(
                "window sort produced non-contiguous key blocks "
                f"({prev_last!r} then {first_key!r}) — null keys in the "
                "PARTITION BY columns hit an unsupported Ray sort path"
            )
        prev_last = last_key


def _block_key_edges(t: pa.Table, keys: list[str], aux: tuple = ()):
    """(first key tuple, last key tuple, #rows of the last key) for one
    sorted block — the carry metadata for the segmented rank scan; None
    for an empty block.  Key tuples come from the (flag, filled)
    detection arrays: comparable and equality-exact even for null keys."""
    if t.num_rows == 0:
        return None
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    det = _key_detection_np(t, keys)
    starts = _group_starts(det)
    first_key = _det_tuple(det, 0)
    last_key = _det_tuple(det, t.num_rows - 1)
    n_last = t.num_rows - int(starts[-1])
    return first_key, last_key, n_last


def _add_ranks(t: pa.Table, keys: list[str], out: str, carry: int,
               aux: tuple = ()) -> pa.Table:
    """Within-key ordinals for one sorted block; ``carry`` is how many
    rows of the block's FIRST key preceded this block.  ``aux`` names the
    null-flag companions: run detection uses (filled key, flag) pairs —
    numpy-native, no NaN/None comparisons — and the block is re-nulled
    before the rank column is appended."""
    if t.num_rows == 0:
        return pa.table({})
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    starts = _group_starts(_key_detection_np(t, keys))
    n = t.num_rows
    seg = np.repeat(starts, np.diff(np.r_[starts, n]))
    rnk = np.arange(n, dtype=np.int64) - seg + 1
    rnk[: (int(starts[1]) if starts.size > 1 else n)] += carry
    return t.append_column(out, pa.array(rnk))


def with_group_ranks(ds, keys: list[str], order_by: list[str],
                     descending: list[bool] | None = None, out: str = "rnk"):
    """ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order_by) as a
    Dataset — the distributed window-rank operator.

    One range sort on keys+order_by; a tiny per-block edge task feeds an
    O(blocks) driver walk that carries the running count of the key
    spanning each block boundary (segmented-scan carry); a second task
    per block assigns within-key ordinals vectorized.  Works for
    UNBOUNDED key domains (nothing O(keys) anywhere) — the scale path
    behind per-domain capping."""
    import ray

    sorted_ds, aux = _sorted_for_keys(ds, keys, order_by, descending)
    refs = [r for b in sorted_ds.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return sorted_ds
    edge_task = ray.remote(num_cpus=0.5)(_block_key_edges)
    edges = ray.get([edge_task.remote(r, keys, tuple(aux)) for r in refs])
    _check_block_order(e[:2] if e else None for e in edges)
    # O(blocks) driver walk: carry the running row count of the key that
    # spans each block boundary (a block wholly inside one key keeps the
    # run going: first_key == last_key -> carry + n_last)
    carries = []
    prev_key, prev_run = None, 0
    for e in edges:
        if e is None:  # empty block
            carries.append(0)
            continue
        first_key, last_key, n_last = e
        carry = prev_run if first_key == prev_key else 0
        carries.append(carry)
        prev_run = (carry + n_last) if first_key == last_key else n_last
        prev_key = last_key
    rank_task = ray.remote(num_cpus=1)(_add_ranks)
    out_refs = [rank_task.remote(r, keys, out, int(c), tuple(aux)) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


def _block_key_sums(t: pa.Table, keys: list[str], val: str, aux: tuple = ()):
    """(first key, last key, sum(val) of the last key's rows) — carry
    metadata for the segmented prefix sum; None for an empty block."""
    if t.num_rows == 0:
        return None
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    det = _key_detection_np(t, keys)
    v = _sum_values_np(t.column(val))
    starts = _group_starts(det)
    first_key = _det_tuple(det, 0)
    last_key = _det_tuple(det, t.num_rows - 1)
    return first_key, last_key, int(v[int(starts[-1]):].sum())


def _add_group_scan(t: pa.Table, keys: list[str], val: str, out: str,
                    carry: int, inclusive: bool, aux: tuple = ()) -> pa.Table:
    """Per-key running sum within one sorted block + boundary carry."""
    if t.num_rows == 0:
        return pa.table({})
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    v = _sum_values_np(t.column(val))
    starts = _group_starts(_key_detection_np(t, keys))
    n = v.size
    c = np.cumsum(v)
    # subtract each key group's preceding total -> per-key running sums
    seg_base = np.repeat(c[starts] - v[starts], np.diff(np.r_[starts, n]))
    run = c - seg_base  # inclusive per-key cumsum
    if not inclusive:
        run -= v
    run[: (int(starts[1]) if starts.size > 1 else n)] += carry
    return t.append_column(out, pa.array(run))


def with_group_prefix_sum(ds, keys: list[str], order_by: list[str], val: str,
                          out: str = "run_sum", inclusive: bool = True,
                          descending: list[bool] | None = None):
    """SUM(val) OVER (PARTITION BY keys ORDER BY order_by ROWS UNBOUNDED
    PRECEDING) as a Dataset — the segmented sibling of with_prefix_sum,
    same O(blocks) carry walk but keyed: the driver carries the running
    sum of the key spanning each block boundary, never O(keys) state."""
    import ray

    sorted_ds, aux = _sorted_for_keys(ds, keys, order_by, descending)
    refs = [r for b in sorted_ds.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return sorted_ds
    edge_task = ray.remote(num_cpus=0.5)(_block_key_sums)
    edges = ray.get([edge_task.remote(r, keys, val, tuple(aux)) for r in refs])
    _check_block_order(e[:2] if e else None for e in edges)
    carries = []
    prev_key, prev_run = None, 0
    for e in edges:
        if e is None:
            carries.append(0)
            continue
        first_key, last_key, last_sum = e
        carry = prev_run if first_key == prev_key else 0
        carries.append(carry)
        prev_run = (carry + last_sum) if first_key == last_key else last_sum
        prev_key = last_key
    scan_task = ray.remote(num_cpus=1)(_add_group_scan)
    out_refs = [
        scan_task.remote(r, keys, val, out, int(c), inclusive, tuple(aux))
        for r, c in zip(refs, carries)
    ]
    return ray.data.from_arrow_refs(out_refs)


def _block_key_last(t: pa.Table, keys: list[str], val: str, aux: tuple = ()):
    """(first key, last key, last row's val) — LAG carry; None if empty."""
    if t.num_rows == 0:
        return None
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    det = _key_detection_np(t, keys)
    first_key = _det_tuple(det, 0)
    last_key = _det_tuple(det, t.num_rows - 1)
    return first_key, last_key, t.column(val)[t.num_rows - 1].as_py()


def _add_group_lag(t: pa.Table, keys: list[str], val: str, out: str, carry,
                   aux: tuple = ()) -> pa.Table:
    """Per-key LAG(val, 1) within one sorted block; ``carry`` is the
    previous block's last value iff it shares this block's first key."""
    if t.num_rows == 0:
        return pa.table({})
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    starts = _group_starts(_key_detection_np(t, keys))
    v = t.column(val)
    v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
    n = t.num_rows
    # take v[i-1]; group-first rows take a NULL index -> null lag
    mask = np.zeros(n, dtype=bool)
    mask[starts] = True
    idx = pa.array(np.maximum(np.arange(-1, n - 1), 0), mask=mask)
    lag = v.take(idx)
    if carry is not None:
        # block's first row continues the previous block's key
        lag = pa.concat_arrays([pa.array([carry], type=v.type), lag.slice(1)])
    return t.append_column(out, lag)


def with_group_lag(ds, keys: list[str], order_by: list[str], val: str,
                   out: str = "lag", descending: list[bool] | None = None):
    """LAG(val, 1) OVER (PARTITION BY keys ORDER BY order_by) as a
    Dataset — per-key previous value, null at each key's first row.
    Same O(blocks) keyed carry as the rank/sum scans: the driver carries
    only the boundary key's last value."""
    import ray

    sorted_ds, aux = _sorted_for_keys(ds, keys, order_by, descending)
    refs = [r for b in sorted_ds.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return sorted_ds
    edge_task = ray.remote(num_cpus=0.5)(_block_key_last)
    edges = ray.get([edge_task.remote(r, keys, val, tuple(aux)) for r in refs])
    _check_block_order(e[:2] if e else None for e in edges)
    carries = []
    prev_key, prev_val = None, None
    for e in edges:
        if e is None:
            carries.append(None)
            continue
        first_key, last_key, last_val = e
        carries.append(prev_val if first_key == prev_key else None)
        prev_key, prev_val = last_key, last_val
    lag_task = ray.remote(num_cpus=1)(_add_group_lag)
    out_refs = [lag_task.remote(r, keys, val, out, c, tuple(aux)) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


_HEAL_OP = {"min": "min", "max": "max", "sum": "sum", "count": "sum", "count_all": "sum"}


def agg_by_keys(ds, keys: list[str], aggs: list[tuple], stats_out: dict | None = None):
    """GROUP BY ``keys`` with Arrow-vectorized aggregates, as a Dataset.

    ``aggs`` is [(col, op, out_name)] with op in min|max|sum|count|
    count_all (count_all ignores col).  Same scale shape as sum_by_keys —
    one range sort co-locates keys, pyarrow's C++ group_by aggregates
    each block (any key/value type, no per-group Python), and only the
    <=2 groups per block owning the block's first/last key reach the
    driver for healing (min-of-mins / max-of-maxes / sum-of-sums).
    Null keys form their own group (SQL GROUP BY semantics): the edge
    detection compares endpoints null-safely (IS NOT DISTINCT FROM) and
    both Arrow group_by and the healing re-aggregate treat null as one
    group."""
    import ray
    import pyarrow.compute as pc

    arrow_aggs = [((c, op) if op != "count_all" else ([], "count_all")) for c, op, _ in aggs]
    part_names = [f"{c}_{op}" if op != "count_all" else "count_all" for c, op, _ in aggs]
    out_names = [o for _, _, o in aggs]

    def stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and not t.column_names:
            return pa.table({})  # schema-less empty sort partition
        if aux_names:
            t = _restore_null_keys(t, keys, aux_names)
        g = t.group_by(keys).aggregate(arrow_aggs)
        # groups owning the block's first/last sorted KEY TUPLE may
        # continue in neighbouring blocks.  The tuple must be compared as
        # a whole (AND of per-column equality per endpoint, then OR):
        # per-column first-or-last membership ANDed across keys would
        # flag up to 2^K cross-combination interior groups as boundary.
        if t.num_rows == 0:
            edge = pa.array([], pa.bool_())
        else:
            def eq_nullsafe(arr, scalar):
                # IS NOT DISTINCT FROM: a null endpoint (a null-keyed
                # group at the block edge) must match the null group —
                # plain pc.equal yields null there, which poisons the
                # AND/OR chain and the downstream filters then drop
                # EVERY group in the block (silent total loss)
                if not scalar.is_valid:
                    return pc.is_null(arr)
                return pc.fill_null(pc.equal(arr, scalar), False)

            eq_first = eq_last = None
            nullgrp = None
            for k in keys:
                col = t.column(k)
                f = eq_nullsafe(g.column(k), col[0])
                l = eq_nullsafe(g.column(k), col[-1])
                eq_first = f if eq_first is None else pc.and_(eq_first, f)
                eq_last = l if eq_last is None else pc.and_(eq_last, l)
                isn = pc.is_null(g.column(k))
                nullgrp = isn if nullgrp is None else pc.or_(nullgrp, isn)
            edge = pc.or_(eq_first, eq_last)
            # null-keyed groups ALWAYS heal on the driver: their
            # placement after the fast-path sort is then irrelevant to
            # correctness (the heal re-aggregates across every block),
            # at O(null groups per block) extra driver rows
            edge = pc.or_(edge, nullgrp)
        cols = {k: g.column(k) for k in keys}
        for pn, on in zip(part_names, out_names):
            cols[on] = g.column(pn)
        cols["_edge"] = edge
        return pa.table(cols)

    sorted_ds, aux_names = _sorted_for_keys(ds, keys)
    mixed = (
        sorted_ds
        .map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def interior_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:  # schema-less empty block
            return pa.table({})
        keep = t.filter(pc.invert(t.column("_edge").combine_chunks()))
        return keep.drop_columns(["_edge"])

    interior_ds = mixed.map_batches(interior_rows, batch_format="pyarrow", zero_copy_batch=True)

    def edge_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:
            return pa.table({})
        return t.filter(t.column("_edge").combine_chunks()).drop_columns(["_edge"])

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
    b = pa.concat_tables(bparts).combine_chunks()
    healed = b.group_by(keys).aggregate(
        [(o, _HEAL_OP[op]) for (_, op, _), o in zip(aggs, out_names)]
    )
    # arrow names the re-aggregated columns f"{out}_{healop}"
    ren = {f"{o}_{_HEAL_OP[op]}": o for (_, op, _), o in zip(aggs, out_names)}
    healed = healed.rename_columns([ren.get(c, c) for c in healed.column_names])
    healed = healed.select(keys + out_names)
    return interior_ds.union(ray.data.from_arrow(healed))


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
        if t.num_rows == 0:
            if not t.column_names:  # schema-less empty sort partition
                return pa.table({})
            # derive key/value types from the input schema (keys may be
            # strings — a hardcoded int64 placeholder would poison the
            # dataset's unified schema)
            return pa.table(
                {
                    **{k: t.column(k) for k in keys},
                    "_v": pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.bool_()),
                }
            )
        if aux_names:
            t = _restore_null_keys(t, keys, aux_names)
        det = _key_detection_np(t, keys)
        v = _sum_values_np(t.column(val))
        starts, sums = _run_sums(det, v)
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True  # first/last group may continue in neighbour blocks
        # null-keyed runs ALWAYS heal on the driver -> placement-
        # independent correctness after the fast-path sort
        for j in range(1, len(det), 2):
            edge |= det[j][starts]
        idx = pa.array(starts)
        return pa.table(
            {
                **{k: t.column(k).take(idx) for k in keys},
                "_v": pa.array(sums),
                "_edge": pa.array(edge),
            }
        )

    sorted_ds, aux_names = _sorted_for_keys(ds, keys)
    mixed = (
        sorted_ds
        .map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def interior_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:  # schema-less empty block
            return pa.table({})
        keep = t.filter(pc.invert(t.column("_edge").combine_chunks()))
        return pa.table({**{k: keep.column(k) for k in keys}, out: keep.column("_v")})

    interior_ds = mixed.map_batches(interior_rows, batch_format="pyarrow", zero_copy_batch=True)

    def edge_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:
            return pa.table({})
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
    # kernel, keeping every group (no interior split on the driver side).
    # Arrow sort_by, not np.lexsort: object arrays holding a null key
    # would hit Python's None-vs-value '<' TypeError.
    b = pa.concat_tables(bparts).combine_chunks()
    b = b.sort_by([(k, "ascending") for k in keys])  # Arrow: null-safe
    det = _key_detection_np(b, keys)
    v = _sum_values_np(b.column(val))
    starts, sums = _run_sums(det, v)
    take = pa.array(starts)
    healed = pa.table(
        {
            **{k: b.column(k).take(take) for k in keys},
            out: pa.array(sums),
        }
    )
    return interior_ds.union(ray.data.from_arrow(healed))


def string_agg_by_key(ds, key: str, order: str, val: str, n: str,
                      sep: str = " ", out: str = "joined",
                      n_out: str = "n", stats_out: dict | None = None):
    """STRING_AGG(val, sep ORDER BY order) + SUM(n) GROUP BY key, as a
    ray.data.Dataset — the order-SENSITIVE sibling of sum_by_keys (string
    concatenation is not commutative, so the healing pass must replay
    block order, which the carried first-ORDER value per partial run
    provides).

    Shape: ONE range sort on (key, order) is the only shuffle; each block
    joins its key runs with a vectorized pyarrow binary_join (no Python
    loop over rows); only the <=2 runs per block that touch a block edge
    reach the driver, are re-joined in (key, order) order with the same
    kernel, and re-enter as a tiny dataset.  ``val`` pieces must be
    non-null (callers construct them; SQL STRING_AGG would skip nulls).
    ``stats_out`` receives {"boundary_rows": ...} for driver-ceiling
    asserts.  Reference analog: none in ORC — this is query-surface
    machinery (SURVEY.md §2.8 rule (a): compose map_batches + sort)."""
    import ray
    import pyarrow.compute as pc

    def _join_runs(t: pa.Table, starts: np.ndarray):
        """(joined strings, piece-count sums) for runs starting at
        ``starts`` — one LargeList wrap + one binary_join."""
        off = np.empty(starts.size + 1, dtype=np.int64)
        off[:-1] = starts
        off[-1] = t.num_rows
        vals = t.column(val).combine_chunks()
        if not isinstance(vals, pa.LargeStringArray):
            vals = vals.cast(pa.large_string())
        lists = pa.LargeListArray.from_arrays(pa.array(off), vals)
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        cnt = t.column(n).to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.zeros(cnt.size + 1, dtype=np.int64)
        np.cumsum(cnt, out=csum[1:])
        return joined, csum[off[1:]] - csum[starts]

    def stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if not t.column_names:  # schema-less empty sort partition
                return pa.table({})
            return pa.table(
                {
                    key: t.column(key),
                    "_t": pa.array([], pa.large_string()),
                    "_n": pa.array([], pa.int64()),
                    "_g": t.column(order),
                    "_edge": pa.array([], pa.bool_()),
                }
            )
        if aux_names:
            t = _restore_null_keys(t, [key], aux_names)
        det = _key_detection_np(t, [key])
        starts = _group_starts(det)
        joined, sums = _join_runs(t, starts)
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        for j in range(1, len(det), 2):
            edge |= det[j][starts]
        idx = pa.array(starts)
        return pa.table(
            {
                key: t.column(key).take(idx),
                "_t": joined,
                "_n": pa.array(sums),
                "_g": t.column(order).take(idx),
                "_edge": pa.array(edge),
            }
        )

    sorted_ds, aux_names = _sorted_for_keys(ds, [key], order_by=[order])
    mixed = (
        sorted_ds
        .map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def interior_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:
            return pa.table({})
        keep = t.filter(pc.invert(t.column("_edge").combine_chunks()))
        return pa.table(
            {key: keep.column(key), out: keep.column("_t"), n_out: keep.column("_n")}
        )

    interior_ds = mixed.map_batches(interior_rows, batch_format="pyarrow", zero_copy_batch=True)

    def edge_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:
            return pa.table({})
        sub = t.filter(t.column("_edge").combine_chunks())
        return sub.select([key, "_t", "_n", "_g"])

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
    # heal: <=2 partial runs per block, re-joined in (key, order) order —
    # the carried _g (first order value of the partial) replays the
    # global order the block sort established
    b = pa.concat_tables(bparts).combine_chunks()
    b = b.sort_by([(key, "ascending"), ("_g", "ascending")])
    det = _key_detection_np(b, [key])
    starts = _group_starts(det)

    def _heal_join(t: pa.Table, starts: np.ndarray):
        off = np.empty(starts.size + 1, dtype=np.int64)
        off[:-1] = starts
        off[-1] = t.num_rows
        vals = t.column("_t").combine_chunks()
        if not isinstance(vals, pa.LargeStringArray):
            vals = vals.cast(pa.large_string())
        lists = pa.LargeListArray.from_arrays(pa.array(off), vals)
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        cnt = t.column("_n").to_numpy(zero_copy_only=False)
        csum = np.zeros(cnt.size + 1, dtype=np.int64)
        np.cumsum(cnt, out=csum[1:])
        return joined, csum[off[1:]] - csum[starts]

    joined, sums = _heal_join(b, starts)
    take = pa.array(starts)
    healed = pa.table(
        {key: b.column(key).take(take), out: joined, n_out: pa.array(sums)}
    )
    return interior_ds.union(ray.data.from_arrow(healed))


def list_concat_by_key(ds, key: str, order: str, val: str,
                       out: str = "concat", stats_out: dict | None = None):
    """Ordered per-key LIST concatenation — ``string_agg_by_key`` for
    ``list<T>`` columns: rows sharing ``key`` have their ``val`` lists
    concatenated in ``order`` order into one list per key.  The token-
    space assembly primitive behind pack_store (each training window's
    pieces flow here).

    Same shape as string_agg_by_key: ONE range sort on (key, order); per
    block the run concat is pure offset arithmetic over the already-
    contiguous flattened child (zero value copies beyond the take);
    <=2 boundary runs per block heal on the driver in replayed order."""
    import ray
    import pyarrow.compute as pc

    def _concat_runs(lists: pa.Array, starts: np.ndarray):
        """One list per run: child values are already contiguous in run
        order, so the concat is just coarser offsets."""
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        if lists.null_count:
            # null list == empty list for concatenation purposes
            lists = pc.fill_null(lists, pa.scalar([], lists.type))
        loff = np.asarray(lists.offsets)
        child = lists.values
        roff = np.empty(starts.size + 1, dtype=np.int64)
        roff[:-1] = loff[starts]
        roff[-1] = loff[-1]
        base = roff[0]
        if base or len(child) != int(roff[-1] - base):
            child = child.slice(int(base), int(roff[-1] - base))
            roff = roff - base
        if pa.types.is_large_list(lists.type):
            return pa.LargeListArray.from_arrays(pa.array(roff), child)
        return pa.ListArray.from_arrays(pa.array(roff.astype(np.int32), pa.int32()), child)

    def stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if not t.column_names:
                return pa.table({})
            return pa.table(
                {
                    key: t.column(key),
                    "_l": t.column(val),
                    "_g": t.column(order),
                    "_edge": pa.array([], pa.bool_()),
                }
            )
        if aux_names:
            t = _restore_null_keys(t, [key], aux_names)
        det = _key_detection_np(t, [key])
        starts = _group_starts(det)
        runs = _concat_runs(t.column(val), starts)
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        for j in range(1, len(det), 2):
            edge |= det[j][starts]
        idx = pa.array(starts)
        return pa.table(
            {
                key: t.column(key).take(idx),
                "_l": runs,
                "_g": t.column(order).take(idx),
                "_edge": pa.array(edge),
            }
        )

    sorted_ds, aux_names = _sorted_for_keys(ds, [key], order_by=[order])
    mixed = (
        sorted_ds
        .map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def interior_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:
            return pa.table({})
        keep = t.filter(pc.invert(t.column("_edge").combine_chunks()))
        return pa.table({key: keep.column(key), out: keep.column("_l")})

    interior_ds = mixed.map_batches(interior_rows, batch_format="pyarrow", zero_copy_batch=True)

    def edge_rows(t: pa.Table) -> pa.Table:
        if "_edge" not in t.column_names:
            return pa.table({})
        return t.filter(t.column("_edge").combine_chunks()).select([key, "_l", "_g"])

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
    b = pa.concat_tables(bparts, promote_options="default").combine_chunks()
    b = b.sort_by([(key, "ascending"), ("_g", "ascending")])
    det = _key_detection_np(b, [key])
    starts = _group_starts(det)
    runs = _concat_runs(b.column("_l"), starts)
    take = pa.array(starts)
    healed = pa.table({key: b.column(key).take(take), out: runs})
    return interior_ds.union(ray.data.from_arrow(healed))


def _order_change(t: pa.Table, order_by: list[str]) -> np.ndarray:
    """bool[n]: row i's order tuple differs from row i-1's (row 0 True)."""
    n = t.num_rows
    ch = np.zeros(n, dtype=bool)
    ch[0] = True
    for c in order_by:
        v = t.column(c).to_numpy(zero_copy_only=False)
        ch[1:] |= v[1:] != v[:-1]
    return ch


def _block_tie_edges(t: pa.Table, keys: list[str], order_by: list[str],
                     aux: tuple = ()):
    """Carry metadata for the tie-aware rank scan over one sorted block:
    (first key, first order tuple, last key, last order tuple,
     rows of last key, distinct order values of last key,
     row-offset of the last key's final tie run within that key)."""
    if t.num_rows == 0:
        return None
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    det = _key_detection_np(t, keys)
    starts = _group_starts(det)
    last_start = int(starts[-1])
    ch = _order_change(t, order_by)
    first_key = _det_tuple(det, 0)
    last_key = _det_tuple(det, t.num_rows - 1)
    first_order = tuple(t.column(c)[0].as_py() for c in order_by)
    last_order = tuple(t.column(c)[-1].as_py() for c in order_by)
    tail = ch[last_start:]
    tail_runs = int(tail.sum()) + (0 if tail[0] else 1)  # runs touching last key
    n_last = t.num_rows - last_start
    run_starts = np.nonzero(ch[last_start:])[0]
    last_run_off = int(run_starts[-1]) if run_starts.size else 0
    return first_key, first_order, last_key, last_order, n_last, tail_runs, last_run_off


def _add_tie_ranks(
    t: pa.Table, keys: list[str], order_by: list[str], out: str, dense: bool,
    carry_rows: int, carry_runs: int, cont: bool, cont_rank: int,
    aux: tuple = (),
) -> pa.Table:
    """Tie-aware within-key ranks for one sorted block.  ``carry_rows`` /
    ``carry_runs`` count the first key's rows / distinct order values in
    prior blocks; ``cont`` marks the block's first tie run as a
    continuation whose (dense) rank is ``cont_rank``."""
    if t.num_rows == 0:
        return pa.table({})
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    n = t.num_rows
    starts = _group_starts(_key_detection_np(t, keys))
    seg = np.repeat(starts, np.diff(np.r_[starts, n]))  # key start per row
    ch = _order_change(t, order_by).copy()
    ch[starts] = True  # a new key always starts a new run
    run_idx = np.nonzero(ch)[0]
    run_of_row = np.cumsum(ch) - 1  # run ordinal per row (block-global)
    run_start_row = run_idx[run_of_row]  # first row index of each row's run
    if dense:
        # dense rank = run ordinal within key + 1
        runs_before_key = np.cumsum(ch) - 1
        key_first_run = runs_before_key[starts]  # run ordinal at key start
        rnk = (run_of_row - np.repeat(key_first_run, np.diff(np.r_[starts, n])) + 1).astype(np.int64)
    else:
        rnk = (run_start_row - seg + 1).astype(np.int64)
    first_key_rows = int(starts[1]) if starts.size > 1 else n
    add = carry_runs if dense else carry_rows
    rnk[:first_key_rows] += add
    if cont:
        # rows of the first run keep the continued run's rank
        first_run_len = int(run_idx[1]) if run_idx.size > 1 else n
        first_run_len = min(first_run_len, first_key_rows)
        rnk[:first_run_len] = cont_rank
    return t.append_column(out, pa.array(rnk))


def with_group_tie_ranks(ds, keys: list[str], order_by: list[str],
                         descending: list[bool] | None = None,
                         out: str = "rnk", dense: bool = False):
    """RANK() / DENSE_RANK() OVER (PARTITION BY keys ORDER BY order_by) —
    the tie-aware siblings of with_group_ranks, same scale shape: one
    range sort, O(blocks) edge metadata, an O(blocks) driver carry walk
    tracking (rows, distinct runs, open tie run + its rank) of the key
    spanning each boundary, then vectorized per-block assignment."""
    import ray

    sorted_ds, aux = _sorted_for_keys(ds, keys, order_by, descending)
    refs = [r for b in sorted_ds.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return sorted_ds
    edge_task = ray.remote(num_cpus=0.5)(_block_tie_edges)
    edges = ray.get([edge_task.remote(r, keys, order_by, tuple(aux)) for r in refs])
    _check_block_order((e[0], e[2]) if e else None for e in edges)
    carries = []  # (carry_rows, carry_runs, cont, cont_rank)
    prev_key = None
    prev_order = None
    prev_rows = 0   # rows of prev_key so far
    prev_runs = 0   # distinct order values of prev_key so far
    prev_last_run_rank = 0
    for e in edges:
        if e is None:
            carries.append((0, 0, False, 0))
            continue
        first_key, first_order, last_key, last_order, n_last, tail_runs, last_run_off = e
        if first_key == prev_key:
            cont = first_order == prev_order
            carry_rows, carry_runs = prev_rows, prev_runs - (1 if cont else 0)
            cont_rank = prev_last_run_rank if cont else 0
        else:
            cont, carry_rows, carry_runs, cont_rank = False, 0, 0, 0
        carries.append((carry_rows, carry_runs, cont, cont_rank))
        # roll the running state forward for the block's LAST key
        if first_key == last_key:
            # the whole block is one key: fold this block's runs/rows into
            # the carried state.  If the block's single run is itself the
            # continuation of the previous block's open run, its rank is
            # unchanged; otherwise the last run starts inside this block.
            one_continued_run = cont and tail_runs == 1
            if one_continued_run:
                prev_last_run_rank = cont_rank
            elif dense:
                prev_last_run_rank = carry_runs + tail_runs
            else:
                prev_last_run_rank = carry_rows + last_run_off + 1
            prev_rows = carry_rows + n_last
            prev_runs = carry_runs + tail_runs
        else:
            # the last key starts inside this block: fresh state
            prev_rows = n_last
            prev_runs = tail_runs
            prev_last_run_rank = tail_runs if dense else last_run_off + 1
        prev_key = last_key
        prev_order = last_order
    rank_task = ray.remote(num_cpus=1)(_add_tie_ranks)
    out_refs = [
        rank_task.remote(r, keys, order_by, out, dense, int(cr), int(cu), bool(co),
                         int(ck), tuple(aux))
        for r, (cr, cu, co, ck) in zip(refs, carries)
    ]
    return ray.data.from_arrow_refs(out_refs)


def group_median_disc(
    ds, key: str, val: str, tiebreak: str, emit_null_groups: bool = False
) -> "pa.Table":
    """EXACT per-group discrete median (PERCENTILE_DISC(0.5) — the value
    at within-group rank ceil(n/2)) of integer column ``val``, returned
    as a tiny (key, val) Table.

    The q_median_value shape, factored for reuse (MAD needs it twice):
    group counts are a small aggregate; within-group ranks come from ONE
    global sort by (key, val, tiebreak) + the distributed prefix scan of
    ones; the pick compares each row's global rank against its group's
    target — no per-group sort, no driver-side value lists; the result
    is O(groups)."""
    import ray
    import pyarrow.compute as pc

    # Null handling (SQL quantile_disc semantics): null VALUES are
    # dropped before ranking; a null KEY forms its own group, carried
    # through the sort as a (__kn int8, type-zero-filled key) pair so
    # neither Ray's sort nor the epilogue argsort ever compares None.
    # A group whose EVERY value is null has no rankable rows: with
    # emit_null_groups it yields SQL's (key, NULL) median row, without
    # it the group is dropped (the filtered-input shape MAD composes).
    def prep(t: pa.Table) -> pa.Table:
        col = t.column(key)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        kn = pc.cast(pc.is_null(col), pa.int8())
        if col.null_count:
            col = pc.fill_null(col, _zero_scalar(col.type))
        t = t.set_column(t.schema.get_field_index(key), key, col)
        vcol = t.column(val)
        vv = pc.cast(pc.is_valid(vcol).combine_chunks()
                     if isinstance(vcol, pa.ChunkedArray) else pc.is_valid(vcol),
                     pa.int64())
        return t.append_column("__kn", kn).append_column("__vv", vv)

    dsall = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def drop_null_vals(t: pa.Table) -> pa.Table:
        vcol = t.column(val)
        if vcol.null_count:
            t = t.filter(pc.is_valid(vcol).combine_chunks()
                         if isinstance(vcol, pa.ChunkedArray) else pc.is_valid(vcol))
        return t.drop_columns(["__vv"])

    ds2 = dsall.map_batches(drop_null_vals, batch_format="pyarrow", zero_copy_batch=True)

    counts = agg_by_keys(dsall, ["__kn", key], [("__vv", "sum", "n")])
    ct = pa.concat_tables(
        [b for b in counts.iter_batches(batch_format="pyarrow", batch_size=None)]
    ).combine_chunks()
    kn_list = ct.column("__kn").to_numpy(zero_copy_only=False).astype(np.int64)
    keys_list = ct.column(key).to_pylist()  # filled: no Nones
    ns = ct.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    key_type0 = ct.column(key).type
    # all-null-value groups: zero rankable rows — route around the rank
    # machinery entirely, surfacing SQL's NULL-median row on request
    if (ns == 0).any():
        zk = [(None if kzn else kz)
              for kz, nz, kzn in zip(keys_list, ns, kn_list) if nz == 0]
        null_rows = pa.table(
            {key: pa.array(zk, key_type0),
             val: pa.array([None] * len(zk), pa.int64())}
        ) if emit_null_groups else None
        keep = ns > 0
        kn_list = kn_list[keep]
        keys_list = [k for k, m in zip(keys_list, keep) if m]
        ns = ns[keep]
    else:
        null_rows = None
    order_k = np.lexsort((np.asarray(keys_list, dtype=object), kn_list))
    kn_list = kn_list[order_k]
    keys_list = [keys_list[i] for i in order_k]
    ns = ns[order_k]
    group_start = np.zeros(len(keys_list), dtype=np.int64)
    np.cumsum(ns[:-1], out=group_start[1:])
    targets = group_start + (ns + 1) // 2
    key_type = ct.column(key).type
    nn = kn_list == 0
    null_tgt = int(targets[~nn][0]) if (~nn).any() else -1
    tref = ray.put((pa.array([k for k, m in zip(keys_list, nn) if m], key_type),
                    targets[nn], null_tgt))

    ones = ds2.map_batches(
        lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = with_prefix_sum(
        ones, ["__kn", key, val, tiebreak], "one", out="rank", inclusive=True
    )

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rank" not in t.column_names:
            return pa.table({})  # schema-less empty sort partition
        type_arr, tgt_ranks, nulltgt = ray.get(tref)
        ranks = t.column("rank").to_numpy(zero_copy_only=False)
        kn = t.column("__kn").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(t.column(key), value_set=type_arr)
        tgt = np.r_[tgt_ranks, -1][
            pc.fill_null(idx, len(tgt_ranks)).to_numpy(zero_copy_only=False).astype(np.int64)
        ]
        tgt = np.where(kn == 1, nulltgt, tgt)
        sub = t.filter(pa.array(ranks == tgt))
        kcol = sub.column(key).combine_chunks()
        if sub.num_rows:
            isn = pc.cast(sub.column("__kn").combine_chunks(), pa.bool_())
            kcol = pc.if_else(isn, pa.scalar(None, kcol.type), kcol)
        return pa.table({key: kcol, val: sub.column(val)})

    parts = [
        b
        for b in scanned.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if null_rows is not None and null_rows.num_rows:
        if parts:
            null_rows = null_rows.cast(parts[0].schema)
        parts.append(null_rows)
    if not parts:  # every group dropped (all-null vals / empty input)
        return pa.table({key: pa.array([], key_type), val: pa.array([], pa.int64())})
    return pa.concat_tables(parts).combine_chunks().sort_by(key)


def _nonnull_values_np(col, op: str) -> np.ndarray:
    """int64 view of a MIN/MAX-family value column: nulls are REFUSED
    loudly — there is no identity element to fill with (0 would floor a
    running MIN), and the Arrow->numpy NaN->int64 cast would produce
    silent garbage.  Callers implement SQL null-skipping by pre-filling
    sentinels (see with_group_cummin's query layer)."""
    if getattr(col, "null_count", 0):
        raise ValueError(
            f"{op}: null values in the scanned column — pre-fill a "
            "sentinel (SQL MIN/MAX skip nulls; the running scan cannot)"
        )
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _block_key_mins(t: pa.Table, keys: list[str], val: str, aux: tuple = ()):
    """(first key, last key, min(val) of the last key's rows) — carry
    metadata for the segmented running-min scan; None for an empty block."""
    if t.num_rows == 0:
        return None
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    det = _key_detection_np(t, keys)
    v = _nonnull_values_np(t.column(val), "group_cummin")
    starts = _group_starts(det)
    first_key = _det_tuple(det, 0)
    last_key = _det_tuple(det, t.num_rows - 1)
    return first_key, last_key, int(v[int(starts[-1]):].min())


def _add_group_cummin(t: pa.Table, keys: list[str], val: str, out: str, carry,
                      aux: tuple = ()) -> pa.Table:
    """Per-key running min within one sorted block (+ boundary carry).

    Segmented cumulative min, vectorized via the offset trick: add a
    per-segment offset of (S - seg_idx) * span so every earlier segment's
    values sit strictly ABOVE the current segment's range — one global
    np.minimum.accumulate then never crosses a segment boundary; subtract
    the offset back.  min is not invertible (unlike sum), so the cumsum
    rebase trick can't apply — this is its associative-scan counterpart."""
    if t.num_rows == 0:
        return pa.table({})
    if aux:
        t = _restore_null_keys(t, list(keys), list(aux))
    v = _nonnull_values_np(t.column(val), "group_cummin")
    starts = _group_starts(_key_detection_np(t, keys))
    n = v.size
    S = starts.size
    lo, hi = int(v.min()), int(v.max())
    span = hi - lo + 1
    if (hi + (S + 1) * span) < 2**62:  # offsets provably fit int64
        seg_idx = np.repeat(np.arange(S, dtype=np.int64), np.diff(np.r_[starts, n]))
        addend = (S - seg_idx) * span
        run = np.minimum.accumulate(v + addend) - addend
    else:  # extreme value range: per-segment accumulate (rare fallback)
        run = np.empty(n, np.int64)
        bounds = np.r_[starts, n]
        for i in range(S):
            a, b = int(bounds[i]), int(bounds[i + 1])
            run[a:b] = np.minimum.accumulate(v[a:b])
    if carry is not None:
        end0 = int(starts[1]) if S > 1 else n
        run[:end0] = np.minimum(run[:end0], carry)
    return t.append_column(out, pa.array(run))


def with_group_cummin(ds, keys: list[str], order_by: list[str], val: str,
                      out: str = "run_min",
                      descending: list[bool] | None = None):
    """MIN(val) OVER (PARTITION BY keys ORDER BY order_by ROWS UNBOUNDED
    PRECEDING) — the running-extremum window operator.

    Same shape as with_group_prefix_sum: one range sort, per-block edge
    tasks, an O(blocks) driver carry walk (the min of the key spanning
    each boundary), then a vectorized per-block segmented scan; blocks
    never touch the driver (from_arrow_refs).  Running MAX is
    with_group_cummin over the negated column."""
    import ray

    sorted_ds, aux = _sorted_for_keys(ds, keys, order_by, descending)
    refs = [r for b in sorted_ds.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return sorted_ds
    edge_task = ray.remote(num_cpus=0.5)(_block_key_mins)
    edges = ray.get([edge_task.remote(r, keys, val, tuple(aux)) for r in refs])
    _check_block_order(e[:2] if e else None for e in edges)
    carries = []
    prev_key, prev_min = None, None
    for e in edges:
        if e is None:
            carries.append(None)
            continue
        first_key, last_key, last_min = e
        carry = prev_min if first_key == prev_key else None
        carries.append(carry)
        if first_key == last_key and carry is not None:
            prev_min = min(carry, last_min)
        else:
            prev_min = last_min
        prev_key = last_key
    scan_task = ray.remote(num_cpus=1)(_add_group_cummin)
    out_refs = [
        scan_task.remote(r, keys, val, out, None if c is None else int(c), tuple(aux))
        for r, c in zip(refs, carries)
    ]
    return ray.data.from_arrow_refs(out_refs)


def with_group_cummax(ds, keys: list[str], order_by: list[str], val: str,
                      out: str = "run_max",
                      descending: list[bool] | None = None):
    """MAX(val) OVER (PARTITION BY keys ORDER BY order_by ROWS UNBOUNDED
    PRECEDING): with_group_cummin over the negated column (max(x) =
    -min(-x)); one negation map on each side, same sort/carry shape."""
    import ray  # noqa: F401  (parity with the cummin entry point)

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = t.column_names.index(val)
        return t.set_column(i, val, pc.negate_checked(t.column(val)))

    negated = ds.map_batches(neg, batch_format="pyarrow", zero_copy_batch=True)
    run = with_group_cummin(negated, keys, order_by, val, out=out, descending=descending)
    return run.map_batches(
        lambda t: _negate_cols(t, [val, out]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _negate_cols(t: pa.Table, cols: list[str]) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return t
    for c in cols:
        if c in t.column_names:
            t = t.set_column(t.column_names.index(c), c, pc.negate_checked(t.column(c)))
    return t
