"""Temporal operators: sessions, sliding/watermark windows, funnel, retention, as-of/range joins.

Split from the monolithic queries.py (r3 verdict item 10); see the
package __init__ for the registry and the original design docstring.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..chunk import DEFAULT_OPTIONS
from ..pipeline.decode import decode_dataset
from ..pipeline.encode import encode_dataset
from ._shared import CACHE_ROOT, _decoded, _to_table, store_for


def _orders_build_side(sf_dir: str):
    o = pq.read_table(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_orderdate"])
    # a NULL join key or NULL order date can never satisfy the ON clause
    # (user_id = NULL / NULL <= ts are SQL-false): drop them here so the
    # composite (key, time) index packs a clean int64 domain
    ok = pc.and_kleene(pc.is_valid(o.column("o_custkey")), pc.is_valid(o.column("o_orderdate")))
    o = o.filter(ok)
    return (
        o.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64),
        o.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False),
    )


def q_asof_join_events_orders(sf_dir: str):
    """ASOF LEFT JOIN: each event matched to the user's latest order at or
    before the event time — arm-selected (functions/joins.py): broadcast
    sorted index + one vectorized searchsorted per batch below the
    build-side threshold, hash-partitioned per-partition indexes above
    it (parity-pinned in tests/test_join_adaptive.py)."""
    from ..functions.joins import asof_join_auto

    keys, times = _orders_build_side(sf_dir)
    ds = _decoded(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = asof_join_auto(ds, keys, times, "user_id", "ts", out_col="asof_us")
    t = _to_table(out)
    return pa.table(
        {
            "event_id": t.column("event_id"),
            # epoch seconds of the matched order (dates are whole seconds);
            # deterministic even when a user has tied order dates
            "asof_order_epoch": pc.divide(t.column("asof_us"), 1_000_000),
        }
    ).sort_by("event_id")


def q_range_join_events_orders(sf_dir: str):
    """Range join + count: per event, the user's orders within the 7 days
    up to the event (same broadcast index, two searchsorteds)."""
    from ..functions.joins import range_count_join

    keys, times = _orders_build_side(sf_dir)
    ds = _decoded(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = range_count_join(
        ds, keys, times, "user_id", "ts", window=7 * 86_400 * 1_000_000, out_col="n_orders_7d"
    )
    return _to_table(out).select(["event_id", "n_orders_7d"]).sort_by("event_id")


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _sessionize(uid: np.ndarray, us: np.ndarray) -> pa.Table:
    """Vectorized gap sessionization over (user, time)-SORTED rows: break
    on user change or a >gap silence, one cumsum + reduceat pass.

    NULL timestamps (float NaN from the int64-with-nulls numpy view) get
    the window semantics the SQL mirror computes: NaN sorts last within
    the user, a NaN-involved gap comparison is False so the null rows
    join the user's LAST session (LAG/CASE ELSE 0), COUNT(*) counts them,
    and MIN/MAX(ts) skip them (an all-null session has NULL bounds)."""
    n = uid.size
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
            }
        )
    brk = np.ones(n, dtype=bool)
    with np.errstate(invalid="ignore"):
        brk[1:] = (uid[1:] != uid[:-1]) | (np.diff(us) > SESSION_GAP_US)
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:] - 1, n - 1]
    isnan = np.isnan(us) if us.dtype.kind == "f" else None
    if isnan is None or not isnan.any():
        start_arr = pa.array(us[starts].astype(np.int64))
        end_arr = pa.array(us[ends].astype(np.int64))
    else:
        vidx = np.flatnonzero(~isnan)
        lo = np.searchsorted(vidx, starts, "left")
        hi = np.searchsorted(vidx, ends, "right") - 1
        has = hi >= lo
        safe_lo = np.minimum(lo, max(vidx.size - 1, 0))
        safe_hi = np.maximum(hi, 0)
        if vidx.size == 0:
            has = np.zeros(starts.size, bool)
            sv = ev = np.zeros(starts.size, np.int64)
        else:
            sv = us[vidx[safe_lo]].astype(np.int64)
            ev = us[vidx[safe_hi]].astype(np.int64)
        start_arr = pa.array(np.where(has, sv, 0), mask=~has)
        end_arr = pa.array(np.where(has, ev, 0), mask=~has)
    return pa.table(
        {
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "start_us": start_arr,
            "end_us": end_arr,
        }
    )


SESSION_PARTITIONS = 32  # hash-partition count; scale with cluster size


def _session_partition(t: pa.Table) -> pa.Table:
    """Hash-partition by a PARTITION of users (splitmix64(user) % P): every
    event of a user lands in the same partition, so sessionization is
    exact per partition with no cross-partition healing."""
    from ..codecs.hashmix import splitmix64_mix

    col = t.column("user_id")
    if col.null_count:
        # the SQL NULL user is ONE window partition: sentinel -1 (real
        # ids are non-negative) keeps the int64 hash/pack lanes intact;
        # outputs that surface user_id restore the null afterwards
        col = pc.fill_null(col, -1)
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id", col)
    uid = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    part = (splitmix64_mix(uid) % np.uint64(SESSION_PARTITIONS)).astype(np.int64)
    return t.append_column("part", pa.array(part))


def _sessionize_partition(t: pa.Table) -> pa.Table:
    """One hash partition of events -> final session rows: local (user, ts)
    sort + the vectorized gap kernel + per-user session ordinals.  All of a
    user's events are in this partition, so the output needs no healing."""
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((us, uid))
    sess = _sessionize(uid[order], us[order])
    out_uid = sess.column("user_id").to_numpy(zero_copy_only=False)
    # per-user session ordinal, vectorized
    ubrk = np.ones(out_uid.size, dtype=np.int64)
    if out_uid.size:
        ubrk[1:] = (out_uid[1:] != out_uid[:-1]).astype(np.int64)
    ustart = np.flatnonzero(ubrk)
    sid = np.arange(out_uid.size) - np.repeat(ustart, np.diff(np.r_[ustart, out_uid.size]))
    return pa.table(
        {
            "user_id": sess.column("user_id"),
            "session_id": pa.array(sid),
            "n_events": sess.column("n_events"),
            "start_us": sess.column("start_us"),
            "end_us": sess.column("end_us"),
        }
    )


def q_session_windows(sf_dir: str):
    """Session windows (gap-based sessionization): events of a user belong
    to one session until a >30 min inactivity gap.

    Shape (r2 verdict fix — no driver-side healing): events are HASH-
    PARTITIONED by user (splitmix64(user_id) % P), each partition is
    sorted locally by (user, ts) and sessionized with the vectorized gap
    kernel — a user's events never split across partitions, so the kernel
    is exact with NO cross-batch healing and no global sort.  The shuffle
    is the partition groupby (P bounded groups, one vectorized kernel call
    per partition — not per user); only final session rows leave the
    tasks.  P (SESSION_PARTITIONS) sizes partitions to worker memory at
    scale."""
    ds = _decoded(sf_dir, "events", columns=["user_id", "ts"])
    out = (
        ds.map_batches(_session_partition, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_sessionize_partition, batch_format="pyarrow")
    )
    t = _to_table(out)
    if t.num_rows == 0:
        return _sessionize(np.array([], np.int64), np.array([], np.int64)).add_column(
            1, "session_id", pa.array([], pa.int64())
        )
    t = t.sort_by([("user_id", "ascending"), ("session_id", "ascending")])
    ucol = t.column("user_id").combine_chunks()
    restored = pc.if_else(pc.equal(ucol, -1), pa.scalar(None, pa.int64()), ucol)
    return t.set_column(t.schema.get_field_index("user_id"), "user_id", restored)


SLIDE_HOURS = 3  # sliding window length; slide step = 1 h


def q_sliding_window_events(sf_dir: str):
    """SLIDING 3-hour window (1-hour step) aggregate per event_type — the
    overlapping-window op the tumbling query can't express.  Each event
    lands in SLIDE_HOURS windows, materialized per batch by a vectorized
    repeat/tile (k-fold duplication happens inside the tasks, shuffles
    only the O(windows) partial aggregates, same combine shape as the
    hourly query)."""
    ds = _decoded(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000  # hour index of the event
        n = us.size
        # window start hours: hour-k+1 .. hour (windows [start, start+k))
        offs = np.arange(SLIDE_HOURS, dtype=np.int64)
        win_start = (np.repeat(hour, SLIDE_HOURS) - np.tile(offs, n)) * 3600
        t2 = pa.table(
            {
                "event_type": pc.take(
                    t.column("event_type"), pa.array(np.repeat(np.arange(n), SLIDE_HOURS))
                ),
                "win_start_epoch": pa.array(win_start),
                "value": pc.take(t.column("value"), pa.array(np.repeat(np.arange(n), SLIDE_HOURS))),
            }
        )
        return t2.group_by(["event_type", "win_start_epoch"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    partials = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = partials.group_by(["event_type", "win_start_epoch"]).aggregate(
        [("value_sum", "sum"), ("value_count", "sum")]
    )
    return pa.table(
        {
            "event_type": final.column("event_type"),
            "win_start_epoch": final.column("win_start_epoch"),
            # null-propagating Arrow math: an all-null-value window sums
            # to NULL (SQL), never NaN->int garbage
            "total_value_cents": pc.cast(
                pc.round(pc.multiply(final.column("value_sum_sum"), 100.0)),
                pa.int64(),
            ),
            "n_events": final.column("value_count_sum"),
        }
    ).sort_by([("event_type", "ascending"), ("win_start_epoch", "ascending")])


WEEK_US = 604_800 * 1_000_000
WK_NULL = (1 << 20) - 1  # in-lane sentinel for the SQL NULL week group


def _week_partial(t: pa.Table) -> pa.Table:
    """Per-batch DISTINCT (user, week) combiner: shrinks the shuffle from
    O(events) to O(distinct user-weeks per batch) before the hash
    partition."""
    col = t.column("user_id")
    if col.null_count:
        col = pc.fill_null(col, -1)  # the NULL user is one DISTINCT user
    uid = col.to_numpy(zero_copy_only=False).astype(np.int64)
    # the NULL timestamp is one DISTINCT (user, NULL) week: sentinel at the
    # top of the 20-bit lane (real weeks are ~3k); adjacency can never
    # match it (no week equals SENTINEL+1 inside the lane) and the query
    # epilogue restores it to the SQL NULL week group
    wk_col = pc.divide(t.column("ts").cast(pa.int64()), WEEK_US)
    wk = pc.fill_null(wk_col, WK_NULL).to_numpy(zero_copy_only=False).astype(np.int64)
    key = np.unique(uid * np.int64(1 << 20) + wk)  # weeks fit far below 2^20
    return pa.table({"user_id": pa.array(key >> 20), "wk": pa.array(key & ((1 << 20) - 1))})


def _retention_partition(t: pa.Table) -> pa.Table:
    """One user-hash partition of (user, wk) partials -> per-week
    (active, retained) partial counts.  All of a user's weeks are in this
    partition, so adjacency is exact with no healing."""
    uid = t.column("user_id").to_numpy(zero_copy_only=False)
    wk = t.column("wk").to_numpy(zero_copy_only=False)
    key = np.unique(uid * np.int64(1 << 20) + wk)  # cross-batch dedup
    uid, wk = key >> 20, key & ((1 << 20) - 1)
    aw, ac = np.unique(wk, return_counts=True)
    # sorted composite keys: user's weeks are adjacent ascending — a
    # retained week w is one whose successor row is (same user, w+1)
    # a NULL user (sentinel -1) counts as active but never as retained:
    # the SQL mirror's a.user_id = b.user_id self-join cannot match NULL
    ret = (
        (uid[1:] == uid[:-1]) & (wk[1:] == wk[:-1] + 1) & (uid[:-1] != -1)
        if key.size > 1
        else np.array([], bool)
    )
    rw, rc = np.unique(wk[:-1][ret], return_counts=True)
    return pa.table(
        {
            "wk": pa.array(np.r_[aw, rw]),
            "active": pa.array(np.r_[ac.astype(np.int64), np.zeros(rw.size, np.int64)]),
            "retained": pa.array(np.r_[np.zeros(aw.size, np.int64), rc.astype(np.int64)]),
        }
    )


def q_weekly_retention(sf_dir: str):
    """Week-over-week user retention: per calendar week (epoch//7d), how
    many distinct users were active, and how many of those were also
    active the following week — the cohort-retention analytic, exact.

    Shape: per-batch DISTINCT (user, week) combiner -> hash-partition by
    user (splitmix64 % P — a user's weeks co-located, the session-window
    pattern) -> per-partition vectorized dedup + adjacency detection ->
    O(partitions x weeks) partial rows -> tiny driver sum.  No global
    sort; the event stream is reduced before the only shuffle."""
    from ..codecs.hashmix import splitmix64_mix

    ds = _decoded(sf_dir, "events", columns=["user_id", "ts"])

    def partition(t: pa.Table) -> pa.Table:
        t = _week_partial(t)
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64_mix(uid) % np.uint64(SESSION_PARTITIONS)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    out = (
        ds.map_batches(partition, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_retention_partition, batch_format="pyarrow")
    )
    parts = _to_table(out)
    if parts.num_rows == 0:
        return pa.table(
            {
                "wk": pa.array([], pa.int64()),
                "active": pa.array([], pa.int64()),
                "retained": pa.array([], pa.int64()),
            }
        )
    final = parts.group_by("wk").aggregate([("active", "sum"), ("retained", "sum")])
    wk = final.column("wk").combine_chunks()
    wk = pc.if_else(pc.equal(wk, WK_NULL), pa.scalar(None, pa.int64()), wk.cast(pa.int64()))
    return pa.table(
        {
            "wk": wk,
            "active": final.column("active_sum"),
            "retained": final.column("retained_sum"),
        }
    ).sort_by("wk")


_WM_LATENESS_S = 600  # allowed lateness: 10 minutes (second precision)


def _watermark_partition(t: pa.Table) -> pa.Table:
    """One user-hash partition -> per-hour (n_on_time, n_late) counts
    under a per-user WATERMARK: processing order is md5(event_id) (the
    deterministic arrival proxy), the watermark is the running max event-time of the
    user's EARLIER arrivals minus the allowed lateness, and an event
    behind it is dropped late — the streaming tumbling-window semantic
    (event time vs processing time) evaluated deterministically in
    batch.  Vectorized grouped shifted-cummax via the segment-offset
    trick: ts is rebased per partition so (seg * B + ts_rel) fits int64
    and a segment's first row always dominates earlier segments."""
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return pa.table(
            {"hour_epoch": pa.array([], pa.int64()), "n_on_time": pa.array([], pa.int64()),
             "n_late": pa.array([], pa.int64())}
        )
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    # arrival proxy: md5(event_id) order — a DETERMINISTIC shuffle of
    # processing order vs event time, so the late path actually fires
    # (event_id itself is ts-ordered in the corpus); matches the SQL
    # ORDER BY md5(...) exactly, vectorized through md5vec
    from ..functions.md5vec import md5_hex

    arr = md5_hex(t.column("event_id")).to_numpy(zero_copy_only=False)
    order = np.lexsort((arr, uid))
    uid, us = uid[order], us[order]
    ts_s = us // 1_000_000  # second precision, mirrored in the SQL oracle
    # NULL event-times (NaN lane): the window MAX skips them, so they
    # never RAISE the watermark; the null row itself is on-time when its
    # prev_s is NULL and counts in NEITHER bucket otherwise (both SQL
    # CASE conditions go NULL); its hour is the SQL NULL hour group
    valid = ~np.isnan(ts_s) if ts_s.dtype.kind == "f" else np.ones(ts_s.size, bool)
    brk = np.zeros(uid.size, bool)
    brk[0] = True
    brk[1:] = uid[1:] != uid[:-1]
    seg = np.cumsum(brk) - 1
    base = np.min(ts_s[valid]) if valid.any() else 0.0
    rel = np.where(valid, ts_s - base, 0).astype(np.int64)
    B = int(rel.max()) + 2
    # a null row sits at seg*B - 1: below every in-segment valid value
    # (never raises the cummax) yet above every earlier segment's range,
    # and the prev//B == seg test reads it as "no valid predecessor"
    aug = seg.astype(np.int64) * B + np.where(valid, rel, -1)
    cm = np.maximum.accumulate(aug)
    prev = np.empty_like(cm)
    prev[1:] = cm[:-1]
    prev[0] = -1
    # a segment's first row has no predecessor IN-SEGMENT: earlier
    # segments' cummax is < seg*B, detected by integer division
    has_prev = ~brk & (prev // B == seg)
    prev_rel = np.where(has_prev, prev - seg * B, np.int64(-(1 << 62)))
    late = valid & (rel < prev_rel - _WM_LATENESS_S)
    neither = ~valid & has_prev  # null ts with a real watermark: both CASEs NULL
    HSENT = np.int64(-(1 << 60))  # 3*HSENT stays inside int64
    hour = np.where(valid, (np.where(valid, ts_s, 0).astype(np.int64) // 3600) * 3600, HSENT)
    cls = late.astype(np.int64) + 2 * neither.astype(np.int64)  # 0 on, 1 late, 2 neither
    key = hour * 3 + cls
    vals, cnts = np.unique(key, return_counts=True)
    hrs = vals // 3  # numpy // floors, exact for any sign with cls in [0, 3)
    m = vals - 3 * hrs
    uh = np.unique(hrs)
    on_t = np.zeros(uh.size, np.int64)
    lt = np.zeros(uh.size, np.int64)
    pos = np.searchsorted(uh, hrs)
    np.add.at(on_t, pos[m == 0], cnts[m == 0])
    np.add.at(lt, pos[m == 1], cnts[m == 1])
    isnull = uh == HSENT
    return pa.table(
        {
            "hour_epoch": pa.array(np.where(isnull, 0, uh), mask=isnull),
            "n_on_time": pa.array(on_t),
            "n_late": pa.array(lt),
        }
    )


def q_watermark_windows(sf_dir: str):
    """Event-time tumbling windows with a per-user watermark and late
    -data drop — the streaming-window custom operator evaluated
    deterministically in batch: arrival order is md5(event_id) (a
    deterministic shuffle, so lateness actually occurs), the watermark
    trails the user's running max event time by 10 minutes, late
    arrivals are counted out-of-window.  Same partition shape as
    q_session_windows (user-hash groups, zero driver healing); per-hour
    partials merge in a tiny driver groupby.  The SQL oracle is the
    identical MAX() OVER (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)
    window formula at second precision."""
    ds = _decoded(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    parts = _to_table(
        ds.map_batches(_session_partition, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda t: _watermark_partition(t.drop_columns(["part"]) if "part" in t.column_names else t),
            batch_format="pyarrow",
        )
    )
    final = parts.group_by("hour_epoch").aggregate([("n_on_time", "sum"), ("n_late", "sum")])
    return pa.table(
        {
            "hour_epoch": final.column("hour_epoch"),
            "n_on_time": final.column("n_on_time_sum"),
            "n_late": final.column("n_late_sum"),
        }
    ).sort_by("hour_epoch")


_FUNNEL_SENT = np.iinfo(np.int64).max


def _funnel_partition(t: pa.Table) -> pa.Table:
    """One user-hash partition -> (n_signup, n_click_after,
    n_purchase_after) counts, fully vectorized: per-user segment minima
    via masked np.minimum.reduceat, each stage's threshold broadcast
    back by np.repeat — no per-user Python."""
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return pa.table(
            {"n_signup": pa.array([], pa.int64()), "n_click_after": pa.array([], pa.int64()),
             "n_purchase_after": pa.array([], pa.int64())}
        )
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    et = t.column("event_type").combine_chunks() if isinstance(t.column("event_type"), pa.ChunkedArray) else t.column("event_type")
    code = pc.index_in(et, value_set=pa.array(["signup", "click", "purchase"])).to_numpy(
        zero_copy_only=False
    )
    order = np.lexsort((ts, uid))
    uid, ts, code = uid[order], ts[order], code[order]
    brk = np.zeros(uid.size, bool)
    brk[0] = True
    brk[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(brk)
    seglen = np.diff(np.r_[starts, uid.size])

    def stage_min(cond: np.ndarray) -> np.ndarray:
        arr = np.where(cond, ts, _FUNNEL_SENT)
        return np.minimum.reduceat(arr, starts)

    day_us = 86_400_000_000
    # a NULL ts (NaN lane) never satisfies a threshold comparison and
    # never becomes one (MIN skips it) — but a user whose ONLY signup has
    # a null ts still GROUPs into s1 (COUNT counts the user, t1 is NULL)
    valid = ~np.isnan(ts) if ts.dtype.kind == "f" else np.ones(ts.size, bool)
    has_signup = np.maximum.reduceat((code == 0).astype(np.int8), starts) > 0
    t1 = stage_min((code == 0) & valid)
    t1_row = np.repeat(t1, seglen)
    with np.errstate(over="ignore", invalid="ignore"):
        t2 = stage_min((code == 1) & (ts > t1_row) & (ts <= t1_row + day_us))
        t2_row = np.repeat(t2, seglen)
        t3 = stage_min((code == 2) & (ts > t2_row) & (ts <= t2_row + day_us))
    return pa.table(
        {
            "n_signup": pa.array([int(has_signup.sum())]),
            "n_click_after": pa.array([int((t2 < _FUNNEL_SENT).sum())]),
            "n_purchase_after": pa.array([int((t3 < _FUNNEL_SENT).sum())]),
        }
    )


def q_funnel(sf_dir: str):
    """Sequential funnel (signup -> click within 24h -> purchase within
    24h of that click) —
    the event-sequence pattern-match behind conversion analytics.  Users
    are hash-partitioned (the session_windows idiom: a user's events
    never split), each partition resolves the three ordered stages with
    masked segment-minimum kernels, and only 3 counters per partition
    reach the driver.  Strictly value-based (ts comparisons, no
    order-of-arrival dependence) so the correlated-subquery SQL oracle
    matches exactly."""
    ds = _decoded(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    parts = _to_table(
        ds.map_batches(_session_partition, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda t: _funnel_partition(t.drop_columns(["part"]) if "part" in t.column_names else t),
            batch_format="pyarrow",
        )
    )
    return pa.table(
        {
            "n_signup": pa.array([int(pc.sum(parts.column("n_signup")).as_py() or 0)]),
            "n_click_after": pa.array([int(pc.sum(parts.column("n_click_after")).as_py() or 0)]),
            "n_purchase_after": pa.array([int(pc.sum(parts.column("n_purchase_after")).as_py() or 0)]),
        }
    )


def q_first_last_touch(sf_dir: str):
    """First/last-touch attribution: per user, the event_type of the
    chronologically first and last event plus the event count —
    FIRST_VALUE / LAST_VALUE window semantics, computed distributed as
    TWO with_group_ranks passes (ascending and descending over the same
    (ts, event_id) total order) that each keep only rank-1 rows
    (O(users) output per pass), joined with an agg_by_keys count.  The
    driver sees only per-user rows, never events."""
    from ..functions.aggregates import agg_by_keys, with_group_ranks

    def pick(ds, direction_desc: bool, out_name: str):
        # ORDER BY ts NULLS LAST (DuckDB default): FIRST/LAST_VALUE do NOT
        # skip null-ts rows — a user's LAST row is a null-ts event when it
        # has one.  A +inf sentinel (never output) reproduces that order
        # in both directions: ASC puts it last, the DESC pass first.
        def seal_ts(t: pa.Table) -> pa.Table:
            ts = t.column("ts")
            if ts.null_count:
                ts = pc.fill_null(ts, pa.scalar((1 << 62), pa.int64()).cast(ts.type))
                t = t.set_column(t.schema.get_field_index("ts"), "ts", ts)
            return t

        ranked = with_group_ranks(
            ds.map_batches(seal_ts, batch_format="pyarrow", zero_copy_batch=True),
            ["user_id"],
            ["ts", "event_id"],
            descending=[direction_desc, direction_desc],
        )

        def first_rows(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({})
            sub = t.filter(pc.equal(t.column("rnk"), 1))
            return pa.table(
                {"user_id": sub.column("user_id"), out_name: sub.column("event_type")}
            )

        return _to_table(
            ranked.map_batches(first_rows, batch_format="pyarrow", zero_copy_batch=True)
        )

    cols = ["user_id", "ts", "event_id", "event_type"]
    first = pick(_decoded(sf_dir, "events", columns=cols), False, "first_type")
    last = pick(_decoded(sf_dir, "events", columns=cols), True, "last_type")
    counts = _to_table(
        agg_by_keys(
            _decoded(sf_dir, "events", columns=["user_id", "event_id"]),
            ["user_id"],
            [("event_id", "count_all", "n_events")],
        )
    )
    # Arrow hash joins drop null keys (SQL equality), but the NULL user
    # is a window PARTITION here and must survive: sentinel -1 through
    # the two one-row-per-user joins, restored after
    def seal(t: pa.Table) -> pa.Table:
        col = t.column("user_id").combine_chunks()
        if col.null_count:
            t = t.set_column(
                t.schema.get_field_index("user_id"), "user_id", pc.fill_null(col, -1)
            )
        return t

    out = seal(first).join(seal(last), keys=["user_id"]).join(seal(counts), keys=["user_id"])
    ucol = out.column("user_id").combine_chunks()
    ucol = pc.if_else(pc.equal(ucol, -1), pa.scalar(None, pa.int64()), ucol)
    return pa.table(
        {
            "user_id": ucol,
            "first_type": out.column("first_type"),
            "last_type": out.column("last_type"),
            "n_events": out.column("n_events").cast(pa.int64()),
        }
    ).sort_by("user_id")


def q_value_rank_events(sf_dir: str):
    """RANK and DENSE_RANK with real ties: events bucketed by
    floor(value/10) rank within their event_type — two passes of the
    tie-aware segmented-scan operator (functions/aggregates.
    with_group_tie_ranks: O(blocks) carry walk tracking the open tie
    run), joined on event_id."""
    from ..functions.aggregates import with_group_tie_ranks

    def bucketed():
        ds = _decoded(sf_dir, "events", columns=["event_id", "event_type", "value"])

        def add_bucket(t: pa.Table) -> pa.Table:
            vcol = t.column("value")
            valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
            v = np.nan_to_num(vcol.to_numpy(zero_copy_only=False))
            # NULL bucket ranks LAST as one tie run (DuckDB ORDER BY
            # default): INT64_MAX sentinel — unreachable by floor(v/10)
            # for any real double here; never surfaced (only ranks leave)
            b = np.where(valid, np.floor(v / 10.0), 0).astype(np.int64)
            b[~valid] = np.iinfo(np.int64).max
            # the NULL event_type is one PARTITION; sentinel string keeps
            # the Arrow join on event_type from dropping the group
            et = t.column("event_type")
            if et.null_count:
                et = pc.fill_null(et, "\x00__null_type__")
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "event_type": et,
                    "bucket": pa.array(b),
                }
            )

        return ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def pick(dense: bool, out: str) -> pa.Table:
        ranked = with_group_tie_ranks(
            bucketed(), ["event_type"], ["bucket"], dense=dense, out=out
        )

        def proj(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({})
            return t.select(["event_id", out])

        return _to_table(ranked.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True))

    out = pick(False, "rnk").join(pick(True, "rnk_dense"), keys=["event_id"])
    return pa.table(
        {
            "event_id": out.column("event_id"),
            "rnk": out.column("rnk").cast(pa.int64()),
            "rnk_dense": out.column("rnk_dense").cast(pa.int64()),
        }
    ).sort_by("event_id")


def q_percentile_ranks(sf_dir: str):
    """PERCENT_RANK and CUME_DIST per event_type over the value-bucket
    order — both derived from tie-aware rank passes (no extra shuffle
    shape): percent_rank = (rank-1)/(n-1); cume_dist = (n - rank_desc
    + 1)/n where rank_desc is the tie-aware rank under the REVERSED
    order (rank_desc - 1 = rows strictly greater).  Emitted as floor-e6
    integers so the SQL mirror is value-exact."""
    from ..functions.aggregates import agg_by_keys, with_group_tie_ranks

    def bucketed():
        ds = _decoded(sf_dir, "events", columns=["event_id", "event_type", "value"])

        def add_bucket(t: pa.Table) -> pa.Table:
            vcol = t.column("value")
            valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
            v = np.nan_to_num(vcol.to_numpy(zero_copy_only=False))
            # NULL bucket ranks LAST as one tie run (DuckDB ORDER BY
            # default): INT64_MAX sentinel — unreachable by floor(v/10)
            # for any real double here; never surfaced (only ranks leave)
            b = np.where(valid, np.floor(v / 10.0), 0).astype(np.int64)
            b[~valid] = np.iinfo(np.int64).max
            # the NULL event_type is one PARTITION; sentinel string keeps
            # the Arrow join on event_type from dropping the group
            et = t.column("event_type")
            if et.null_count:
                et = pc.fill_null(et, "\x00__null_type__")
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "event_type": et,
                    "bucket": pa.array(b),
                }
            )

        return ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def rank_pass(desc: bool, out: str) -> pa.Table:
        ranked = with_group_tie_ranks(
            bucketed(), ["event_type"], ["bucket"], descending=[desc], out=out
        )

        def proj(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({})
            return t.select(["event_id", "event_type", out])

        return _to_table(ranked.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True))

    asc = rank_pass(False, "rnk")
    desc = rank_pass(True, "rnk_desc").select(["event_id", "rnk_desc"])
    counts = _to_table(
        agg_by_keys(bucketed(), ["event_type"], [("event_id", "count_all", "n")])
    )
    out = asc.join(desc, keys=["event_id"]).join(counts, keys=["event_type"])
    rnk = out.column("rnk").to_numpy(zero_copy_only=False).astype(np.float64)
    rnkd = out.column("rnk_desc").to_numpy(zero_copy_only=False).astype(np.float64)
    n = out.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    pr = (rnk - 1.0) / np.maximum(n - 1.0, 1.0)
    cd = (n - rnkd + 1.0) / n
    return pa.table(
        {
            "event_id": out.column("event_id"),
            "percent_rank_e6": pa.array(np.floor(pr * 1_000_000.0).astype(np.int64)),
            "cume_dist_e6": pa.array(np.floor(cd * 1_000_000.0).astype(np.int64)),
        }
    ).sort_by("event_id")


def _daily_revenue(sf_dir: str) -> pa.Table:
    """Shared daily-revenue series: O(rows) day bucketing + exact cents
    partial sums through ONE distributed agg_by_keys; returns the sorted
    O(days) table the frame-window queries consume.  ``cv`` counts the
    day's non-null prices: a day whose EVERY price is null still exists
    in the series but its SUM is SQL NULL (cv == 0) — consumers decide
    what that means for their frame."""
    from ..functions.aggregates import agg_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def per_day(t: pa.Table) -> pa.Table:
        day = pc.floor(pc.divide(t.column("o_orderdate").cast(pa.int64()), 86_400_000_000))
        price = t.column("o_totalprice")
        cents = pc.cast(
            pc.round(pc.multiply(price, 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        g = (
            pa.table(
                {
                    "day": day.cast(pa.int64()),
                    "cents": pc.fill_null(cents, 0),
                    "cv": pc.cast(pc.is_valid(price), pa.int64()),
                }
            )
            .group_by("day")
            .aggregate([("cents", "sum"), ("cv", "sum")])
        )
        return pa.table(
            {"day": g.column("day"), "cents": g.column("cents_sum"), "cv": g.column("cv_sum")}
        )

    return _to_table(
        agg_by_keys(
            ds.map_batches(per_day, batch_format="pyarrow", zero_copy_batch=True),
            ["day"],
            [("cents", "sum", "cents"), ("cv", "sum", "cv")],
        )
    ).sort_by("day")


def q_moving_avg_revenue(sf_dir: str):
    """Frame-based window aggregate — SUM/COUNT OVER (ORDER BY day ROWS
    BETWEEN 6 PRECEDING AND CURRENT ROW) on the daily revenue series
    (_daily_revenue: one distributed sum_by_keys).  The frame scan runs
    on the driver over the O(days) series (bounded by the calendar, not
    the data) as two vectorized cumsum diffs."""
    daily = _daily_revenue(sf_dir)
    day = daily.column("day").to_numpy(zero_copy_only=False)
    rev = daily.column("cents").to_numpy(zero_copy_only=False)
    cv = daily.column("cv").to_numpy(zero_copy_only=False)
    cum = np.concatenate([[0], np.cumsum(rev)])
    vcum = np.concatenate([[0], np.cumsum(cv > 0)])
    lo = np.maximum(np.arange(day.size) - 6, 0)
    hi = np.arange(day.size) + 1
    win_sum = cum[hi] - cum[lo]  # 0-filled nulls == SQL SUM skip
    win_n = np.arange(day.size) - lo + 1  # COUNT(*) counts null-cents days too
    ws = pa.array(win_sum, pa.int64())
    # a frame with NO valid day sums to SQL NULL, not 0
    ws = pc.if_else(pa.array(vcum[hi] - vcum[lo] == 0), pa.scalar(None, pa.int64()), ws)
    return pa.table(
        {
            "day": pa.array(day, pa.int64()),
            "win_sum_cents": ws,
            "win_days": pa.array(win_n.astype(np.int64)),
        }
    )


def q_gap_fill_revenue(sf_dir: str):
    """Calendar gap-fill with LOCF (last observation carried forward):
    days absent from the daily revenue series get the previous day's
    value and an is_filled flag — the time-series regularization step
    before any resample/forecast.  Same distribution as
    q_moving_avg_revenue (shared _daily_revenue); the epilogue is one
    searchsorted over O(calendar-days)."""
    daily = _daily_revenue(sf_dir)
    day = daily.column("day").to_numpy(zero_copy_only=False)
    rev = daily.column("cents").to_numpy(zero_copy_only=False)
    cv = daily.column("cv").to_numpy(zero_copy_only=False)
    cal = np.arange(day[0], day[-1] + 1, dtype=np.int64)
    # LOCF carries the last NON-NULL day (LAST_VALUE ... IGNORE NULLS):
    # an all-null-price day is treated as absent — filled, not a source
    vday, vrev = day[cv > 0], rev[cv > 0]
    pos = np.searchsorted(vday, cal, side="right") - 1  # last valid <= d
    filled = pa.array(vrev[np.maximum(pos, 0)], pa.int64())
    filled = pc.if_else(pa.array(pos < 0), pa.scalar(None, pa.int64()), filled)
    is_filled = np.ones(cal.size, dtype=bool)
    is_filled[vday - cal[0]] = False  # days present with a real value
    return pa.table(
        {
            "day": pa.array(cal),
            "rev_cents": filled,
            "is_filled": pa.array(is_filled),
        }
    )


def q_order_next_gap(sf_dir: str):
    """LEAD OVER (PARTITION BY customer ORDER BY date, key) — days until
    the customer's NEXT order, null for last orders.  LEAD is LAG over
    the reversed order: the segmented distributed lag operator runs with
    negated sort keys, so the same O(blocks) carry machinery serves both
    directions."""
    from ..functions.aggregates import with_group_lag

    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "ts_us": us,
                "neg_ts": pc.negate(us),
                "neg_key": pc.negate(t.column("o_orderkey")),
            }
        )

    lagged = with_group_lag(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        ["neg_ts", "neg_key"],
        "ts_us",
        out="next_us",
    )

    def gap(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.subtract(t.column("next_us"), t.column("ts_us")), 86_400_000_000)
        return pa.table({"o_orderkey": t.column("o_orderkey"), "next_gap_days": d})

    return _to_table(
        lagged.map_batches(gap, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("o_orderkey")


def q_range_frame_revenue(sf_dir: str):
    """RANGE-frame window — SUM OVER (ORDER BY day RANGE BETWEEN 6
    PRECEDING AND CURRENT ROW) on the daily series.  Unlike the ROWS
    frame (q_moving_avg_revenue), the window covers CALENDAR days: gaps
    in the series shrink the covered row set.  Same distributed shape
    (shared _daily_revenue sum_by_keys); the frame is two searchsorteds
    over the O(days) series."""
    daily = _daily_revenue(sf_dir)
    day = daily.column("day").to_numpy(zero_copy_only=False)
    rev = daily.column("cents").to_numpy(zero_copy_only=False)
    cv = daily.column("cv").to_numpy(zero_copy_only=False)
    cum = np.concatenate([[0], np.cumsum(rev)])
    vcum = np.concatenate([[0], np.cumsum(cv > 0)])
    lo = np.searchsorted(day, day - 6, side="left")
    hi = np.arange(day.size) + 1
    rs = pa.array(cum[hi] - cum[lo], pa.int64())
    rs = pc.if_else(pa.array(vcum[hi] - vcum[lo] == 0), pa.scalar(None, pa.int64()), rs)
    return pa.table(
        {
            "day": pa.array(day, pa.int64()),
            "range_sum_cents": rs,
            "range_days": pa.array((hi - lo).astype(np.int64)),
        }
    )


def q_status_transitions(sf_dir: str):
    """Markov transition counts — per customer, consecutive order-status
    pairs (LAG over a categorical value).  Statuses map to a fixed int
    code domain so the distributed window-lag operator runs on int64
    (one range sort, O(blocks) carries); the (from, to) pair counts
    reduce through one sum_by_keys over at most 9 keys."""
    from ..functions.aggregates import sum_by_keys, with_group_lag

    STATUSES = pa.array(["F", "O", "P"])
    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"])

    def code(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "ts_us": t.column("o_orderdate").cast(pa.int64()),
                "code": pc.index_in(t.column("o_orderstatus"), value_set=STATUSES).cast(pa.int64()),
            }
        )

    lagged = with_group_lag(
        ds.map_batches(code, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        ["ts_us", "o_orderkey"],
        "code",
        out="prev_code",
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"f": pa.array([], pa.int64()), "t": pa.array([], pa.int64()),
                 "one": pa.array([], pa.int64())}
            )
        sub = t.filter(pc.is_valid(t.column("prev_code")))
        g = (
            pa.table({"f": sub.column("prev_code").cast(pa.int64()), "t": sub.column("code")})
            .group_by(["f", "t"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"f": g.column("f"), "t": g.column("t"), "one": g.column("count_all").cast(pa.int64())}
        )

    agg = _to_table(
        sum_by_keys(
            lagged.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
            ["f", "t"],
            "one",
            out="n",
        )
    )
    names = np.array(["F", "O", "P"])
    f = agg.column("f").to_numpy(zero_copy_only=False).astype(np.int64)
    tt = agg.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "from_status": pa.array(names[f], pa.string()),
            "to_status": pa.array(names[tt], pa.string()),
            "n": agg.column("n"),
        }
    ).sort_by([("from_status", "ascending"), ("to_status", "ascending")])


def q_time_weighted_value(sf_dir: str):
    """Time-weighted average (TWAP) of the events value per user — each
    observation weighted by its holding time (until the user's next
    event; the last observation carries zero weight).  LEAD arrives via
    the reversed-order distributed lag; the weighted sums reduce through
    ONE sum_by_keys; exact integers end-to-end (cents x seconds)."""
    from ..functions.aggregates import sum_by_keys, with_group_lag

    ds = _decoded(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        # sort key only: NULL ts sorts LAST in the SQL ts order (+inf
        # sentinel), while ts_us keeps the true null so LEAD of a row
        # before a null-ts row is NULL -> held NULL -> excluded, like SQL
        sort_ts = pc.fill_null(us, (1 << 62)) if us.null_count else us
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": us,
                "neg_ts": pc.negate(sort_ts),
                "neg_key": pc.negate(t.column("event_id")),
                # null-propagating: a null value must not become NaN->int
                # garbage; SUM(cents*held) ignores those terms like SQL
                "cents": pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()),
            }
        )

    lagged = with_group_lag(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        ["neg_ts", "neg_key"],
        "ts_us",
        out="next_us",
    )

    def weighted(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "k": pa.array([], pa.string()),
                 "v": pa.array([], pa.int64())}
            )
        nxt = t.column("next_us").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False).astype(np.float64)
        ccol = t.column("cents")
        cvalid = pc.is_valid(ccol).to_numpy(zero_copy_only=False)
        c = np.where(cvalid, np.nan_to_num(ccol.to_numpy(zero_copy_only=False)), 0).astype(np.int64)
        # exact microseconds (epoch_us parity): timestamps are us-precision
        # ints, so the difference is exact — no sub-second truncation rule
        # to mirror.  cents x us stays under int64 through ~10^6 events per
        # user at this value range (use seconds at larger scales).
        held = np.where(
            np.isnan(nxt) | np.isnan(ts), 0, np.nan_to_num(nxt) - np.nan_to_num(ts)
        ).astype(np.int64)
        # nc counts the non-null cents*held terms: SUM over an all-null
        # set is NULL in SQL, restored in the epilogue when nc == 0
        nc = (cvalid & (held != 0)).astype(np.int64)
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "wv": pa.array(c * held),
                    "w": pa.array(held),
                    "nc": pa.array(nc),
                }
            )
            .group_by("user_id")
            .aggregate([("wv", "sum"), ("w", "sum"), ("nc", "sum")])
        )
        ng = g.num_rows
        return pa.table(
            {
                "user_id": pa.concat_arrays([g.column("user_id").combine_chunks()] * 3),
                "k": pa.array(["wv"] * ng + ["w"] * ng + ["nc"] * ng),
                "v": pa.concat_arrays(
                    [g.column("wv_sum").cast(pa.int64()).combine_chunks(),
                     g.column("w_sum").cast(pa.int64()).combine_chunks(),
                     g.column("nc_sum").cast(pa.int64()).combine_chunks()]
                ),
            }
        )

    agg = _to_table(
        sum_by_keys(
            lagged.map_batches(weighted, batch_format="pyarrow", zero_copy_batch=True),
            ["user_id", "k"],
            "v",
        )
    )
    # Arrow sort (null user_id sorts last) then per-k slices: every user
    # emits all three k rows, so the slices align row-for-row
    agg = agg.sort_by([("user_id", "ascending"), ("k", "ascending")])
    kk = agg.column("k")
    wtab = agg.filter(pc.equal(kk, "w"))
    w = wtab.column("v").to_numpy(zero_copy_only=False)
    wv = agg.filter(pc.equal(kk, "wv")).column("v").to_numpy(zero_copy_only=False)
    nc = agg.filter(pc.equal(kk, "nc")).column("v").to_numpy(zero_copy_only=False)
    keep = w > 0  # single-event users have no held time
    kmask = pa.array(keep)
    wv_col = pa.array(np.where(nc > 0, wv, 0), pa.int64())
    wv_col = pc.if_else(pa.array(nc > 0), wv_col, pa.scalar(None, pa.int64()))
    return pa.table(
        {
            "user_id": wtab.column("user_id").combine_chunks().filter(kmask),
            "weighted_cents_sum": wv_col.filter(kmask),
            "held_us": pa.array(w[keep], pa.int64()),
        }
    ).sort_by("user_id")


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
def q_running_low_value(sf_dir: str):
    """Running MINIMUM per user over time (MIN OVER PARTITION BY ... ROWS
    UNBOUNDED PRECEDING) — the running-extremum window op.  min has no
    inverse, so the prefix-SUM rebase trick can't compute it; this runs
    the associative-scan counterpart (functions/aggregates.
    with_group_cummin): one range sort, O(blocks) boundary-min carries,
    vectorized segmented np.minimum.accumulate per block."""
    from ..functions.aggregates import with_group_cummin

    ds = _decoded(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    # window MIN ignores null values: a null contributes a +sentinel
    # (2^40 — far above any real cents, small enough that the segmented
    # offset trick keeps its int64 headroom) and a still-sentinel running
    # min afterwards means "no real value yet" -> SQL NULL
    NULL_SENT = np.int64(1) << 40

    def cents(t: pa.Table) -> pa.Table:
        vcol = t.column("value")
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = np.where(
            valid, np.rint(np.nan_to_num(vcol.to_numpy(zero_copy_only=False)) * 100), NULL_SENT
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "v": pa.array(v),
            }
        )

    run = with_group_cummin(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        ["ts", "event_id"],
        "v",
        out="run_min_cents",
    )
    out = _to_table(run).select(["event_id", "run_min_cents"]).sort_by("event_id")
    rcol = out.column("run_min_cents").combine_chunks()
    rcol = pc.if_else(pc.equal(rcol, int(NULL_SENT)), pa.scalar(None, pa.int64()), rcol)
    return out.set_column(1, "run_min_cents", rcol)


def q_running_high_order(sf_dir: str):
    """Running MAXIMUM order value per customer over time — the cummax
    twin of running_low_value (functions/aggregates.with_group_cummax:
    negated segmented-min scan), driver-gated so both extremum
    directions are pinned to SQL."""
    from ..functions.aggregates import with_group_cummax

    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    # window MAX ignores null values: a null contributes a -sentinel and a
    # still-sentinel running max afterwards means "no real value yet" ->
    # SQL NULL (the mirror of running_low_value's +sentinel cummin)
    NULL_SENT = -(np.int64(1) << 40)

    def cents(t: pa.Table) -> pa.Table:
        vcol = t.column("o_totalprice")
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = np.where(
            valid, np.rint(np.nan_to_num(vcol.to_numpy(zero_copy_only=False)) * 100), NULL_SENT
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_orderdate": t.column("o_orderdate"),
                "v": pa.array(v),
            }
        )

    run = with_group_cummax(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        "v",
        out="run_max_cents",
    )
    out = _to_table(run).select(["o_orderkey", "run_max_cents"]).sort_by("o_orderkey")
    rcol = out.column("run_max_cents").combine_chunks()
    rcol = pc.if_else(pc.equal(rcol, int(NULL_SENT)), pa.scalar(None, pa.int64()), rcol)
    return out.set_column(1, "run_max_cents", rcol)


def q_median_interarrival(sf_dir: str):
    """Median inter-arrival gap per event type — the latency/telemetry
    percentile users actually ask of event streams, composed from two
    distributed operators: with_group_lag gives each event its user's
    previous timestamp (O(blocks) boundary carries), and the exact
    disc-median of the microsecond gaps per type runs through
    group_median_disc (one sort + prefix scan, O(groups) driver rows)."""
    from ..functions.aggregates import group_median_disc, with_group_lag

    ds = _decoded(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "ts_us": t.column("ts").cast(pa.int64()),
            }
        )

    lagged = with_group_lag(
        ds.map_batches(us, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        ["ts_us", "event_id"],
        "ts_us",
        out="prev_us",
    )

    def gaps(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sub = t.filter(pc.is_valid(t.column("prev_us")))
        if sub.num_rows == 0:
            return empty
        return pa.table(
            {
                "event_type": sub.column("event_type"),
                "event_id": sub.column("event_id"),
                "gap_us": pc.subtract(sub.column("ts_us"), sub.column("prev_us")),
            }
        )

    med = group_median_disc(
        lagged.map_batches(gaps, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        "gap_us",
        "event_id",
    )
    return pa.table(
        {
            "event_type": med.column("event_type"),
            "median_gap_us": med.column("gap_us"),
        }
    )


def q_sliding_distinct_users(sf_dir: str):
    """Sliding-window COUNT(DISTINCT): unique users per 3h window
    stepping 1h — the dedup-inside-window aggregation a plain sliding
    SUM can't provide (q_sliding_window_events covers that).  Each event
    fans out to its 3 covering windows with a per-batch (window, user)
    dedup, ONE sum_by_keys collapses global duplicates, and the per-
    window count is a second tiny keyed sum — two-level distinct, never
    O(rows) at any single point."""
    from ..functions.aggregates import sum_by_keys

    HOUR_US = 3_600_000_000
    ds = _decoded(sf_dir, "events", columns=["ts", "user_id"])

    def fan_out(t: pa.Table) -> pa.Table:
        # arrow lanes keep the NULL hour: all three offsets of a null ts
        # collapse into ONE (NULL win, user) DISTINCT pair, like the SQL
        h = pc.divide(t.column("ts").cast(pa.int64()), HOUR_US).combine_chunks()
        u = t.column("user_id").combine_chunks()
        win = pa.concat_arrays([h, pc.subtract(h, 1), pc.subtract(h, 2)])
        users = pa.concat_arrays([u, u, u])
        g = (
            pa.table({"win": win, "user_id": users})
            .group_by(["win", "user_id"])
            .aggregate([])
        )
        return pa.table(
            {
                "win": g.column("win"),
                "user_id": g.column("user_id"),
                "one": pa.array(np.ones(g.num_rows, np.int64)),
            }
        )

    dpairs = sum_by_keys(
        ds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True),
        ["win", "user_id"],
        "one",
    )

    def count_win(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"win": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        g = t.group_by("win").aggregate([([], "count_all")])
        return pa.table({"win": g.column("win"), "n": g.column("count_all").cast(pa.int64())})

    agg = _to_table(
        sum_by_keys(
            dpairs.map_batches(count_win, batch_format="pyarrow", zero_copy_batch=True),
            ["win"],
            "n",
            out="n_users",
        )
    ).sort_by("win")
    return pa.table(
        {
            "window_start_us": pc.multiply(agg.column("win"), HOUR_US),
            "n_users": agg.column("n_users"),
        }
    )


def q_hourly_seasonality(sf_dir: str):
    """Hour-of-day seasonality profile per event type (the diurnal-load
    curve behind capacity planning): hod = (epoch_us // 3600e6) % 24 —
    pure integer arithmetic matching SQL EXTRACT(hour ...) on UTC
    timestamps — then one distributed keyed sum of counts and cents."""
    from ..functions.aggregates import agg_by_keys

    HOUR_US = 3_600_000_000
    ds = _decoded(sf_dir, "events", columns=["event_type", "ts", "value"])

    def stage(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vcol = t.column("value")
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = np.nan_to_num(vcol.to_numpy(zero_copy_only=False))
        # null value -> 0 cents + nv flag 0: SUM ignores nulls while
        # COUNT(*) still counts the row; nv lets the epilogue restore
        # the SQL NULL for a group whose every value is null
        cents = np.where(valid, np.rint(v * 100), 0).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hod": pa.array((us // HOUR_US) % 24),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "nv": pa.array(valid.astype(np.int64)),
                "cents": pa.array(cents),
            }
        )

    agg = agg_by_keys(
        ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hod"],
        [("one", "sum", "n"), ("cents", "sum", "value_cents"), ("nv", "sum", "nv")],
    )
    t = _to_table(agg).sort_by([("event_type", "ascending"), ("hod", "ascending")])
    cents_out = pc.if_else(
        pc.equal(t.column("nv"), 0), pa.scalar(None, pa.int64()),
        t.column("value_cents").combine_chunks(),
    )
    return pa.table(
        {
            "event_type": t.column("event_type"),
            "hod": t.column("hod"),
            "n": t.column("n"),
            "value_cents": cents_out,
        }
    )


ORACLE_SQL = {
    "hourly_seasonality": """
        SELECT event_type,
               CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hod,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events GROUP BY event_type, hod
        ORDER BY event_type, hod
    """,
    "sliding_distinct_users": """
        WITH e AS (
            SELECT epoch_us(ts) // 3600000000 AS h, user_id FROM events
        ),
        wu AS (
            SELECT DISTINCT (h - off) AS win, user_id
            FROM e, (VALUES (0), (1), (2)) t(off)
        )
        SELECT win * 3600000000 AS window_start_us, COUNT(*) AS n_users
        FROM wu GROUP BY win ORDER BY window_start_us
    """,
    "median_interarrival": """
        WITH g AS (
            SELECT event_type, event_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events
        ),
        r AS (
            SELECT event_type, gap_us,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY gap_us, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM g WHERE gap_us IS NOT NULL
        )
        SELECT event_type, gap_us AS median_gap_us
        FROM r WHERE rn = (n + 1) // 2 ORDER BY event_type
    """,
    "running_high_order": """
        SELECT o_orderkey,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS run_max_cents
        FROM orders ORDER BY o_orderkey
    """,
    "running_low_value": """
        SELECT event_id,
               MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS run_min_cents
        FROM events ORDER BY event_id
    """,
    "asof_join_events_orders": """
        SELECT e.event_id,
               CAST(epoch(o.o_orderdate) AS BIGINT) AS asof_order_epoch
        FROM events e ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        ORDER BY e.event_id
    """,
    "range_join_events_orders": """
        SELECT e.event_id, COUNT(o.o_orderdate) AS n_orders_7d
        FROM events e LEFT JOIN orders o
          ON e.user_id = o.o_custkey
         AND o.o_orderdate BETWEEN e.ts - INTERVAL 7 DAY AND e.ts
        GROUP BY e.event_id ORDER BY e.event_id
    """,
    "session_windows": """
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
                        THEN 1 ELSE 0 END AS brk
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "sliding_window_events": """
        SELECT e.event_type,
               (epoch(date_trunc('hour', e.ts))::BIGINT - k.off * 3600)
                   AS win_start_epoch,
               CAST(ROUND(SUM(e.value) * 100) AS BIGINT) AS total_value_cents,
               COUNT(e.value) AS n_events
        FROM events e CROSS JOIN (VALUES (0), (1), (2)) AS k(off)
        GROUP BY e.event_type, win_start_epoch
        ORDER BY e.event_type, win_start_epoch
    """,
    "first_last_touch": """
        SELECT DISTINCT user_id,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_type,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id
    """,
    "percentile_ranks": """
        SELECT event_id,
               CAST(FLOOR(PERCENT_RANK() OVER w * 1000000.0) AS BIGINT) AS percent_rank_e6,
               CAST(FLOOR(CUME_DIST() OVER w * 1000000.0) AS BIGINT) AS cume_dist_e6
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY CAST(FLOOR(value / 10.0) AS BIGINT))
        ORDER BY event_id
    """,
    "value_rank_events": """
        SELECT event_id,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS rnk_dense
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY CAST(FLOOR(value / 10.0) AS BIGINT))
        ORDER BY event_id
    """,
    "weekly_retention": """
        WITH uw AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
            FROM events
        ),
        act AS (SELECT wk, COUNT(*) AS active FROM uw GROUP BY wk),
        ret AS (
            SELECT a.wk, COUNT(*) AS retained
            FROM uw a JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 1
            GROUP BY a.wk
        )
        SELECT act.wk, act.active, COALESCE(ret.retained, 0) AS retained
        FROM act LEFT JOIN ret ON act.wk = ret.wk
        ORDER BY act.wk
    """,
    "funnel": """
        WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
                    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
                    AND e.ts <= s2.t2 + INTERVAL 24 HOUR
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
               (SELECT COUNT(*) FROM s2) AS n_click_after,
               (SELECT COUNT(*) FROM s3) AS n_purchase_after
    """,
    "watermark_windows": """
        WITH w AS (
          SELECT ts,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
                 MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id
                           ORDER BY md5(CAST(event_id AS VARCHAR))
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_s
          FROM events
        )
        SELECT (ts_s // 3600) * 3600 AS hour_epoch,
               CAST(SUM(CASE WHEN prev_s IS NULL OR ts_s >= prev_s - 600
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
               CAST(SUM(CASE WHEN prev_s IS NOT NULL AND ts_s < prev_s - 600
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM w GROUP BY hour_epoch ORDER BY hour_epoch
    """,
    "moving_avg_revenue": """
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        )
        SELECT day,
               CAST(SUM(cents) OVER w AS BIGINT) AS win_sum_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS win_days
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "gap_fill_revenue": """
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        ),
        cal AS (
          SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily),
                                        (SELECT MAX(day) FROM daily))) AS day
        )
        SELECT c.day,
               CAST(COALESCE(d.cents,
                    LAST_VALUE(d.cents IGNORE NULLS) OVER
                      (ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    AS BIGINT) AS rev_cents,
               d.cents IS NULL AS is_filled
        FROM cal c LEFT JOIN daily d ON c.day = d.day
        ORDER BY c.day
    """,
    "order_next_gap": """
        SELECT o_orderkey,
               CAST(epoch(LEAD(o_orderdate) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                    - o_orderdate) / 86400 AS BIGINT) AS next_gap_days
        FROM orders ORDER BY o_orderkey
    """,
    "range_frame_revenue": """
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        )
        SELECT day,
               CAST(SUM(cents) OVER w AS BIGINT) AS range_sum_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS range_days
        FROM daily
        WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "status_transitions": """
        WITH s AS (
          SELECT o_orderstatus,
                 LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS prev
          FROM orders
        )
        SELECT prev AS from_status, o_orderstatus AS to_status, COUNT(*) AS n
        FROM s WHERE prev IS NOT NULL
        GROUP BY prev, o_orderstatus ORDER BY from_status, to_status
    """,
    "time_weighted_value": """
        WITH s AS (
          SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          - ts) AS held
          FROM events
        )
        SELECT user_id,
               CAST(SUM(cents * held) AS BIGINT) AS weighted_cents_sum,
               CAST(SUM(held) AS BIGINT) AS held_us
        FROM s WHERE held IS NOT NULL
        GROUP BY user_id HAVING SUM(held) > 0 ORDER BY user_id
    """,
}
