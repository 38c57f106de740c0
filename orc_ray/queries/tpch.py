"""TPC-H-ish relational queries: aggregates, joins, rollup, window buckets.

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


def _rnd_i64(col, mul: float = 1.0, fill: int | None = None):
    """CAST(ROUND(col * mul) AS BIGINT) with SQL half-away-from-zero
    rounding (pc.round's default half_to_even diverges on exact .5).
    Nulls propagate (``fill=None``) or become ``fill`` — fill=0 mirrors
    SQL SUM over a null term (the term contributes nothing) wherever a
    validity count guards the all-null-group NULL case or the consumer
    provably never sees one."""
    x = pc.multiply(col, float(mul)) if mul != 1.0 else col
    out = pc.cast(pc.round(x, round_mode="half_towards_infinity"), pa.int64())
    if fill is not None:
        out = pc.fill_null(out, fill)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _rev_e4_arr(t: pa.Table, fill: int | None = 0):
    """Per-line revenue ROUND(e*100) * (100 - ROUND(d*100)) as int64 with
    SQL null propagation: a null price OR discount nulls the term."""
    e = _rnd_i64(t.column("l_extendedprice"), 100)
    d = _rnd_i64(t.column("l_discount"), 100)
    rev = pc.multiply(e, pc.subtract(pa.scalar(100, pa.int64()), d))
    if fill is not None:
        rev = pc.fill_null(rev, fill)
    return rev.combine_chunks() if isinstance(rev, pa.ChunkedArray) else rev


def q_agg_pricing_summary(sf_dir: str):
    """TPC-H Q1-style aggregate over the decoded lineitem stream."""
    ds = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # COUNT(*) (count_all), not COUNT(col): the oracle's count_order
        # and AVG denominator count rows with null measures too
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("l_discount", "sum"), ([], "count_all")]
        )
        return g

    # partial per-batch combine, then a tiny final groupby on the driver —
    # pre-aggregation keeps the shuffle O(groups), not O(rows)
    partials = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = partials.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("l_quantity_sum", "sum"), ("l_extendedprice_sum", "sum"), ("l_discount_sum", "sum"), ("count_all", "sum")]
    )
    cnt = final.column("count_all_sum").to_numpy().astype(np.int64)
    # integer-scaled outputs: the driver compares exact value hashes, and
    # float sums differ by ULPs between engines depending on add order;
    # Arrow null-propagating rounding so an all-null group stays NULL
    out = pa.table(
        {
            "l_returnflag": final.column("l_returnflag"),
            "l_linestatus": final.column("l_linestatus"),
            "sum_qty": _rnd_i64(final.column("l_quantity_sum_sum")),
            "sum_base_price_cents": _rnd_i64(final.column("l_extendedprice_sum_sum"), 100),
            "avg_disc_e6": _rnd_i64(
                pc.divide(final.column("l_discount_sum_sum"), pc.cast(pa.array(cnt), pa.float64())),
                1e6,
            ),
            "count_order": pa.array(cnt),
        }
    )
    return out.sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def q_filter_groupby_events(sf_dir: str):
    ds = _decoded(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("event_type").aggregate([("value", "sum"), ("value", "count")])

    partials = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = partials.group_by("event_type").aggregate([("value_sum", "sum"), ("value_count", "sum")])
    return pa.table(
        {
            "event_type": final.column("event_type"),
            "total_value_cents": pa.array(
                np.rint(final.column("value_sum_sum").to_numpy() * 100).astype(np.int64)
            ),
            "n_events": final.column("value_count_sum"),
        }
    ).sort_by("event_type")


def q_join_orders_customer(sf_dir: str):
    """Broadcast hash join: small side shipped once via ray.put, probed
    inside map_batches — no all-to-all shuffle (SURVEY.md §7.3)."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    lookup_ref = ray.put(
        (cust.column("c_custkey").combine_chunks(), cust.column("c_mktsegment").combine_chunks())
    )
    ds = _decoded(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def add_segment(t: pa.Table, *, ref=lookup_ref) -> pa.Table:
        # broadcast join probe: the small side is in the object store once
        # (ray.put above); ray.get here is a local zero-copy fetch, and the
        # probe is a fully vectorized hash lookup (index_in + take), not a
        # per-row dict.get loop.  Plain-function stage -> warm task workers
        # (no per-query actor pool spawn).
        keys, segs = ray.get(ref)
        idx = pc.index_in(t.column("o_custkey"), value_set=keys)
        # INNER-join semantics: a null or unmatched o_custkey never joins
        # (idx is null for both) — drop those rows; a matched row whose
        # customer has a NULL segment is a legitimate SQL null group
        t = t.filter(pc.is_valid(idx))
        seg = pc.take(segs, idx.filter(pc.is_valid(idx)))
        t = t.append_column("c_mktsegment", seg)
        return t.group_by("c_mktsegment").aggregate([("o_totalprice", "sum"), ([], "count_all")])

    partials = _to_table(
        ds.map_batches(add_segment, batch_format="pyarrow", zero_copy_batch=True)
    )
    final = partials.group_by("c_mktsegment").aggregate(
        [("o_totalprice_sum", "sum"), ("count_all", "sum")]
    )
    return pa.table(
        {
            "c_mktsegment": final.column("c_mktsegment"),
            "revenue_cents": _rnd_i64(final.column("o_totalprice_sum_sum"), 100),
            "n_orders": final.column("count_all_sum").cast(pa.int64()),
        }
    ).sort_by("c_mktsegment")


def q_point_lookup_events(sf_dir: str):
    """Point lookup by equality predicate: chunk-level manifest pruning +
    sub-chunk stride seek (the RowIndexEntry/seekToRowGroup analog) keep
    the decode to the few 512-row blocks that can match."""
    return _decoded(sf_dir, "events", predicates=[("event_id", "==", 777)])


def q_window_hourly_events(sf_dir: str):
    """Tumbling hourly window aggregate per event_type — the windowed-
    aggregate op over the timestamp column (exercises the ts codec path).
    Pre-aggregated per batch; the final groupby is O(windows), not O(rows)."""
    ds = _decoded(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) * 3600  # epoch seconds of hour start
        t2 = pa.table(
            {
                "event_type": t.column("event_type"),
                "hour_epoch": pa.array(hour),
                "value": t.column("value"),
            }
        )
        return t2.group_by(["event_type", "hour_epoch"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    partials = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = partials.group_by(["event_type", "hour_epoch"]).aggregate(
        [("value_sum", "sum"), ("value_count", "sum")]
    )
    return pa.table(
        {
            "event_type": final.column("event_type"),
            "hour_epoch": final.column("hour_epoch"),
            # Arrow arithmetic, not np.rint: a group whose every value is
            # null sums to NULL (SQL SUM semantics) and must STAY null —
            # to_numpy would turn it into NaN and the int cast into garbage
            "total_value_cents": pc.cast(
                pc.round(pc.multiply(final.column("value_sum_sum"), 100.0)),
                pa.int64(),
            ),
            "n_events": final.column("value_count_sum"),
        }
    ).sort_by([("event_type", "ascending"), ("hour_epoch", "ascending")])


def q_top_revenue_orders(sf_dir: str):
    """Distributed top-k by sort key: per-batch local top-100, driver
    merges k rows per batch — no global sort shuffle (ORDER BY ... LIMIT
    analog at scale)."""
    K = 100
    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def local_top(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -price))[:K]
        return t.take(pa.array(order))

    partials = _to_table(ds.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True))
    price = partials.column("o_totalprice").to_numpy(zero_copy_only=False)
    key = partials.column("o_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -price))[:K]
    top = partials.take(pa.array(order))
    return pa.table(
        {
            "o_orderkey": top.column("o_orderkey"),
            "totalprice_cents": pa.array(
                np.rint(top.column("o_totalprice").to_numpy() * 100).astype(np.int64)
            ),
        }
    )


def q_distinct_users(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type: per-batch distinct pairs
    (the partial-dedup combiner) cut the shuffle to O(distinct pairs per
    batch); the global pair dedup runs as a DISTRIBUTED groupby (the pair
    domain is unbounded at scale — never driver-side), and only the tiny
    per-type counts reach the driver."""
    ds = _decoded(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    deduped = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    # distributed global dedup + per-type count: one shuffle on the pair;
    # agg_by_keys (sort + Arrow-vectorized block group_by) — the pair
    # domain is unbounded at scale, and Ray aggregate's per-group Python
    # reduce would pay O(distinct pairs) driver-side calls
    from ..functions.aggregates import agg_by_keys

    distinct = agg_by_keys(deduped, ["event_type", "user_id"], [("user_id", "count_all", "_c")])

    def count_per_type(t: pa.Table) -> pa.Table:
        return t.group_by("event_type").aggregate([("user_id", "count")])

    partials = _to_table(
        distinct.map_batches(count_per_type, batch_format="pyarrow", zero_copy_batch=True)
    )
    final = partials.group_by("event_type").aggregate([("user_id_count", "sum")])
    return pa.table(
        {
            "event_type": final.column("event_type"),
            "n_users": final.column("user_id_count_sum").cast(pa.int64()),
        }
    ).sort_by("event_type")


def q_median_value(sf_dir: str):
    """EXACT distributed per-group median (PERCENTILE_DISC(0.5)): the
    smallest value whose within-group rank reaches ceil(n/2).  Group
    counts are a tiny aggregate; ranks come from ONE global sort by
    (group, value, tiebreak) + the distributed prefix scan of ones —
    no per-group sort, no driver-side value lists.  Exact quantiles are
    inherently rank-selection; this is the sort-once shape that scales
    (core factored into functions/aggregates.group_median_disc — MAD
    reuses it twice)."""
    from ..functions.aggregates import group_median_disc

    ds = _decoded(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        # Arrow math so null values STAY null (group_median_disc drops
        # them, matching SQL aggregates); np.rint would turn NaN into
        # INT64_MIN garbage that ranks as a real value
        v = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id"),
                "v": v,
            }
        )

    med = group_median_disc(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        "v",
        "event_id",
        # SQL quantile_disc emits a (key, NULL) row for a group whose
        # every value is null; MAD's two filtered-input passes don't
        emit_null_groups=True,
    )
    return pa.table(
        {"event_type": med.column("event_type"), "median_cents": med.column("v")}
    )


def q_running_revenue(sf_dir: str):
    """Per-customer running revenue — SUM OVER (PARTITION BY customer
    ORDER BY date) — via the segmented distributed prefix sum
    (functions/aggregates.with_group_prefix_sum: O(blocks) keyed carry,
    nothing O(customers) anywhere)."""
    from ..functions.aggregates import with_group_prefix_sum

    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    PACK = 1 << 21  # validity rides the low bits: v = cents*PACK + is_valid

    def cents(t: pa.Table) -> pa.Table:
        # SQL window SUM skips null terms and is NULL until the first
        # valid one; ONE prefix sum carries both via the pack (documented
        # headroom: < 2^21 rows and < 2^42 cents per customer partition).
        # The NULL customer is ONE partition: sentinel -1 (ids are >= 0).
        c = _rnd_i64(t.column("o_totalprice"), 100)
        ck = t.column("o_custkey")
        ck = pc.fill_null(ck, -1) if ck.null_count else ck
        v = pc.add(pc.multiply(pc.fill_null(c, 0), PACK),
                   pc.cast(pc.is_valid(c), pa.int64()))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": ck,
                "o_orderdate": t.column("o_orderdate").cast(pa.int64()),
                "cents": v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v,
            }
        )

    scanned = with_group_prefix_sum(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        "cents",
        out="running_cents",
    )
    out = _to_table(
        scanned.map_batches(
            lambda t: t.select(["o_orderkey", "running_cents"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ).sort_by("o_orderkey")
    packed = out.column("running_cents").to_numpy(zero_copy_only=False)
    rc = pa.array(packed >> 21, pa.int64())
    rc = pc.if_else(pa.array((packed & (PACK - 1)) == 0), pa.scalar(None, pa.int64()), rc)
    return out.set_column(1, "running_cents", rc)


def q_order_gaps(sf_dir: str):
    """Days since the customer's previous order — LAG OVER (PARTITION BY
    customer ORDER BY date, key) via the distributed window-LAG operator
    (functions/aggregates.with_group_lag); null for first orders."""
    from ..functions.aggregates import with_group_lag

    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "ts_us": t.column("o_orderdate").cast(pa.int64()),
            }
        )

    lagged = with_group_lag(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        ["ts_us", "o_orderkey"],
        "ts_us",
        out="prev_us",
    )

    def gap(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.subtract(t.column("ts_us"), t.column("prev_us")), 86_400_000_000)
        return pa.table({"o_orderkey": t.column("o_orderkey"), "gap_days": d})

    return _to_table(
        lagged.map_batches(gap, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("o_orderkey")


def q_global_quantiles(sf_dir: str):
    """Exact global quantiles (p50/p90/p99) of events.value, quantized to
    e6 integers so the DuckDB quantile_disc oracle hash-matches without
    float ambiguity.

    Shape: per-batch np.unique combiner -> ONE sum_by_keys over the value
    domain (the distributed value-histogram — the classic exact-quantile
    shape at scale) -> O(distinct quantized values) driver cumsum +
    searchsorted selection.  quantile_disc semantics: the smallest value
    whose running count reaches ceil(q * n)."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["value"])

    def quant(t: pa.Table) -> pa.Table:
        vcol = t.column("value")
        if vcol.null_count:
            t = t.filter(pc.is_valid(vcol))  # SQL quantiles ignore nulls
        v = np.rint(t.column("value").to_numpy(zero_copy_only=False) * 1_000_000).astype(
            np.int64
        )
        d, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(d), "c": pa.array(c.astype(np.int64))})

    dist = sum_by_keys(
        ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True), ["v"], "c"
    )
    tbl = _to_table(dist)
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    out_q, out_v = [], []
    for label, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
        k = int(np.ceil(q * n))
        out_q.append(label)
        out_v.append(int(v[np.searchsorted(cum, k)]))
    return pa.table({"q": pa.array(out_q), "val_e6": pa.array(out_v, pa.int64())})


def q_join_lineitem_orders(sf_dir: str):
    """Large-large distributed join: lineitem revenue per order (exact
    integer e4 cents — no float-order ambiguity) via the distributed
    sum_by_keys aggregate, then a HASH-SHUFFLE JOIN to orders with
    ray.data Dataset.join (both sides co-partitioned by key — neither is
    broadcast, unlike q_join_orders_customer's small-side ray.put path),
    then a tiny per-priority rollup.  The two join strategies together
    cover ORC's host-engine join surface (SURVEY.md §2.8)."""
    li = _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def to_cents(t: pa.Table) -> pa.Table:
        # null price/discount nulls the term (SQL SUM skips it): fill 0 is
        # sum-equivalent, and the order row itself still joins and counts
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_e4": _rev_e4_arr(t)}
        )

    from ..functions.aggregates import sum_by_keys

    per_order = sum_by_keys(
        li.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        "rev_e4",
    )
    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = per_order.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "rev_e4_sum": pa.array([], pa.int64()),
                    "count_all": pa.array([], pa.int64()),
                }
            )
        return t.group_by(["o_orderpriority"]).aggregate(
            [("rev_e4", "sum"), ([], "count_all")]
        )

    parts = _to_table(joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by(["o_orderpriority"]).aggregate(
        [("rev_e4_sum", "sum"), ("count_all", "sum")]
    )
    return pa.table(
        {
            "o_orderpriority": final.column("o_orderpriority"),
            "rev_e4": final.column("rev_e4_sum_sum"),
            "n_orders": final.column("count_all_sum"),
        }
    ).sort_by("o_orderpriority")


def q_top_segment_revenue(sf_dir: str):
    """TPC-H Q3 analog — a THREE-table composition exercising every join
    strategy the engine offers in one pipeline: broadcast semi-join
    (customer segment keys via ray.put, probed with a vectorized is_in),
    predicate-pushdown decodes on BOTH fact streams (the l_shipdate /
    o_orderdate chunk+stride pruning is the SargsApplier analog; temporal
    literals are epoch-us ints so one literal form drives stats pruning
    and the row filter), distributed sum_by_keys revenue, a hash-shuffle
    Dataset.join (neither fact side broadcast), and local top-k with an
    O(blocks x 10) driver merge — no global sort."""
    from ..functions.aggregates import sum_by_keys

    cut_us = 883_612_800_000_000  # 1998-01-01 00:00:00 UTC in epoch-us

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = (
        cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING"))
        .column("c_custkey")
        .combine_chunks()
    )
    keys_ref = ray.put(keys)

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        predicates=[("l_shipdate", ">", cut_us)],
    )

    def to_cents(t: pa.Table) -> pa.Table:
        # null price/discount nulls the term (SQL SUM skips it): fill 0 is
        # sum-equivalent, and the order row itself still joins and counts
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_e4": _rev_e4_arr(t)}
        )

    rev = sum_by_keys(
        li.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        "rev_e4",
    )

    orders = _decoded(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        predicates=[("o_orderdate", "<", cut_us)],
    )

    def seg_filter(t: pa.Table, *, ref=keys_ref) -> pa.Table:
        ks = ray.get(ref)  # local zero-copy object-store fetch
        sub = t.filter(pc.is_in(t.column("o_custkey"), value_set=ks))
        return sub.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    orders_f = orders.map_batches(seg_filter, batch_format="pyarrow", zero_copy_batch=True)
    joined = rev.join(
        orders_f,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    sort_keys = [
        ("rev_e4", "descending"),
        ("o_orderdate", "ascending"),
        ("l_orderkey", "ascending"),
    ]

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:10])

    tops = _to_table(joined.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True))
    out = tops.take(pc.sort_indices(tops, sort_keys=sort_keys)[:10])
    return pa.table(
        {
            "o_orderkey": out.column("l_orderkey"),
            "rev_e4": out.column("rev_e4"),
            "o_orderdate": out.column("o_orderdate"),
            "o_orderpriority": out.column("o_orderpriority"),
        }
    )


def q_nation_revenue(sf_dir: str):
    """TPC-H Q5 analog — the star-schema multi-join covering ALL the dim
    tables (region ⋈ nation ⋈ supplier ⋈ customer): 1996 revenue per
    ASIA nation where the supplier and customer share the nation.

    Shape: the three dim maps (nation-region, supplier->nation,
    customer->nation) are broadcast ONCE via ray.put and probed with
    vectorized index_in inside map_batches; orders decodes under an
    o_orderdate predicate pushdown and — being ~3% selective — rides the
    BROADCAST arm of join_adaptive, so the lineitem stream never
    shuffles at all: one pass, per-batch O(nations) partials, tiny
    driver rollup.  Past the broadcast threshold the same call becomes a
    hash-shuffle Dataset.join (exercised by q_join_lineitem_orders /
    q_top_segment_revenue), where the sum_by_keys pre-aggregation
    pattern applies."""
    lo_us = 820_454_400_000_000  # 1996-01-01 epoch-us
    hi_us = 852_076_800_000_000  # 1997-01-01 epoch-us

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia_rk = region.filter(pc.equal(region.column("r_name"), "ASIA")).column("r_regionkey")
    asia = nation.filter(pc.is_in(nation.column("n_regionkey"), value_set=asia_rk.combine_chunks()))
    asia_keys = asia.column("n_nationkey").combine_chunks()
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    dims_ref = ray.put(
        (
            asia_keys,
            supp.column("s_suppkey").combine_chunks(),
            supp.column("s_nationkey").combine_chunks(),
            cust.column("c_custkey").combine_chunks(),
            cust.column("c_nationkey").combine_chunks(),
        )
    )

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        asia_k, sk, sn, _, _ = ray.get(ref)
        s_nat = pc.take(sn, pc.index_in(t.column("l_suppkey"), value_set=sk))
        keep = pc.is_in(s_nat, value_set=asia_k)
        t = t.append_column("s_nat", s_nat).filter(keep)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "s_nat": t.column("s_nat"),
                "rev_e4": _rev_e4_arr(t),
            }
        )

    li_rev = li.map_batches(li_stage, batch_format="pyarrow", zero_copy_batch=True)

    orders = _decoded(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        predicates=[
            ("and", ("o_orderdate", ">=", lo_us), ("o_orderdate", "<", hi_us))
        ],
    )

    def ord_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        asia_k, _, _, ck, cn = ray.get(ref)
        c_nat = pc.take(cn, pc.index_in(t.column("o_custkey"), value_set=ck))
        t = t.append_column("c_nat", c_nat)
        t = t.filter(pc.is_in(t.column("c_nat"), value_set=asia_k))
        return t.select(["o_orderkey", "c_nat"])

    orders_f = orders.map_batches(ord_stage, batch_format="pyarrow", zero_copy_batch=True)
    from ..functions.joins import join_adaptive

    # past the broadcast threshold, RESTORE the sum_by_keys
    # pre-aggregation before the hash-shuffle join (the at-scale path
    # must shuffle (l_orderkey, s_nat) partials, not raw lineitem rows)
    orders_small = orders_f.materialize()
    if orders_small.count() > 500_000:
        from ..functions.aggregates import sum_by_keys

        li_rev = sum_by_keys(li_rev, ["l_orderkey", "s_nat"], "rev_e4")
    joined = join_adaptive(
        li_rev,
        orders_small,
        big_key="l_orderkey",
        small_key="o_orderkey",
        payload_cols=["c_nat"],
    )

    def nat_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"nat": pa.array([], pa.int64()), "rev_e4": pa.array([], pa.int64())}
            )
        t = t.filter(pc.equal(t.column("s_nat"), t.column("c_nat")))
        g = t.group_by("s_nat").aggregate([("rev_e4", "sum")])
        return pa.table(
            {
                "nat": g.column("s_nat").cast(pa.int64()),
                "rev_e4": g.column("rev_e4_sum"),
            }
        )

    parts = _to_table(joined.map_batches(nat_partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("nat").aggregate([("rev_e4", "sum")])
    name_of = dict(
        zip(asia.column("n_nationkey").to_pylist(), asia.column("n_name").to_pylist())
    )
    names = [name_of[k] for k in final.column("nat").to_pylist()]
    return pa.table(
        {
            "n_name": pa.array(names, pa.string()),
            "rev_e4": final.column("rev_e4_sum"),
        }
    ).sort_by([("rev_e4", "descending"), ("n_name", "ascending")])


def _month_id_from_epoch_us(us: np.ndarray) -> np.ndarray:
    """epoch-us -> calendar month id (12*y + m-1), vectorized via
    Hinnant's civil-from-days algorithm (shared by promo_share and
    order_clusters)."""
    days = us // 86_400_000_000
    z = days + 719_468
    era = z // 146_097
    doe = z - era * 146_097
    yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    m = mp + 3 - 12 * (mp // 10)
    y = yoe + era * 400 + (mp // 10)
    return y * 12 + (m - 1)


def q_promo_share(sf_dir: str):
    """TPC-H Q14 analog (covers the `part` dim): monthly revenue split by
    whether the part is a PROMO type.  The part->is_promo bitmap is
    broadcast once (ray.put), probed with index_in; per-batch partials
    emit O(months) rows; the final rollup is tiny."""
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk = part.column("p_partkey").combine_chunks()
    promo = pc.starts_with(part.column("p_type").combine_chunks(), "PROMO")
    ref = ray.put((pk, promo))

    ds = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table, *, ref=ref) -> pa.Table:
        pk, promo = ray.get(ref)
        isp = pc.take(promo, pc.index_in(t.column("l_partkey"), value_set=pk))
        us = t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        month_id = _month_id_from_epoch_us(us)
        # null price/discount terms contribute 0 to both sums (SQL SUM
        # skips the NULL term); NULL LIKE 'PROMO%' is not true -> False
        rev = _rev_e4_arr(t).to_numpy(zero_copy_only=False)
        ispn = pc.fill_null(isp, False).to_numpy(zero_copy_only=False).astype(bool)
        g = pa.table(
            {
                "month_id": pa.array(month_id),
                "promo_rev": pa.array(np.where(ispn, rev, 0)),
                "total_rev": pa.array(rev),
            }
        ).group_by("month_id").aggregate([("promo_rev", "sum"), ("total_rev", "sum")])
        return pa.table(
            {
                "month_id": g.column("month_id"),
                "promo_rev": g.column("promo_rev_sum"),
                "total_rev": g.column("total_rev_sum"),
            }
        )

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("month_id").aggregate([("promo_rev", "sum"), ("total_rev", "sum")])
    return pa.table(
        {
            "month_id": final.column("month_id"),
            "promo_rev_e4": final.column("promo_rev_sum"),
            "total_rev_e4": final.column("total_rev_sum"),
        }
    ).sort_by("month_id")


_ROLLUP_ALL = "\x00ALL"  # non-null sentinel for rolled-up dims (sum_by_keys keys must be non-null)


def q_rollup_revenue(sf_dir: str):
    """GROUPING SETS / ROLLUP aggregate: lineitem revenue at three levels
    — (returnflag, linestatus), (returnflag), () — in ONE pass.  Each
    batch emits partial rows for every level (the rolled-up dims carry a
    sentinel, mapped to SQL NULL at the end), so the shuffle stays
    O(groups x levels) and no second scan of the data is needed — the
    classic one-pass cube shape."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        base = (
            pa.table(
                {
                    "f": t.column("l_returnflag"),
                    "s": t.column("l_linestatus"),
                    "rev": _rev_e4_arr(t),
                }
            )
            .group_by(["f", "s"])
            .aggregate([("rev", "sum")])
        )
        lvl0 = pa.table(
            {"f": base.column("f"), "s": base.column("s"), "rev": base.column("rev_sum")}
        )
        up1 = lvl0.group_by("f").aggregate([("rev", "sum")])
        lvl1 = pa.table(
            {
                "f": up1.column("f"),
                "s": pa.array([_ROLLUP_ALL] * up1.num_rows, pa.string()),
                "rev": up1.column("rev_sum"),
            }
        )
        total = int(pc.sum(lvl0.column("rev")).as_py() or 0)
        lvl2 = pa.table(
            {
                "f": pa.array([_ROLLUP_ALL], pa.string()),
                "s": pa.array([_ROLLUP_ALL], pa.string()),
                "rev": pa.array([total], pa.int64()),
            }
        )
        return pa.concat_tables([lvl0, lvl1, lvl2])

    agg = sum_by_keys(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["f", "s"],
        "rev",
        out="rev_e4",
    )
    tbl = _to_table(agg)
    null_f = pc.equal(tbl.column("f"), _ROLLUP_ALL)
    null_s = pc.equal(tbl.column("s"), _ROLLUP_ALL)
    return pa.table(
        {
            "l_returnflag": pc.if_else(null_f, pa.scalar(None, pa.string()), tbl.column("f")),
            "l_linestatus": pc.if_else(null_s, pa.scalar(None, pa.string()), tbl.column("s")),
            "rev_e4": tbl.column("rev_e4"),
        }
    ).sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")]
    )


def q_group_quantiles(sf_dir: str):
    """Exact per-group quantiles (p50/p90/p99 of events.value per
    event_type), e6-quantized — the grouped extension of
    q_global_quantiles' distributed value-histogram shape.

    Per-batch Arrow group_by combiner over (event_type, v) -> ONE
    sum_by_keys -> the driver sees only the distinct (group, value)
    histogram (the documented exact-quantile ceiling), lexsorts once and
    selects per-group with vectorized cumsums."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["event_type", "value"])

    def quant(t: pa.Table) -> pa.Table:
        # null-propagating Arrow math: null values form their own
        # (g, NULL) histogram cell, so a group whose EVERY value is
        # null still reaches the epilogue (SQL emits its NULL-quantile
        # row); np.rint would turn NaN into INT64_MIN garbage
        v = pc.cast(pc.round(pc.multiply(t.column("value"), 1_000_000.0)), pa.int64())
        g = (
            pa.table({"g": t.column("event_type"), "v": v})
            .group_by(["g", "v"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"g": g.column("g"), "v": g.column("v"), "c": g.column("count_all")})

    dist = sum_by_keys(
        ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True), ["g", "v"], "c"
    )
    tbl = _to_table(dist)
    # Arrow sort, not np.lexsort: a null group key (None in an object
    # array) would hit Python's None-vs-str '<'; nulls order LAST.
    # The run break below is safe: None != None is False for objects.
    tbl = tbl.sort_by([("g", "ascending"), ("v", "ascending")])
    gs = tbl.column("g").to_numpy(zero_copy_only=False)
    vvalid = pc.is_valid(tbl.column("v")).to_numpy(zero_copy_only=False)
    v = tbl.column("v").fill_null(0).to_numpy(zero_copy_only=False)
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    brk = np.ones(gs.size, dtype=bool)
    brk[1:] = gs[1:] != gs[:-1]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], gs.size]
    out_g, out_q, out_v = [], [], []
    for st, en in zip(starts, ends):
        en = st + int(vvalid[st:en].sum())  # null cell sorts last in-group
        if en == st:  # every value in the group is null -> NULL quantiles
            for label in ("p50", "p90", "p99"):
                out_g.append(gs[st])
                out_q.append(label)
                out_v.append(None)
            continue
        cum = np.cumsum(c[st:en])
        n = int(cum[-1])
        for label, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            k = int(np.ceil(q * n))
            out_g.append(gs[st])
            out_q.append(label)
            out_v.append(int(v[st + np.searchsorted(cum, k)]))
    return pa.table(
        {
            "event_type": pa.array(out_g, pa.string()),
            "q": pa.array(out_q, pa.string()),
            "val_e6": pa.array(out_v, pa.int64()),
        }
    )


def q_bloom_join(sf_dir: str, stats_out: dict | None = None):
    """Bloom-pruned semi-join: lineitem ⋈ high-value orders
    (o_totalprice > 475000, ~5% of orders).

    The build side streams through ``build_bloom_stream`` (one
    fixed-geometry partial filter per batch, OR-merged — O(batches x KiB)
    driver traffic), the merged filter is broadcast ONCE (``ray.put``),
    and every lineitem batch probes it vectorized
    (``bloom.might_contain_many``) BEFORE any join work: rows whose key
    is definitely absent (~95% here) are dropped inside the map task, so
    at 100 TB the join moves ~5%+fpp of the big side instead of all of
    it.  Survivors resolve against the exact broadcast (key -> priority)
    dict, which also eliminates bloom false positives — the result is
    exact.  Join-pruning analog of the reference's BloomFilterUtf8 +
    SargsApplier chunk skipping (SURVEY.md §2.5), applied to the shuffle
    instead of the scan."""
    THRESH = 475000.0
    hi = _decoded(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        predicates=[("o_totalprice", ">", THRESH)],
    )
    n_orders_total = pq.read_metadata(os.path.join(sf_dir, "orders.parquet")).num_rows
    from ..functions.joins import build_bloom_stream

    # geometry from the EXPECTED filtered cardinality (~5% + slack);
    # sizing from a prior estimate keeps the build one-pass
    filt = build_bloom_stream(hi, "o_orderkey", expected_items=max(1024, n_orders_total // 10), fpp=0.01)

    # exact small side: (key -> priority) for false-positive elimination +
    # payload.  Documented ceiling: one object-store copy per node; for a
    # larger build side, hash-partition both sides (q_join_lineitem_orders).
    hi_t = _to_table(hi)
    keys = hi_t.column("o_orderkey").combine_chunks()
    prio = hi_t.column("o_orderpriority").combine_chunks()
    bref = ray.put((filt, keys, prio))

    li = _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def probe(t: pa.Table, *, bref) -> pa.Table:
        from ..codecs import bloom as _bloom

        filt, keys, prio = ray.get(bref)
        lk = t.column("l_orderkey").combine_chunks() if isinstance(t.column("l_orderkey"), pa.ChunkedArray) else t.column("l_orderkey")
        rows_in = t.num_rows
        keep = _bloom.might_contain_many(filt, lk)
        rows_bloom = int(keep.sum())
        sub = t.filter(pa.array(keep))
        # exact resolve kills bloom false positives
        pos = pc.index_in(sub.column("l_orderkey"), value_set=keys)
        hit = pc.is_valid(pos)
        sub = sub.filter(hit)
        pos = pos.filter(hit)
        if sub.num_rows == 0:
            g = pa.table({"o_orderpriority": pa.array([""], pa.string()),
                          "rev_e4": pa.array([0], pa.int64()),
                          "n_items": pa.array([0], pa.int64())})
        else:
            g = pa.table(
                {"o_orderpriority": pc.take(prio, pos), "rev_e4": _rev_e4_arr(sub)}
            ).group_by("o_orderpriority").aggregate([("rev_e4", "sum"), ([], "count_all")])
            g = g.rename_columns(["o_orderpriority", "rev_e4", "n_items"])
        # per-batch pruning counters ride on the first group row; summed in
        # the final rollup, asserted (kept << in) by tests
        bin_ = np.zeros(g.num_rows, np.int64)
        bkept = np.zeros(g.num_rows, np.int64)
        bin_[0], bkept[0] = rows_in, rows_bloom
        return g.append_column("b_in", pa.array(bin_)).append_column("b_kept", pa.array(bkept))

    parts = _to_table(li.map_batches(functools.partial(probe, bref=bref), batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("o_orderpriority").aggregate(
        [("rev_e4", "sum"), ("n_items", "sum"), ("b_in", "sum"), ("b_kept", "sum")]
    )
    if stats_out is not None:
        stats_out["rows_in"] = int(pc.sum(final.column("b_in_sum")).as_py())
        stats_out["rows_after_bloom"] = int(pc.sum(final.column("b_kept_sum")).as_py())
    final = final.filter(pc.greater(final.column("n_items_sum"), 0))  # drop the empty-batch counter rows
    return pa.table(
        {
            "o_orderpriority": final.column("o_orderpriority"),
            "rev_e4": final.column("rev_e4_sum"),
            "n_items": final.column("n_items_sum"),
        }
    ).sort_by("o_orderpriority")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_weekday(sf_dir: str):
    """PIVOT: weekday x event_type count matrix — the rows-to-columns
    reshape every reporting layer runs.  Distributed shape: each batch
    computes its own tiny pivot (one group_by + a CASE-mask sum per
    known column — the SQL PIVOT lowering), partials sum on the driver
    at O(7 x types).  Weekday from epoch-days (1970-01-01 was a
    Thursday: (days + 4) % 7 gives 0=Sunday, DuckDB's dayofweek)."""
    ds = _decoded(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        wd = ((us // 86_400_000_000 + 4) % 7).astype(np.int64)
        et = t.column("event_type").combine_chunks() if isinstance(t.column("event_type"), pa.ChunkedArray) else t.column("event_type")
        cols = {"weekday": []}
        mats = np.zeros((7, len(_EVENT_TYPES)), np.int64)
        codes_arr = pc.index_in(et, value_set=pa.array(_EVENT_TYPES))
        known = pc.is_valid(codes_arr).to_numpy(zero_copy_only=False)
        codes = codes_arr.to_numpy(zero_copy_only=False)
        np.add.at(mats, (wd[known], codes[known].astype(np.int64)), 1)
        cols["weekday"] = pa.array(np.arange(7, dtype=np.int64))
        out = {"weekday": cols["weekday"]}
        for j, name in enumerate(_EVENT_TYPES):
            out[f"n_{name}"] = pa.array(mats[:, j])
        return pa.table(out)

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("weekday").aggregate([(f"n_{n}", "sum") for n in _EVENT_TYPES])
    out = {"weekday": final.column("weekday")}
    for n in _EVENT_TYPES:
        out[f"n_{n}"] = final.column(f"n_{n}_sum")
    return pa.table(out).sort_by("weekday")


def q_revenue_quartiles(sf_dir: str):
    """NTILE(4) revenue quartiles over orders — equal-population rank
    bucketing via the distributed window-rank operator (with_group_ranks
    with a constant partition key: one range sort, O(blocks) driver
    carry, vectorized in-block ordinals), then the standard NTILE split
    (first n%4 buckets one row larger) and O(4 x blocks) partials."""
    from ..functions.aggregates import with_group_ranks

    n_orders = pq.read_metadata(os.path.join(sf_dir, "orders.parquet")).num_rows
    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        # NULL price ranks LAST (DuckDB ORDER BY default): +INT64_MAX
        # sentinel orders it; cv excludes it from the bucket SUM while
        # COUNT(*) still counts the row
        c = _rnd_i64(t.column("o_totalprice"), 100)
        cv = pc.cast(pc.is_valid(c), pa.int64())
        return pa.table(
            {
                "g": pa.array(np.zeros(t.num_rows, np.int64)),
                "o_orderkey": t.column("o_orderkey"),
                "cents": pc.fill_null(c, np.iinfo(np.int64).max),
                "cv": cv,
            }
        )

    ranked = with_group_ranks(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["g"],
        ["cents", "o_orderkey"],
    )
    q_, r_ = divmod(n_orders, 4)

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "n_orders": pa.array([], pa.int64()),
                 "revenue_cents": pa.array([], pa.int64())}
            )
        rnk = t.column("rnk").to_numpy(zero_copy_only=False)  # 1-based
        # NTILE: first r_ buckets have q_+1 rows, the rest q_
        cut = r_ * (q_ + 1)
        b = np.where(rnk <= cut, (rnk - 1) // max(q_ + 1, 1), r_ + (rnk - 1 - cut) // max(q_, 1))
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        cv = t.column("cv").to_numpy(zero_copy_only=False).astype(bool)
        out = np.zeros(4, np.int64)
        cnt = np.zeros(4, np.int64)
        np.add.at(out, b[cv], cents[cv])
        np.add.at(cnt, b, 1)
        return pa.table(
            {
                "bucket": pa.array(np.arange(1, 5, dtype=np.int64)),
                "n_orders": pa.array(cnt),
                "revenue_cents": pa.array(out),
            }
        )

    parts = _to_table(ranked.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("bucket").aggregate([("n_orders", "sum"), ("revenue_cents", "sum")])
    return pa.table(
        {
            "bucket": final.column("bucket"),
            "n_orders": final.column("n_orders_sum"),
            "revenue_cents": final.column("revenue_cents_sum"),
        }
    ).sort_by("bucket")


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 analog — the pure predicate-pushdown aggregate: a one-year
    shipdate window (temporal epoch-us literals drive chunk + stride
    pruning), a BETWEEN on discount and a < on quantity, then ONE exact
    global sum of extendedprice*discount in e4 cents.  Per-batch partials
    emit a single row each; the driver adds O(blocks) ints."""
    lo_us = 852_076_800_000_000  # 1997-01-01 epoch-us
    hi_us = 883_612_800_000_000  # 1998-01-01 epoch-us
    ds = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_extendedprice", "l_discount"],
        predicates=[
            ("l_shipdate", ">=", lo_us),
            ("l_shipdate", "<", hi_us),
            ("l_discount", "between", 0.03, 0.05),
            ("l_quantity", "<", 24.0),
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        # ROUND(e*100)*ROUND(d*100): a null factor nulls the term (SQL SUM skip)
        e = _rnd_i64(t.column("l_extendedprice"), 100)
        d = _rnd_i64(t.column("l_discount"), 100)
        rev = pc.fill_null(pc.multiply(e, d), 0).to_numpy(zero_copy_only=False)
        return pa.table({"rev_e4": pa.array([int(rev.sum())], pa.int64())})

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    total = int(pc.sum(parts.column("rev_e4")).as_py() or 0)
    return pa.table({"rev_e4": pa.array([total], pa.int64())})


def q_large_orders(sf_dir: str):
    """TPC-H Q18 analog (large-volume customers): distributed HAVING —
    sum_by_keys quantities per order, filter sum > 150 (a streamed
    filter over the aggregate, O(qualifying orders) rows), then the
    qualifying keys flow through the engine's join_semi_anti broadcast
    SEMI arm into orders, a broadcast customer-name join, and a local
    top-k by totalprice.  Nothing unbounded ever sits on the driver
    except the qualifying-order table (aggregate output, not input)."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive, join_semi_anti

    li = _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty(t: pa.Table) -> pa.Table:
        # ROUND(null) is NULL and SUM skips it == contributes 0; HAVING
        # sum>150 agrees (NULL>150 is false, 0>150 is false)
        q = _rnd_i64(t.column("l_quantity"), fill=0)
        return pa.table({"l_orderkey": t.column("l_orderkey"), "qty": q})

    sums = sum_by_keys(
        li.map_batches(qty, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        "qty",
        out="sum_qty",
    )

    def having(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return t.filter(pc.greater(t.column("sum_qty"), 150))

    # materialized once: the HAVING output feeds both the semi-join key
    # side and the broadcast re-attach below (avoids recomputing the
    # aggregate for each consumer)
    big = sums.map_batches(having, batch_format="pyarrow", zero_copy_batch=True).materialize()

    orders = _decoded(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    qual = join_semi_anti(orders, big, "o_orderkey", "l_orderkey")
    # re-attach each qualifying order's quantity sum (broadcast: the
    # HAVING output is O(qualifying orders))
    qual = join_adaptive(qual, big, "o_orderkey", "l_orderkey", ["sum_qty"])

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    cref = ray.put((cust.column("c_custkey").combine_chunks(), cust.column("c_name").combine_chunks()))

    def with_name(t: pa.Table, *, ref=cref) -> pa.Table:
        ck, cn = ray.get(ref)
        pos = pc.index_in(t.column("o_custkey"), value_set=ck)
        # INNER JOIN customer: null/unmatched custkeys never join
        t = t.filter(pc.is_valid(pos))
        pos = pos.filter(pc.is_valid(pos))
        price_e2 = _rnd_i64(t.column("o_totalprice"), 100)  # NULLS LAST in the top-k
        return pa.table(
            {
                "c_name": pc.take(cn, pos),
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "price_e2": price_e2,
                "sum_qty": t.column("sum_qty"),
            }
        )

    named = qual.map_batches(with_name, batch_format="pyarrow", zero_copy_batch=True)
    sort_keys = [("price_e2", "descending"), ("o_orderkey", "ascending")]

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:100])

    tops = _to_table(named.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True))
    return tops.take(pc.sort_indices(tops, sort_keys=sort_keys)[:100])


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(returnflag, linestatus) — all four grouping sets in
    ONE pass (generalizes q_rollup_revenue's one-pass shape: each batch
    emits partials for every set with sentinel dims; the shuffle stays
    O(groups x 4))."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        base = (
            pa.table(
                {
                    "f": t.column("l_returnflag"),
                    "s": t.column("l_linestatus"),
                    "rev": _rev_e4_arr(t),
                }
            )
            .group_by(["f", "s"])
            .aggregate([("rev", "sum")])
        )
        lvl_fs = pa.table(
            {"f": base.column("f"), "s": base.column("s"), "rev": base.column("rev_sum")}
        )
        up_f = lvl_fs.group_by("f").aggregate([("rev", "sum")])
        lvl_f = pa.table(
            {
                "f": up_f.column("f"),
                "s": pa.array([_ROLLUP_ALL] * up_f.num_rows, pa.string()),
                "rev": up_f.column("rev_sum"),
            }
        )
        up_s = lvl_fs.group_by("s").aggregate([("rev", "sum")])
        lvl_s = pa.table(
            {
                "f": pa.array([_ROLLUP_ALL] * up_s.num_rows, pa.string()),
                "s": up_s.column("s"),
                "rev": up_s.column("rev_sum"),
            }
        )
        total = int(pc.sum(lvl_fs.column("rev")).as_py() or 0)
        lvl_all = pa.table(
            {
                "f": pa.array([_ROLLUP_ALL], pa.string()),
                "s": pa.array([_ROLLUP_ALL], pa.string()),
                "rev": pa.array([total], pa.int64()),
            }
        )
        return pa.concat_tables([lvl_fs, lvl_f, lvl_s, lvl_all])

    agg = sum_by_keys(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["f", "s"],
        "rev",
        out="rev_e4",
    )
    tbl = _to_table(agg)
    null_f = pc.equal(tbl.column("f"), _ROLLUP_ALL)
    null_s = pc.equal(tbl.column("s"), _ROLLUP_ALL)
    return pa.table(
        {
            "l_returnflag": pc.if_else(null_f, pa.scalar(None, pa.string()), tbl.column("f")),
            "l_linestatus": pc.if_else(null_s, pa.scalar(None, pa.string()), tbl.column("s")),
            "rev_e4": tbl.column("rev_e4"),
        }
    ).sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def q_anti_join_customers(sf_dir: str):
    """Distributed ANTI join (NOT EXISTS): customers with no order above
    400,000 — the qualifying-order key side streams through
    join_semi_anti's broadcast arm (distinct keys shipped once via
    ray.put; the customer side never shuffles).  The partitioned arm of
    the same operator is parity-tested in tests/test_join_adaptive.py."""
    from ..functions.joins import join_semi_anti

    cust = _decoded(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    big_orders = _decoded(
        sf_dir,
        "orders",
        columns=["o_custkey"],
        predicates=[("o_totalprice", ">", 400000.0)],
    )
    out = join_semi_anti(cust, big_orders, "c_custkey", "o_custkey", anti=True)

    def cents(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "acctbal_e2": _rnd_i64(t.column("c_acctbal"), 100),
            }
        )

    return _to_table(
        out.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("c_custkey")


def q_json_extract_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer field ``k`` out of the
    events ``props`` JSON column with ONE vectorized Arrow regex per batch
    (no per-row json.loads), then aggregate per event_type through
    agg_by_keys.  The host-engine json_extract pushover around an ORC
    scan — string columns stay opaque bytes in the store; extraction is a
    read-side batch transform."""
    from ..functions.aggregates import agg_by_keys

    ds = _decoded(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props").combine_chunks(), r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    agg = agg_by_keys(
        ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        [
            ("k", "sum", "k_sum"),
            ("k", "min", "k_min"),
            ("k", "max", "k_max"),
            ("k", "count_all", "n"),
        ],
    )
    out = _to_table(agg)
    return pa.table(
        {
            "event_type": out.column("event_type"),
            "k_sum": out.column("k_sum").cast(pa.int64()),
            "k_min": out.column("k_min").cast(pa.int64()),
            "k_max": out.column("k_max").cast(pa.int64()),
            "n": out.column("n").cast(pa.int64()),
        }
    ).sort_by("event_type")


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram (bucket = min(floor(value/25), 19)) of the
    events value column — the binning aggregate every profiler needs, as
    per-batch vectorized bucketing + ONE sum_by_keys over 20 keys."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["value"])

    def bucketize(t: pa.Table) -> pa.Table:
        vcol = t.column("value")
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = np.nan_to_num(vcol.to_numpy(zero_copy_only=False))
        # a null value lands in the SQL NULL bucket group, not in a
        # garbage NaN->int bucket; null keys flow through sum_by_keys
        b = np.minimum(np.floor(v / 25.0).astype(np.int64), 19)
        out = (
            pa.table({"bucket": pa.array(b, mask=~valid),
                      "one": pa.array(np.ones(len(b), np.int64))})
            .group_by("bucket")
            .aggregate([("one", "sum")])
        )
        return pa.table({"bucket": out.column("bucket"), "n": out.column("one_sum")})

    agg = sum_by_keys(
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"],
        "n",
    )
    return _to_table(agg).sort_by("bucket")


def q_corr_moments(sf_dir: str):
    """Exact bivariate moments for corr(l_quantity, l_extendedprice):
    n, Σx, Σy, Σxy, Σx², Σy² as exact integers (quantity whole units,
    price in cents) — the one-pass parallel-merge moment pattern; the
    float correlation is a driver-side O(1) epilogue the oracle can
    reproduce from the same integers."""
    ds = _decoded(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        # per-sum SQL null skipping: a null factor nulls the product term
        # (an INT64_MIN-garbage cast would only cancel when the null count
        # happens to be even); COUNT(*) still counts every row
        xa = t.column("l_quantity")
        ya = t.column("l_extendedprice")
        xv = pc.is_valid(xa).to_numpy(zero_copy_only=False)
        yv = pc.is_valid(ya).to_numpy(zero_copy_only=False)
        x = np.where(xv, np.rint(np.nan_to_num(xa.to_numpy(zero_copy_only=False))), 0).astype(np.int64)
        y = np.where(yv, np.rint(np.nan_to_num(ya.to_numpy(zero_copy_only=False)) * 100), 0).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y * (xv & yv)).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    return pa.table(
        {
            c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)], pa.int64())
            for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]
        }
    )


def q_returned_item_revenue(sf_dir: str):
    """TPC-H Q10 analog — the FOUR-table pipeline: returned lineitems
    (l_returnflag = 'R', pushed as a string equality predicate into
    chunk pruning) pre-aggregate per order through sum_by_keys BEFORE
    any join; a half-year orders window (temporal pushdown) maps order
    -> customer via join_adaptive; a second sum_by_keys re-keys revenue
    per customer; the customer+nation dimension probe is ONE broadcast
    (ray.put) vectorized take; local top-k merges 20 rows per block on
    the driver.  Shuffle budget: two sum_by_keys sorts + one adaptive
    join — the facts never all-to-all against each other."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive

    lo_us = 852_076_800_000_000  # 1997-01-01 epoch-us
    hi_us = 867_715_200_000_000  # 1997-07-01 epoch-us

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        predicates=[("l_returnflag", "==", "R")],
    )

    def to_cents(t: pa.Table) -> pa.Table:
        # null price/discount nulls the term (SQL SUM skips it): fill 0 is
        # sum-equivalent, and the order row itself still joins and counts
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_e4": _rev_e4_arr(t)}
        )

    rev_per_order = sum_by_keys(
        li.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        "rev_e4",
    )

    orders = _decoded(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey"],
        predicates=[("o_orderdate", ">=", lo_us), ("o_orderdate", "<", hi_us)],
    )
    with_cust = join_adaptive(rev_per_order, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
    rev_per_cust = sum_by_keys(with_cust, ["o_custkey"], "rev_e4")

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nidx = pc.index_in(
        cust.column("c_nationkey").cast(pa.int32()),
        value_set=nation.column("n_nationkey").combine_chunks(),
    )
    # INNER JOIN nation: a customer with a null/unmatched c_nationkey
    # never reaches the output — drop before the broadcast
    cust = cust.filter(pc.is_valid(nidx))
    nmap = pc.take(nation.column("n_name").combine_chunks(), nidx.filter(pc.is_valid(nidx)))
    cref = ray.put(
        (
            cust.column("c_custkey").combine_chunks(),
            cust.column("c_name").combine_chunks(),
            cust.column("c_acctbal").combine_chunks(),
            nmap,
        )
    )

    def dims(t: pa.Table, *, ref=cref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        ck, cn, bal, nn = ray.get(ref)
        pos = pc.index_in(t.column("o_custkey"), value_set=ck)
        # INNER JOIN customer: null/unmatched custkeys never join
        t = t.filter(pc.is_valid(pos))
        pos = pos.filter(pc.is_valid(pos))
        acct = _rnd_i64(pc.take(bal, pos), 100)  # ROUND(NULL) stays NULL
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": pc.take(cn, pos),
                "n_name": pc.take(nn, pos),
                "acctbal_e2": acct,
                "rev_e4": t.column("rev_e4"),
            }
        )

    named = rev_per_cust.map_batches(dims, batch_format="pyarrow", zero_copy_batch=True)
    sort_keys = [("rev_e4", "descending"), ("c_custkey", "ascending")]

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:20])

    tops = _to_table(named.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True))
    return tops.take(pc.sort_indices(tops, sort_keys=sort_keys)[:20])


def q_order_priority_exists(sf_dir: str):
    """TPC-H Q4 analog — EXISTS rewritten as the distributed SEMI join
    operator: orders that have at least one returned line (l_returnflag =
    'R', pushed into chunk pruning on the lineitem scan), counted per
    o_orderpriority.  The key side streams through join_semi_anti (per-
    batch dedup before the broadcast/partitioned arm decision); the
    orders side never shuffles; the count is one sum_by_keys over five
    priority groups."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_semi_anti

    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    returned = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey"],
        predicates=[("l_returnflag", "==", "R")],
    )
    kept = join_semi_anti(orders, returned, "o_orderkey", "l_orderkey")

    def ones(t: pa.Table) -> pa.Table:
        # per-batch combiner: <=5 priority rows leave each block, so the
        # sum_by_keys sort shuffles O(blocks x priorities), not O(orders)
        g = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "one": g.column("count_all").cast(pa.int64()),
            }
        )

    agg = sum_by_keys(
        kept.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderpriority"],
        "one",
        out="n_orders",
    )
    return _to_table(agg).sort_by("o_orderpriority")


def q_linestatus_priority_mix(sf_dir: str):
    """TPC-H Q12 analog — join + conditional (CASE WHEN) aggregation:
    1997 shipments (temporal predicate pushed into the lineitem scan)
    pick up o_orderpriority via the adaptive join, then per l_linestatus
    count urgent (1-URGENT/2-HIGH) vs other-priority lines.  The CASE
    arms are one vectorized is_in per batch; the final shuffle is
    O(statuses)."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive

    lo_us = 852_076_800_000_000  # 1997-01-01 epoch-us
    hi_us = 883_612_800_000_000  # 1998-01-01 epoch-us
    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        predicates=[("l_shipdate", ">=", lo_us), ("l_shipdate", "<", hi_us)],
    )
    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = join_adaptive(li, orders, "l_orderkey", "o_orderkey", ["o_orderpriority"])

    def split(t: pa.Table) -> pa.Table:
        # per-batch combiner: the CASE arms collapse to <=4 (status, kind)
        # rows per block before the shuffle
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_linestatus": pa.array([], pa.string()),
                    "kind": pa.array([], pa.string()),
                    "one": pa.array([], pa.int64()),
                }
            )
        hi = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        ).cast(pa.int64())
        g = (
            pa.table({"l_linestatus": t.column("l_linestatus"), "hi": hi})
            .group_by("l_linestatus")
            .aggregate([("hi", "sum"), ([], "count_all")])
        )
        n = g.column("count_all").cast(pa.int64())
        h = g.column("hi_sum").cast(pa.int64())
        return pa.table(
            {
                "l_linestatus": pa.concat_arrays(
                    [g.column("l_linestatus").combine_chunks()] * 2
                ),
                "kind": pa.array(
                    ["high_line_count"] * g.num_rows + ["low_line_count"] * g.num_rows
                ),
                "one": pa.concat_arrays([h.combine_chunks(), pc.subtract(n, h).combine_chunks()]),
            }
        )

    agg = sum_by_keys(
        joined.map_batches(split, batch_format="pyarrow", zero_copy_batch=True),
        ["l_linestatus", "kind"],
        "one",
        out="n",
    )
    return _to_table(agg).sort_by(
        [("l_linestatus", "ascending"), ("kind", "ascending")]
    )


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 analog — OR-of-ANDs predicate over a broadcast
    dimension join: part (p_brand, p_size) ships once via the adaptive
    join's broadcast arm; each lineitem batch evaluates the three
    brand/size/quantity clauses as vectorized boolean algebra and sums
    revenue in exact e4 integers.  One scalar leaves each batch."""
    from ..functions.joins import join_adaptive

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = _decoded(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    joined = join_adaptive(li, part, "l_partkey", "p_partkey", ["p_brand", "p_size"])

    def rev(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"revenue_e4": pa.array([], pa.int64())})
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        brand = t.column("p_brand").to_numpy(zero_copy_only=False)
        c1 = (brand == "Brand#1") & (size >= 1) & (size <= 15) & (q >= 1) & (q <= 20)
        c2 = (brand == "Brand#2") & (size >= 10) & (size <= 30) & (q >= 10) & (q <= 35)
        c3 = (brand == "Brand#3") & (size >= 20) & (size <= 50) & (q >= 20) & (q <= 50)
        keep = c1 | c2 | c3
        # NaN/None comparisons above are already False (SQL NULL-pred);
        # null price/discount terms contribute 0 to the SUM (SQL skip)
        rev = _rev_e4_arr(t).to_numpy(zero_copy_only=False)
        return pa.table({"revenue_e4": pa.array([int(rev[keep].sum())], pa.int64())})

    parts = _to_table(joined.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True))
    return pa.table(
        {"revenue_e4": pa.array([int(pc.sum(parts.column("revenue_e4")).as_py() or 0)], pa.int64())}
    )


def q_customer_order_overlap(sf_dir: str):
    """Distributed set-op classification (INTERSECT / EXCEPT in one
    pass): per customer, counts of open ('O') and filled ('F') orders
    flow through ONE agg_by_keys; a vectorized CASE maps each customer
    to both / only_open / only_filled / pending_only, and a second
    O(4)-key sum_by_keys counts the classes.  The driver never sees the
    customer list."""
    from ..functions.aggregates import agg_by_keys, sum_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def flags(t: pa.Table) -> pa.Table:
        # per-batch combiner: one row per distinct customer per block
        # (~10x fewer rows into the agg_by_keys sort)
        st = t.column("o_orderstatus")
        g = (
            pa.table(
                {
                    "o_custkey": t.column("o_custkey"),
                    "n_o": pc.equal(st, "O").cast(pa.int64()),
                    "n_f": pc.equal(st, "F").cast(pa.int64()),
                }
            )
            .group_by("o_custkey")
            .aggregate([("n_o", "sum"), ("n_f", "sum")])
        )
        return pa.table(
            {
                "o_custkey": g.column("o_custkey"),
                "n_o": g.column("n_o_sum"),
                "n_f": g.column("n_f_sum"),
            }
        )

    per_cust = agg_by_keys(
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        [("n_o", "sum", "n_o"), ("n_f", "sum", "n_f")],
    )

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cls": pa.array([], pa.string()), "one": pa.array([], pa.int64())})
        o = t.column("n_o").to_numpy(zero_copy_only=False) > 0
        f = t.column("n_f").to_numpy(zero_copy_only=False) > 0
        cls = np.where(o & f, "both", np.where(o, "only_open", np.where(f, "only_filled", "pending_only")))
        return pa.table({"cls": pa.array(cls), "one": pa.array(np.ones(t.num_rows, np.int64))})

    agg = sum_by_keys(
        per_cust.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True),
        ["cls"],
        "one",
        out="n_customers",
    )
    return _to_table(agg).sort_by("cls")


def q_argmax_events(sf_dir: str):
    """ARG_MAX / MAX_BY per group: for each event_type, the maximum value
    and the smallest event_id attaining it.  Per batch: Arrow group-max,
    join back by index_in, keep only max-attaining rows and their min id
    — O(groups) partial rows per block; the driver heals partials with
    one lexsort.  Float max compares exact float64 (no quantization
    before the tie test), so ties match SQL semantics bit-for-bit."""
    ds = _decoded(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "mv": pa.array([], pa.float64()),
                    "eid": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("event_type").aggregate([("value", "max")])
        pos = pc.index_in(t.column("event_type"), value_set=g.column("event_type").combine_chunks())
        gmax = pc.take(g.column("value_max").combine_chunks(), pos)
        at_max = t.filter(pc.equal(t.column("value"), gmax))
        m = at_max.group_by("event_type").aggregate([("value", "max"), ("event_id", "min")])
        return pa.table(
            {
                "event_type": m.column("event_type"),
                "mv": m.column("value_max"),
                "eid": m.column("event_id_min"),
            }
        )

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    # Arrow sort (nulls last), not np.lexsort: a null event_type group
    # would hit Python's None-vs-str '<' in the object-array sort
    parts = parts.sort_by(
        [("event_type", "ascending"), ("mv", "descending"), ("eid", "ascending")]
    )
    et = parts.column("event_type").to_numpy(zero_copy_only=False)
    mv = parts.column("mv").to_numpy(zero_copy_only=False)
    eid = parts.column("eid").to_numpy(zero_copy_only=False)
    first = np.ones(et.size, dtype=bool)
    first[1:] = et[1:] != et[:-1]
    return pa.table(
        {
            "event_type": pa.array(et[first], pa.string()),
            "max_value_e6": pa.array(np.rint(mv[first] * 1_000_000).astype(np.int64)),
            "argmax_event_id": pa.array(eid[first], pa.int64()),
        }
    )


def q_status_moments(sf_dir: str):
    """Higher-order grouped moments — skewness and excess kurtosis of
    o_totalprice per o_orderstatus.  Values quantize to exact kilodollar
    integers so the four power sums (Σx..Σx⁴) stay exact int64 through
    any merge order (x⁴ ≤ 6.25e10 × 1e7 rows < 2⁶³); the float epilogue
    (population g1/g2 from raw moments) is O(groups) on the driver and
    mirrored expression-for-expression in the oracle SQL."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def powers(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"s": pa.array([], pa.string()), "k": pa.array([], pa.string()),
                 "v": pa.array([], pa.int64())}
            )
        # floor(v/1000 + 0.5) = SQL ROUND half-away-from-zero for positive
        # prices (np.rint rounds half-to-even and diverges on exact X500.00)
        xf = t.column("o_totalprice").to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(xf)
        # SQL COUNT(*) counts null-price rows; SUM(x^p) skips them (fill 0);
        # vn tracks the all-null group whose SQL power sums are NULL
        x = np.floor(np.where(valid, xf, 0.0) / 1000.0 + 0.5).astype(np.int64)
        x[~valid] = 0
        # one group_by over six derived columns (no 6x row explosion);
        # melt to the (s, k, v) long form at O(groups) for sum_by_keys
        g = (
            pa.table(
                {
                    "s": t.column("o_orderstatus"),
                    "n": pa.array(np.ones(len(x), np.int64)),
                    "vn": pa.array(valid.astype(np.int64)),
                    "s1": pa.array(x),
                    "s2": pa.array(x * x),
                    "s3": pa.array(x**3),
                    "s4": pa.array(x**4),
                }
            )
            .group_by("s")
            .aggregate([("n", "sum"), ("vn", "sum"), ("s1", "sum"), ("s2", "sum"),
                        ("s3", "sum"), ("s4", "sum")])
        )
        ng = g.num_rows
        kinds = ["n", "vn", "s1", "s2", "s3", "s4"]
        return pa.table(
            {
                "s": pa.concat_arrays([g.column("s").combine_chunks()] * len(kinds)),
                "k": pa.array([k for k in kinds for _ in range(ng)]),
                "v": pa.concat_arrays(
                    [g.column(f"{c}_sum").cast(pa.int64()).combine_chunks() for c in kinds]
                ),
            }
        )

    agg = _to_table(
        sum_by_keys(
            ds.map_batches(powers, batch_format="pyarrow", zero_copy_batch=True),
            ["s", "k"],
            "v",
        )
    )
    # pivot the (status, power) sums and compute the float epilogue
    piv = {}
    for s, k, v in zip(
        agg.column("s").to_pylist(), agg.column("k").to_pylist(), agg.column("v").to_pylist()
    ):
        piv.setdefault(s, {})[k] = v
    rows = []
    for s in sorted(piv, key=lambda k: (k is None, k)):
        n, s1, s2, s3, s4 = (float(piv[s][k]) for k in ["n", "s1", "s2", "s3", "s4"])
        if piv[s]["vn"] == 0:
            # every price in the group is null: SQL SUM(x^p) is NULL, so
            # the whole skew/kurt expression is NULL (n still counts rows)
            rows.append((s, int(n), None, None))
            continue
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3 * mean * s2 / n + 2 * mean**3
        m4 = s4 / n - 4 * mean * s3 / n + 6 * mean * mean * s2 / n - 3 * mean**4
        rows.append(
            (s, int(n), int(np.rint(m3 / m2**1.5 * 1e6)), int(np.rint((m4 / m2**2 - 3) * 1e6)))
        )
    return pa.table(
        {
            "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "skew_e6": pa.array([r[2] for r in rows], pa.int64()),
            "kurt_e6": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def q_prefix_scan_customers(sf_dir: str):
    """LIKE 'pfx%' pushdown end-to-end: the startswith predicate prunes
    chunks/strides via the truncated StringStatistics interval
    [pfx, next(pfx)) (SearchArgument LIKE analog) and the residual
    vectorized starts_with filters exactly — sequential c_name values
    make the prune real, not just correct."""
    ds = _decoded(
        sf_dir,
        "customer",
        columns=["c_custkey", "c_name", "c_acctbal"],
        predicates=[("c_name", "startswith", "Customer#00000000")],
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                # ROUND(NULL)=NULL: a null balance stays null, not rint garbage
                "acctbal_e2": _rnd_i64(t.column("c_acctbal"), 100),
            }
        )

    return _to_table(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("c_custkey")


def q_grouping_sets_revenue(sf_dir: str):
    """Arbitrary GROUPING SETS ((l_returnflag), (l_linestatus)) — the
    non-hierarchical case neither ROLLUP nor CUBE covers: each batch
    emits one partial row per member of each requested set (rolled-up
    dims carry the sentinel), ONE sum_by_keys merges all sets in a
    single shuffle of O(groups x sets) rows."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _rev_e4_arr(t)
        levels = []
        for keep in ("f", "s"):  # one partial per grouping set
            g = (
                pa.table({keep: t.column("l_returnflag" if keep == "f" else "l_linestatus"), "rev": rev})
                .group_by(keep)
                .aggregate([("rev", "sum")])
            )
            other = pa.array([_ROLLUP_ALL] * g.num_rows, pa.string())
            levels.append(
                pa.table(
                    {
                        "f": g.column(keep) if keep == "f" else other,
                        "s": g.column(keep) if keep == "s" else other,
                        "rev": g.column("rev_sum"),
                    }
                )
            )
        return pa.concat_tables(levels)

    tbl = _to_table(
        sum_by_keys(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["f", "s"],
            "rev",
            out="rev_e4",
        )
    )
    null_f = pc.equal(tbl.column("f"), _ROLLUP_ALL)
    null_s = pc.equal(tbl.column("s"), _ROLLUP_ALL)
    return pa.table(
        {
            "l_returnflag": pc.if_else(null_f, pa.scalar(None, pa.string()), tbl.column("f")),
            "l_linestatus": pc.if_else(null_s, pa.scalar(None, pa.string()), tbl.column("s")),
            "rev_e4": tbl.column("rev_e4"),
        }
    ).sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def q_above_avg_orders(sf_dir: str):
    """Correlated-subquery rewrite (orders above their own customer's
    average): the per-customer mean is ONE agg_by_keys (exact integer
    cents), joined back via the adaptive join (broadcast below threshold),
    and the comparison filters inside map_batches — the decorrelation
    every host engine applies around an ORC scan (SURVEY.md §2.8).
    The mean is compared in exact integers (sum > avg*n ⟺ n*price > sum)
    so no float divide enters the predicate."""
    from ..functions.aggregates import agg_by_keys
    from ..functions.joins import join_adaptive

    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        # null o_custkey never joins (SQL equality) -> drop up front; a
        # null price contributes 0 to SUM (skip-equivalent) but still
        # counts in COUNT(*), and pv excludes it from the comparison
        # (NULL * n > sum is never true)
        t = t.filter(pc.is_valid(t.column("o_custkey")))
        price = t.column("o_totalprice")
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "cents": _rnd_i64(price, 100, fill=0),
                "pv": pc.cast(pc.is_valid(price), pa.int8()).combine_chunks(),
            }
        )

    cds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    per_cust = agg_by_keys(
        cds, ["o_custkey"], [("cents", "sum", "sum_c"), ("cents", "count_all", "n_c")]
    )

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and not t.column_names:
            return pa.table({})
        return pa.table(
            {
                "ck": t.column("o_custkey"),
                "sum_c": t.column("sum_c").cast(pa.int64()),
                "n_c": t.column("n_c").cast(pa.int64()),
            }
        )

    joined = join_adaptive(
        cds,
        per_cust.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True),
        "o_custkey",
        "ck",
        ["sum_c", "n_c"],
    )

    def above(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()), "price_e2": pa.array([], pa.int64())}
            )
        c = t.column("cents").to_numpy(zero_copy_only=False)
        s = t.column("sum_c").to_numpy(zero_copy_only=False)
        n = t.column("n_c").to_numpy(zero_copy_only=False)
        pv = t.column("pv").to_numpy(zero_copy_only=False).astype(bool)
        keep = (c * n > s) & pv  # price > sum/n in exact integers
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").filter(pa.array(keep)),
                "price_e2": pa.array(c[keep]),
            }
        )

    return _to_table(
        joined.map_batches(above, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("o_orderkey")


def q_having_customers(sf_dir: str):
    """GROUP BY ... HAVING as a streaming pre-filter + semi-join: per-
    customer order counts reduce through sum_by_keys, the HAVING
    predicate filters that (already tiny) stream, and the surviving keys
    drive join_semi_anti into the customer table."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_semi_anti

    orders = _decoded(sf_dir, "orders", columns=["o_custkey"])

    def ones(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table(
            {"o_custkey": g.column("o_custkey"), "one": g.column("count_all").cast(pa.int64())}
        )

    counts = sum_by_keys(
        orders.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        "one",
        out="n_orders",
    )

    def having(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64())})
        return t.filter(pc.greater_equal(t.column("n_orders"), 13)).select(["o_custkey"])

    keys = counts.map_batches(having, batch_format="pyarrow", zero_copy_batch=True)
    cust = _decoded(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    out = join_semi_anti(cust, keys, "c_custkey", "o_custkey")
    return _to_table(out).sort_by("c_custkey")


def _skyline_min2(size: np.ndarray, price: np.ndarray):
    """2-D skyline (minimize both): survivor mask.  A point survives iff
    its price equals its size-group minimum AND that minimum is strictly
    below the running minimum over all smaller sizes (ties on both dims
    survive together — domination needs one strict dimension).  One
    lexsort + one cummin: O(n log n), no pairwise work."""
    order = np.lexsort((price, size))
    s, p = size[order], price[order]
    first = np.ones(s.size, dtype=bool)
    first[1:] = s[1:] != s[:-1]
    gidx = np.cumsum(first) - 1  # group index per row
    gmin = p[first]  # sorted by price within size -> first is the min
    runmin_prev = np.empty_like(gmin)
    runmin_prev[0] = np.iinfo(np.int64).max
    np.minimum.accumulate(gmin[:-1], out=runmin_prev[1:])
    ok_group = gmin < runmin_prev
    keep_sorted = ok_group[gidx] & (p == gmin[gidx])
    keep = np.zeros(s.size, dtype=bool)
    keep[order] = keep_sorted
    return keep


def q_skyline_parts(sf_dir: str):
    """Distributed 2-D skyline (Pareto frontier, minimize p_size and
    p_retailprice): every batch computes its LOCAL skyline with one
    lexsort + cummin (survivors only leave the block — the skyline
    operator's classic local-prune property), and the driver re-runs the
    same kernel over the O(sum of local skylines) candidates.  Dominance
    needs one strict dimension, so dim-tied points survive together —
    mirrored exactly by the NOT EXISTS oracle.  A null in EITHER dimension
    makes the point SQL-incomparable (every <=/< against it is NULL): it
    always survives and never dominates, so null rows bypass the kernel."""
    ds = _decoded(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def prune(base: pa.Table) -> pa.Table:
        ok = pc.and_kleene(
            pc.is_valid(base.column("p_size")), pc.is_valid(base.column("price_e2"))
        ).combine_chunks()
        good, nulls = base.filter(ok), base.filter(pc.invert(ok))
        if good.num_rows:
            keep = _skyline_min2(
                good.column("p_size").to_numpy(zero_copy_only=False),
                good.column("price_e2").to_numpy(zero_copy_only=False),
            )
            good = good.filter(pa.array(keep))
        return pa.concat_tables([good, nulls])

    def local(t: pa.Table) -> pa.Table:
        return prune(
            pa.table(
                {
                    "p_partkey": t.column("p_partkey"),
                    "p_size": t.column("p_size").cast(pa.int64()),
                    "price_e2": _rnd_i64(t.column("p_retailprice"), 100),
                }
            )
        )

    cand = _to_table(ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True))
    return prune(cand.combine_chunks()).sort_by("p_partkey")


def q_left_join_returns(sf_dir: str):
    """LEFT OUTER join: every order keeps its row; the per-order count of
    returned lines (pre-aggregated through sum_by_keys BEFORE the join —
    the build side is O(orders-with-returns), not O(lineitems)) arrives
    via join_adaptive's how='left' broadcast arm, nulls coalesced to 0."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive

    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    returned = _decoded(
        sf_dir, "lineitem", columns=["l_orderkey"], predicates=[("l_returnflag", "==", "R")]
    )

    def ones(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([([], "count_all")])
        return pa.table(
            {"l_orderkey": g.column("l_orderkey"), "one": g.column("count_all").cast(pa.int64())}
        )

    counts = sum_by_keys(
        returned.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        "one",
        out="n_returned",
    )
    joined = join_adaptive(orders, counts, "o_orderkey", "l_orderkey", ["n_returned"], how="left")

    def coalesce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()), "n_returned": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "n_returned": pc.fill_null(t.column("n_returned").cast(pa.int64()), 0),
            }
        )

    return _to_table(
        joined.map_batches(coalesce, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("o_orderkey")


def q_percentile_cont(sf_dir: str):
    """Interpolated quantiles (SQL PERCENTILE_CONT / DuckDB quantile_cont
    semantics: h = (n-1)q, linear between the two neighbouring order
    statistics) of l_extendedprice — the continuous complement of the
    exact nearest-rank q_global_quantiles.  Same distributed shape: the
    (value_e2, count) histogram reduces through ONE sum_by_keys; the
    driver holds only the distinct-value histogram and interpolates with
    doubles whose inputs are exact ints, floored at e2 so both sides
    quantize identically."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "lineitem", columns=["l_extendedprice"])

    def hist(t: pa.Table) -> pa.Table:
        v = np.rint(t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        g = (
            pa.table({"v": pa.array(v), "one": pa.array(np.ones(v.size, np.int64))})
            .group_by("v")
            .aggregate([("one", "sum")])
        )
        return pa.table({"v": g.column("v"), "c": g.column("one_sum")})

    tbl = _to_table(
        sum_by_keys(ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True), ["v"], "c")
    ).sort_by("v")
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    cum = np.cumsum(c)
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        h = (n - 1) * q
        lo_rank, frac = int(np.floor(h)), h - np.floor(h)
        lo = float(v[np.searchsorted(cum, lo_rank + 1)])
        hi = float(v[np.searchsorted(cum, min(lo_rank + 1, n - 1) + 1)])
        out_q.append(int(q * 100))
        out_v.append(int(np.floor(lo * (1.0 - frac) + hi * frac)))  # DuckDB's exact interpolation expression (ulp-identical)
    return pa.table(
        {"q_pct": pa.array(out_q, pa.int64()), "val_e2_floor": pa.array(out_v, pa.int64())}
    )


def q_distinct_users_by_type(sf_dir: str):
    """Grouped exact COUNT(DISTINCT): distinct (event_type, user_id)
    pairs reduce through ONE sum_by_keys (per-batch pair dedup first, so
    the sort input is bounded by distinct pairs per block), then a tiny
    per-type count — the two-level distinct aggregation, never O(rows)
    at any single point."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "user_id": g.column("user_id"),
                "one": pa.array(np.ones(g.num_rows, np.int64)),
            }
        )

    dpairs = sum_by_keys(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "user_id"],
        "one",
    )

    def count_types(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        # COUNT(DISTINCT user_id) ignores null user_ids, but the GROUP
        # BY still emits the group: count the VALID distinct pairs per
        # type (a type whose only pair is the null-uid one gets n = 0)
        t = t.append_column(
            "isreal", pc.cast(pc.is_valid(t.column("user_id")), pa.int64())
        )
        g = t.group_by("event_type").aggregate([("isreal", "sum")])
        return pa.table(
            {"event_type": g.column("event_type"), "n": g.column("isreal_sum").cast(pa.int64())}
        )

    agg = sum_by_keys(
        dpairs.map_batches(count_types, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        "n",
        out="n_users",
    )
    return _to_table(agg).sort_by("event_type")


def q_mode_priority(sf_dir: str):
    """Grouped MODE (most frequent value, ties -> smallest value): the
    (status, priority) count table reduces through ONE sum_by_keys with
    per-batch combiners; the per-group argmax is the q_argmax_events
    lexsort epilogue over O(groups x values) rows."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])

    def ones(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "s": g.column("o_orderstatus"),
                "p": g.column("o_orderpriority"),
                "one": g.column("count_all").cast(pa.int64()),
            }
        )

    counts = _to_table(
        sum_by_keys(
            ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
            ["s", "p"],
            "one",
            out="n",
        )
    )
    s = counts.column("s").to_numpy(zero_copy_only=False)
    p = counts.column("p").to_numpy(zero_copy_only=False)
    n = counts.column("n").to_numpy(zero_copy_only=False)
    # None is not ordered by np.lexsort: a NULL priority ties LAST
    # (DuckDB ORDER BY default) via a max-codepoint sentinel, restored
    # below; a NULL status group sorts via its own null lane
    p_null = np.array([v is None for v in p])
    ps = np.where(p_null, "￿", p.astype(object))
    s_null = np.array([v is None for v in s])
    ss = np.where(s_null, "", s.astype(object))
    order = np.lexsort((ps, -n, ss, s_null))  # per status: max count, then min priority
    s, p, n, s_null = s[order], p[order], n[order], s_null[order]
    first = np.ones(s.size, dtype=bool)
    first[1:] = (s[1:] != s[:-1]) | (s_null[1:] != s_null[:-1])
    return pa.table(
        {
            "o_orderstatus": pa.array(s[first], pa.string()),
            "mode_priority": pa.array(p[first], pa.string()),
            "n": pa.array(n[first], pa.int64()),
        }
    )


def q_same_day_order_pairs(sf_dir: str):
    """Self-join COUNT without the join: pairs of orders by the same
    customer on the same day = Σ n·(n-1)/2 over (customer, day) group
    sizes — the classic rewrite that turns an O(rows²) self-join into
    ONE distributed count + a vectorized epilogue."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def ones(t: pa.Table) -> pa.Table:
        day = pc.floor(pc.divide(t.column("o_orderdate").cast(pa.int64()), 86_400_000_000))
        g = (
            pa.table({"c": t.column("o_custkey"), "d": day.cast(pa.int64())})
            .group_by(["c", "d"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"c": g.column("c"), "d": g.column("d"), "one": g.column("count_all").cast(pa.int64())}
        )

    counts = sum_by_keys(
        ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True), ["c", "d"], "one"
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_pairs": pa.array([], pa.int64())})
        n = t.column("one").to_numpy(zero_copy_only=False)
        return pa.table({"n_pairs": pa.array([int((n * (n - 1) // 2).sum())], pa.int64())})

    parts = _to_table(counts.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True))
    return pa.table(
        {"n_pairs": pa.array([int(pc.sum(parts.column("n_pairs")).as_py() or 0)], pa.int64())}
    )


def q_revenue_trend_slope(sf_dir: str):
    """Grouped least-squares trend — the OLS slope of daily revenue over
    time per order status.  The five sufficient statistics (n, Σx, Σy,
    Σxy, Σx²) are exact int64 sums (x = day index, y = cents) through
    ONE sum_by_keys over (status, stat-kind); the slope epilogue is
    O(groups) float math mirrored expression-for-expression in SQL —
    regression at any scale without ever moving a row twice."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_orderstatus", "o_orderdate", "o_totalprice"])

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"s": pa.array([], pa.string()), "k": pa.array([], pa.string()),
                 "v": pa.array([], pa.int64())}
            )
        day = (t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        x = day - 9131  # 1995-01-01 epoch-days; keeps x*y products well inside int64
        # y fill-0 mirrors the oracle exactly: SUM(y)/SUM(x*y) skip the
        # null term while COUNT(*)/SUM(x)/SUM(x*x) still include the row
        y = _rnd_i64(t.column("o_totalprice"), 100, fill=0).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "s": t.column("o_orderstatus"),
                    "n": pa.array(np.ones(len(x), np.int64)),
                    "sx": pa.array(x),
                    "sy": pa.array(y),
                    "sxy": pa.array(x * y),
                    "sxx": pa.array(x * x),
                }
            )
            .group_by("s")
            .aggregate([("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum")])
        )
        ng = g.num_rows
        return pa.table(
            {
                "s": pa.concat_arrays([g.column("s").combine_chunks()] * 5),
                "k": pa.array(["n"] * ng + ["sx"] * ng + ["sy"] * ng + ["sxy"] * ng + ["sxx"] * ng),
                "v": pa.concat_arrays(
                    [g.column(f"{c}_sum").cast(pa.int64()).combine_chunks()
                     for c in ["n", "sx", "sy", "sxy", "sxx"]]
                ),
            }
        )

    agg = _to_table(
        sum_by_keys(ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True), ["s", "k"], "v")
    )
    piv: dict = {}
    for s, k, v in zip(agg.column("s").to_pylist(), agg.column("k").to_pylist(), agg.column("v").to_pylist()):
        piv.setdefault(s, {})[k] = float(v)
    rows = []
    for s in sorted(piv):
        n, sx, sy, sxy, sxx = (piv[s][k] for k in ["n", "sx", "sy", "sxy", "sxx"])
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)  # cents per day
        rows.append((s, int(n), int(np.floor(slope * 1_000_000))))
    return pa.table(
        {
            "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "slope_e6": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_group_percentile_cont(sf_dir: str):
    """Per-group interpolated quantiles — PERCENTILE_CONT(0.5 / 0.9)
    WITHIN each event_type.  The grouped value histogram reduces through
    ONE sum_by_keys over (group, value_e6); per-group interpolation
    (h = (n-1)q between neighbouring order statistics) is a vectorized
    O(distinct-values) driver epilogue — the grouped extension of
    q_percentile_cont under the same exact-histogram ceiling."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "v": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        # null-propagating Arrow math: a group whose EVERY value is null
        # still reaches the epilogue as a lone (g, NULL) cell, matching
        # SQL's NULL-percentile row (np.rint would NaN->INT64_MIN it)
        v = pc.cast(pc.round(pc.multiply(t.column("value"), 1_000_000.0)), pa.int64())
        g = (
            pa.table({"g": t.column("event_type"), "v": v})
            .group_by(["g", "v"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"g": g.column("g"), "v": g.column("v"), "c": g.column("count_all").cast(pa.int64())})

    tbl = _to_table(
        sum_by_keys(ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True), ["g", "v"], "c")
    )
    # Arrow sort, not np.lexsort: a null group key (None in an object
    # array) would hit Python's None-vs-str '<'; nulls order LAST.
    # The run break below is safe: None != None is False for objects.
    tbl = tbl.sort_by([("g", "ascending"), ("v", "ascending")])
    gs = tbl.column("g").to_numpy(zero_copy_only=False)
    vvalid = pc.is_valid(tbl.column("v")).to_numpy(zero_copy_only=False)
    v = tbl.column("v").fill_null(0).to_numpy(zero_copy_only=False)
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    brk = np.ones(gs.size, dtype=bool)
    brk[1:] = gs[1:] != gs[:-1]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], gs.size]
    out_g, out_q, out_v = [], [], []
    for st, en in zip(starts, ends):
        en = st + int(vvalid[st:en].sum())  # null cell sorts last in-group
        if en == st:  # all-null group -> NULL percentiles
            for pct in (50, 90):
                out_g.append(gs[st])
                out_q.append(pct)
                out_v.append(None)
            continue
        cum = np.cumsum(c[st:en])
        n = int(cum[-1])
        for pct, q in [(50, 0.5), (90, 0.9)]:
            h = (n - 1) * q
            lo_rank, frac = int(np.floor(h)), h - np.floor(h)
            lo = float(v[st + np.searchsorted(cum, lo_rank + 1)])
            hi = float(v[st + np.searchsorted(cum, min(lo_rank + 1, n - 1) + 1)])
            out_g.append(gs[st])
            out_q.append(pct)
            out_v.append(int(np.floor(lo * (1.0 - frac) + hi * frac)))  # DuckDB's exact interpolation expression (ulp-identical)
    return pa.table(
        {
            "event_type": pa.array(out_g, pa.string()),
            "q_pct": pa.array(out_q, pa.int64()),
            "val_e6_floor": pa.array(out_v, pa.int64()),
        }
    )


def q_winsorized_stats(sf_dir: str):
    """Robust statistics — per-group winsorization: values clipped to the
    exact [p5, p95] order statistics (inverse-CDF rank rule, matching
    SQL quantile_disc) and summed.  ONE grouped value-histogram
    sum_by_keys serves both the bounds and the clipped sum: with the
    histogram in hand the clipped total is Σ min(max(v,lo),hi)·count —
    a second data pass is never needed.  Every output is an exact
    integer."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "v": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        vcol = t.column("value")
        if vcol.null_count:
            t = t.filter(pc.is_valid(vcol))  # SQL quantiles ignore nulls
        v = np.rint(t.column("value").to_numpy(zero_copy_only=False) * 1_000_000).astype(np.int64)
        g = (
            pa.table({"g": t.column("event_type"), "v": pa.array(v)})
            .group_by(["g", "v"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"g": g.column("g"), "v": g.column("v"), "c": g.column("count_all").cast(pa.int64())})

    tbl = _to_table(
        sum_by_keys(ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True), ["g", "v"], "c")
    )
    # Arrow sort, not np.lexsort: a null group key (None in an object
    # array) would hit Python's None-vs-str '<'; nulls order LAST.
    # The run break below is safe: None != None is False for objects.
    tbl = tbl.sort_by([("g", "ascending"), ("v", "ascending")])
    gs = tbl.column("g").to_numpy(zero_copy_only=False)
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    brk = np.ones(gs.size, dtype=bool)
    brk[1:] = gs[1:] != gs[:-1]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], gs.size]
    rows = []
    for st, en in zip(starts, ends):
        cum = np.cumsum(c[st:en])
        n = int(cum[-1])
        lo = int(v[st + np.searchsorted(cum, int(np.ceil(0.05 * n)))])
        hi = int(v[st + np.searchsorted(cum, int(np.ceil(0.95 * n)))])
        clipped = np.clip(v[st:en], lo, hi)
        rows.append((gs[st], lo, hi, int((clipped * c[st:en]).sum()), n))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "lo_e6": pa.array([r[1] for r in rows], pa.int64()),
            "hi_e6": pa.array([r[2] for r in rows], pa.int64()),
            "winsorized_sum_e6": pa.array([r[3] for r in rows], pa.int64()),
            "n": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def q_pythagorean_means(sf_dir: str):
    """Grouped geometric and harmonic means of o_totalprice per status —
    the multiplicative/rate complements of the arithmetic mean.  Per
    batch, ONE group_by over three derived columns (Σ ln x, Σ 1/x, n —
    no row explosion) feeds sum_by_keys; the O(groups) float epilogue
    (exp(Σln/n), n/Σinv) floors at e2 with the identical expression in
    SQL."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def parts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"s": pa.array([], pa.string()), "k": pa.array([], pa.string()),
                 "v": pa.array([], pa.float64())}
            )
        x = t.column("o_totalprice").to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(x)
        # COUNT(*) counts null rows; SUM(LN(x))/SUM(1/x) skip them (fill 0);
        # vn flags the all-null group whose SQL sums (hence means) are NULL
        safe = np.where(valid, x, 1.0)
        g = (
            pa.table(
                {
                    "s": t.column("o_orderstatus"),
                    "n": pa.array(np.ones(x.size)),
                    "vn": pa.array(valid.astype(np.float64)),
                    "lnx": pa.array(np.where(valid, np.log(safe), 0.0)),
                    "inv": pa.array(np.where(valid, 1.0 / safe, 0.0)),
                }
            )
            .group_by("s")
            .aggregate([("n", "sum"), ("vn", "sum"), ("lnx", "sum"), ("inv", "sum")])
        )
        ng = g.num_rows
        kinds = ["n", "vn", "lnx", "inv"]
        return pa.table(
            {
                "s": pa.concat_arrays([g.column("s").combine_chunks()] * len(kinds)),
                "k": pa.array([k for k in kinds for _ in range(ng)]),
                "v": pa.concat_arrays([g.column(f"{c}_sum").combine_chunks() for c in kinds]),
            }
        )

    # float partials: sum_by_keys is int64-only, so aggregate the (s, k)
    # float sums with Arrow's group_by on the driver — O(groups x kinds x
    # blocks) tiny rows, no row-level data
    parts_tbl = _to_table(ds.map_batches(parts, batch_format="pyarrow", zero_copy_batch=True))
    agg = parts_tbl.group_by(["s", "k"]).aggregate([("v", "sum")])
    piv: dict = {}
    for s, k, v in zip(agg.column("s").to_pylist(), agg.column("k").to_pylist(), agg.column("v_sum").to_pylist()):
        piv.setdefault(s, {})[k] = float(v)
    rows = []
    for s in sorted(piv, key=lambda k: (k is None, k)):
        n, lnx, inv = piv[s]["n"], piv[s]["lnx"], piv[s]["inv"]
        if piv[s].get("vn", 0) == 0:
            # all prices null: SQL SUM(LN(x))/SUM(1/x) are NULL -> both means NULL
            rows.append((s, int(n), None, None))
            continue
        rows.append((s, int(n), int(np.floor(np.exp(lnx / n) * 100)), int(np.floor(n / inv * 100))))
    return pa.table(
        {
            "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "geo_mean_e2": pa.array([r[2] for r in rows], pa.int64()),
            "harm_mean_e2": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def q_gini_user_activity(sf_dir: str):
    """Gini coefficient of per-user event counts — the skew diagnostic
    behind every salting/partitioning decision here.  Per-user counts
    reduce through ONE sum_by_keys (O(users) result); the Gini needs the
    full sorted count vector, so the epilogue sorts the O(users) series
    on the driver (documented ceiling — users are the partition domain,
    orders of magnitude below rows) and evaluates
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over exact integers, floored at e6
    with the identical expression in SQL."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "events", columns=["user_id"])

    def ones(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return pa.table(
            {"user_id": g.column("user_id"), "one": g.column("count_all").cast(pa.int64())}
        )

    counts = _to_table(
        sum_by_keys(
            ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
            ["user_id"],
            "one",
            out="n_events",
        )
    )
    x = np.sort(counts.column("n_events").to_numpy(zero_copy_only=False))
    n = x.size
    num = float((np.arange(1, n + 1, dtype=np.int64) * x).sum())  # exact int -> float once
    tot = float(x.sum())
    gini = 2.0 * num / (n * tot) - (n + 1) / n
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "n_events": pa.array([int(tot)], pa.int64()),
            "gini_e6": pa.array([int(np.floor(gini * 1_000_000))], pa.int64()),
        }
    )


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7 analog — bidirectional nation-pair trade volume by ship
    year.  Both dim maps (supplier->nation, customer->nation) broadcast
    once; lineitem decodes under a shipdate-range pushdown and drops to
    the two supplier nations per batch BEFORE the join; orders drops to
    the two customer nations likewise, so join_adaptive's small side is
    ~8% of orders.  The pair filter ((3,7) or (7,3)) and the
    (supp, cust, year) rollup are per-batch O(pairs x years) partials."""
    from ..functions.joins import join_adaptive

    lo_us = 820_454_400_000_000  # 1996-01-01 epoch-us
    hi_us = 883_612_800_000_000  # 1998-01-01 epoch-us
    NAT_A, NAT_B = 3, 7

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    dims_ref = ray.put(
        (
            supp.column("s_suppkey").combine_chunks(),
            supp.column("s_nationkey").combine_chunks(),
            cust.column("c_custkey").combine_chunks(),
            cust.column("c_nationkey").combine_chunks(),
        )
    )

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        predicates=[("and", ("l_shipdate", ">=", lo_us), ("l_shipdate", "<", hi_us))],
    )

    def li_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        sk, sn, _, _ = ray.get(ref)
        s_nat = pc.take(sn, pc.index_in(t.column("l_suppkey"), value_set=sk))
        t = t.append_column("s_nat", s_nat).filter(
            pc.is_in(s_nat, value_set=pa.array([NAT_A, NAT_B]))
        )
        us = t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = _month_id_from_epoch_us(us) // 12
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "s_nat": t.column("s_nat"),
                "l_year": pa.array(year.astype(np.int64)),
                "rev_e4": _rev_e4_arr(t),
            }
        )

    li_rev = li.map_batches(li_stage, batch_format="pyarrow", zero_copy_batch=True)

    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def ord_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        _, _, ck, cn = ray.get(ref)
        c_nat = pc.take(cn, pc.index_in(t.column("o_custkey"), value_set=ck))
        t = t.append_column("c_nat", c_nat)
        t = t.filter(pc.is_in(t.column("c_nat"), value_set=pa.array([NAT_A, NAT_B])))
        return t.select(["o_orderkey", "c_nat"])

    orders_f = orders.map_batches(ord_stage, batch_format="pyarrow", zero_copy_batch=True)
    joined = join_adaptive(li_rev, orders_f, "l_orderkey", "o_orderkey", ["c_nat"])

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_nat": pa.array([], pa.int64()),
                "c_nat": pa.array([], pa.int64()),
                "l_year": pa.array([], pa.int64()),
                "rev_e4": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        keep = pc.or_(
            pc.and_(pc.equal(t.column("s_nat"), NAT_A), pc.equal(t.column("c_nat"), NAT_B)),
            pc.and_(pc.equal(t.column("s_nat"), NAT_B), pc.equal(t.column("c_nat"), NAT_A)),
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return empty
        g = t.group_by(["s_nat", "c_nat", "l_year"]).aggregate([("rev_e4", "sum")])
        return pa.table(
            {
                "s_nat": g.column("s_nat").cast(pa.int64()),
                "c_nat": g.column("c_nat").cast(pa.int64()),
                "l_year": g.column("l_year"),
                "rev_e4": g.column("rev_e4_sum"),
            }
        )

    parts = _to_table(joined.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by(["s_nat", "c_nat", "l_year"]).aggregate([("rev_e4", "sum")])
    return pa.table(
        {
            "supp_nation": pa.array([f"NATION_{k}" for k in final.column("s_nat").to_pylist()]),
            "cust_nation": pa.array([f"NATION_{k}" for k in final.column("c_nat").to_pylist()]),
            "l_year": final.column("l_year"),
            "rev_e4": final.column("rev_e4_sum"),
        }
    ).sort_by([("supp_nation", "ascending"), ("cust_nation", "ascending"), ("l_year", "ascending")])


def q_custdist(sf_dir: str):
    """TPC-H Q13 analog — distribution of per-customer order counts,
    INCLUDING zero-order customers (the LEFT join that a plain groupby
    over orders cannot express).  Per-customer counts reduce through one
    sum_by_keys (shuffles O(customers) partials, never raw orders); the
    customer stream LEFT-joins those counts via join_adaptive (nulls ->
    0); the final histogram is a second sum_by_keys over the count value
    itself — O(distinct counts) rows, tiny everywhere."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive

    orders = _decoded(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def ones(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("o_orderpriority"), "1-URGENT"))
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table(
            {"o_custkey": g.column("o_custkey"), "one": g.column("count_all").cast(pa.int64())}
        )

    counts = sum_by_keys(
        orders.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        "one",
        out="c_count",
    )
    cust = _decoded(sf_dir, "customer", columns=["c_custkey"])
    joined = join_adaptive(cust, counts, "c_custkey", "o_custkey", ["c_count"], how="left")

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"c_count": pa.array([], pa.int64()), "one": pa.array([], pa.int64())}
            )
        cc = pc.fill_null(t.column("c_count").cast(pa.int64()), 0)
        g = pa.table({"c_count": cc}).group_by("c_count").aggregate([([], "count_all")])
        return pa.table(
            {"c_count": g.column("c_count"), "one": g.column("count_all").cast(pa.int64())}
        )

    hist = _to_table(
        sum_by_keys(
            joined.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["c_count"],
            "one",
            out="custdist",
        )
    )
    return hist.sort_by([("custdist", "descending"), ("c_count", "descending")])


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 analog — supplier(s) with the maximum quarterly revenue.
    Revenue per supplier reduces through one sum_by_keys under a
    shipdate pushdown; the global max comes from per-block O(1) partial
    maxima (never a driver sort of the supplier table); the winners are
    re-filtered distributed and only the (tiny) maximal set reaches the
    driver, where names attach from a column-pruned supplier read."""
    from ..functions.aggregates import sum_by_keys

    lo_us = 820_454_400_000_000  # 1996-01-01
    hi_us = 828_316_800_000_000  # 1996-04-01
    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        predicates=[("and", ("l_shipdate", ">=", lo_us), ("l_shipdate", "<", hi_us))],
    )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": t.column("l_suppkey"), "rev_e4": _rev_e4_arr(t)})

    revenue = sum_by_keys(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey"],
        "rev_e4",
        out="total_rev_e4",
    ).materialize()  # two passes (max, winners) over O(suppliers) partials

    def block_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array([pc.max(t.column("total_rev_e4")).as_py()], pa.int64())})

    maxima = _to_table(revenue.map_batches(block_max, batch_format="pyarrow", zero_copy_batch=True))
    best = max(maxima.column("m").to_pylist())

    def winners(t: pa.Table, *, best=best) -> pa.Table:
        return t.filter(pc.equal(t.column("total_rev_e4"), best))

    top = _to_table(revenue.map_batches(winners, batch_format="pyarrow", zero_copy_batch=True))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    name_of = dict(zip(supp.column("s_suppkey").to_pylist(), supp.column("s_name").to_pylist()))
    keys = top.column("l_suppkey").to_pylist()
    return pa.table(
        {
            "s_suppkey": pa.array(keys, pa.int64()),
            "s_name": pa.array([name_of[k] for k in keys], pa.string()),
            "total_rev_e4": top.column("total_rev_e4"),
        }
    ).sort_by("s_suppkey")


def q_market_share(sf_dir: str):
    """TPC-H Q8 analog — NATION_7's share of ASIA-customer PROMO-part
    revenue by order year, surfaced as exact integer numerator +
    denominator (the ratio is the caller's division — float shares
    don't hash-compare).  Three broadcast dims (promo-part key set,
    supplier->nation, ASIA customer key set); lineitem thins to promo
    parts per batch; orders thins to ASIA customers under an orderdate
    pushdown; join_adaptive carries only (o_orderkey, o_year)."""
    from ..functions.joins import join_adaptive

    lo_us = 820_454_400_000_000  # 1996-01-01
    hi_us = 883_612_800_000_000  # 1998-01-01
    NUM_NAT = 7  # NATION_7 (regionkey 2 = ASIA)

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"])
    promo_keys = part.filter(pc.equal(part.column("p_type"), "PROMO")).column("p_partkey")
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia_rk = region.filter(pc.equal(region.column("r_name"), "ASIA")).column("r_regionkey")
    asia_keys = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=asia_rk.combine_chunks())
    ).column("n_nationkey")
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    asia_cust = cust.filter(
        pc.is_in(cust.column("c_nationkey"), value_set=asia_keys.combine_chunks())
    ).column("c_custkey")
    dims_ref = ray.put(
        (
            promo_keys.combine_chunks(),
            supp.column("s_suppkey").combine_chunks(),
            supp.column("s_nationkey").combine_chunks(),
            asia_cust.combine_chunks(),
        )
    )

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        pk, sk, sn, _ = ray.get(ref)
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=pk))
        s_nat = pc.take(sn, pc.index_in(t.column("l_suppkey"), value_set=sk))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "s_nat": s_nat,
                "rev_e4": _rev_e4_arr(t),
            }
        )

    li_f = li.map_batches(li_stage, batch_format="pyarrow", zero_copy_batch=True)

    orders = _decoded(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        predicates=[("and", ("o_orderdate", ">=", lo_us), ("o_orderdate", "<", hi_us))],
    )

    def ord_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        _, _, _, ac = ray.get(ref)
        t = t.filter(pc.is_in(t.column("o_custkey"), value_set=ac))
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = _month_id_from_epoch_us(us) // 12
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "o_year": pa.array(year.astype(np.int64))}
        )

    orders_f = orders.map_batches(ord_stage, batch_format="pyarrow", zero_copy_batch=True)
    joined = join_adaptive(li_f, orders_f, "l_orderkey", "o_orderkey", ["o_year"])

    def year_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "num_e4": pa.array([], pa.int64()),
                    "den_e4": pa.array([], pa.int64()),
                }
            )
        is_num = pc.equal(t.column("s_nat"), NUM_NAT).cast(pa.int64())
        num = pc.multiply(t.column("rev_e4"), is_num)
        g = (
            pa.table({"o_year": t.column("o_year"), "num": num, "den": t.column("rev_e4")})
            .group_by("o_year")
            .aggregate([("num", "sum"), ("den", "sum")])
        )
        return pa.table(
            {
                "o_year": g.column("o_year"),
                "num_e4": g.column("num_sum"),
                "den_e4": g.column("den_sum"),
            }
        )

    parts = _to_table(joined.map_batches(year_partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("o_year").aggregate([("num_e4", "sum"), ("den_e4", "sum")])
    return pa.table(
        {
            "o_year": final.column("o_year"),
            "mkt_num_e4": final.column("num_e4_sum"),
            "mkt_den_e4": final.column("den_e4_sum"),
        }
    ).sort_by("o_year")


def q_mad_value(sf_dir: str):
    """Per-group median absolute deviation — the robust spread statistic
    outlier-filtering pipelines use where stddev is skew-poisoned.  Two
    EXACT distributed disc-median passes (functions/aggregates.
    group_median_disc): pass 1 gives each type's median in cents; the
    O(groups) result broadcasts back, a map stage emits |x - med|, and
    pass 2 takes the median of deviations.  Each pass is one global sort
    + prefix scan; the driver only ever holds O(groups) rows."""
    import ray

    from ..functions.aggregates import group_median_disc

    ds = _decoded(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        # Arrow math so null values STAY null (group_median_disc drops
        # them, matching SQL aggregates); np.rint would turn NaN into
        # INT64_MIN garbage that ranks as a real value
        v = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id"),
                "v": v,
            }
        )

    dsc = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    med = group_median_disc(dsc, "event_type", "v", "event_id")
    mref = ray.put((med.column("event_type").combine_chunks(), med.column("v").to_numpy()))

    def dev(t: pa.Table, *, ref=mref) -> pa.Table:
        types, meds = ray.get(ref)
        vcol = t.column("v")
        if vcol.null_count:
            t = t.filter(pc.is_valid(vcol))  # SQL: ABS(NULL - med) is ignored
        idx = pc.index_in(t.column("event_type"), value_set=types)
        m = meds[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        d = np.abs(t.column("v").to_numpy(zero_copy_only=False) - m)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id"),
                "d": pa.array(d),
            }
        )

    mad = group_median_disc(
        dsc.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        "d",
        "event_id",
    )
    return pa.table(
        {
            "event_type": med.column("event_type"),
            "median_cents": med.column("v"),
            "mad_cents": mad.column("d"),
        }
    )


def q_full_join_daily(sf_dir: str):
    """FULL OUTER join — the one join arm the engine's inner/left
    join_adaptive doesn't provide directly, composed from existing
    distributed operators instead of a new shuffle primitive: daily
    order revenue ⟗ daily event counts.  Both inputs are first reduced
    to O(days) through sum_by_keys; the left arm comes from
    join_adaptive(how='left'); the right-only rows come from
    join_semi_anti(anti=True) on the same key — union of the two is the
    FULL OUTER result, with presence flags instead of NULLs (int nulls
    don't hash-compare across pandas/DuckDB)."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive, join_semi_anti

    DAY_US = 86_400_000_000

    orders = _decoded(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def od(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # fill 0 == SQL SUM skipping the null term; the all-null day is
        # COALESCE(revenue,0) in the oracle, so 0 is right there too
        cents = _rnd_i64(t.column("o_totalprice"), 100, fill=0)
        return pa.table({"day": pa.array(us // DAY_US), "revenue_cents": cents})

    rev = sum_by_keys(
        orders.map_batches(od, batch_format="pyarrow", zero_copy_batch=True),
        ["day"],
        "revenue_cents",
    ).materialize()  # consumed twice: left-join stream + anti-join key set

    events = _decoded(sf_dir, "events", columns=["ts"])

    def ed(t: pa.Table) -> pa.Table:
        # arrow int division keeps a NULL ts as the SQL NULL day group
        # (a float NaN day would break the int64 schema downstream)
        day = pc.divide(t.column("ts").cast(pa.int64()), DAY_US)
        return pa.table({"day": day, "one": pa.array(np.ones(t.num_rows, np.int64))})

    cnt = sum_by_keys(
        events.map_batches(ed, batch_format="pyarrow", zero_copy_batch=True),
        ["day"],
        "one",
        out="n_events",
    ).materialize()  # consumed twice: left-join payload + anti-join probe

    left = join_adaptive(rev, cnt, "day", "day", ["n_events"], how="left")

    def left_row(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "has_orders": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "has_events": pa.array([], pa.int64()),
                }
            )
        ne = t.column("n_events").cast(pa.int64())
        return pa.table(
            {
                "day": t.column("day"),
                "revenue_cents": t.column("revenue_cents"),
                "has_orders": pa.array(np.ones(t.num_rows, np.int64)),
                "n_events": pc.fill_null(ne, 0),
                "has_events": pc.is_valid(ne).cast(pa.int64()),
            }
        )

    def right_only(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table(
            {
                "day": t.column("day"),
                "revenue_cents": z,
                "has_orders": z,
                "n_events": t.column("n_events"),
                # the oracle's flag tests the day VALUE (ed.day IS NULL),
                # so the NULL-day group carries has_events = 0
                "has_events": pc.cast(pc.is_valid(t.column("day")), pa.int64()),
            }
        )

    right = join_semi_anti(cnt, rev, "day", "day", anti=True)
    full = left.map_batches(left_row, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(right_only, batch_format="pyarrow", zero_copy_batch=True)
    )
    return _to_table(full).sort_by("day")


def q_unpivot_part(sf_dir: str):
    """UNPIVOT (wide -> long reshape): each part row becomes one row per
    measured attribute — the PIVOT twin (q_pivot_weekday covers the other
    direction).  Pure per-batch restructuring: N columns concat into an
    (attr, val) pair inside map_batches; no shuffle, no driver work
    beyond the returned long table."""
    ds = _decoded(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t.column("p_partkey").combine_chunks()
        size = t.column("p_size").cast(pa.int64()).combine_chunks()
        cents = pa.array(
            np.rint(t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
        )
        return pa.table(
            {
                "p_partkey": pa.concat_arrays([key, key]),
                "attr": pa.concat_arrays(
                    [
                        pa.array(["p_retailprice_cents"] * n, pa.string()),
                        pa.array(["p_size"] * n, pa.string()),
                    ]
                ),
                "val": pa.concat_arrays([cents, size]),
            }
        )

    return _to_table(
        ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by([("p_partkey", "ascending"), ("attr", "ascending")])


def q_weighted_median(sf_dir: str):
    """EXACT weighted median price per return flag (weight = quantity):
    the smallest value whose cumulative weight reaches ceil(W/2) — what
    plain medians become when every row carries a count/size weight.

    Shape: group weight totals via sum_by_keys (O(groups) driver rows,
    broadcast back as crossing targets); ONE global sort + the segmented
    weighted prefix scan (with_group_prefix_sum); the crossing row is
    identified per batch by cw >= target AND cw - wt < target — exactly
    one row per group survives, so only O(groups) rows ever leave the
    scan."""
    import ray

    from ..functions.aggregates import sum_by_keys, with_group_prefix_sum

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice"],
    )

    # the SQL NULL flag is ONE GROUP BY group; a sentinel below every real
    # single-char flag keeps index_in/searchsorted null-free end-to-end
    NULLK = "\x00"

    def rows(t: pa.Table) -> pa.Table:
        k = t.column("l_returnflag")
        if k.null_count:
            k = pc.fill_null(k, NULLK)
        return pa.table(
            {
                "k": k,
                "v": _rnd_i64(t.column("l_extendedprice"), 100),
                # fill 0 == window SUM skipping the null weight; an all-null
                # group sums to W=0 and its crossing test never fires, which
                # is exactly SQL's cw >= (NULL+1)//2 never-true
                "wt": _rnd_i64(t.column("l_quantity"), fill=0),
                "t1": t.column("l_orderkey"),
                "t2": t.column("l_linenumber").cast(pa.int64()),
            }
        )

    ds = li.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True).materialize()
    totals = _to_table(sum_by_keys(ds, ["k"], "wt", out="W"))
    tref = ray.put(
        (
            totals.column("k").combine_chunks(),
            (totals.column("W").to_numpy(zero_copy_only=False) + 1) // 2,
        )
    )

    scanned = with_group_prefix_sum(ds, ["k"], ["v", "t1", "t2"], "wt", out="cw", inclusive=True)

    def crossing(t: pa.Table, *, ref=tref) -> pa.Table:
        empty = pa.table(
            {"l_returnflag": pa.array([], pa.string()), "wmedian_cents": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        keys_arr, tgt_np = ray.get(ref)
        idx = pc.index_in(t.column("k"), value_set=keys_arr)
        tgt = tgt_np[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        cw = t.column("cw").to_numpy(zero_copy_only=False)
        wt = t.column("wt").to_numpy(zero_copy_only=False)
        hit = (cw >= tgt) & (cw - wt < tgt)
        sub = t.filter(pa.array(hit))
        return pa.table(
            {"l_returnflag": sub.column("k"), "wmedian_cents": sub.column("v")}
        )

    out = _to_table(
        scanned.map_batches(crossing, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("l_returnflag")
    # the oracle's JOIN tot USING (k) is an inner equality join: the NULL
    # flag group never matches itself and vanishes from the result
    return out.filter(pc.not_equal(out.column("l_returnflag"), NULLK))


def q_revenue_share(sf_dir: str):
    """Ratio-to-report: each nation's share of total order revenue, as
    an exact integer e6 floor ((1e6 * nation_cents) // total_cents — no
    float anywhere).  The customer->nation map broadcasts once; revenue
    reduces per nation through one distributed keyed sum; the share
    divides the O(nations) table on the driver."""
    import ray

    from ..functions.aggregates import sum_by_keys

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    cref = ray.put((cust.column("c_custkey").combine_chunks(), cust.column("c_nationkey").combine_chunks()))

    orders = _decoded(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def stage(t: pa.Table, *, ref=cref) -> pa.Table:
        ck, cn = ray.get(ref)
        idx = pc.index_in(t.column("o_custkey"), value_set=ck)
        # INNER JOIN customer drops null/unmatched custkeys; a matched
        # customer with a NULL c_nationkey is the legitimate NULL nation
        # group (flows through the null-keyed sum); null price adds 0
        t = t.filter(pc.is_valid(idx))
        nat = pc.take(cn, idx.filter(pc.is_valid(idx)))
        cents = _rnd_i64(t.column("o_totalprice"), 100, fill=0)
        return pa.table({"nation": nat.cast(pa.int64()), "cents": cents})

    per_nat = _to_table(
        sum_by_keys(
            orders.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True),
            ["nation"],
            "cents",
        )
    ).sort_by("nation")
    cents = per_nat.column("cents").to_numpy(zero_copy_only=False)
    total = int(cents.sum())
    return pa.table(
        {
            "nation": per_nat.column("nation"),
            "revenue_cents": per_nat.column("cents"),
            "share_e6": pa.array((1_000_000 * cents) // total),
        }
    )


def q_profit_by_nation(sf_dir: str):
    """TPC-H Q9 analog — profit by supplier nation and order year.

    The fixture has no partsupp table (no ps_supplycost), so profit is
    the discounted revenue e4 (extendedprice x (1-discount)) while the
    JOIN SHAPE stays Q9's: part-name filter -> lineitem -> supplier ->
    nation on the build side, orders on the probe side for the year.
    The filtered partkey set and the suppkey->nationkey map broadcast
    once (ray.put); lineitem drops to the matching parts per batch
    BEFORE the orders join, so join_adaptive sees only ~1/8 of lineitem;
    the (nation, year) rollup is O(nations x years) per-batch partials.
    """
    from ..functions.joins import join_adaptive

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    pkeys = part.filter(
        pc.match_substring(part.column("p_name"), "widget")
    ).column("p_partkey").combine_chunks()
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    dims_ref = ray.put(
        (pkeys, supp.column("s_suppkey").combine_chunks(), supp.column("s_nationkey").combine_chunks())
    )

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_stage(t: pa.Table, *, ref=dims_ref) -> pa.Table:
        pk, sk, sn = ray.get(ref)
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=pk))
        nat = pc.take(sn, pc.index_in(t.column("l_suppkey"), value_set=sk))
        # INNER JOIN supplier/nation: a null s_nationkey (or unmatched
        # suppkey) never reaches the rollup
        nv = pc.is_valid(nat)
        t, nat = t.filter(nv), nat.filter(nv)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "nat": nat.cast(pa.int64()),
                "profit_e4": _rev_e4_arr(t),
            }
        )

    li_rev = li.map_batches(li_stage, batch_format="pyarrow", zero_copy_batch=True)

    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def ord_stage(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (_month_id_from_epoch_us(us) // 12).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"), "o_year": pa.array(year)})

    joined = join_adaptive(
        li_rev,
        orders.map_batches(ord_stage, batch_format="pyarrow", zero_copy_batch=True),
        "l_orderkey",
        "o_orderkey",
        ["o_year"],
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "nat": pa.array([], pa.int64()),
                    "o_year": pa.array([], pa.int64()),
                    "profit_e4": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["nat", "o_year"]).aggregate([("profit_e4", "sum")])
        return pa.table(
            {
                "nat": g.column("nat"),
                "o_year": g.column("o_year"),
                "profit_e4": g.column("profit_e4_sum"),
            }
        )

    parts = _to_table(joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by(["nat", "o_year"]).aggregate([("profit_e4", "sum")])
    return pa.table(
        {
            "nation": pa.array([f"NATION_{k}" for k in final.column("nat").to_pylist()]),
            "o_year": final.column("o_year"),
            "profit_e4": final.column("profit_e4_sum"),
        }
    ).sort_by([("nation", "ascending"), ("o_year", "descending")])


def q_supplier_cnt(sf_dir: str):
    """TPC-H Q16 analog — distinct-supplier count per (brand, type, size).

    No partsupp exists in the fixture; lineitem's observed (l_partkey,
    l_suppkey) pairs are the part<->supplier bridge.  Each filtered
    partkey maps to a dense triple id on the driver (triples are tiny:
    <= brands x types x sizes), so the global pair dedup is ONE
    sum_by_keys range sort over int64 (tid, suppkey) — O(distinct pairs)
    shuffle, never raw lineitem rows to the driver.  After the dedup each
    pair exists exactly once globally, so the per-tid COUNT is an exact
    per-batch partial + tiny final sum.  Complaint-supplier exclusion
    (classic Q16's NOT IN) is the s_acctbal < 1000 set, broadcast once.
    """
    from ..functions.aggregates import sum_by_keys

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    keep = pc.and_(
        pc.and_(
            pc.invert(pc.equal(part.column("p_brand"), "Brand#5")),
            pc.invert(pc.equal(part.column("p_type"), "PROMO")),
        ),
        pc.is_in(
            part.column("p_size"),
            value_set=pa.array([1, 4, 7, 10, 13], part.column("p_size").type),
        ),
    )
    pf = part.filter(keep)
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_acctbal"]
    )
    bad = supp.filter(pc.less(supp.column("s_acctbal"), 1000.0)).column("s_suppkey").combine_chunks()

    pbr = pf.column("p_brand").to_pylist()
    pty = pf.column("p_type").to_pylist()
    psz = pf.column("p_size").to_pylist()
    triples = sorted(set(zip(pbr, pty, psz)))
    tid = {t: i for i, t in enumerate(triples)}
    pk2tid = pa.array([tid[(b, ty, s)] for b, ty, s in zip(pbr, pty, psz)], pa.int64())
    ref = ray.put((pf.column("p_partkey").combine_chunks(), pk2tid, bad))

    li = _decoded(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def to_pairs(t: pa.Table, *, ref=ref) -> pa.Table:
        pk, t2, bad = ray.get(ref)
        m = pc.is_in(t.column("l_partkey"), value_set=pk)
        if len(bad):
            m = pc.and_(m, pc.invert(pc.is_in(t.column("l_suppkey"), value_set=bad)))
        t = t.filter(m)
        trip = pc.take(t2, pc.index_in(t.column("l_partkey"), value_set=pk))
        raw = pa.table(
            {
                "tid": trip,
                "sk": t.column("l_suppkey").cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        # batch-local dedup shrinks the sort input before the shuffle
        g = raw.group_by(["tid", "sk"]).aggregate([("one", "min")])
        return pa.table({"tid": g.column("tid"), "sk": g.column("sk"), "one": g.column("one_min")})

    dpairs = sum_by_keys(
        li.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["tid", "sk"],
        "one",
    )

    def cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tid" not in t.column_names:
            return pa.table({"tid": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        g = t.group_by("tid").aggregate([("one", "count")])
        return pa.table({"tid": g.column("tid"), "n": g.column("one_count").cast(pa.int64())})

    parts = _to_table(dpairs.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("tid").aggregate([("n", "sum")])
    tids = final.column("tid").to_pylist()
    out = pa.table(
        {
            "p_brand": pa.array([triples[i][0] for i in tids]),
            "p_type": pa.array([triples[i][1] for i in tids]),
            "p_size": pa.array([int(triples[i][2]) for i in tids], pa.int64()),
            "supplier_cnt": final.column("n_sum"),
        }
    )
    return out.sort_by(
        [
            ("supplier_cnt", "descending"),
            ("p_brand", "ascending"),
            ("p_type", "ascending"),
            ("p_size", "ascending"),
        ]
    )


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 analog — revenue that would be lost by dropping
    small-quantity orders of one brand's parts.

    Pass 1 reduces per-part (sum, count) of quantity through per-batch
    partials (O(filtered parts) rows, broadcast back via ray.put); pass 2
    re-streams the same filtered lineitem and keeps rows strictly below
    20% of the part's mean quantity.  The compare is EXACT integers
    (5 * qty * cnt < sum_qty — quantities are integral in the fixture),
    so there is no float knife-edge against the oracle.  Output is one
    row: FLOOR(sum(extendedprice)_cents / 7), classic Q17's 'avg yearly'.
    """
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    pk = part.filter(pc.equal(part.column("p_brand"), "Brand#13")).column("p_partkey").combine_chunks()
    pk_ref = ray.put(pk)

    li = _decoded(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def pass1(t: pa.Table, *, ref=pk_ref) -> pa.Table:
        keys = ray.get(ref)
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=keys))
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # SUM skips null quantities, COUNT(*) does not; a part whose every
        # quantity is null has q = NULL in SQL (its compare is never true)
        # -> sentinel -2^62 keeps the strict < false without a null lane
        g = t.group_by("l_partkey").aggregate([("l_quantity", "sum"), ([], "count_all")])
        return pa.table(
            {
                "l_partkey": g.column("l_partkey"),
                "q": _rnd_i64(g.column("l_quantity_sum"), fill=-(1 << 62)),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    p1 = _to_table(
        li.map_batches(pass1, batch_format="pyarrow", zero_copy_batch=True)
    ).group_by("l_partkey").aggregate([("q", "sum"), ("n", "sum")])
    stats_ref = ray.put(
        (
            p1.column("l_partkey").combine_chunks(),
            p1.column("q_sum").combine_chunks(),
            p1.column("n_sum").combine_chunks(),
        )
    )

    def pass2(t: pa.Table, *, ref=stats_ref) -> pa.Table:
        keys, qs, ns = ray.get(ref)
        if keys is None or len(keys) == 0:
            return pa.table({"c": pa.array([0], pa.int64())})
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=keys))
        if t.num_rows == 0:
            return pa.table({"c": pa.array([0], pa.int64())})
        i = pc.index_in(t.column("l_partkey"), value_set=keys).to_numpy(zero_copy_only=False).astype(np.int64)
        qcol = t.column("l_quantity")
        qv = pc.is_valid(qcol).to_numpy(zero_copy_only=False)
        qty = np.rint(np.nan_to_num(qcol.to_numpy(zero_copy_only=False))).astype(np.int64)
        # NULL qty -> NULL compare -> row excluded; null price adds 0 (SUM skip)
        keep = (5 * qty * ns.to_numpy()[i] < qs.to_numpy()[i]) & qv
        cents = _rnd_i64(t.column("l_extendedprice"), 100, fill=0).to_numpy(zero_copy_only=False)
        return pa.table({"c": pa.array([int(cents[keep].sum())], pa.int64())})

    tot = _to_table(li.map_batches(pass2, batch_format="pyarrow", zero_copy_batch=True))
    total = int(pc.sum(tot.column("c")).as_py() or 0)
    return pa.table({"avg_yearly_e2": pa.array([total // 7], pa.int64())})


def q_excess_suppliers(sf_dir: str):
    """TPC-H Q20 analog — suppliers who shipped an above-average total
    quantity of 'large *' parts during 1997.

    partsupp (ps_availqty) is absent, so the excess test is against the
    mean per-shipping-supplier total with a STRICT integer compare
    (qty * n > tot — no float edge), keeping Q20's chain: part-name
    filter (broadcast keys) -> date-bounded lineitem scan (shipdate
    predicate pushed into the chunk reader) -> per-supplier reduce
    (per-batch partials, O(suppliers) final) -> threshold -> supplier
    name join.  The final reduce is O(suppliers) rows on the driver —
    the documented partitioning assumption (suppliers << lineitem).
    """
    lo_us = 852_076_800_000_000  # 1997-01-01 epoch-us
    hi_us = 883_612_800_000_000  # 1998-01-01 epoch-us
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    pk = part.filter(pc.starts_with(part.column("p_name"), "large")).column("p_partkey").combine_chunks()
    pk_ref = ray.put(pk)

    li = _decoded(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        predicates=[("and", ("l_shipdate", ">=", lo_us), ("l_shipdate", "<", hi_us))],
    )

    def partial(t: pa.Table, *, ref=pk_ref) -> pa.Table:
        keys = ray.get(ref)
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=keys))
        if t.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()), "qty": pa.array([], pa.int64())})
        t2 = pa.table(
            {
                "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
                # null qty contributes 0 (SQL SUM skip; an all-null
                # supplier fails ship_qty*n > tot either way)
                "qty": _rnd_i64(t.column("l_quantity"), fill=0),
            }
        )
        g = t2.group_by("l_suppkey").aggregate([("qty", "sum")])
        return pa.table({"l_suppkey": g.column("l_suppkey"), "qty": g.column("qty_sum")})

    per = _to_table(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    ).group_by("l_suppkey").aggregate([("qty", "sum")])
    q = per.column("qty_sum").to_numpy()
    sk = per.column("l_suppkey").to_numpy()
    n, tot = q.size, int(q.sum()) if q.size else 0
    keepm = q * n > tot
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    names = pc.take(
        supp.column("s_name").combine_chunks(),
        pc.index_in(pa.array(sk[keepm]), value_set=supp.column("s_suppkey").combine_chunks()),
    )
    out = pa.table({"s_name": names, "ship_qty": pa.array(q[keepm])})
    return out.sort_by([("ship_qty", "descending"), ("s_name", "ascending")])


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 analog — suppliers 'at fault' in multi-supplier
    finished orders.

    l_commitdate / l_receiptdate are absent from the fixture, so the
    fault signal is the return flag: for o_orderstatus = 'F' orders with
    >= 2 distinct suppliers where EXACTLY ONE supplier had a returned
    ('R') line, that supplier is counted (Q21's EXISTS / NOT EXISTS pair
    over the lineitem self-join, re-expressed as two keyed reductions).

    Scale shape: distinct (order, supplier) pairs reduce through ONE
    sum_by_keys range sort with the R flag PACKED into the summed value
    (2^20 per R line + 1 per line; lines-per-pair << 2^20 so the pack
    never carries); the F-order restriction is a distributed semi join;
    the per-order qualifier is a second sum_by_keys over the materialized
    pairs with the same pack (2^20 per R-supplier + 1 per supplier); the
    qualifying orderkeys semi-join back against the R-pairs.  Nothing
    driver-side ever exceeds O(suppliers).
    """
    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_semi_anti

    PACK = 1 << 20

    li = _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def line_stage(t: pa.Table) -> pa.Table:
        # NULL = 'R' is not true: the CASE lands in ELSE 0
        r = pc.fill_null(pc.equal(t.column("l_returnflag"), "R"), False).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
                "v": pa.array(1 + r.astype(np.int64) * PACK),
            }
        )

    pairs = sum_by_keys(
        li.map_batches(line_stage, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "l_suppkey"],
        "v",
    )

    orders_f = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F")).select(["o_orderkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # pairs feeds BOTH the per-order qualifier and the final attribution:
    # materialize once (object-store blocks, O(distinct pairs))
    pairs_f = join_semi_anti(pairs, orders_f, "l_orderkey", "o_orderkey").materialize()

    def pair_stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "v" not in t.column_names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
        has_r = (t.column("v").to_numpy(zero_copy_only=False) >= PACK).astype(np.int64)
        return pa.table({"l_orderkey": t.column("l_orderkey"), "w": pa.array(1 + has_r * PACK)})

    per_order = sum_by_keys(
        pairs_f.map_batches(pair_stage, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        "w",
    )

    def qualify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w" not in t.column_names:
            return pa.table({"l_orderkey": pa.array([], pa.int64())})
        w = t.column("w").to_numpy(zero_copy_only=False)
        keep = ((w % PACK) >= 2) & ((w // PACK) == 1)
        return pa.table({"l_orderkey": t.column("l_orderkey").filter(pa.array(keep))})

    qual = per_order.map_batches(qualify, batch_format="pyarrow", zero_copy_batch=True)

    r_pairs = pairs_f.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("v"), PACK))
        if t.num_rows and "v" in t.column_names
        else pa.table({"l_orderkey": pa.array([], pa.int64()), "l_suppkey": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    faulted = join_semi_anti(r_pairs, qual, "l_orderkey", "l_orderkey")

    def count_stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            return pa.table({"l_suppkey": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        g = t.group_by("l_suppkey").aggregate([("v", "count")])
        return pa.table({"l_suppkey": g.column("l_suppkey"), "n": g.column("v_count").cast(pa.int64())})

    per_supp = _to_table(
        faulted.map_batches(count_stage, batch_format="pyarrow", zero_copy_batch=True)
    ).group_by("l_suppkey").aggregate([("n", "sum")])
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    names = pc.take(
        supp.column("s_name").combine_chunks(),
        pc.index_in(per_supp.column("l_suppkey").cast(pa.int64()), value_set=supp.column("s_suppkey").cast(pa.int64()).combine_chunks()),
    )
    out = pa.table({"s_name": names, "numwait": per_supp.column("n_sum")}).sort_by(
        [("numwait", "descending"), ("s_name", "ascending")]
    )
    return out.slice(0, 20)


def q_sales_opportunity(sf_dir: str):
    """TPC-H Q22 analog — rich customers with no orders, by nation.

    c_phone is absent, so the 'country code' IN-list is a nationkey set.
    The positive-balance mean threshold is an EXACT integer compare
    (bal_cents * n > sum_cents — no float knife-edge); the no-orders
    test is the distributed ANTI join (orders' custkeys dedup per batch
    inside join_semi_anti, broadcast-or-partitioned by size); the
    per-nation rollup is O(nations) per-batch partials.  Customer routes
    through the engine store both passes.
    """
    from ..functions.joins import join_semi_anti

    NATS = [3, 7, 11, 13, 17, 19, 23]

    cust = _decoded(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def thresh_partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t.column("c_nationkey"), value_set=pa.array(NATS, t.column("c_nationkey").type)),
            pc.greater(t.column("c_acctbal"), 0.0),
        )
        t = t.filter(m)
        cents = np.rint(t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {"s": pa.array([int(cents.sum())], pa.int64()), "n": pa.array([t.num_rows], pa.int64())}
        )

    tp = _to_table(cust.map_batches(thresh_partial, batch_format="pyarrow", zero_copy_batch=True))
    S = int(pc.sum(tp.column("s")).as_py() or 0)
    N = int(pc.sum(tp.column("n")).as_py() or 0)

    def rich(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t.column("c_nationkey"), value_set=pa.array(NATS, t.column("c_nationkey").type))
        )
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        # NULL acctbal is SQL-false in `c_acctbal > (SELECT AVG ...)`:
        # exclude explicitly rather than letting NaN->int64 wrap decide
        valid = ~np.isnan(bal)
        cents = np.rint(np.where(valid, bal, 0.0) * 100).astype(np.int64)
        keep = valid & (cents * N > S)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "cntrycode": t.column("c_nationkey").cast(pa.int64()),
                "bal_e2": pa.array(cents),
            }
        ).filter(pa.array(keep))

    rich_ds = cust.map_batches(rich, batch_format="pyarrow", zero_copy_batch=True)
    # every fixture customer has at least one order, so classic Q22's bare
    # NOT EXISTS is vacuous here; the analog anti-joins the URGENT subset
    # (customers who never placed a 1-URGENT order) — same distributed
    # ANTI shape, non-degenerate result at every sf
    urgent = _decoded(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT")).select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    no_orders = join_semi_anti(rich_ds, urgent, "c_custkey", "o_custkey", anti=True)

    def roll(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cntrycode" not in t.column_names:
            return pa.table(
                {
                    "cntrycode": pa.array([], pa.int64()),
                    "numcust": pa.array([], pa.int64()),
                    "totacctbal_e2": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cntrycode").aggregate([("bal_e2", "sum"), ("bal_e2", "count")])
        return pa.table(
            {
                "cntrycode": g.column("cntrycode"),
                "numcust": g.column("bal_e2_count").cast(pa.int64()),
                "totacctbal_e2": g.column("bal_e2_sum"),
            }
        )

    parts = _to_table(no_orders.map_batches(roll, batch_format="pyarrow", zero_copy_batch=True))
    if parts.num_rows == 0:
        return pa.table(
            {
                "cntrycode": pa.array([], pa.int64()),
                "numcust": pa.array([], pa.int64()),
                "totacctbal_e2": pa.array([], pa.int64()),
            }
        )
    final = parts.group_by("cntrycode").aggregate([("numcust", "sum"), ("totacctbal_e2", "sum")])
    return pa.table(
        {
            "cntrycode": final.column("cntrycode"),
            "numcust": final.column("numcust_sum"),
            "totacctbal_e2": final.column("totacctbal_e2_sum"),
        }
    ).sort_by("cntrycode")


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
ORACLE_SQL = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
               CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_cents,
               CAST(ROUND(SUM(l_discount) / COUNT(*) * 1000000) AS BIGINT) AS avg_disc_e6,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "filter_groupby_events": """
        SELECT event_type,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS total_value_cents,
               COUNT(value) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "join_orders_customer": """
        SELECT c.c_mktsegment,
               CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "point_lookup_events": "SELECT * FROM events WHERE event_id = 777",
    "window_hourly_events": """
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS total_value_cents,
               COUNT(value) AS n_events
        FROM events GROUP BY event_type, hour_epoch
        ORDER BY event_type, hour_epoch
    """,
    "top_revenue_orders": """
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "distinct_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "median_value": """
        SELECT event_type,
               CAST(ROUND(quantile_disc(value, 0.5) * 100) AS BIGINT)
                   AS median_cents
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "running_revenue": """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        FROM orders ORDER BY o_orderkey
    """,
    "order_gaps": """
        SELECT o_orderkey,
               (epoch_us(o_orderdate) - LAG(epoch_us(o_orderdate)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
                   // 86400000000 AS gap_days
        FROM orders ORDER BY o_orderkey
    """,
    "join_lineitem_orders": """
        WITH l AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_e4
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_orderpriority, CAST(SUM(rev_e4) AS BIGINT) AS rev_e4,
               COUNT(*) AS n_orders
        FROM l JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "global_quantiles": """
        WITH v AS (SELECT CAST(ROUND(value * 1000000) AS BIGINT) v FROM events)
        SELECT 'p50' AS q, quantile_disc(v, 0.5) AS val_e6 FROM v
        UNION ALL SELECT 'p90', quantile_disc(v, 0.9) FROM v
        UNION ALL SELECT 'p99', quantile_disc(v, 0.99) FROM v
        ORDER BY q
    """,
    "top_segment_revenue": """
        WITH rev AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_e4
            FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey
        )
        SELECT o_orderkey, CAST(rev.rev_e4 AS BIGINT) AS rev_e4,
               o_orderdate, o_orderpriority
        FROM rev
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        ORDER BY rev_e4 DESC, o_orderdate, o_orderkey LIMIT 10
    """,
    "promo_share": """
        SELECT (CAST(YEAR(l_shipdate) AS BIGINT) * 12
                + CAST(MONTH(l_shipdate) AS BIGINT) - 1) AS month_id,
               CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS BIGINT) AS promo_rev_e4,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS total_rev_e4
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY month_id ORDER BY month_id
    """,
    "nation_revenue": """
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY rev_e4 DESC, n_name
    """,
    "revenue_share": """
        WITH n AS (
            SELECT CAST(c_nationkey AS BIGINT) AS nation,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        )
        SELECT nation, revenue_cents,
               CAST((1000000 * revenue_cents)
                    // (SELECT SUM(revenue_cents) FROM n) AS BIGINT) AS share_e6
        FROM n ORDER BY nation
    """,
    "weighted_median": """
        WITH w AS (
            SELECT l_returnflag AS k,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                   CAST(ROUND(l_quantity) AS BIGINT) AS wt,
                   l_orderkey, l_linenumber
            FROM lineitem
        ),
        tot AS (SELECT k, SUM(wt) AS W FROM w GROUP BY k),
        r AS (
            SELECT w.k, w.v, w.wt, tot.W,
                   SUM(w.wt) OVER (PARTITION BY w.k
                                   ORDER BY w.v, w.l_orderkey, w.l_linenumber
                                   ROWS UNBOUNDED PRECEDING) AS cw
            FROM w JOIN tot USING (k)
        )
        SELECT k AS l_returnflag, CAST(MIN(v) AS BIGINT) AS wmedian_cents
        FROM r WHERE cw >= (W + 1) // 2
        GROUP BY k ORDER BY k
    """,
    "unpivot_part": """
        SELECT p_partkey, 'p_retailprice_cents' AS attr,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS val
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_size', CAST(p_size AS BIGINT) FROM part
        ORDER BY p_partkey, attr
    """,
    "full_join_daily": """
        WITH od AS (
            SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        ),
        ed AS (
            SELECT CAST(epoch(ts) AS BIGINT) // 86400 AS day,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1
        )
        SELECT COALESCE(od.day, ed.day) AS day,
               COALESCE(od.revenue_cents, 0) AS revenue_cents,
               CASE WHEN od.day IS NULL THEN 0 ELSE 1 END AS has_orders,
               COALESCE(ed.n_events, 0) AS n_events,
               CASE WHEN ed.day IS NULL THEN 0 ELSE 1 END AS has_events
        FROM od FULL OUTER JOIN ed ON od.day = ed.day
        ORDER BY day
    """,
    "mad_value": """
        WITH v AS (
            -- null values excluded up front (SQL aggregate semantics);
            -- the rank-median below then counts only real values
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS ve2
            FROM events WHERE value IS NOT NULL
        ),
        m AS (
            SELECT event_type, ve2 AS med FROM (
                SELECT event_type, ve2,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY ve2, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM v
            ) WHERE rn = (n + 1) // 2
        ),
        d AS (
            SELECT v.event_type, v.event_id, ABS(v.ve2 - m.med) AS dd
            FROM v JOIN m ON v.event_type IS NOT DISTINCT FROM m.event_type
        ),
        mad AS (
            SELECT event_type, dd AS mad FROM (
                SELECT event_type, dd,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY dd, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM d
            ) WHERE rn = (n + 1) // 2
        )
        SELECT m.event_type, m.med AS median_cents, mad.mad AS mad_cents
        FROM m JOIN mad ON m.event_type IS NOT DISTINCT FROM mad.event_type
        ORDER BY m.event_type
    """,
    "volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "custdist": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) co
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS total_rev_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev_e4
        FROM supplier, revenue
        WHERE s_suppkey = l_suppkey
          AND total_rev_e4 = (SELECT MAX(total_rev_e4) FROM revenue)
        ORDER BY s_suppkey
    """,
    "market_share": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CASE WHEN s_nationkey = 7
                    THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS BIGINT) AS mkt_num_e4,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS mkt_den_e4
        FROM part, lineitem, supplier, orders, customer, nation, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_year ORDER BY o_year
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "cube_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "forecast_revenue": """
        SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)), 0) AS BIGINT) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24
    """,
    "large_orders": """
        WITH big AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 150
        )
        SELECT c_name, o_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_e2,
               CAST(sum_qty AS BIGINT) AS sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY price_e2 DESC, o_orderkey
        LIMIT 100
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_name,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_e2
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        ORDER BY c_custkey
    """,
    "returned_item_revenue": """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_e2,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
        ORDER BY rev_e4 DESC, c.c_custkey
        LIMIT 20
    """,
    "json_extract_stats": r"""
        -- the operator contract is the documented vectorized regex field
        -- pull, not a strict JSON parse: the oracle mirrors the exact
        -- regex so malformed / null / non-integer props rows degrade to
        -- NULL identically on both sides (strict json_extract ERRORS on
        -- any malformed row, which no total scan operator can do)
        WITH x AS (
          SELECT event_type,
                 TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
          FROM events
        )
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS k_sum,
               CAST(MIN(k) AS BIGINT) AS k_min,
               CAST(MAX(k) AS BIGINT) AS k_max,
               COUNT(*) AS n
        FROM x GROUP BY event_type ORDER BY event_type
    """,
    "value_histogram": """
        -- explicit NULL bucket: DuckDB's LEAST IGNORES null arguments,
        -- which would silently fold null values into bucket 19
        SELECT CASE WHEN value IS NULL THEN NULL
               ELSE LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 19) END AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY bucket ORDER BY bucket
    """,
    "corr_moments": """
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                    * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS syy
        FROM lineitem
    """,
    "group_quantiles": """
        WITH qv AS (
            SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS v
            FROM events
        )
        SELECT event_type, 'p50' AS q, quantile_disc(v, 0.5) AS val_e6
        FROM qv GROUP BY event_type
        UNION ALL
        SELECT event_type, 'p90' AS q, quantile_disc(v, 0.9) AS val_e6
        FROM qv GROUP BY event_type
        UNION ALL
        SELECT event_type, 'p99' AS q, quantile_disc(v, 0.99) AS val_e6
        FROM qv GROUP BY event_type
        ORDER BY event_type, q
    """,
    "bloom_join": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 475000
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "pivot_weekday": """
        SELECT CAST(dayofweek(ts) AS BIGINT) AS weekday,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY weekday ORDER BY weekday
    """,
    "revenue_quartiles": """
        SELECT bucket, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM (SELECT CAST(NTILE(4) OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                         o_orderkey) AS BIGINT) AS bucket,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders)
        GROUP BY bucket ORDER BY bucket
    """,
    "order_priority_exists": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "linestatus_priority_mix": """
        WITH j AS (
          SELECT l.l_linestatus, o.o_orderpriority
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        ), u AS (
          SELECT l_linestatus, 'high_line_count' AS kind,
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS one
          FROM j
          UNION ALL
          SELECT l_linestatus, 'low_line_count',
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END
          FROM j
        )
        SELECT l_linestatus, kind, CAST(SUM(one) AS BIGINT) AS n
        FROM u GROUP BY l_linestatus, kind ORDER BY l_linestatus, kind
    """,
    "disjunctive_revenue": """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 50)
    """,
    "customer_order_overlap": """
        WITH per AS (
          SELECT o_custkey,
                 SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
                 SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f
          FROM orders GROUP BY o_custkey
        )
        SELECT CASE WHEN n_o > 0 AND n_f > 0 THEN 'both'
                    WHEN n_o > 0 THEN 'only_open'
                    WHEN n_f > 0 THEN 'only_filled'
                    ELSE 'pending_only' END AS cls,
               COUNT(*) AS n_customers
        FROM per GROUP BY cls ORDER BY cls
    """,
    "argmax_events": """
        WITH m AS (SELECT event_type, MAX(value) AS mv FROM events GROUP BY event_type)
        SELECT e.event_type,
               CAST(ROUND(m.mv * 1000000) AS BIGINT) AS max_value_e6,
               MIN(e.event_id) AS argmax_event_id
        FROM events e JOIN m ON e.event_type IS NOT DISTINCT FROM m.event_type
                             AND e.value = m.mv
        GROUP BY e.event_type, m.mv ORDER BY e.event_type
    """,
    "status_moments": """
        WITH p AS (
          SELECT o_orderstatus AS s, COUNT(*) AS n,
                 SUM(x) AS s1, SUM(x*x) AS s2, SUM(x*x*x) AS s3, SUM(x*x*x*x) AS s4
          FROM (SELECT o_orderstatus, CAST(ROUND(o_totalprice / 1000) AS BIGINT) AS x
                FROM orders)
          GROUP BY o_orderstatus
        )
        SELECT s AS o_orderstatus, CAST(n AS BIGINT) AS n,
               CAST(ROUND((s3/n - 3*(s1/n)*s2/n + 2*(s1/n)^3)
                    / ((s2/n - (s1/n)*(s1/n))^1.5) * 1000000) AS BIGINT) AS skew_e6,
               CAST(ROUND(((s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n - 3*(s1/n)^4)
                    / ((s2/n - (s1/n)*(s1/n))^2) - 3) * 1000000) AS BIGINT) AS kurt_e6
        FROM p ORDER BY s
    """,
    "prefix_scan_customers": """
        SELECT c_custkey, c_name,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_e2
        FROM customer WHERE c_name LIKE 'Customer#00000000%'
        ORDER BY c_custkey
    """,
    "grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS rev_e4
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag, l_linestatus
    """,
    "above_avg_orders": """
        WITH m AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_c,
                 COUNT(*) AS n_c
          FROM orders GROUP BY o_custkey
        )
        SELECT o.o_orderkey, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_e2
        FROM orders o JOIN m ON o.o_custkey = m.o_custkey
        WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * m.n_c > m.sum_c
        ORDER BY o.o_orderkey
    """,
    "having_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 13
        )
        ORDER BY c_custkey
    """,
    "skyline_parts": """
        WITH pts AS (
          SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                 CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_e2
          FROM part
        )
        SELECT p.p_partkey, p.p_size, p.price_e2
        FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts q
          WHERE q.p_size <= p.p_size AND q.price_e2 <= p.price_e2
            AND (q.p_size < p.p_size OR q.price_e2 < p.price_e2)
        )
        ORDER BY p.p_partkey
    """,
    "left_join_returns": """
        WITH c AS (
          SELECT l_orderkey, COUNT(*) AS n_returned
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, CAST(COALESCE(c.n_returned, 0) AS BIGINT) AS n_returned
        FROM orders o LEFT JOIN c ON o.o_orderkey = c.l_orderkey
        ORDER BY o.o_orderkey
    """,
    "percentile_cont": """
        WITH v AS (
          SELECT CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DOUBLE) AS ve
          FROM lineitem
        )
        SELECT 25 AS q_pct, CAST(FLOOR(quantile_cont(ve, 0.25)) AS BIGINT) AS val_e2_floor FROM v
        UNION ALL SELECT 50, CAST(FLOOR(quantile_cont(ve, 0.5)) AS BIGINT) FROM v
        UNION ALL SELECT 75, CAST(FLOOR(quantile_cont(ve, 0.75)) AS BIGINT) FROM v
        UNION ALL SELECT 90, CAST(FLOOR(quantile_cont(ve, 0.9)) AS BIGINT) FROM v
        UNION ALL SELECT 99, CAST(FLOOR(quantile_cont(ve, 0.99)) AS BIGINT) FROM v
        ORDER BY q_pct
    """,
    "distinct_users_by_type": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "mode_priority": """
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          FROM orders GROUP BY o_orderstatus, o_orderpriority
        ),
        r AS (
          SELECT o_orderstatus, o_orderpriority, n,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY n DESC, o_orderpriority) AS rn
          FROM c
        )
        SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
        FROM r WHERE rn = 1 ORDER BY o_orderstatus
    """,
    "same_day_order_pairs": """
        WITH g AS (
          SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
                 COUNT(*) AS n
          FROM orders GROUP BY 1, 2
        )
        SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_pairs FROM g
    """,
    "revenue_trend_slope": """
        WITH b AS (
          SELECT o_orderstatus AS s,
                 CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) - 9131 AS x,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
          FROM orders
        ),
        p AS (
          SELECT s, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx
          FROM b GROUP BY s
        )
        SELECT s AS o_orderstatus, CAST(n AS BIGINT) AS n,
               CAST(FLOOR((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1000000) AS BIGINT)
                 AS slope_e6
        FROM p ORDER BY s
    """,
    "group_percentile_cont": """
        WITH v AS (
          SELECT event_type,
                 CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DOUBLE) AS ve
          FROM events
        )
        SELECT event_type, 50 AS q_pct,
               CAST(FLOOR(quantile_cont(ve, 0.5)) AS BIGINT) AS val_e6_floor
        FROM v GROUP BY event_type
        UNION ALL
        SELECT event_type, 90, CAST(FLOOR(quantile_cont(ve, 0.9)) AS BIGINT)
        FROM v GROUP BY event_type
        ORDER BY event_type, q_pct
    """,
    "winsorized_stats": """
        WITH v AS (
          -- null values excluded (SQL quantile/aggregate semantics)
          SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS ve
          FROM events WHERE value IS NOT NULL
        ),
        b AS (
          SELECT event_type,
                 quantile_disc(ve, 0.05) AS lo, quantile_disc(ve, 0.95) AS hi,
                 COUNT(*) AS n
          FROM v GROUP BY event_type
        )
        SELECT v.event_type, CAST(b.lo AS BIGINT) AS lo_e6, CAST(b.hi AS BIGINT) AS hi_e6,
               CAST(SUM(LEAST(GREATEST(v.ve, b.lo), b.hi)) AS BIGINT) AS winsorized_sum_e6,
               CAST(b.n AS BIGINT) AS n
        FROM v JOIN b ON v.event_type IS NOT DISTINCT FROM b.event_type
        GROUP BY v.event_type, b.lo, b.hi, b.n ORDER BY v.event_type
    """,
    "pythagorean_means": """
        WITH p AS (
          SELECT o_orderstatus AS s, CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(LN(o_totalprice)) AS lnx, SUM(1.0 / o_totalprice) AS inv
          FROM orders GROUP BY o_orderstatus
        )
        SELECT s AS o_orderstatus, CAST(n AS BIGINT) AS n,
               CAST(FLOOR(EXP(lnx / n) * 100) AS BIGINT) AS geo_mean_e2,
               CAST(FLOOR(n / inv * 100) AS BIGINT) AS harm_mean_e2
        FROM p ORDER BY s
    """,
    "gini_user_activity": """
        WITH c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
        r AS (
          SELECT n_events,
                 ROW_NUMBER() OVER (ORDER BY n_events, user_id) AS i
          FROM c
        ),
        t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(n_events) AS DOUBLE) AS tot,
                     CAST(SUM(i * n_events) AS DOUBLE) AS num
              FROM r)
        SELECT CAST(n AS BIGINT) AS n_users, CAST(tot AS BIGINT) AS n_events,
               CAST(FLOOR((2.0 * num / (n * tot) - (n + 1) / n) * 1000000) AS BIGINT)
                 AS gini_e6
        FROM t
    """,
    "profit_by_nation": """
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS profit_e4
        FROM lineitem, orders, supplier, nation, part
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND p_partkey = l_partkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "supplier_cnt": """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 13)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "small_qty_revenue": """
        WITH s AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem, part
            WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
            GROUP BY l_partkey
        )
        SELECT COALESCE(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 7.0)
                        AS BIGINT), 0) AS avg_yearly_e2
        FROM lineitem JOIN s ON s.l_partkey = lineitem.l_partkey
        WHERE 5 * CAST(ROUND(l_quantity) AS BIGINT) * s.n < s.q
    """,
    "excess_suppliers": """
        WITH per AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS ship_qty
            FROM lineitem, part
            WHERE p_partkey = l_partkey AND p_name LIKE 'large%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
        ),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ship_qty) AS BIGINT) AS tot FROM per)
        SELECT s_name, ship_qty
        FROM per, t, supplier
        WHERE s_suppkey = l_suppkey AND ship_qty * n > tot
        ORDER BY ship_qty DESC, s_name
    """,
    "waiting_suppliers": """
        WITH pairs AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey
        ),
        ostats AS (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nsupp,
                   CAST(SUM(has_r) AS BIGINT) AS nr
            FROM pairs GROUP BY l_orderkey
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM pairs p JOIN ostats o ON p.l_orderkey = o.l_orderkey
                     JOIN supplier ON s_suppkey = p.l_suppkey
        WHERE p.has_r = 1 AND o.nsupp >= 2 AND o.nr = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "sales_opportunity": """
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer
            WHERE c_nationkey IN (3, 7, 11, 13, 17, 19, 23) AND c_acctbal > 0
        )
        SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_e2
        FROM customer, avg_bal
        WHERE c_nationkey IN (3, 7, 11, 13, 17, 19, 23)
          AND CAST(ROUND(c_acctbal * 100) AS BIGINT) * n > s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
}
