"""Sketch-backed queries: HLL distinct, CMS heavy hitters, t-digest quantiles, profiling.

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


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id) per event_type
    (functions/sketch.py): per-batch register partials, O(groups x 4 KiB)
    driver merge — the sketch alternative to q_distinct_users' exact
    shuffle (no oracle: estimator-specific values; the in-query
    self-assert below pins every estimate to the exact distributed
    distinct within the HLL error bound, so drift fails loudly instead
    of silently)."""
    from ..functions.sketch import approx_distinct

    ds = _decoded(sf_dir, "events", columns=["event_type", "user_id"])
    est = approx_distinct(ds, "user_id", group_col="event_type")
    # self-assert (the t-digest precedent, q_approx_quantiles below): the
    # exact grouped distinct is itself distributed (q_distinct_users'
    # pair-dedup pipeline), so the check adds one bounded pass, nothing
    # driver-heavy.  HLL p=12 -> sigma = 1.04/sqrt(4096) ~ 1.63%; allow
    # 5 sigma plus a +-2 absolute floor for tiny groups.
    from .tpch import q_distinct_users

    ex = q_distinct_users(sf_dir)
    exact = dict(zip(ex.column("event_type").to_pylist(), ex.column("n_users").to_pylist()))
    for g, e in zip(est.column("group").to_pylist(), est.column("approx_distinct").to_pylist()):
        # approx_distinct canonicalizes the null group to '__null__';
        # the exact pipeline keeps the SQL NULL key
        x = exact[None if g == "__null__" else g]
        assert abs(e - x) <= max(2.0, 5 * 0.01625 * x), (g, e, x)
    return est


def q_heavy_users(sf_dir: str):
    """Top-20 users by event count — the sketch-candidates + exact-verify
    heavy-hitter shape: per batch ONE fixed-size Count-Min partial
    (additive merge, O(d x w x 8 B) per batch to the driver — never the
    key domain) plus a local top-M candidate list; merged CMS estimates
    rank the candidate union, and only the top-2K survivors are exactly
    re-counted in a second filtered pass (is_in + per-batch group partial
    — a BOUNDED-domain aggregate).  At 100 TB nothing driver-side scales
    with rows or distinct users; EVERY candidate that cleared the local
    pigeonhole threshold in any batch is re-counted (never cut), so any
    key with global share >= 1/M is captured deterministically (the
    Misra-Gries bound, M = 8K -> share 0.625%); keys below that bound
    ride the best-effort local-top-M + CMS-ranked arm — the documented
    completeness contract of one-pass candidate generation.  Sketch
    kernels unit-tested in tests/test_sketch.py."""
    from ..functions.sketch import CMS_D, cms_estimate, cms_merge, cms_partial

    K = 20
    M = 8 * K
    W = 8192
    ds = _decoded(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("user_id").combine_chunks() if isinstance(t.column("user_id"), pa.ChunkedArray) else t.column("user_id")
        # the NULL user is one SQL group: count it exactly on the side
        # (a per-batch int riding the sketch row) — it can't flow through
        # the int64 candidate/CMS lanes
        n_null = col.null_count
        if n_null:
            col = col.drop_null()
        regs = cms_partial(col, W)
        vc = pc.value_counts(col)
        vals = vc.field("values").to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        # candidates: local top-M UNION every key with local count >=
        # ceil(rows/M) — pigeonhole: a key with GLOBAL count >= N/M must
        # clear that threshold in at least one batch, so heavy hitters
        # with share >= 1/M are captured deterministically (the
        # Misra-Gries bound); flatter keys ride the top-M best-effort arm
        order = np.lexsort((vals, -cnts))[:M]
        thresh = max(1, -(-t.num_rows // M))
        cleared_vals = vals[cnts >= thresh]
        cand = np.union1d(vals[order], cleared_vals)
        cleared = np.isin(cand, cleared_vals)
        n = cand.size + 1
        regcol = [None] * (n - 1) + [regs.tobytes()]
        return pa.table(
            {
                "cand": pa.array(np.r_[cand, [0]].astype(np.int64)),
                "cleared": pa.array(np.r_[cleared, [False]]),
                "is_sketch": pa.array([False] * (n - 1) + [True]),
                "regs": pa.array(regcol, pa.large_binary()),
                "null_cnt": pa.array([0] * (n - 1) + [int(n_null)], pa.int64()),
            }
        )

    mixed = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    sk = mixed.filter(mixed.column("is_sketch").combine_chunks())
    total_null = int(pc.sum(sk.column("null_cnt")).as_py() or 0)
    cms = cms_merge(
        [np.frombuffer(b, np.int64).reshape(CMS_D, W).copy() for b in sk.column("regs").to_pylist()]
    )
    cand_rows = mixed.filter(pc.invert(mixed.column("is_sketch").combine_chunks()))
    g = cand_rows.group_by("cand").aggregate([("cleared", "max")])
    cand = g.column("cand").combine_chunks()
    cleared_any = g.column("cleared_max").to_numpy(zero_copy_only=False).astype(bool)
    est = cms_estimate(cms, cand)
    cand_np = cand.to_numpy(zero_copy_only=False).astype(np.int64)
    # exact-capture set: every threshold-clearing candidate survives
    # unconditionally (the Misra-Gries guarantee); the CMS-ranked top-2K
    # only tops up the best-effort tail
    keep_mask = cleared_any.copy()
    keep_mask[np.lexsort((cand_np, -est))[: 2 * K]] = True
    short = pa.array(np.sort(cand_np[keep_mask]))
    sref = ray.put(short)

    def recount(t: pa.Table, *, sref) -> pa.Table:
        vs = ray.get(sref)
        col = t.column("user_id").combine_chunks() if isinstance(t.column("user_id"), pa.ChunkedArray) else t.column("user_id")
        sub = col.filter(pc.is_in(col, value_set=vs))
        vc = pc.value_counts(sub)
        return pa.table(
            {"user_id": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    parts = _to_table(ds.map_batches(functools.partial(recount, sref=sref), batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("user_id").aggregate([("cnt", "sum")])
    u = final.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = final.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    # the null group competes in the top-K like any other (ORDER BY cnt
    # DESC, user_id -> NULLS LAST among count ties)
    rows = sorted(
        [(-int(cc), 0, int(uu), uu) for uu, cc in zip(u, c)]
        + ([(-total_null, 1, 0, None)] if total_null else [])
    )[:K]
    return pa.table(
        {
            "user_id": pa.array([r[3] for r in rows], pa.int64()),
            "cnt": pa.array([-r[0] for r in rows], pa.int64()),
        }
    )


def q_profile_lineitem(sf_dir: str):
    """One-pass numeric profile of the decoded lineitem stream
    (functions/profile.py): per column n / nulls / min / max / exact
    integer-arithmetic mean — each batch reduces to one tiny row per
    column, so the driver merges O(columns x batches) rows regardless of
    table size.  The HLL approx-distinct field the operator also
    computes is dropped here to keep the oracle comparison exact
    (accuracy covered by tests/test_profile.py)."""
    from ..functions.profile import profile_numeric

    cols = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    ]
    ds = _decoded(sf_dir, "lineitem", columns=cols)
    t = profile_numeric(ds, cols)
    return t.drop_columns(["approx_distinct"]).sort_by("col")


def q_approx_quantiles(sf_dir: str):
    """Approximate global quantiles of l_extendedprice via distributed
    t-digest partials (functions/sketch.py) — the fixed-size-summary
    alternative to q_global_quantiles' exact one-sort path: per batch one
    <=delta-centroid digest, one driver merge, <=1% rank error
    (accuracy pinned by tests/test_sketch.py).  Rows-only driver check
    (approximate by design, like the HLL distinct)."""
    from ..functions.sketch import approx_quantiles

    ds = _decoded(sf_dir, "lineitem", columns=["l_extendedprice"])
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    t = approx_quantiles(ds, "l_extendedprice", qs)
    import numpy as np

    # query-level accuracy gate (r3 verdict item 8): the TRUE rank of
    # each estimate, from one distributed counting pass (5 counters per
    # batch), must sit within the t-digest k1 rank-error bound.  The
    # check streams — nothing row-scaled on the driver.
    est = t.column("value_est").to_numpy()

    def rank_partial(b: pa.Table) -> pa.Table:
        x = b.column("l_extendedprice").to_numpy(zero_copy_only=False).astype(np.float64)
        le = (x[:, None] <= est[None, :]).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "le": pa.array([le.tobytes()], pa.large_binary()),
                "n": pa.array([x.size], pa.int64()),
            }
        )

    ds2 = _decoded(sf_dir, "lineitem", columns=["l_extendedprice"])
    parts = _to_table(
        ds2.map_batches(rank_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    n_total = int(pc.sum(parts.column("n")).as_py() or 0)
    ranks = np.sum(
        [np.frombuffer(bb, np.int64) for bb in parts.column("le").to_pylist()], axis=0
    )
    err = np.abs(ranks / max(n_total, 1) - np.asarray(qs))
    assert (err <= 0.015).all(), f"t-digest rank error exceeded bound: {err}"

    return pa.table(
        {
            "q": t.column("q"),
            "value_e2": pa.array(np.rint(t.column("value_est").to_numpy() * 100).astype(np.int64)),
        }
    )


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
ORACLE_SQL = {
    "heavy_users": """
        SELECT user_id, COUNT(*) AS cnt FROM events
        GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20
    """,
    "profile_lineitem": """
        SELECT * FROM (SELECT 'l_orderkey' AS col, COUNT(l_orderkey) AS n, COUNT(*)-COUNT(l_orderkey) AS nulls,
            CAST(ROUND(MIN(l_orderkey)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_orderkey)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_orderkey*100) AS BIGINT)) * 10000.0 / COUNT(l_orderkey)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_partkey' AS col, COUNT(l_partkey) AS n, COUNT(*)-COUNT(l_partkey) AS nulls,
            CAST(ROUND(MIN(l_partkey)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_partkey)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_partkey*100) AS BIGINT)) * 10000.0 / COUNT(l_partkey)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_suppkey' AS col, COUNT(l_suppkey) AS n, COUNT(*)-COUNT(l_suppkey) AS nulls,
            CAST(ROUND(MIN(l_suppkey)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_suppkey)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_suppkey*100) AS BIGINT)) * 10000.0 / COUNT(l_suppkey)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_quantity' AS col, COUNT(l_quantity) AS n, COUNT(*)-COUNT(l_quantity) AS nulls,
            CAST(ROUND(MIN(l_quantity)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_quantity)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) * 10000.0 / COUNT(l_quantity)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col, COUNT(l_extendedprice) AS n, COUNT(*)-COUNT(l_extendedprice) AS nulls,
            CAST(ROUND(MIN(l_extendedprice)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_extendedprice)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) * 10000.0 / COUNT(l_extendedprice)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_discount' AS col, COUNT(l_discount) AS n, COUNT(*)-COUNT(l_discount) AS nulls,
            CAST(ROUND(MIN(l_discount)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_discount)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) * 10000.0 / COUNT(l_discount)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_tax' AS col, COUNT(l_tax) AS n, COUNT(*)-COUNT(l_tax) AS nulls,
            CAST(ROUND(MIN(l_tax)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_tax)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_tax*100) AS BIGINT)) * 10000.0 / COUNT(l_tax)) AS BIGINT) AS mean_e6
            FROM lineitem) ORDER BY col
    """,
}
