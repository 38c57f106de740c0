"""HyperLogLog sketch — distributed approximate COUNT(DISTINCT).

Flajolet et al. 2007 (+ the standard bias-corrected small/large-range
estimators).  The Ray Data shape is the canonical sketch-merge pattern:
each batch reduces to a fixed 2^p-byte register array inside
``map_batches`` (vectorized: one hash pass + one scatter-max), partial
registers merge by element-wise max, and only O(2^p) bytes ever reach the
driver — the exact-distinct shuffle (q_distinct_users) disappears
entirely.  At 100 TB this is the difference between an all-to-all
exchange of every key and a ~16 KiB reduction per stage.

Registers use p bucket bits / 64-p rank bits of a splitmix64 hash; the
estimator is deterministic for fixed input content (no RNG), so the op is
retry-stable like every other kernel here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# 2^0 .. 2^63 (uint64): bit_length(v) == #entries <= v via searchsorted
_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def _hash64_bytes(col: pa.Array) -> np.ndarray:
    """splitmix64 of each value's canonical byte form (string cast)."""
    from .dedup import _varbytes, content_hash64

    concat, offsets = _varbytes(col.cast(pa.large_binary()) if not pa.types.is_binary(col.type) else col)
    return content_hash64(concat, offsets)


def hll_partial(col: pa.Array, p: int = 12) -> np.ndarray:
    """2^p uint8 registers for one batch of values (nulls ignored)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        col = col.drop_null()
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(col) == 0:
        return regs
    bucket, rank = _hashes_and_ranks(col, p)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for q in parts[1:]:
        np.maximum(out, q, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with small/large-range corrections."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    elif est > (1 << 64) / 30.0:
        est = -(2.0**64) * np.log1p(-est / 2.0**64)
    return float(est)


def _hashes_and_ranks(col: pa.Array, p: int):
    """(bucket, rank) arrays for one value column — shared by the grouped
    and ungrouped partials."""
    if pa.types.is_integer(col.type):
        from ..codecs.hashmix import splitmix64_mix

        h = splitmix64_mix(col.to_numpy(zero_copy_only=False).astype(np.uint64))
    else:
        h = _hash64_bytes(col.cast(pa.string()))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # leading zeros via INTEGER bit-length (searchsorted over a pow2
    # table, the intcodec _exact_bit_width trick): float log2 drifts in
    # the last ulp near powers of two — rest >= 2^64 - 2^10 rounded up to
    # top=64, rank 0, silently dropping the value (same float-drift class
    # the ANN oracle fix 7732c6a hardened against)
    bitlen = np.searchsorted(_POW2, rest, side="right")  # 0..64
    lz = 64 - bitlen  # rest == 0 -> 64, clamped by the cap below
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    return bucket, rank


def approx_distinct(ds, col: str, group_col: str | None = None, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col) [per group_col] over a Dataset.

    Partial registers per (batch, group) inside map_batches; the grouped
    path is one scatter-max into a flat (group x 2^p) register matrix —
    no per-group Python, any group cardinality.  The driver merges
    O(groups x 2^p) bytes of registers — never the keys."""
    def partial(t: pa.Table) -> pa.Table:
        if group_col is None:
            return pa.table(
                {
                    "g": pa.array([""]),
                    "regs": pa.array([hll_partial(t.column(col), p).tobytes()], pa.binary()),
                }
            )
        gcol = t.column(group_col)
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
        # group keys are reported as strings; canonicalize here so null
        # groups survive (null dictionary indices would become NaN ->
        # garbage int64 scatter targets)
        gcol = pa.compute.fill_null(gcol.cast(pa.string()), "__null__")
        vcol = t.column(col)
        vcol = vcol.combine_chunks() if isinstance(vcol, pa.ChunkedArray) else vcol
        if vcol.null_count:
            keep = pa.compute.is_valid(vcol)
            gcol, vcol = gcol.filter(keep), vcol.filter(keep)
        import pyarrow.compute as pc

        genc = pc.dictionary_encode(gcol)
        genc = genc.combine_chunks() if isinstance(genc, pa.ChunkedArray) else genc
        gidx = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = [str(x) for x in genc.dictionary.to_pylist()]
        m = 1 << p
        regs = np.zeros((len(names), m), dtype=np.uint8)
        if len(vcol):
            bucket, rank = _hashes_and_ranks(vcol, p)
            np.maximum.at(regs.reshape(-1), gidx * m + bucket, rank)
        return pa.table(
            {
                "g": pa.array(names),
                "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    merged: dict[str, np.ndarray] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for g, rb in zip(b.column("g").to_pylist(), b.column("regs").to_pylist()):
            r = np.frombuffer(rb, np.uint8)
            if g in merged:
                np.maximum(merged[g], r, out=merged[g])
            else:
                merged[g] = r.copy()
    keys = sorted(merged)
    return pa.table(
        {
            "group": pa.array(keys),
            "approx_distinct": pa.array([int(round(hll_estimate(merged[k]))) for k in keys]),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — distributed approximate frequency / heavy hitters.
# Cormode & Muthukrishnan 2005: d x w counter matrix; add = scatter-add on
# d row-keyed hashes; point estimate = min over rows (always >= truth,
# over by <= e/w * N with prob 1 - e^-d).  The Ray Data shape mirrors the
# HLL above: fixed-size per-batch partials inside map_batches, merge by
# element-wise SUM (counts are additive), O(d x w x 8 B) driver traffic
# regardless of row count or key cardinality.

CMS_D = 4
_CMS_ROW_KEYS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _cms_hashes(col: pa.Array, w: int) -> np.ndarray:
    """(d, n) bucket matrix for one value column (nulls dropped)."""
    from ..codecs.hashmix import splitmix64_mix

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        col = col.drop_null()
    if pa.types.is_integer(col.type):
        base = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        base = _hash64_bytes(col.cast(pa.string()))
    rows = []
    with np.errstate(over="ignore"):
        for k in _CMS_ROW_KEYS:
            rows.append((splitmix64_mix(base ^ np.uint64(k)) % np.uint64(w)).astype(np.int64))
    return np.stack(rows)


def cms_partial(col: pa.Array, w: int = 8192) -> np.ndarray:
    """(d, w) int64 counter partial for one batch of values."""
    regs = np.zeros((CMS_D, w), dtype=np.int64)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        col = col.drop_null()
    if len(col) == 0:
        return regs
    buckets = _cms_hashes(col, w)
    flat = regs.reshape(-1)
    off = (np.arange(CMS_D, dtype=np.int64) * w)[:, None]
    np.add.at(flat, (buckets + off).reshape(-1), 1)
    return regs


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for q in parts[1:]:
        out += q
    return out


def cms_estimate(regs: np.ndarray, col: pa.Array) -> np.ndarray:
    """Point-frequency estimates for each value in col (vectorized min
    over the d rows; always an overestimate).  Row-aligned with the
    input: null values estimate 0 — _cms_hashes drops nulls, and
    returning a shorter array silently misattributed counts to the
    wrong rows in any caller that zips estimates back onto the column."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    w = regs.shape[1]
    buckets = _cms_hashes(col, w)
    ests = np.stack([regs[i][buckets[i]] for i in range(CMS_D)])
    out = ests.min(axis=0)
    if col.null_count:
        import pyarrow.compute as pc

        full = np.zeros(len(col), dtype=out.dtype)
        full[pc.is_valid(col).to_numpy(zero_copy_only=False)] = out
        return full
    return out


# ---------------------------------------------------------------------------
# t-digest — mergeable approximate quantiles (Dunning & Ertl 2019).
# Centroids are (mean, weight) pairs built by greedy clustering of sorted
# values under the k1 scale function (tight at the tails, coarse in the
# middle).  The Ray Data shape: one fixed-size centroid list per batch
# inside map_batches, driver merges O(batches x delta) centroids and
# re-compresses once — the exact global sort (q_global_quantiles)
# disappears.  Deterministic for fixed input content (sorting + greedy),
# so retry-stable.


def _k1(q: np.ndarray, delta: int) -> np.ndarray:
    return delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))


def tdigest_partial(col, delta: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """(means, weights) centroid arrays for one batch of values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if col.null_count:
            col = col.drop_null()
        v = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
    else:
        v = np.asarray(col, np.float64)
    if v.size == 0:
        return np.empty(0), np.empty(0)
    return _compress(np.sort(v), np.ones(v.size), delta)


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right clustering of SORTED (means, weights) under
    the k1 bound.  Vectorized grouping: a new centroid starts wherever
    the running k1 span would exceed 1."""
    n = weights.sum()
    qr = np.cumsum(weights) / n  # right cumulative rank of each input
    kk = _k1(qr, delta)  # monotone nondecreasing
    # greedy grouping via searchsorted JUMPS between group boundaries:
    # each group takes every element whose k1 stays within +1 of the
    # group's left boundary — O(centroids ~ delta) iterations, not O(n)
    starts = [0]
    i = 0
    while True:
        q_left = 0.0 if i == 0 else float(qr[i - 1])
        limit = float(_k1(np.array([q_left]), delta)[0]) + 1.0
        j = int(np.searchsorted(kk, limit, side="right"))
        j = max(j, i + 1)
        if j >= kk.size:
            break
        starts.append(j)
        i = j
    idx = np.array(starts, np.int64)
    ends = np.r_[idx[1:], kk.size]
    wsum = np.add.reduceat(weights, idx)
    msum = np.add.reduceat(weights * means, idx)
    return msum / wsum, wsum


def tdigest_merge(parts: list[tuple[np.ndarray, np.ndarray]], delta: int = 200):
    kept = [p for p in parts if p[0].size]
    if not kept:  # empty dataset / all-null column: quantiles are NaN
        return np.empty(0), np.empty(0)
    means = np.concatenate([p[0] for p in kept])
    weights = np.concatenate([p[1] for p in kept])
    if means.size == 0:
        return np.empty(0), np.empty(0)
    order = np.argsort(means, kind="stable")
    return _compress(means[order], weights[order], delta)


def tdigest_quantile(digest: tuple[np.ndarray, np.ndarray], qs) -> np.ndarray:
    """Interpolated quantile estimates from a (means, weights) digest."""
    means, weights = digest
    qs = np.atleast_1d(np.asarray(qs, np.float64))
    if means.size == 0:
        return np.full(qs.size, np.nan)
    cw = np.cumsum(weights) - weights / 2.0  # centroid mid-ranks
    total = weights.sum()
    return np.interp(qs * total, cw, means, left=means[0], right=means[-1])


def approx_quantiles(ds, col: str, qs, delta: int = 200) -> pa.Table:
    """Approximate quantiles of ds[col] via per-batch t-digest partials."""
    def partial(t: pa.Table) -> pa.Table:
        m, w = tdigest_partial(t.column(col), delta)
        return pa.table(
            {
                "means": pa.array([m.tobytes()], pa.large_binary()),
                "weights": pa.array([w.tobytes()], pa.large_binary()),
            }
        )

    parts = []
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for mb, wb in zip(b.column("means").to_pylist(), b.column("weights").to_pylist()):
            parts.append((np.frombuffer(mb, np.float64), np.frombuffer(wb, np.float64)))
    digest = tdigest_merge(parts, delta)
    est = tdigest_quantile(digest, qs)
    return pa.table(
        {
            "q": pa.array(np.atleast_1d(np.asarray(qs, np.float64))),
            "value_est": pa.array(est),
        }
    )


def approx_group_quantiles(ds, group_col: str, val_col: str, qs, delta: int = 200) -> pa.Table:
    """Approximate quantiles PER GROUP via t-digest partials — the
    sketch alternative to the exact per-group sort path
    (q_group_quantiles).  Each batch emits one <=delta-centroid digest
    per group present (a per-GROUP loop over pre-grouped slices, not a
    per-row loop); the driver merges O(groups x batches) fixed-size
    digests.  Driver memory is O(groups x delta) — suited to bounded
    group domains (event types, sources); an unbounded-group variant
    would shuffle digests with agg_by_keys first."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        gcol = t.column(group_col)
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
        if gcol.null_count:  # null groups are dropped, like SQL GROUP BY+WHERE g IS NOT NULL
            keep = pc.is_valid(gcol)
            t = t.filter(keep)
            gcol = t.column(group_col).combine_chunks() if isinstance(t.column(group_col), pa.ChunkedArray) else t.column(group_col)
        gtype = gcol.type
        if t.num_rows == 0:
            return pa.table(
                {"g": pa.array([], gtype), "means": pa.array([], pa.large_binary()),
                 "weights": pa.array([], pa.large_binary())}
            )
        # one dictionary-encode + one argsort pre-groups the batch; each
        # group is then a contiguous SLICE (no per-group full-column scan)
        enc = pc.dictionary_encode(gcol)
        enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        vals = t.column(val_col).take(pa.array(order))
        sc = codes[order]
        bounds = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.r_[bounds[1:], sc.size]
        out_g, out_m, out_w = [], [], []
        for b0, b1 in zip(bounds, ends):
            m, w = tdigest_partial(vals.slice(int(b0), int(b1 - b0)), delta)
            out_g.append(enc.dictionary[int(sc[b0])].as_py())
            out_m.append(m.tobytes())
            out_w.append(w.tobytes())
        return pa.table(
            {
                "g": pa.array(out_g, gtype),
                "means": pa.array(out_m, pa.large_binary()),
                "weights": pa.array(out_w, pa.large_binary()),
            }
        )

    merged: dict[str, list] = {}
    gtype_seen = None
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if gtype_seen is None and b.num_rows:
            gtype_seen = b.column("g").type
        for g, mb, wb in zip(
            b.column("g").to_pylist(), b.column("means").to_pylist(), b.column("weights").to_pylist()
        ):
            merged.setdefault(g, []).append(
                (np.frombuffer(mb, np.float64), np.frombuffer(wb, np.float64))
            )
    qs_arr = np.atleast_1d(np.asarray(qs, np.float64))
    rows_g, rows_q, rows_v = [], [], []
    for g in sorted(merged):
        d = tdigest_merge(merged[g], delta)
        est = tdigest_quantile(d, qs_arr)
        for q, e in zip(qs_arr, est):
            rows_g.append(g)
            rows_q.append(float(q))
            rows_v.append(float(e))
    return pa.table(
        {
            # the source group type ALWAYS (inference drifted int32->int64
            # and gave a null-typed column when no group survived)
            "group": pa.array(rows_g, gtype_seen),
            "q": pa.array(rows_q, pa.float64()),
            "value_est": pa.array(rows_v, pa.float64()),
        }
    )
