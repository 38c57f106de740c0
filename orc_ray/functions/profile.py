"""One-pass table profiling — the data-quality summary every ingest
pipeline runs before training: per-column row/null counts, min/max,
exact integer-scaled mean, and an HLL approximate distinct count, all
from ONE streaming pass.

Ray Data shape: each batch reduces to one fixed-size row PER COLUMN
(counts + extrema + cents-sum + 2^p-byte HLL registers) inside
``map_batches``; the driver merges O(columns x batches) tiny rows —
never data.  Mean uses the repo's exact-integer pattern (cents sums, so
the result is independent of addition order — no float-ULP drift vs the
SQL oracle); distinct is the HLL sketch from functions/sketch.py.

The min/max/null-count surface mirrors the reference's file-level
ColumnStatistics rollup (SURVEY.md §2.5), lifted from per-chunk manifest
entries to a user-facing operator over any decoded stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import hll_estimate, hll_partial

_HLL_P = 12


def _round_half_away(x: float) -> int:
    """SQL ROUND(): half away from zero; np.rint's half-even and plain
    floor(x+0.5) (half-up) both diverge on negatives."""
    return int(np.sign(x) * np.floor(abs(x) + 0.5))


def profile_partial(t: pa.Table, cols: list[str]) -> pa.Table:
    """One profile row per column for one batch."""
    rows = {
        "col": [],
        "n": [],
        "nulls": [],
        "vmin": [],
        "vmax": [],
        "sum_cents": [],
        "regs": [],
    }
    for c in cols:
        col = t.column(c)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        nulls = col.null_count
        valid = col.drop_null() if nulls else col
        rows["col"].append(c)
        rows["n"].append(len(valid))
        rows["nulls"].append(nulls)
        if len(valid):
            v = valid.cast(pa.float64()).to_numpy(zero_copy_only=False)
            rows["vmin"].append(float(v.min()))
            rows["vmax"].append(float(v.max()))
            rows["sum_cents"].append(int(np.rint(v * 100).astype(np.int64).sum()))
        else:
            rows["vmin"].append(None)
            rows["vmax"].append(None)
            rows["sum_cents"].append(0)
        rows["regs"].append(hll_partial(valid, _HLL_P).tobytes())
    return pa.table(
        {
            "col": pa.array(rows["col"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "vmin": pa.array(rows["vmin"], pa.float64()),
            "vmax": pa.array(rows["vmax"], pa.float64()),
            "sum_cents": pa.array(rows["sum_cents"], pa.int64()),
            "regs": pa.array(rows["regs"], pa.large_binary()),
        }
    )


def profile_numeric(ds, cols: list[str]) -> pa.Table:
    """Profile ``cols`` of a Dataset: one output row per column with
    n / nulls / min_e6 / max_e6 / mean_e6 (exact, integer-arithmetic)
    and approx_distinct (HLL).  Column order follows ``cols``."""
    import functools

    parts = [
        b
        for b in ds.map_batches(
            functools.partial(profile_partial, cols=cols),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    all_t = pa.concat_tables(parts).combine_chunks()
    out = {k: [] for k in ("col", "n", "nulls", "min_e6", "max_e6", "mean_e6", "approx_distinct")}
    for c in cols:
        sub = all_t.filter(pc.equal(all_t.column("col"), c))
        n = int(pc.sum(sub.column("n")).as_py() or 0)
        nulls = int(pc.sum(sub.column("nulls")).as_py() or 0)
        sum_cents = int(pc.sum(sub.column("sum_cents")).as_py() or 0)
        vmin = pc.min(sub.column("vmin")).as_py()
        vmax = pc.max(sub.column("vmax")).as_py()
        regs = None
        for rb in sub.column("regs").to_pylist():
            r = np.frombuffer(rb, np.uint8)
            regs = r.copy() if regs is None else np.maximum(regs, r)
        out["col"].append(c)
        out["n"].append(n)
        out["nulls"].append(nulls)
        out["min_e6"].append(None if vmin is None else _round_half_away(vmin * 1e6))
        out["max_e6"].append(None if vmax is None else _round_half_away(vmax * 1e6))
        out["mean_e6"].append(None if n == 0 else _round_half_away(sum_cents * 10000.0 / n))
        out["approx_distinct"].append(0 if regs is None else int(round(hll_estimate(regs))))
    return pa.table(
        {
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "min_e6": pa.array(out["min_e6"], pa.int64()),
            "max_e6": pa.array(out["max_e6"], pa.int64()),
            "mean_e6": pa.array(out["mean_e6"], pa.int64()),
            "approx_distinct": pa.array(out["approx_distinct"], pa.int64()),
        }
    )
