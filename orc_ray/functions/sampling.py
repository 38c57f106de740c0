"""Deterministic weighted reservoir sampling (Efraimidis–Spirakis A-ES).

Fixed-size weighted sampling without RNG state: each row gets priority
``ln(u) / w`` with ``u`` a (0,1) uniform derived from md5(id) — the
equivalent of ranking by ``u^(1/w)`` — and the sample is the global
top-k by priority.  Deterministic, shard-stable, and retry-stable: the
same row set is selected no matter how batches are split or re-executed
(the same property q_hash_split / q_stratified_sample build on).

Ray Data shape: each batch emits only its local top-k (priority, id)
rows; the driver merges O(batches x k) candidates — never the data.
Priorities are reported as e9-quantized integers so the SQL oracle
(identical md5/LN/FLOOR formula in DuckDB) hash-matches without
last-ulp float ambiguity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .md5vec import md5_hex15_int  # vectorized, bit-exact vs SQL md5  # noqa: F401

_DENOM = float(1 << 60) + 1.0  # uhex in [0, 2^60): (uhex+1)/_DENOM is in (0,1)


def es_priority_e9(ids, weights: np.ndarray) -> np.ndarray:
    """e9-quantized Efraimidis–Spirakis priority ln(u)/w per row.

    Clipped to the int64-safe range: a tiny weight (below ~5e-9) pushed
    the product past int64 and the NaN/overflow astype landed on
    INT64_MIN, whose negation WRAPS back to INT64_MIN and sorts FIRST —
    silently selecting the LOWEST-probability rows.  The clip keeps the
    ordering monotone (every clipped row ties at the worst priority);
    the corpus-parity SQL mirror raises on such weights before it could
    diverge."""
    u = (md5_hex15_int(ids) + 1.0) / _DENOM
    raw = np.log(u) / np.asarray(weights, np.float64) * 1e9
    raw = np.clip(raw, -(2.0**62), 2.0**62)
    return np.floor(raw).astype(np.int64)


def _top_by_priority(t: pa.Table, k: int, payload_cols: list[str]) -> pa.Table:
    """(pri_e9 desc, id asc) top-k of an (id, pri_e9, *payload) table —
    the one place the sampler's tie-break/selection logic lives (shared
    by the per-batch and driver-merge stages)."""
    import pyarrow.compute as pc

    pri = t.column("pri_e9").to_numpy(zero_copy_only=False)
    ids = t.column("id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -pri))[:k]
    take = pa.array(order)
    cols = {"id": pc.take(t.column("id"), take), "pri_e9": pa.array(pri[order])}
    for c in payload_cols:
        cols[c] = pc.take(t.column(c), take)
    return pa.table(cols)


def weighted_sample(ds, id_col: str, weight_col: str, k: int, payload_cols: list[str] | None = None) -> pa.Table:
    """Top-k weighted sample of a Dataset: returns (id, pri_e9,
    *payload_cols) sorted by (pri_e9 desc, id asc).  Zero/null-weight
    rows have zero inclusion probability and are dropped (A-ES
    semantics); negative weights are a caller error."""
    import functools

    payload_cols = payload_cols or []

    def local_top(t: pa.Table, *, id_col, weight_col, k) -> pa.Table:
        w_all = t.column(weight_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        if np.any(w_all < 0):
            raise ValueError("weighted_sample requires non-negative weights")
        pos = ~(np.isnan(w_all) | (w_all == 0))
        if not pos.all():
            t = t.filter(pa.array(pos))
        ids = t.column(id_col)
        w = w_all[pos]
        pri = es_priority_e9(ids, w)
        idv = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        base = pa.table(
            {"id": idv, "pri_e9": pa.array(pri), **{c: t.column(c) for c in payload_cols}}
        )
        return _top_by_priority(base, k, payload_cols)

    parts = [
        b
        for b in ds.map_batches(
            functools.partial(local_top, id_col=id_col, weight_col=weight_col, k=k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not parts:
        # schema-parity with the non-empty path: the id column keeps the
        # source type and the requested payload columns are present
        sch = ds.schema().base_schema
        types = {f.name: f.type for f in sch}
        cols = {"id": pa.array([], types.get(id_col, pa.string())),
                "pri_e9": pa.array([], pa.int64())}
        for c in payload_cols:
            cols[c] = pa.array([], types.get(c, pa.string()))
        return pa.table(cols)
    return _top_by_priority(pa.concat_tables(parts).combine_chunks(), k, payload_cols)
