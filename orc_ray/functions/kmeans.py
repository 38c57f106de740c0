"""Distributed k-means (Lloyd iterations) over an embedding column.

The clustering loop every IVF/compression/codebook pipeline needs:
assignment and centroid-update both run inside ``map_batches`` — each
batch does ONE matmul against the broadcast centroid matrix (assignment)
and one scatter-add of its vectors per assigned cluster (partial sums),
so the driver merges O(k x dim) floats per batch and the embedding
payload never leaves its block.  Initialization is deterministic
(first-k-by-id seeding), making every run and every retry bit-identical
— the same retry-stability contract as the rest of the engine.

Convergence: stop when the centroid matrix is fixed to within 1e-12
(componentwise) or after ``max_iters`` — assignment stability follows
except for exact argmin ties, which both this and the reference kernel
break identically (lowest cluster id wins in ``argmin``).

For 10^12-scale inputs the per-iteration cost is one pass over the
data; k-means|| style oversampled init is the documented upgrade for
faster convergence on adversarial data.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .similarity import drop_invalid_embeddings


def _embed_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t.column(col).combine_chunks()
    off = arr.offsets.to_numpy()
    off = off - off[0]
    vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    lens = np.diff(off)
    if lens.size == 0:
        return np.zeros((0, 0))
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError("ragged embedding column")
    return vals.reshape(-1, d)


def kmeans(ds, col: str, k: int, max_iters: int = 20, id_col: str | None = None,
           stats_out: dict | None = None):
    """Lloyd k-means over ds[col] (list<float>, fixed dim).

    Returns (centroids ndarray [k, dim], assign_fn) where assign_fn maps
    an embedding matrix to cluster ids — usable as a broadcast-probe
    stage.  Deterministic: seeds are the k vectors with the smallest
    ``id_col``; pass an id column for cross-run determinism (with
    id_col=None, per-batch positional ids are used, which depends on the
    dataset's block layout).  ``stats_out`` receives
    {"inertia": [per-iteration assignment SSE, ...]} — Lloyd guarantees
    the sequence is non-increasing, which callers assert as the
    convergence self-check.
    """
    import ray

    # --- deterministic seeding: k smallest-id vectors
    def seed_rows(t: pa.Table) -> pa.Table:
        t = drop_invalid_embeddings(t, col)
        x = _embed_matrix(t, col)
        if x.shape[0] == 0:
            return pa.table({"sid": pa.array([], pa.int64()), "vec": pa.array([], pa.large_binary())})
        if id_col is not None:
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            ids = np.arange(x.shape[0], dtype=np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                "sid": pa.array(ids[order]),
                "vec": pa.array([x[i].tobytes() for i in order], pa.large_binary()),
            }
        )

    parts = [
        b
        for b in ds.map_batches(seed_rows, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    ]
    cand = pa.concat_tables(parts)
    sids = cand.column("sid").to_numpy(zero_copy_only=False)
    order = np.argsort(sids, kind="stable")[:k]
    cents = np.stack(
        [np.frombuffer(cand.column("vec")[int(i)].as_py(), np.float64) for i in order]
    )

    def partial(t: pa.Table, *, cref) -> pa.Table:
        c = ray.get(cref)
        t = drop_invalid_embeddings(t, col)
        x = _embed_matrix(t, col)
        if x.shape[0] == 0:
            return pa.table(
                {
                    "cid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.large_binary()),
                    "d2s": pa.array([], pa.float64()),
                }
            )
        # assignment: one matmul + argmin of squared distance
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        a = d2.argmin(1)
        kk, dim = c.shape
        sums = np.zeros((kk, dim))
        np.add.at(sums, a, x)
        cnt = np.bincount(a, minlength=kk).astype(np.int64)
        # per-cluster assignment SSE partial (clamped: cancellation in the
        # expanded form can dip epsilon-negative) — O(k) floats per batch
        d2min = np.maximum(d2[np.arange(a.size), a], 0.0)
        sse = np.zeros(kk)
        np.add.at(sse, a, d2min)
        return pa.table(
            {
                "cid": pa.array(np.arange(kk, dtype=np.int64)),
                "n": pa.array(cnt),
                "vsum": pa.array([sums[i].tobytes() for i in range(kk)], pa.large_binary()),
                "d2s": pa.array(sse),
            }
        )

    for _ in range(max_iters):
        cref = ray.put(cents)
        rows = [
            b
            for b in ds.map_batches(
                functools.partial(partial, cref=cref), batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows
        ]
        allr = pa.concat_tables(rows)
        if stats_out is not None:
            stats_out.setdefault("inertia", []).append(
                float(allr.column("d2s").to_numpy(zero_copy_only=False).sum())
            )
        cid = allr.column("cid").to_numpy(zero_copy_only=False)
        n = allr.column("n").to_numpy(zero_copy_only=False)
        tot = np.zeros(cents.shape)
        totn = np.zeros(cents.shape[0], np.int64)
        for c_i, n_i, vb in zip(cid, n, allr.column("vsum").to_pylist()):
            tot[c_i] += np.frombuffer(vb, np.float64)
            totn[c_i] += n_i
        new = np.where(totn[:, None] > 0, tot / np.maximum(totn, 1)[:, None], cents)
        if np.allclose(new, cents, rtol=0, atol=1e-12):
            cents = new
            break
        cents = new

    def assign_fn(x: np.ndarray) -> np.ndarray:
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
        return d2.argmin(1)

    return cents, assign_fn


def kmeans_step_exact(ds, col: str, k: int, id_col: str):
    """ONE Lloyd assignment step in EXACT integer arithmetic — the
    oracle-checkable k-means mirror (r3 verdict item 8).

    Vectors are e6-floor quantized to int64 (the embedding_moments
    precedent), seeds are the k vectors with the smallest ``id_col``,
    and squared distances are exact int64 sums (|q| <= ~2^20, dim <= 64
    -> d2 < 2^47), so the argmin (ties to the smallest seed id) and the
    per-cluster aggregates are bit-identical to the SQL mirror.  Per
    batch: one (n, k, dim) int64 distance reduction + k partial rows;
    the driver merges O(k x batches) rows.  Returns
    (cluster=seed id, n_members, coord_sum) sorted by cluster.
    """
    import pyarrow.compute as pc
    import ray

    def members_and_mask(t: pa.Table):
        """UNNEST semantics: a NULL list has no rows at all (the vector is
        not a member); a null ELEMENT stays a member with that dimension
        masked out of every SUM it touches.  Returns the member rows'
        (e6-quantized matrix with masked dims zeroed, 0/1 dim mask, ids)."""
        arr = t.column(col).combine_chunks()
        if arr.null_count:
            t = t.filter(pc.is_valid(arr))
            arr = t.column(col).combine_chunks()
        if t.num_rows == 0:
            return np.zeros((0, 0), np.int64), np.zeros((0, 0), np.int64), np.zeros(0, np.int64)
        flat = arr.flatten()
        d = len(flat) // t.num_rows
        valid = (np.ones(len(flat), bool) if flat.null_count == 0
                 else pc.is_valid(flat).to_numpy(zero_copy_only=False))
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        qx = np.floor(np.where(valid, vals, 0.0) * 1_000_000.0).astype(np.int64)
        qx[~valid] = 0
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return qx.reshape(-1, d), valid.astype(np.int64).reshape(-1, d), ids

    # --- deterministic seeds: k smallest-id rows of the TABLE (a null-list
    # seed still occupies a LIMIT k slot but is inert — it has no q rows,
    # so no distance ever selects it), O(k x batches) driver rows
    def seed_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sid": pa.array([], pa.int64()), "vec": pa.array([], pa.large_binary()),
                 "msk": pa.array([], pa.large_binary())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        sub = t.take(pa.array(order))
        qx, msk, sub_ids = members_and_mask(sub)
        live = set(sub_ids.tolist())
        vecs, msks = [], []
        j = 0
        for i in order:
            if int(ids[i]) in live:
                vecs.append(qx[j].tobytes())
                msks.append(msk[j].tobytes())
                j += 1
            else:
                vecs.append(None)
                msks.append(None)
        return pa.table(
            {
                "sid": pa.array(ids[order]),
                "vec": pa.array(vecs, pa.large_binary()),
                "msk": pa.array(msks, pa.large_binary()),
            }
        )

    parts = [
        b
        for b in ds.map_batches(
            seed_rows, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    cand = pa.concat_tables(parts)
    sids = cand.column("sid").to_numpy(zero_copy_only=False)
    order = np.argsort(sids, kind="stable")[:k]
    live = [i for i in order if cand.column("vec")[int(i)].as_py() is not None]
    if not live:  # every seed slot is a NULL list: no distances, empty result
        return pa.table(
            {"cluster": pa.array([], pa.int64()), "n_members": pa.array([], pa.int64()),
             "coord_sum": pa.array([], pa.int64())}
        )
    seed_ids = sids[live]
    cents = np.stack(
        [np.frombuffer(cand.column("vec")[int(i)].as_py(), np.int64) for i in live]
    )
    cmask = np.stack(
        [np.frombuffer(cand.column("msk")[int(i)].as_py(), np.int64) for i in live]
    )
    cref = ray.put((seed_ids, cents, cmask))

    def partial(t: pa.Table, *, cref) -> pa.Table:
        seed_ids, c, cm = ray.get(cref)
        qx, mx, _ids = members_and_mask(t)
        if qx.shape[0] == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                    "coord_sum": pa.array([], pa.int64()),
                }
            )
        # exact integer squared distances over jointly-observed dims only
        # (a null element on EITHER side nulls that term in the SQL SUM):
        # sum mx*cm*(q-s)^2 = q^2@cm.T + mx@(s^2).T - 2 q@s.T with the
        # masked entries already zeroed in qx / c.  Argmin ties -> first
        # (seed ids are ascending, matching ORDER BY d2, cid).
        d2 = (qx * qx) @ cm.T + mx @ (c * c).T - 2 * (qx @ c.T)
        a = np.argmin(d2, axis=1)
        rowsum = qx.sum(axis=1)  # SUM(qv) skips masked dims (zeroed)
        n = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
        # integer scatter-add (bincount weights would round through
        # float64; the oracle contract is exact int sums)
        s = np.zeros(c.shape[0], np.int64)
        np.add.at(s, a, rowsum)
        return pa.table(
            {
                "cluster": pa.array(seed_ids),
                "n_members": pa.array(n),
                "coord_sum": pa.array(s),
            }
        )

    out = [
        b
        for b in ds.map_batches(
            functools.partial(partial, cref=cref), batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    merged = pa.concat_tables(out).group_by("cluster").aggregate(
        [("n_members", "sum"), ("coord_sum", "sum")]
    )
    merged = merged.rename_columns(["cluster", "n_members", "coord_sum"])
    merged = merged.sort_by("cluster")
    import pyarrow.compute as pc

    return merged.filter(pc.greater(merged.column("n_members"), 0))
