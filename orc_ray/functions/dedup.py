"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Classic web-scale near-dup pipeline (Broder resemblance sketches; LSH
banding as in Mining of Massive Datasets ch.3), expressed Ray-Data-first:

    map_batches(signatures)            # vectorized sketch per doc
      -> flat rows (band, bucket, id)  # shuffle keys are tiny ints
      -> groupby(bucket)               # the only all-to-all exchange
      -> candidate pairs -> union-find -> representative per cluster

Kernels are array-at-a-time: shingles come from the same rolling-uint64
window trick as the FSST matcher (codecs/fsst.py), signatures use
``np.minimum.reduceat`` over per-doc segments, SimHash uses a bit-matrix
reduceat.  The union-find runs on the driver over candidate *pairs only*
(bounded by the number of near-duplicates, not corpus size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.fsst import _rolling_keys

def _shingle_keys(concat: np.ndarray, offsets: np.ndarray, k: int = 8):
    """Per-doc sets of k-byte shingle hashes (rolling uint64 windows, doc
    boundaries masked).  Returns (hashes, seg_offsets): hashes grouped by
    doc, unique within doc."""
    n = offsets.size - 1
    keys = _rolling_keys(concat)
    lens = np.diff(offsets)
    out_parts = []
    seg_lens = np.zeros(n, dtype=np.int64)
    # windows fully inside each doc: positions offsets[i] .. offsets[i+1]-k
    counts = np.maximum(lens - k + 1, 1)  # short docs: one (masked) window
    starts = offsets[:-1]
    total = int(counts.sum())
    first_win = np.cumsum(counts) - counts
    pos = np.repeat(starts, counts) + (np.arange(total) - np.repeat(first_win, counts))
    h = keys[pos].copy()
    # windows of docs shorter than k would read the next doc's bytes —
    # mask them to the doc's own length so signatures don't depend on
    # batch neighbors (determinism across batch splits)
    short = lens < k
    if short.any():
        from ..codecs.fsst import _MASKS

        h[first_win[short]] &= _MASKS[np.minimum(lens[short], 8)]
    # mix to spread (splitmix64 finalizer)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    # unique per doc: sort within segments then drop repeats
    doc_ids = np.repeat(np.arange(n), counts)
    order = np.lexsort((h, doc_ids))
    h = h[order]
    doc_ids = doc_ids[order]
    first = np.ones(h.size, dtype=bool)
    first[1:] = (h[1:] != h[:-1]) | (doc_ids[1:] != doc_ids[:-1])
    h = h[first]
    doc_ids = doc_ids[first]
    seg_lens = np.bincount(doc_ids, minlength=n).astype(np.int64)
    seg_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(seg_lens, out=seg_off[1:])
    return h, seg_off


_EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_signature(concat: np.ndarray, offsets: np.ndarray, num_hashes: int = 128, k: int = 8) -> np.ndarray:
    """(n_docs, num_hashes) MinHash signature matrix (uint64).

    One-permutation hashing (Li/Owen/Zhang 2012) with cyclic densification:
    the hash space is split into ``num_hashes`` buckets by the top bits and
    the per-(doc, bucket) minimum is ONE vectorized scatter pass — instead
    of num_hashes full re-hash passes.  Same Jaccard-estimation guarantees,
    ~100x less memory traffic per batch."""
    h, seg_off = _shingle_keys(concat, offsets, k)
    n = seg_off.size - 1
    counts = np.diff(seg_off)
    doc_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    nb = int(num_hashes).bit_length() - 1
    assert (1 << nb) == num_hashes, "num_hashes must be a power of two"
    bucket = (h >> np.uint64(64 - nb)).astype(np.int64)
    sig = np.full((n, num_hashes), _EMPTY_SLOT, dtype=np.uint64)
    np.minimum.at(sig, (doc_ids, bucket), h)
    # cyclic densification: empty buckets borrow the next non-empty value
    for s in range(1, num_hashes):
        empty = sig == _EMPTY_SLOT
        if not empty.any():
            break
        rolled = np.roll(sig, -s, axis=1)
        fill = empty & (rolled != _EMPTY_SLOT)
        sig[fill] = rolled[fill]
    return sig


def lsh_bands(sig: np.ndarray, bands: int = 32) -> np.ndarray:
    """(n_docs, bands) bucket hashes: each band hashes r = H/bands sig rows."""
    n, H = sig.shape
    r = H // bands
    with np.errstate(over="ignore"):
        out = np.zeros((n, bands), dtype=np.uint64)
        for b in range(bands):
            acc = np.full(n, np.uint64(1469598103934665603))
            for j in range(r):
                acc = (acc ^ sig[:, b * r + j]) * np.uint64(1099511628211)
            out[:, b] = acc
    return out


def simhash64(concat: np.ndarray, offsets: np.ndarray, k: int = 4) -> np.ndarray:
    """64-bit SimHash per doc: sign-aggregate the bit matrix of k-gram
    hashes (Charikar 2002).  One vectorized pass per bit (64 reduceats)
    instead of materializing the full shingles x 64 matrix."""
    h, seg_off = _shingle_keys(concat, offsets, k)
    n = seg_off.size - 1
    counts = np.diff(seg_off)
    nonempty = counts > 0
    starts = seg_off[:-1][nonempty]
    out_bits = np.zeros((n, 64), dtype=np.uint8)
    if starts.size:
        half = counts[nonempty].astype(np.int64)
        for b in range(64):
            ones = (h >> np.uint64(b)) & np.uint64(1)
            per_doc = np.add.reduceat(ones.astype(np.int64), starts)
            out_bits[nonempty, 63 - b] = (2 * per_doc > half).astype(np.uint8)
    return np.packbits(out_bits, axis=1).view(">u8").ravel().astype(np.uint64)


def jaccard_pairs(concat: np.ndarray, offsets: np.ndarray, pairs: np.ndarray, k: int = 8) -> np.ndarray:
    """Exact k-shingle Jaccard for candidate (i, j) index pairs."""
    h, seg_off = _shingle_keys(concat, offsets, k)
    sets = [h[seg_off[i] : seg_off[i + 1]] for i in range(seg_off.size - 1)]  # sorted
    out = np.empty(len(pairs), dtype=np.float64)
    for t, (i, j) in enumerate(pairs):
        a, b = sets[int(i)], sets[int(j)]
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        out[t] = inter / union if union else 1.0
    return out


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical representative: smaller id wins (deterministic)
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def _varbytes(text_col) -> tuple[np.ndarray, np.ndarray]:
    arr = text_col.combine_chunks() if isinstance(text_col, pa.ChunkedArray) else text_col
    arr = arr.cast(pa.large_binary())
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int64, len(arr) + 1, arr.offset * 8)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lo = int(off[0])
    return np.ascontiguousarray(data[lo : int(off[-1])]), (off - lo).astype(np.int64)


class MinHashStage:
    """map_batches stage: text column -> (id, band, bucket) rows for the
    LSH groupby shuffle."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", num_hashes: int = 128, bands: int = 32, k: int = 8):
        self.id_col, self.text_col = id_col, text_col
        self.num_hashes, self.bands, self.k = num_hashes, bands, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        concat, offsets = _varbytes(batch.column(self.text_col))
        sig = minhash_signature(concat, offsets, self.num_hashes, self.k)
        buckets = lsh_bands(sig, self.bands)
        n = batch.num_rows
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # band-major layout: [ids, ids, ...] x bands
        return pa.table(
            {
                "doc_id": pa.concat_arrays([ids] * self.bands),
                "band": pa.array(np.repeat(np.arange(self.bands), n)),
                "bucket": pa.array(buckets.T.reshape(-1).view(np.int64)),
            }
        )


def dedup_minhash(ds, id_col="doc_id", text_col="text", num_hashes=128, bands=32, k=8):
    """Near-dup clustering: returns an arrow Table (doc_id, cluster_rep).

    Shuffle cost: the groupby moves only (id, band, bucket) triples.
    Union-find runs driver-side over multi-member buckets only.
    """
    import ray

    stage = MinHashStage(id_col, text_col, num_hashes, bands, k)
    triples = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def bucket_groups(g: pa.Table) -> pa.Table:
        ids = sorted(set(g.column("doc_id").to_pylist())) if g.num_rows >= 2 else []
        if len(ids) < 2:
            return pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type)})
        rep = ids[0]
        return pa.table({"a": pa.array([rep] * (len(ids) - 1), id_type), "b": pa.array(ids[1:], id_type)})

    pairs = triples.groupby(["band", "bucket"]).map_groups(bucket_groups, batch_format="pyarrow")
    edges = pairs.to_arrow_refs()
    uf = _UnionFind()
    for ref in edges:
        t = ray.get(ref)
        # empty blocks may bypass the map_groups UDF and keep the input schema
        if t.num_rows == 0 or "a" not in t.column_names:
            continue
        for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist()):
            uf.union(a, b)
    members = sorted(uf.parent)
    return pa.table(
        {
            "doc_id": pa.array(members, id_type),
            "cluster_rep": pa.array([uf.find(m) for m in members], id_type),
        }
    )
