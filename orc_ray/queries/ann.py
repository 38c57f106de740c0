"""Embedding + search queries: ANN stores, k-means, BM25, hybrid retrieval, clustering.

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
from .tpch import _month_id_from_epoch_us
from ..pipeline.decode import decode_dataset
from ..pipeline.encode import encode_dataset
from ._shared import CACHE_ROOT, _decoded, _to_table, store_for


def _query_vec(sf_dir: str, vec_id: int = 0, dtype=np.float64) -> np.ndarray:
    """Fetch ONE query embedding with a column-projected + row-filtered
    parquet read: only the matching row group's two columns leave storage,
    never the whole table (RowReaderOptions.include + sargs analog,
    SURVEY.md §2.5).  Shared by every ANN query so no unpruned driver-side
    read can creep back in."""
    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    vec = emb.column("embedding")[0].as_py() if emb.num_rows else None
    if vec is None or any(e is None for e in vec):
        # a NULL (or null-element) vector defines no similarity ordering;
        # callers that REQUIRE this exact id fail loudly, probe loops skip
        if vec_id == 0:
            raise ValueError(f"query vector vec_id={vec_id} is NULL or has null elements")
        return None
    return np.array(vec, dtype)


def q_ann_topk(sf_dir: str):
    """Exact cosine top-10 around the vec_id=0 embedding, through the
    engine-decoded embeddings stream; float64 math to match the oracle.

    The compared value is rounded to e4 and BOTH engines rank by the
    rounded value: numpy's blocked matmul and the oracle's sequential
    dot product can differ in the last ulp, which at e6 precision landed
    on a .5 rounding knife-edge (seen at sf0.001)."""
    from ..functions.similarity import topk_cosine

    q = _query_vec(sf_dir, 0, np.float64)
    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    t = topk_cosine(ds, q, k=32, dtype=np.float64)  # headroom for e4 ties
    sim_e4 = np.rint(t.column("sim").to_numpy() * 1e4).astype(np.int64)
    vid = t.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sim_e4))[:10]
    return pa.table(
        {
            "vec_id": pa.array(vid[order]),
            "sim_e4": pa.array(sim_e4[order]),
        }
    )


def q_ann_topk_int8(sf_dir: str):
    """Int8-quantized cosine top-10 — the 4x-smaller scale path beside
    the exact float q_ann_topk: unit vectors quantize to int8 codes
    (q = round(127 v/||v||)) and scores are EXACT int32 code dots, so
    the whole pipeline is integer-deterministic; approximation lives
    only in the quantization grid.  Rows-only gate (the grid is not
    SQL), hardened by an in-query recall assert vs the exact float
    top-k over the same decoded stream (measured 1.0 at sf0.001/sf0.01
    on 64-dim embeddings; floor 0.8 catches a grid/packing regression
    while tolerating genuine knife-edge neighbours)."""
    from ..functions.similarity import topk_cosine, topk_cosine_int8

    q = _query_vec(sf_dir, 0, np.float64)
    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    t = topk_cosine_int8(ds, q, k=10)
    exact = topk_cosine(ds, q.astype(np.float64), k=10, dtype=np.float64)
    got = set(t.column("vec_id").to_pylist())
    want = set(exact.column("vec_id").to_pylist())
    recall = len(got & want) / max(len(want), 1)
    assert recall >= 0.8, (recall, sorted(got), sorted(want))
    return t.select(["vec_id", "dot"])


def ivf_store_for(sf_dir: str, n_clusters: int = 8) -> str:
    """Build (once, cached) the IVF-partition-sorted chunk store for the
    embeddings table — chunks cover narrow partition ranges, so probes
    prune via manifest stats instead of scanning everything."""
    from ..functions.similarity import build_ivf_store

    from ..chunk import FORMAT_VERSION

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}|ivf{n_clusters}|v{FORMAT_VERSION}".encode()
    ).hexdigest()[:10]
    out = os.path.join(CACHE_ROOT, f"ivf-{key}")
    marker = os.path.join(out, "_ivf_done")
    n_rows = pq.read_metadata(src).num_rows
    ok = False
    if os.path.exists(marker):
        with open(marker) as f:
            ok = f.read() == str(n_rows)  # validate, don't just trust
    if not ok:
        # wipe first: a partial prior build would otherwise leave manifest
        # parts beside the new ones and double every decoded row
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        # aim for ~2 chunks per partition so probe pruning has granularity
        bs = max(256, min(4096, n_rows // (2 * n_clusters)))
        build_ivf_store(src, out, n_clusters=n_clusters, batch_size=bs)
        with open(marker, "w") as f:
            f.write(str(n_rows))
    return out


def _assert_recall(approx: pa.Table, sf_dir: str, q: np.ndarray, k: int, floor: float) -> None:
    """In-query recall self-assert for the approximate ANN paths: compare
    against the exact brute-force top-k over the same decoded stream (the
    already-proved topk_cosine operator — one broadcast-matmul pass, no
    driver materialization) and fail loudly below ``floor``.  The check is
    what keeps the rows-only driver gate honest: a store-layout or probe
    regression can't silently return plausible-but-wrong neighbours."""
    from ..functions.similarity import topk_cosine

    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = topk_cosine(ds, q.astype(np.float64), k=k, dtype=np.float64)
    exact_ids = set(exact.column("vec_id").to_pylist())
    got = set(approx.column("vec_id").to_pylist())
    recall = len(got & exact_ids) / k
    assert recall >= floor, (recall, floor, sorted(got), sorted(exact_ids))


def _assert_mean_recall(probe, sf_dir: str, k: int, floor: float, vids=(0, 1, 2, 3, 4)) -> None:
    """Mean recall@k over several probe vectors vs the exact top-k — a
    statistically tighter self-assert than any single-query floor (one
    lucky query can mask a systematic recall regression; the mean over 5
    cannot).  ``probe`` maps a float32 query vector to a vec_id table.
    Measured means on the fixture corpus: IVF 0.74-0.78, LSH 0.74-0.80
    at sf0.001/sf0.01 — floor 0.6 catches any drop toward random-bucket
    behaviour (~0.1) or a halved recall, with safe margin."""
    from ..functions.similarity import topk_cosine

    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    total, used = 0.0, 0
    for vid in vids:
        q = _query_vec(sf_dir, vid, np.float32)
        if q is None:  # a NULL stored vector is not a usable probe
            continue
        exact = set(
            topk_cosine(ds, q.astype(np.float64), k=k, dtype=np.float64).column("vec_id").to_pylist()
        )
        got = set(probe(q).column("vec_id").to_pylist())
        total += len(got & exact) / k
        used += 1
    assert used, "no valid probe vectors"
    mean = total / used
    assert mean >= floor, (mean, floor)


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-10 through the partition-pruned chunk store
    (no oracle: approximate; recall vs the exact top-k is asserted
    in-query)."""
    from ..functions.similarity import topk_cosine_ivf_store

    q = _query_vec(sf_dir, 0, np.float32)
    store = ivf_store_for(sf_dir, n_clusters=8)
    t, kept, total = topk_cosine_ivf_store(store, q, k=10, nprobe=4)
    assert kept < total or total <= 4, (kept, total)  # pruning must bite
    out = t.select(["vec_id", "sim"])
    _assert_recall(out, sf_dir, q, k=10, floor=0.7)
    _assert_mean_recall(
        lambda qv: topk_cosine_ivf_store(store, qv, k=10, nprobe=4)[0], sf_dir, k=10, floor=0.6
    )
    return out


def lsh_store_for(sf_dir: str, n_bits: int = 6) -> str:
    """Build (once, cached) the LSH-bucket-sorted chunk store for the
    embeddings table — the training-free bucketed ANN path."""
    from ..chunk import FORMAT_VERSION
    from ..functions.similarity import build_lsh_store

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}|lsh{n_bits}i64|v{FORMAT_VERSION}".encode()
    ).hexdigest()[:10]
    out = os.path.join(CACHE_ROOT, f"lsh-{key}")
    marker = os.path.join(out, "_lsh_done")
    n_rows = pq.read_metadata(src).num_rows
    ok = False
    if os.path.exists(marker):
        with open(marker) as f:
            ok = f.read() == str(n_rows)
    if not ok:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        bs = max(256, min(4096, n_rows // (2 * (1 << n_bits))))
        build_lsh_store(src, out, n_bits=n_bits, batch_size=bs)
        with open(marker, "w") as f:
            f.write(str(n_rows))
    return out


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate top-10 through the bucket-pruned chunk
    store (no oracle: approximate; recall vs the exact top-k is asserted
    in-query, and unit-tested with planted neighbours)."""
    from ..functions.similarity import topk_cosine_lsh_store

    q = _query_vec(sf_dir, 0, np.float32)
    store = lsh_store_for(sf_dir, n_bits=6)
    t, kept, total = topk_cosine_lsh_store(store, q, k=10, nprobe=32)
    assert kept < total or total <= 4, (kept, total)  # pruning must bite
    out = t.select(["vec_id", "sim"])
    _assert_recall(out, sf_dir, q, k=10, floor=0.5)
    _assert_mean_recall(
        lambda qv: topk_cosine_lsh_store(store, qv, k=10, nprobe=32)[0], sf_dir, k=10, floor=0.6
    )
    return out


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid sums over the list<float> column,
    e6-quantized to integers so the SQL zipped-UNNEST mirror hash-matches
    exactly (the centroid itself is sum_e6 / n downstream — kept as the
    exact integer pair here).

    Shape: per-batch scatter-add into a (labels_present x dim) int64
    matrix (two np.add.at passes over the flattened list values — no
    per-row Python), emitting O(labels x dim) partial rows per block ->
    ONE agg_by_keys over (label, dim).  At 10^12 sequences the shuffle
    moves only the tiny partials; the embedding payload never leaves its
    block."""
    from ..functions.aggregates import agg_by_keys

    ds = _decoded(sf_dir, "embeddings", columns=["embedding", "label"])

    SENT = np.int64(-(1 << 62))  # stands in for the SQL NULL label group

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        off = arr.offsets.to_numpy()
        off = off - off[0]
        flat = arr.flatten()  # null LISTS vanish here == UNNEST of NULL
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        # a null ELEMENT stays an UNNEST row: COUNT(*) counts it, the SUM
        # skips it (fill 0) — never floor(NaN) garbage
        ev = (np.ones(len(flat), bool) if flat.null_count == 0
              else pc.is_valid(flat).to_numpy(zero_copy_only=False))
        q = np.floor(np.where(ev, vals, 0.0) * 1_000_000.0).astype(np.int64)
        q[~ev] = 0
        lens = np.diff(off)
        labels = pc.fill_null(
            pc.cast(t.column("label"), pa.int64()), int(SENT)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ulab = np.unique(labels)
        lab_idx = np.searchsorted(ulab, np.repeat(labels, lens))
        dim = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], lens)
        d_max = int(lens.max()) if lens.size else 0
        mat = np.zeros((ulab.size, d_max), dtype=np.int64)
        np.add.at(mat, (lab_idx, dim), q)
        cnt = np.zeros((ulab.size, d_max), dtype=np.int64)
        np.add.at(cnt, (lab_idx, dim), 1)
        rep = np.repeat(ulab, d_max)
        isnull = rep == SENT
        return pa.table(
            {
                "label": pa.array(np.where(isnull, 0, rep).astype(np.int32), mask=isnull),
                "dim": pa.array(np.tile(np.arange(d_max), ulab.size).astype(np.int32)),
                "s": pa.array(mat.ravel()),
                "c": pa.array(cnt.ravel()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = agg_by_keys(parts, ["label", "dim"], [("s", "sum", "sum_e6"), ("c", "sum", "n")])
    return _to_table(agg).sort_by([("label", "ascending"), ("dim", "ascending")])


def q_order_clusters(sf_dir: str):
    """Connected-components cluster assignment over an order-affinity
    graph — the distributed graph-resolution operator every dedup
    pipeline ends with, run standalone with an oracle-checkable graph.

    Edge construction is fully distributed using the existing window
    machinery: LAG chains link orders within a (customer, month) group
    (with_group_lag — one range sort, O(blocks) driver carry), group
    heads star to the per-customer min order (agg_by_keys + the adaptive
    broadcast join).  The resulting multi-hop graph (monthly chains
    merged through customer stars, diameter ~5) resolves with
    functions.graph.connected_components, whose adaptive backend runs
    union-find in-process below the edge threshold and min-label
    propagation rounds above it (distributed path covered by
    tests/test_graph.py).  Label = MIN(o_orderkey) per component ==
    MIN(o_orderkey) per customer — the SQL window mirror."""
    from ..functions.aggregates import agg_by_keys, with_group_lag
    from ..functions.graph import connected_components
    from ..functions.joins import join_adaptive

    ds = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def addmonth(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # SQL window PARTITION BY puts every NULL key in ONE partition;
        # the join/star stages below use SQL join semantics (null keys
        # never match), so fold NULL custkeys to a sentinel here — custkeys
        # are positive, and only o_orderkey reaches the output.
        ck = pc.fill_null(t.column("o_custkey"), -1)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": ck,
                "month_id": pa.array(_month_id_from_epoch_us(us)),
            }
        )

    withm = ds.map_batches(addmonth, batch_format="pyarrow", zero_copy_batch=True)
    lagged = with_group_lag(
        withm, ["o_custkey", "month_id"], ["o_orderkey"], "o_orderkey", out="prev"
    ).materialize()

    def chain_edges(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("prev")))
        return pa.table({"a": sub.column("prev"), "b": sub.column("o_orderkey")})

    def head_rows(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_null(t.column("prev")))
        return pa.table({"o_custkey": sub.column("o_custkey"), "o_orderkey": sub.column("o_orderkey")})

    e1 = lagged.map_batches(chain_edges, batch_format="pyarrow", zero_copy_batch=True)
    heads = lagged.map_batches(head_rows, batch_format="pyarrow", zero_copy_batch=True)
    centers = agg_by_keys(heads, ["o_custkey"], [("o_orderkey", "min", "center")])
    starred = join_adaptive(heads, centers, "o_custkey", "o_custkey", ["center"])
    # keep self-loops (center -> itself) so single-order customers appear
    e2 = starred.map_batches(
        lambda t: pa.table({"a": t.column("center"), "b": t.column("o_orderkey")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = connected_components(e1.union(e2))
    out = _to_table(labels)
    return pa.table(
        {"o_orderkey": out.column("node"), "cluster_rep": out.column("label")}
    ).sort_by("o_orderkey")


def q_pagerank(sf_dir: str):
    """PageRank over the customer<->supplier interaction graph (edges =
    distinct (custkey, suppkey) pairs from lineitem x orders, weighted by
    interaction count, both directions) — 3 damped iterations (d=0.85) in
    EXACT int64 fixed-point (R scaled 1e9, per-edge contribution
    ``(R[u]*w) // W[u]``, damping ``(85*S) // 100``): every operation is
    an order-independent integer op, so the SQL mirror hash-matches with
    no float knife-edge.  Top-20 nodes by final rank.

    Scale shape: the EDGE dimension (the 100-TB one) is fully
    distributed — per-iteration work is one map_batches over the
    materialized edge Dataset (bounded by distinct pairs) + one
    sum_by_keys on the destination; only the O(nodes) rank/out-weight
    vectors broadcast (``ray.put`` per iteration), the standard Pregel
    split.  Past broadcastable node counts the rank vector becomes a
    hash-partitioned join side (join_adaptive's shuffle arm) — documented
    upgrade, same iteration algebra."""
    import ray as _ray

    from ..functions.aggregates import sum_by_keys
    from ..functions.joins import join_adaptive

    D_NUM, D_DEN = 85, 100           # damping 0.85 as an exact ratio
    SCALE = 1_000_000_000            # R fixed-point scale (1e9)
    BASE = (D_DEN - D_NUM) * SCALE // D_DEN  # (1-d)*SCALE = 150_000_000
    SUPP_OFF = 1_000_000             # suppliers live at key + 1e6

    li = _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = _decoded(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = join_adaptive(li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"c": t.column("o_custkey"), "s": t.column("l_suppkey")})
             .group_by(["c", "s"]).aggregate([([], "count_all")]))
        return pa.table({"c": g.column("c"), "s": g.column("s"),
                         "one": g.column("count_all").cast(pa.int64())})

    eo = sum_by_keys(joined.map_batches(pair_partial, batch_format="pyarrow",
                                        zero_copy_batch=True),
                     ["c", "s"], "one", out="w")

    NULL_NODE = -1  # sentinel for the SQL NULL customer (real keys are >= 0)

    def both_dirs(t: pa.Table) -> pa.Table:
        cc = t.column("c")
        valid = (pc.is_valid(cc).combine_chunks().to_numpy(zero_copy_only=False)
                 if cc.null_count else np.ones(t.num_rows, bool))
        c = pc.fill_null(cc, NULL_NODE).to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64) + SUPP_OFF
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        # the NULL customer RECEIVES rank (it is a join v) but its outgoing
        # edges never match e.u = r.u in SQL, so the u-side arm drops them
        return pa.table({"u": pa.array(np.concatenate([c[valid], s])),
                         "v": pa.array(np.concatenate([s[valid], c])),
                         "w": pa.array(np.concatenate([w[valid], w]))})

    edges = eo.map_batches(both_dirs, batch_format="pyarrow").materialize()

    # O(nodes) out-weights: per-block partials + ONE driver merge.  The
    # distributed sort-based sum would be a full exchange of the edge set
    # for an O(nodes)-sized answer; instead every block groups locally
    # (O(distinct u per block) rows out) and the driver reduces
    # O(nodes x blocks) tiny rows — the Pregel master-state pattern.
    # Past broadcastable node counts this (and the rank vector) becomes a
    # hash-partitioned join side — documented upgrade, same algebra.
    def outw_partial(t: pa.Table) -> pa.Table:
        g = t.select(["u", "w"]).group_by("u").aggregate([("w", "sum")])
        return pa.table({"u": g.column("u"), "wu": g.column("w_sum")})

    outw = (
        _to_table(edges.map_batches(outw_partial, batch_format="pyarrow",
                                    zero_copy_batch=True))
        .group_by("u").aggregate([("wu", "sum")])
    )
    nodes = outw.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    nodes, wu = nodes[order], outw.column("wu_sum").to_numpy(zero_copy_only=False).astype(np.int64)[order]
    r = np.full(nodes.size, SCALE, np.int64)

    for _ in range(3):
        ref = _ray.put((nodes, r, wu))

        def contrib(t: pa.Table, *, ref=ref) -> pa.Table:
            nodes, r, wu = _ray.get(ref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            i = np.searchsorted(nodes, u)
            part = (r[i] * w) // wu[i]       # exact int64, order-free
            g = (pa.table({"v": t.column("v"), "p": pa.array(part)})
                 .group_by("v").aggregate([("p", "sum")]))
            return pa.table({"v": g.column("v"), "p": g.column("p_sum")})

        # contrib already groups per block (O(distinct v per block) rows):
        # a driver-side merge of O(nodes x blocks) partials replaces a full
        # sort exchange of the edge set — one per iteration, 3 sorts saved
        sums = (
            _to_table(edges.map_batches(contrib, batch_format="pyarrow"))
            .group_by("v").aggregate([("p", "sum")])
        )
        sv = sums.column("v").to_numpy(zero_copy_only=False)
        sp = sums.column("p_sum").to_numpy(zero_copy_only=False)
        nm = sv == NULL_NODE
        # the NULL node's rank never feeds back (no matching outgoing edges)
        r_null = BASE + (D_NUM * int(sp[nm].sum())) // D_DEN if nm.any() else None
        s = np.zeros(nodes.size, np.int64)
        s[np.searchsorted(nodes, sv[~nm])] = sp[~nm]
        r = BASE + (D_NUM * s) // D_DEN

    allr, ids = r, nodes
    isnull = np.zeros(nodes.size, bool)
    if r_null is not None:
        allr = np.concatenate([r, np.array([r_null], np.int64)])
        # NULL sorts after every real id on rank ties (ORDER BY u ASC NULLS LAST)
        ids = np.concatenate([nodes, np.array([np.iinfo(np.int64).max], np.int64)])
        isnull = np.concatenate([isnull, np.array([True])])
    top = np.lexsort((ids, -allr))[:20]
    return pa.table({
        "node": pa.array([None if isnull[i] else int(ids[i]) for i in top], pa.int64()),
        "rank_e9": pa.array(allr[top]),
    })


def q_kmeans_step(sf_dir: str):
    """ONE exact-integer Lloyd assignment step (k=8) over e6-quantized
    embeddings (functions/kmeans.py kmeans_step_exact): deterministic
    smallest-vec_id seeds, exact int64 squared distances, ties to the
    smallest seed id — per-cluster member counts and coordinate sums are
    exact integers, so the cross-join + window SQL mirror hash-matches
    (the oracle-checkable face of the iterative kmeans_embeddings
    query)."""
    from ..functions.kmeans import kmeans_step_exact

    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_step_exact(ds, "embedding", k=8, id_col="vec_id")


def _bm25_index(sf_dir: str) -> str:
    """Cached BM25 index over documents (single source of the cache-key
    format for every caller)."""
    import hashlib as _hl

    from ..chunk import FORMAT_VERSION
    from ..functions.search import build_text_index

    # idx3: docmeta sorted by doc_id, distributed build stats (r4)
    key = _hl.md5(f"{os.path.abspath(sf_dir)}|bm25|idx3|v{FORMAT_VERSION}".encode()).hexdigest()[:10]
    idx = os.path.join(CACHE_ROOT, f"bm25-{key}")
    if not os.path.exists(os.path.join(idx, "stats.json")):
        build_text_index(_decoded(sf_dir, "documents", columns=["doc_id", "text"]), idx)
    return idx


def q_bm25_search(sf_dir: str):
    """Okapi BM25 keyword search ('window merge scan', top-10) over an
    inverted index that IS a chunk store: postings (token, doc_id, tf)
    are tokenized in one pass, globally sorted by token, and encoded —
    so each term lookup is a pruned decode (manifest min/max + stride
    index skip every chunk outside the term's token range, the
    SargsApplier analog applied to a search index).  Doc lengths ride a
    second store; scores are e6-quantized for the identical-formula
    DuckDB oracle.  Query cost is O(df of the query terms), not
    O(corpus); pruning is asserted in tests/test_search.py."""
    from ..functions.search import bm25_search

    return bm25_search(_bm25_index(sf_dir), ["window", "merge", "scan"], k=10)


def q_embedding_moments(sf_dir: str):
    """Per-dimension first/second moments of the embedding matrix — the
    distributed linear-algebra primitive (X / X^T X partial sums per
    batch) behind covariance, whitening, and PCA.  Values are e6-floor
    quantized FIRST (both engines), so the sums and sums-of-squares are
    EXACT integers: no float addition order anywhere, and variance is
    recoverable downstream as (n*sumsq - sum^2)/n^2 in exact rational
    arithmetic.  Per batch: one flatten + two scatter-adds into
    (dim,)-shaped partials; the driver merges O(dim x batches) rows."""
    ds = _decoded(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        off = arr.offsets.to_numpy()
        off = off - off[0]
        flat = arr.flatten()  # null LISTS vanish here == UNNEST of NULL
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        # null ELEMENT: COUNT(*) counts the UNNEST row, SUM(q)/SUM(q*q)
        # skip it — floor(NaN)->INT64_MIN previously only cancelled when
        # the null count was even (the wraparound coincidence)
        ev = (np.ones(len(flat), bool) if flat.null_count == 0
              else pc.is_valid(flat).to_numpy(zero_copy_only=False))
        q = np.floor(np.where(ev, vals, 0.0) * 1_000_000.0).astype(np.int64)
        q[~ev] = 0
        lens = np.diff(off)
        dim = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], lens)
        d_max = int(lens.max()) if lens.size else 0
        s = np.zeros(d_max, np.int64)
        s2 = np.zeros(d_max, np.int64)
        n = np.zeros(d_max, np.int64)
        np.add.at(s, dim, q)
        np.add.at(s2, dim, q * q)
        np.add.at(n, dim, 1)
        return pa.table(
            {
                "dim": pa.array(np.arange(d_max, dtype=np.int64)),
                "n": pa.array(n),
                "sum_q": pa.array(s),
                "sumsq_q": pa.array(s2),
            }
        )

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("dim").aggregate([("n", "sum"), ("sum_q", "sum"), ("sumsq_q", "sum")])
    return pa.table(
        {
            "dim": final.column("dim"),
            "n": final.column("n_sum"),
            "sum_q": final.column("sum_q_sum"),
            "sumsq_q": final.column("sumsq_q_sum"),
        }
    ).sort_by("dim")


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means (k=8) over the embeddings table
    (functions/kmeans.py): per batch one matmul assignment + one
    scatter-add of per-cluster partial sums — the driver merges
    O(k x dim) floats per batch; deterministic smallest-id seeding makes
    every run/retry identical.  Rows-only driver check (iterative ML,
    no SQL equivalent); centroid math pinned against an in-process
    reference in tests/test_kmeans.py."""
    from ..functions.kmeans import kmeans

    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    stats: dict = {}
    cents, _ = kmeans(ds, "embedding", k=8, id_col="vec_id", stats_out=stats)
    import numpy as np

    # self-assert: all k clusters materialized with finite, non-degenerate
    # centroids (a seeding or partial-merge regression collapses clusters
    # to zeros/NaNs long before the rows-only gate would notice)
    assert cents.shape[0] == 8 and np.isfinite(cents).all(), cents.shape
    assert (np.linalg.norm(cents, axis=1) > 0).all()
    # Lloyd convergence self-assert: the per-iteration assignment SSE must
    # be non-increasing (tiny float slack for the distributed add order) —
    # a broken partial merge or a wrong argmin breaks monotonicity on the
    # first step, long before the rows-only gate would notice
    inertia = stats["inertia"]
    assert len(inertia) >= 1 and all(
        b <= a * (1 + 1e-9) for a, b in zip(inertia, inertia[1:])
    ), inertia
    assert inertia[-1] <= inertia[0], inertia
    norms = np.floor(np.linalg.norm(cents, axis=1) * 1e6).astype(np.int64)
    return pa.table(
        {
            "cluster": pa.array(np.arange(cents.shape[0], dtype=np.int64)),
            "centroid_norm_e6": pa.array(norms),
        }
    )


def q_hybrid_retrieval(sf_dir: str):
    """Hybrid retrieval: BM25 keyword candidates ('window merge scan')
    and exact cosine ANN candidates (query = the vec_id=0 embedding)
    fused with reciprocal-rank fusion (RRF, Cormack et al. 2009:
    score = sum 1/(60 + rank)).  Composes two already-proved engines —
    the chunk-store inverted index (pruned term decode) and the
    broadcast-matmul top-k — with only two 50-row rank lists meeting at
    the fusion step; both rank orders and the fused score are integer-
    quantized so the FULL OUTER JOIN window-SQL oracle hash-matches."""
    from ..functions.search import bm25_search
    from ..functions.similarity import topk_cosine

    K_LIST, K_OUT, C = 50, 10, 60

    bm = bm25_search(_bm25_index(sf_dir), ["window", "merge", "scan"], k=K_LIST)
    bm_ids = bm.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)

    q = _query_vec(sf_dir, 0, np.float64)
    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # 3x headroom before the quantized re-rank (the q_ann_topk ratio):
    # e4 ties spanning the raw-sim cutoff must all be available so the
    # doc_id tie-break matches the oracle's global ORDER BY
    t = topk_cosine(ds, q, k=3 * K_LIST, dtype=np.float64)
    sim_e4 = np.rint(t.column("sim").to_numpy() * 1e4).astype(np.int64)
    vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    aorder = np.lexsort((vid, -sim_e4))[:K_LIST]
    ann_ids = vid[aorder]

    scores: dict[int, float] = {}
    for r, d in enumerate(bm_ids, start=1):
        scores[int(d)] = scores.get(int(d), 0.0) + 1.0 / (C + r)
    for r, d in enumerate(ann_ids, start=1):
        scores[int(d)] = scores.get(int(d), 0.0) + 1.0 / (C + r)
    docs = np.array(sorted(scores), np.int64)
    rrf = np.floor(np.array([scores[int(d)] for d in docs]) * 1e9).astype(np.int64)
    order = np.lexsort((docs, -rrf))[:K_OUT]
    return pa.table({"doc_id": pa.array(docs[order]), "rrf_e9": pa.array(rrf[order])})


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
ORACLE_SQL = {
    "pagerank": """
        WITH eo AS (
          SELECT o.o_custkey AS c, l.l_suppkey AS s, CAST(COUNT(*) AS BIGINT) AS w
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ),
        edges AS (
          SELECT c AS u, s + 1000000 AS v, w FROM eo
          UNION ALL SELECT s + 1000000 AS u, c AS v, w FROM eo
        ),
        outw AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wu FROM edges GROUP BY u),
        r0 AS (SELECT u, CAST(1000000000 AS BIGINT) AS r FROM outw),
        r1 AS (SELECT e.v AS u,
                      CAST(150000000 + (85 * SUM((r.r * e.w) // o.wu)) // 100 AS BIGINT) AS r
               FROM edges e JOIN r0 r ON e.u = r.u JOIN outw o ON e.u = o.u
               GROUP BY e.v),
        r2 AS (SELECT e.v AS u,
                      CAST(150000000 + (85 * SUM((r.r * e.w) // o.wu)) // 100 AS BIGINT) AS r
               FROM edges e JOIN r1 r ON e.u = r.u JOIN outw o ON e.u = o.u
               GROUP BY e.v),
        r3 AS (SELECT e.v AS u,
                      CAST(150000000 + (85 * SUM((r.r * e.w) // o.wu)) // 100 AS BIGINT) AS r
               FROM edges e JOIN r2 r ON e.u = r.u JOIN outw o ON e.u = o.u
               GROUP BY e.v)
        SELECT u AS node, r AS rank_e9 FROM r3
        ORDER BY r DESC, u ASC LIMIT 20
    """,
    "ann_topk": """
        -- cosine against a NULL (or null-element) vector is undefined:
        -- such rows can never enter the top-k (the engine drops them at
        -- the kernel; DuckDB's list_cosine_similarity refuses them)
        SELECT e.vec_id,
               CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))
                    * 10000) AS BIGINT) AS sim_e4
        FROM embeddings e
        WHERE e.embedding IS NOT NULL
          AND len(list_filter(e.embedding, x -> x IS NULL)) = 0
        ORDER BY sim_e4 DESC, e.vec_id LIMIT 10
    """,
    "label_centroids": """
        SELECT label, CAST(dim AS INTEGER) AS dim,
               CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
                    AS BIGINT) AS sum_e6,
               COUNT(*) AS n
        FROM (SELECT label, UNNEST(embedding) AS e,
                     UNNEST(range(len(embedding))) AS dim FROM embeddings)
        GROUP BY label, dim ORDER BY label, dim
    """,
    "order_clusters": """
        SELECT o_orderkey,
               MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS cluster_rep
        FROM orders ORDER BY o_orderkey
    """,
    "bm25_search": r"""
        WITH dl AS (
          -- whitespace tokens == the engine's _ws_words: null / empty /
          -- tab-padded docs have dl = 0 but still count toward n/avgdl
          SELECT doc_id,
                 COALESCE(len(list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '')), 0) AS dl
          FROM documents
        ),
        st AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(text) <> ''
          ) WHERE tok IN ('window', 'merge', 'scan') GROUP BY doc_id, tok
        ),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        sc AS (
          SELECT tf.doc_id,
                 SUM( LN(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) ) AS s
          FROM tf CROSS JOIN st
               JOIN df ON tf.tok = df.tok
               JOIN dl ON tf.doc_id = dl.doc_id
          GROUP BY tf.doc_id
        )
        SELECT doc_id, CAST(FLOOR(s * 1000000 + 0.5) AS BIGINT) AS score_e6
        FROM sc ORDER BY score_e6 DESC, doc_id LIMIT 10
    """,
    "embedding_moments": """
        SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS sum_q,
               CAST(SUM(q * q) AS BIGINT) AS sumsq_q
        FROM (SELECT CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS q, dim
              FROM (SELECT UNNEST(embedding) AS e,
                           UNNEST(range(len(embedding))) AS dim FROM embeddings))
        GROUP BY dim ORDER BY dim
    """,
    "kmeans_step": """
        WITH q AS (
            SELECT vec_id, CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS qv, dim
            FROM (SELECT vec_id, UNNEST(embedding) AS e,
                         UNNEST(range(len(embedding))) AS dim FROM embeddings)
        ),
        seed_ids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
        seeds AS (SELECT q.* FROM q JOIN seed_ids USING (vec_id)),
        d AS (
            SELECT q.vec_id, s.vec_id AS cid,
                   SUM((q.qv - s.qv) * (q.qv - s.qv)) AS d2
            FROM q JOIN seeds s ON q.dim = s.dim
            GROUP BY q.vec_id, s.vec_id
        ),
        a AS (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM d
        ),
        rs AS (SELECT vec_id, CAST(SUM(qv) AS BIGINT) AS qsum FROM q GROUP BY vec_id)
        SELECT a.cid AS cluster, COUNT(*) AS n_members,
               CAST(SUM(rs.qsum) AS BIGINT) AS coord_sum
        FROM a JOIN rs USING (vec_id)
        WHERE rn = 1
        GROUP BY a.cid ORDER BY a.cid
    """,
    "hybrid_retrieval": r"""
        WITH dl AS (
          -- whitespace tokens == the engine's _ws_words: null / empty /
          -- tab-padded docs have dl = 0 but still count toward n/avgdl
          SELECT doc_id,
                 COALESCE(len(list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '')), 0) AS dl
          FROM documents
        ),
        st AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(text) <> ''
          ) WHERE tok IN ('window', 'merge', 'scan') GROUP BY doc_id, tok
        ),
        dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        sc AS (
          SELECT tf.doc_id,
                 SUM( LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) ) AS s
          FROM tf CROSS JOIN st
               JOIN dfq ON tf.tok = dfq.tok
               JOIN dl ON tf.doc_id = dl.doc_id
          GROUP BY tf.doc_id
        ),
        bm AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS r
          FROM (SELECT doc_id, CAST(FLOOR(s * 1000000 + 0.5) AS BIGINT) AS score_e6
                FROM sc ORDER BY score_e6 DESC, doc_id LIMIT 50)
        ),
        ann AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim_e4 DESC, doc_id) AS r
          FROM (SELECT e.vec_id AS doc_id,
                       CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))
                            * 10000) AS BIGINT) AS sim_e4
                FROM embeddings e
                WHERE e.embedding IS NOT NULL
                  AND len(list_filter(e.embedding, x -> x IS NULL)) = 0
                ORDER BY sim_e4 DESC, doc_id LIMIT 50)
        ),
        fused AS (
          SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
                 COALESCE(1.0 / (60 + bm.r), 0) + COALESCE(1.0 / (60 + ann.r), 0) AS s
          FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id
        )
        SELECT doc_id, CAST(FLOOR(s * 1000000000) AS BIGINT) AS rrf_e9
        FROM fused ORDER BY rrf_e9 DESC, doc_id LIMIT 10
    """,
}
