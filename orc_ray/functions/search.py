"""BM25 keyword search over an inverted index stored THROUGH the engine.

The postings list (token, doc_id, tf) is itself a chunk store, globally
sorted by token — so a term lookup is a normal pruned decode: the
manifest min/max (+ per-stride index) skips every chunk whose token
range can't contain the term, exactly how the IVF ANN store prunes by
`ivf_partition` (similarity.py).  Doc lengths live in a second store,
sorted by doc_id; corpus stats (n_docs, dl_sum) in a stats sidecar.
Okapi BM25 (Robertson et al., TREC-3) with k1=1.2, b=0.75; scores
reported e6-quantized so the identical-formula SQL oracle hash-matches.

Scale shape (nothing O(corpus) on the driver — r3 verdict item 1):

- build: postings = one tokenize pass + ONE sort; docmeta streams
  straight into its store (sorted by doc_id), never concatenated
  driver-side; n_docs comes from the manifest row counts and dl_sum from
  a distributed column sum over the 2-column store.
- query: matched postings (O(df of the query terms) rows) are decoded
  pruned; per-term df is a distributed keyed count (agg_by_keys — the
  dedup_ngram pattern); the doc-length join runs through join_adaptive
  fronted by a Bloom semi-join (docmeta rows whose doc_id can't be in
  the matched set never enter the join), so a selective query moves
  O(matched docs) and a stop-word query falls back to the
  hash-partitioned join arm; per-doc score totals come from a second
  distributed keyed sum; the driver sees only the per-term df table and
  the O(blocks x k) top-k candidates.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75

# below this many matched-doc rows the dl lookup is broadcast (one
# object-store copy), above it the join hash-partitions both sides —
# the join_adaptive per-node budget
DL_BROADCAST_ROWS = 500_000


def _postings_batch(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(token, doc_id, tf) rows for one batch — one split + one group_by."""
    from .text import _ws_words

    text = t.column(text_col)
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    off, flat, n_words = _ws_words(text)
    ids = t.column(id_col)
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    doc_rep = pc.take(ids, pa.array(np.repeat(np.arange(t.num_rows), np.diff(off))))
    toks = pa.table({"token": flat, "doc_id": doc_rep})
    # split("") == [""]: empty/whitespace-only/null docs contribute a
    # phantom '' word (n_words already says 0 for them — _meta_batch's dl
    # agrees); drop it or the index gains a junk ''-token posting per
    # empty doc, with df/idf computed for a token no real query has
    if len(flat) and pc.any(pc.equal(flat, "")).as_py():
        toks = toks.filter(pc.not_equal(toks.column("token"), ""))
    g = (
        toks
        .group_by(["token", "doc_id"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "token": g.column("token"),
            "doc_id": g.column("doc_id"),
            "tf": g.column("count_all").cast(pa.int64()),
        }
    )


def _meta_batch(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    from .text import _ws_words

    text = t.column(text_col)
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    _, _, n_words = _ws_words(text)
    return pa.table({"doc_id": t.column(id_col), "dl": pa.array(n_words.astype(np.int64))})


def build_text_index(docs_ds, index_dir: str, id_col: str = "doc_id", text_col: str = "text"):
    """Build the BM25 index stores under index_dir/{postings,docmeta}.

    Fully streaming: neither store's rows ever materialize on the driver.
    docmeta is sorted by doc_id so its manifest min/max also supports
    pruned per-doc lookups."""
    from ..chunk import DEFAULT_OPTIONS
    from ..pipeline.decode import count_rows, decode_dataset
    from ..pipeline.encode import encode_dataset

    post = docs_ds.map_batches(
        functools.partial(_postings_batch, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("token")
    encode_dataset(None, os.path.join(index_dir, "postings"), DEFAULT_OPTIONS, ds=post, batch_size=65536)

    meta = docs_ds.map_batches(
        functools.partial(_meta_batch, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("doc_id")
    meta_dir = os.path.join(index_dir, "docmeta")
    encode_dataset(None, meta_dir, DEFAULT_OPTIONS, ds=meta, batch_size=65536)

    # corpus stats without a driver table: row count from the manifest
    # (the ORC footer numberOfRows analog), dl_sum as a distributed
    # column sum over the 2-column store (per-block partials only)
    n = count_rows(meta_dir, trust_stats=True)
    dl_sum = int(decode_dataset(meta_dir, columns=["dl"]).sum("dl") or 0) if n else 0
    avgdl = dl_sum / max(n, 1)
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        # dl_sum (exact integer) is what multi-index search combines:
        # reconstructing it from the rounded avgdl float would break the
        # bit-identical multi-index == rebuilt-index contract
        json.dump({"n_docs": n, "avgdl": avgdl, "dl_sum": dl_sum}, f)


def _score_batch(t: pa.Table, *, idf: dict, avgdl: float) -> pa.Table:
    """Per-posting BM25 contribution, vectorized (token/tf/dl -> s)."""
    if t.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}
        )
    term_arr = pa.array(sorted(idf))
    idf_np = np.array([idf[x] for x in sorted(idf)], np.float64)
    pos = pc.index_in(t.column("token"), value_set=term_arr).to_numpy(zero_copy_only=False)
    idf_v = idf_np[pos.astype(np.int64)]
    tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
    s = idf_v * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    return pa.table({"doc_id": t.column("doc_id"), "s": pa.array(s)})


def _local_topk(t: pa.Table, k: int) -> pa.Table:
    """(score_e6 desc, doc_id asc) top-k of a (doc_id, s_sum) block."""
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score_e6": pa.array([], pa.int64())}
        )
    se6 = np.floor(t.column("s_sum").to_numpy(zero_copy_only=False) * 1e6 + 0.5).astype(np.int64)
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, -se6))[:k]
    return pa.table(
        {"doc_id": pc.take(t.column("doc_id"), pa.array(order)), "score_e6": pa.array(se6[order])}
    )


def bm25_search(index_dir, terms: list[str], k: int = 10, stats_out: dict | None = None) -> pa.Table:
    """Top-k (doc_id, score_e6) for an OR-of-terms query.

    ``index_dir`` may be a single index or a LIST of indexes over
    disjoint doc sets (a base index plus CDC delta indexes — incremental
    indexing without a rebuild): corpus stats combine exactly
    (n = sum n_i, avgdl = weighted mean, df = sum of per-index df), so a
    multi-index search scores identically to one rebuilt combined index
    (pinned by tests/test_search.py).

    ``stats_out`` receives chunk-pruning counters plus ``driver_rows``
    (per-term df rows + top-k merge candidates) — the asserted ceiling
    showing nothing O(corpus) reaches the driver."""
    import ray

    from ..pipeline.decode import decode_dataset, list_chunks
    from .aggregates import agg_by_keys
    from .joins import build_bloom_stream, join_adaptive

    dirs = [index_dir] if isinstance(index_dir, (str, os.PathLike)) else list(index_dir)
    n_docs = 0
    dl_sum = 0
    for d in dirs:
        with open(os.path.join(d, "stats.json")) as f:
            st = json.load(f)
        n_docs += st["n_docs"]
        # exact integer combine; fall back for pre-dl_sum indexes
        dl_sum += st.get("dl_sum", st["avgdl"] * st["n_docs"])
    avgdl = dl_sum / max(n_docs, 1)

    empty = pa.table({"doc_id": pa.array([], pa.int64()), "score_e6": pa.array([], pa.int64())})
    tset = sorted(set(terms))
    post_parts = []
    kept_total = total_total = 0
    for term in tset:
        for d in dirs:
            _, kept, total = list_chunks(
                os.path.join(d, "postings"), predicates=[("token", "==", term)]
            )
            kept_total += kept
            total_total += total
            if kept:
                post_parts.append(
                    decode_dataset(os.path.join(d, "postings"), predicates=[("token", "==", term)])
                )
    if stats_out is not None:
        stats_out["chunks_kept"] = kept_total
        stats_out["chunks_total"] = total_total
        stats_out["driver_rows"] = 0
    if not post_parts:
        return empty
    post = post_parts[0]
    for p in post_parts[1:]:
        post = post.union(p)
    post = post.materialize()  # object store, reused by df + join passes
    n_post = post.count()
    if n_post == 0:
        return empty

    # per-term document frequency: distributed keyed count, driver sees
    # |terms| rows
    df_t = pa.concat_tables(
        b
        for b in agg_by_keys(post, ["token"], [("tf", "count_all", "df")]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    )
    idf = {
        t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
        for t, df in zip(df_t.column("token").to_pylist(), df_t.column("df").to_pylist())
    }

    # doc-length join: bloom semi-join prunes the docmeta stream to the
    # matched-doc neighbourhood, then join_adaptive broadcasts it (small
    # case) or hash-partitions both sides (stop-word case)
    filt = build_bloom_stream(post, "doc_id", expected_items=max(n_post, 1))
    fref = ray.put(filt)

    def bloom_prune(t: pa.Table, *, fref) -> pa.Table:
        from ..codecs import bloom

        f = ray.get(fref)
        col = t.column("doc_id")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        keep = bloom.might_contain_many(f, col)
        return t.filter(pa.array(keep))

    meta_parts = [decode_dataset(os.path.join(d, "docmeta")) for d in dirs]
    meta_ds = meta_parts[0]
    for p in meta_parts[1:]:
        meta_ds = meta_ds.union(p)
    meta_ds = meta_ds.map_batches(
        functools.partial(bloom_prune, fref=fref), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = join_adaptive(
        post, meta_ds, "doc_id", "doc_id", ["dl"], threshold_rows=DL_BROADCAST_ROWS
    )
    scored = joined.map_batches(
        functools.partial(_score_batch, idf=idf, avgdl=avgdl),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = agg_by_keys(scored, ["doc_id"], [("s", "sum", "s_sum")])
    cand_parts = [
        b
        for b in totals.map_batches(
            functools.partial(_local_topk, k=k), batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if stats_out is not None:
        stats_out["driver_rows"] = df_t.num_rows + sum(p.num_rows for p in cand_parts)
    if not cand_parts:
        return empty
    merged = pa.concat_tables(cand_parts).combine_chunks()
    se6 = merged.column("score_e6").to_numpy(zero_copy_only=False)
    d = merged.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, -se6))[:k]
    idx = pa.array(order)
    return pa.table(
        {"doc_id": pc.take(merged.column("doc_id"), idx), "score_e6": pa.array(se6[order])}
    )
