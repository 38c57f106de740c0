"""BM25 keyword search over an inverted index stored THROUGH the engine.

The postings list (token, doc_id, tf) is itself a chunk store, globally
sorted by token — so a term lookup is a normal pruned decode: the
manifest min/max (+ per-stride index) skips every chunk whose token
range can't contain the term, exactly how the IVF ANN store prunes by
`ivf_partition` (similarity.py).  Doc lengths live in a second tiny
store; N and avgdl in a stats sidecar.  Okapi BM25 (Robertson et al.,
TREC-3) with k1=1.2, b=0.75; scores reported e6-quantized so the
identical-formula SQL oracle hash-matches.

Scale notes: index build is one tokenize pass + ONE sort (the postings
shuffle); query cost is O(df of the query terms) rows decoded, not
O(corpus).  The driver-side score accumulation is bounded by matched
postings (fine for selective terms; a stop-word query should route the
per-term partials through sum_by_keys — the documented upgrade).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75


def _postings_batch(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(token, doc_id, tf) rows for one batch — one split + one group_by."""
    from .text import _ws_words

    text = t.column(text_col)
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    off, flat, n_words = _ws_words(text)
    ids = t.column(id_col)
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    doc_rep = pc.take(ids, pa.array(np.repeat(np.arange(t.num_rows), np.diff(off))))
    g = (
        pa.table({"token": flat, "doc_id": doc_rep})
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
    """Build the BM25 index stores under index_dir/{postings,docmeta}."""
    import functools

    from ..chunk import DEFAULT_OPTIONS
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
    )
    meta_rows = pa.concat_tables(meta.iter_batches(batch_format="pyarrow", batch_size=None))
    n = meta_rows.num_rows
    dl_sum = int(pc.sum(meta_rows.column("dl")).as_py() or 0)
    avgdl = dl_sum / max(n, 1)
    import ray

    encode_dataset(
        None,
        os.path.join(index_dir, "docmeta"),
        DEFAULT_OPTIONS,
        ds=ray.data.from_arrow(meta_rows),
        batch_size=65536,
    )
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        # dl_sum (exact integer) is what multi-index search combines:
        # reconstructing it from the rounded avgdl float would break the
        # bit-identical multi-index == rebuilt-index contract
        json.dump({"n_docs": n, "avgdl": avgdl, "dl_sum": dl_sum}, f)


def bm25_search(index_dir, terms: list[str], k: int = 10, stats_out: dict | None = None) -> pa.Table:
    """Top-k (doc_id, score_e6) for an OR-of-terms query.

    ``index_dir`` may be a single index or a LIST of indexes over
    disjoint doc sets (a base index plus CDC delta indexes — incremental
    indexing without a rebuild): corpus stats combine exactly
    (n = sum n_i, avgdl = weighted mean, df = sum of per-index df), so a
    multi-index search scores identically to one rebuilt combined index
    (pinned by tests/test_search.py)."""
    from ..pipeline.decode import decode_dataset, list_chunks

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

    meta = pa.concat_tables(
        b
        for d in dirs
        for b in decode_dataset(os.path.join(d, "docmeta")).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    dl_ids = meta.column("doc_id").combine_chunks()
    dl_vals = meta.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)

    term_tables = []
    kept_total = total_total = 0
    for term in sorted(set(terms)):
        parts = []
        for d in dirs:
            _, kept, total = list_chunks(
                os.path.join(d, "postings"), predicates=[("token", "==", term)]
            )
            kept_total += kept
            total_total += total
            ds = decode_dataset(
                os.path.join(d, "postings"), predicates=[("token", "==", term)]
            )
            parts.extend(
                b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows
            )
        if not parts:
            continue
        rows = pa.concat_tables(parts)
        df = rows.num_rows
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        tf = rows.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        pos = pc.index_in(rows.column("doc_id"), value_set=dl_ids).to_numpy(zero_copy_only=False)
        dl = dl_vals[pos.astype(np.int64)]
        s = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        term_tables.append(pa.table({"doc_id": rows.column("doc_id"), "s": pa.array(s)}))
    if stats_out is not None:
        stats_out["chunks_kept"] = kept_total
        stats_out["chunks_total"] = total_total
    if not term_tables:
        return pa.table({"doc_id": pa.array([], pa.int64()), "score_e6": pa.array([], pa.int64())})
    g = pa.concat_tables(term_tables).group_by("doc_id").aggregate([("s", "sum")])
    se6 = np.floor(g.column("s_sum").to_numpy() * 1e6 + 0.5).astype(np.int64)
    darr = g.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((darr, -se6))[:k]
    idx = pa.array(order)
    return pa.table({"doc_id": pc.take(g.column("doc_id"), idx), "score_e6": pa.array(se6[order])})
