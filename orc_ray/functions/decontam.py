"""Benchmark decontamination: drop training docs sharing any word n-gram
with a held-out benchmark set.

The standard LLM-corpus hygiene step (the reference engine has no analog;
this is a north-star training-data op): the benchmark/eval set is small by
construction, so its n-gram set is broadcast once (``ray.put``) and every
training batch checks membership vectorized — no shuffle at all.  At
100 TB the only thing that grows is the streaming pass; the broadcast
object stays O(benchmark grams).

Real pipelines hash the grams (13-grams of words, 64-bit fingerprints);
here the gram *strings* are kept so the DuckDB oracle can mirror the
operator exactly — swap `grams` for `content_hash64(grams)` to shrink the
broadcast 10x at scale (collision rate 2^-64 per pair, fine for hygiene).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def word_ngrams(texts, n: int):
    """Vectorized word n-gram extraction over a batch of texts.

    Splits on runs of whitespace after trimming (== DuckDB
    ``string_split_regex(trim(text), '\\s+')``), then joins every n
    consecutive words of a doc with single spaces (== ``array_to_string``)
    — no per-row Python.  Returns ``(grams, doc_index)``: one row per
    n-gram occurrence and the index of the source row in ``texts``.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = pc.fill_null(texts, "")  # null doc == empty doc (0 grams)
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    total = len(flat)
    m = total - n + 1
    if m <= 0:
        return pa.array([], pa.string()), np.array([], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # a gram starting at flat position p stays inside its doc iff
    # p - doc_start <= doc_len - n
    pos_in_doc = np.arange(total, dtype=np.int64) - starts[doc_of]
    valid = (pos_in_doc <= lens[doc_of] - n)[:m]
    parts = [flat.slice(i, m) for i in range(n)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    idx = np.flatnonzero(valid)
    return grams_all.take(pa.array(idx, pa.int64())), doc_of[:m][valid]


def md5_first_hex(ids) -> np.ndarray:
    """First hex digit of md5(str(id)) per row — the deterministic,
    shard-stable bucket used for holdout splits (matches SQL
    ``substr(md5(CAST(id AS VARCHAR)), 1, 1)``).  Vectorized through the
    block-parallel md5 kernel (md5vec.py) — no per-row Python."""
    from .md5vec import md5_first_hex as _vec

    return _vec(ids)


def decontaminate(ds, *, n: int = 4, id_col: str = "doc_id",
                  text_col: str = "text", bench_digits: str = "0"):
    """Two streaming passes over ``ds``:

    1. benchmark docs (md5 bucket in ``bench_digits``) -> per-batch
       DISTINCT gram set -> driver-side distinct union (small: the
       benchmark is a held-out eval set) -> ``ray.put`` broadcast.
    2. every batch: vectorized grams + ``is_in(broadcast)`` -> drop docs
       sharing any gram, and drop the benchmark docs themselves.

    Returns a Dataset of the surviving rows (id_col only).
    """

    def bench_grams(t: pa.Table) -> pa.Table:
        keep = np.isin(md5_first_hex(t.column(id_col)), list(bench_digits))
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        grams, _ = word_ngrams(sub.column(text_col), n)
        return pa.table({"gram": pc.unique(grams)})

    parts = list(
        ds.map_batches(bench_grams, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    bench = (
        pc.unique(pa.concat_tables(parts).column("gram").combine_chunks())
        if parts
        else pa.array([], pa.string())
    )
    bench_ref = ray.put(bench)

    def scrub(t: pa.Table) -> pa.Table:
        digits = md5_first_hex(t.column(id_col))
        is_bench = np.isin(digits, list(bench_digits))
        bench_set = ray.get(bench_ref)
        grams, doc_of = word_ngrams(t.column(text_col), n)
        hit = pc.is_in(grams, value_set=bench_set).to_numpy(zero_copy_only=False)
        contaminated = np.zeros(t.num_rows, bool)
        if len(doc_of):
            contaminated[doc_of[hit]] = True
        return t.filter(pa.array(~(is_bench | contaminated)))

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
