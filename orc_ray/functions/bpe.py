"""Byte-level BPE tokenizer: distributed train + vectorized apply.

The step that PRODUCES the north-star input table: raw documents in,
(doc_id, tokens:list<int32>, n_tok:int32, source) out.  tokenize_corpus
covers the fixed-vocab (word-id) variant; this is the real subword
tokenizer — GPT-2-family byte-level BPE (Sennrich et al. 2016; Radford
et al. 2019) built from scratch on numpy.

Scale shape:

- TRAIN pass 1 is ONE ``sum_by_keys`` over per-batch word counts — the
  only corpus-wide exchange, O(word-vocab) not O(tokens).  The merge
  loop then runs on the DRIVER over the word-frequency table: this is
  O(vocab x merges), independent of corpus size — the standard BPE
  trainer shape (every production tokenizer trains on a word-count
  table, not the raw corpus).  ``top_words`` bounds the driver table for
  open vocabularies (the oov_rate/top-K convention).
- APPLY is a stateless map_batches pass: the merge table (a few KB)
  broadcasts once; each batch dictionary-encodes its words and runs the
  merge sequence over the UNIQUE words only (the classic apply-time
  trick — per-batch cost is O(unique-word bytes x merges), and token
  sequences fan back out to doc rows with pure offset arithmetic).

Byte-level alphabet: the initial 256 symbols ARE the byte values, so
token ids are globally deterministic (id 0..255 = byte, 256+k = k-th
merge) and NO out-of-vocabulary case exists at apply time — any corpus
round-trips exactly.  Detokenization (symbol-byte concat) is therefore
byte-identical to the lowercased input words; ``verify=True`` asserts
that per batch, vectorized.

Determinism: merge selection is (max weighted count, then lexicographic
smallest (left-bytes, right-bytes)); within-word overlapping occurrences
(left==right runs like "aaaa") merge leftmost-greedy, exactly matching
the sequential reference scan — pinned by parity tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _concat_np, _ws_words


def _merge_flat(syms: np.ndarray, word_id: np.ndarray, left: int, right: int, new_id: int):
    """Contract every non-overlapping in-word (left, right) bigram to
    new_id, leftmost-greedy.  Returns (syms, word_id) after contraction.

    Adjacent matching positions only arise when left == right (a run like
    "aaaa"); keeping alternating positions within each consecutive run is
    exactly the sequential left-to-right greedy scan."""
    if syms.size < 2:
        return syms, word_id
    m = (syms[:-1] == left) & (syms[1:] == right) & (word_id[:-1] == word_id[1:])
    pos = np.flatnonzero(m)
    if pos.size == 0:
        return syms, word_id
    if left == right:
        new_run = np.diff(pos, prepend=pos[0] - 2) != 1
        run_id = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)
        idx_in_run = np.arange(pos.size) - run_start[run_id]
        pos = pos[(idx_in_run % 2) == 0]
    out = syms.copy()
    out[pos] = new_id
    drop = np.zeros(out.size, dtype=bool)
    drop[pos + 1] = True
    return out[~drop], word_id[~drop]


def _word_flat(words: pa.Array):
    """(syms int32 byte values, word_id int64, n_words) for a string
    array — zero-copy from the Arrow buffers."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    arr = words.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int64), 0
    o_raw = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + arr.offset + 1
    )[arr.offset:].astype(np.int64)
    data_all = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    data = data_all[int(o_raw[0]): int(o_raw[-1])]
    off = o_raw - o_raw[0]
    syms = data.astype(np.int32)
    word_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    return syms, word_id, n


def train_merges(words: pa.Array, freqs: np.ndarray, n_merges: int):
    """Driver-side merge loop over the (word, freq) table.

    Returns (merges: list[(left_id, right_id, new_id)],
    sym_bytes: list[bytes] of length 256 + len(merges))."""
    sym_bytes = [bytes([b]) for b in range(256)]
    merges: list[tuple[int, int, int]] = []
    syms, word_id, _ = _word_flat(words)
    freqs = np.asarray(freqs, dtype=np.int64)
    for _ in range(n_merges):
        if syms.size < 2:
            break
        m = word_id[:-1] == word_id[1:]
        if not m.any():
            break
        keys = (syms[:-1][m].astype(np.int64) << 32) | syms[1:][m].astype(np.int64)
        w = freqs[word_id[:-1][m]]
        uniq, inv = np.unique(keys, return_inverse=True)
        cnt = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(cnt, inv, w)
        best_cnt = int(cnt.max())
        if best_cnt < 2:
            break
        cand = uniq[cnt == best_cnt]
        pairs = [(int(k >> 32), int(k & 0xFFFFFFFF)) for k in cand]
        left, right = min(pairs, key=lambda p: (sym_bytes[p[0]], sym_bytes[p[1]]))
        new_id = len(sym_bytes)
        sym_bytes.append(sym_bytes[left] + sym_bytes[right])
        merges.append((left, right, new_id))
        syms, word_id = _merge_flat(syms, word_id, left, right, new_id)
    return merges, sym_bytes


def apply_merges(words: pa.Array, merges) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a UNIQUE-word array: returns (flat token ids int32,
    offsets int64[n+1]) — the fixed merge sequence applied in rank order
    (provably identical to per-word lowest-rank-first replay)."""
    syms, word_id, n = _word_flat(words)
    for left, right, new_id in merges:
        syms, word_id = _merge_flat(syms, word_id, left, right, new_id)
    counts = np.bincount(word_id, minlength=n) if syms.size else np.zeros(n, dtype=np.int64)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    return syms.astype(np.int32), off


def bpe_train(ds, *, text_col: str = "text", n_merges: int = 256,
              top_words: int | None = None, stats_out: dict | None = None):
    """Distributed word-frequency pass + driver merge loop.

    ``top_words`` caps the driver table (count DESC, word ASC — the
    deterministic oov_rate cut) for open-web vocabularies; None trains on
    the full word table (exact, used where the corpus vocab is bounded)."""
    from .aggregates import sum_by_keys

    def wc(t: pa.Table) -> pa.Table:
        off, flat, n_words = _ws_words(_concat_np(t.column(text_col)), lower=True)
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(n_words[word_doc] > 0))
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table({"w": g.column("w"), "one": g.column("count_all").cast(pa.int64())})

    parts = list(
        sum_by_keys(
            ds.map_batches(wc, batch_format="pyarrow", zero_copy_batch=True),
            ["w"], "one", out="n",
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vocab = (
        pa.concat_tables(parts).combine_chunks()
        if parts
        else pa.table({"w": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    )
    if top_words is not None and vocab.num_rows > top_words:
        order = pc.sort_indices(
            vocab, sort_keys=[("n", "descending"), ("w", "ascending")]
        )
        vocab = vocab.take(order.slice(0, top_words))
    if stats_out is not None:
        stats_out["vocab_rows"] = vocab.num_rows
        lens = pc.binary_length(vocab.column("w")).to_numpy(zero_copy_only=False).astype(np.int64)
        ns = vocab.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        stats_out["total_word_bytes"] = int((lens * ns).sum())
    words = vocab.column("w").combine_chunks()
    freqs = vocab.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    merges, sym_bytes = train_merges(words, freqs, n_merges)
    return merges, sym_bytes


def bpe_apply_batch(t: pa.Table, merges, sym_bytes=None, *, text_col: str = "text",
                    verify: bool = False) -> pa.Table:
    """Tokenize one batch into the north-star shape: every non-text
    column rides along + (tokens:list<int32>, n_tok:int32).

    The merge sequence runs over the batch's UNIQUE words only; token
    sequences fan out to word instances and concatenate per doc with
    pure offset arithmetic.  Wordless docs (null/empty/whitespace) get
    empty — not null — token lists.  ``verify=True`` re-concatenates the
    tokens' symbol bytes and asserts byte-identity with the lowercased
    input words (byte-level BPE has no OOV, so this MUST hold)."""
    off, flat, n_words = _ws_words(_concat_np(t.column(text_col)), lower=True)
    word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
    real = n_words[word_doc] > 0
    flat = flat.filter(pa.array(real))
    word_doc = word_doc[real]

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    enc = flat.dictionary_encode()
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary

    tok_flat, tok_off = apply_merges(uniq, merges)
    tok_len = np.diff(tok_off)

    # fan unique-word token runs out to word instances, then to docs
    inst_len = tok_len[inv] if inv.size else np.zeros(0, dtype=np.int64)
    total = int(inst_len.sum())
    starts = np.repeat(tok_off[:-1][inv], inst_len)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(inst_len)[:-1]]) if inst_len.size else np.zeros(0, dtype=np.int64),
        inst_len,
    )
    doc_tokens = tok_flat[starts + intra] if total else np.zeros(0, dtype=np.int32)

    n_tok_per_doc = np.zeros(n_words.size, dtype=np.int64)
    np.add.at(n_tok_per_doc, word_doc, inst_len)
    doc_off = np.zeros(n_words.size + 1, dtype=np.int64)
    np.cumsum(n_tok_per_doc, out=doc_off[1:])

    if verify:
        if sym_bytes is None:
            raise ValueError("verify=True needs sym_bytes")
        # byte-identity: concat of token symbol bytes == concat of words
        lens = np.array([len(s) for s in sym_bytes], dtype=np.int64)
        sflat = np.frombuffer(b"".join(sym_bytes), dtype=np.uint8)
        soff = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=soff[1:])
        tlen = lens[doc_tokens]
        tt = int(tlen.sum())
        st = np.repeat(soff[:-1][doc_tokens], tlen)
        it = np.arange(tt, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(tlen)[:-1]]) if tlen.size else np.zeros(0, dtype=np.int64),
            tlen,
        )
        recon = sflat[st + it] if tt else np.zeros(0, dtype=np.uint8)
        # flat is already in doc order (word_doc is non-decreasing)
        wsyms, _, _ = _word_flat(flat)
        assert np.array_equal(recon, wsyms.astype(np.uint8)), "BPE detok mismatch"

    tokens = pa.LargeListArray.from_arrays(
        pa.array(doc_off), pa.array(doc_tokens, pa.int32())
    )
    cols = {}
    for name in t.column_names:
        if name != text_col:
            cols[name] = t.column(name)
    cols["tokens"] = tokens
    cols["n_tok"] = pa.array(n_tok_per_doc.astype(np.int32))
    return pa.table(cols)


def bpe_apply(ds, model, *, text_col: str = "text", verify: bool = False):
    """Broadcast the merge table once, tokenize the stream."""
    import ray

    merges, sym_bytes = model
    ref = ray.put((merges, sym_bytes))

    def stage(t: pa.Table) -> pa.Table:
        m, sb = ray.get(ref)
        return bpe_apply_batch(t, m, sb, text_col=text_col, verify=verify)

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
