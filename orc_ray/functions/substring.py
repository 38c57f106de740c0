"""Exact duplicated-substring detection and span cutting (char-level).

The substring-dedup family from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., ACL 2022): find every length-L
character window that occurs >= 2 times anywhere in the corpus, then
either report per-document duplication stats (``dup_window_stats``) or
physically remove the covered spans (``cut_dup_spans``).  Lee et al. use
a corpus-wide suffix array; at 10^12-sequence scale a monolithic suffix
array is exactly the kind of global structure Ray Data can't stream, so
this is re-expressed as the standard rolling-hash formulation (the same
windows a suffix array's length->=L repeats induce):

1. **Hash pass** — one ``map_batches`` over the decoded text stream
   computes a vectorized polynomial rolling hash (mod 2^64, O(1) per
   window via prefix sums — no per-row Python) of every L-byte window
   and emits per-batch ``(hash, count)`` partials; a distributed
   ``sum_by_keys`` yields the hashes seen >= 2 times.  Only 16 B per
   *distinct* window hash ever shuffles — never the 32x-inflated gram
   text.
2. **Exact pass** — windows whose hash is duplicated (a superset of the
   true duplicates) have their actual L bytes extracted, packed as
   ``L/8`` int64 words, and exactly counted through the same
   distributed ``sum_by_keys``.  This removes hash collisions entirely:
   the final duplicated-gram set is exact byte equality, not
   fingerprint equality, while the expensive byte shuffle is bounded by
   *duplicate candidate* volume instead of corpus volume.
3. **Apply pass** — one more ``map_batches`` probes each window against
   the broadcast duplicated-gram set (``ray.put`` once, composite
   searchsorted per batch) and either counts flagged windows per doc or
   cuts the union of flagged [i, i+L) spans out of the text (the
   +1/-1 prefix-sum coverage trick, fully vectorized).

Driver-side state is the duplicated-hash array plus, on the BROADCAST
arm, the duplicated-gram array — bounded by the corpus's *duplicate*
volume, never its size; callers get the exact counts via ``stats_out``
so tests can pin the ceiling.  When the estimated gram broadcast
(``dup_hashes x L`` bytes) exceeds ``broadcast_budget_bytes`` the
operator switches to the PARTITIONED arm: the dup-gram set stays a
Dataset (never driver-collected), candidate windows (hash pre-filtered,
so bounded by duplicate-candidate volume) are hash-co-partitioned
against it with ONE ``left_semi`` Dataset.join, and the flagged
``(doc, start)`` pairs flow back to the per-doc stats through a keyed
sum / to the cut through a ``map_groups`` start-list + ``left_outer``
join with the corpus stream.  Both arms are byte-identical on output
(asserted in tests by forcing each arm on the same corpus); only the
shuffle shape differs.  The remaining broadcast is the 8 B/dup-hash
prefilter — 1/Lth of the gram volume; a fixed-size bloom front is the
documented next rung if even that outgrows the object store.

Semantics notes (both deliberate, both matched by the SQL oracles):
- "duplicated" counts *total occurrences* >= 2, including repeats inside
  one document (self-repeats are training-data pathology too);
- windows are L *bytes*; for ASCII corpora this equals the oracle's
  L-char ``substr`` windows.  Non-ASCII text still round-trips (cuts
  happen on whole flagged windows whose boundaries came from valid
  text), but the char/byte correspondence is ASCII-only.

Reference parity: the apache/orc reference has no substring machinery —
this operator family belongs to the training-data-pipeline surface the
build brief adds beyond the reference (like dedup.py / decontam.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# Odd multiplier (splitmix64's golden-gamma) -> invertible mod 2^64, so
# window hashes come from two prefix arrays instead of a per-window loop.
_P = np.uint64(0x9E3779B97F4A7C15)


def _inv64(a: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd number mod 2^64 (Newton)."""
    x = a
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (np.uint64(2) - a * x)
    return x


_PINV = _inv64(_P)


def _flat_utf8(col) -> tuple[np.ndarray, np.ndarray]:
    """(data: uint8[N], offsets: int64[rows+1]) for a string column.

    Zero-copy views of the Arrow buffers (normalized for slice offsets);
    nulls are treated as empty strings.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary()) if not pa.types.is_large_binary(col.type) else col
    if arr.null_count:
        arr = pc.fill_null(arr, b"").cast(pa.large_binary())
    buf_off, buf_dat = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(buf_off, np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buf_dat, np.uint8)[offs[0] : offs[-1]] if buf_dat is not None else np.empty(0, np.uint8)
    return data, (offs - offs[0]).astype(np.int64)


def _window_starts(offs: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Global start index of every in-doc L-window + per-doc window counts."""
    lens = np.diff(offs)
    nwin = np.maximum(lens - L + 1, 0)
    total = int(nwin.sum())
    if total == 0:
        return np.empty(0, np.int64), nwin
    seg_off = np.repeat(np.cumsum(nwin) - nwin, nwin)
    starts = np.repeat(offs[:-1], nwin) + (np.arange(total, dtype=np.int64) - seg_off)
    return starts, nwin


def _all_window_hashes(data: np.ndarray, L: int) -> np.ndarray:
    """h[i] = polynomial hash (mod 2^64) of data[i:i+L], for all i.

    Prefix construction: with C[k] = sum_{t<k} b[t]*Pinv^t and
    Ppow[k] = P^k, the window hash is (C[i+L]-C[i]) * Ppow[i+L-1] —
    identical bytes => identical hash by construction; collisions are
    removed by the exact pass, never trusted.
    """
    n = data.size
    if n < L:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        pinv_pow = np.ones(n, dtype=np.uint64)
        if n > 1:
            np.cumprod(np.full(n - 1, _PINV, dtype=np.uint64), out=pinv_pow[1:])
        ppow = np.ones(n, dtype=np.uint64)
        if n > 1:
            np.cumprod(np.full(n - 1, _P, dtype=np.uint64), out=ppow[1:])
        c = data.astype(np.uint64) * pinv_pow
        C = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(c, out=C[1:])
        starts = np.arange(0, n - L + 1)
        return (C[starts + L] - C[starts]) * ppow[starts + L - 1]


def _batch_window_hashes(t: pa.Table, text_col: str, L: int):
    """(data, offs, starts, nwin, hashes-at-starts) for one Arrow batch."""
    data, offs = _flat_utf8(t.column(text_col))
    starts, nwin = _window_starts(offs, L)
    if starts.size == 0:
        return data, offs, starts, nwin, np.empty(0, np.uint64)
    h_all = _all_window_hashes(data, L)
    return data, offs, starts, nwin, h_all[starts]


def _gram_words(data: np.ndarray, starts: np.ndarray, L: int) -> np.ndarray:
    """Extract the L bytes at each start as an (n, L//8) int64 word matrix."""
    nw = L // 8
    if starts.size == 0:
        return np.empty((0, nw), np.int64)
    idx = starts[:, None] + np.arange(L, dtype=np.int64)[None, :]
    rows = np.ascontiguousarray(data[idx])  # (n, L) uint8
    return rows.view(np.int64).reshape(starts.size, nw)


def _as_void(words: np.ndarray) -> np.ndarray:
    """(n, w) int64 rows viewed as one fixed-width void key per row."""
    w = words.shape[1] if words.ndim == 2 else 1
    return np.ascontiguousarray(words).view([("", np.void, 8 * w)]).ravel()


# Broadcast-arm budget: switch to the partitioned semi-join once the
# estimated gram broadcast (dup_hashes x L bytes) would exceed this.
_DEFAULT_BROADCAST_BUDGET = 64 << 20


def _ge2(t: pa.Table) -> pa.Table:
    return t.filter(pc.greater_equal(t.column("cnt"), 2)) if t.num_rows else t


def _dup_hash_set(ds, text_col: str, L: int):
    """Pass 1: sorted uint64 array of window hashes seen >= 2 times
    corpus-wide, + its object-store ref (broadcast once)."""
    from .aggregates import sum_by_keys

    def hash_partial(t: pa.Table) -> pa.Table:
        _, _, _, _, h = _batch_window_hashes(t, text_col, L)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"gram_h": pa.array(uniq.view(np.int64)), "cnt": pa.array(cnt.astype(np.int64))})

    hs = ds.map_batches(hash_partial, batch_format="pyarrow")
    totals = sum_by_keys(hs, ["gram_h"], "cnt").map_batches(_ge2, batch_format="pyarrow")
    dup_h_t = pa.concat_tables(
        list(totals.iter_batches(batch_format="pyarrow", batch_size=None))
        or [pa.table({"gram_h": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})]
    )
    dup_h = np.sort(dup_h_t.column("gram_h").to_numpy(zero_copy_only=False).view(np.uint64))
    return dup_h, ray.put(dup_h)


def _check_L(L: int) -> int:
    if L % 8 != 0 or L <= 0:
        raise ValueError(f"window length must be a positive multiple of 8, got {L}")
    return L // 8


def _dup_gram_set(ds, text_col: str, L: int, stats_out: dict | None,
                  dup_h=None, dup_h_ref=None):
    """Duplicated-hash array + exact duplicated-gram void set (sorted).

    Stages 1-2 of the module docstring on the BROADCAST arm; both
    returned arrays are the bounded driver-side state that stage 3
    broadcasts.
    """
    from .aggregates import sum_by_keys

    nw = _check_L(L)
    if dup_h is None:
        dup_h, dup_h_ref = _dup_hash_set(ds, text_col, L)

    # -- pass 2: candidate windows -> exact gram-word counts
    def gram_partial(t: pa.Table) -> pa.Table:
        H = ray.get(dup_h_ref)
        data, _, starts, _, h = _batch_window_hashes(t, text_col, L)
        if starts.size:
            pos = np.searchsorted(H, h)
            hit = (pos < H.size) & (H[np.minimum(pos, max(H.size - 1, 0))] == h) if H.size else np.zeros(h.size, bool)
            starts = starts[hit]
        words = _gram_words(data, starts, L)
        uniq, cnt = np.unique(_as_void(words), return_counts=True)
        uw = uniq.view(np.int64).reshape(uniq.size, nw)
        cols = {f"g{k}": pa.array(uw[:, k]) for k in range(nw)}
        cols["cnt"] = pa.array(cnt.astype(np.int64))
        return pa.table(cols)

    gs = ds.map_batches(gram_partial, batch_format="pyarrow")
    gkeys = [f"g{k}" for k in range(nw)]
    gtot = sum_by_keys(gs, gkeys, "cnt").map_batches(_ge2, batch_format="pyarrow")
    dup_g_t = pa.concat_tables(
        list(gtot.iter_batches(batch_format="pyarrow", batch_size=None))
        or [pa.table({k: pa.array([], pa.int64()) for k in gkeys + ["cnt"]})]
    )
    if dup_g_t.num_rows:
        gw = np.stack([dup_g_t.column(k).to_numpy(zero_copy_only=False) for k in gkeys], axis=1)
    else:
        gw = np.empty((0, nw), np.int64)
    dup_g = np.sort(_as_void(gw))

    if stats_out is not None:
        stats_out["dup_hashes"] = int(dup_h.size)
        stats_out["dup_grams"] = int(dup_g.size)
        # ALL driver-resident state for the whole operator family
        stats_out["driver_rows"] = int(dup_h.size) + int(dup_g.size)
    return dup_h_ref, ray.put(dup_g)


def _join_parallelism(num_partitions: int | None) -> tuple[int, dict]:
    """Resolve hash-join parallelism against the actual cluster.

    Dataset.join spawns ``num_partitions`` aggregator ACTORS that LINGER
    after the dataset executes (observed live: 8 idle aggregators from a
    finished join still held their CPU reservation and deadlocked every
    subsequent pipeline on the 4-CPU test session).  Aggregators are
    memory-bound, not CPU-bound — request 0 CPUs so a lingering pool can
    never starve co-scheduled stages; partitions scale with cluster CPUs
    (callers override upward for real clusters, where more partitions =
    smaller per-aggregator working sets)."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    return num_partitions, {"num_cpus": 0}


def _flagged_pairs(ds, id_col: str, text_col: str, L: int, dup_h_ref,
                   num_partitions: int | None, stats_out: dict | None):
    """PARTITIONED arm: Dataset of exact flagged (id_col, start) window
    occurrences — the dup-gram set never reaches the driver.

    Candidate windows (hash-prefiltered, so bounded by duplicate-candidate
    volume) are materialized once in the object store and consumed twice:
    a keyed occurrence count yields the exact >=2 gram set as a Dataset,
    then ONE hash-co-partitioned ``left_semi`` join flags the candidate
    occurrences whose gram is in it.  Returns None when there are no
    candidates (callers short-circuit to the identity/zero path).
    """
    from .aggregates import sum_by_keys

    nw = _check_L(L)
    gkeys = [f"g{k}" for k in range(nw)]

    def cand(t: pa.Table) -> pa.Table:
        H = ray.get(dup_h_ref)
        data, offs, starts, nwin, h = _batch_window_hashes(t, text_col, L)
        if starts.size and H.size:
            pos = np.searchsorted(H, h)
            hit = (pos < H.size) & (H[np.minimum(pos, H.size - 1)] == h)
        else:
            hit = np.zeros(starts.size, bool)
        row_of = np.repeat(np.arange(nwin.size, dtype=np.int64), nwin)[hit]
        starts_hit = starts[hit]
        words = _gram_words(data, starts_hit, L)
        cols = {k: pa.array(words[:, i]) for i, k in enumerate(gkeys)}
        cols[id_col] = t.column(id_col).take(pa.array(row_of))
        # start relative to the doc, not the flat batch buffer
        cols["start"] = pa.array(starts_hit - np.repeat(offs[:-1], nwin)[hit])
        return pa.table(cols)

    cands = ds.map_batches(cand, batch_format="pyarrow").materialize()
    n_cand = cands.count()
    if stats_out is not None:
        stats_out["candidate_windows"] = int(n_cand)
    if n_cand == 0:
        return None

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, np.int64)))

    counts = sum_by_keys(
        cands.select_columns(gkeys).map_batches(one, batch_format="pyarrow"),
        gkeys, "one", out="cnt",
    )
    dup_grams = counts.map_batches(_ge2, batch_format="pyarrow").drop_columns(["cnt"])
    num_partitions, agg_args = _join_parallelism(num_partitions)
    flagged = cands.join(
        dup_grams, join_type="left_semi", num_partitions=num_partitions,
        on=tuple(gkeys), aggregator_ray_remote_args=agg_args,
    )
    return flagged.select_columns([id_col, "start"])


def _flag_windows(t: pa.Table, text_col: str, L: int, dup_h, dup_g):
    """Per-batch: (data, offs, starts, nwin, flagged-mask over starts)."""
    H = ray.get(dup_h)
    G = ray.get(dup_g)
    data, offs, starts, nwin, h = _batch_window_hashes(t, text_col, L)
    if starts.size == 0:
        return data, offs, starts, nwin, np.zeros(0, bool)
    flag = np.zeros(starts.size, bool)
    if H.size:
        pos = np.searchsorted(H, h)
        cand = (pos < H.size) & (H[np.minimum(pos, H.size - 1)] == h)
        if cand.any() and G.size:
            keys = _as_void(_gram_words(data, starts[cand], L))
            gpos = np.searchsorted(G, keys)
            flag[np.flatnonzero(cand)] = (gpos < G.size) & (G[np.minimum(gpos, G.size - 1)] == keys)
    return data, offs, starts, nwin, flag


def _pick_arm(dup_h, L, broadcast_budget_bytes, stats_out):
    # budget <= 0 force-selects the partitioned arm (tests / ops override)
    arm = ("broadcast" if broadcast_budget_bytes > 0
           and dup_h.size * L <= broadcast_budget_bytes else "partitioned")
    if stats_out is not None:
        stats_out["arm"] = arm
        stats_out["dup_hashes"] = int(dup_h.size)
        if arm == "partitioned":
            # only the 8 B/hash prefilter is driver/broadcast-resident;
            # the gram set stays a Dataset end-to-end
            stats_out["driver_rows"] = int(dup_h.size)
    return arm


def dup_window_stats(ds, id_col: str = "doc_id", text_col: str = "text", L: int = 32,
                     stats_out: dict | None = None,
                     broadcast_budget_bytes: int = _DEFAULT_BROADCAST_BUDGET,
                     num_partitions: int | None = None):
    """Per-document duplicated-window counts, as a ray.data.Dataset.

    Returns (id_col, n_windows, dup_windows) for every doc with at least
    one L-byte window; ``dup_windows`` counts positions whose exact
    L-gram occurs >= 2 times corpus-wide.  Arms are output-identical:
    broadcast probes per batch (each doc is one row, so per-doc rows are
    FINAL with no further shuffle); partitioned unions the flagged-pair
    counts with the per-doc window counts through one keyed sum.
    """
    _check_L(L)
    dup_h, dup_h_ref = _dup_hash_set(ds, text_col, L)

    if _pick_arm(dup_h, L, broadcast_budget_bytes, stats_out) == "broadcast":
        dup_hr, dup_g = _dup_gram_set(ds, text_col, L, stats_out, dup_h, dup_h_ref)

        def per_doc(t: pa.Table) -> pa.Table:
            _, _, starts, nwin, flag = _flag_windows(t, text_col, L, dup_hr, dup_g)
            keep = nwin > 0
            if starts.size:
                # flagged-window count per doc: prefix-sum sampled at doc cuts
                fc = np.zeros(starts.size + 1, np.int64)
                np.cumsum(flag, out=fc[1:])
                cuts = np.cumsum(nwin)
                dupc = fc[cuts] - fc[cuts - nwin]
            else:
                dupc = np.zeros(nwin.size, np.int64)
            return pa.table({
                id_col: t.column(id_col).filter(pa.array(keep)),
                "n_windows": pa.array(nwin[keep]),
                "dup_windows": pa.array(dupc[keep]),
            })

        return ds.map_batches(per_doc, batch_format="pyarrow")

    from .aggregates import agg_by_keys

    def win_rows(t: pa.Table) -> pa.Table:
        _, offs = _flat_utf8(t.column(text_col))
        nwin = np.maximum(np.diff(offs) - L + 1, 0)
        keep = nwin > 0
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "n_windows": pa.array(nwin[keep]),
            "dup_windows": pa.array(np.zeros(int(keep.sum()), np.int64)),
        })

    per_doc_wins = ds.map_batches(win_rows, batch_format="pyarrow")
    flagged = _flagged_pairs(ds, id_col, text_col, L, dup_h_ref,
                             num_partitions, stats_out)
    if flagged is None:
        return per_doc_wins

    def flag_rows(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table({id_col: t.column(id_col),
                         "n_windows": pa.array(z),
                         "dup_windows": pa.array(z + 1)})

    unioned = per_doc_wins.union(flagged.map_batches(flag_rows, batch_format="pyarrow"))
    return agg_by_keys(unioned, [id_col],
                       [("n_windows", "sum", "n_windows"),
                        ("dup_windows", "sum", "dup_windows")])


def _cut_arrays(data: np.ndarray, offs: np.ndarray, fs: np.ndarray, L: int):
    """Shared coverage cut: remove the union of flagged [fs, fs+L) spans
    (global flat indices); returns (cleaned string array, new_lens)."""
    n = data.size
    rows = offs.size - 1
    if n == 0:
        return pa.nulls(rows, pa.string()).fill_null(""), np.zeros(rows, np.int64)
    add = np.zeros(n + 1, np.int64)
    np.add.at(add, fs, 1)
    np.add.at(add, fs + L, -1)
    covered = np.cumsum(add[:n]) > 0
    # windows start at every BYTE offset, so a span can begin or end in
    # the middle of a multibyte UTF-8 character; snap coverage out to
    # character boundaries (a partially covered character is fully cut)
    # or the string cast rejects the dangling lead/continuation bytes
    starts_mask = (data & 0xC0) != 0x80
    if not starts_mask.all():
        char_id = np.cumsum(starts_mask) - 1
        np.maximum(char_id, 0, out=char_id)  # defensive: leading continuation byte
        covered = (np.bincount(char_id[covered], minlength=int(char_id[-1]) + 1) > 0)[char_id]
    keep = ~covered
    kc = np.zeros(n + 1, np.int64)
    np.cumsum(keep, out=kc[1:])
    new_lens = kc[offs[1:]] - kc[offs[:-1]]
    new_offs = np.zeros(new_lens.size + 1, np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    out = pa.Array.from_buffers(
        pa.large_binary(), new_lens.size,
        [None, pa.py_buffer(new_offs.tobytes()), pa.py_buffer(data[keep].tobytes())],
    ).cast(pa.string())
    return out, new_lens


def _cut_batch(t: pa.Table, data: np.ndarray, offs: np.ndarray, fs: np.ndarray,
               L: int, id_col: str, text_col: str, replace_text: bool) -> pa.Table:
    """Assemble the cut result: (id, clean_text) pairs, or — in
    ``replace_text`` mode — the FULL row with ``text_col`` swapped for
    the cleaned text (the store-rewrite shape).  Emptied docs drop."""
    out, new_lens = _cut_arrays(data, offs, fs, L)
    nonempty = pa.array(new_lens > 0)
    if not replace_text:
        return pa.table({id_col: t.column(id_col).combine_chunks().filter(nonempty),
                         "clean_text": out.filter(nonempty)})
    if "starts" in t.column_names:
        t = t.drop_columns(["starts"])
    t = t.set_column(t.schema.get_field_index(text_col), text_col, out)
    return t.filter(nonempty)


def cut_dup_spans(ds, id_col: str = "doc_id", text_col: str = "text", L: int = 32,
                  stats_out: dict | None = None,
                  broadcast_budget_bytes: int = _DEFAULT_BROADCAST_BUDGET,
                  num_partitions: int | None = None, replace_text: bool = False):
    """Remove every byte covered by a duplicated L-window (Lee et al. cut).

    Returns (id_col, clean_text) for every doc with at least one byte
    surviving — or, with ``replace_text``, the doc's FULL row with
    ``text_col`` replaced by the cleaned text (the store-rewrite shape
    used by ``dedup_cut_store``); a doc fully covered by duplicated
    windows is dropped.  Coverage is the union of flagged [i, i+L) spans
    via the +1/-1 prefix-sum trick — one vectorized pass per batch, no
    per-row Python.  On the partitioned arm the flagged starts come back
    to the corpus stream as per-doc start lists through one
    ``left_outer`` hash join.
    """
    _check_L(L)
    dup_h, dup_h_ref = _dup_hash_set(ds, text_col, L)

    if _pick_arm(dup_h, L, broadcast_budget_bytes, stats_out) == "broadcast":
        dup_hr, dup_g = _dup_gram_set(ds, text_col, L, stats_out, dup_h, dup_h_ref)

        def per_doc(t: pa.Table) -> pa.Table:
            data, offs, starts, _, flag = _flag_windows(t, text_col, L, dup_hr, dup_g)
            return _cut_batch(t, data, offs, starts[flag], L, id_col,
                              text_col, replace_text)

        return ds.map_batches(per_doc, batch_format="pyarrow")

    flagged = _flagged_pairs(ds, id_col, text_col, L, dup_h_ref,
                             num_partitions, stats_out)

    def identity_cut(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        nonempty = pc.greater(pc.binary_length(txt), 0)
        if replace_text:
            return t.filter(nonempty)
        return pa.table({id_col: t.column(id_col).filter(nonempty),
                         "clean_text": txt.filter(nonempty)})

    if flagged is None:
        return ds.map_batches(identity_cut, batch_format="pyarrow")

    def collect(g: pa.Table) -> pa.Table:
        # packed int64 bytes, not list<int64>: Acero's hash join (behind
        # Dataset.join) rejects list-typed non-key fields
        s = np.sort(g.column("start").to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({id_col: g.column(id_col).slice(0, 1),
                         "starts": pa.array([s.tobytes()], pa.large_binary())})

    flag_lists = flagged.groupby(id_col).map_groups(collect, batch_format="pyarrow")
    num_partitions, agg_args = _join_parallelism(num_partitions)
    joined = ds.join(flag_lists, join_type="left_outer",
                     num_partitions=num_partitions, on=(id_col,),
                     aggregator_ray_remote_args=agg_args)

    def cut_joined(t: pa.Table) -> pa.Table:
        data, offs = _flat_utf8(t.column(text_col))
        # unflagged docs carry a null blob -> 0 bytes in the flat view, so
        # the per-row repeat of doc base offsets lines up with `rel`
        sdata, soffs = _flat_utf8(t.column("starts"))
        # copy before the int64 view: the sliced uint8 buffer may not be
        # 8-byte aligned (blob volume is duplicate-bounded, copy is cheap)
        rel = np.frombuffer(sdata.tobytes(), np.int64)
        per_row = np.diff(soffs) // 8
        fs = rel + np.repeat(offs[:-1], per_row)
        return _cut_batch(t, data, offs, fs, L, id_col, text_col, replace_text)

    return joined.map_batches(cut_joined, batch_format="pyarrow")
