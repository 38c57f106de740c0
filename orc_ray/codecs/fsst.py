"""FSST — Fast Static Symbol Table string compression, vectorized.

Not part of the reference (ORC compresses strings with dictionary + generic
block codecs); mandated by the north star on top of ORC's stack.  Algorithm
from the public paper: Boncz, Neumann, Freitag, "FSST: Fast Random Access
String Compression", VLDB 2020 — a table of <=255 symbols of 1..8 bytes,
greedy longest-match encoding, decode as a pure table gather.

Differences from the paper's C implementation, chosen for numpy-style
array-at-a-time execution:

- every 1..8-byte window is packed into a little-endian uint64 key (one
  rolling build, 8 shift/or passes), so symbol matching per length is a
  plain integer ``searchsorted`` against the sorted symbol keys — no
  hashing, no per-byte loops;
- the greedy parse runs in lockstep *across strings*: each round advances
  every still-active string by one symbol (vectorized gather of the
  precomputed longest-match at each position), so Python-level iteration
  count is max-symbols-per-string, not total bytes;
- escaped literal bytes are stored out-of-band in a side buffer (code 255
  = "take next literal"), which keeps the code stream uniform and decode
  a single flat gather — no in-band escape ambiguity;
- the symbol table is trained in one counting pass over a leading sample,
  scored by bytes saved (count * (L-1), or count for single bytes).

Encode output is (codes, literals); per-string boundaries are carried by
the caller as original byte lengths (decode splits the flat output).
"""

from __future__ import annotations

import numpy as np

__all__ = ["train", "encode", "decode", "SymbolTable", "serialize_table", "deserialize_table"]

ESCAPE = 255
MAX_SYMBOLS = 255  # code 255 reserved for escape
MAX_LEN = 8


def _rolling_keys(concat: np.ndarray) -> np.ndarray:
    """uint64 key per position: bytes [i, i+8) packed little-endian (zero-padded)."""
    n = concat.size
    pad = np.zeros(n + 8, dtype=np.uint8)
    pad[:n] = concat
    r = np.zeros(n, dtype=np.uint64)
    for i in range(8):
        r |= pad[i : i + n].astype(np.uint64) << np.uint64(8 * i)
    return r


_MASKS = np.array([(1 << (8 * L)) - 1 if L < 8 else 0xFFFFFFFFFFFFFFFF for L in range(9)], dtype=np.uint64)


class SymbolTable:
    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        # decode side: flat buffer + offsets/lengths
        self.lengths = np.array([len(s) for s in symbols], dtype=np.int64)
        self.flat = np.frombuffer(b"".join(symbols), dtype=np.uint8)
        self.offsets = np.zeros(len(symbols), dtype=np.int64)
        if len(symbols):
            self.offsets[1:] = np.cumsum(self.lengths)[:-1]
        # encode side: per length L, sorted uint64 keys + code ids
        self._by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._single = np.full(256, -1, dtype=np.int16)
        for L in range(1, MAX_LEN + 1):
            idx = [i for i, s in enumerate(symbols) if len(s) == L]
            if not idx:
                continue
            if L == 1:
                for i in idx:
                    self._single[symbols[i][0]] = i
                continue
            keys = np.array(
                [int.from_bytes(symbols[i], "little") for i in idx], dtype=np.uint64
            )
            order = np.argsort(keys)
            self._by_len[L] = (keys[order], np.array(idx, dtype=np.int16)[order])


def serialize_table(t: SymbolTable) -> bytes:
    head = bytes([len(t.symbols)]) + t.lengths.astype(np.uint8).tobytes()
    return head + t.flat.tobytes()


def deserialize_table(data: bytes | memoryview) -> tuple[SymbolTable, int]:
    data = memoryview(data)
    n = data[0]
    lens = np.frombuffer(data, np.uint8, n, 1)
    off = 1 + n
    symbols = []
    for L in lens:
        symbols.append(bytes(data[off : off + L]))
        off += int(L)
    return SymbolTable(symbols), off


def train(concat: np.ndarray, offsets: np.ndarray, sample_bytes: int = 1 << 16) -> SymbolTable:
    """Build a symbol table from (a leading sample of) the corpus.

    ``concat`` is the uint8 byte stream of all strings; ``offsets`` the
    int64 per-string boundaries (len n+1).  Deterministic: leading-prefix
    sample, ties broken by symbol bytes.
    """
    n_strings = offsets.size - 1
    if concat.size == 0 or n_strings == 0:
        return SymbolTable([])
    if concat.size > sample_bytes:
        cut_str = int(np.searchsorted(offsets, sample_bytes, side="left"))
        cut_str = max(1, min(cut_str, n_strings))
        end = int(offsets[cut_str])
        sample = concat[:end]
        soff = offsets[: cut_str + 1]
    else:
        sample = concat
        soff = offsets
    str_ids = np.repeat(np.arange(soff.size - 1, dtype=np.int64), np.diff(soff))
    keys = _rolling_keys(sample)
    n = sample.size

    cands: list[tuple[float, bytes]] = []
    for L in range(1, MAX_LEN + 1):
        if n < L:
            break
        k = keys[: n - L + 1] & _MASKS[L]
        if L > 1:
            k = k[str_ids[: n - L + 1] == str_ids[L - 1 :]]
        if k.size == 0:
            continue
        uniq, counts = np.unique(k, return_counts=True)
        if L == 1:
            keep = counts > 0
        else:
            keep = counts >= 2
        uniq, counts = uniq[keep], counts[keep]
        # bytes saved: escape(2B)->code(1B) for L==1; ~L codes -> 1 for L>1
        gain = counts.astype(np.float64) * (1.0 if L == 1 else L - 1.0)
        if gain.size > 512:
            top = np.argpartition(gain, -512)[-512:]
            uniq, gain = uniq[top], gain[top]
        raw = uniq.astype("<u8").view(np.uint8).reshape(-1, 8)[:, :L]
        for i in range(raw.shape[0]):
            cands.append((float(gain[i]), raw[i].tobytes()))

    cands.sort(key=lambda x: (-x[0], x[1]))
    chosen: list[bytes] = []
    seen: set[bytes] = set()
    for score, sym in cands:
        if score <= 1.0 and len(sym) > 1:
            continue
        if sym in seen:
            continue
        seen.add(sym)
        chosen.append(sym)
        if len(chosen) >= MAX_SYMBOLS:
            break
    return SymbolTable(chosen)


def _match_at(p: np.ndarray, avail: np.ndarray, keys: np.ndarray, concat: np.ndarray, table: SymbolTable):
    """Longest symbol match at each position in ``p`` (avail = bytes left)."""
    codes = np.full(p.size, ESCAPE, dtype=np.int16)
    lens = np.ones(p.size, dtype=np.int32)
    todo = np.ones(p.size, dtype=bool)
    kp = keys[p]
    for L in sorted(table._by_len, reverse=True):  # longest first
        cand = np.flatnonzero(todo & (avail >= L))
        if not cand.size:
            continue
        sym_sorted, code_ids = table._by_len[L]
        k = kp[cand] & _MASKS[L]
        pi = np.searchsorted(sym_sorted, k)
        pi[pi == sym_sorted.size] = 0
        hit = sym_sorted[pi] == k
        h = cand[hit]
        codes[h] = code_ids[pi[hit]]
        lens[h] = L
        todo[h] = False
    cand = np.flatnonzero(todo)
    if cand.size:
        c1 = table._single[concat[p[cand]]]
        hit = c1 >= 0
        codes[cand[hit]] = c1[hit]
    return codes, lens


def encode(
    concat: np.ndarray, offsets: np.ndarray, table: SymbolTable
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match encode.  Returns (codes uint8, literals uint8).

    Codes are the concatenated per-string symbol streams in string order;
    code 255 consumes the next byte from ``literals``.  The parse advances
    all strings in lockstep: per round, one searchsorted probe per symbol
    length over just the active positions (lazy matching — total probe work
    is O(total_codes * n_lengths), independent of corpus size).
    """
    n_strings = offsets.size - 1
    if concat.size == 0:
        return np.empty(0, np.uint8), np.empty(0, np.uint8)
    keys = _rolling_keys(concat)

    cur = offsets[:-1].astype(np.int64).copy()
    ends = offsets[1:].astype(np.int64)
    active = np.flatnonzero(cur < ends)
    sid_parts, code_parts, pos_parts = [], [], []
    while active.size:
        p = cur[active]
        codes_r, lens_r = _match_at(p, ends[active] - p, keys, concat, table)
        sid_parts.append(active.copy())
        code_parts.append(codes_r)
        pos_parts.append(p)
        cur[active] = p + lens_r
        active = active[cur[active] < ends[active]]

    sids = np.concatenate(sid_parts)
    codes = np.concatenate(code_parts)
    poss = np.concatenate(pos_parts)
    rounds = np.concatenate([np.full(a.size, i, dtype=np.int32) for i, a in enumerate(sid_parts)])
    order = np.lexsort((rounds, sids))
    codes = codes[order]
    poss = poss[order]
    esc = codes == ESCAPE
    literals = concat[poss[esc]]
    return codes.astype(np.uint8), literals


def decode(codes: np.ndarray, literals: np.ndarray, table: SymbolTable) -> np.ndarray:
    """Inverse of :func:`encode`: flat uint8 output byte stream."""
    if codes.size == 0:
        return np.empty(0, np.uint8)
    codes = codes.astype(np.int64, copy=False)
    esc = codes == ESCAPE
    # extended flat buffer: symbols then literals; k-th escape maps past syms
    ext = np.concatenate([table.flat, literals.astype(np.uint8, copy=False)])
    lens = np.empty(codes.size, dtype=np.int64)
    offs = np.empty(codes.size, dtype=np.int64)
    ncs = ~esc
    lens[ncs] = table.lengths[codes[ncs]]
    offs[ncs] = table.offsets[codes[ncs]]
    lens[esc] = 1
    offs[esc] = table.flat.size + np.arange(int(esc.sum()), dtype=np.int64)
    total = int(lens.sum())
    starts = np.zeros(codes.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    gather = np.repeat(offs - starts, lens) + np.arange(total, dtype=np.int64)
    return ext[gather]
