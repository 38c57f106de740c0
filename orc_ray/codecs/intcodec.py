"""Block-adaptive integer codec — the RLEv2 analog, vectorized.

The reference encodes integers with RLEv2 (apache/orc
c++/src/RleEncoderV2.cc, java impl/RunLengthIntegerWriterV2.java):
per-512-value "scope" it picks one of SHORT_REPEAT / DIRECT / DELTA /
PATCHED_BASE via `determineEncoding` (width histogram + percentileBits —
SURVEY.md §2.1, probes [P2][P4]).  This module reproduces that
*micro-adaptive selection* with a format designed for array-at-a-time
numpy execution instead of the reference's value-at-a-time loops:

- values are split into fixed 512-value blocks (last block padded with its
  edge value; true length stored, decode truncates) — uniform blocks make
  every step a matrix op over shape (n_blocks, 512);
- per block one of four sub-encodings is chosen by estimated encoded size,
  computed for ALL blocks at once (min/max/delta/width-histogram matrix
  reductions — the percentileBits analog);
    CONST    — whole block one value (covers ORC SHORT_REPEAT + long
               constant runs; the run-length *layer* below covers short
               mixed repeats);
    DIRECT   — frame-of-reference: base = block min, values bit-packed at
               exact width of (max-min)  (this is also the explicit
               FOR+bitpack path the north star mandates for tokens);
    DELTA    — first value + zigzag deltas bit-packed at max delta width;
               width 0 = fixed-delta run (base + k*delta);
    PATCHED  — FOR at ~p90 width with the few wide outliers re-inserted
               from a patch list (gap/value pairs) — PATCHED_BASE analog;
- payloads are stored grouped by (tag, width), so encode/decode does one
  vectorized pack/unpack call per distinct group (<= a few dozen), never a
  per-block Python loop over bit operations.

On top sits an optional run-length layer (`RLE` layout): when the array has
long runs, it is split into (run_values, run_lengths), each recursively
encoded with the block codec — the RLE-proper capability (ByteRLE /
SHORT_REPEAT analog) selected by measured mean run length.

All arithmetic is two's-complement mod 2**64 (numpy wraparound), so any
int64 pattern — including full-range deltas — round-trips exactly.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import align_width, pack, packed_nbytes, unpack

__all__ = ["encode_int64", "decode_int64", "INT_BLOCKS", "INT_RLE"]

BLOCK = 512
T_CONST, T_DIRECT, T_DELTA, T_PATCHED = 0, 1, 2, 3
INT_BLOCKS = 0  # layout ids (first byte of the stream)
INT_RLE = 1

_MAX_PATCHES = 48  # per block; above this PATCHED stops paying off


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.int64)
    with np.errstate(over="ignore"):
        return (x.view(np.uint64) << np.uint64(1)) ^ (x >> np.int64(63)).view(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(u, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).view(np.int64)


_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def _exact_bit_width(x: np.ndarray) -> np.ndarray:
    """Per-element minimal bit width of uint64 values (0 -> 0), exact.

    bit_length(v) == number of powers of two <= v, so one C-level
    searchsorted pass over a 64-entry table — no float math, no copies.
    """
    return np.searchsorted(_POW2, x, side="right")


def _encode_blocks(values: np.ndarray, strategy: str = "speed") -> bytes:
    """Encode an int64 array with the 512-value block format.

    strategy: "speed" aligns pack widths to the fast byte-level kernel set
    (ORC SPEED alignment analog); "compression" keeps exact widths.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = v.size
    if n == 0:
        return struct.pack("<QI", 0, 0)
    nb = (n + BLOCK - 1) // BLOCK
    pad = nb * BLOCK - n
    if pad:
        v = np.concatenate([v, np.full(pad, v[-1], dtype=np.int64)])
    m = v.reshape(nb, BLOCK)
    u = m.view(np.uint64)
    aligned = strategy == "speed"

    def _w(warr):
        return align_width(warr) if aligned else warr

    # selection statistics are computed superblock-at-a-time through small
    # reused scratch buffers: the naive whole-array versions allocate
    # ~5x the input in temporaries, and on this class of host (bounded
    # aggregate memory/fault bandwidth) that — not CPU — limits scaling
    SUPER = 256  # blocks per scratch pass (256*512*8 = 1 MiB working set)
    with np.errstate(over="ignore"):
        mins = m.min(axis=1)
        maxs = m.max(axis=1)
        umins = mins.view(np.uint64)
        span = maxs.view(np.uint64) - umins
        w_direct = _w(_exact_bit_width(span))
        is_const = mins == maxs

        dmin = np.empty(nb, dtype=np.int64)
        dmax = np.empty(nb, dtype=np.int64)
        p90 = np.empty(nb, dtype=np.uint64)
        k = int(BLOCK * 0.90) - 1
        dbuf = np.empty((SUPER, BLOCK - 1), dtype=np.int64)
        pbuf = np.empty((SUPER, BLOCK), dtype=np.uint64)
        for lo in range(0, nb, SUPER):
            hi = min(lo + SUPER, nb)
            db = dbuf[: hi - lo]
            np.subtract(m[lo:hi, 1:], m[lo:hi, :-1], out=db)
            db.min(axis=1, out=dmin[lo:hi])
            db.max(axis=1, out=dmax[lo:hi])
            pb = pbuf[: hi - lo]
            pb[:] = u[lo:hi]
            pb.partition(k, axis=1)
            p90[lo:hi] = pb[:, k]
        # zigzag is monotone in |x| per sign, so block max of zz(delta) is
        # attained at one of the extremes — O(n_blocks), not O(n)
        w_delta = _w(_exact_bit_width(np.maximum(_zigzag(dmin), _zigzag(dmax))))
        fixed_delta = dmin == dmax

        # p90 width per block (percentileBits analog): subtracting the block
        # min preserves order, so partition the raw values and shift after
        w_p90 = _w(_exact_bit_width(p90 - umins))
        # exact outlier count at that width
        thresh = np.zeros(nb, dtype=np.uint64)
        lt64 = w_p90 < 64
        thresh[lt64] = (np.uint64(1) << w_p90[lt64].astype(np.uint64)) - np.uint64(1)
        n_patch = np.empty(nb, dtype=np.int64)
        cmp_buf = np.empty((SUPER, BLOCK), dtype=bool)
        for lo in range(0, nb, SUPER):
            hi = min(lo + SUPER, nb)
            cb = cmp_buf[: hi - lo]
            np.greater(u[lo:hi], (umins + thresh)[lo:hi, None], out=cb)
            cb.sum(axis=1, out=n_patch[lo:hi])
        n_patch[~lt64] = 0

    # candidate sizes in bits (headers amortized/equal, ignored)
    sz_direct = BLOCK * w_direct
    sz_delta = (BLOCK - 1) * w_delta
    sz_patched = BLOCK * w_p90 + n_patch * (16 + 64)
    patch_ok = (n_patch > 0) & (n_patch <= _MAX_PATCHES) & (w_p90 < w_direct)

    tags = np.full(nb, T_DIRECT, dtype=np.uint8)
    widths = w_direct.astype(np.uint8)
    bases = mins.copy()
    extras = np.zeros(nb, dtype=np.int64)

    # require a real saving (>6%) before preferring DELTA over the cheaper
    # (and random-accessible) DIRECT layout — with width alignment the two
    # often land on the same width and differ by one value per block
    use_delta = sz_delta < sz_direct - sz_direct // 16
    tags[use_delta] = T_DELTA
    widths[use_delta] = w_delta[use_delta].astype(np.uint8)
    bases[use_delta] = m[use_delta, 0]

    use_patched = patch_ok & (sz_patched < np.minimum(sz_direct, sz_delta))
    tags[use_patched] = T_PATCHED
    widths[use_patched] = w_p90[use_patched].astype(np.uint8)
    bases[use_patched] = mins[use_patched]

    use_fd = fixed_delta & ~is_const
    tags[use_fd] = T_DELTA
    widths[use_fd] = 0
    bases[use_fd] = m[use_fd, 0]
    extras[use_fd] = dmin[use_fd]  # fixed delta: dmin == dmax

    tags[is_const] = T_CONST
    widths[is_const] = 0
    bases[is_const] = mins[is_const]

    # ---- patches (exact membership from the chosen width, not the estimate)
    patch_pos_parts: list[np.ndarray] = []
    patch_val_parts: list[np.ndarray] = []
    pblocks = np.flatnonzero(tags == T_PATCHED)
    if pblocks.size:
        with np.errstate(over="ignore"):
            sh = u[pblocks] - bases[pblocks].astype(np.uint64)[:, None]
            w = widths[pblocks].astype(np.uint64)[:, None]
            is_out = (sh >> w) > 0
            counts = is_out.sum(axis=1)
            extras[pblocks] = counts
            bid, pos = np.nonzero(is_out)
            patch_pos_parts.append(pos.astype(np.uint16))
            patch_val_parts.append(sh[bid, pos])
    patch_pos = patch_pos_parts[0] if patch_pos_parts else np.empty(0, np.uint16)
    patch_val = patch_val_parts[0] if patch_val_parts else np.empty(0, np.uint64)

    # ---- payload groups: one pack() per distinct (tag, width)
    payload: list[bytes] = []
    with np.errstate(over="ignore"):
        for tag, width, blocks in _groups(tags, widths):
            if width == 0:
                continue
            if tag == T_DIRECT or tag == T_PATCHED:
                src = u if blocks.size == nb else u[blocks]  # skip gather when whole chunk
                sh = src - bases[blocks].astype(np.uint64)[:, None]
                if tag == T_PATCHED:
                    sh &= (np.uint64(1) << np.uint64(width)) - np.uint64(1)
                payload.append(pack(sh.ravel(), width))
            elif tag == T_DELTA:
                d = m[blocks, 1:] - m[blocks, :-1]  # deltas only for chosen blocks
                payload.append(pack(_zigzag(d.ravel()), width))

    head = struct.pack("<QI", n, patch_pos.size)
    return b"".join(
        [
            head,
            tags.tobytes(),
            widths.tobytes(),
            bases.astype("<i8").tobytes(),
            extras.astype("<i8").tobytes(),
            patch_pos.astype("<u2").tobytes(),
            patch_val.astype("<u8").tobytes(),
        ]
        + payload
    )


def _groups(tags: np.ndarray, widths: np.ndarray):
    """Canonical iteration order over (tag, width) payload groups."""
    key = tags.astype(np.int32) * 65 + widths.astype(np.int32)
    for k in np.unique(key):
        tag, width = divmod(int(k), 65)
        if tag in (T_DIRECT, T_DELTA, T_PATCHED):
            yield tag, width, np.flatnonzero(key == k)


def _decode_blocks(data: memoryview) -> np.ndarray:
    n, npatch = struct.unpack_from("<QI", data, 0)
    off = 12
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nb = (n + BLOCK - 1) // BLOCK
    tags = np.frombuffer(data, np.uint8, nb, off); off += nb
    widths = np.frombuffer(data, np.uint8, nb, off); off += nb
    bases = np.frombuffer(data, "<i8", nb, off).astype(np.int64); off += nb * 8
    extras = np.frombuffer(data, "<i8", nb, off).astype(np.int64); off += nb * 8
    patch_pos = np.frombuffer(data, "<u2", npatch, off).astype(np.int64); off += npatch * 2
    patch_val = np.frombuffer(data, "<u8", npatch, off).astype(np.uint64); off += npatch * 8

    out = np.empty((nb, BLOCK), dtype=np.int64)
    with np.errstate(over="ignore"):
        # width-0 tags first (no payload)
        const_b = np.flatnonzero(
            (tags == T_CONST) | (((tags == T_DIRECT) | (tags == T_PATCHED)) & (widths == 0))
        )
        if const_b.size:
            out[const_b] = bases[const_b, None]
        fd_b = np.flatnonzero((tags == T_DELTA) & (widths == 0))
        if fd_b.size:
            steps = np.arange(BLOCK, dtype=np.int64)[None, :]
            out[fd_b] = bases[fd_b, None] + extras[fd_b, None] * steps

        for tag, width, blocks in _groups(tags, widths):
            if width == 0:
                continue
            if tag == T_DIRECT or tag == T_PATCHED:
                cnt = blocks.size * BLOCK
                nbytes = packed_nbytes(cnt, width)
                vals = unpack(np.frombuffer(data, np.uint8, nbytes, off), cnt, width)
                off += nbytes
                out[blocks] = (
                    vals.reshape(-1, BLOCK) + bases[blocks].astype(np.uint64)[:, None]
                ).view(np.int64)
            elif tag == T_DELTA:
                cnt = blocks.size * (BLOCK - 1)
                nbytes = packed_nbytes(cnt, width)
                zz = unpack(np.frombuffer(data, np.uint8, nbytes, off), cnt, width)
                off += nbytes
                d = _unzigzag(zz).reshape(-1, BLOCK - 1)
                acc = np.empty((blocks.size, BLOCK), dtype=np.int64)
                acc[:, 0] = bases[blocks]
                acc[:, 1:] = d
                out[blocks] = np.cumsum(acc.view(np.uint64), axis=1, dtype=np.uint64).view(np.int64)

        # re-insert patches
        if npatch:
            pblocks = np.flatnonzero(tags == T_PATCHED)
            counts = extras[pblocks]
            bid = np.repeat(pblocks, counts)
            flat = bid * BLOCK + patch_pos
            out.ravel()[flat] = (bases[bid].astype(np.uint64) + patch_val).view(np.int64)

    return out.ravel()[:n]


def _run_lengths(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_values, run_lengths) of an int64 array."""
    if v.size == 0:
        return v, np.empty(0, dtype=np.int64)
    change = np.empty(v.size, dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, v.size))
    return v[starts], lengths


def encode_int64(values: np.ndarray, *, min_run_ratio: float = 2.5, strategy: str = "speed") -> bytes:
    """Encode int64 values; auto-select RLE vs block layout by run structure.

    The first byte is the layout id.  ``min_run_ratio`` is the mean run
    length above which the run-length layer wins (selection heuristic, the
    analog of ORC's fixedRunLength tracking in determineEncoding).
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size >= 8:
        # sample-based run probe first: full run detection costs extra passes
        # and loses on run-free data (the common token case)
        probe = v[: 1 << 16]
        probe_runs = 1 + int(np.count_nonzero(probe[1:] != probe[:-1]))
        if probe.size / probe_runs >= min_run_ratio:
            run_vals, run_lens = _run_lengths(v)
            if v.size / max(run_vals.size, 1) >= min_run_ratio:
                a = _encode_blocks(run_vals, strategy)
                b = _encode_blocks(run_lens, strategy)
                return b"".join([bytes([INT_RLE]), struct.pack("<I", len(a)), a, b])
    return bytes([INT_BLOCKS]) + _encode_blocks(v, strategy)


def decode_int64(data: bytes | memoryview) -> np.ndarray:
    data = memoryview(data)
    layout = data[0]
    if layout == INT_BLOCKS:
        return _decode_blocks(data[1:])
    if layout == INT_RLE:
        (alen,) = struct.unpack_from("<I", data, 1)
        run_vals = _decode_blocks(data[5 : 5 + alen])
        run_lens = _decode_blocks(data[5 + alen :])
        return np.repeat(run_vals, run_lens)
    raise ValueError(f"unknown int layout {layout}")
