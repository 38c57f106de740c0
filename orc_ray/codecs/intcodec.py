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

The codec is dtype-generic over int32 and int64 (layouts BLOCKS32 /
BLOCKS64): int32 sources — the `tokens` child column, list lengths, dict
indices — are encoded AND decoded entirely in 4-byte arithmetic, halving
the memory traffic of the dominant columns (the r1 scaling fix; this
class of host is bandwidth-bound, not CPU-bound).  All arithmetic is
two's-complement mod 2**width (numpy wraparound), so any bit pattern of
the source dtype round-trips exactly.

On top sits an optional run-length layer (`RLE` layout): when the array
has long runs, it is split into (run_values, run_lengths), each
recursively encoded with the block codec — the RLE-proper capability
(ByteRLE / SHORT_REPEAT analog) selected by measured mean run length.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import ALIGNED_WIDTHS, align_width, pack, packed_nbytes, unpack
from .varint import decode_svarints, decode_varints, encode_svarints, encode_varints

__all__ = ["encode_ints", "decode_ints", "encode_int64", "decode_int64", "INT_BLOCKS", "INT_RLE", "INT_BLOCKS32"]

BLOCK = 512
T_CONST, T_DIRECT, T_DELTA, T_PATCHED = 0, 1, 2, 3
INT_BLOCKS = 0  # layout ids (first byte of the stream)
INT_RLE = 1
INT_BLOCKS32 = 2
INT_V1 = 3  # RLEv1-analog layout (EncodeOptions file_version "0.11")
INT_V1_32 = 4
INT_BLOCKS_SHUF = 5  # block layout with byte-shuffled payload groups (v5)
INT_BLOCKS32_SHUF = 6

_MAX_PATCHES = 48  # per block; above this PATCHED stops paying off

# byte-shuffle candidacy: streams below _SHUF_MIN_N values keep the plain
# (interleaved) layout outright — the measured losers (decimal lo-words,
# string-offset lanes with periodic structure) all live at a few thousand
# values where the absolute stakes are a few hundred bytes.  At or above
# it the encoder MEASURES (after the (tag, width) groups are known, so
# streams with no qualifying group skip the probe): plane-separated vs
# interleaved compression of a _SHUF_SAMPLE-value raw-byte prefix through
# the framing compressor (zstd level 1, see _planes_beat_interleaved) —
# i.i.d./skewed streams (tokens +9.4%, uniform-17-bit +11.6%, lognormal
# +7.2%, unit-norm float embeddings +8%) shuffle, while streams whose
# interleaved bytes carry sequential match structure stay plain.  The
# decision is stream-level, deterministic (pure function of the values),
# and carried by the layout byte / codec name itself, so readers never
# recompute it.  Probe cost: isz+1 zstd passes over <=256 KiB — well
# under 1 ms against the stream it sizes.
_SHUF_MIN_N = 4096
_SHUF_SAMPLE = 32768


def _planes_beat_interleaved(raw: bytes, isz: int) -> bool:
    """Probe core: does plane-separated compression beat interleaved on
    this value-aligned byte sample?  Each plane is compressed SEPARATELY —
    compressing a transposed small sample as one buffer would be blind,
    because a transpose permutes bytes without changing the histogram, and
    inside a single zstd block the literal entropy table sees only the
    histogram (measured: identical sizes on <=128 KiB float samples that
    gain 8-29% at full stream size, where each plane spans whole framing
    blocks).  A ~3% margin absorbs the proxy error near the boundary."""
    import pyarrow as pa  # lazy: keep module import numpy-only

    c = pa.Codec("zstd", compression_level=1)
    z_inter = len(c.compress(raw))
    a = np.frombuffer(raw, np.uint8).reshape(-1, isz)
    z_planes = sum(
        len(c.compress(np.ascontiguousarray(a[:, p]).tobytes())) for p in range(isz)
    )
    return z_planes < z_inter - (z_inter >> 5)


def _shuffle_wins(v: np.ndarray, strategy: str, dt: _Dt) -> bool:
    """Measured stream-level shuffle decision (see _SHUF_MIN_N note): the
    probe runs on the raw value bytes of a prefix — the FOR-shifted packed
    lanes share their low planes with the raw representation (base-0 fast
    path), and the empty high planes cost both layouts equally."""
    s = np.ascontiguousarray(v[:_SHUF_SAMPLE])
    return _planes_beat_interleaved(s.tobytes(), dt.isize)


def _group_shuffled(tag: int, width: int) -> bool:
    """Whether a (tag, width) payload group is stored byte-shuffled in the
    SHUF layouts: whole-byte widths > 1 byte only, so the transform is a
    pure transpose (no bit boundaries move) and sub-byte packs are
    untouched.  DIRECT/PATCHED only: FOR-shifted values are (near-)i.i.d.
    draws whose entropy concentrates per byte plane, while DELTA streams
    carry sequential match structure that interleaving preserves for the
    second-stage compressor (measured: shuffling deltas GREW timestamp
    streams ~9%).  The predicate is a pure function of (tag, width) —
    encoder and decoder agree with zero extra metadata."""
    return tag != T_DELTA and width > 8 and width % 8 == 0


def _byte_shuffle(gb: bytes, nbytes_per_value: int) -> bytes:
    """Byte-plane transpose of a packed value-major payload: all byte-0s,
    then all byte-1s, ... (the HDF5/Blosc shuffle filter applied to the
    FOR-shifted fixed-width lanes).  Skewed value distributions — the
    Zipf token corpus above all — put most of their entropy in the low
    plane; separating planes lets the second-stage compressor's entropy
    coder model each plane's (very different) byte distribution instead
    of their interleaved mixture: measured 1.089 -> 0.988 B/token on the
    north-star corpus at the default framing level.  Same length, so all
    group/block payload offsets are unchanged and selective block decode
    stays O(1)-addressable (two plane reads instead of one slice)."""
    a = np.frombuffer(gb, np.uint8).reshape(-1, nbytes_per_value)
    return np.ascontiguousarray(a.T).tobytes()


class _Dt:
    """Per-width dtype constants (64- and 32-bit lanes)."""

    def __init__(self, bits: int):
        self.bits = bits
        self.idt = np.int64 if bits == 64 else np.int32
        self.udt = np.uint64 if bits == 64 else np.uint32
        self.ile = "<i8" if bits == 64 else "<i4"
        self.ule = "<u8" if bits == 64 else "<u4"
        self.isize = bits // 8
        self.shift = self.udt(bits - 1)
        self.one = self.udt(1)
        self.zero = self.udt(0)
        self.pow2 = (self.one << np.arange(bits, dtype=self.udt)).astype(self.udt)


_DT64 = _Dt(64)
_DT32 = _Dt(32)


def _zigzag(x: np.ndarray, dt: _Dt) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=dt.idt)
    with np.errstate(over="ignore"):
        return (x.view(dt.udt) << dt.one) ^ (x >> dt.idt(dt.bits - 1)).view(dt.udt)


def _unzigzag(u: np.ndarray, dt: _Dt) -> np.ndarray:
    u = np.ascontiguousarray(u, dtype=dt.udt)
    with np.errstate(over="ignore"):
        return ((u >> dt.one) ^ (dt.zero - (u & dt.one))).view(dt.idt)


def _exact_bit_width(x: np.ndarray, dt: _Dt) -> np.ndarray:
    """Per-element minimal bit width of unsigned values (0 -> 0), exact.

    bit_length(v) == number of powers of two <= v, so one C-level
    searchsorted pass over a small table — no float math, no copies.
    """
    return np.searchsorted(dt.pow2, x, side="right")


def _encode_blocks(
    values: np.ndarray, strategy: str = "speed", dt: _Dt = _DT64, shuffle: bool = False
) -> bytes:
    """Encode an integer array with the 512-value block format (fixed
    shuffle decision; see :func:`_encode_blocks_ex` for the measured one)."""
    return _encode_blocks_ex(values, strategy, dt, shuffle)[1]


def _encode_blocks_ex(
    values: np.ndarray, strategy: str = "speed", dt: _Dt = _DT64, shuffle=False
) -> tuple[bool, bytes]:
    """Encode an integer array with the 512-value block format.

    strategy: "speed" aligns pack widths to the fast byte-level kernel set
    (ORC SPEED alignment analog); "compression" keeps exact widths.
    shuffle: byte-transpose whole-byte payload groups (SHUF layouts) —
    see :func:`_byte_shuffle`.  Pass the string "auto" to decide here,
    after the (tag, width) groups are known: streams with no qualifying
    group stay plain without paying the probe, otherwise the measured
    :func:`_shuffle_wins` verdict applies.  Returns (used_shuffle, bytes).
    """
    v = np.ascontiguousarray(values, dtype=dt.idt)
    n = v.size
    if n == 0:
        return False, struct.pack("<QI4I", 0, 0, 0, 0, 0, 0)
    nb = (n + BLOCK - 1) // BLOCK
    nfull = n // BLOCK
    tail = n - nfull * BLOCK
    # full blocks are a zero-copy reshape VIEW of the input; only the tail
    # block (< 512 values) is copied+padded.  The old whole-array pad
    # concatenate copied the entire column — on this host class (bounded
    # aggregate fault bandwidth) that copy, not CPU, limited scaling.
    m = v[: nfull * BLOCK].reshape(nfull, BLOCK)
    u = m.view(dt.udt)
    if tail:
        tail_blk = np.empty(BLOCK, dtype=dt.idt)
        tail_blk[:tail] = v[nfull * BLOCK :]
        tail_blk[tail:] = v[-1]
        t_m = tail_blk.reshape(1, BLOCK)
        t_u = t_m.view(dt.udt)
    parts_src = [(m, u, 0)] + ([(t_m, t_u, nfull)] if tail else [])
    aligned = strategy == "speed"

    def _w(warr):
        return align_width(warr) if aligned else warr

    # selection statistics are computed superblock-at-a-time through small
    # reused scratch buffers: the naive whole-array versions allocate
    # ~5x the input in temporaries, and on this class of host (bounded
    # aggregate memory/fault bandwidth) that — not CPU — limits scaling
    SUPER = 256  # blocks per scratch pass (256*512*8 = 1 MiB working set)
    with np.errstate(over="ignore"):
        mins = np.empty(nb, dtype=dt.idt)
        maxs = np.empty(nb, dtype=dt.idt)
        dmin = np.empty(nb, dtype=dt.idt)
        dmax = np.empty(nb, dtype=dt.idt)
        p90 = np.empty(nb, dtype=dt.udt)
        n_patch = np.empty(nb, dtype=np.int64)
        k = int(BLOCK * 0.90) - 1
        dbuf = np.empty((SUPER, BLOCK - 1), dtype=dt.idt)
        pbuf = np.empty((SUPER, BLOCK), dtype=dt.idt)
        ubuf = np.empty((SUPER, BLOCK), dtype=dt.idt)
        cmp_buf = np.empty((SUPER, BLOCK), dtype=bool)
        # ONE main-memory read per superblock: every statistic (deltas,
        # min/max/p90 via a multi-kth partition, outlier counts) is
        # computed from the cache-resident scratch copy.  The signed
        # partition makes p90 a signed-order percentile; (x - min) maps
        # signed order to unsigned order, so the width math is unchanged.
        for mp, up, base in parts_src:
            nbp = mp.shape[0]
            for lo in range(0, nbp, SUPER):
                hi = min(lo + SUPER, nbp)
                sl = slice(base + lo, base + hi)
                pb = pbuf[: hi - lo]
                pb[:] = mp[lo:hi]                       # the only DRAM read
                db = dbuf[: hi - lo]
                np.subtract(pb[:, 1:], pb[:, :-1], out=db)
                db.min(axis=1, out=dmin[sl])
                db.max(axis=1, out=dmax[sl])
                # min/max via SIMD reductions (cheaper than extra kth
                # targets in the introselect), then a single-kth partition
                # for the p90 element — same values, ~25% less stats time
                pb.min(axis=1, out=mins[sl])
                pb.max(axis=1, out=maxs[sl])
                ub = ubuf[: hi - lo]
                np.subtract(pb, mins[sl][:, None], out=ub)
                ubu = ub.view(dt.udt)
                # p90 short-circuit: bit width is monotone in the unsigned
                # shifted value, and PATCHED is rejected by the
                # w_p90 < w_direct clause (both sides _w-aligned) no matter
                # what n_patch says whenever align(width(p90)) ==
                # align(width(span)).  That holds iff the p90 element
                # >= 2^prev, where prev is the aligned width just BELOW
                # align(W) (exact W-1 in compression mode) — i.e. iff
                # count(ub < 2^prev) < k+1.  For such blocks p90 := span
                # and n_patch := 0 reproduce the selection — and the
                # bytes — exactly, and the introselect only ever runs on
                # blocks whose p90 genuinely drops an alignment bucket
                # (the partition was ~25% of token-corpus encode time).
                span_l = (maxs[sl] - mins[sl]).view(dt.udt)
                W_l = _exact_bit_width(span_l, dt)
                if aligned:
                    prev_l = ALIGNED_WIDTHS[
                        np.maximum(np.searchsorted(ALIGNED_WIDTHS, W_l, side="left") - 1, 0)
                    ]
                else:
                    prev_l = W_l - 1
                thr = np.zeros(hi - lo, dtype=dt.udt)
                wpos = W_l > 0
                thr[wpos] = dt.one << prev_l[wpos].astype(dt.udt)
                cb = cmp_buf[: hi - lo]
                np.less(ubu, thr[:, None], out=cb)
                cnt_low = cb.sum(axis=1)
                p90[sl] = span_l
                n_patch[sl] = 0
                slow = np.flatnonzero(wpos & (cnt_low >= k + 1))
                if slow.size:
                    # signed order of pb == unsigned order of ub, so the
                    # kth of the unsigned copy IS (kth of pb) - min
                    sub = ubu[slow]  # copy; introselect it in place
                    sub.partition(k, axis=1)
                    p90v = sub[:, k]
                    gidx = base + lo + slow
                    p90[gidx] = p90v
                    # outlier count at the (aligned) p90 width, from cache
                    wp = _w(_exact_bit_width(p90v, dt))
                    th = np.zeros(slow.size, dtype=dt.udt)
                    ltb_l = wp < dt.bits
                    th[ltb_l] = (dt.one << wp[ltb_l].astype(dt.udt)) - dt.one
                    n_patch[gidx] = (sub > th[:, None]).sum(axis=1)
                    n_patch[gidx[~ltb_l]] = 0
        umins = mins.view(dt.udt)
        span = maxs.view(dt.udt) - umins
        w_direct = _w(_exact_bit_width(span, dt))
        is_const = mins == maxs
        # zigzag is monotone in |x| per sign, so block max of zz(delta) is
        # attained at one of the extremes — O(n_blocks), not O(n)
        w_delta = _w(_exact_bit_width(np.maximum(_zigzag(dmin, dt), _zigzag(dmax, dt)), dt))
        fixed_delta = dmin == dmax
        # p90 span width per block (percentileBits analog)
        w_p90 = _w(_exact_bit_width(p90, dt))

    # candidate sizes in bits (headers amortized/equal, ignored)
    sz_direct = BLOCK * w_direct
    sz_delta = (BLOCK - 1) * w_delta
    sz_patched = BLOCK * w_p90 + n_patch * (16 + dt.bits)
    patch_ok = (n_patch > 0) & (n_patch <= _MAX_PATCHES) & (w_p90 < w_direct)

    tags = np.full(nb, T_DIRECT, dtype=np.uint8)
    widths = w_direct.astype(np.uint8)
    bases = mins.copy()
    extras = np.zeros(nb, dtype=dt.idt)
    firsts = v[np.arange(nb, dtype=np.int64) * BLOCK]  # first value per block

    # require a real saving (>6%) before preferring DELTA over the cheaper
    # (and random-accessible) DIRECT layout — with width alignment the two
    # often land on the same width and differ by one value per block
    use_delta = sz_delta < sz_direct - sz_direct // 16
    tags[use_delta] = T_DELTA
    widths[use_delta] = w_delta[use_delta].astype(np.uint8)
    bases[use_delta] = firsts[use_delta]

    use_patched = patch_ok & (sz_patched < np.minimum(sz_direct, sz_delta))
    tags[use_patched] = T_PATCHED
    widths[use_patched] = w_p90[use_patched].astype(np.uint8)
    bases[use_patched] = mins[use_patched]

    use_fd = fixed_delta & ~is_const
    tags[use_fd] = T_DELTA
    widths[use_fd] = 0
    bases[use_fd] = firsts[use_fd]
    extras[use_fd] = dmin[use_fd]  # fixed delta: dmin == dmax

    tags[is_const] = T_CONST
    widths[is_const] = 0
    bases[is_const] = mins[is_const]

    # base-0 fast path: with aligned widths a small positive block min
    # usually doesn't change the packed width, so drop the FOR shift — the
    # DIRECT payload then packs straight from the source view (no subtract
    # temp; the dominant token-corpus case hits this on nearly every block)
    if aligned:
        w0 = _w(_exact_bit_width(maxs.view(dt.udt), dt))
        zb = (tags == T_DIRECT) & (mins >= 0) & (w0 == w_direct)
        bases[zb] = 0

    def _rows(blocks: np.ndarray) -> np.ndarray:
        """(k, BLOCK) unsigned rows for the given block ids; zero-copy when
        the selection is exactly all full blocks and there is no tail."""
        has_tail = tail and blocks.size and blocks[-1] == nb - 1
        fullb = blocks[:-1] if has_tail else blocks
        out_parts = []
        if fullb.size:
            out_parts.append(u if fullb.size == nfull else u[fullb])
        if has_tail:
            out_parts.append(t_u)
        if not out_parts:
            return np.empty((0, BLOCK), dtype=dt.udt)
        return out_parts[0] if len(out_parts) == 1 else np.concatenate(out_parts)

    # ---- patches (exact membership from the chosen width, not the estimate)
    patch_pos_parts: list[np.ndarray] = []
    patch_val_parts: list[np.ndarray] = []
    pblocks = np.flatnonzero(tags == T_PATCHED)
    if pblocks.size:
        with np.errstate(over="ignore"):
            sh = _rows(pblocks) - bases[pblocks].view(dt.udt)[:, None]
            w = widths[pblocks].astype(dt.udt)[:, None]
            is_out = (sh >> w) > 0
            counts = is_out.sum(axis=1)
            extras[pblocks] = counts
            bid, pos = np.nonzero(is_out)
            patch_pos_parts.append(pos.astype(np.uint16))
            patch_val_parts.append(sh[bid, pos])
    patch_pos = patch_pos_parts[0] if patch_pos_parts else np.empty(0, np.uint16)
    patch_val = patch_val_parts[0] if patch_val_parts else np.empty(0, dt.udt)

    # ---- payload groups: one pack() per distinct (tag, width).  A block's
    # packed payload is byte-aligned whenever (values_per_block*width) % 8
    # == 0 (always for DIRECT/PATCHED: 512 values), so the full-block part
    # and the tail block pack separately with identical bytes — no
    # whole-group concatenate.
    if shuffle == "auto":
        qualifies = any(
            width and _group_shuffled(tag, width) for tag, width, _ in _groups(tags, widths)
        )
        shuffle = qualifies and _shuffle_wins(v, strategy, dt)

    payload: list[bytes] = []

    def _emit(chunks: list[bytes], tag: int, width: int) -> None:
        """Append one group's payload chunks, byte-shuffling the group as a
        single plane domain when the SHUF layout applies to this group."""
        if shuffle and chunks and _group_shuffled(tag, width):
            gb = chunks[0] if len(chunks) == 1 else b"".join(chunks)
            payload.append(_byte_shuffle(gb, width // 8))
        else:
            payload.extend(chunks)

    with np.errstate(over="ignore"):
        for tag, width, blocks in _groups(tags, widths):
            if width == 0:
                continue
            if tag == T_DIRECT or tag == T_PATCHED:
                has_tail = tail and blocks[-1] == nb - 1
                fullb = blocks[:-1] if has_tail else blocks
                chunks = []
                if fullb.size:
                    src = u if fullb.size == nfull else u[fullb]
                    if tag == T_DIRECT and not bases[fullb].any():
                        sh = src  # base-0 fast path: no subtract temp
                    else:
                        sh = src - bases[fullb].view(dt.udt)[:, None]
                        if tag == T_PATCHED:
                            sh &= (dt.one << dt.udt(width)) - dt.one
                    chunks.append(pack(sh.ravel(), width))
                if has_tail:
                    base_t = bases[nb - 1 : nb].view(dt.udt)[0]
                    sht = t_u[0] if (tag == T_DIRECT and base_t == 0) else t_u[0] - base_t
                    if tag == T_PATCHED:
                        sht = sht & ((dt.one << dt.udt(width)) - dt.one)
                    chunks.append(pack(sht, width))
                _emit(chunks, tag, width)
            elif tag == T_DELTA:
                has_tail = tail and blocks[-1] == nb - 1
                fullb = blocks[:-1] if has_tail else blocks
                if has_tail and ((BLOCK - 1) * width) % 8 != 0:
                    # rare (compression strategy, odd width): bit-packed
                    # across the block boundary — concatenate the deltas
                    d = np.concatenate(
                        [
                            (m[fullb, 1:] - m[fullb, :-1]).ravel() if fullb.size else np.empty(0, dt.idt),
                            t_m[0, 1:] - t_m[0, :-1],
                        ]
                    )
                    _emit([pack(_zigzag(d, dt), width)], tag, width)
                else:
                    chunks = []
                    if fullb.size:
                        d = m[fullb, 1:] - m[fullb, :-1]
                        chunks.append(pack(_zigzag(d.ravel(), dt), width))
                    if has_tail:
                        dtl = t_m[0, 1:] - t_m[0, :-1]
                        chunks.append(pack(_zigzag(dtl, dt), width))
                    _emit(chunks, tag, width)

    # per-block metadata as zigzag/plain varints (SerializationUtils
    # analog, codecs/varint.py) instead of fixed 8-byte words — the
    # reference's writeVslong/writeVulong streams; section byte lengths
    # ride in the head so decode parses bounded slices
    bases_b = encode_svarints(bases.astype(np.int64))
    extras_b = encode_svarints(extras.astype(np.int64))
    ppos_b = encode_varints(patch_pos.astype(np.uint64))
    pval_b = encode_varints(patch_val.astype(np.uint64))
    head = struct.pack(
        "<QI4I", n, patch_pos.size, len(bases_b), len(extras_b), len(ppos_b), len(pval_b)
    )
    return bool(shuffle), b"".join(
        [head, tags.tobytes(), widths.tobytes(), bases_b, extras_b, ppos_b, pval_b] + payload
    )


def _groups(tags: np.ndarray, widths: np.ndarray):
    """Canonical iteration order over (tag, width) payload groups."""
    key = tags.astype(np.int32) * 65 + widths.astype(np.int32)
    for k in np.unique(key):
        tag, width = divmod(int(k), 65)
        if tag in (T_DIRECT, T_DELTA, T_PATCHED):
            yield tag, width, np.flatnonzero(key == k)


def _decode_blocks(
    data: memoryview,
    dt: _Dt = _DT64,
    block_sel: np.ndarray | None = None,
    shuffled: bool = False,
) -> np.ndarray:
    """Decode the block format; ``block_sel`` (sorted block indices)
    decodes ONLY those blocks' rows (the seek-to-row-group analog) —
    payload offsets of skipped groups are computed, not decoded.
    ``shuffled`` selects the SHUF layouts' byte-plane payload order; group
    byte lengths are identical, so all offset math is shared."""
    n, npatch, len_b, len_e, len_pp, len_pv = struct.unpack_from("<QI4I", data, 0)
    off = 28
    if n == 0:
        return np.empty(0, dtype=dt.idt)
    nb = (n + BLOCK - 1) // BLOCK
    tags = np.frombuffer(data, np.uint8, nb, off); off += nb
    widths = np.frombuffer(data, np.uint8, nb, off); off += nb
    bases = decode_svarints(data[off : off + len_b], nb)[0].astype(dt.idt); off += len_b
    extras = decode_svarints(data[off : off + len_e], nb)[0].astype(dt.idt); off += len_e
    patch_pos = decode_varints(data[off : off + len_pp], npatch)[0].astype(np.int64); off += len_pp
    patch_val = decode_varints(data[off : off + len_pv], npatch)[0].astype(dt.udt); off += len_pv

    DECODE_STATS["blocks_total"] += nb
    DECODE_STATS["blocks_decoded"] += nb if block_sel is None else len(block_sel)
    if block_sel is None:
        sel_mask = None
        out = np.empty((nb, BLOCK), dtype=dt.idt)
        local = np.arange(nb)
    else:
        sel_mask = np.zeros(nb, dtype=bool)
        sel_mask[block_sel] = True
        out = np.empty((len(block_sel), BLOCK), dtype=dt.idt)
        local = np.full(nb, -1, dtype=np.int64)
        local[block_sel] = np.arange(len(block_sel))

    with np.errstate(over="ignore"):
        # width-0 tags first (no payload)
        const_b = np.flatnonzero(
            (tags == T_CONST) | (((tags == T_DIRECT) | (tags == T_PATCHED)) & (widths == 0))
        )
        if sel_mask is not None:
            const_b = const_b[sel_mask[const_b]]
        if const_b.size:
            out[local[const_b]] = bases[const_b, None]
        fd_b = np.flatnonzero((tags == T_DELTA) & (widths == 0))
        if sel_mask is not None:
            fd_b = fd_b[sel_mask[fd_b]]
        if fd_b.size:
            steps = np.arange(BLOCK, dtype=dt.idt)[None, :]
            out[local[fd_b]] = bases[fd_b, None] + extras[fd_b, None] * steps

        for tag, width, blocks in _groups(tags, widths):
            if width == 0:
                continue
            per_block = BLOCK if tag in (T_DIRECT, T_PATCHED) else BLOCK - 1
            grp_bytes = packed_nbytes(blocks.size * per_block, width)
            if sel_mask is not None:
                wanted = blocks[sel_mask[blocks]]
                if wanted.size == 0:
                    off += grp_bytes
                    continue
                # positions of wanted blocks inside this (tag,width) group
                gpos = np.searchsorted(blocks, wanted)
                dec_blocks, dec_src = wanted, gpos
            else:
                dec_blocks, dec_src = blocks, np.arange(blocks.size)
            shuf = shuffled and _group_shuffled(tag, width)
            if tag == T_DIRECT or tag == T_PATCHED:
                cnt = blocks.size * BLOCK
                nbytes = packed_nbytes(cnt, width)
                if sel_mask is None:
                    raw = np.frombuffer(data, np.uint8, nbytes, off)
                    if shuf:
                        raw = _byte_unshuffle(raw, width // 8)
                    vals = unpack(raw, cnt, width, dt.udt)
                    vals = vals.reshape(-1, BLOCK)
                elif shuf:
                    vals = _unpack_rows_shuf(data, off, width, BLOCK, dec_src, blocks.size, dt)
                else:
                    vals = _unpack_rows(data, off, width, BLOCK, dec_src, dt)
                out[local[dec_blocks]] = (
                    vals + bases[dec_blocks].view(dt.udt)[:, None]
                ).view(dt.idt)
                off += nbytes
            elif tag == T_DELTA:
                cnt = blocks.size * (BLOCK - 1)
                nbytes = packed_nbytes(cnt, width)
                if sel_mask is None:
                    raw = np.frombuffer(data, np.uint8, nbytes, off)
                    if shuf:
                        raw = _byte_unshuffle(raw, width // 8)
                    zz = unpack(raw, cnt, width, dt.udt)
                    zz = zz.reshape(-1, BLOCK - 1)
                elif shuf:
                    zz = _unpack_rows_shuf(data, off, width, BLOCK - 1, dec_src, blocks.size, dt)
                else:
                    zz = _unpack_rows(data, off, width, BLOCK - 1, dec_src, dt)
                d = _unzigzag(zz.ravel(), dt).reshape(-1, BLOCK - 1)
                acc = np.empty((dec_blocks.size, BLOCK), dtype=dt.idt)
                acc[:, 0] = bases[dec_blocks]
                acc[:, 1:] = d
                out[local[dec_blocks]] = np.cumsum(acc.view(dt.udt), axis=1, dtype=dt.udt).view(dt.idt)
                off += nbytes

        # re-insert patches
        if npatch:
            pblocks = np.flatnonzero(tags == T_PATCHED)
            counts = extras[pblocks].astype(np.int64)
            bid = np.repeat(pblocks, counts)
            flat_pos = patch_pos
            vals = (bases[bid].view(dt.udt) + patch_val).view(dt.idt)
            if sel_mask is None:
                out.ravel()[bid * BLOCK + flat_pos] = vals
            else:
                keep = sel_mask[bid]
                out.ravel()[local[bid[keep]] * BLOCK + flat_pos[keep]] = vals[keep]

    if block_sel is None:
        return out.ravel()[:n]
    # rows of the selected blocks, truncating the tail block
    flat = out.ravel()
    keep_len = np.minimum((block_sel + 1) * BLOCK, n) - block_sel * BLOCK
    if int(keep_len.min()) == BLOCK:
        return flat
    parts = [flat[i * BLOCK : i * BLOCK + int(keep_len[i])] for i in range(len(block_sel))]
    return np.concatenate(parts)


def _byte_unshuffle(raw: np.ndarray, nbytes_per_value: int) -> np.ndarray:
    """Inverse of :func:`_byte_shuffle`: plane-major uint8 -> value-major."""
    return np.ascontiguousarray(raw.reshape(nbytes_per_value, -1).T).reshape(-1)


def _unpack_rows_shuf(
    data, off: int, width: int, per_block: int, rows: np.ndarray, g_blocks: int, dt: _Dt
) -> np.ndarray:
    """Selective block decode inside a byte-shuffled payload group: block
    g's bytes for plane p live at plane offset g*per_block — still O(1)
    addressable, just gathered from width//8 plane slices instead of one."""
    s = width // 8
    buf = np.frombuffer(data, np.uint8, g_blocks * per_block * s, off)
    planes = buf.reshape(s, g_blocks, per_block)
    sub = np.ascontiguousarray(planes[:, rows, :].transpose(1, 2, 0))  # (R, per_block, s)
    vals = unpack(sub.reshape(-1), rows.size * per_block, width, dt.udt)
    return vals.reshape(rows.size, per_block)


def _unpack_rows(data, off: int, width: int, per_block: int, rows: np.ndarray, dt: _Dt) -> np.ndarray:
    """Unpack only the selected per-block rows of a payload group.

    For byte-aligned widths each block's slice is unpacked directly; for
    sub-byte/generic widths the whole group is unpacked (still one
    vectorized call) and the rows gathered."""
    if width % 8 == 0:
        bpb = per_block * (width // 8)
        out = np.empty((rows.size, per_block), dtype=dt.udt)
        buf = np.frombuffer(data, np.uint8, len(data) - off, off)
        for j, r in enumerate(rows):
            out[j] = unpack(buf[r * bpb : (r + 1) * bpb], per_block, width, dt.udt)
        return out
    # non-aligned width: decode the blocks' worth with one unpack over the
    # covering byte range is bit-offset-dependent; fall back to full group
    total = int(rows.max()) + 1
    cnt = total * per_block
    nbytes = packed_nbytes(cnt, width)
    vals = unpack(np.frombuffer(data, np.uint8, nbytes, off), cnt, width, dt.udt)
    return vals.reshape(-1, per_block)[rows]


def _run_lengths(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_values, run_lengths) of an integer array."""
    if v.size == 0:
        return v, np.empty(0, dtype=np.int64)
    change = np.empty(v.size, dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, v.size))
    return v[starts], lengths


# ---------------------------------------------------------------------------
# RLEv1-analog layout — the file_version "0.11" write path
# (apache/orc c++/src/RLEv1.cc, probe [P9]).
#
# RLEv1's decomposition is reproduced exactly: maximal fixed-delta runs of
# 3..130 values with delta in [-128, 127] (header MINIMUM_REPEAT=3, count
# byte 0..127 meaning count+3, signed delta byte), interleaved with literal
# spans of up to 128 base-128-varint values.  The byte layout is stream-
# grouped rather than interleaved — record kinds/lengths, then deltas, run
# bases and literals as separate streams — the same array-at-a-time
# restructuring this module applies to RLEv2 (module docstring): identical
# algorithmic content and size characteristics, decodable with bulk numpy
# ops instead of a per-record loop.  Selected per stream via
# encode_ints(version="0.11"); readers dispatch on the layout byte, so no
# reader knob exists (ORC reader semantics).

_V1_MIN_RUN, _V1_MAX_RUN, _V1_MAX_LIT = 3, 130, 128


def _encode_v1(v: np.ndarray, dt: _Dt) -> bytes:
    n = v.size
    rec_kind: list[bool] = []
    rec_len: list[int] = []
    run_delta: list[int] = []
    run_base_idx: list[int] = []
    lit_spans: list[tuple[int, int]] = []

    def emit_lit(s: int, e: int) -> None:
        while s < e:
            L = min(_V1_MAX_LIT, e - s)
            rec_kind.append(False)
            rec_len.append(L)
            lit_spans.append((s, s + L))
            s += L

    def emit_run(s: int, e: int, delta: int) -> None:
        while e - s >= _V1_MIN_RUN:
            L = min(_V1_MAX_RUN, e - s)
            rec_kind.append(True)
            rec_len.append(L)
            run_delta.append(delta)
            run_base_idx.append(s)
            s += L
        if s < e:
            emit_lit(s, e)

    if n >= 2:
        a, b = v[:-1], v[1:]
        with np.errstate(over="ignore"):
            d = b - a
        # exact delta-in-range check: subtraction r = b - a overflows iff
        # the operands differ in sign AND the result differs from b's sign
        ovf = ((a ^ b) < 0) & ((b ^ d) < 0)
        elig = (~ovf) & (d >= -128) & (d <= 127)
        change = np.ones(n - 1, dtype=bool)
        change[1:] = (d[1:] != d[:-1]) | (elig[1:] != elig[:-1])
        seg_starts = np.flatnonzero(change)
        seg_lens = np.diff(np.append(seg_starts, n - 1))
        keep = elig[seg_starts] & (seg_lens >= _V1_MIN_RUN - 1)
        # greedy left-to-right over qualifying segments only (each covers
        # >= 3 values, so this loop is <= n/3 and typically far smaller);
        # adjacent segments share a boundary value — the earlier run wins,
        # exactly the reference's sequential scanner behavior
        next_free = 0
        for si in np.flatnonzero(keep):
            s = int(seg_starts[si])
            hi = s + int(seg_lens[si])  # last value index covered
            lo = max(s, next_free)
            if hi - lo + 1 >= _V1_MIN_RUN:
                if lo > next_free:
                    emit_lit(next_free, lo)
                emit_run(lo, hi + 1, int(d[s]))
                next_free = hi + 1
        if next_free < n:
            emit_lit(next_free, n)
    elif n:
        emit_lit(0, n)

    kinds = np.array(rec_kind, dtype=bool)
    head = encode_varints(np.array([n, kinds.size, len(run_delta)], np.uint64))
    bits = np.packbits(kinds).tobytes() if kinds.size else b""
    lens_b = encode_varints(np.array(rec_len, np.uint64))
    deltas_b = np.array(run_delta, np.int8).tobytes()
    bases = v[np.array(run_base_idx, np.int64)] if run_base_idx else np.empty(0, dt.idt)
    bases_b = encode_svarints(bases.astype(np.int64, copy=False))
    if lit_spans:
        lit_idx = np.concatenate([np.arange(s, e, dtype=np.int64) for s, e in lit_spans])
        lits_b = encode_svarints(v[lit_idx].astype(np.int64, copy=False))
    else:
        lits_b = b""
    return b"".join(
        [head, struct.pack("<I", len(lens_b)), bits, lens_b, deltas_b, bases_b, lits_b]
    )


def _decode_v1(data: memoryview, dt: _Dt) -> np.ndarray:
    hdr, used = decode_varints(data, 3)
    n, n_rec, n_run = (int(x) for x in hdr)
    (lens_nbytes,) = struct.unpack_from("<I", data, used)
    pos = used + 4
    nbits = -(-n_rec // 8)
    kinds = np.unpackbits(np.frombuffer(data, np.uint8, nbits, pos))[:n_rec].astype(bool)
    pos += nbits
    lens_u, _ = decode_varints(data, n_rec, pos)
    lens = lens_u.astype(np.int64)
    pos += lens_nbytes
    deltas = np.frombuffer(data, np.int8, n_run, pos).astype(dt.idt)
    pos += n_run
    bases64, used_b = decode_svarints(data, n_run, pos)
    pos += used_b
    n_lit = int(lens[~kinds].sum()) if n_rec else 0
    lits64, _ = decode_svarints(data, n_lit, pos)
    out = np.empty(n, dtype=dt.idt)
    offs = np.zeros(n_rec + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    if n_run:
        rl = lens[kinds]
        starts = offs[:-1][kinds]
        idx = np.repeat(starts, rl) + _intra(rl)
        with np.errstate(over="ignore"):
            out[idx] = np.repeat(bases64.astype(dt.idt), rl) + np.repeat(deltas, rl) * _intra(rl).astype(dt.idt)
    if n_lit:
        ll = lens[~kinds]
        starts = offs[:-1][~kinds]
        idx = np.repeat(starts, ll) + _intra(ll)
        out[idx] = lits64.astype(dt.idt)
    return out


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated — vectorized within-record index."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def encode_ints(values: np.ndarray, *, min_run_ratio: float = 2.5, strategy: str = "speed", version: str = "0.12") -> bytes:
    """Encode an int32 or int64 array; auto-selects RLE vs block layout by
    run structure, and the 32-bit lane when the source dtype is 4-byte.

    The first byte is the layout id.  ``min_run_ratio`` is the mean run
    length above which the run-length layer wins (selection heuristic, the
    analog of ORC's fixedRunLength tracking in determineEncoding).
    """
    values = np.asarray(values)
    if values.dtype in (np.int32, np.uint32) and values.dtype == np.uint32:
        values = values.view(np.int32)
    if values.dtype == np.int32:
        dt = _DT32
    else:
        dt = _DT64
        values = np.ascontiguousarray(values, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=dt.idt)
    if version == "0.11":
        lane = INT_V1_32 if dt is _DT32 else INT_V1
        return bytes([lane]) + _encode_v1(v, dt)
    if v.size >= 8:
        # sample-based run probe first: full run detection costs extra passes
        # and loses on run-free data (the common token case)
        probe = v[: 1 << 16]
        probe_runs = 1 + int(np.count_nonzero(probe[1:] != probe[:-1]))
        if probe.size / probe_runs >= min_run_ratio:
            run_vals, run_lens = _run_lengths(v)
            if v.size / max(run_vals.size, 1) >= min_run_ratio:
                a = encode_ints(run_vals, strategy=strategy)
                b = encode_ints(run_lens.astype(np.int32) if run_lens.size == 0 or run_lens.max() < 2**31 else run_lens, strategy=strategy)
                return b"".join([bytes([INT_RLE]), struct.pack("<I", len(a)), a, b])
    want = "auto" if v.size >= _SHUF_MIN_N else False
    use_shuf, body = _encode_blocks_ex(v, strategy, dt, shuffle=want)
    if dt is _DT32:
        layout = INT_BLOCKS32_SHUF if use_shuf else INT_BLOCKS32
    else:
        layout = INT_BLOCKS_SHUF if use_shuf else INT_BLOCKS
    return bytes([layout]) + body


def decode_ints(data: bytes | memoryview, block_sel: np.ndarray | None = None) -> np.ndarray:
    """Inverse of :func:`encode_ints`; returns the source-width dtype
    (int32 for the 32-bit lane, else int64).  ``block_sel`` decodes only
    the given 512-row blocks (block layouts only; the RLE layout ignores
    it because rows there don't align to blocks)."""
    data = memoryview(data)
    layout = data[0]
    if layout == INT_BLOCKS:
        return _decode_blocks(data[1:], _DT64, block_sel)
    if layout == INT_BLOCKS32:
        return _decode_blocks(data[1:], _DT32, block_sel)
    if layout == INT_BLOCKS_SHUF:
        return _decode_blocks(data[1:], _DT64, block_sel, shuffled=True)
    if layout == INT_BLOCKS32_SHUF:
        return _decode_blocks(data[1:], _DT32, block_sel, shuffled=True)
    if layout == INT_RLE:
        (alen,) = struct.unpack_from("<I", data, 1)
        run_vals = decode_ints(data[5 : 5 + alen])
        run_lens = decode_ints(data[5 + alen :])
        return np.repeat(run_vals, run_lens)
    if layout == INT_V1:
        return _decode_v1(data[1:], _DT64)
    if layout == INT_V1_32:
        return _decode_v1(data[1:], _DT32)
    raise ValueError(f"unknown int layout {layout}")


def encode_int64(values: np.ndarray, *, min_run_ratio: float = 2.5, strategy: str = "speed") -> bytes:
    """Back-compat alias: encode as int64 regardless of input dtype."""
    return encode_ints(
        np.ascontiguousarray(values, dtype=np.int64), min_run_ratio=min_run_ratio, strategy=strategy
    )


def decode_int64(data: bytes | memoryview) -> np.ndarray:
    """Back-compat alias for :func:`decode_ints` widened to int64."""
    return decode_ints(data).astype(np.int64, copy=False)


# ---------------------------------------------------------------------------
# range decode (seek-to-row-group analog) + instrumentation

DECODE_STATS = {"blocks_decoded": 0, "blocks_total": 0}


def decode_ints_ranges(data: bytes | memoryview, ranges: list) -> np.ndarray:
    """Decode only the rows in ``ranges`` (sorted, disjoint [a, b) pairs).

    Block layouts decode just the 512-row blocks the ranges touch
    (the RowIndexEntry/seekToRowGroup analog: apache/orc
    c++/src/ColumnReader.cc PositionProvider); the RLE layout decodes
    fully and slices (runs don't align to blocks).
    """
    data = memoryview(data)
    layout = data[0]
    ranges = [(a, b) for a, b in ranges if b > a]  # drop degenerate [a, a)
    if layout in (INT_RLE, INT_V1, INT_V1_32) or not ranges:
        v = decode_ints(data)
        if not ranges:
            return v[:0]
        return np.concatenate([v[a:b] for a, b in ranges])
    (n,) = struct.unpack_from("<Q", data, 1)
    block_sel = np.unique(
        np.concatenate(
            [np.arange(a // BLOCK, (b - 1) // BLOCK + 1) for a, b in ranges]
        )
    )
    dec = decode_ints(data, block_sel=block_sel)
    blens = np.minimum((block_sel + 1) * BLOCK, n) - block_sel * BLOCK
    starts_out = np.zeros(block_sel.size + 1, dtype=np.int64)
    np.cumsum(blens, out=starts_out[1:])
    rank = {int(b): i for i, b in enumerate(block_sel)}
    parts = []
    for a, b in ranges:
        cur = a
        while cur < b:
            bi = cur // BLOCK
            end = min(b, (bi + 1) * BLOCK)
            off0 = starts_out[rank[bi]] + (cur - bi * BLOCK)
            parts.append(dec[off0 : off0 + (end - cur)])
            cur = end
    return np.concatenate(parts) if parts else dec[:0]
