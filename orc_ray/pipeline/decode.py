"""Ray Data decode pipeline — the engine's read path (mirrors encode).

The analog of the reference's read path (SURVEY.md §3.2): chunk files are
read in parallel (one read task per chunk — the stripe-aligned-split idea
from OrcInputFormat), decoded by the mirrored stateless kernels, with two
pushdowns the reference also implements:

- *column projection* (RowReaderOptions.include analog): only the
  requested columns' buffers are decompressed/decoded — the chunk header
  carries per-column buffer extents;
- *stats pruning* (SearchArgument / pickRowGroups analog,
  c++/src/sargs/SargsApplier.cc): simple predicates are evaluated against
  per-chunk min/max from the lineage manifest, chunks that cannot match
  are never read, and the residual predicate is applied exactly inside
  map_batches.

Returns a lazy ``ray.data.Dataset`` — consumption streams with
backpressure; nothing is materialized driver-side.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray

from ..chunk import decode_chunk, read_chunk_header
from ..state import manifest as mstate
from ..state import storage as fstore

def _pred_columns(pred) -> set:
    if isinstance(pred, (list, tuple)) and pred and pred[0] in ("and", "or", "not"):
        out: set = set()
        for p in pred[1:]:
            out |= _pred_columns(p)
        return out
    return {pred[0]}


def _mask(t: pa.Table, pred):
    """Exact boolean mask for a predicate tree (row-level filter analog)."""
    import pyarrow.compute as pc

    if isinstance(pred, (list, tuple)) and pred and pred[0] in ("and", "or", "not"):
        kids = [_mask(t, p) for p in pred[1:]]
        kids = [k for k in kids if k is not None]
        if not kids:
            return None
        if pred[0] == "and":
            m = kids[0]
            for k in kids[1:]:
                m = pc.and_(m, k)
            return m
        if pred[0] == "or":
            m = kids[0]
            for k in kids[1:]:
                m = pc.or_(m, k)
            return m
        return pc.invert(kids[0])
    col, op = pred[0], pred[1]
    if col not in t.column_names:
        return None
    c = t.column(col)
    if op == "isnull":
        return pc.is_null(c)
    if op == "notnull":
        return pc.is_valid(c)

    def lit(v):
        # unsigned columns: int literals >= 2**63 overflow pa.scalar's
        # default int64 inference — type them to the column instead.
        # temporal columns: int literals are epoch counts in the column's
        # unit (matching the integer min/max chunk stats, so one literal
        # form drives both stats pruning and the row filter).
        if isinstance(v, int) and (
            pa.types.is_unsigned_integer(c.type) or pa.types.is_temporal(c.type)
        ):
            return pa.scalar(v, type=c.type)
        return pa.scalar(v)

    if op == "startswith":
        return pc.starts_with(c, pattern=pred[2])
    if op == "in":
        vs = list(pred[2])
        if pa.types.is_unsigned_integer(c.type) or (
            pa.types.is_temporal(c.type) and vs and isinstance(vs[0], int)
        ):
            return pc.is_in(c, value_set=pa.array(vs, type=c.type))
        return pc.is_in(c, value_set=pa.array(vs))
    if op == "between":
        return pc.and_(pc.greater_equal(c, lit(pred[2])), pc.less_equal(c, lit(pred[3])))
    fns = {
        ">": pc.greater,
        ">=": pc.greater_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        "==": pc.equal,
        "!=": pc.not_equal,
    }
    return fns[op](c, lit(pred[2]))


# three-valued predicate evaluation against chunk stats — the reference's
# TruthValue semantics (apache/orc c++/src/sargs/ExpressionTree.cc,
# SearchArgument.cc: YES/NO/MAYBE propagated through AND/OR/NOT; a chunk is
# skipped only on a definite NO).  Predicate grammar:
#   leaf:  (col, op, val)         op in > >= < <= == !=
#          (col, "in", [v, ...])
#          (col, "between", lo, hi)
#   tree:  ("and", p1, p2, ...) | ("or", ...) | ("not", p)
# A plain list of leaves is an implicit AND (backward compatible).
YES, NO, MAYBE = 1, -1, 0


def _truth_leaf(stats: dict, pred: tuple) -> int:
    try:
        return _truth_leaf_inner(stats, pred)
    except TypeError:
        # stats/literal type mismatch (e.g. int literal vs string stats):
        # pruning must stay conservative, the exact filter decides
        return MAYBE


def _truth_leaf_inner(stats: dict, pred: tuple) -> int:
    col, op = pred[0], pred[1]
    st = stats.get(col)
    if st is None:
        return MAYBE
    if op in ("isnull", "notnull"):
        # hasNull analog (ORC PredicateLeaf IS_NULL): decided from the
        # null count alone, no data access
        if "nulls" not in st or "n" not in st:
            return MAYBE
        nulls, total = st["nulls"], st["n"]
        if op == "isnull":
            return NO if nulls == 0 else (YES if nulls == total else MAYBE)
        return NO if nulls == total else (YES if nulls == 0 else MAYBE)
    if op == "==" and "bloom" in st:
        from ..codecs import bloom

        if not bloom.might_contain(bloom.deserialize(st["bloom"]), pred[2]):
            return NO
    if op == "in" and "bloom" in st:
        from ..codecs import bloom

        f = bloom.deserialize(st["bloom"])
        if not any(bloom.might_contain(f, v) for v in pred[2]):
            return NO
    if "min" not in st:
        return MAYBE
    lo, hi = st["min"], st["max"]
    if op == ">":
        return NO if hi <= pred[2] else (YES if lo > pred[2] else MAYBE)
    if op == ">=":
        return NO if hi < pred[2] else (YES if lo >= pred[2] else MAYBE)
    if op == "<":
        return NO if lo >= pred[2] else (YES if hi < pred[2] else MAYBE)
    if op == "<=":
        return NO if lo > pred[2] else (YES if hi <= pred[2] else MAYBE)
    if op == "==":
        if pred[2] < lo or pred[2] > hi:
            return NO
        return YES if lo == hi == pred[2] else MAYBE
    if op == "!=":
        return NO if lo == hi == pred[2] else (YES if pred[2] < lo or pred[2] > hi else MAYBE)
    if op == "in":
        vals = [v for v in pred[2] if lo <= v <= hi]
        if not vals:
            return NO
        return YES if lo == hi and lo in pred[2] else MAYBE
    if op == "between":
        blo, bhi = pred[2], pred[3]
        if bhi < lo or blo > hi:
            return NO
        return YES if blo <= lo and hi <= bhi else MAYBE
    if op == "startswith":
        # LIKE 'pfx%' prunes as the half-open string interval
        # [pfx, next(pfx)): UTF-8 byte order equals code-point order, so
        # the truncated StringStatistics bounds stay conservative.
        pfx = pred[2]
        if hi < pfx:
            return NO
        nxt = _prefix_upper(pfx)
        if nxt is not None and lo >= nxt:
            return NO
        if lo >= pfx and nxt is not None and hi < nxt:
            return YES
        return MAYBE
    return MAYBE


def _prefix_upper(pfx: str) -> str | None:
    """Smallest string greater than every string with prefix ``pfx``
    (code-point increment with carry); None when no such bound exists."""
    cps = list(pfx)
    while cps:
        o = ord(cps[-1])
        if o < 0x10FFFF:
            return "".join(cps[:-1]) + chr(o + 1)
        cps.pop()
    return None


def _truth(stats: dict, pred) -> int:
    if isinstance(pred, (list, tuple)) and pred and pred[0] in ("and", "or", "not"):
        kids = [_truth(stats, p) for p in pred[1:]]
        if pred[0] == "and":
            if NO in kids:
                return NO
            return YES if all(k == YES for k in kids) else MAYBE
        if pred[0] == "or":
            if YES in kids:
                return YES
            return NO if all(k == NO for k in kids) else MAYBE
        k = kids[0]
        return -k  # NOT: YES<->NO, MAYBE stays
    return _truth_leaf(stats, tuple(pred))


def _chunk_may_match(stats: dict, pred) -> bool:
    return _truth(stats, pred) != NO


def _stride_ranges(header: dict, predicates) -> list | None:
    """Surviving [a, b) row ranges of a chunk under ``predicates``, from the
    per-stride min/max recorded in the chunk header (RowIndexEntry /
    pickRowGroups analog, apache/orc c++/src/sargs/SargsApplier.cc).

    Returns None when everything survives (or no stride info exists) so the
    caller takes the plain full-decode path; [] when no stride can match.
    """
    if not predicates:
        return None
    scols = [c for c in header["columns"] if "stride" in c]
    if not scols:
        return None
    n = header["n_rows"]
    rows = scols[0]["stride"]["rows"]
    ns = (n + rows - 1) // rows
    ranges: list = []
    kept = 0
    for s in range(ns):
        stats = {}
        for c in scols:
            st = c["stride"]
            entry = {}
            if (
                s < len(st["mins"])
                and st["mins"][s] is not None
                and st["maxs"][s] is not None
            ):
                entry["min"] = st["mins"][s]
                entry["max"] = st["maxs"][s]
            stats[c["name"]] = entry
        if not all(_chunk_may_match(stats, p) for p in predicates):
            continue
        kept += 1
        a, b = s * rows, min((s + 1) * rows, n)
        if ranges and ranges[-1][1] == a:
            ranges[-1][1] = b  # merge adjacent strides
        else:
            ranges.append([a, b])
    if kept == ns:
        return None
    return [tuple(r) for r in ranges]


def list_chunks(out_dir: str, predicates: list[tuple] | None = None) -> tuple[list[str], int, int]:
    """Chunk file paths (optionally stats-pruned). Returns (paths, kept, total)."""
    man = mstate.read_manifest(out_dir)
    if man.num_rows == 0:
        paths = fstore.glob_paths(os.path.join(mstate.chunk_dir(out_dir), "*.oray"))
        return paths, len(paths), len(paths)
    ids = man.column("chunk_id").to_pylist()
    stats = [json.loads(s) for s in man.column("stats").to_pylist()]
    keep = []
    for cid, st in zip(ids, stats):
        if predicates and not all(_chunk_may_match(st, p) for p in predicates):
            continue
        keep.append(os.path.join(mstate.chunk_dir(out_dir), f"{cid}.oray"))
    return sorted(keep), len(keep), len(ids)


def _read_files(paths: list) -> list:
    return [fstore.read_bytes(p) for p in paths]


def _decode_batch(batch: pa.Table, *, columns, predicates, cast_schema=None, verify_checksums=None, keys=None, encoded_vectors=False, on_corrupt="raise") -> pa.Table:
    """Task-pool entry: decode a batch of chunk blobs."""
    return _DecodeChunks(columns, predicates, cast_schema, verify_checksums, keys, encoded_vectors, on_corrupt)(batch)


class _DecodeChunks:
    def __init__(
        self,
        columns: list[str] | None,
        predicates: list[tuple] | None,
        cast_schema=None,
        verify_checksums: bool | None = None,
        keys: dict | None = None,
        encoded_vectors: bool = False,
        on_corrupt: str = "raise",
    ):
        # AES-CTR is malleable (a ciphertext bit-flip decodes to silently
        # wrong plaintext), so integrity MUST come from the content-addressed
        # chunk checksum: default verification ON whenever keys are supplied.
        if on_corrupt not in ("raise", "skip"):
            raise ValueError(f"on_corrupt must be 'raise' or 'skip', got {on_corrupt!r}")
        if on_corrupt == "skip":
            # recovery read: can't skip what isn't detected
            verify_checksums = True
        if verify_checksums is None:
            verify_checksums = keys is not None
        self.on_corrupt = on_corrupt
        # encoded-vector read (ORC setEncodedVectorAllowed analog): eligible
        # string columns come back dictionary<int32,str>.  Predicate columns
        # are excluded (comparison kernels want flat arrays); cast_schema is
        # incompatible (the convert matrix is defined over flat types).
        if encoded_vectors and cast_schema:
            raise ValueError("encoded_vectors is incompatible with cast_schema")
        self.encoded_vectors = encoded_vectors
        self.encoded_exclude = frozenset()
        if encoded_vectors and predicates:
            ex: set = set()
            for p in predicates:
                ex |= _pred_columns(p)
            self.encoded_exclude = frozenset(ex)
        pa.set_memory_pool(pa.system_memory_pool())  # glibc heap: see _mem.py
        # master keys by name for encrypted columns (chunk.decode_chunk):
        # present -> real decrypted data; absent -> masked public variant
        self.keys = keys
        self.columns = columns
        self.predicates = predicates
        self.verify_checksums = verify_checksums
        # schema evolution: reader-schema conversion at decode time — the
        # analog of the reference's SchemaEvolution/ConvertColumnReader
        # (numeric widening, string<->numeric, timestamp conversions) via
        # Arrow cast kernels.  {column -> target pa.DataType}
        self.cast_schema = cast_schema
        # decode must include predicate columns even when projected away
        if columns is None:
            self.decode_cols = None
            self.out_cols = None
        else:
            pcols: set = set()
            for p in predicates or []:
                pcols |= _pred_columns(p)
            self.decode_cols = list(columns) + sorted(pcols - set(columns))
            # dotted subtree selections ("s.a") surface as their struct's
            # top-level name in the decoded table
            seen: list = []
            for c in columns:
                top = c.partition(".")[0]
                if top not in seen:
                    seen.append(top)
            self.out_cols = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tables = []
        if "path" in batch.column_names:
            # direct-read mode: chunk bytes are read inside the task and
            # never transit the object store (mirrors the encode fast path)
            paths = batch.column("path").to_pylist()
            if self.on_corrupt == "skip":
                # recovery read: a blob missing from the chunk dir (the plan
                # comes from the manifest) is salvage-skipped like a bad hash
                pairs = []
                for p in paths:
                    try:
                        pairs.append((p, fstore.read_bytes(p)))
                    except (FileNotFoundError, OSError):
                        continue
                paths = [p for p, _ in pairs]
                blobs = [b for _, b in pairs]
            else:
                blobs = _read_files(paths)
            if self.verify_checksums:
                # chunks are content-addressed: the filename IS the sha256
                # prefix of the payload, so bit-rot detection is one hash
                import hashlib
                import os as _os

                good = []
                for p, blob in zip(paths, blobs):
                    cid = _os.path.basename(p).split(".")[0]
                    got = hashlib.sha256(blob).hexdigest()[: len(cid)]
                    if got != cid:
                        if self.on_corrupt == "skip":
                            # recovery read (FileDump --recover analog):
                            # drop the bad chunk, salvage the rest; fsck
                            # reports exactly which chunks were lost
                            continue
                        raise IOError(
                            f"chunk {p} fails its content checksum "
                            f"({got} != {cid}): corrupt or tampered file"
                        )
                    good.append(blob)
                blobs = good
        else:
            blobs = batch.column("bytes").to_pylist()
            if self.verify_checksums:
                # bytes-mode callers must supply the content address to
                # verify against — silently skipping verification here
                # would defeat the AES-CTR-malleability guard the keyed
                # default exists for (see __init__)
                if "chunk_id" not in batch.column_names:
                    raise ValueError(
                        "verify_checksums with bytes-mode input requires a "
                        "chunk_id column (the content address) per blob"
                    )
                import hashlib

                good = []
                for cid, blob in zip(batch.column("chunk_id").to_pylist(), blobs):
                    got = hashlib.sha256(bytes(blob)).hexdigest()[: len(cid)]
                    if got != cid:
                        if self.on_corrupt == "skip":
                            continue
                        raise IOError(
                            f"chunk {cid} fails its content checksum ({got}): "
                            "corrupt or tampered blob"
                        )
                    good.append(blob)
                blobs = good
        empty_schema = None
        for blob in blobs:
            header = read_chunk_header(blob)
            ranges = _stride_ranges(header, self.predicates)
            if ranges is not None and not ranges:
                # no stride can match — skip the whole chunk, but remember
                # its (projected, cast) schema so an all-pruned batch still
                # returns a TYPED empty table (schema-less empties trigger
                # Ray Data "RefBundle with a different schema" warnings)
                if empty_schema is None:
                    empty_schema = self._projected_schema(header)
                continue
            t = decode_chunk(
                blob,
                columns=self.decode_cols,
                row_ranges=ranges,
                header=header,
                keys=self.keys,
                encoded_vectors=self.encoded_vectors,
                encoded_exclude=self.encoded_exclude,
            )
            if self.predicates:
                # a predicate naming a column absent from the chunk schema
                # is almost always a typo; silently dropping it would return
                # the full unfiltered data (ADVICE r1) — fail loudly instead
                missing = set()
                for p in self.predicates:
                    missing |= _pred_columns(p) - set(t.column_names)
                if missing:
                    raise KeyError(
                        f"predicate column(s) {sorted(missing)} not in chunk "
                        f"schema {t.column_names}"
                    )
                mask = None
                for p in self.predicates:  # top-level list = implicit AND
                    m = _mask(t, p)
                    if m is None:
                        continue
                    mask = m if mask is None else pc.and_(mask, m)
                if mask is not None:
                    t = t.filter(mask)
            if self.out_cols is not None and t.column_names != self.out_cols:
                t = t.select(self.out_cols)
            if self.cast_schema:
                from ..convert import convert_table

                # full ConvertColumnReader matrix: lossy values null out
                # instead of failing the read (orc_ray/convert.py)
                t = convert_table(t, self.cast_schema)
            tables.append(t)
        if not tables:
            return empty_schema.empty_table() if empty_schema is not None else pa.table({})
        out = pa.concat_tables(tables).combine_chunks()
        if out.num_rows == 0:
            return out.schema.empty_table()  # keep schema on empty output
        return out

    def _projected_schema(self, header: dict) -> pa.Schema:
        import base64

        schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(header["schema"])))
        if self.columns is not None:
            subsel: dict = {}
            for c in self.columns:
                top, _, child = c.partition(".")
                if child and subsel.get(top, set()) is not None:
                    subsel.setdefault(top, set()).add(child)
                elif not child:
                    subsel[top] = None
            fields = []
            for top in self.out_cols:
                f = schema.field(top)
                sel = subsel.get(top)
                if sel and pa.types.is_struct(f.type):
                    f = pa.field(top, pa.struct([sf for sf in f.type if sf.name in sel]))
                fields.append(f)
            schema = pa.schema(fields)
        if self.encoded_vectors:
            encs = {c["name"] for c in header["columns"] if c.get("codec") == "enc"}
            fields = [
                pa.field(f.name, pa.dictionary(pa.int32(), f.type))
                if (
                    (pa.types.is_string(f.type) or pa.types.is_large_string(f.type))
                    and f.name not in self.encoded_exclude
                    and f.name not in encs
                )
                else f
                for f in schema
            ]
            schema = pa.schema(fields)
        if self.cast_schema:
            fields = [
                pa.field(f.name, self.cast_schema.get(f.name, f.type)) for f in schema
            ]
            schema = pa.schema(fields)
        return schema


def count_rows(out_dir: str, predicates=None, trust_stats: bool = False) -> int:
    """Row count of a store.  ``trust_stats=True`` with no predicate
    answers from the manifest alone (the ORC footer numberOfRows analog —
    zero chunk I/O); otherwise falls through to the fused decode count."""
    if trust_stats and not predicates:
        man = mstate.read_manifest(out_dir)
        if man.num_rows:
            return int(pa.compute.sum(man.column("n_rows")).as_py() or 0)
    return scan_count(out_dir, predicates=predicates)


def scan_count(out_dir: str, *, columns=None, predicates=None) -> int:
    """Fused decode + count: chunks are fully decoded inside each task but
    only row counts leave it (no object-store writeback of decoded blocks).
    The orc-scan analog, and the right shape for any reduce-style consumer
    at scale: decode feeds the reduction in-task."""
    import functools

    paths, _, _ = list_chunks(out_dir, predicates)
    if not paths:
        return 0
    # direct-read: only per-task row counts transit the object store
    ds = ray.data.from_items([{"path": p} for p in paths])

    def _count(batch: pa.Table, **kw) -> pa.Table:
        t = _decode_batch(batch, **kw)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    counted = ds.map_batches(
        functools.partial(_count, columns=columns, predicates=predicates, cast_schema=None),
        batch_size=1,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=1,
    )
    return int(counted.sum("n"))


def decode_dataset(
    out_dir: str,
    *,
    columns: list[str] | None = None,
    predicates: list[tuple] | None = None,
    cast_schema: dict | None = None,
    concurrency=None,
    verify_checksums: bool | None = None,
    keys: dict | None = None,
    encoded_vectors: bool = False,
    limit: int | None = None,
    on_corrupt: str = "raise",
) -> "ray.data.Dataset":
    """Lazy decode of a chunk store into a Dataset of original rows.

    ``on_corrupt="skip"`` is the RECOVERY read (orc-tools FileDump
    --recover analog): checksum verification is forced on and chunks
    that fail their content hash are dropped instead of failing the
    scan — the salvage path after bit rot, paired with ``fsck`` which
    reports exactly which chunks (and how many rows) were lost.

    ``limit``: read at most N rows (no defined order, like SQL LIMIT
    without ORDER BY).  PUSHED DOWN to the chunk plan: with no
    predicates the manifest's per-chunk n_rows cuts the chunk list to
    the shortest prefix covering N rows BEFORE any I/O (the RowReader
    seek/stop analog); with predicates every surviving chunk stays
    planned (matched counts are unknown pre-decode) and the streaming
    executor's Dataset.limit stops the scan early instead.

    ``encoded_vectors=True`` (ORC's setEncodedVectorAllowed /
    EncodedStringVectorBatch analog) returns every eligible top-level
    string column as ``dictionary<int32, str>``: dict-coded chunks hand
    their codes + sorted dictionary over zero-expansion, other string
    codecs are post-encoded for a stable reader schema.  Downstream
    group_by/unique/join hash int32 codes instead of string bytes.
    Predicate columns stay flat (excluded); incompatible with
    ``cast_schema``.

    ``predicates``: list of (column, op, value) tuples — applied both as
    manifest min/max + bloom pruning (chunks skipped entirely) and exactly
    per batch after decode.  ``cast_schema``: {column -> pa.DataType}
    reader-schema conversion (schema evolution layer).  ``concurrency``
    caps concurrent decode tasks (None = streaming executor decides).
    ``verify_checksums`` re-hashes every chunk file against its
    content-addressed name — bit-rot / tamper detection at read time.
    Default (None) = auto: ON whenever ``keys`` are supplied, because
    AES-CTR is malleable and the checksum is what detects a tampered
    ciphertext; OFF for plain reads (corruption there surfaces as codec
    parse / stats errors, and the caller can still opt in).
    ``keys``: {key name -> AES master key material} for encrypted columns;
    (eager-validated below so a bad ``on_corrupt`` fails at call time, not
    wrapped in a RayTaskError inside the first decode task)
    omit it to read the masked public variants (predicates over an
    encrypted column then evaluate against the MASKED values — exactly what
    a keyless reader is allowed to see).
    """
    import functools

    if encoded_vectors and cast_schema:
        # fail on the driver, not inside the first decode task
        raise ValueError("encoded_vectors is incompatible with cast_schema")
    if on_corrupt not in ("raise", "skip"):
        raise ValueError(f"on_corrupt must be 'raise' or 'skip', got {on_corrupt!r}")
    paths, kept, total = list_chunks(out_dir, predicates)
    if limit is not None:
        if limit <= 0:
            return ray.data.from_arrow(pa.table({}))
        if not predicates:
            paths = _limit_prefix(out_dir, paths, limit)
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    # direct-read: encoded chunk bytes are read inside the decode task and
    # never transit the object store; only decoded (downstream-consumed)
    # blocks do.  Plain-function map_batches (task pool): task workers are
    # reused across pipelines, keeping heaps warm — see encode.py rationale
    ds = ray.data.from_items([{"path": p} for p in paths])
    out = ds.map_batches(
        functools.partial(
            _decode_batch,
            columns=columns,
            predicates=predicates,
            cast_schema=cast_schema,
            verify_checksums=verify_checksums,
            keys=keys,
            encoded_vectors=encoded_vectors,
            on_corrupt=on_corrupt,
        ),
        batch_size=1,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
    return out.limit(limit) if limit is not None else out


def _limit_prefix(out_dir: str, paths: list[str], limit: int) -> list[str]:
    """Shortest prefix of ``paths`` whose manifest n_rows cover ``limit``
    (chunks beyond it are never read).  Falls back to all paths when a
    chunk is missing from the manifest (pre-commit read)."""
    man = mstate.read_manifest(out_dir)
    if man.num_rows == 0:
        return paths
    rows_of = dict(
        zip(man.column("chunk_id").to_pylist(), man.column("n_rows").to_pylist())
    )
    keep, acc = [], 0
    for p in paths:
        cid = os.path.splitext(os.path.basename(p))[0]
        n = rows_of.get(cid)
        if n is None:
            return paths
        keep.append(p)
        acc += int(n)
        if acc >= limit:
            return keep
    return keep


def store_schema(out_dir: str, keys: dict | None = None) -> pa.Schema:
    """Arrow schema of a store from ONE chunk (the ORC footer-schema
    analog; our chunks are self-describing, so the first chunk's decoded
    schema IS the store's).  Reads that one blob directly and decodes a
    single row — no Ray Dataset pipeline, so a multi-store union's
    planning pass costs one small read per store instead of one dataset
    round-trip per store."""
    man = mstate.read_manifest(out_dir)
    if man.num_rows == 0:
        return pa.schema([])
    cid = man.column("chunk_id")[0].as_py()
    blob = fstore.read_bytes(os.path.join(mstate.chunk_dir(out_dir), f"{cid}.oray"))
    return decode_chunk(blob, row_ranges=[(0, 1)], keys=keys).schema


def decode_union(stores: list[str], *, predicates: list[tuple] | None = None,
                  keys: dict | None = None) -> "ray.data.Dataset":
    """Union-by-name read across stores whose schemas EVOLVED — the
    lakehouse multi-snapshot scan (Iceberg/Delta union-by-name; ORC's
    SchemaEvolution applied across files rather than within one).

    The unified reader schema comes from pyarrow.unify_schemas
    (permissive promotion: int32 -> int64, float -> double, ...); each
    store decodes with the existing cast_schema conversion layer for
    columns whose type changed, and a per-batch fill stage adds typed
    NULL columns for fields the store never had.  Column order is
    normalized to the unified schema, so downstream unions are
    schema-stable.

    ``predicates`` must reference columns present in EVERY store (a
    missing column reads as NULL, which would silently drop that
    store's rows from chunk pruning) — violated -> ValueError."""
    import functools

    import ray

    schemas = [store_schema(s, keys=keys) for s in stores]
    uni = pa.unify_schemas(schemas, promote_options="permissive")
    if predicates:
        need = set()
        for p in predicates:
            need |= _pred_columns(p)
        for s, sch in zip(stores, schemas):
            missing = need - set(sch.names)
            if missing:
                raise ValueError(
                    f"predicate columns {sorted(missing)} absent from store {s}; "
                    "union-by-name predicates must exist in every store"
                )

    def fill(t: pa.Table, *, uni=uni) -> pa.Table:
        return pa.table(
            {
                f.name: (
                    t.column(f.name) if f.name in t.column_names else pa.nulls(t.num_rows, f.type)
                )
                for f in uni
            }
        )

    parts = []
    for s, sch in zip(stores, schemas):
        cast = {
            f.name: uni.field(f.name).type
            for f in sch
            if f.type != uni.field(f.name).type
        }
        ds = decode_dataset(s, predicates=predicates, cast_schema=cast or None, keys=keys)
        parts.append(
            ds.map_batches(functools.partial(fill), batch_format="pyarrow", zero_copy_batch=True)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
