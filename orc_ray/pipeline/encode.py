"""Ray Data encode pipeline — the engine's write path.

The analog of the reference's write path (SURVEY.md §3.1) re-expressed
Ray-Data-first:

    read_parquet(files, columns)           # one read task per fragment
      -> [optional salted hash shuffle]    # skew-breaking co-location
      -> map_batches(EncoderActor pool)    # stateful: dict/FSST tables per
                                           #   (actor, column, chunk)
      -> lineage records -> manifest parquet + driver commit

Each batch becomes one self-describing chunk file (the stripe analog);
the streaming executor pipelines read/encode/write with backpressure, so
nothing materializes the full dataset.  Chunks are content-addressed and
committed per input file via the manifest (state/manifest.py), which makes
an interrupted run resumable (`resume=True`).

Scale notes (the 100 TB design points):
- batches are zero-copy Arrow (`batch_format="pyarrow"`); encode kernels
  are the vectorized codecs from orc_ray.codecs — no per-row Python;
- the salted shuffle mode (`partition_by="source"`) hash-partitions on
  (source, floor(log2(n_tok))) — same-source text shares symbol tables
  (better ratio) while the length-bucket salt bounds per-partition byte
  volume against long-document skew, as the north star mandates;
- chunk size is bounded by `batch_size` rows *and* Ray's block splitting,
  so a worker holds O(batch) memory regardless of corpus size;
- output is one file per chunk under chunks/ — a failed run re-encodes
  only uncommitted inputs, and downstream reads parallelize per chunk.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..chunk import DEFAULT_OPTIONS, EncodeOptions, encode_chunk, read_chunk_header
from ..state import manifest as mstate
from ..state import storage as fstore

_PATH_COL = "__input_path"
_SALT_COL = "__salt"


_FORMAT_EXT = {"parquet": "*.parquet", "csv": "*.csv", "json": "*.json*"}


def _resolve_files(input_paths, file_format: str = "parquet") -> list[str]:
    if isinstance(input_paths, (str, os.PathLike)):
        input_paths = [input_paths]
    out: list[str] = []
    for p in input_paths:
        p = str(p)
        if os.path.isdir(p):
            out.extend(fstore.glob_paths(os.path.join(p, _FORMAT_EXT[file_format])))
        else:
            out.append(p)
    return out


def _unit_uid(pairs) -> str:
    """Deterministic id of a work unit (or batch of units)."""
    return hashlib.sha256("|".join(f"{p}|{r}" for p, r in pairs).encode()).hexdigest()[:20]


def _part_format_stale(out_dir: str, part: str) -> bool:
    """True when a durable unit-manifest part's chunks were written by a
    DIFFERENT chunk format version than this writer: reads the part's
    first chunk_id and probes that chunk's header (9-byte magic+len plus
    the JSON header — no data buffers).  Missing/corrupt chunks also
    count as stale so resume re-encodes them instead of committing over
    a hole."""
    import struct as _struct

    from ..chunk import FORMAT_VERSION, MAGIC

    try:
        ids = fstore.read_parquet(part, columns=["chunk_id"]).column("chunk_id").to_pylist()
        if not ids:
            return False  # empty part carries no chunks to mismatch
        cpath = os.path.join(mstate.chunk_dir(out_dir), f"{ids[0]}.oray")
        with fstore.open_file(cpath) as f:
            head = f.read(9)
            if bytes(head[:5]) != MAGIC:
                return True
            (hlen,) = _struct.unpack_from("<I", head, 5)
            hdr = json.loads(f.read(hlen))
        return hdr.get("v", 1) != FORMAT_VERSION
    except (OSError, ValueError, KeyError, _struct.error):
        # struct.error: truncated header (crash mid-write) — stale, re-encode
        return True


def _plan_units(files: list[str], columns, unit_rows: int) -> list[dict]:
    """Split inputs into (file, row-group range) work units of ~unit_rows —
    the analog of ORC's stripe-aligned splits (OrcInputFormat.getSplits):
    each unit is independently readable, so encode tasks read their slice
    of parquet directly and raw bytes never transit the object store."""
    units = []
    for f in files:
        md = pq.read_metadata(f)
        cur: list[int] = []
        cur_rows = 0
        for rg in range(md.num_row_groups):
            cur.append(rg)
            cur_rows += md.row_group(rg).num_rows
            if cur_rows >= unit_rows:
                units.append({"path": f, "row_groups": json.dumps(cur)})
                cur, cur_rows = [], 0
        if cur:
            units.append({"path": f, "row_groups": json.dumps(cur)})
    return units


class FileEncoderActor:
    """Direct-read encoder: one task = read a row-group unit from parquet
    (in-process, zero plasma hop for the raw data) -> slice into chunks ->
    encode -> write chunk files -> emit manifest rows."""

    def __init__(self, out_dir: str, opts: EncodeOptions, columns, batch_size: int):
        self.out_dir = out_dir
        self.opts = opts
        self.columns = columns
        self.batch_size = batch_size
        self.enc = EncoderActor(out_dir, opts)
        pa.set_memory_pool(pa.system_memory_pool())  # glibc heap: see _mem.py

    def __call__(self, units: pa.Table) -> pa.Table:
        out = []
        for path, rgs in zip(units.column("path").to_pylist(), units.column("row_groups").to_pylist()):
            table = pq.ParquetFile(path).read_row_groups(json.loads(rgs), columns=self.columns)
            n = table.num_rows
            for lo in range(0, n, self.batch_size):
                sub = table.slice(lo, self.batch_size)
                sub = sub.append_column(_PATH_COL, pa.array([path] * sub.num_rows))
                out.append(self.enc(sub))
        return pa.concat_tables(out) if out else mstate.MANIFEST_SCHEMA.empty_table()


def _encode_units(units: pa.Table, *, out_dir: str, opts: EncodeOptions, columns, batch_size: int) -> pa.Table:
    """Task-pool entry: encode one work unit (see FileEncoderActor).

    The unit's manifest rows are written durably (atomic rename) from
    inside the task the moment the unit completes — so a killed run keeps
    every finished unit's lineage, and resume re-encodes only input files
    whose recorded rows don't sum to the parquet metadata count."""
    man = FileEncoderActor(out_dir, opts, columns, batch_size)(units)
    uid = _unit_uid(zip(units.column("path").to_pylist(), units.column("row_groups").to_pylist()))
    dest = os.path.join(mstate.manifest_dir(out_dir), f"unit-{uid}.parquet")
    fstore.write_parquet_atomic(man, dest)
    return pa.table({"n": pa.array([int(pa.compute.sum(man.column("n_rows")).as_py() or 0)], pa.int64())})


class EncoderActor:
    """Stateful encoder stage: one symbol table / dictionary per
    (actor, column, chunk), built in the codec kernels; chunk files are
    written from inside the task (no driver round-trip)."""

    def __init__(self, out_dir: str, opts: EncodeOptions):
        self.out_dir = out_dir
        self.opts = opts
        fstore.makedirs(mstate.chunk_dir(out_dir))
        pa.set_memory_pool(pa.system_memory_pool())  # glibc heap: see _mem.py

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs = {k: [] for k in ("chunk_id", "input_file", "n_rows", "raw_bytes", "enc_bytes", "codecs", "stats", "wall_ms")}
        if _PATH_COL in batch.column_names:
            paths = batch.column(_PATH_COL)
            batch = batch.drop_columns([_PATH_COL])
            uniq = pa.compute.unique(paths).to_pylist()
            groups = [
                (p, batch.filter(pa.compute.equal(paths, p))) if len(uniq) > 1 else (p, batch)
                for p in uniq
            ]
        else:
            groups = [("", batch)]
        # salt-pure chunks: Ray may coalesce several salt groups into one
        # block after the groupby shuffle — split them back apart so each
        # chunk holds ONE (source, length-bucket) partition (that purity
        # is the whole point of the salted co-location: shared symbol
        # tables and bounded per-chunk byte volume)
        split_groups = []
        for path, sub in groups:
            if _SALT_COL in sub.column_names:
                salts = pa.compute.unique(sub.column(_SALT_COL).combine_chunks()).to_pylist()
                for sv in salts:
                    part = (
                        sub.filter(pa.compute.equal(sub.column(_SALT_COL), sv))
                        if len(salts) > 1
                        else sub
                    )
                    split_groups.append((path, part.drop_columns([_SALT_COL])))
            else:
                split_groups.append((path, sub))
        for path, sub in split_groups:
            if sub.num_rows == 0:
                continue
            if self.opts.masks:
                # write-side masking (reference DataMask writer option):
                # the chunk store never contains the raw values.  Masks are
                # passed through UNFILTERED: a mask naming a column absent
                # from the data must raise (apply_masks KeyError), not
                # silently write the raw column (a typo'd --mask would
                # otherwise leak sensitive data with exit code 0)
                from ..functions.mask import apply_masks

                sub = apply_masks(sub, self.opts.masks)
            t0 = time.time()
            payload = encode_chunk(sub, self.opts)
            cid = hashlib.sha256(payload).hexdigest()[:24]
            final = os.path.join(mstate.chunk_dir(self.out_dir), f"{cid}.oray")
            # atomic locally (a chunk file is whole or absent); torn remote
            # writes are caught by the content-address checksum on read
            fstore.write_bytes_atomic(final, payload)
            hdr = read_chunk_header(payload)
            codecs = {c["name"]: c["codec"] for c in hdr["columns"]}
            stats = {}
            for c in hdr["columns"]:
                # plain columns have exact null knowledge (the header
                # records 'nulls' only when > 0, so the 0-default is
                # correct and keeps isnull pruning sharp); an ENCRYPTED
                # column's public meta carries no stats at all (they live
                # in the encrypted emeta) — fabricating nulls=0 there made
                # isnull/notnull pruning silently drop every chunk of a
                # masked keyless read, so its null count stays unknown
                st: dict = {"n": c["n"]}
                if c.get("codec") != "enc":
                    st["nulls"] = c.get("nulls", 0)
                if "min" in c:
                    st["min"], st["max"] = c["min"], c["max"]
                stats[c["name"]] = st
            for bc in self.opts.bloom_columns:
                if bc in sub.column_names:
                    from ..codecs import bloom

                    stats.setdefault(bc, {})["bloom"] = bloom.serialize(
                        bloom.build(sub.column(bc), self.opts.bloom_fpp)
                    )
            recs["chunk_id"].append(cid)
            recs["input_file"].append(path)
            recs["n_rows"].append(sub.num_rows)
            recs["raw_bytes"].append(sub.nbytes)
            recs["enc_bytes"].append(len(payload))
            recs["codecs"].append(json.dumps(codecs))
            recs["stats"].append(json.dumps(stats))
            recs["wall_ms"].append((time.time() - t0) * 1e3)
        return pa.table(recs, schema=mstate.MANIFEST_SCHEMA)


def encode_dataset(
    input_paths,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    columns: list[str] | None = None,
    batch_size: int | None = 16384,
    concurrency=None,
    resume: bool = False,
    partition_by: str | None = None,
    salt_length_col: str | None = None,
    file_format: str = "parquet",
    ds=None,
) -> dict:
    """Encode columnar inputs into a chunk store; returns the commit record.

    ``partition_by`` enables the salted hash shuffle (column name, e.g.
    "source"); ``salt_length_col`` adds a floor(log2(len)) bucket from that
    int column (e.g. "n_tok") to break long-document skew.  ``file_format``
    accepts parquet (fast direct-read path) or csv / json (the convert-tool
    analog: ray.data readers + trust-mode commit, since those formats carry
    no row-count metadata).  ``ds`` lets a caller pass a pre-built Dataset
    instead of paths (tests).
    """
    files = _resolve_files(input_paths, file_format) if ds is None else []
    if batch_size is None:
        # memory governor (MemoryManagerImpl analog): size batches from
        # parquet metadata + node budget + concurrency; see governor.py.
        # Only parquet file inputs carry the metadata the governor needs —
        # refuse silently un-governed csv/json/ds inputs (the caller asked
        # for memory-aware batching and must not believe it is active)
        if not files or file_format != "parquet":
            raise ValueError(
                "batch_size=None (memory governor) requires parquet file "
                "inputs; pass an explicit batch_size for csv/json/ds inputs"
            )
        from .governor import plan_batch_size

        batch_size = plan_batch_size(files, columns)
    expected: dict | None = {}
    fast_path = ds is None and file_format == "parquet" and not partition_by
    if ds is None:
        todo = files
        if resume:
            committed = mstate.load_committed(out_dir)["files"]
            if not fast_path:
                # slow paths re-encode whole uncommitted files; the fast
                # path resumes at unit granularity below (durable per-unit
                # manifest parts + content-addressed chunks), so nothing
                # needs deleting there
                mstate.clean_uncommitted(out_dir)
            todo = [f for f in files if f not in committed]
        if file_format == "parquet":
            for f in files:
                expected[f] = pq.read_metadata(f).num_rows
        else:
            expected = None  # trust-mode commit
        if not todo:
            return mstate.commit(out_dir, expected)
        if file_format != "parquet":
            reader = ray.data.read_csv if file_format == "csv" else ray.data.read_json
            dataset = reader(todo, include_paths=True)
            dataset = dataset.map_batches(
                _rename_path_col, batch_format="pyarrow", zero_copy_batch=True
            )
        elif not partition_by:
            # fast path: direct-read units — raw bytes never enter the
            # object store (only manifest rows do); see _plan_units.
            # Plain-function map_batches (task pool), NOT an actor pool:
            # Ray task workers are long-lived and reused across pipelines,
            # while actor processes die with their pipeline — in this
            # environment (expensive first-touch page faults, see _mem.py)
            # reusing warm worker heaps measured 4-8x faster at steady
            # state (3.5s vs 14-34s for a 1.7 GB corpus at 32 cpus).  The
            # encoder's per-chunk state (dict/FSST tables) lives inside
            # the call, so tasks lose nothing.
            import functools

            fstore.makedirs(mstate.manifest_dir(out_dir))
            units = _plan_units(todo, columns, unit_rows=batch_size * 2)
            if resume:
                # unit-granular resume: skip units whose manifest part is
                # already durable.  Unit ids depend on the row-group plan
                # (and therefore on batch_size) — parts written by a prior
                # run with a DIFFERENT plan would double-count rows and
                # make commit impossible, so drop any part for a still-
                # uncommitted file whose uid is not in the current plan.
                mdir = mstate.manifest_dir(out_dir)
                plan_names = {
                    f"unit-{_unit_uid([(u['path'], u['row_groups'])])}.parquet" for u in units
                }
                todo_set = set(todo)
                for part in fstore.glob_paths(os.path.join(mdir, "unit-*.parquet")):
                    if os.path.basename(part) in plan_names:
                        # retained part: it must have been written by THIS
                        # format version, or the resumed store would mix
                        # formats and break the byte-identical contract
                        # ("resume across a bump re-encodes, never mixes" —
                        # chunk.py FORMAT_VERSION note).  One chunk-header
                        # probe per part, O(parts) tiny reads.
                        if _part_format_stale(out_dir, part):
                            fstore.remove(part)
                        continue
                    pfiles = set(fstore.read_parquet(part, columns=["input_file"]).column("input_file").to_pylist())
                    if pfiles & todo_set:
                        fstore.remove(part)
                mstate.vacuum_orphans(out_dir)
                units = [
                    u
                    for u in units
                    if not fstore.exists(
                        os.path.join(mdir, f"unit-{_unit_uid([(u['path'], u['row_groups'])])}.parquet")
                    )
                ]
                if not units:
                    return mstate.commit(out_dir, expected)
            dataset = ray.data.from_items(units)
            counts = dataset.map_batches(
                functools.partial(
                    _encode_units, out_dir=out_dir, opts=opts, columns=columns, batch_size=batch_size
                ),
                batch_size=1,
                batch_format="pyarrow",
                num_cpus=1,
            )
            # drive the pipeline by draining count batches on the driver —
            # a .sum() aggregate would add an AllToAll operator whose CPU
            # reservation starves the map stage (measured: 5 of 8 workers);
            # manifest parts are written durably inside the tasks
            for _ in counts.iter_batches(batch_size=None):
                pass
            return mstate.commit(out_dir, expected)
        else:
            dataset = ray.data.read_parquet(todo, columns=columns, include_paths=True)
            dataset = dataset.map_batches(
                _rename_path_col, batch_format="pyarrow", zero_copy_batch=True
            )
    else:
        dataset = ds
        expected = None  # trust-mode commit: a Dataset has no row metadata

    if partition_by:
        dataset = dataset.map_batches(
            _AddSalt(partition_by, salt_length_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # hash shuffle on the salt key: co-locates same-source rows while the
        # length bucket bounds partition byte volume (north-star skew rule)
        dataset = dataset.groupby(_SALT_COL).map_groups(
            lambda g: g, batch_format="pyarrow"
        )

    if concurrency is None:
        # autoscaling actor pool: starts small, grows to the cluster; never
        # reserves the whole CPU budget up front (fixed pools deadlock when
        # two pipelines' pools both demand all cores)
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 1))
    fstore.makedirs(mstate.manifest_dir(out_dir))
    man = dataset.map_batches(
        EncoderActor,
        fn_constructor_args=(out_dir, opts),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
    fstore.ray_write_parquet(man, mstate.manifest_dir(out_dir))
    return mstate.commit(out_dir, expected)


def _wipe_target(in_dir: str, out_dir: str, *, keys_supplied: bool = False) -> None:
    """Wipe-first contract shared by the re-encode ops (sort/zorder/
    compact/shuffle/sample/purge): refuse in-place targets — the wipe
    would destroy the input before the decode stream ever reads it —
    and refuse ENCRYPTED inputs: these ops decode WITHOUT keys, so the
    rewrite would silently replace every encrypted column with its
    masked public variant (verified: a keyed read of such an output
    recovers only NULLs — irreversible data loss, not an error).
    ``keys_supplied=True`` (rekey_store only) lifts the encrypted-input
    refusal: that op decodes WITH the current keys, so the plaintext
    survives the rewrite."""
    import json as _json
    import os

    from ..state import manifest as _mstate
    from ..state import storage as fstore

    man = _mstate.read_manifest(str(in_dir))
    if man.num_rows and not keys_supplied:
        enc_cols = {
            col
            for cj in man.column("codecs").to_pylist()
            for col, tag in _json.loads(cj).items()
            if tag == "enc"
        }
        if enc_cols:
            raise ValueError(
                f"store {in_dir!r} has encrypted columns {sorted(enc_cols)}: a keyless "
                "re-encode would permanently replace them with their masked variants. "
                "Decode with keys and re-encode with EncodeOptions(encrypt=..., "
                "encryption_keys=...) explicitly instead."
            )

    # canonical() sees through URL/path aliases of the same store
    # (file:///x vs /x, symlinks, s3://b//k), so the containment check
    # can't be defeated by spelling the same location two ways.
    skind, src = fstore.canonical(str(in_dir))
    dkind, dst = fstore.canonical(str(out_dir))
    sep = os.sep if skind == "local" else "/"
    if skind == dkind and (
        src == dst or src.startswith(dst + sep) or dst.startswith(src + sep)
    ):
        raise ValueError(
            f"out_dir {out_dir!r} overlaps the input store {in_dir!r}: in-place "
            "re-encode would wipe or corrupt the data — write to a disjoint path"
        )
    # the wipe must actually happen on URL targets too — a silent no-op
    # would leave stale unit-*.parquet manifest parts that double-count
    # rows at commit (exactly the hazard the wipe exists to prevent)
    fstore.rmtree(str(out_dir))


def sort_store(
    in_dir: str,
    out_dir: str,
    by: str | list[str],
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    batch_size: int = 16384,
    descending: bool = False,
) -> dict:
    """Re-encode a chunk store globally sorted by ``by`` — the
    cluster-for-stripe-elimination pattern: after sorting, each chunk
    covers a narrow key range, so min/max (and stride) pruning on the sort
    key skips almost everything.  One all-to-all exchange (Ray Data sort),
    then the normal streaming encode; nothing materializes on the driver.

    The target is wiped first: the ds-path encode commits in trust mode,
    so parts left by an interrupted earlier run would otherwise sum into
    the new manifest and double-count rows.
    """
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)

    ds = decode_dataset(in_dir)
    ds = ds.sort(by, descending=descending)
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)


def pack_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    window: int = 2048,
    batch_size: int | None = None,
) -> dict:
    """Pack a pre-tokenized store into fixed-context training rows — the
    token-level concat-then-chunk op the north-star corpus exists for:
    documents in ``key_col`` order are laid head-to-tail in token space
    and cut every ``window`` tokens, documents spanning a boundary are
    SPLIT, and the output rows (seq_id, tokens:list<T> of exactly
    ``window`` tokens except the final remainder, n_tok) re-encode into
    ``out_dir`` through the normal streaming pipeline.

    Shape: list lengths -> distributed prefix scan (O(blocks) driver
    state) -> a vectorized per-batch piece stage (offset algebra over the
    already-flattened child; a doc yields ~n_tok/window + 1 pieces) ->
    list_concat_by_key window assembly (ONE range sort; <=2 boundary
    windows per block heal on the driver, each bounded by ``window``
    values).  Null token lists pack as empty; null ELEMENTS ride through
    verbatim (the packer moves tokens, it does not judge them).
    Deterministic: same (store, key, window) -> byte-identical output,
    preserving the retry/resume contract of the other re-encode ops."""
    import pyarrow.compute as pc

    from ..functions.aggregates import list_concat_by_key, with_prefix_sum
    from .decode import decode_dataset

    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if batch_size is None:
        # ~16 MiB of int32 tokens per chunk: window rows are dense, so the
        # row count per chunk shrinks as the window grows
        batch_size = max(256, (4 << 20) // window)
    _wipe_target(in_dir, out_dir)

    def counts(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.list_value_length(t.column(tokens_col)), 0)
        return pa.table(
            {
                key_col: t.column(key_col),
                tokens_col: t.column(tokens_col),
                "_n": n.cast(pa.int64()),
            }
        )

    scanned = with_prefix_sum(
        decode_dataset(in_dir, columns=[key_col, tokens_col]).map_batches(
            counts, batch_format="pyarrow", zero_copy_batch=True
        ),
        [key_col],
        "_n",
        out="_cum",
    )

    def pieces(t: pa.Table) -> pa.Table:
        lists = t.column(tokens_col)
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        child_type = lists.type.value_type
        empty = pa.table(
            {
                "seq_id": pa.array([], pa.int64()),
                "_g": pa.array([], pa.int64()),
                "_piece": pa.array([], pa.list_(child_type)),
            }
        )
        if t.num_rows == 0:
            return empty
        if lists.null_count:
            lists = pc.fill_null(lists, pa.scalar([], lists.type))
        loff = np.asarray(lists.offsets, dtype=np.int64)
        nw = np.diff(loff)
        total = int(nw.sum())
        if total == 0:
            return empty
        cum = t.column("_cum").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(nw.size), nw)
        local = np.arange(total) - np.repeat(np.cumsum(nw) - nw, nw)
        src = np.repeat(loff[:-1], nw) + local  # absolute child indices
        g = np.repeat(cum, nw) + local          # global token positions
        w = g // window
        brk = np.ones(total, dtype=bool)
        brk[1:] = (w[1:] != w[:-1]) | (doc_idx[1:] != doc_idx[:-1])
        starts = np.flatnonzero(brk)
        poff = np.empty(starts.size + 1, dtype=np.int64)
        poff[:-1] = starts
        poff[-1] = total
        vals = lists.values.take(pa.array(src))
        piece = pa.ListArray.from_arrays(
            pa.array(poff.astype(np.int32), pa.int32()), vals
        )
        return pa.table(
            {
                "seq_id": pa.array(w[starts]),
                "_g": pa.array(g[starts]),
                "_piece": piece,
            }
        )

    pcs = scanned.map_batches(pieces, batch_format="pyarrow", zero_copy_batch=True)
    packed = list_concat_by_key(pcs, "seq_id", "_g", "_piece", out=tokens_col)

    def finish(t: pa.Table) -> pa.Table:
        if tokens_col not in t.column_names:
            return pa.table({})  # schema-less empty sort partition
        if t.num_rows == 0:
            # typed empty: a bare pa.table({}) would make Ray unify
            # mismatched schemas across blocks and warn
            return pa.table(
                {
                    "seq_id": t.column("seq_id"),
                    tokens_col: t.column(tokens_col),
                    "n_tok": pa.array([], pa.int32()),
                    _SALT_COL: pa.array([], pa.int64()),
                }
            )
        n = pc.list_value_length(t.column(tokens_col)).cast(pa.int32())
        sid = t.column("seq_id")
        return pa.table(
            {
                "seq_id": sid,
                tokens_col: t.column(tokens_col),
                "n_tok": n,
                # chunk grouping derived from ROW SPACE (seq range), not
                # stream topology: Ray's sort boundary sampling shifts
                # block splits between runs, and content-addressed chunks
                # would differ — grouping by seq_id // batch_size makes
                # every chunk's contents a pure function of the data, so
                # re-runs are byte-identical (the resume contract)
                _SALT_COL: pc.divide(sid, batch_size).cast(pa.int64()),
            }
        )

    grouped = (
        packed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_SALT_COL)
        .map_groups(
            functools.partial(_encode_pack_group, out_dir=out_dir, opts=opts),
            batch_format="pyarrow",
        )
    )
    fstore.makedirs(mstate.manifest_dir(out_dir))
    fstore.ray_write_parquet(grouped, mstate.manifest_dir(out_dir))
    return mstate.commit(out_dir, None)


def _encode_pack_group(g: pa.Table, *, out_dir: str, opts: EncodeOptions) -> pa.Table:
    """Encode ONE seq-range group as its own chunk (pack_store's chunking
    unit) — runs inside map_groups, writes the chunk, returns its
    manifest row."""
    if g.num_rows == 0:
        return pa.table({}, schema=mstate.MANIFEST_SCHEMA)
    g = g.sort_by("seq_id").drop_columns([_SALT_COL])
    return EncoderActor(out_dir, opts)(g)


def tokenize_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    text_col: str = "text",
    n_merges: int = 256,
    top_words: int | None = None,
    batch_size: int = 8192,
    verify: bool = True,
    model_path: str | None = None,
    stats_out: dict | None = None,
) -> dict:
    """Tokenize a text store into the pre-training token table with a
    byte-level BPE trained on the store's own word frequencies — the
    "raw documents in, (.., tokens:list<int32>, n_tok) out" step in
    front of `pack` (see functions/bpe.py for the trainer/apply
    contract and scale shape).

    Every non-text column rides through unchanged; the trained merge
    table is persisted beside the manifest (bpe_model.json) so decoded
    tokens remain interpretable and a later corpus can be tokenized with
    the SAME model — pass ``model_path`` (a prior run's bpe_model.json)
    to SKIP training and reuse that model verbatim, the production flow
    where one tokenizer serves every corpus.  Wipe-first like every
    re-encode op."""
    import base64
    import json as _json

    from ..functions.bpe import bpe_apply, bpe_train
    from ..state import storage as fstore
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)

    ds = decode_dataset(in_dir)
    tstats: dict = {}
    if model_path is not None:
        m = _json.loads(fstore.read_bytes(str(model_path)).decode())
        if m.get("alphabet") != "bytes-256":
            raise ValueError(f"unsupported BPE model alphabet: {m.get('alphabet')!r}")
        merges = [tuple(x) for x in m["merges"]]
        sym_bytes = [bytes([b]) for b in range(256)] + [
            base64.b64decode(s) for s in m["vocab_b64"]
        ]
        for left, right, new_id in merges:  # model self-consistency
            if sym_bytes[new_id] != sym_bytes[left] + sym_bytes[right]:
                raise ValueError(f"corrupt BPE model: merge {new_id} bytes mismatch")
    else:
        merges, sym_bytes = bpe_train(
            ds, text_col=text_col, n_merges=n_merges, top_words=top_words,
            stats_out=tstats,
        )
    tok = bpe_apply(ds, (merges, sym_bytes), text_col=text_col, verify=verify)
    rec = encode_dataset(None, out_dir, opts, ds=tok, batch_size=batch_size)
    model = {
        "alphabet": "bytes-256",
        "n_merges": len(merges),
        "merges": [[l, r, n] for l, r, n in merges],
        "vocab_b64": [base64.b64encode(s).decode() for s in sym_bytes[256:]],
    }
    fstore.write_json_atomic(os.path.join(str(out_dir), "bpe_model.json"), model)
    if stats_out is not None:
        stats_out.update(tstats)
        stats_out["n_merges"] = len(merges)
    return rec


def dedup_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    key_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 16384,
    stats_out: dict | None = None,
) -> dict:
    """Exact-dedup store rewrite: keep ONE row (the smallest ``id_col``)
    per distinct ``key_col`` value — the curation-side hard dedup as a
    wipe-first store op, completing the CLI family next to dedup-cut
    (substring spans) and purge (predicate deletes).

    Scale shape: rows are grouped on a DOUBLE 64-bit content fingerprint
    of the key bytes (never the key value itself — group keys stay 17
    bytes/row however large the documents are); the winner-per-group
    selection is the distributed window-rank operator (one range sort +
    O(blocks) driver carries, nothing O(distinct keys) anywhere), and the
    survivors stream straight into the encoder.  The full rows make one
    exchange — inherent to a rewrite whose survivors must reach the
    writer.  NULL keys form their own group, distinct from '' (SQL GROUP
    BY semantics).  Two texts that collide on BOTH independent 64-bit
    fingerprints (~2^-128 per pair) would merge; the query-side
    dedup_exact documents the same double-fingerprint contract."""
    import pyarrow.compute as pc

    from ..functions.dedup import _varbytes, content_hash64
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)

    def add_fp(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        concat, offsets = _varbytes(col)
        fp = content_hash64(concat, offsets, 0x3C79AC492BA7B653)
        fp2 = content_hash64(concat, offsets, key=0x9FB21C651E98DF25)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
        t = t.append_column("__nul", pa.array(isnull))
        t = t.append_column("__fp", pa.array(fp.astype(np.int64)))
        return t.append_column("__fp2", pa.array(fp2.astype(np.int64)))

    from ..functions.aggregates import with_group_ranks

    ds = decode_dataset(in_dir).map_batches(
        add_fp, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked = with_group_ranks(ds, ["__nul", "__fp", "__fp2"], [id_col], out="__rnk")

    def first_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and not t.column_names:
            return pa.table({})
        keep = pc.equal(t.column("__rnk"), 1)
        return t.filter(keep).drop_columns(["__nul", "__fp", "__fp2", "__rnk"])

    survivors = ranked.map_batches(first_only, batch_format="pyarrow", zero_copy_batch=True)
    rec = encode_dataset(None, out_dir, opts, ds=survivors, batch_size=batch_size)
    if stats_out is not None:
        stats_out["rows_kept"] = rec["totals"]["rows"]
    return rec


def compact_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    batch_size: int = 16384,
) -> dict:
    """Re-encode a store at a fresh chunk size WITHOUT sorting — the
    small-files compaction every long-lived store needs (many tiny
    appended/merged chunks -> few full-sized ones; dictionary and FSST
    tables rebuild over the larger chunks, usually shrinking bytes).
    Zero shuffle: decode streams straight into encode.  Same wipe-first
    contract as sort_store (trust-mode commit)."""
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)
    return encode_dataset(None, out_dir, opts, ds=decode_dataset(in_dir), batch_size=batch_size)


def purge_store(
    in_dir: str,
    out_dir: str,
    predicates: list[tuple],
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    batch_size: int = 16384,
) -> dict:
    """Physically rewrite a store DROPPING every row that matches
    ``predicates`` (the same grammar decode accepts) — the GDPR-style
    hard delete that complements the versioned table's logical 'd'
    deltas: matched rows do not survive in any chunk of the output.

    Zero shuffle: the decode stream applies the predicate per batch
    (stats pruning does NOT apply — a chunk that may contain survivors
    must still be read) and streams straight into encode.  Same
    wipe-first commit contract as sort/compact."""
    import pyarrow.compute as pc

    from .decode import _mask, decode_dataset

    _wipe_target(in_dir, out_dir)

    def drop(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m = None
        for p in predicates:
            mm = _mask(t, p)
            if mm is None:
                continue
            m = mm if m is None else pc.and_(m, mm)
        if m is None:
            return t
        # nulls in the predicate result mean "did not match" -> kept
        return t.filter(pc.invert(pc.fill_null(m, False)))

    ds = decode_dataset(in_dir).map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)


def dedup_cut_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    batch_size: int = 16384,
    stats_out: dict | None = None,
    broadcast_budget_bytes: int | None = None,
) -> dict:
    """Rewrite a store with every duplicated-substring span physically cut
    from ``text_col`` (the Lee et al. 2022 dedup transform as a store
    operation): bytes covered by any ``window``-byte gram occurring >= 2
    times corpus-wide are removed, docs left empty are dropped, every
    other column rides along unchanged.  Same wipe-first commit contract
    as sort/compact; the cut itself is functions/substring.py's dual-arm
    operator (broadcast probe, or partitioned semi-join past the
    broadcast budget)."""
    from ..functions.substring import _DEFAULT_BROADCAST_BUDGET, cut_dup_spans
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)
    if broadcast_budget_bytes is None:
        broadcast_budget_bytes = _DEFAULT_BROADCAST_BUDGET
    cleaned = cut_dup_spans(
        decode_dataset(in_dir), id_col=id_col, text_col=text_col, L=window,
        stats_out=stats_out, replace_text=True,
        broadcast_budget_bytes=broadcast_budget_bytes,
    )
    return encode_dataset(None, out_dir, opts, ds=cleaned, batch_size=batch_size)


def recover_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    batch_size: int = 16384,
) -> dict:
    """Salvage a damaged store into a fresh CONSISTENT one: recovery
    decode (``on_corrupt="skip"`` — corrupt and missing chunks dropped,
    checksum verification forced on) streaming straight into a normal
    encode.  The output commits in trust mode over what actually
    survived, so its manifest, commit record and fsck are all green even
    though rows were lost; the caller learns exactly how many from the
    returned totals vs the damaged manifest.  Zero shuffle.  The
    keyless-re-encode guard applies as usual: an ENCRYPTED damaged store
    must be rekeyed (rekey_store) instead, not blindly salvaged."""
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)
    ds = decode_dataset(in_dir, on_corrupt="skip")
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)


def rekey_store(
    in_dir: str,
    out_dir: str,
    opts: EncodeOptions,
    *,
    keys: dict,
    batch_size: int = 16384,
    on_corrupt: str = "raise",
) -> dict:
    """Encryption key ROTATION (the ORC/Hive column-key rotation story):
    decode the store WITH its current keys — exact plaintext, checksum
    verification forced on by the keyed read — and stream straight into
    a fresh encode under ``opts``'s new encrypt map + keystore.  Zero
    shuffle; plaintext exists only inside the decode→encode tasks, never
    on disk.  The keyless-re-encode guard is lifted explicitly here
    (keys_supplied) because this is the one re-encode op whose decode
    recovers the true values rather than the masked variants.

    ``keys``: the CURRENT {key name -> master key} map.  ``opts`` must
    carry the NEW ``encrypt`` column map and ``encryption_keys``; columns
    may also be re-keyed to the same name with fresh material, added, or
    dropped from encryption entirely (decrypt-on-rotate).

    ``on_corrupt="skip"`` is the salvage-rotate path for a DAMAGED
    encrypted store — the one case plain ``recover_store`` cannot handle
    (it refuses keyless re-encodes): bad chunks drop, survivors rotate.
    """
    from .decode import decode_dataset

    if not keys:
        raise ValueError(
            "rekey_store requires the store's CURRENT keys: a keyless rewrite "
            "would replace encrypted columns with their masked variants"
        )
    _wipe_target(in_dir, out_dir, keys_supplied=True)
    ds = decode_dataset(in_dir, keys=keys, on_corrupt=on_corrupt)
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)


def _rename_path_col(batch: pa.Table) -> pa.Table:
    if "path" in batch.column_names:
        names = [(_PATH_COL if n == "path" else n) for n in batch.column_names]
        batch = batch.rename_columns(names)
    return batch


class _AddSalt:
    def __init__(self, key_col: str, length_col: str | None):
        self.key_col = key_col
        self.length_col = length_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        n = batch.num_rows
        key = batch.column(self.key_col)
        # stable hash of the key column: crc32 per unique value (few), gathered
        idx = pa.compute.dictionary_encode(key)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        crcs = np.array(
            [zlib.crc32(str(v).encode()) for v in idx.dictionary.to_pylist()],
            dtype=np.int64,
        )
        base = crcs[idx.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        if self.length_col:
            ln = batch.column(self.length_col).to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = np.zeros(n, dtype=np.int64)
            nz = ln > 0
            bucket[nz] = np.log2(ln[nz]).astype(np.int64)
            salt = base * 16 + np.clip(bucket, 0, 15)
        else:
            salt = base
        return batch.append_column(_SALT_COL, pa.array(salt))


def zorder_store(
    in_dir: str,
    out_dir: str,
    cols: list[str],
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    batch_size: int = 16384,
    bits: int | None = None,
) -> dict:
    """Re-encode a chunk store clustered on a Z-ORDER (Morton) curve over
    ``cols`` — multi-dimensional clustering: after the curve sort, each
    chunk covers a narrow range of EVERY participating column, so the
    existing min/max chunk+stride pruning works for predicates on any of
    them (a linear ``sort_store`` only tightens its leading key).  The
    classic lakehouse OPTIMIZE ZORDER BY move, built from the pieces the
    engine already has: manifest stats supply the global value ranges
    with NO extra data pass, one map_batches computes the interleaved
    key, one Ray Data sort clusters, and the streaming encode + stats
    machinery does the rest.

    Numeric columns only (int/float/temporal).  ``bits`` defaults to
    64 // len(cols) capped at 16 per column.
    """
    import functools
    import json as _json

    from ..state import manifest as mstate
    from .decode import decode_dataset

    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_store for one)")
    b = bits or min(16, 63 // len(cols))
    if b * len(cols) > 63:
        # 63, not 64: the key column is int64 and a used sign bit would
        # split the curve (negative keys sort first)
        raise ValueError("bits * len(cols) must be <= 63")

    # global per-column [min, max] from the committed manifest stats —
    # the zero-pass range estimate (RowIndex/file-stats analog)
    man = mstate.read_manifest(in_dir)
    lo: dict[str, float] = {}
    hi: dict[str, float] = {}
    for s in man.column("stats").to_pylist():
        st = _json.loads(s)
        for c in cols:
            if c in st and st[c].get("min") is not None:
                mn, mx = float(st[c]["min"]), float(st[c]["max"])
                lo[c] = mn if c not in lo else min(lo[c], mn)
                hi[c] = mx if c not in hi else max(hi[c], mx)
    missing = [c for c in cols if c not in lo]
    if missing:
        raise ValueError(f"no numeric manifest stats for zorder columns: {missing}")

    def zkey(t: pa.Table, *, cols, lo, hi, b) -> pa.Table:
        k = len(cols)
        z = np.zeros(t.num_rows, dtype=np.uint64)
        for i, c in enumerate(cols):
            col = t.column(c)
            if pa.types.is_temporal(col.type):
                # Arrow has no timestamp->double cast; go through the
                # epoch integer (which is also how the manifest stores
                # temporal min/max stats)
                col = col.cast(pa.int64())
            v = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
            span = hi[c] - lo[c]
            q = np.clip((v - lo[c]) / (span if span > 0 else 1.0), 0.0, 1.0)
            cell = np.minimum((q * (1 << b)).astype(np.uint64), np.uint64((1 << b) - 1))
            for j in range(b):
                z |= ((cell >> np.uint64(j)) & np.uint64(1)) << np.uint64(j * k + i)
        return t.append_column("_zkey", pa.array(z.view(np.int64)))

    _wipe_target(in_dir, out_dir)
    ds = decode_dataset(in_dir)
    ds = ds.map_batches(
        functools.partial(zkey, cols=cols, lo=lo, hi=hi, b=b),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("_zkey")
    ds = ds.map_batches(
        lambda t: t.drop_columns(["_zkey"]), batch_format="pyarrow", zero_copy_batch=True
    )
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)

def shuffle_store(
    in_dir: str,
    out_dir: str,
    key_col: str,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    seed: int = 0,
    batch_size: int = 16384,
) -> dict:
    """Re-encode a store in a DETERMINISTIC pseudo-random global order —
    the pre-training shuffle every LLM data pipeline runs before sequence
    packing.  Each row's position comes from splitmix64(key ^ seed)
    (ties broken by the key itself), so the same (store, key, seed)
    always yields byte-identical output across runs, task retries and
    cluster sizes — unlike ``Dataset.random_shuffle`` whose layout
    depends on the block topology.  One all-to-all exchange (range sort
    on the derived key), then the normal streaming encode.  Wipe-first /
    trust-mode commit like sort_store."""

    import pyarrow.compute as pc

    from ..codecs.hashmix import splitmix64_mix
    from .decode import decode_dataset

    _wipe_target(in_dir, out_dir)

    def add_key(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        int_like = (
            (pa.types.is_integer(col.type) and not pa.types.is_uint64(col.type))
            or pa.types.is_temporal(col.type)
        )
        if int_like and col.null_count == 0:
            k = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            # string/uint64/nullable keys: md5-derived int64 over the string
            # form (nulls -> "", one shared position — same deterministic
            # contract; an int64 cast would NaN-garble nulls and overflow
            # uint64 >= 2^63)
            from ..functions.md5vec import md5_hex15_int

            k = md5_hex15_int(pc.fill_null(pc.cast(col, pa.string()), ""))
        with np.errstate(over="ignore"):
            h = splitmix64_mix(k.view(np.uint64) ^ np.uint64(seed))
        return t.append_column("_shuf", pa.array(h.view(np.int64)))

    ds = (
        decode_dataset(in_dir)
        .map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["_shuf", key_col])
        .map_batches(
            lambda t: t.drop_columns(["_shuf"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)

def sample_store(
    in_dir: str,
    out_dir: str,
    key_col: str,
    pct: int,
    opts: EncodeOptions = DEFAULT_OPTIONS,
    *,
    batch_size: int = 16384,
) -> dict:
    """Deterministic ``pct``-percent store sample: keep rows where
    md5(key) mod 100 < pct (the q_hash_split bucket rule — SQL-mirrorable
    bit-for-bit, shard- and retry-stable, and CONSISTENT across tables
    sharing the key).  Zero shuffle: the filter runs inside the decode
    stream and feeds straight into encode."""

    import pyarrow.compute as pc

    from ..functions.md5vec import md5_hex15_int
    from .decode import decode_dataset

    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be 0..100, got {pct}")
    _wipe_target(in_dir, out_dir)

    def keep(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(key_col), pa.string())
        m = md5_hex15_int(ids) % 100 < pct
        return t.filter(pa.array(m))

    ds = decode_dataset(in_dir).map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return encode_dataset(None, out_dir, opts, ds=ds, batch_size=batch_size)
