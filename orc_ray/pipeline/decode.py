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

import glob
import json
import operator
import os

import pyarrow as pa

import ray

from ..chunk import decode_chunk
from ..state import manifest as mstate

_OPS = {
    ">": operator.gt,
    ">=": operator.ge,
    "<": operator.lt,
    "<=": operator.le,
    "==": operator.eq,
    "!=": operator.ne,
}


def _chunk_may_match(stats: dict, pred: tuple) -> bool:
    """Conservative min/max + bloom test: False only if NO row can match."""
    col, op, val = pred
    st = stats.get(col)
    if st is None:
        return True
    if op == "==" and "bloom" in st:
        from ..codecs import bloom

        if not bloom.might_contain(bloom.deserialize(st["bloom"]), val):
            return False
    if "min" not in st:
        return True
    lo, hi = st["min"], st["max"]
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == "==":
        return lo <= val <= hi
    return True  # != and unknown ops: cannot prune


def list_chunks(out_dir: str, predicates: list[tuple] | None = None) -> tuple[list[str], int, int]:
    """Chunk file paths (optionally stats-pruned). Returns (paths, kept, total)."""
    man = mstate.read_manifest(out_dir)
    if man.num_rows == 0:
        paths = sorted(glob.glob(os.path.join(mstate.chunk_dir(out_dir), "*.oray")))
        return paths, len(paths), len(paths)
    ids = man.column("chunk_id").to_pylist()
    stats = [json.loads(s) for s in man.column("stats").to_pylist()]
    keep = []
    for cid, st in zip(ids, stats):
        if predicates and not all(_chunk_may_match(st, p) for p in predicates):
            continue
        keep.append(os.path.join(mstate.chunk_dir(out_dir), f"{cid}.oray"))
    return sorted(keep), len(keep), len(ids)


def _decode_batch(batch: pa.Table, *, columns, predicates, cast_schema=None) -> pa.Table:
    """Task-pool entry: decode a batch of chunk blobs."""
    return _DecodeChunks(columns, predicates, cast_schema)(batch)


class _DecodeChunks:
    def __init__(self, columns: list[str] | None, predicates: list[tuple] | None, cast_schema=None):
        pa.set_memory_pool(pa.system_memory_pool())  # glibc heap: see _mem.py
        self.columns = columns
        self.predicates = predicates
        # schema evolution: reader-schema conversion at decode time — the
        # analog of the reference's SchemaEvolution/ConvertColumnReader
        # (numeric widening, string<->numeric, timestamp conversions) via
        # Arrow cast kernels.  {column -> target pa.DataType}
        self.cast_schema = cast_schema
        # decode must include predicate columns even when projected away
        if columns is None:
            self.decode_cols = None
        else:
            extra = [p[0] for p in predicates or [] if p[0] not in columns]
            self.decode_cols = list(columns) + extra

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tables = []
        for blob in batch.column("bytes").to_pylist():
            t = decode_chunk(blob, columns=self.decode_cols)
            if self.predicates:
                mask = None
                for col, op, val in self.predicates:
                    if col not in t.column_names:
                        continue
                    m = _OPS[op](pc.field(col), pa.scalar(val))
                    mask = m if mask is None else pc.and_(mask, m)
                if mask is not None:
                    t = t.filter(mask)
            if self.columns is not None and t.column_names != self.columns:
                t = t.select(self.columns)
            if self.cast_schema:
                for name, ty in self.cast_schema.items():
                    if name in t.column_names:
                        i = t.column_names.index(name)
                        t = t.set_column(i, name, t.column(name).cast(ty))
            tables.append(t)
        if not tables:
            return pa.table({})
        out = pa.concat_tables(tables).combine_chunks()
        if out.num_rows == 0:
            return out.schema.empty_table()  # keep schema on empty output
        return out


def scan_count(out_dir: str, *, columns=None, predicates=None) -> int:
    """Fused decode + count: chunks are fully decoded inside each task but
    only row counts leave it (no object-store writeback of decoded blocks).
    The orc-scan analog, and the right shape for any reduce-style consumer
    at scale: decode feeds the reduction in-task."""
    import functools

    paths, _, _ = list_chunks(out_dir, predicates)
    if not paths:
        return 0
    ds = ray.data.read_binary_files(paths)

    def _count(batch: pa.Table, **kw) -> pa.Table:
        t = _decode_batch(batch, **kw)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    counted = ds.map_batches(
        functools.partial(_count, columns=columns, predicates=predicates, cast_schema=None),
        batch_size=None,
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
) -> "ray.data.Dataset":
    """Lazy decode of a chunk store into a Dataset of original rows.

    ``predicates``: list of (column, op, value) tuples — applied both as
    manifest min/max + bloom pruning (chunks skipped entirely) and exactly
    per batch after decode.  ``cast_schema``: {column -> pa.DataType}
    reader-schema conversion (schema evolution layer).
    """
    import functools

    paths, kept, total = list_chunks(out_dir, predicates)
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.read_binary_files(paths)
    # plain-function map_batches (task pool): task workers are reused
    # across pipelines, keeping heaps warm — see encode.py rationale
    return ds.map_batches(
        functools.partial(_decode_batch, columns=columns, predicates=predicates, cast_schema=cast_schema),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=1,
    )
