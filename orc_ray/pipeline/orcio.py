"""Apache ORC file interop — read and write REAL .orc files.

The reference IS the ORC format: its users' data lives in .orc files.
This module lets an orc_ray pipeline consume and produce those files
directly through the compiled ORC C++ core via ``pyarrow.orc`` — the
same live oracle the codec tests already run against — so a user of the
reference can point this engine at their existing files and get their
existing format back out.

Reference analogs:
- stripe-parallel read — one read unit per (file, stripe), mirroring
  OrcInputFormat.getSplits' stripe-aligned splits
  (java/mapreduce/.../OrcInputFormat.java) and RecordReaderImpl's stripe
  iteration (java/core/.../impl/RecordReaderImpl.java);
- column projection pushed into the ORC reader
  (Reader.Options.include / RowReaderOptions analog): only selected
  streams are decompressed by the C++ core;
- the write side is the engine-as-converter direction of the orc-tools
  ``convert`` command (tools/src/java/org/apache/orc/tools/convert/*).

Scale shape: reads are lazy ``from_items(units) -> map_batches`` with
one task per stripe (direct-read — raw ORC bytes never transit the
object store); writes are a streaming partitioned sink — each block
becomes one content-addressed ``part-<sha>.orc`` file, so re-runs are
idempotent and a failed export resumes by skipping parts that already
exist (same durability contract as the chunk store).

Type note: ORC stores timestamps at nanosecond precision, so a
``timestamp[us]`` column reads back as ``timestamp[ns]``; pass
``cast_schema`` to restore the reader schema (the engine's
schema-evolution layer shape).
"""

from __future__ import annotations

import functools
import hashlib
import os

import pyarrow as pa
import pyarrow.orc as po

import ray


def plan_orc_units(paths) -> list[dict]:
    """(file, stripe) read units — the stripe-aligned split plan."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            files += sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".orc")
            )
        else:
            files.append(p)
    units = []
    for f in files:
        n = po.ORCFile(f).nstripes
        units += [{"path": f, "stripe": s} for s in range(n)]
    return units


def _read_stripe_batch(batch: pa.Table, *, columns, cast_schema) -> pa.Table:
    tables = []
    for path, stripe in zip(
        batch.column("path").to_pylist(), batch.column("stripe").to_pylist()
    ):
        rb = po.ORCFile(path).read_stripe(stripe, columns=columns)
        tables.append(pa.Table.from_batches([rb]))
    t = pa.concat_tables(tables)
    if cast_schema:
        fields = [
            pa.field(f.name, cast_schema.get(f.name, f.type)) for f in t.schema
        ]
        t = t.cast(pa.schema(fields))
    return t


def read_orc(
    paths,
    *,
    columns: list[str] | None = None,
    cast_schema: dict | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """Lazy stripe-parallel Dataset over .orc file(s) or a directory.

    ``columns`` is pushed into the ORC C++ reader (only those streams are
    read); ``cast_schema`` ({column -> pa.DataType}) applies a reader
    schema after decode (e.g. timestamp[ns] -> timestamp[us]).
    """
    units = plan_orc_units(paths)
    if not units:
        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.from_items(units)
    return ds.map_batches(
        functools.partial(_read_stripe_batch, columns=columns, cast_schema=cast_schema),
        batch_size=1,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )


def _write_part(batch: pa.Table, *, out_dir: str, ext: str, serialize) -> pa.Table:
    """Shared content-addressed part sink: serialize the block, name the
    file by its sha256, skip if present (idempotent resume)."""
    if batch.num_rows == 0:
        return pa.table(
            {"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64()),
             "bytes": pa.array([], pa.int64())}
        )
    blob = serialize(batch)
    name = hashlib.sha256(blob).hexdigest()[:16]
    path = os.path.join(out_dir, f"part-{name}.{ext}")
    if not os.path.exists(path):  # content-addressed: resume skips done parts
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    return pa.table(
        {"path": [path], "rows": [batch.num_rows], "bytes": [len(blob)]}
    )


def _write_orc_part(
    batch: pa.Table, *, out_dir: str, compression: str, stripe_size: int | None
) -> pa.Table:
    def serialize(b: pa.Table) -> bytes:
        sink = pa.BufferOutputStream()
        kw = {"compression": compression}
        if stripe_size is not None:
            kw["stripe_size"] = stripe_size
        po.write_table(b, sink, **kw)
        return sink.getvalue().to_pybytes()

    return _write_part(batch, out_dir=out_dir, ext="orc", serialize=serialize)


def write_orc(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    compression: str = "zstd",
    stripe_size: int | None = None,
    batch_size: int = 65536,
) -> pa.Table:
    """Streaming partitioned ORC sink: one content-addressed part file per
    block.  Returns the small (one row per part) write manifest."""
    os.makedirs(out_dir, exist_ok=True)
    man = ds.map_batches(
        functools.partial(
            _write_orc_part,
            out_dir=out_dir,
            compression=compression,
            stripe_size=stripe_size,
        ),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=1,
    )
    return _collect_manifest(man)


def _collect_manifest(man) -> pa.Table:
    parts = [
        b for b in man.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows
    ]
    if not parts:
        return pa.table(
            {"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64()),
             "bytes": pa.array([], pa.int64())}
        )
    return pa.concat_tables(parts).sort_by("path")


def write_parquet_parts(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    compression: str = "zstd",
    batch_size: int = 65536,
) -> pa.Table:
    """Streaming partitioned Parquet sink with the same content-addressed
    idempotent-resume contract as :func:`write_orc` — the export direction
    back to the engine's own input format (store -> parquet), so a decoded
    store re-enters any parquet-reading pipeline without a driver-side
    materialization.  One ``part-<sha>.parquet`` file per block."""
    import pyarrow.parquet as pq

    def serialize(b: pa.Table) -> bytes:
        sink = pa.BufferOutputStream()
        pq.write_table(b, sink, compression=compression)
        return sink.getvalue().to_pybytes()

    os.makedirs(out_dir, exist_ok=True)
    man = ds.map_batches(
        functools.partial(_write_part, out_dir=out_dir, ext="parquet", serialize=serialize),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=1,
    )
    return _collect_manifest(man)


# ---------------------------------------------------------------------------
# Text-format imports (orc-tools csv-import analog)
# ---------------------------------------------------------------------------

_ORC_SCALARS = {
    "boolean": pa.bool_(),
    "tinyint": pa.int8(),
    "smallint": pa.int16(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
}


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside (...) or <...>."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def parse_type_spec(spec: str) -> tuple[dict[str, pa.DataType], dict[str, str]]:
    """Parse a flat ORC schema string — ``struct<a:int,b:char(3),...>`` or
    the bare ``a:int,b:char(3)`` shorthand — into Arrow ``column_types``
    plus the engine's write-side ``char_specs``.

    The grammar is TypeDescription.fromString's flat-struct subset
    (java/core/.../TypeDescription.java; csv-import requires a flat
    schema too: tools/src/java/org/apache/orc/tools/convert/CsvReader).
    ``char(n)``/``varchar(n)`` parse as string columns and come back as
    the EncodeOptions.char_specs entry that the encode path enforces.
    Nested types are rejected — CSV rows are flat by construction.
    """
    s = spec.strip()
    if s.startswith("struct<"):
        if not s.endswith(">"):
            raise ValueError(f"unterminated struct spec: {spec!r}")
        s = s[len("struct<"):-1]
    types: dict[str, pa.DataType] = {}
    char_specs: dict[str, str] = {}
    for field in _split_top_level(s):
        name, _, ty = field.partition(":")
        name, ty = name.strip(), ty.strip().lower()
        if not name or not ty:
            raise ValueError(f"bad field {field!r} in {spec!r}")
        if ty in _ORC_SCALARS:
            types[name] = _ORC_SCALARS[ty]
        elif ty.startswith("decimal(") and ty.endswith(")"):
            p, _, sc = ty[len("decimal("):-1].partition(",")
            types[name] = pa.decimal128(int(p), int(sc or 0))
        elif (ty.startswith("char(") or ty.startswith("varchar(")) and ty.endswith(")"):
            int(ty[ty.index("(") + 1:-1])  # validate n
            types[name] = pa.string()
            char_specs[name] = ty
        elif ty.startswith(("struct<", "array<", "map<", "uniontype<", "list<")):
            raise ValueError(
                f"nested type {ty!r} not supported by the CSV importer "
                "(flat schemas only, same as csv-import)"
            )
        else:
            raise ValueError(f"unknown ORC type {ty!r} in {spec!r}")
    return types, char_specs


def _text_files(paths, exts: tuple[str, ...]) -> list[str]:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            files += sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(exts)
            )
        else:
            files.append(p)
    return files


def read_csv(
    paths,
    *,
    schema: str | None = None,
    delimiter: str = ",",
    columns: list[str] | None = None,
) -> tuple["ray.data.Dataset", dict[str, str]]:
    """Lazy Dataset over CSV file(s)/dir, plus the char_specs implied by
    ``schema`` (an ORC schema string; column types are pushed into the
    Arrow CSV parser so values never round-trip through Python).  The
    csv-import direction of orc-tools convert
    (tools/src/java/org/apache/orc/tools/convert/CsvReader.java).
    """
    from pyarrow import csv as pacsv

    char_specs: dict[str, str] = {}
    # Arrow's CSV writer emits NULL as a bare empty field and the empty
    # STRING as quoted "" — these options make the import honor that
    # distinction, so null strings survive the text round-trip
    null_opts = {"strings_can_be_null": True, "quoted_strings_can_be_null": False}
    if schema is not None:
        types, char_specs = parse_type_spec(schema)
        convert = pacsv.ConvertOptions(
            column_types=types, include_columns=columns or None, **null_opts
        )
    else:
        convert = pacsv.ConvertOptions(
            include_columns=columns or None, **null_opts
        )
    files = _text_files(paths, (".csv", ".csv.gz"))
    ds = ray.data.read_csv(
        files,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        **({"convert_options": convert} if convert is not None else {}),
    )
    return ds, char_specs


def read_jsonl(paths, *, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Lazy Dataset over JSON-lines file(s)/dir through the Arrow JSON
    reader (schema inferred the same way as the ``json-schema`` CLI's
    JsonSchemaFinder analog).  The json-import direction of orc-tools
    convert (tools/src/java/org/apache/orc/tools/convert/JsonReader.java).
    """
    files = _text_files(paths, (".jsonl", ".json", ".ndjson"))
    ds = ray.data.read_json(files, file_extensions=None)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_csv_parts(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    batch_size: int = 65536,
) -> pa.Table:
    """Streaming partitioned CSV sink with the content-addressed
    idempotent-resume contract of :func:`write_orc` — one
    ``part-<sha>.csv`` per block, Arrow's shortest-roundtrip float
    formatting so doubles survive the text round-trip bit-exact (the
    export direction of the csv-import analog)."""
    from pyarrow import csv as pacsv

    def serialize(b: pa.Table) -> bytes:
        sink = pa.BufferOutputStream()
        pacsv.write_csv(b, sink)
        return sink.getvalue().to_pybytes()

    os.makedirs(out_dir, exist_ok=True)
    man = ds.map_batches(
        functools.partial(_write_part, out_dir=out_dir, ext="csv", serialize=serialize),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=1,
    )
    return _collect_manifest(man)


# ---------------------------------------------------------------------------
# Training-shard binary export (.bin indexed shards)
# ---------------------------------------------------------------------------
#
# The last stage of the pre-training data path (tokenize -> dedup -> pack
# -> EXPORT): flat little-endian int32 token payloads a dataloader can
# memory-map directly, the idea of Megatron-LM's indexed .bin/.idx dataset
# files re-expressed as self-contained content-addressed shards.  Each
# shard carries its own index header (sequence ids + lengths) followed by
# the 16-byte-aligned token payload, so a loader computes the payload
# offset once and `np.frombuffer`s the rest; the sha-named parts give the
# same idempotent-resume contract as every other sink in this module.

BIN_MAGIC = b"ORBIN1"
_BIN_ALIGN = 16


def _serialize_bin(batch: pa.Table, *, id_col: str, tokens_col: str) -> bytes:
    import numpy as np
    import struct

    ids = batch.column(id_col).cast(pa.string()).combine_chunks()
    if ids.null_count:
        # ORBIN1 carries no id validity lane: coercing null -> "" would
        # silently change the ids a re-ingested store dedups/joins on.
        raise ValueError(
            f"export-bin: {ids.null_count} null value(s) in id column "
            f"{id_col!r}; fill or drop them before sharding"
        )
    toks = batch.column(tokens_col).combine_chunks()
    if toks.null_count:
        toks = toks.fill_null([])
    toks = toks.cast(pa.list_(pa.int32()))
    n = batch.num_rows
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs).astype(np.uint32)
    vals = toks.values.to_numpy(zero_copy_only=False).astype("<i4")[offs[0] : offs[-1]]
    id_off = ids.buffers()[1]
    io_np = np.frombuffer(id_off, np.int32, n + 1, ids.offset * 4)
    id_lens = np.diff(io_np).astype(np.uint32)
    id_bytes = ids.buffers()[2][io_np[0] : io_np[-1]] if ids.buffers()[2] is not None else b""
    head = [
        BIN_MAGIC,
        struct.pack("<BBQQ", 1, 0, n, int(lens.sum())),  # version, dtype=int32
        lens.astype("<u4").tobytes(),
        id_lens.astype("<u4").tobytes(),
        bytes(id_bytes),
    ]
    pre = sum(len(p) for p in head)
    pad = (-pre) % _BIN_ALIGN
    head.append(b"\x00" * pad)
    head.append(vals.tobytes())
    return b"".join(head)


def read_bin_part(path: str) -> pa.Table:
    """Read one shard back into (seq_id: string, tokens: list<int32>) —
    the verification / re-ingestion direction.  The token payload is a
    single aligned `np.frombuffer` view of the file tail."""
    import numpy as np
    import struct

    with open(path, "rb") as f:
        blob = f.read()
    if blob[: len(BIN_MAGIC)] != BIN_MAGIC:
        raise ValueError(f"{path}: not an ORBIN1 shard")
    ver, dtype_code, n, total = struct.unpack_from("<BBQQ", blob, len(BIN_MAGIC))
    if ver != 1 or dtype_code != 0:
        raise ValueError(f"{path}: unsupported shard version/dtype {ver}/{dtype_code}")
    off = len(BIN_MAGIC) + 18
    lens = np.frombuffer(blob, "<u4", n, off); off += 4 * n
    id_lens = np.frombuffer(blob, "<u4", n, off); off += 4 * n
    ids_end = off + int(id_lens.sum())
    id_bytes = blob[off:ids_end]
    pay = ids_end + ((-ids_end) % _BIN_ALIGN)
    vals = np.frombuffer(blob, "<i4", int(total), pay)
    id_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(id_lens, out=id_offs[1:])
    ids = pa.StringArray.from_buffers(
        int(n), pa.py_buffer(id_offs.tobytes()), pa.py_buffer(id_bytes)
    )
    tok_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=tok_offs[1:])
    toks = pa.ListArray.from_arrays(
        pa.array(tok_offs, pa.int32()), pa.array(vals, pa.int32())
    )
    return pa.table({"seq_id": ids, "tokens": toks})


def write_bin_parts(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    batch_size: int = 65536,
) -> pa.Table:
    """Streaming training-shard sink: one self-indexed ``part-<sha>.bin``
    per block, flat int32 token payload, content-addressed idempotent
    resume — the (doc_id, tokens) stream leaves the engine in the format
    a pre-training dataloader memory-maps."""
    os.makedirs(out_dir, exist_ok=True)
    man = ds.map_batches(
        functools.partial(
            _write_part,
            out_dir=out_dir,
            ext="bin",
            serialize=functools.partial(_serialize_bin, id_col=id_col, tokens_col=tokens_col),
        ),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=1,
    )
    return _collect_manifest(man)


def read_bin(paths) -> "ray.data.Dataset":
    """Training shards -> Dataset of (seq_id, tokens:list<int32>) — the
    re-ingestion direction (import-bin), one task per shard so a large
    shard set streams."""
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".bin")
            )
        else:
            files.append(p)
    if not files:
        raise ValueError(f"no .bin shards under {paths}")

    def load(b: pa.Table) -> pa.Table:
        return pa.concat_tables([read_bin_part(p) for p in b.column("item").to_pylist()])

    return ray.data.from_items(files).map_batches(
        load, batch_format="pyarrow", zero_copy_batch=True
    )
