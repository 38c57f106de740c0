"""Lineage manifest — resumable, partition-committed encoded output.

The reference's durability invariant is "the footer commits the file": an
ORC file is unreadable until close() writes Footer+PostScript last
(apache/orc c++/src/Writer.cc:writeStripe/close; SURVEY.md §4).  The engine
reproduces that invariant at partition granularity, as the north star
mandates:

- every encode task appends one *lineage record* per chunk it writes
  (chunk id = content hash of the encoded payload, input fragment, per-
  column codec choices, rows, raw/encoded bytes, wall time) — written as
  parquet by the same distributed pipeline that writes the chunks, so
  there is no driver-side bottleneck;
- an input file is *committed* only when the sum of its recorded chunk
  rows equals the parquet metadata row count — the driver then lists it in
  `_committed.json` (the footer analog);
- resume = read `_committed.json`, skip committed inputs, delete orphan
  chunks/records of uncommitted inputs, re-encode only those.

Layout under an output directory:

    chunks/<chunk_id>.oray        encoded chunk blobs (content-addressed)
    manifest/*.parquet            lineage records (distributed write)
    _committed.json               committed input files + totals (driver)

The output directory may be a plain local path or any fsspec URL
(``file://``, ``s3://``, ...) — every I/O call here routes through
state/storage.py (the Hadoop-FileSystem-abstraction analog).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from . import storage as st

MANIFEST_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("input_file", pa.string()),
        ("n_rows", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("codecs", pa.string()),      # json: column -> codec tag
        ("stats", pa.string()),       # json: column -> {min,max} (prunable cols)
        ("wall_ms", pa.float64()),
    ]
)


def chunk_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "chunks")


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def committed_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_committed.json")


def load_committed(out_dir: str) -> dict:
    p = committed_path(out_dir)
    if not st.exists(p):
        return {"files": {}, "totals": {}}
    return st.read_json(p)


def read_manifest(out_dir: str) -> pa.Table:
    files = st.glob_paths(os.path.join(manifest_dir(out_dir), "*.parquet"))
    if not files:
        return MANIFEST_SCHEMA.empty_table()
    return pa.concat_tables([st.read_parquet(f) for f in files])


def commit(out_dir: str, expected_rows: dict[str, int] | None) -> dict:
    """Verify per-input-file chunk row counts against parquet metadata and
    write `_committed.json`.  Returns the commit record.

    ``expected_rows=None`` is trust-mode for formats without row-count
    metadata (CSV/JSONL): a successfully completed pipeline commits every
    file seen in the manifest at its recorded row count.
    """
    man = read_manifest(out_dir)
    got: dict[str, int] = {}
    if man.num_rows:
        import pyarrow.compute as pc

        grouped = man.group_by("input_file").aggregate([("n_rows", "sum")])
        for f, r in zip(
            grouped.column("input_file").to_pylist(), grouped.column("n_rows_sum").to_pylist()
        ):
            got[f] = int(r)
    prev = load_committed(out_dir)["files"]
    files = dict(prev)
    if expected_rows is None:
        files.update(got)
    else:
        for f, exp in expected_rows.items():
            if got.get(f, -1) == exp:
                files[f] = exp
    totals = {
        "committed_files": len(files),
        "rows": int(sum(files.values())),
        "enc_bytes": int(pa.compute.sum(man.column("enc_bytes")).as_py() or 0) if man.num_rows else 0,
        "raw_bytes": int(pa.compute.sum(man.column("raw_bytes")).as_py() or 0) if man.num_rows else 0,
    }
    rec = {"files": files, "totals": totals}
    st.write_json_atomic(committed_path(out_dir), rec)
    return rec


def merge_stores(out_dir: str, inputs: list[str]) -> dict:
    """Merge committed chunk stores into one (the orc-tools `merge` analog).

    Chunks are content-addressed, so merging is metadata work: chunk files
    hard-link (copy on cross-device) into the target and identical chunks
    across stores collapse to one; manifests concatenate with duplicate
    chunk ids dropped.  Inputs must not contain DIFFERENT encodings of the
    same input file (that would double-count its rows).
    """
    st.makedirs(chunk_dir(out_dir))
    st.makedirs(manifest_dir(out_dir))
    foreign = [
        f
        for f in st.glob_paths(os.path.join(manifest_dir(out_dir), "*.parquet"))
        if os.path.basename(f) != "merged.parquet"
    ]
    if foreign:
        # commit() sums EVERY manifest part — parts from a previous encode
        # into this directory would silently double-count rows
        raise FileExistsError(f"target {out_dir} already holds a store (parts: {foreign[:3]})")
    tables = []
    for src in inputs:
        man = read_manifest(src)
        tables.append(man)
        for cid in man.column("chunk_id").to_pylist():
            s = os.path.join(chunk_dir(src), f"{cid}.oray")
            d = os.path.join(chunk_dir(out_dir), f"{cid}.oray")
            if not st.exists(d):
                st.link_or_copy(s, d)
    merged = pa.concat_tables(tables)
    if merged.num_rows:
        # dedup on (chunk_id, input_file), NOT chunk_id alone: identical
        # chunk CONTENT can legitimately back different input files (two
        # equal inputs share one content-addressed blob but need one
        # manifest row each, or decode would drop a file's rows)
        seen: set = set()
        keep = []
        for cid, f in zip(
            merged.column("chunk_id").to_pylist(), merged.column("input_file").to_pylist()
        ):
            keep.append((cid, f) not in seen)
            seen.add((cid, f))
        merged = merged.filter(pa.array(keep))
    st.write_parquet(merged, os.path.join(manifest_dir(out_dir), "merged.parquet"))
    return commit(out_dir, None)


def vacuum_orphans(out_dir: str) -> int:
    """Remove chunk files not referenced by any manifest part.  Chunks are
    content-addressed, so an orphan (e.g. left behind when a stale unit
    part is dropped on a plan change) is unreachable — decode lists chunks
    through the manifest — but wastes disk.  Returns chunks removed."""
    man = read_manifest(out_dir)
    referenced = set(man.column("chunk_id").to_pylist()) if man.num_rows else set()
    removed = 0
    for p in st.glob_paths(os.path.join(chunk_dir(out_dir), "*.oray")):
        cid = os.path.basename(p)[: -len(".oray")]
        if cid not in referenced:
            st.remove(p)
            removed += 1
    return removed


def clean_uncommitted(out_dir: str) -> int:
    """Delete chunks + lineage records belonging to uncommitted input files.
    Returns number of chunks removed.  Called on resume before re-encoding."""
    committed = set(load_committed(out_dir)["files"])
    man = read_manifest(out_dir)
    removed = 0
    if man.num_rows:
        keep_mask = [f in committed for f in man.column("input_file").to_pylist()]
        drop_ids = [
            cid
            for cid, k in zip(man.column("chunk_id").to_pylist(), keep_mask)
            if not k
        ]
        for cid in drop_ids:
            p = os.path.join(chunk_dir(out_dir), f"{cid}.oray")
            if st.exists(p):
                st.remove(p)
                removed += 1
        if drop_ids:
            kept = man.filter(pa.array(keep_mask))
            for f in st.glob_paths(os.path.join(manifest_dir(out_dir), "*.parquet")):
                st.remove(f)
            if kept.num_rows:
                st.write_parquet(kept, os.path.join(manifest_dir(out_dir), "resume-kept.parquet"))
    return removed
