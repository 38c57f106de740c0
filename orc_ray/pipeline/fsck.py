"""Store integrity audit — the `orc-scan`/file-checker analog
(reference: apache/orc tools/src/FileScan.cc walks every stripe and
reports corrupt files; java/tools FileDump --recover locates bad
sections).  Here the chunk store's invariants are checkable without a
full decode, because chunks are content-addressed and the manifest is
the single source of truth:

1. commit record vs manifest — per-input-file row counts and the totals
   must agree (a torn commit or a lost manifest part double- or
   under-counts rows);
2. manifest vs chunk directory — every manifest row must have its blob
   (missing = data loss) and every blob should have a manifest row
   (orphans = wasted bytes from a crashed run; harmless, vacuumable);
3. deep scan — every blob re-hashed against its content-addressed name
   (bit rot / tamper detection), distributed as a Ray Data map_batches
   over the manifest rows so a 100 TB store audits in parallel with
   zero driver-side I/O.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from ..state import manifest as mstate
from ..state import storage as fstore


def fsck_store(store: str, *, deep: bool = True) -> dict:
    """Audit ``store`` and return a JSON-able report; ``ok`` is True iff
    no issue was found.  ``deep=False`` skips the blob re-hash (metadata
    consistency only — O(manifest) work, no chunk reads)."""
    import ray

    report: dict = {"store": store, "deep": deep}
    issues: list[str] = []

    # --- 1. commit record vs manifest
    man = mstate.read_manifest(store)
    committed = mstate.load_committed(store)
    report["manifest_chunks"] = man.num_rows
    report["manifest_rows"] = int(pa.compute.sum(man.column("n_rows")).as_py() or 0)
    if committed["files"]:
        per_file: dict[str, int] = {}
        for f, n in zip(man.column("input_file").to_pylist(), man.column("n_rows").to_pylist()):
            per_file[f] = per_file.get(f, 0) + int(n)
        missing_files = {f: n for f, n in committed["files"].items() if per_file.get(f) != n}
        extra_files = sorted(set(per_file) - set(committed["files"]))
        if missing_files:
            issues.append(f"row-count mismatch vs commit record: {missing_files}")
        if extra_files:
            issues.append(f"manifest rows for uncommitted inputs: {extra_files}")
        report["committed_rows"] = sum(committed["files"].values())
    else:
        issues.append("no commit record (_committed.json missing or empty)")

    # --- 2. manifest vs chunk directory
    ids = set(man.column("chunk_id").to_pylist())
    blobs = {
        os.path.basename(p)[: -len(".oray")]
        for p in fstore.glob_paths(os.path.join(mstate.chunk_dir(store), "*.oray"))
    }
    missing = sorted(ids - blobs)
    orphans = sorted(blobs - ids)
    report["missing_chunks"] = missing
    report["orphan_chunks"] = len(orphans)
    if missing:
        issues.append(f"{len(missing)} manifest chunk(s) have no blob (data loss)")
    # orphans are not an integrity failure: a crashed run leaves them and
    # vacuum_orphans reclaims them; reported, not flagged

    # --- 3. deep scan: re-hash every blob against its name, distributed
    if deep and ids:
        cdir = mstate.chunk_dir(store)
        present = sorted(ids - set(missing))

        def verify(t: pa.Table) -> pa.Table:
            bad = []
            for cid in t.column("chunk_id").to_pylist():
                blob = fstore.read_bytes(os.path.join(cdir, f"{cid}.oray"))
                if hashlib.sha256(blob).hexdigest()[: len(cid)] != cid:
                    bad.append(cid)
            return pa.table({"bad": pa.array(bad, pa.string())})

        ds = ray.data.from_arrow(pa.table({"chunk_id": pa.array(present, pa.string())}))
        corrupt = [
            c
            for b in ds.map_batches(verify, batch_format="pyarrow", batch_size=64).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            for c in b.column("bad").to_pylist()
        ]
        report["verified_chunks"] = len(present) - len(corrupt)
        report["corrupt_chunks"] = sorted(corrupt)
        if corrupt:
            issues.append(f"{len(corrupt)} chunk(s) fail their content hash (bit rot/tamper)")

    report["issues"] = issues
    report["ok"] = not issues
    return report
