"""Versioned keyed tables — the Hive-ACID-on-ORC analog.

The reference format is the storage layer of Hive ACID transactional
tables: a base file plus ordered delta directories of insert/update/
delete events, merged on read and folded together by compaction
(hive/ql/io/orc/OrcRecordUpdater.java, AcidUtils.java; ORC spec "ACID
support").  This module reproduces that model on chunk stores:

    table_dir/
      _table.json        version pointer + full version history (atomic
                         replace — the "commit file", readable mid-write)
      base-<n>/          a chunk store (immutable, content-addressed)
      delta-<n>/         chunk stores with an ``_op`` column:
                         'u' = upsert (insert or replace by key),
                         'd' = delete by key

Semantics:
- deltas apply in sequence order, LAST WRITER WINS per key (a later
  delta's 'u' overrides an earlier one's; a later 'd' deletes a key an
  earlier delta upserted, and a later 'u' resurrects a deleted key);
- ``read_table(dir)`` is merge-on-read: the base store streams through
  ONE bloom-fronted key-suppression pass (the upsert_read shape — the
  base never shuffles, never materializes) and the folded delta rows
  union in;
- ``compact_table(dir)`` folds base+deltas into a new base store and
  bumps the version — old versions stay readable (time travel:
  ``read_table(dir, version=v)``) until ``vacuum_table`` drops them.

Scale contract: deltas are SMALL relative to the base (the lakehouse
CDC assumption) — folding concatenates the delta stores' rows once and
broadcasts the folded key set.  Past ~10^7 folded keys, compact first
(upsert_read's partitioned arm is the same documented upgrade).  All
paths may be fsspec URLs (state/storage.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import storage as st

_OP_COL = "_op"


def _meta_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_table.json")


def load_meta(table_dir: str) -> dict:
    return st.read_json(_meta_path(table_dir))


def _write_meta(table_dir: str, meta: dict) -> None:
    st.write_json_atomic(_meta_path(table_dir), meta)


def create_table(table_dir: str, input_paths, key: str, opts=None, **encode_kw) -> dict:
    """Encode the base store and write version 0."""
    from ..chunk import DEFAULT_OPTIONS
    from ..pipeline.encode import encode_dataset

    st.makedirs(table_dir)
    base = os.path.join(table_dir, "base-0")
    encode_dataset(input_paths, base, opts or DEFAULT_OPTIONS, **encode_kw)
    meta = {
        "key": key,
        "version": 0,
        "versions": [{"version": 0, "base": "base-0", "deltas": []}],
        "next_seq": 1,
    }
    _write_meta(table_dir, meta)
    return meta


def append_delta(table_dir: str, delta: pa.Table, opts=None) -> dict:
    """Commit one delta (rows + ``_op`` column of 'u'/'d') as version n+1.

    'd' rows only need the key column populated; other columns may be
    null.  Validates: _op domain, non-null keys, one op per key."""
    from ..chunk import DEFAULT_OPTIONS
    from ..pipeline.encode import encode_dataset

    import ray

    meta = load_meta(table_dir)
    key = meta["key"]
    if _OP_COL not in delta.column_names:
        raise ValueError(f"delta needs an {_OP_COL!r} column of 'u'/'d'")
    ops = delta.column(_OP_COL).combine_chunks()
    bad = pc.invert(pc.is_in(ops, value_set=pa.array(["u", "d"])))
    if pc.any(bad).as_py() or ops.null_count:
        raise ValueError(f"{_OP_COL} values must be 'u' or 'd'")
    keys = delta.column(key).combine_chunks()
    if keys.null_count:
        raise ValueError("delta contains null keys")
    if pc.count_distinct(keys).as_py() != len(keys):
        raise ValueError("delta has more than one op for a key — fold writes per commit")

    seq = meta["next_seq"]
    name = f"delta-{seq}"
    encode_dataset([], os.path.join(table_dir, name), opts or DEFAULT_OPTIONS,
                   ds=ray.data.from_arrow(delta), batch_size=65536)
    cur = meta["versions"][-1]
    meta["versions"].append(
        {"version": seq, "base": cur["base"], "deltas": cur["deltas"] + [name]}
    )
    meta["version"] = seq
    meta["next_seq"] = seq + 1
    _write_meta(table_dir, meta)
    return meta


def _fold_deltas(table_dir: str, delta_names: list[str], key: str) -> pa.Table | None:
    """One row per key: the LAST (highest-sequence) op — vectorized
    lexsort + boundary take over the concatenated delta rows."""
    from ..pipeline.decode import decode_dataset

    if not delta_names:
        return None
    parts = []
    for name in delta_names:
        seq = int(name.rsplit("-", 1)[1])
        batches = [
            b
            for b in decode_dataset(os.path.join(table_dir, name)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if b.num_rows
        ]
        if not batches:  # a delta may be EMPTY after erase_key hard-erasure
            continue
        t = pa.concat_tables(batches)
        parts.append(t.append_column("_seq", pa.array(np.full(t.num_rows, seq, np.int64))))
    if not parts:
        return None
    allrows = pa.concat_tables(parts).combine_chunks()
    k = allrows.column(key).to_numpy(zero_copy_only=False)
    s = allrows.column("_seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((s, k))  # by key, then seq ascending
    ks = k[order]
    last = np.nonzero(np.r_[ks[1:] != ks[:-1], True])[0]  # last index per key
    return allrows.take(pa.array(order[last])).drop_columns(["_seq"])


def read_table(
    table_dir: str,
    *,
    version: int | None = None,
    columns: list[str] | None = None,
    keys: dict | None = None,
):
    """Merge-on-read Dataset at the given (default: latest) version.

    The base store streams through one broadcast key-suppression pass
    (every folded-delta key, 'u' or 'd', suppresses its base row), then
    the folded 'u' rows union in — deletes are simply keys with no
    replacement row."""
    import functools

    import ray

    from ..codecs import bloom
    from ..pipeline.decode import decode_dataset

    meta = load_meta(table_dir)
    specs = {v["version"]: v for v in meta["versions"]}
    if version is None:
        version = meta["version"]
    if version not in specs:
        raise KeyError(f"version {version} not in table history {sorted(specs)}")
    spec = specs[version]
    key = meta["key"]
    if columns is not None and key not in columns:
        raise ValueError(f"projection must include the table key {key!r} "
                         "(merge-on-read reconciles by key)")

    folded = _fold_deltas(table_dir, spec["deltas"], key)
    base = decode_dataset(
        os.path.join(table_dir, spec["base"]), columns=columns, keys=keys
    )
    if folded is None or folded.num_rows == 0:
        return base

    kcol = folded.column(key).combine_chunks()
    filt = bloom.build(kcol, fpp=0.01)
    ref = ray.put((filt, kcol))

    def suppress(t: pa.Table, *, ref) -> pa.Table:
        f, ks = ray.get(ref)
        col = t.column(key)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        maybe = bloom.might_contain_many(f, col)
        if not maybe.any():
            return t
        return t.filter(pc.invert(pc.is_in(col, value_set=ks)))

    survivors = base.map_batches(
        functools.partial(suppress, ref=ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ups = folded.filter(pc.equal(folded.column(_OP_COL), "u")).drop_columns([_OP_COL])
    if columns is not None:
        ups = ups.select(columns)
    if ups.num_rows == 0:
        return survivors
    return survivors.union(ray.data.from_arrow(ups))


def compact_table(table_dir: str, opts=None) -> dict:
    """Fold the current version into a fresh base store (Hive major
    compaction analog) and commit it as the next version — prior
    versions stay readable until vacuum."""
    from ..chunk import DEFAULT_OPTIONS
    from ..pipeline.encode import encode_dataset

    meta = load_meta(table_dir)
    seq = meta["next_seq"]
    name = f"base-{seq}"
    encode_dataset([], os.path.join(table_dir, name), opts or DEFAULT_OPTIONS,
                   ds=read_table(table_dir), batch_size=65536)
    meta["versions"].append({"version": seq, "base": name, "deltas": []})
    meta["version"] = seq
    meta["next_seq"] = seq + 1
    _write_meta(table_dir, meta)
    return meta


def vacuum_table(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Drop stores referenced only by versions older than the newest
    ``keep_versions`` (time-travel horizon).  Returns removed store names."""
    meta = load_meta(table_dir)
    kept = meta["versions"][-keep_versions:]
    live: set = set()
    for v in kept:
        live.add(v["base"])
        live.update(v["deltas"])
    dead: set = set()
    for v in meta["versions"][:-keep_versions] if keep_versions else meta["versions"]:
        dead.add(v["base"])
        dead.update(v["deltas"])
    dead -= live
    for name in sorted(dead):
        for p in st.glob_paths(os.path.join(table_dir, name, "**")):
            try:
                st.remove(p)
            except (IsADirectoryError, OSError):
                pass
        # local fast path: remove the tree properly
        d = os.path.join(table_dir, name)
        if not st.is_url(d) and os.path.isdir(d):
            import shutil

            shutil.rmtree(d, ignore_errors=True)
    meta["versions"] = kept
    _write_meta(table_dir, meta)
    return sorted(dead)


def erase_key(table_dir: str, key_value) -> dict:
    """GDPR-style HARD erasure: physically remove every row of ``key``
    == ``key_value`` from EVERY store of EVERY version — base stores,
    delta stores, all time-travel history.  The logical 'd' delta only
    hides a key at the newest version; erase_key is what a
    right-to-be-forgotten request actually requires, because old
    versions stay readable until vacuum.

    Each distinct store under the table is rewritten once through
    pipeline.encode.purge_store (streamed, wipe-first into a sibling
    temp dir) and swapped in under its ORIGINAL name, so the version
    history in _table.json keeps working unchanged.  Encrypted-column
    tables are refused by purge_store's keyless-re-encode guard.

    Returns {"stores_rewritten": n, "rows_erased": m}."""
    from ..pipeline.decode import count_rows
    from ..pipeline.encode import purge_store

    meta = load_meta(table_dir)
    key = meta["key"]
    names: set = set()
    for v in meta["versions"]:
        names.add(v["base"])
        names.update(v["deltas"])
    rewritten, erased = 0, 0
    for name in sorted(names):
        store = os.path.join(table_dir, name)
        before = count_rows(store, trust_stats=True)
        tmp = os.path.join(table_dir, f"_erase-{name}")
        purge_store(store, tmp, [(key, "==", key_value)])
        after = count_rows(tmp, trust_stats=True)
        if after == before:  # key absent from this store: keep original bytes
            st.rmtree(tmp)
            continue
        st.rmtree(store)
        if st.is_url(store):
            # object-store swap: per-file move (puts are atomic per key)
            for p in st.glob_paths(os.path.join(tmp, "**")):
                rel = p[len(str(tmp)):].lstrip("/")
                try:
                    st.replace(p, os.path.join(store, rel))
                except (IsADirectoryError, OSError):
                    pass  # directory placeholders
            st.rmtree(tmp)
        else:
            os.rename(tmp, store)
        rewritten += 1
        erased += before - after
    return {"stores_rewritten": rewritten, "rows_erased": erased}


def fsck_table(table_dir: str, *, deep: bool = True) -> dict:
    """Integrity audit across the WHOLE version history (the table-level
    companion of pipeline.fsck.fsck_store): every base/delta store any
    retained version references must exist and pass its own store audit
    (commit/manifest/chunk consistency + the distributed content-hash
    scan when ``deep``); store directories no version references are
    reported as orphans (vacuum reclaims them, they are not a failure).
    ``ok`` is True iff the meta is readable and every referenced store is
    green — i.e. time travel to ANY retained version is safe."""
    from ..pipeline.fsck import fsck_store

    meta = load_meta(table_dir)
    referenced: list[str] = []
    for v in meta["versions"]:
        for name in [v["base"], *v["deltas"]]:
            if name not in referenced:
                referenced.append(name)

    issues: list[str] = []
    stores: dict[str, dict] = {}
    for name in referenced:
        p = os.path.join(table_dir, name)
        if not st.exists(os.path.join(p, "_committed.json")):
            issues.append(f"referenced store {name!r} missing or uncommitted")
            stores[name] = {"ok": False, "issues": ["missing or uncommitted"]}
            continue
        r = fsck_store(p, deep=deep)
        stores[name] = {
            "ok": r["ok"],
            "issues": r["issues"],
            "manifest_rows": r["manifest_rows"],
            "corrupt_chunks": r.get("corrupt_chunks", []),
            "missing_chunks": r["missing_chunks"],
        }
        if not r["ok"]:
            issues.append(f"store {name}: {'; '.join(r['issues'])}")

    orphans = sorted(
        {
            os.path.basename(os.path.dirname(p))
            for p in st.glob_paths(os.path.join(table_dir, "*", "_committed.json"))
        }
        - set(referenced)
    )
    return {
        "table": table_dir,
        "version": meta["version"],
        "stores": stores,
        "orphan_stores": orphans,
        "issues": issues,
        "ok": not issues,
    }
