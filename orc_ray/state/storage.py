"""Filesystem dispatch — chunk stores on any fsspec-addressable storage.

The reference reads/writes through Hadoop's FileSystem abstraction (ORC
files live on HDFS/S3/local transparently; java/core/.../impl/
ReaderImpl.java takes a Path + FileSystem).  The engine's analog: every
store-side I/O call routes through this module.  A plain local path uses
the direct ``os``/``glob``/``open`` fast path (zero overhead, unchanged
behavior); a URL with a scheme (``s3://``, ``gs://``, ``file://``,
``memory://``) routes through fsspec.

Atomicity note: local stores keep true atomic rename (``os.replace``).
Object stores have no rename — ``replace`` falls back to ``fs.mv`` (copy
+ delete on S3-likes).  The store's durability contract tolerates this:
chunk files are content-addressed (a torn write is detected by the
checksum verify and simply re-encoded on resume) and the commit record
is the last, single, small file written.

Evidence in this sandbox (no object store available): the full
encode -> resume -> decode pipeline runs against ``file://`` URLs —
proving no code path assumes raw os paths — and the layer's semantics
are unit-tested against fsspec's ``memory://`` filesystem
(tests/test_storage.py).  ``memory://`` is per-process, so it cannot
host a multi-worker store; shared-namespace schemes (s3/gs/hdfs) behave
like ``file://`` here.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil


def is_url(path: str) -> bool:
    return "://" in path


def _fs(path: str):
    """(fsspec filesystem, inner path) for a URL."""
    import fsspec

    return fsspec.core.url_to_fs(path)


def open_file(path: str, mode: str = "rb"):
    if not is_url(path):
        return open(path, mode)
    fs, p = _fs(path)
    return fs.open(p, mode)


def exists(path: str) -> bool:
    if not is_url(path):
        return os.path.exists(path)
    fs, p = _fs(path)
    return fs.exists(p)


def makedirs(path: str) -> None:
    if not is_url(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, p = _fs(path)
    fs.makedirs(p, exist_ok=True)


def remove(path: str) -> None:
    if not is_url(path):
        os.remove(path)
        return
    fs, p = _fs(path)
    fs.rm_file(p)


def replace(tmp: str, dest: str) -> None:
    """Atomic rename locally; copy-then-delete via fsspec.

    Order matters on object stores: the destination is OVERWRITTEN by the
    copy (puts are atomic per key), never deleted first — a crash between
    steps leaves either the old file or the new file at ``dest``, so a
    previously committed ``_committed.json`` can never revert a store to
    uncommitted (last-file-wins commit contract).  A crash after the copy
    only leaks the ``.tmp`` source, which the next writer overwrites."""
    if not is_url(tmp):
        os.replace(tmp, dest)
        return
    fs, t = _fs(tmp)
    _, d = _fs(dest)
    fs.copy(t, d)
    fs.rm_file(t)


def canonical(path: str) -> tuple[str, str]:
    """(store kind, normalized inner path) — the identity of a store
    location, for overlap/containment checks across path/URL aliases.

    ``file:///x`` and ``/x`` are the SAME store: both canonicalize to
    ("local", realpath).  Other schemes normalize the inner path via the
    filesystem's own strip (collapsing ``s3://b//k`` style aliases)."""
    if not is_url(path):
        return ("local", os.path.realpath(str(path)))
    from fsspec.implementations.local import LocalFileSystem

    fs, p = _fs(path)
    proto = fs.protocol if isinstance(fs.protocol, str) else fs.protocol[0]
    if isinstance(fs, LocalFileSystem):
        return ("local", os.path.realpath(p))
    import posixpath

    return (proto, posixpath.normpath("/" + p.strip("/")))


def rmtree(path: str) -> None:
    """Recursive delete, missing-ok — works for plain paths and URLs."""
    if not is_url(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, p = _fs(path)
    try:
        if fs.exists(p):
            fs.rm(p, recursive=True)
    except FileNotFoundError:
        pass


def glob_paths(pattern: str) -> list[str]:
    """Sorted matches; URL patterns return full URLs (protocol restored)."""
    if not is_url(pattern):
        return sorted(_glob.glob(pattern))
    fs, p = _fs(pattern)
    return sorted(fs.unstrip_protocol(m) for m in fs.glob(p))


def read_bytes(path: str) -> bytes:
    with open_file(path, "rb") as f:
        return f.read()


def write_bytes_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open_file(tmp, "wb") as f:
        f.write(data)
    replace(tmp, path)


def read_json(path: str):
    import json

    with open_file(path, "r" if not is_url(path) else "rt") as f:
        return json.load(f)


def write_json_atomic(path: str, obj) -> None:
    import json

    write_bytes_atomic(path, json.dumps(obj, indent=1).encode())


def read_parquet(path: str, **kw):
    import pyarrow.parquet as pq

    if not is_url(path):
        return pq.read_table(path, **kw)
    with open_file(path, "rb") as f:
        return pq.read_table(f, **kw)


def write_parquet(table, path: str) -> None:
    import pyarrow.parquet as pq

    if not is_url(path):
        pq.write_table(table, path)
        return
    with open_file(path, "wb") as f:
        pq.write_table(table, f)


def write_parquet_atomic(table, path: str) -> None:
    tmp = path + ".tmp"
    write_parquet(table, tmp)
    replace(tmp, path)


def link_or_copy(src: str, dst: str) -> None:
    """Hard-link locally (content-addressed merge is metadata work), byte
    copy across filesystems/URLs."""
    if not is_url(src) and not is_url(dst):
        try:
            os.link(src, dst)
            return
        except OSError:
            shutil.copy2(src, dst)
            return
    with open_file(src, "rb") as s, open_file(dst, "wb") as d:
        d.write(s.read())


def ray_write_parquet(ds, dir_path: str) -> None:
    """Dataset.write_parquet into a directory path or URL (fsspec URLs go
    through a PyFileSystem wrapper so every scheme Ray itself doesn't
    know still works)."""
    if not is_url(dir_path):
        ds.write_parquet(dir_path)
        return
    from pyarrow.fs import FSSpecHandler, PyFileSystem

    fs, p = _fs(dir_path)
    ds.write_parquet(p, filesystem=PyFileSystem(FSSpecHandler(fs)))
