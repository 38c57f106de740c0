"""Shared helpers: chunk-store cache, decoded-stream and collect utilities.

Split from the monolithic queries.py (r3 verdict item 10); see the
package __init__ for the registry and the original design docstring.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..chunk import DEFAULT_OPTIONS
from ..pipeline.decode import decode_dataset
from ..pipeline.encode import encode_dataset


CACHE_ROOT = os.environ.get("ORC_RAY_CACHE", "/tmp/orc_ray_cache")


def store_for(sf_dir: str, table: str) -> str:
    """Encode `sf_dir/table.parquet` through the engine once; cached+resumable."""
    from ..chunk import FORMAT_VERSION

    src = os.path.join(sf_dir, f"{table}.parquet")
    key = hashlib.md5(f"{os.path.abspath(src)}|v{FORMAT_VERSION}".encode()).hexdigest()[:10]
    out = os.path.join(CACHE_ROOT, f"{table}-{key}")
    expected = pq.read_metadata(src).num_rows
    from ..state.manifest import load_committed

    rec = load_committed(out)
    if rec["files"].get(src) != expected:
        encode_dataset([src], out, DEFAULT_OPTIONS, resume=True, batch_size=16384)
    return out


def _decoded(sf_dir: str, table: str, columns=None, predicates=None):
    return decode_dataset(store_for(sf_dir, table), columns=columns, predicates=predicates)


def _to_table(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(parts).combine_chunks() if parts else pa.table({})
