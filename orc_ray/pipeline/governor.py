"""Writer memory governor — the MemoryManagerImpl analog.

The reference scales every writer's effective stripe size so that
concurrent writers stay inside a shared pool (apache/orc java
impl/MemoryManagerImpl.java ≈200 LoC, checked every ROWS_BETWEEN_CHECKS
rows; C++ estimates per add in Writer.cc ≈460-500).  The engine's
equivalent levers are ``batch_size`` (rows a single encode call holds)
and Ray's streaming backpressure; this module closes the loop by
CHOOSING batch_size from measured data instead of a fixed default:

    batch_rows = node_budget / (concurrency x scratch_factor x row_bytes)

- ``row_bytes`` comes from parquet metadata (uncompressed column sizes /
  rows — no data read), so wide rows (long token lists, big binaries)
  get small batches and narrow tables get large ones;
- ``concurrency`` is how many encode tasks share the node;
- ``scratch_factor`` covers codec temporaries (measured: the int codec's
  superblock scratch + pack output + framing stay under ~4x input; 6 is
  the safety default);
- the result is clamped to [512, 1 Mi] rows.

Pass ``batch_size=None`` to ``encode_dataset`` to engage the governor.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

MIN_ROWS = 512
MAX_ROWS = 1 << 20
DEFAULT_SCRATCH_FACTOR = 6
_SAMPLE_FILES = 8


def avg_row_bytes(files: list[str], columns=None) -> float:
    """Mean uncompressed bytes per row over (a sample of) the inputs,
    from parquet footer metadata only — no data pages are read.

    Raises KeyError when ``columns`` matches no top-level parquet column
    (a typo'd projection must not silently size batches as ~1 byte/row);
    returns 0.0 when the sampled files hold no rows."""
    tot_b = tot_r = 0
    seen_roots: set = set()
    for f in files[:_SAMPLE_FILES]:
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                root = col.path_in_schema.split(".")[0]
                seen_roots.add(root)
                if columns is None or root in columns:
                    tot_b += col.total_uncompressed_size
            tot_r += g.num_rows
    if columns is not None and (set(columns) - seen_roots):
        # full coverage required: a typo'd column alongside valid ones
        # would contribute 0 bytes and silently oversize batches
        raise KeyError(
            f"governor columns {sorted(set(columns) - seen_roots)} match no "
            f"top-level parquet column (have {sorted(seen_roots)})"
        )
    return tot_b / tot_r if tot_r else 0.0


def node_memory_budget() -> int:
    """Heap budget for encode scratch on this node: 25% of physical RAM
    (the object store and OS page cache own the rest)."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page = os.sysconf("SC_PAGE_SIZE")
        return int(0.25 * pages * page)
    except (ValueError, OSError):
        return 8 << 30


def plan_batch_size(
    files: list[str],
    columns=None,
    *,
    budget_bytes: int | None = None,
    concurrency: int | None = None,
    scratch_factor: int = DEFAULT_SCRATCH_FACTOR,
) -> int:
    """Rows per encode batch so that ``concurrency`` concurrent encoders'
    working sets fit the node budget (see module docstring)."""
    if concurrency is None:
        try:
            import ray

            concurrency = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
        except Exception:  # noqa: BLE001 — sizing heuristic, never fatal
            concurrency = os.cpu_count() or 8
    if budget_bytes is None:
        budget_bytes = node_memory_budget()
    rb = avg_row_bytes(files, columns)
    if rb <= 0:  # empty sample: no information — conservative default
        return 16384
    rows = int(budget_bytes / (concurrency * scratch_factor * rb))
    return max(MIN_ROWS, min(rows, MAX_ROWS))
