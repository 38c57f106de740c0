"""Deterministic synthetic fixtures (FIXTURES.md) — no external data.

F1 is the exact north-star input shape from BASELINE.json `input_hint`:
(doc_id: string, tokens: list<int32>, n_tok: int32, source: string),
tokens = Zipf(1.3) mod 50257, lengths lognormal(5.0, 0.8) clipped [8, 2048],
seed 42 — the corpus BASELINE.md's reference numbers were measured on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SOURCES = ["cc", "wiki", "books", "code", "arxiv", "github", "news", "forums"]
VOCAB = 50257


def f1_corpus(n_rows: int = 100_000, seed: int = 42, row_offset: int = 0) -> pa.Table:
    """The flagship corpus; `row_offset` lets shards be generated independently
    with globally-unique doc_ids (same seed => same rows for same offset)."""
    rng = np.random.default_rng([seed, row_offset])
    lengths = np.clip(
        np.rint(rng.lognormal(5.0, 0.8, n_rows)).astype(np.int64), 8, 2048
    )
    total = int(lengths.sum())
    values = (rng.zipf(1.3, total) % VOCAB).astype(np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
    ).cast(pa.list_(pa.int32()))
    ids = [f"doc-{i + row_offset:016d}" for i in range(n_rows)]
    source = pa.array([SOURCES[(i + row_offset) % len(SOURCES)] for i in range(n_rows)])
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
            "source": source,
        }
    )


def write_f1_parquet(path: str, n_rows: int, seed: int = 42, n_files: int = 1) -> list[str]:
    """Write the F1 corpus as `n_files` parquet shards under `path`."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    per = n_rows // n_files
    paths = []
    for i in range(n_files):
        rows = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        t = f1_corpus(rows, seed=seed, row_offset=i * per)
        p = os.path.join(path, f"part-{i:05d}.parquet")
        # bounded row groups => encode work units are row-group aligned and
        # each task's read buffer stays small (see pipeline/encode._plan_units)
        pq.write_table(t, p, row_group_size=16384)
        paths.append(p)
    return paths
