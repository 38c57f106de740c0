"""Deduplication queries: exact, minhash, n-gram Jaccard, simhash, embedding.

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
from ._shared import CACHE_ROOT, _decoded, _to_table, store_for


def q_dedup_exact(sf_dir: str):
    """Exact dedup on document text, keyed on content fingerprints so the
    shuffle moves (fp, fp2, doc_id) — not the text, and the surviving docs
    are fetched with a hash-partitioned semi-join (no broadcast winner
    set).  The collect+sort here is the driver-contract presentation of
    the result; at scale the returned Dataset streams to write_parquet."""
    from ..functions.dedup import dedup_exact_fingerprint

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_exact_fingerprint(ds, id_col="doc_id", text_col="text")
    return _to_table(out).select(["text", "doc_id"]).sort_by("doc_id")


def q_dedup_minhash(sf_dir: str):
    """Near-dup clusters over documents (MinHash+LSH; approximate — no SQL
    oracle, driver records rows-only)."""
    from ..functions.dedup import dedup_minhash

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_minhash(ds, id_col="doc_id", text_col="text")


def q_dedup_ngram(sf_dir: str):
    """Exact byte-8-gram Jaccard near-dup pairs at threshold 0.5 over
    rare-shingle sets (stop-shingles with document frequency > 16 are
    excluded on BOTH sides — the df cap that bounds the inverted index's
    pair emission); the threshold test is pure integer arithmetic
    (2*inter >= union), so the SQL self-join oracle matches
    bit-exactly (functions/dedup.dedup_ngram_jaccard).  The oracle's char
    substrings equal the engine's byte windows because this corpus is
    ASCII; on non-ASCII data the SQL mirror would need byte semantics."""
    from ..functions.dedup import dedup_ngram_jaccard

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_ngram_jaccard(ds, id_col="doc_id", text_col="text")


def q_simhash(sf_dir: str):
    from ..functions.dedup import _varbytes, simhash64

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        concat, offsets = _varbytes(t.column("text"))
        h = simhash64(concat, offsets)
        return pa.table({"doc_id": t.column("doc_id"), "simhash": pa.array(h.view(np.int64))})

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (exact, threshold 0.4):
    IVF-sorted blocks + one task per surviving block pair with exact
    spherical-cap pruning — no corpus broadcast, no driver-side matrix
    (functions/similarity.py cosine_pairs)."""
    from ..functions.similarity import cosine_pairs

    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs(ds, threshold=0.4)
