"""Round-trip and pushdown queries (engine identity vs SQL identity).

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


def q_roundtrip_documents(sf_dir: str):
    return _decoded(sf_dir, "documents")


def q_roundtrip_lineitem(sf_dir: str):
    return _decoded(sf_dir, "lineitem")


def q_roundtrip_events(sf_dir: str):
    return _decoded(sf_dir, "events")


def q_roundtrip_embeddings(sf_dir: str):
    return _decoded(sf_dir, "embeddings")


def q_projection_pushdown(sf_dir: str):
    return _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])


def q_predicate_pushdown(sf_dir: str):
    return _decoded(sf_dir, "lineitem", predicates=[("l_orderkey", "<", 100)])
