"""Hostile north-star corpus end-to-end: the exact input shape the engine
is built for — (doc_id:string, tokens:list<int32>, n_tok:int32,
source:string) — with every null/degenerate pattern real pre-tokenized
training data exhibits, pushed through the FULL Ray pipeline (not just the
chunk codec): null doc_ids, empty-string doc_ids, null token LISTS, null
elements INSIDE token lists, empty token lists, int32-endpoint tokens,
null n_tok, null/empty sources, and a long-document skew tail.

The nested fuzz (tests/test_nested_fuzz.py) nulls list CHILDREN but never
the list slot itself, and the clean F1 fixture is fully non-null — this
pins the one table shape the north rule grades on.  Also pins the resume
contract on hostile data: re-encoding the same corpus yields byte-identical
chunk files (deterministic codec selection must not depend on null layout
accidents).

A `rid` sidecar column keys the comparisons: a chunk store is a bag of
content-addressed chunks, so decode order is lineage order, not source
order — equality is checked after a rid sort (the driver gate's sorted
value-hash does the same)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import DEFAULT_OPTIONS
from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.encode import encode_dataset

N_ROWS = 6000
N_FILES = 4


def _hostile_f1(n: int) -> pa.Table:
    rng = np.random.default_rng(20260819)
    # token lengths: mostly short, a heavy tail (skewed long docs)
    lens = rng.geometric(0.02, n).astype(np.int64)
    lens[rng.random(n) < 0.05] = 0  # empty docs
    tail = rng.random(n) < 0.01
    lens[tail] = rng.integers(3000, 8000, int(tail.sum()))
    total = int(lens.sum())
    vals = rng.integers(0, 50257, total, dtype=np.int32)
    # int32 endpoints sprinkled in
    ends = rng.integers(0, total, 50)
    vals[ends[:25]] = np.int32(2**31 - 1)
    vals[ends[25:]] = np.int32(-(2**31))
    # null elements inside ~2% of positions
    elem_mask = rng.random(total) < 0.02
    child = pa.array(vals, mask=elem_mask)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    lists = pa.ListArray.from_arrays(pa.array(off.astype(np.int32), pa.int32()), child)
    # null the list SLOT for ~3% of rows
    slot_null = rng.random(n) < 0.03
    lists = pc.if_else(pa.array(~slot_null), lists, pa.scalar(None, lists.type))

    doc_ids = np.array([f"doc-{i:012d}" for i in range(n)], dtype=object)
    doc_ids[rng.random(n) < 0.02] = None
    doc_ids[rng.random(n) < 0.01] = ""
    sources = np.array(
        ["web", "news", "books", "forums", "code"], dtype=object
    )[rng.integers(0, 5, n)]
    sources[rng.random(n) < 0.04] = None
    sources[rng.random(n) < 0.01] = ""
    n_tok = pa.array(lens.astype(np.int32), mask=rng.random(n) < 0.03)
    return pa.table(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "doc_id": pa.array(doc_ids.tolist(), pa.string()),
            "tokens": lists,
            "n_tok": n_tok,
            "source": pa.array(sources.tolist(), pa.string()),
        }
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_f1")
    t = _hostile_f1(N_ROWS)
    per = N_ROWS // N_FILES
    for i in range(N_FILES):
        pq.write_table(t.slice(i * per, per), str(d / f"part-{i}.parquet"))
    return str(d), t


def _store_hashes(out: str) -> dict[str, str]:
    cdir = os.path.join(out, "chunks")
    return {
        f: hashlib.sha256(open(os.path.join(cdir, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(cdir))
    }


def test_hostile_f1_pipeline_roundtrip(tmp_path, corpus, ray_session):
    src, t = corpus
    out = str(tmp_path / "store")
    rec = encode_dataset([os.path.join(src, f) for f in sorted(os.listdir(src))],
                         out, DEFAULT_OPTIONS, batch_size=700)
    assert rec["totals"]["rows"] == N_ROWS
    back = pa.concat_tables(
        decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    # list child field name is a codec-side constant ("element"); value
    # equality is what the north rule grades — align schemas via cast
    back = back.sort_by("rid").combine_chunks().cast(t.schema)
    assert back.equals(t.combine_chunks()), (
        "hostile F1 corpus did not roundtrip bit-identically"
    )


def test_hostile_f1_reencode_is_byte_identical(tmp_path, corpus, ray_session):
    src, _ = corpus
    files = [os.path.join(src, f) for f in sorted(os.listdir(src))]
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    encode_dataset(files, out1, DEFAULT_OPTIONS, batch_size=700)
    encode_dataset(files, out2, DEFAULT_OPTIONS, batch_size=700)
    h1, h2 = _store_hashes(out1), _store_hashes(out2)
    assert h1 == h2, "re-encode of the hostile corpus is not byte-identical"


def test_hostile_f1_projection_and_predicates(tmp_path, corpus, ray_session):
    src, t = corpus
    out = str(tmp_path / "store")
    encode_dataset([os.path.join(src, f) for f in sorted(os.listdir(src))],
                   out, DEFAULT_OPTIONS, batch_size=700)
    # projection: rid + n_tok only (tokens stream never decoded)
    proj = pa.concat_tables(
        decode_dataset(out, columns=["rid", "n_tok"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("rid")
    assert proj.column_names == ["rid", "n_tok"]
    assert proj.column("n_tok").combine_chunks().equals(
        t.column("n_tok").combine_chunks()
    )
    # predicate over a null-bearing column: SQL semantics — null source
    # rows must NOT pass source == 'web'
    sel = pa.concat_tables(
        decode_dataset(out, columns=["rid", "source"],
                       predicates=[("source", "==", "web")]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("rid")
    exp = t.filter(pc.equal(t.column("source"), "web"))
    assert sel.num_rows == exp.num_rows
    assert sel.column("rid").combine_chunks().equals(exp.column("rid").combine_chunks())
    assert pc.all(pc.equal(sel.column("source"), "web")).as_py()
