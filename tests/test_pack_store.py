"""pack_store: token-level concat-then-chunk over the north-star corpus.

The invariant that matters is FLATTEN EQUALITY: concatenating the packed
windows in seq_id order must reproduce, token for token, the concatenation
of the source documents in key order — no token lost, duplicated, or
reordered, across empty docs, null lists, null elements and window-
spanning documents.  Plus: every interior window exactly `window` tokens,
seq_ids dense from 0, deterministic byte-identical re-runs."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import DEFAULT_OPTIONS
from orc_ray.fixtures import write_f1_parquet
from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.encode import encode_dataset, pack_store

WINDOW = 512


def _decode_all(store: str) -> pa.Table:
    return pa.concat_tables(
        decode_dataset(store).iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks()


def _flat_tokens(t: pa.Table, key: str, tokens: str) -> list:
    tt = t.sort_by(key)
    out = []
    for row in tt.column(tokens).to_pylist():
        if row is not None:
            out.extend(row)
    return out


@pytest.fixture(scope="module")
def f1_store(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("packsrc"))
    write_f1_parquet(d, 4000, n_files=4)
    store = os.path.join(d, "store")
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    encode_dataset(files, store, DEFAULT_OPTIONS, batch_size=700)
    return store


def test_pack_flatten_equality_and_window_shape(tmp_path, f1_store, ray_session):
    out = str(tmp_path / "packed")
    rec = pack_store(f1_store, out, window=WINDOW, batch_size=500)
    src = _decode_all(f1_store)
    packed = _decode_all(out).sort_by("seq_id")
    # flatten equality in seq order vs doc_id order
    assert _flat_tokens(packed, "seq_id", "tokens") == _flat_tokens(src, "doc_id", "tokens")
    # every window but the last is exactly WINDOW tokens; n_tok agrees
    lens = packed.column("n_tok").to_pylist()
    assert all(l == WINDOW for l in lens[:-1])
    assert 0 < lens[-1] <= WINDOW
    assert lens == [len(x) for x in packed.column("tokens").to_pylist()]
    # seq ids dense from 0
    assert packed.column("seq_id").to_pylist() == list(range(packed.num_rows))
    # row count is exactly ceil(total/WINDOW)
    total = sum(lens)
    assert packed.num_rows == (total + WINDOW - 1) // WINDOW
    assert rec["totals"]["rows"] == packed.num_rows


def test_pack_is_retry_deterministic(tmp_path, f1_store, ray_session):
    h = []
    for sub in ("p1", "p2"):
        out = str(tmp_path / sub)
        pack_store(f1_store, out, window=WINDOW, batch_size=500)
        cdir = os.path.join(out, "chunks")
        h.append(
            {
                f: hashlib.sha256(open(os.path.join(cdir, f), "rb").read()).hexdigest()
                for f in sorted(os.listdir(cdir))
            }
        )
    assert h[0] == h[1], "pack_store re-run is not byte-identical"


@pytest.mark.parametrize("window", [7, WINDOW])
def test_pack_extreme_split(tmp_path, f1_store, ray_session, window):
    # window far below typical doc length: nearly every doc spans many
    # windows, maximizing piece counts and boundary healing
    out = str(tmp_path / f"w{window}")
    pack_store(f1_store, out, window=window, batch_size=300)
    src = _decode_all(f1_store)
    packed = _decode_all(out).sort_by("seq_id")
    assert _flat_tokens(packed, "seq_id", "tokens") == _flat_tokens(src, "doc_id", "tokens")
    lens = packed.column("n_tok").to_pylist()
    assert all(l == window for l in lens[:-1])


def test_pack_hostile_lists(tmp_path, ray_session):
    # null lists, null elements, empty lists, docs spanning many windows
    rng = np.random.default_rng(5)
    n = 400
    lens = rng.integers(0, 40, n).astype(np.int64)
    lens[rng.random(n) < 0.05] = 0
    lens[rng.random(n) < 0.02] = 1500  # spans many 512-token windows
    total = int(lens.sum())
    child = pa.array(
        rng.integers(0, 1000, total, dtype=np.int32),
        mask=rng.random(total) < 0.03,
    )
    off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    lists = pa.ListArray.from_arrays(pa.array(off.astype(np.int32), pa.int32()), child)
    lists = pc.if_else(pa.array(rng.random(n) >= 0.04), lists, pa.scalar(None, lists.type))
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:05d}" for i in range(n)], pa.string()),
            "tokens": lists,
            "n_tok": pc.fill_null(pc.list_value_length(lists), 0),
            "source": pa.array(["a", "b"] * (n // 2), pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "in.parquet"))
    store = os.path.join(d, "store")
    encode_dataset([os.path.join(d, "in.parquet")], store, DEFAULT_OPTIONS, batch_size=97)
    out = os.path.join(d, "packed")
    pack_store(store, out, window=WINDOW, batch_size=97)
    packed = _decode_all(out).sort_by("seq_id")
    assert _flat_tokens(packed, "seq_id", "tokens") == _flat_tokens(t, "doc_id", "tokens")
    lens_out = packed.column("n_tok").to_pylist()
    assert all(l == WINDOW for l in lens_out[:-1])


def test_pack_cli(tmp_path, f1_store):
    import json
    import subprocess
    import sys

    out = str(tmp_path / "cli_packed")
    r = subprocess.run(
        [sys.executable, "-m", "orc_ray", "pack", f1_store, out,
         "--window", "256", "--batch-size", "500"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    totals = json.loads(r.stdout.strip().splitlines()[-1])
    assert totals["rows"] > 0
