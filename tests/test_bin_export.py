"""Training-shard binary export (pipeline/orcio.write_bin_parts): the
Megatron-LM indexed-dataset idea as self-contained content-addressed
shards — flat little-endian int32 token payload at a fixed 16-byte-aligned
offset so a dataloader memory-maps it, index header (ids + lengths) in
front, sha-named parts for idempotent resume."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.pipeline.orcio import BIN_MAGIC, _serialize_bin, read_bin_part, write_bin_parts


def _mk(n=200, seed=0):
    rng = np.random.default_rng(seed)
    toks = [rng.integers(0, 50257, int(l)).astype(np.int32).tolist() for l in rng.integers(0, 40, n)]
    toks[3] = []  # empty sequence
    ids = [f"doc-{i:06d}-é" for i in range(n)]  # unicode ids
    return pa.table({"doc_id": pa.array(ids), "tokens": pa.array(toks, pa.list_(pa.int32()))})


def test_shard_roundtrip_exact(tmp_path):
    t = _mk()
    p = str(tmp_path / "part.bin")
    with open(p, "wb") as f:
        f.write(_serialize_bin(t, id_col="doc_id", tokens_col="tokens"))
    back = read_bin_part(p)
    assert back.column("seq_id").to_pylist() == t.column("doc_id").to_pylist()
    assert back.column("tokens").to_pylist() == t.column("tokens").to_pylist()


def test_shard_sliced_and_null_tokens(tmp_path):
    t = _mk()
    # null token list == empty sequence; sliced batches exercise offsets
    t = t.set_column(1, "tokens", pa.array(
        [None if i == 7 else v for i, v in enumerate(t.column("tokens").to_pylist())],
        pa.list_(pa.int32())))
    sl = t.slice(5, 50)
    p = str(tmp_path / "part.bin")
    with open(p, "wb") as f:
        f.write(_serialize_bin(sl, id_col="doc_id", tokens_col="tokens"))
    back = read_bin_part(p)
    exp = [v if v is not None else [] for v in sl.column("tokens").to_pylist()]
    assert back.column("tokens").to_pylist() == exp
    assert back.column("seq_id").to_pylist() == sl.column("doc_id").to_pylist()


def test_payload_is_mmap_addressable(tmp_path):
    """The contract a dataloader relies on: the flat token payload starts
    at a 16-byte-aligned offset computable from the header alone."""
    import struct

    t = _mk(64, seed=3)
    p = str(tmp_path / "part.bin")
    with open(p, "wb") as f:
        f.write(_serialize_bin(t, id_col="doc_id", tokens_col="tokens"))
    blob = open(p, "rb").read()
    assert blob[: len(BIN_MAGIC)] == BIN_MAGIC
    ver, dt, n, total = struct.unpack_from("<BBQQ", blob, len(BIN_MAGIC))
    off = len(BIN_MAGIC) + 18
    lens = np.frombuffer(blob, "<u4", n, off)
    id_lens = np.frombuffer(blob, "<u4", n, off + 4 * n)
    pay = off + 8 * n + int(id_lens.sum())
    pay += (-pay) % 16
    assert pay % 16 == 0
    flat = np.frombuffer(blob, "<i4", int(total), pay)  # would raise if misaligned/short
    exp = np.concatenate([np.asarray(v, np.int32) for v in t.column("tokens").to_pylist() if v])
    np.testing.assert_array_equal(flat, exp)


def test_write_bin_parts_resume_and_determinism(ray_session, tmp_path):
    import ray

    t = _mk(500, seed=5)
    out = str(tmp_path / "shards")
    man1 = write_bin_parts(ray.data.from_arrow(t), out, batch_size=128)
    names1 = sorted(os.path.basename(p) for p in glob.glob(out + "/part-*.bin"))
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(out + "/part-*.bin")}
    man2 = write_bin_parts(ray.data.from_arrow(t), out, batch_size=128)
    names2 = sorted(os.path.basename(p) for p in glob.glob(out + "/part-*.bin"))
    assert names1 == names2  # content-addressed: identical shard set
    # resume contract: existing parts are skipped, not rewritten
    assert all(os.path.getmtime(p) == mtimes[p] for p in mtimes)
    assert sum(man1.column("rows").to_pylist()) == 500
    # full reassembly is token-exact
    back = pa.concat_tables(
        [read_bin_part(p) for p in sorted(glob.glob(out + "/part-*.bin"))]
    ).sort_by("seq_id")
    src = t.sort_by("doc_id")
    assert back.column("tokens").to_pylist() == src.column("tokens").to_pylist()


def test_cli_export_bin(ray_session, tmp_path):
    """store -> export-bin -> shards reconstruct the exact token lists."""
    import subprocess
    import sys

    import pyarrow.parquet as pq
    import ray

    from orc_ray.pipeline.encode import encode_dataset

    t = _mk(300, seed=9)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=100)
    out = str(tmp_path / "bins")
    r = subprocess.run(
        [sys.executable, "-m", "orc_ray", "export-bin", store, out, "--batch-size", "100"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    back = pa.concat_tables(
        [read_bin_part(p) for p in sorted(glob.glob(out + "/part-*.bin"))]
    ).sort_by("seq_id")
    srt = t.sort_by("doc_id")
    assert back.column("seq_id").to_pylist() == srt.column("doc_id").to_pylist()
    assert back.column("tokens").to_pylist() == srt.column("tokens").to_pylist()


def test_import_bin_roundtrip(ray_session, tmp_path):
    """store -> export-bin -> import-bin -> store: the full loop is
    token-exact (the csv/orc/parquet sinks' round-trip contract)."""
    import ray

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.pipeline.orcio import read_bin

    t = _mk(400, seed=11)
    out = str(tmp_path / "shards")
    write_bin_parts(ray.data.from_arrow(t), out, batch_size=128)
    store2 = str(tmp_path / "store2")
    encode_dataset(None, store2, ds=read_bin(out), batch_size=128)
    back = pa.concat_tables(
        list(decode_dataset(store2).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("seq_id")
    src = t.sort_by("doc_id")
    assert back.column("seq_id").to_pylist() == src.column("doc_id").to_pylist()
    assert back.column("tokens").to_pylist() == src.column("tokens").to_pylist()


def test_cli_import_bin(ray_session, tmp_path):
    import subprocess
    import sys

    import ray

    from orc_ray.pipeline.decode import decode_dataset

    t = _mk(150, seed=13)
    out = str(tmp_path / "shards")
    write_bin_parts(ray.data.from_arrow(t), out, batch_size=64)
    store = str(tmp_path / "store")
    r = subprocess.run(
        [sys.executable, "-m", "orc_ray", "import-bin", out, store],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    back = pa.concat_tables(
        list(decode_dataset(store).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("seq_id")
    assert back.column("tokens").to_pylist() == t.sort_by("doc_id").column("tokens").to_pylist()


def test_corrupt_shard_fails_loudly(tmp_path):
    """Truncated or garbled shards raise, never return short/wrong data."""
    t = _mk(64, seed=17)
    p = str(tmp_path / "part.bin")
    blob = _serialize_bin(t, id_col="doc_id", tokens_col="tokens")
    with open(p, "wb") as f:
        f.write(blob)
    # truncated payload
    with open(p, "wb") as f:
        f.write(blob[: len(blob) - 8])
    with pytest.raises(ValueError):
        read_bin_part(p)
    # wrong magic
    with open(p, "wb") as f:
        f.write(b"NOTBIN" + blob[6:])
    with pytest.raises(ValueError):
        read_bin_part(p)
    # truncated header
    with open(p, "wb") as f:
        f.write(blob[:10])
    with pytest.raises(Exception):
        read_bin_part(p)


def test_null_ids_refused(tmp_path):
    """ORBIN1 has no id validity lane, so null ids fail loudly instead of
    silently becoming '' across an export/import round trip."""
    t = pa.table(
        {"doc_id": pa.array(["a", None, "c"]),
         "tokens": pa.array([[1], [2], [3]], pa.list_(pa.int32()))}
    )
    with pytest.raises(ValueError, match="null value"):
        _serialize_bin(t, id_col="doc_id", tokens_col="tokens")


def test_all_empty_sequences_shard(tmp_path):
    """A shard whose every sequence is empty (zero total tokens) must
    round-trip — and the bin_export summarize path must not index an
    empty payload."""
    t = pa.table(
        {"doc_id": pa.array([f"d{i}" for i in range(5)]),
         "tokens": pa.array([[]] * 5, pa.list_(pa.int32()))}
    )
    p = str(tmp_path / "part.bin")
    with open(p, "wb") as f:
        f.write(_serialize_bin(t, id_col="doc_id", tokens_col="tokens"))
    back = read_bin_part(p)
    assert back.column("tokens").to_pylist() == [[]] * 5
