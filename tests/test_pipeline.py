"""End-to-end Ray Data pipeline tests: encode -> chunk store + manifest ->
decode, resume from manifest (F6), stats pruning, salted shuffle."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import EncodeOptions
from orc_ray.fixtures import f1_corpus, write_f1_parquet
from orc_ray.pipeline.decode import decode_dataset, list_chunks
from orc_ray.pipeline.encode import encode_dataset
from orc_ray.state import manifest as mstate


@pytest.fixture(scope="module")
def f1_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("f1in")
    paths = write_f1_parquet(str(d), 8000, n_files=4)
    return str(d), paths


def _sorted_by_doc(t: pa.Table) -> pa.Table:
    return t.sort_by("doc_id").combine_chunks()


def test_encode_decode_roundtrip(ray_session, f1_files, tmp_path):
    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    rec = encode_dataset(in_dir, out, batch_size=1000)
    assert rec["totals"]["committed_files"] == 4
    assert rec["totals"]["rows"] == 8000
    ds = decode_dataset(out)
    got = _sorted_by_doc(ray_get_table(ds))
    exp = _sorted_by_doc(pa.concat_tables([pq.read_table(p) for p in paths]))
    assert got.equals(exp)  # bit-identical per-row (tokens list included)


def ray_get_table(ds) -> pa.Table:
    parts = [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    return pa.concat_tables(parts) if parts else pa.table({})


def test_compression_vs_raw(ray_session, f1_files, tmp_path):
    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    rec = encode_dataset(in_dir, out, batch_size=4000)
    tot = rec["totals"]
    assert tot["enc_bytes"] < tot["raw_bytes"] / 2  # ≥2x lightweight+zstd


def test_resume_skips_committed_and_completes(ray_session, f1_files, tmp_path):
    """F6: kill after k committed inputs -> resume -> complete store that
    decodes identically; committed chunks untouched."""
    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    # simulate an interrupted run: only 2 of 4 inputs were encoded+committed
    encode_dataset(paths[:2], out, batch_size=1000)
    first_chunks = set(os.listdir(mstate.chunk_dir(out)))
    committed = mstate.load_committed(out)
    assert len(committed["files"]) == 2

    # resume over the full input list
    rec = encode_dataset(paths, out, batch_size=1000, resume=True)
    assert rec["totals"]["committed_files"] == 4
    after = set(os.listdir(mstate.chunk_dir(out)))
    assert first_chunks <= after  # committed chunks untouched (same ids)

    got = _sorted_by_doc(ray_get_table(decode_dataset(out)))
    exp = _sorted_by_doc(pa.concat_tables([pq.read_table(p) for p in paths]))
    assert got.equals(exp)

    # a second resume is a no-op (nothing left to encode)
    n_before = len(os.listdir(mstate.chunk_dir(out)))
    rec2 = encode_dataset(paths, out, batch_size=1000, resume=True)
    assert rec2["totals"]["committed_files"] == 4
    assert len(os.listdir(mstate.chunk_dir(out))) == n_before


def test_projection_and_stats_pruning(ray_session, f1_files, tmp_path):
    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    encode_dataset(in_dir, out, batch_size=500)
    # projection
    t = ray_get_table(decode_dataset(out, columns=["doc_id", "n_tok"]))
    assert t.column_names == ["doc_id", "n_tok"]
    assert t.num_rows == 8000
    # pruning: n_tok > huge value -> most chunks skipped entirely
    _, kept, total = list_chunks(out, predicates=[("n_tok", ">", 2047)])
    assert kept < total
    got = ray_get_table(decode_dataset(out, predicates=[("n_tok", ">", 2047)]))
    exp = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = exp.filter(pc.greater(exp.column("n_tok"), 2047))
    assert got.num_rows == exp.num_rows
    # exact residual filter correctness on a selective predicate
    got2 = ray_get_table(decode_dataset(out, predicates=[("n_tok", "<=", 64)]))
    exp2 = exp = pa.concat_tables([pq.read_table(p) for p in paths])
    exp2 = exp2.filter(pc.less_equal(exp2.column("n_tok"), 64))
    assert _sorted_by_doc(got2).equals(_sorted_by_doc(exp2))


def test_salted_shuffle_mode(ray_session, f1_files, tmp_path):
    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    rec = encode_dataset(
        in_dir, out, batch_size=1000, partition_by="source", salt_length_col="n_tok"
    )
    got = _sorted_by_doc(ray_get_table(decode_dataset(out)))
    exp = _sorted_by_doc(pa.concat_tables([pq.read_table(p) for p in paths]))
    assert got.equals(exp)


def test_manifest_lineage_fields(ray_session, f1_files, tmp_path):
    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    encode_dataset(in_dir, out, batch_size=2000)
    man = mstate.read_manifest(out)
    assert man.num_rows >= 4
    row = {k: man.column(k)[0].as_py() for k in man.column_names}
    codecs = json.loads(row["codecs"])
    assert codecs["tokens"] == "list" and codecs["source"] == "dict"
    assert codecs["doc_id"] in ("fsst", "str")
    assert row["n_rows"] > 0 and row["enc_bytes"] > 0
    stats = json.loads(row["stats"])
    assert "n_tok" in stats and stats["n_tok"]["min"] >= 8


def test_salted_shuffle_bounds_chunk_length_spread(ray_session, tmp_path):
    """The north-star skew rule: salt = floor(log2(n_tok)) must co-locate
    similar-length docs, so every chunk's n_tok range stays within one
    power-of-two bucket (max <= 2*min) even on a corpus with ~256x
    length skew — the quantitative check behind 'salting bounds partition
    byte volume'."""
    import numpy as np

    rng = np.random.default_rng(8)
    n = 6000
    lens = np.clip(np.rint(np.exp(rng.normal(5.0, 0.9, n))).astype(np.int64), 8, 2048)
    toks = [rng.integers(0, 50257, l).astype(np.int32) for l in lens]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
            "tokens": pa.array([x.tolist() for x in toks], pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
        }
    )
    src = tmp_path / "in.parquet"
    pq.write_table(t, src)
    out = str(tmp_path / "store")
    encode_dataset([str(src)], out, batch_size=500, partition_by="source", salt_length_col="n_tok")
    man = mstate.read_manifest(out)
    assert man.num_rows >= 8
    spreads = []
    for srow in man.column("stats").to_pylist():
        st = json.loads(srow)["n_tok"]
        assert st["max"] <= 2 * st["min"], st  # one log2 bucket per chunk
        spreads.append(st["max"] / st["min"])
    # and the corpus itself really is skewed ~256x
    assert lens.max() / lens.min() > 100


def test_limit_pushdown(ray_session, f1_files, tmp_path):
    """decode_dataset(limit=N): row cap honored AND the chunk plan is cut
    to the shortest manifest-row prefix before any I/O (no predicates);
    with predicates the cap still holds via the streaming limit."""
    from orc_ray.pipeline.decode import _limit_prefix

    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    encode_dataset(in_dir, out, batch_size=500)  # 8000 rows -> 16 chunks
    all_paths, _, total = list_chunks(out)
    assert total >= 8

    # plan pruning: 3 rows needs exactly one chunk; 1200 rows needs 3
    assert len(_limit_prefix(out, all_paths, 3)) == 1
    assert len(_limit_prefix(out, all_paths, 1200)) == 3
    assert _limit_prefix(out, all_paths, 10**9) == all_paths

    t = ray_get_table(decode_dataset(out, limit=3))
    assert t.num_rows == 3
    t = ray_get_table(decode_dataset(out, limit=1200, columns=["doc_id"]))
    assert t.num_rows == 1200 and t.column_names == ["doc_id"]
    # limit over the full size returns everything
    assert ray_get_table(decode_dataset(out, limit=10**9)).num_rows == 8000
    # limit <= 0 -> empty
    assert ray_get_table(decode_dataset(out, limit=0)).num_rows == 0
    # with predicates: cap still exact, rows all satisfy the predicate
    got = ray_get_table(decode_dataset(out, predicates=[("n_tok", ">", 64)], limit=5))
    assert got.num_rows == 5
    assert pc.min(got.column("n_tok")).as_py() > 64


def test_decode_union_by_name(ray_session, tmp_path):
    """Union-by-name across evolved stores: int32->int64 promotion,
    typed NULL fill for absent columns, stable column order, and the
    predicate-must-exist-everywhere guard."""
    import pyarrow.parquet as _pq

    from orc_ray.pipeline.decode import decode_union, store_schema

    a_src = str(tmp_path / "a.parquet")
    b_src = str(tmp_path / "b.parquet")
    _pq.write_table(
        pa.table({"k": pa.array([1, 2, 3], pa.int32()), "s": pa.array(["x", "y", "z"])}),
        a_src,
    )
    _pq.write_table(
        pa.table({"k": pa.array([10, 20], pa.int64()), "v": pa.array([1.5, 2.5])}),
        b_src,
    )
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    encode_dataset([a_src], sa)
    encode_dataset([b_src], sb)
    assert store_schema(sa).field("k").type == pa.int32()

    got = ray_get_table(decode_union([sa, sb])).sort_by("k")
    assert got.schema.field("k").type == pa.int64()
    assert got.column_names == ["k", "s", "v"]  # unified order on both sides
    assert got.column("k").to_pylist() == [1, 2, 3, 10, 20]
    assert got.column("s").to_pylist() == ["x", "y", "z", None, None]
    assert got.column("v").to_pylist() == [None, None, None, 1.5, 2.5]

    # predicate over a common column works (and prunes per store)
    f = ray_get_table(decode_union([sa, sb], predicates=[("k", ">", 2)]))
    assert sorted(f.column("k").to_pylist()) == [3, 10, 20]
    # predicate over a one-sided column is rejected loudly
    with pytest.raises(ValueError, match="absent from store"):
        decode_union([sa, sb], predicates=[("v", ">", 0.0)])


def test_column_compression_through_pipeline(ray_session, f1_files, tmp_path):
    """Per-column compression override through encode_dataset/decode_dataset
    (not just chunk-level): mixed-codec store roundtrips bit-exactly."""
    from orc_ray.chunk import EncodeOptions

    in_dir, paths = f1_files
    out = str(tmp_path / "store")
    encode_dataset(
        in_dir, out,
        EncodeOptions(column_compression={"text": "lz4", "doc_id": "none"}),
        batch_size=1000,
    )
    got = _sorted_by_doc(ray_get_table(decode_dataset(out)))
    exp = _sorted_by_doc(pa.concat_tables([pq.read_table(p) for p in paths]))
    assert got.equals(exp.select(got.column_names))


def test_purge_store_fuzz(ray_session, tmp_path):
    """purge_store vs pure-Arrow complement filtering over random
    predicates (incl. trees and null-producing columns): survivors must
    be exactly the non-matching rows, bit-identical, and rows with NULL
    predicate results are KEPT (did-not-match semantics)."""
    import numpy as np

    from orc_ray.pipeline.decode import _mask
    from orc_ray.pipeline.encode import purge_store

    rng = np.random.default_rng(23)
    n = 5000
    t = pa.table(
        {
            "k": np.arange(n, dtype=np.int64),
            "v": rng.integers(-1000, 1000, n),
            "cat": pa.array([None if i % 7 == 0 else f"c{i % 4}" for i in range(n)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=700)

    preds_pool = [
        [("v", ">", 0)],
        [("cat", "==", "c2")],                       # null cat rows must SURVIVE
        [("k", "between", 1000, 2000), ("v", "<", 0)],
        [("or", ("v", ">=", 900), ("cat", "==", "c0"))],
        [("not", ("k", "<", 4999))],
        [("cat", "isnull")],
    ]
    for i, preds in enumerate(preds_pool):
        out = str(tmp_path / f"purged{i}")
        purge_store(store, out, preds)
        got = ray_get_table(decode_dataset(out)).sort_by("k").combine_chunks()
        m = None
        for p in preds:
            mm = _mask(t, p)
            m = mm if m is None else pa.compute.and_(m, mm)
        exp = t.filter(pa.compute.invert(pa.compute.fill_null(m, False)))
        assert got.num_rows == exp.num_rows, preds
        assert got.equals(exp.select(got.column_names)), preds


def test_resume_rejects_stale_format_parts(ray_session, tmp_path):
    """Resume across a FORMAT_VERSION bump re-encodes, never mixes: a
    durable unit part whose chunks carry an older header version is
    dropped at resume and its unit re-encoded, leaving the final store
    byte-identical to a fresh run (chunk.py FORMAT_VERSION contract)."""
    import glob
    import json as _json
    import shutil
    import struct

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.state import manifest as mstate

    rng = np.random.default_rng(21)
    t = pa.table(
        {"k": pa.array(np.arange(3000)), "v": pa.array(rng.integers(0, 10**6, 3000))}
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src, row_group_size=500)
    fresh = str(tmp_path / "fresh")
    encode_dataset([src], fresh, batch_size=500)
    stale = str(tmp_path / "stale")
    encode_dataset([src], stale, batch_size=500)

    def chunk_set(d):
        return {
            os.path.basename(p): open(p, "rb").read()
            for p in glob.glob(os.path.join(d, "chunks", "*.oray"))
        }

    assert chunk_set(fresh) == chunk_set(stale)  # determinism baseline
    # simulate a part written by an older format: rewrite one chunk's
    # header version in place (same length, same chunk file name)
    os.remove(os.path.join(stale, "_committed.json"))
    victim = sorted(glob.glob(os.path.join(stale, "chunks", "*.oray")))[0]
    blob = bytearray(open(victim, "rb").read())
    (hlen,) = struct.unpack_from("<I", blob, 5)
    hdr = _json.loads(bytes(blob[9 : 9 + hlen]))
    old_v = hdr["v"]
    patched = bytes(blob[9 : 9 + hlen]).replace(
        f'"v":{old_v}'.encode(), f'"v":{old_v - 1}'.encode(), 1
    )
    assert len(patched) == hlen
    blob[9 : 9 + hlen] = patched
    with open(victim, "wb") as f:
        f.write(bytes(blob))
    rec = encode_dataset([src], stale, batch_size=500, resume=True)
    assert rec["totals"]["rows"] == 3000
    assert chunk_set(stale) == chunk_set(fresh)  # stale unit re-encoded
    # every chunk in the resumed store carries the current version
    from orc_ray.chunk import FORMAT_VERSION, read_chunk_header

    for p in glob.glob(os.path.join(stale, "chunks", "*.oray")):
        assert read_chunk_header(open(p, "rb").read())["v"] == FORMAT_VERSION
