"""Filesystem dispatch (state/storage.py): chunk stores addressed by URL.

Two layers of evidence (the sandbox has no object store):
- the layer's primitive semantics (atomic-replace, glob with protocol
  restored, link_or_copy, parquet/json round-trips) against fsspec's
  ``memory://`` filesystem — a real non-local FS implementation;
- the FULL engine pipeline (encode -> resume -> decode -> merge) against
  ``file://`` URLs, proving no store code path assumes raw os paths.
``memory://`` is per-process so it cannot host a multi-worker store;
shared-namespace schemes (s3/gs) take the same code path as file://.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.state import storage as st


@pytest.fixture()
def mem_root():
    import fsspec

    fs = fsspec.filesystem("memory")
    root = "memory://storetest"
    yield root
    try:
        fs.rm("/storetest", recursive=True)
    except FileNotFoundError:
        pass


def test_bytes_atomic_and_glob(mem_root):
    st.makedirs(mem_root + "/chunks")
    st.write_bytes_atomic(mem_root + "/chunks/aa.oray", b"payload-a")
    st.write_bytes_atomic(mem_root + "/chunks/bb.oray", b"payload-b")
    assert st.read_bytes(mem_root + "/chunks/aa.oray") == b"payload-a"
    got = st.glob_paths(mem_root + "/chunks/*.oray")
    assert [os.path.basename(p) for p in got] == ["aa.oray", "bb.oray"]
    assert all(p.startswith("memory://") for p in got)
    # no .tmp residue after the atomic replace
    assert st.glob_paths(mem_root + "/chunks/*.tmp") == []
    # overwrite via replace
    st.write_bytes_atomic(mem_root + "/chunks/aa.oray", b"payload-a2")
    assert st.read_bytes(mem_root + "/chunks/aa.oray") == b"payload-a2"
    st.remove(mem_root + "/chunks/bb.oray")
    assert not st.exists(mem_root + "/chunks/bb.oray")


def test_parquet_json_roundtrip(mem_root):
    st.makedirs(mem_root + "/manifest")
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    st.write_parquet_atomic(t, mem_root + "/manifest/part.parquet")
    assert st.read_parquet(mem_root + "/manifest/part.parquet").equals(t)
    assert st.read_parquet(
        mem_root + "/manifest/part.parquet", columns=["b"]
    ).column_names == ["b"]
    st.write_json_atomic(mem_root + "/_committed.json", {"files": {"f": 3}})
    assert st.read_json(mem_root + "/_committed.json") == {"files": {"f": 3}}


def test_link_or_copy_cross_fs(mem_root, tmp_path):
    local = str(tmp_path / "src.bin")
    with open(local, "wb") as f:
        f.write(b"chunkbytes")
    st.makedirs(mem_root)
    st.link_or_copy(local, mem_root + "/dst.bin")
    assert st.read_bytes(mem_root + "/dst.bin") == b"chunkbytes"


def test_local_paths_use_fast_path(tmp_path):
    p = str(tmp_path / "x.bin")
    st.write_bytes_atomic(p, b"abc")
    assert st.read_bytes(p) == b"abc"
    assert not st.is_url(p)
    assert st.glob_paths(str(tmp_path / "*.bin")) == [p]


def _corpus(n=4000):
    rng = np.random.default_rng(3)
    return pa.table(
        {
            "k": pa.array(np.arange(n)),
            "v": pa.array(rng.integers(0, 99, n)),
            "s": pa.array([f"s{i % 7}" for i in range(n)]),
        }
    )


def test_file_url_store_end_to_end(ray_session, tmp_path):
    """encode -> resume no-op -> decode (projection + predicate) -> merge,
    all against file:// URLs across Ray workers."""
    from orc_ray.chunk import EncodeOptions
    from orc_ray.pipeline.decode import count_rows, decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.state.manifest import load_committed, merge_stores

    t = _corpus()
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src, row_group_size=1000)
    store = "file://" + str(tmp_path / "url_store")

    rec = encode_dataset([src], store, EncodeOptions(), batch_size=700)
    assert rec["totals"]["rows"] == 4000
    # resume over a committed store is a no-op commit, through the URL path
    rec2 = encode_dataset([src], store, EncodeOptions(), batch_size=700, resume=True)
    assert rec2["totals"]["rows"] == 4000
    assert load_committed(store)["files"] == {src: 4000}

    got = pa.concat_tables(
        decode_dataset(store).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert got.equals(t)
    proj = pa.concat_tables(
        decode_dataset(store, columns=["k"], predicates=[("k", "<", 100)]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    assert proj.num_rows == 100 and proj.column_names == ["k"]
    assert count_rows(store, trust_stats=True) == 4000

    # merge a URL store into a second URL store (link falls back to copy)
    merged = "file://" + str(tmp_path / "merged_store")
    rec3 = merge_stores(merged, [store])
    assert rec3["totals"]["rows"] == 4000
    back = pa.concat_tables(
        decode_dataset(merged).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert back.equals(t)


def test_canonical_sees_through_url_aliases(tmp_path):
    d = tmp_path / "store"
    d.mkdir()
    assert st.canonical(str(d)) == st.canonical("file://" + str(d))
    # symlink alias of the same directory
    link = tmp_path / "alias"
    os.symlink(d, link)
    assert st.canonical(str(link)) == st.canonical(str(d))
    # memory:// double-slash alias normalizes
    k1, p1 = st.canonical("memory://x//y/")
    k2, p2 = st.canonical("memory://x/y")
    assert (k1, p1) == (k2, p2) and k1 == "memory"


def test_wipe_target_guards_and_wipes_urls(mem_root, tmp_path):
    from orc_ray.pipeline.encode import _wipe_target

    d = tmp_path / "store"
    d.mkdir()
    # file:// alias of the same local dir must be caught as overlap
    with pytest.raises(ValueError, match="overlaps"):
        _wipe_target(str(d), "file://" + str(d))
    with pytest.raises(ValueError, match="overlaps"):
        _wipe_target("file://" + str(d), str(d / "sub"))
    # URL target actually gets wiped (stale parts would double-count rows)
    stale = mem_root + "/out/unit-000.parquet"
    st.makedirs(mem_root + "/out")
    st.write_bytes_atomic(stale, b"stale")
    _wipe_target(str(d), mem_root + "/out")
    assert not st.exists(stale)


def test_replace_never_deletes_dest_first(mem_root):
    # copy-then-delete: destination is overwritten, never left missing
    st.makedirs(mem_root)
    st.write_bytes_atomic(mem_root + "/_committed.json", b'{"v":1}')
    st.write_bytes_atomic(mem_root + "/_committed.json", b'{"v":2}')
    assert st.read_bytes(mem_root + "/_committed.json") == b'{"v":2}'
    # the tmp source is consumed
    assert st.glob_paths(mem_root + "/*.tmp") == []


def test_url_store_kill_resume_equivalence(ray_session, tmp_path):
    """The F6 resume contract over a NON-os.path store (file:// URL, every
    byte through state/storage): an interrupted run (partial commit, plus
    a stale in-flight .tmp left by the 'crash') resumes to a store
    byte-identical to an uninterrupted URL run, with committed chunks
    untouched and concurrent Ray workers writing durable parts to the
    URL namespace."""
    from orc_ray.fixtures import write_f1_parquet
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.state import manifest as mstate

    d = tmp_path / "f1in"
    paths = write_f1_parquet(str(d), 8000, n_files=4)
    store = "file://" + str(tmp_path / "url_resume_store")

    # interrupted run: 2 of 4 inputs committed, plus torn-write residue
    encode_dataset(paths[:2], store, batch_size=1000)
    first_chunks = set(os.listdir(str(tmp_path / "url_resume_store" / "chunks")))
    assert len(mstate.load_committed(store)["files"]) == 2
    st.write_bytes_atomic(store + "/chunks/torn.oray.tmp-residue", b"torn")

    # resume over the full list, through the URL path
    rec = encode_dataset(paths, store, batch_size=1000, resume=True)
    assert rec["totals"]["committed_files"] == 4 and rec["totals"]["rows"] == 8000
    after = set(os.listdir(str(tmp_path / "url_resume_store" / "chunks")))
    assert first_chunks <= after  # committed chunks untouched (same ids)

    # uninterrupted URL run -> identical chunk set (deterministic encode)
    ref = "file://" + str(tmp_path / "url_ref_store")
    encode_dataset(paths, ref, batch_size=1000)
    ref_chunks = set(os.listdir(str(tmp_path / "url_ref_store" / "chunks")))
    assert {c for c in after if c.endswith(".oray")} == ref_chunks

    got = pa.concat_tables(
        decode_dataset(store).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    exp = pa.concat_tables(
        decode_dataset(ref).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    assert got.equals(exp)
