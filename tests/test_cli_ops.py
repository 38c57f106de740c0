"""CLI surface for the round-3 operators: profile, text-index, bm25."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from orc_ray.__main__ import main
from orc_ray.pipeline.encode import encode_dataset


def test_profile_and_bm25_cli(ray_session, tmp_path, capsys):
    rng = np.random.default_rng(23)
    n = 2000
    vocab = [f"w{i}" for i in range(50)]
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, 12)) for _ in range(n)],
            "score": rng.uniform(0, 10, n).round(2),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=512)

    assert main(["profile", store, "--cols", "doc_id,score"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out and "approx_distinct" in out

    idx = str(tmp_path / "idx")
    assert main(["text-index", store, idx]) == 0
    capsys.readouterr()
    assert main(["bm25", idx, "w7,w13", "-k", "5"]) == 0
    out = capsys.readouterr().out
    assert "score_e6" in out and len(out.strip().splitlines()) == 6


def test_table_cli(ray_session, tmp_path, capsys):
    import json

    base = pa.table(
        {"k": pa.array(np.arange(40), pa.int64()), "v": pa.array(np.arange(40) * 2, pa.int64())}
    )
    delta = pa.table(
        {
            "k": pa.array([3, 60, 5], pa.int64()),
            "v": pa.array([333, 606, None], pa.int64()),
            "_op": pa.array(["u", "u", "d"]),
        }
    )
    bsrc = str(tmp_path / "base.parquet")
    dsrc = str(tmp_path / "delta.parquet")
    pq.write_table(base, bsrc)
    pq.write_table(delta, dsrc)
    tdir = str(tmp_path / "tbl")

    assert main(["table", "create", tdir, bsrc, "--key", "k"]) == 0
    assert main(["table", "delta", tdir, dsrc]) == 0
    capsys.readouterr()
    assert main(["table", "read", tdir, "--limit", "100"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    d = {r["k"]: r["v"] for r in rows}
    assert len(d) == 40 + 1 - 1 and d[3] == 333 and d[60] == 606 and 5 not in d
    # time travel via --version
    assert main(["table", "read", tdir, "--version", "0", "--limit", "100"]) == 0
    rows0 = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows0) == 40 and {r["k"]: r["v"] for r in rows0}[3] == 6
    assert main(["table", "compact", tdir]) == 0
    assert main(["table", "vacuum", tdir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "base-0" in out["removed"]


def test_compact_cli(ray_session, tmp_path, capsys):
    import json
    import os

    t = pa.table(
        {"k": np.arange(8000, dtype=np.int64), "s": [f"val {i % 13}" for i in range(8000)]}
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    small = str(tmp_path / "small")
    encode_dataset([src], small, batch_size=256)  # many tiny chunks
    n_small = len(os.listdir(os.path.join(small, "chunks")))

    big = str(tmp_path / "big")
    assert main(["compact", small, big, "--batch-size", "8192"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 8000
    n_big = len(os.listdir(os.path.join(big, "chunks")))
    assert n_big < n_small / 4

    from orc_ray.pipeline.decode import decode_dataset

    back = pa.concat_tables(
        decode_dataset(big).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("k")
    assert back.equals(t)


def test_query_cli(ray_session, capsys):
    import json

    from orc_ray.__main__ import main

    assert main(["query", "list"]) == 0
    names = capsys.readouterr().out.strip().splitlines()
    assert "nation_revenue" in names and len(names) > 100

    assert main(["query", "value_histogram", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    tail = json.loads(lines[-1])
    assert tail["columns"] == ["bucket", "n"] and tail["rows"] > 0

    import pytest

    with pytest.raises(SystemExit, match="close:"):
        main(["query", "nation_revnue"])


def test_stats_jsonschema_version_cli(ray_session, tmp_path, capsys):
    import json

    t = pa.table({"k": np.arange(5000, dtype=np.int64), "s": [f"v{i%7}" for i in range(5000)]})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "st")
    encode_dataset([src], store, batch_size=2048)

    assert main(["stats", store]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 5000
    assert out["columns"]["k"]["min"] == 0 and out["columns"]["k"]["max"] == 4999
    assert out["columns"]["s"]["nulls"] == 0

    jf = str(tmp_path / "rows.jsonl")
    open(jf, "w").write('{"x": 1, "y": "a"}\n{"x": 2, "y": "b"}\n')
    assert main(["json-schema", jf]) == 0
    sch = json.loads(capsys.readouterr().out)
    assert sch == {"x": "int64", "y": "string"}

    assert main(["version"]) == 0
    assert "format_version" in json.loads(capsys.readouterr().out)


def test_shuffle_cli_deterministic(ray_session, tmp_path, capsys):
    import hashlib
    import json
    import os

    t = pa.table({"k": np.arange(6000, dtype=np.int64), "s": [f"row {i}" for i in range(6000)]})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "st")
    encode_dataset([src], store, batch_size=2048)

    def run(out, seed):
        assert main(["shuffle", store, out, "--key", "k", "--seed", str(seed)]) == 0
        capsys.readouterr()
        files = sorted(os.listdir(os.path.join(out, "chunks")))
        h = hashlib.sha256()
        for f in files:
            h.update(open(os.path.join(out, "chunks", f), "rb").read())
        return files, h.hexdigest()

    f1, h1 = run(str(tmp_path / "o1"), 7)
    f2, h2 = run(str(tmp_path / "o2"), 7)
    assert (f1, h1) == (f2, h2)  # retry-identical: same seed -> same bytes
    f3, h3 = run(str(tmp_path / "o3"), 8)
    assert h3 != h1  # a different seed actually permutes

    from orc_ray.pipeline.decode import decode_dataset

    back = pa.concat_tables(
        decode_dataset(str(tmp_path / "o1")).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    assert back.num_rows == 6000
    ks = back.column("k").to_numpy(zero_copy_only=False)
    assert not (ks[:-1] <= ks[1:]).all()  # genuinely permuted, not still sorted
    assert back.sort_by("k").equals(t)  # same content


def test_sample_cli_deterministic(ray_session, tmp_path, capsys):
    import hashlib
    import json
    import os

    t = pa.table({"k": np.arange(8000, dtype=np.int64), "v": np.arange(8000) * 2})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "st")
    encode_dataset([src], store, batch_size=4096)

    assert main(["sample", store, str(tmp_path / "s1"), "--key", "k", "--pct", "10"]) == 0
    n1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert 600 < n1 < 1000  # ~10% +- sampling noise
    assert main(["sample", store, str(tmp_path / "s2"), "--key", "k", "--pct", "10"]) == 0
    capsys.readouterr()

    def digest(d):
        h = hashlib.sha256()
        for f in sorted(os.listdir(os.path.join(d, "chunks"))):
            h.update(open(os.path.join(d, "chunks", f), "rb").read())
        return h.hexdigest()

    assert digest(str(tmp_path / "s1")) == digest(str(tmp_path / "s2"))

    # the md5 bucket rule matches SQL exactly (same rule as q_hash_split)
    import hashlib as hl

    from orc_ray.pipeline.decode import decode_dataset

    back = pa.concat_tables(
        decode_dataset(str(tmp_path / "s1")).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ks = back.column("k").to_pylist()
    expect = [k for k in range(8000) if int(hl.md5(str(k).encode()).hexdigest()[:15], 16) % 100 < 10]
    assert sorted(ks) == expect


def test_key_cli(ray_session, tmp_path, capsys):
    import json

    ks = str(tmp_path / "keys.json")
    assert main(["key", "gen", "k1", "--keystore", ks]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["added"] == "k1" and out["bits"] == 256
    assert main(["key", "list", "--keystore", ks]) == 0
    assert json.loads(capsys.readouterr().out) == ["k1"]
    mat = json.load(open(ks))["k1"]
    assert len(bytes.fromhex(mat)) == 32

    import pytest

    with pytest.raises(SystemExit, match="already exists"):
        main(["key", "gen", "k1", "--keystore", ks])


def test_reencode_refuses_in_place(ray_session, tmp_path):
    import pytest

    from orc_ray.pipeline.encode import compact_store, sort_store

    t = pa.table({"k": np.arange(100, dtype=np.int64)})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "st")
    encode_dataset([src], store, batch_size=50)
    for fn in (lambda: compact_store(store, store), lambda: sort_store(store, store, "k")):
        with pytest.raises(ValueError, match="in-place"):
            fn()
    import os

    assert os.path.exists(os.path.join(store, "chunks"))  # input untouched


def test_fsck_cli(ray_session, tmp_path, capsys):
    import glob
    import json
    import os

    t = pa.table(
        {
            "k": pa.array(np.arange(3000), pa.int64()),
            "s": pa.array([f"s{i % 11}" for i in range(3000)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=700)

    # clean store: every check green, exit 0
    assert main(["fsck", store]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and rep["verified_chunks"] == rep["manifest_chunks"] >= 2
    assert rep["manifest_rows"] == rep["committed_rows"] == 3000

    # tamper one blob, delete another, plant an orphan: all three classes
    blobs = sorted(glob.glob(os.path.join(store, "chunks", "*.oray")))
    with open(blobs[0], "r+b") as f:
        f.seek(7)
        b = f.read(1)
        f.seek(7)
        f.write(bytes([b[0] ^ 0xFF]))
    os.remove(blobs[1])
    with open(os.path.join(store, "chunks", "ab" * 12 + ".oray"), "wb") as f:
        f.write(b"junk")

    assert main(["fsck", store]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"]
    assert rep["corrupt_chunks"] == [os.path.basename(blobs[0])[: -len(".oray")]]
    assert rep["missing_chunks"] == [os.path.basename(blobs[1])[: -len(".oray")]]
    assert rep["orphan_chunks"] == 1

    # shallow skips the re-hash but still flags the missing blob
    assert main(["fsck", store, "--shallow"]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert rep["missing_chunks"] and "verified_chunks" not in rep


def test_recovery_read_skip_corrupt(ray_session, tmp_path):
    """on_corrupt='skip' (FileDump --recover analog): corrupt and missing
    chunks drop from the scan; a plain read of the same store raises."""
    import glob
    import os

    import pytest

    from orc_ray.pipeline.decode import decode_dataset

    t = pa.table(
        {
            "k": pa.array(np.arange(2100), pa.int64()),
            "s": pa.array([f"s{i % 5}" for i in range(2100)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=700)  # 3 chunks

    blobs = sorted(glob.glob(os.path.join(store, "chunks", "*.oray")))
    assert len(blobs) == 3
    with open(blobs[0], "r+b") as f:
        f.seek(5)
        b = f.read(1)
        f.seek(5)
        f.write(bytes([b[0] ^ 0xFF]))
    os.remove(blobs[1])

    with pytest.raises(Exception):
        decode_dataset(store).count()  # plain read fails on the bad chunk

    rec = pa.concat_tables(
        decode_dataset(store, on_corrupt="skip").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    # exactly one intact 700-row chunk survives, values intact
    assert rec.num_rows == 700
    assert set(rec.column("s").to_pylist()) <= {f"s{i}" for i in range(5)}

    with pytest.raises(ValueError, match="on_corrupt"):
        decode_dataset(store, on_corrupt="bogus").count()


def test_recover_store_cli(ray_session, tmp_path, capsys):
    """fsck -> recover -> fsck loop: a damaged store salvages into a fresh
    store whose own audit is fully green."""
    import glob
    import json
    import os

    t = pa.table({"k": pa.array(np.arange(2100), pa.int64())})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=700)
    blobs = sorted(glob.glob(os.path.join(store, "chunks", "*.oray")))
    os.remove(blobs[0])

    out = str(tmp_path / "rec")
    assert main(["recover", store, out]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep == {"recovered_rows": 1400, "damaged_manifest_rows": 2100, "rows_lost": 700}

    assert main(["fsck", out]) == 0
    assert json.loads(capsys.readouterr().out)["ok"]


def test_table_fsck(ray_session, tmp_path, capsys):
    """Table-level audit: green across the whole version history; a
    corrupted delta chunk flags exactly that store and exits 1."""
    import glob
    import json
    import os

    from orc_ray.state import table as tbl

    base = pa.table({"k": pa.array(np.arange(50), pa.int64()),
                     "v": pa.array(np.arange(50) * 3, pa.int64())})
    src = str(tmp_path / "base.parquet")
    pq.write_table(base, src)
    tdir = str(tmp_path / "tbl")
    tbl.create_table(tdir, [src], key="k", batch_size=32)
    delta = pa.table({"k": pa.array([1, 99], pa.int64()),
                      "v": pa.array([111, 999], pa.int64()),
                      "_op": pa.array(["u", "u"])})
    tbl.append_delta(tdir, delta)

    assert main(["table", "fsck", tdir]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and set(rep["stores"]) == {"base-0", "delta-1"}

    blob = sorted(glob.glob(os.path.join(tdir, "delta-1", "chunks", "*.oray")))[0]
    with open(blob, "r+b") as f:
        f.seek(3)
        b = f.read(1)
        f.seek(3)
        f.write(bytes([b[0] ^ 0xFF]))

    assert main(["table", "fsck", tdir]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"]
    assert rep["stores"]["base-0"]["ok"] and not rep["stores"]["delta-1"]["ok"]
    assert rep["stores"]["delta-1"]["corrupt_chunks"]


def test_memory_cli(ray_session, tmp_path, capsys):
    """orc-memory analog: header-only per-column estimate; fixed-width
    decoded sizes exact, projection shrinks the estimate."""
    import json as _json

    t = pa.table({
        "k": np.arange(1000, dtype=np.int64),
        "v": np.random.default_rng(3).uniform(size=1000),
        "s": [f"string-value-{i:05d}" for i in range(1000)],
    })
    src = str(tmp_path / "m.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "mstore")
    encode_dataset([src], store, batch_size=250)

    assert main(["memory", store, "--workers", "2"]) == 0
    full = _json.loads(capsys.readouterr().out)
    assert full["chunks"] == 4 and full["rows"] == 1000
    # fixed-width exact: 1000 * 8 + 1000//8 validity
    assert full["per_column_decoded_est"]["k"] == 8125
    assert full["per_column_decoded_est"]["v"] == 8125
    assert full["peak_total_est"] == 2 * full["per_worker_peak_est"]

    assert main(["memory", store, "--columns", "k"]) == 0
    proj = _json.loads(capsys.readouterr().out)
    assert proj["enc_bytes_selected_est"] < full["enc_bytes_total"]
    assert proj["decoded_bytes_selected_est"] == 8125

    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["memory", store, "--columns", "nope"])


def test_tokenize_cli(ray_session, tmp_path, capsys):
    """Raw text store -> `tokenize` (byte-level BPE) -> `pack`: the full
    pre-training data path through the CLI.  Checks the token store
    schema, the persisted bpe_model.json, and window-exact packing."""
    import json

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(40)], pa.string()),
            "text": pa.array(
                [f"the quick brown fox {i} jumps the" for i in range(40)],
                pa.string(),
            ),
            "source": pa.array(["a", "b"] * 20, pa.string()),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=16)

    tok = str(tmp_path / "tok")
    assert main(["tokenize", store, tok, "--merges", "24"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 40 and rec["n_merges"] > 0

    import os

    model = json.load(open(os.path.join(tok, "bpe_model.json")))
    assert model["alphabet"] == "bytes-256"
    assert len(model["merges"]) == model["n_merges"] == rec["n_merges"]

    from orc_ray.pipeline.decode import decode_dataset

    b = pa.concat_tables(
        list(decode_dataset(tok).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert set(b.column_names) == {"doc_id", "source", "tokens", "n_tok"}
    assert str(b.column("tokens").type.value_type) == "int32"
    assert sum(b.column("n_tok").to_pylist()) > 0

    packed = str(tmp_path / "packed")
    assert main(["pack", tok, packed, "--window", "8"]) == 0
    prec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prec["rows"] > 0


def test_dedup_cli(ray_session, tmp_path, capsys):
    """Exact-dedup store rewrite vs the DuckDB QUALIFY oracle: one
    surviving row (smallest doc_id) per distinct text, NULL text its own
    group distinct from '', every non-key column riding through."""
    import duckdb
    import json

    texts = ["same", "same", "other", "", "", None, None, "same", "uniq"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "score": pa.array([float(i) * 1.5 for i in range(len(texts))]),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=3)

    out = str(tmp_path / "dedup")
    assert main(["dedup", store, out, "--key", "text", "--batch-size", "4"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from orc_ray.pipeline.decode import decode_dataset

    got = pa.concat_tables(
        list(decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("doc_id")

    exp = duckdb.connect().execute(
        f"""SELECT * FROM read_parquet('{src}')
            QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
            ORDER BY doc_id"""
    ).arrow()
    assert got.num_rows == rec["rows_kept"] == exp.num_rows == 5
    assert got.to_pydict() == exp.to_pydict()

    # byte-identical re-run (retry/resume contract of every store op)
    out2 = str(tmp_path / "dedup2")
    assert main(["dedup", store, out2, "--key", "text", "--batch-size", "4"]) == 0
    import os

    a = sorted(os.listdir(os.path.join(out, "chunks")))
    b = sorted(os.listdir(os.path.join(out2, "chunks")))
    assert a == b  # content-addressed chunk ids identical


def test_tokenize_model_reuse(ray_session, tmp_path, capsys):
    """tokenize --model: a second corpus tokenized with the FIRST store's
    persisted bpe_model.json produces identical ids for identical words
    (one tokenizer serving every corpus — the production flow)."""
    import json
    import os

    def mk(store_dir, texts):
        t = pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(texts))], pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        src = str(tmp_path / (os.path.basename(store_dir) + ".parquet"))
        pq.write_table(t, src)
        encode_dataset([src], store_dir, batch_size=8)

    s1 = str(tmp_path / "c1")
    mk(s1, [f"hello help hero {i}" for i in range(20)])
    tok1 = str(tmp_path / "t1")
    assert main(["tokenize", s1, tok1, "--merges", "16"]) == 0
    capsys.readouterr()

    model = os.path.join(tok1, "bpe_model.json")

    # 1) SAME corpus via --model: byte-identical store to the trained run
    # (training skipped, identical merges -> identical tokens -> identical
    # content-addressed chunk ids)
    tok1b = str(tmp_path / "t1b")
    assert main(["tokenize", s1, tok1b, "--model", model]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["vocab_rows"] is None  # no training pass ran
    # loaded model's merges reported (trainer stopped below the cap of 16
    # on this tiny corpus — the count must match the persisted model)
    assert rec["n_merges"] == json.load(open(model))["n_merges"]
    assert sorted(os.listdir(os.path.join(tok1, "chunks"))) == sorted(
        os.listdir(os.path.join(tok1b, "chunks"))
    )

    # 2) a NEW corpus with unseen words still tokenizes (byte alphabet ->
    # no OOV) and identical words get identical ids
    s2 = str(tmp_path / "c2")
    mk(s2, ["hello zzz-unseen hello"])
    tok2 = str(tmp_path / "t2")
    assert main(["tokenize", s2, tok2, "--model", model]) == 0
    capsys.readouterr()

    from orc_ray.pipeline.decode import decode_dataset

    b1 = pa.concat_tables(list(decode_dataset(tok1).iter_batches(
        batch_format="pyarrow", batch_size=None))).sort_by("doc_id")
    b2 = pa.concat_tables(list(decode_dataset(tok2).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    toks2 = b2.column("tokens")[0].as_py()
    assert b2.column("n_tok")[0].as_py() == len(toks2) > 0
    # "hello" occurs first in both corpora's first doc: same leading run
    hello1 = b1.column("tokens")[0].as_py()
    k = 0
    while k < min(len(hello1), len(toks2)) and hello1[k] == toks2[k]:
        k += 1
    assert k >= 1

    # 3) a corrupt model fails loudly
    import pytest as _pytest

    bad = str(tmp_path / "bad_model.json")
    m = json.load(open(model))
    if m["vocab_b64"]:
        import base64

        m["vocab_b64"][0] = base64.b64encode(b"\xff\xfe").decode()
    json.dump(m, open(bad, "w"))
    with _pytest.raises(ValueError, match="corrupt BPE model"):
        main(["tokenize", s2, str(tmp_path / "t3"), "--model", bad])
