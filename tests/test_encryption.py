"""Per-column encryption through the chunk format and the Ray pipelines —
the EncryptionTreeWriter / dual-variant read analog (keyed reader sees real
data, keyless reader sees the masked variant, wrong key fails loudly)."""

import json
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.chunk import EncodeOptions, decode_chunk, encode_chunk

KEY16 = bytes(range(16))
KEY32 = bytes(range(32))


def _table(n=2000):
    rng = np.random.default_rng(11)
    return pa.table(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "text": [f"confidential body {i} " * 2 for i in range(n)],
            "n_tok": rng.integers(0, 1 << 40, n),
            "score": rng.normal(size=n),
        }
    )


def _opts(**kw):
    base = dict(
        encrypt={"text": "pii", "n_tok": "pii"},
        encryption_keys={"pii": KEY32},
        encryption_masks={"text": "redact"},
    )
    base.update(kw)
    return EncodeOptions(**base)


def test_keyed_roundtrip_exact():
    t = _table()
    blob = encode_chunk(t, _opts())
    assert decode_chunk(blob, keys={"pii": KEY32}).equals(t)


def test_keyless_read_gets_masked_variants():
    t = _table()
    blob = encode_chunk(t, _opts())
    pub = decode_chunk(blob)
    # redact mask: letters -> x/X, digits -> 9; no plaintext survives
    assert pub.column("text")[0].as_py().startswith("xxxxxxxxxxxx xxxx 9")
    # default mask is nullify
    assert pub.column("n_tok").null_count == t.num_rows
    # unencrypted columns unaffected
    assert pub.column("doc_id").to_pylist() == t.column("doc_id").to_pylist()


def test_no_plaintext_in_blob_or_header_stats():
    t = _table()
    blob = encode_chunk(t, _opts())
    assert b"confidential" not in blob
    from orc_ray.chunk import read_chunk_header

    hdr = read_chunk_header(blob)
    enc_meta = [c for c in hdr["columns"] if c["codec"] == "enc"]
    assert len(enc_meta) == 2
    for c in enc_meta:
        # no stats, stride minmax, or dictionary material in the clear
        assert set(c) <= {
            "name", "codec", "n", "key", "nonce", "mask", "ivs",
            "meta_iv", "emeta", "masked", "n_real", "buf_lens",
        }


def test_wrong_key_raises_loudly():
    blob = encode_chunk(_table(), _opts())
    with pytest.raises(Exception) as ei:
        decode_chunk(blob, keys={"pii": bytes(reversed(KEY32))})
    assert "wrong key" in str(ei.value) or "garbage" in str(ei.value)


def test_missing_key_material_at_encode_raises():
    with pytest.raises(ValueError):
        encode_chunk(_table(), EncodeOptions(encrypt={"text": "pii"}))


def test_encrypted_bloom_column_rejected():
    with pytest.raises(ValueError):
        encode_chunk(_table(), _opts(bloom_columns=("text",)))


def test_projection_and_row_ranges():
    t = _table()
    blob = encode_chunk(t, _opts())
    proj = decode_chunk(blob, columns=["doc_id", "text"], keys={"pii": KEY32})
    assert proj.column_names == ["doc_id", "text"]
    rr = decode_chunk(blob, row_ranges=[(5, 9), (100, 101)], keys={"pii": KEY32})
    assert rr.num_rows == 5
    assert rr.column("doc_id").to_pylist() == [f"d{i:05d}" for i in (5, 6, 7, 8, 100)]


def test_deterministic_reencode_for_resumability():
    # content-addressed chunks require byte-identical re-encode: the IVs
    # are derived, not random, so the same unit commits the same chunk id
    t = _table()
    assert encode_chunk(t, _opts()) == encode_chunk(t, _opts())
    # rotating the nonce (key version) changes the ciphertext
    assert encode_chunk(t, _opts()) != encode_chunk(t, _opts(encryption_nonce="k2"))


def test_aes128_key_material():
    t = _table(300)
    o = _opts(encryption_keys={"pii": KEY16})
    blob = encode_chunk(t, o)
    assert decode_chunk(blob, keys={"pii": KEY16}).equals(t)


def test_pipeline_roundtrip_and_manifest_clean(ray_session, tmp_path):
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset
    from orc_ray.state import manifest as mstate

    t = _table(6000)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, _opts(), batch_size=2048)

    keyed = decode_dataset(store, keys={"pii": KEY32})
    got = pa.concat_tables(keyed.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.sort_by("doc_id").equals(t.sort_by("doc_id"))

    pub = decode_dataset(store, columns=["doc_id", "n_tok"])
    pt = pa.concat_tables(pub.iter_batches(batch_format="pyarrow", batch_size=None))
    assert pt.column("n_tok").null_count == t.num_rows

    # the manifest must carry no plaintext-derived stats for encrypted cols
    man = mstate.read_manifest(store)
    for s in man.column("stats").to_pylist():
        st = json.loads(s)
        for col in ("text", "n_tok"):
            assert "min" not in st.get(col, {}) and "bloom" not in st.get(col, {})


def test_keyed_read_detects_ciphertext_tampering(ray_session, tmp_path):
    """AES-CTR is malleable: a flipped ciphertext bit decodes to silently
    wrong plaintext.  Keyed decode_dataset therefore verifies the
    content-addressed chunk checksum by DEFAULT and must fail loudly."""
    import glob
    import os

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    t = _table(1000)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, _opts(), batch_size=512)

    victim = sorted(glob.glob(os.path.join(store, "chunks", "*.oray")))[0]
    blob = bytearray(open(victim, "rb").read())
    blob[-1] ^= 0x01  # flip one bit in the last (data) byte
    with open(victim, "wb") as f:
        f.write(bytes(blob))

    with pytest.raises(Exception, match="checksum|corrupt|tampered"):
        pa.concat_tables(
            decode_dataset(store, keys={"pii": KEY32}).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )


def test_header_iv_is_keyed_prf():
    """The public header's IVs must not be recomputable without the key —
    otherwise a keyless reader gets an offline plaintext-confirmation
    oracle (guess plaintext, re-derive IV, compare)."""
    import base64
    import hashlib

    from orc_ray.chunk import read_chunk_header
    from orc_ray.codecs import aes as _aes

    t = _table(50)
    blob = encode_chunk(t, _opts())
    hdr = read_chunk_header(blob)
    enc_cols = [c for c in hdr["columns"] if c.get("codec") == "enc"]
    assert enc_cols
    lk = _aes.derive_local_key(KEY32, enc_cols[0]["name"], enc_cols[0]["nonce"])
    ivs = {base64.b64decode(s) for s in enc_cols[0]["ivs"]}
    # an unkeyed digest-based derivation (the old scheme) must NOT match:
    # try it for every plausible stream index against every stored IV
    for k in range(len(ivs) + 2):
        for guess_digest in (hashlib.sha256(b"x").digest(),):
            unkeyed = hashlib.sha256(
                b"orc-ray-iv\x00"
                + enc_cols[0]["name"].encode()
                + k.to_bytes(4, "little")
                + guess_digest
            ).digest()[:16]
            assert unkeyed not in ivs
    # and the keyed derivation is what's stored (decode contract intact):
    # re-deriving with the local key over the true framed plaintext matches
    # (covered end-to-end by test_deterministic_reencode_for_resumability)
    assert all(len(iv) == 16 for iv in ivs)


def test_reencode_ops_refuse_encrypted_stores(ray_session, tmp_path):
    """sort/zorder/compact/shuffle/sample/purge decode WITHOUT keys, so on
    an encrypted store they would silently rewrite every encrypted column
    as its masked variant (keyed reads of the output recover only NULLs).
    The wipe-first guard must refuse loudly instead."""
    import hashlib

    import pyarrow.parquet as _pq

    from orc_ray.chunk import EncodeOptions
    from orc_ray.pipeline.encode import compact_store, encode_dataset, purge_store, sort_store

    src = str(tmp_path / "in.parquet")
    _pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()), "secret": ["a", "b", "c"]}), src
    )
    store = str(tmp_path / "enc_store")
    key = hashlib.sha256(b"guard").digest()
    encode_dataset([src], store, EncodeOptions(encrypt={"secret": "k"}, encryption_keys={"k": key}))

    for op in (
        lambda: compact_store(store, str(tmp_path / "o1")),
        lambda: sort_store(store, str(tmp_path / "o2"), by=["id"]),
        lambda: purge_store(store, str(tmp_path / "o3"), [("id", "==", 1)]),
    ):
        with pytest.raises(ValueError, match="encrypted columns"):
            op()


def test_rekey_store_rotation(ray_session, tmp_path):
    """Key rotation: keyed decode -> re-encode under a new keystore.
    New key reads exact plaintext; the old key fails loudly; keyless
    reads see only masked variants; keyless rekey is refused."""
    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset, rekey_store

    key_a, key_b = bytes(range(32)), bytes(range(1, 33))
    t = pa.table(
        {
            "id": pa.array(np.arange(900), pa.int64()),
            "secret": pa.array([f"confidential-{i}" for i in range(900)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    encode_dataset(
        [src], a,
        EncodeOptions(encrypt={"secret": "old"}, encryption_keys={"old": key_a}),
        batch_size=300,
    )

    with pytest.raises(ValueError, match="CURRENT keys"):
        rekey_store(a, b, EncodeOptions(encrypt={"secret": "new"},
                                        encryption_keys={"new": key_b}), keys={})

    rekey_store(
        a, b,
        EncodeOptions(encrypt={"secret": "new"}, encryption_keys={"new": key_b}),
        keys={"old": key_a}, batch_size=300,
    )
    got = pa.concat_tables(
        decode_dataset(b, keys={"new": key_b}).iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks().sort_by("id")
    assert got.equals(t.sort_by("id"))

    # keyless read: masked only, no plaintext survives
    pub = pa.concat_tables(
        decode_dataset(b).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vals = [v for v in pub.column("secret").to_pylist() if v is not None]
    assert all("confidential" not in v for v in vals)

    # the retired key fails loudly (checksum forced on by the keyed read)
    with pytest.raises(Exception):
        decode_dataset(b, keys={"new": key_a}).count()


def test_rekey_salvage_damaged_encrypted_store(ray_session, tmp_path):
    """The one damaged-store case recover_store refuses (encrypted input):
    rekey with on_corrupt='skip' drops the bad chunk and rotates the
    survivors; plain rekey of the same store raises."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset, recover_store, rekey_store

    key_a, key_b = bytes(range(32)), bytes(range(2, 34))
    t = pa.table(
        {
            "id": pa.array(np.arange(900), pa.int64()),
            "secret": pa.array([f"confidential-{i}" for i in range(900)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    encode_dataset(
        [src], a,
        EncodeOptions(encrypt={"secret": "old"}, encryption_keys={"old": key_a}),
        batch_size=300,
    )
    blob = sorted(glob.glob(os.path.join(a, "chunks", "*.oray")))[0]
    with open(blob, "r+b") as f:
        f.seek(9)
        x = f.read(1)
        f.seek(9)
        f.write(bytes([x[0] ^ 0xFF]))

    # plain recover refuses encrypted inputs; plain rekey hits the bad chunk
    with pytest.raises(ValueError, match="encrypted columns"):
        recover_store(a, b)
    new_opts = EncodeOptions(encrypt={"secret": "new"}, encryption_keys={"new": key_b})
    with pytest.raises(Exception):
        rekey_store(a, b, new_opts, keys={"old": key_a}, batch_size=300)

    rekey_store(a, b, new_opts, keys={"old": key_a}, batch_size=300, on_corrupt="skip")
    got = pa.concat_tables(
        decode_dataset(b, keys={"new": key_b}).iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks().sort_by("id")
    assert got.num_rows == 600  # one 300-row chunk lost
    ids = got.column("id").to_numpy()
    ref = t.filter(pa.compute.is_in(t.column("id"), value_set=pa.array(ids))).sort_by("id")
    assert got.equals(ref)  # survivors bit-exact under the new key
