"""Chunk round-trip tests — mirrors the reference's per-type write→read
suites (apache/orc java TestVectorOrcFile.java, c++/test/TestWriter.cc) and
the dictionary-threshold suite (TestStringDictionary.java; probe rule [P7])."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.chunk import EncodeOptions, decode_chunk, encode_chunk, read_chunk_header
from orc_ray.fixtures import f1_corpus

rng = np.random.default_rng(11)


def roundtrip(table: pa.Table, opts: EncodeOptions = EncodeOptions()) -> bytes:
    blob = encode_chunk(table, opts)
    out = decode_chunk(blob)
    assert out.num_rows == table.num_rows
    for name in table.column_names:
        a, b = table.column(name).combine_chunks(), out.column(name).combine_chunks()
        assert a.equals(b), f"column {name} mismatch:\n{a[:5]}\nvs\n{b[:5]}"
    return blob


def test_f1_corpus_roundtrip_bit_identical():
    t = f1_corpus(2000)
    blob = roundtrip(t)
    raw = t.nbytes
    assert len(blob) < raw  # must actually compress
    # per-row token equality is implied by column equality above (list array)


def test_all_int_types():
    n = 3000
    t = pa.table(
        {
            "i8": pa.array(rng.integers(-128, 128, n), pa.int8()),
            "i16": pa.array(rng.integers(-32768, 32768, n), pa.int16()),
            "i32": pa.array(rng.integers(-(2**31), 2**31, n), pa.int32()),
            "i64": pa.array(rng.integers(-(2**62), 2**62, n), pa.int64()),
            "u8": pa.array(rng.integers(0, 256, n), pa.uint8()),
            "u32": pa.array(rng.integers(0, 2**32, n), pa.uint32()),
            "u64": pa.array(rng.integers(0, 2**64, n, dtype=np.uint64), pa.uint64()),
            "b": pa.array(rng.integers(0, 2, n).astype(bool)),
        }
    )
    roundtrip(t)


def test_temporal_types():
    n = 2000
    ts = pa.array(np.arange(n) * 1_000_000 + 1577836800_000_000, pa.timestamp("us"))
    t = pa.table(
        {
            "ts": ts,
            "ts_tz": ts.cast(pa.timestamp("us", tz="UTC")),
            "d32": pa.array(rng.integers(0, 20000, n).astype(np.int32), pa.date32()),
        }
    )
    roundtrip(t)


def test_float_decimal_binary():
    n = 2000
    t = pa.table(
        {
            "f32": pa.array(rng.normal(size=n).astype(np.float32)),
            "f64": pa.array(rng.normal(size=n)),
            "dec": pa.array([i * 100 + 7 for i in range(n)], pa.decimal128(18, 2)),
            "bin": pa.array([rng.bytes(int(l)) for l in rng.integers(0, 50, n)], pa.binary()),
        }
    )
    roundtrip(t)


def test_nulls_roundtrip():
    n = 2100
    vals = rng.integers(0, 1000, n)
    mask = rng.random(n) < 1 / 7
    t = pa.table(
        {
            "ints": pa.array([None if m else int(v) for v, m in zip(vals, mask)], pa.int64()),
            "strs": pa.array([None if m else f"s{v}" for v, m in zip(vals, mask)], pa.string()),
            "floats": pa.array([None if m else float(v) for v, m in zip(vals, mask)], pa.float64()),
        }
    )
    roundtrip(t)


def test_nested_struct_and_list():
    n = 500
    t = pa.table(
        {
            "lst": pa.array([[int(x) for x in rng.integers(0, 100, int(l))] for l in rng.integers(0, 8, n)], pa.list_(pa.int32())),
            "st": pa.array([{"x": int(i), "y": f"v{i % 10}"} for i in range(n)], pa.struct([("x", pa.int64()), ("y", pa.string())])),
            "lst_str": pa.array([[f"w{int(x)}" for x in rng.integers(0, 50, int(l))] for l in rng.integers(0, 5, n)], pa.list_(pa.string())),
            "mp": pa.array(
                [[(f"k{j}", int(rng.integers(0, 100))) for j in range(int(rng.integers(0, 5)))] for _ in range(n)],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    roundtrip(t)


def test_empty_table_and_empty_strings():
    t = f1_corpus(5).slice(0, 0)
    roundtrip(t)
    t2 = pa.table({"s": pa.array(["", "a", "", "bb", ""])})
    roundtrip(t2)


def test_string_codec_selection_dictionary_rule():
    """dict ⇔ distinct/rows <= threshold — the [P7] probe rule at chunk level."""
    n = 10000
    lowcard = pa.table({"s": pa.array([f"src{i % 8}" for i in range(n)])})
    hdr = read_chunk_header(roundtrip(lowcard))
    assert hdr["columns"][0]["codec"] == "dict"

    unique_pref = pa.table({"s": pa.array([f"doc-{i:016d}" for i in range(n)])})
    hdr = read_chunk_header(roundtrip(unique_pref))
    assert hdr["columns"][0]["codec"] == "fsst"  # unique but shared prefix

    unique_rand = pa.table({"s": pa.array([rng.bytes(12).hex() for i in range(n)])})
    hdr = read_chunk_header(roundtrip(unique_rand))
    assert hdr["columns"][0]["codec"] in ("str", "fsst")  # must not regress badly
    # boundary: exactly at threshold -> dict; just above -> not dict
    opts = EncodeOptions(dictionary_key_size_threshold=0.5)
    half = pa.table({"s": pa.array([f"v{i}" for i in range(n // 2)] * 2)})
    hdr = read_chunk_header(encode_chunk(half, opts))
    assert hdr["columns"][0]["codec"] == "dict"


def test_projection_decodes_only_requested():
    t = f1_corpus(500)
    blob = encode_chunk(t)
    out = decode_chunk(blob, columns=["doc_id", "n_tok"])
    assert out.column_names == ["doc_id", "n_tok"]
    assert out.column("doc_id").combine_chunks().equals(t.column("doc_id").combine_chunks())


def test_unicode_strings():
    t = pa.table({"s": pa.array(["héllo", "日本語のテキスト", "🚀🚀", "", "mixed αβγ"] * 100)})
    roundtrip(t)


@pytest.mark.parametrize("strategy", ["speed", "compression"])
def test_strategies(strategy):
    t = f1_corpus(1000)
    roundtrip(t, EncodeOptions(strategy=strategy))


def test_size_beats_reference_orc_zstd():
    """Size target (BASELINE.md): ≤ ORC zstd on the same corpus — the
    compiled reference (pyarrow.orc, ORC C++ 2.0.0) is the live oracle."""
    import io

    import pyarrow.orc as po

    t = f1_corpus(20000)
    blob = encode_chunk(t, EncodeOptions(compression_level=6))
    sink = io.BytesIO()
    po.write_table(t, sink, compression="zstd", dictionary_key_size_threshold=0.8)
    orc_size = sink.tell()
    assert len(blob) <= orc_size * 1.02, f"ours {len(blob)} vs ORC zstd {orc_size}"


def test_per_column_compression_override():
    """column_compression: per-column second-stage codec — 'none' skips
    framing compression for that column only (self-describing per-buffer
    headers: readers need no knob), other columns keep the default."""
    import numpy as np

    rng = np.random.default_rng(5)
    # payload: high-entropy bytes (compression buys nothing, costs CPU)
    payload = pa.array([rng.bytes(512) for _ in range(200)], pa.binary())
    text = pa.array([f"the same compressible prefix {i % 9}" for i in range(200)])
    t = pa.table({"payload": payload, "text": text})

    default = encode_chunk(t, EncodeOptions())
    mixed = encode_chunk(
        t, EncodeOptions(column_compression={"payload": "none", "text": "lz4"})
    )
    assert decode_chunk(default).equals(t)
    assert decode_chunk(mixed).equals(t)
    # high-entropy payload framed as 'none' skips the zstd attempt: the
    # mixed blob can't be meaningfully larger, and text still compresses
    assert len(mixed) <= len(default) + 1024
    nothing = encode_chunk(t, EncodeOptions(compression="none"))
    assert len(mixed) < len(nothing)  # the text column IS still compressed

    # projection decode works on the mixed blob
    assert decode_chunk(mixed, columns=["text"]).equals(t.select(["text"]))


# ---------------------------------------------------------------------------
# round-5: byte-plane shuffled raw floats (codec "rawsh")

def test_rawsh_float_roundtrip_and_selection():
    """Large real-valued float streams take the shuffled raw lane by
    measurement; values (incl. NaN/inf/-0.0 and nulls) round-trip exactly
    and range decode slices correctly."""
    from orc_ray.chunk import read_chunk_header

    rng = np.random.default_rng(55)
    n = 70000
    f64 = rng.standard_normal(n) * 1e10
    f64[5], f64[6], f64[7] = np.nan, np.inf, -0.0
    nul = pa.array([None if i % 7 == 0 else float(i) * 0.1 for i in range(n)], pa.float64())
    small = pa.array(rng.standard_normal(1000).astype(np.float32))
    t = pa.table({"x": pa.array(f64), "nul": nul})
    blob = encode_chunk(t)
    codecs = {c["name"]: c["codec"] for c in read_chunk_header(memoryview(blob))["columns"]}
    assert codecs["x"] == "rawsh"  # gaussian f64: measured -29% on this shape
    out = decode_chunk(blob)
    for c in t.column_names:
        a, b = t.column(c).to_pylist(), out.column(c).to_pylist()
        assert all((x == y) or (x != x and y != y) for x, y in zip(a, b)), c
    # sub-threshold floats stay plain raw
    blob_s = encode_chunk(pa.table({"s": small}))
    assert read_chunk_header(memoryview(blob_s))["columns"][0]["codec"] == "raw"
    # range decode (full-decode+slice guard path)
    got = decode_chunk(blob, row_ranges=[(100, 200), (n - 100, n)])
    exp = pa.concat_tables([t.slice(100, 100), t.slice(n - 100, 100)])
    ga, ea = got.column("x").to_pylist(), exp.column("x").to_pylist()
    assert all((x == y) or (x != x and y != y) for x, y in zip(ga, ea))


def test_rawsh_list_float_child_and_size_win():
    """The embeddings shape: list<float32> children ride the shuffled lane
    and the chunk gets smaller than with the transform disabled."""
    import orc_ray.chunk as chunkmod
    from orc_ray.chunk import read_chunk_header

    rng = np.random.default_rng(56)
    vecs = rng.standard_normal((2000, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)  # unit vectors, like real embeddings
    emb = pa.table(
        {"vec_id": pa.array(np.arange(2000)), "embedding": pa.array(list(vecs))}
    )
    blob = encode_chunk(emb)
    hdr = read_chunk_header(memoryview(blob))
    child = {c["name"]: c.get("child", {}).get("codec") for c in hdr["columns"]}
    assert child["embedding"] == "rawsh"
    assert decode_chunk(blob).column("embedding").to_pylist() == emb.column("embedding").to_pylist()
    # the measured win is real: disabling the probe costs size
    orig = chunkmod._raw_shuffle_wins
    chunkmod._raw_shuffle_wins = lambda raw, isz: False
    try:
        plain = encode_chunk(emb)
    finally:
        chunkmod._raw_shuffle_wins = orig
    assert len(blob) < 0.97 * len(plain)


def test_reader_accepts_v4_chunks():
    """Forward-read guarantee: v4 chunks (all pre-SHUF layouts) stay
    decodable by the v5 reader; v3 and unknown future versions are
    refused loudly.  A sub-probe-floor chunk's bytes are identical to
    what the v4 writer produced for the same data except the header
    version field, so patching it reconstructs a faithful v4 blob."""
    import json as _json
    import struct

    from orc_ray.chunk import FORMAT_VERSION

    rng = np.random.default_rng(91)
    t = pa.table(
        {"k": pa.array(np.arange(2000)), "v": pa.array(rng.integers(0, 10**6, 2000))}
    )
    blob = bytearray(encode_chunk(t))
    (hlen,) = struct.unpack_from("<I", blob, 5)
    hdr = bytes(blob[9 : 9 + hlen])
    assert f'"v":{FORMAT_VERSION}'.encode() in hdr

    def patched(v: int) -> bytes:
        out = bytearray(blob)
        out[9 : 9 + hlen] = hdr.replace(
            f'"v":{FORMAT_VERSION}'.encode(), f'"v":{v}'.encode(), 1
        )
        return bytes(out)

    assert decode_chunk(patched(4)).equals(t)  # v4 reads
    for bad in (3, FORMAT_VERSION + 1):
        with pytest.raises(ValueError, match="reader-supported"):
            decode_chunk(patched(bad))
