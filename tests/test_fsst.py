"""FSST codec unit tests (paper: Boncz/Neumann/Freitag, VLDB 2020) —
mirrors FIXTURES.md F3 string matrix."""

import numpy as np
import pytest

from orc_ray.codecs import fsst


def to_concat(strings):
    bs = [s.encode() if isinstance(s, str) else s for s in strings]
    concat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    return concat, offsets


def roundtrip(strings):
    concat, offsets = to_concat(strings)
    table = fsst.train(concat, offsets)
    codes, lits = fsst.encode(concat, offsets, table)
    out = fsst.decode(codes, lits, table)
    np.testing.assert_array_equal(out, concat)
    return codes.size + lits.size + len(fsst.serialize_table(table)), concat.size


def test_doc_id_prefix_compression():
    size, raw = roundtrip([f"doc-{i:016d}" for i in range(20000)])
    assert raw / size > 2.5  # shared prefixes compress well


def test_random_hex_no_blowup():
    rng = np.random.default_rng(9)
    size, raw = roundtrip([bytes(rng.integers(97, 123, 16, dtype=np.uint8)).decode() for _ in range(3000)])
    assert size < raw * 1.1  # must not regress vs raw


def test_empty_strings_and_unicode():
    roundtrip([])
    roundtrip([""])
    roundtrip(["", "a", "", ""])
    roundtrip(["héllo wörld", "日本語テキスト", "🚀" * 40, ""])


def test_long_and_mixed():
    roundtrip(["x" * 5000, "", "short", "y" * 100])


def test_table_serialization_roundtrip():
    concat, offsets = to_concat([f"val-{i % 50}" for i in range(2000)])
    t = fsst.train(concat, offsets)
    blob = fsst.serialize_table(t)
    t2, consumed = fsst.deserialize_table(blob)
    assert consumed == len(blob)
    assert t2.symbols == t.symbols
    codes, lits = fsst.encode(concat, offsets, t)
    out = fsst.decode(codes, lits, t2)  # decode with round-tripped table
    np.testing.assert_array_equal(out, concat)


def test_deterministic_training():
    concat, offsets = to_concat([f"doc-{i:010d}" for i in range(5000)])
    t1 = fsst.train(concat, offsets)
    t2 = fsst.train(concat, offsets)
    assert t1.symbols == t2.symbols  # retried partitions must be identical


def test_all_byte_values():
    rng = np.random.default_rng(4)
    data = [bytes(rng.integers(0, 256, 200, dtype=np.uint8)) for _ in range(100)]
    roundtrip(data)
