"""CSV / JSON-lines import (orc-tools csv-import / json-import analogs:
tools/src/java/org/apache/orc/tools/convert/{CsvReader,JsonReader}.java).

The schema-string grammar is TypeDescription.fromString's flat-struct
subset; char(n)/varchar(n) must land as write-side pad/truncate
(EncodeOptions.char_specs), and typed columns must round-trip the chunk
store bit-exact.
"""

import json

import pyarrow as pa
import pytest

from orc_ray.__main__ import main
from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.orcio import parse_type_spec, read_csv, read_jsonl


def test_parse_type_spec_grammar():
    types, chars = parse_type_spec(
        "struct<a:int,b:char(3),c:decimal(10,2),d:timestamp,e:varchar(5),f:bigint>"
    )
    assert types["a"] == pa.int32()
    assert types["b"] == pa.string() and chars["b"] == "char(3)"
    assert types["c"] == pa.decimal128(10, 2)
    assert types["d"] == pa.timestamp("us")
    assert chars["e"] == "varchar(5)"
    assert types["f"] == pa.int64()
    # bare shorthand, no struct<> wrapper
    t2, _ = parse_type_spec("x:double,y:date,z:boolean")
    assert t2 == {"x": pa.float64(), "y": pa.date32(), "z": pa.bool_()}
    with pytest.raises(ValueError):
        parse_type_spec("a:array<int>")
    with pytest.raises(ValueError):
        parse_type_spec("a:frobnicate")
    with pytest.raises(ValueError):
        parse_type_spec("struct<a:int")


def _csv_dir(tmp_path):
    d = tmp_path / "csv"
    d.mkdir()
    (d / "part0.csv").write_text(
        "id,name,qty,price,ts\n"
        "1,alpha,10,1.50,2024-01-01T00:00:00\n"
        "2,bee,20,2.25,2024-01-02T12:30:00\n"
    )
    (d / "part1.csv").write_text(
        "id,name,qty,price,ts\n"
        "3,gamma-long,30,3.75,2024-02-01T06:00:00\n"
    )
    return str(d)


def test_import_csv_typed_roundtrip(ray_session, tmp_path, capsys):
    src = _csv_dir(tmp_path)
    store = str(tmp_path / "store")
    rc = main([
        "import-csv", src, store,
        "--schema", "struct<id:bigint,name:char(5),qty:int,price:decimal(10,2),ts:timestamp>",
        "--batch-size", "2",
    ])
    assert rc == 0
    totals = json.loads(capsys.readouterr().out)
    assert totals["rows"] == 3

    t = decode_dataset(store).take_all()
    rows = sorted(t, key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3]
    # char(5): 'bee' padded, 'gamma-long' truncated — write-side enforcement
    assert [r["name"] for r in rows] == ["alpha", "bee  ", "gamma"]
    assert [str(r["price"]) for r in rows] == ["1.50", "2.25", "3.75"]
    assert rows[0]["ts"].year == 2024


def test_import_csv_projection(ray_session, tmp_path, capsys):
    src = _csv_dir(tmp_path)
    store = str(tmp_path / "store2")
    assert main(["import-csv", src, store, "--columns", "id,qty"]) == 0
    capsys.readouterr()
    t = pa.Table.from_pylist(decode_dataset(store).take_all())
    assert sorted(t.column_names) == ["id", "qty"]
    assert sorted(t.column("qty").to_pylist()) == [10, 20, 30]


def test_import_jsonl_roundtrip(ray_session, tmp_path, capsys):
    d = tmp_path / "jl"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": "d1", "n": 5, "tags": ["x", "y"]}\n'
        '{"doc_id": "d2", "n": 7, "tags": []}\n'
    )
    store = str(tmp_path / "store3")
    assert main(["import-jsonl", str(d), store]) == 0
    totals = json.loads(capsys.readouterr().out)
    assert totals["rows"] == 2
    rows = sorted(decode_dataset(store).take_all(), key=lambda r: r["doc_id"])
    assert [r["n"] for r in rows] == [5, 7]
    assert list(rows[0]["tags"]) == ["x", "y"] and list(rows[1]["tags"]) == []


def test_read_csv_is_lazy_and_typed(ray_session, tmp_path):
    src = _csv_dir(tmp_path)
    ds, chars = read_csv(src, schema="id:bigint,name:varchar(4),qty:int,price:double,ts:timestamp")
    assert chars == {"name": "varchar(4)"}
    sch = ds.schema()
    idx = sch.names.index("qty")
    assert str(sch.types[idx]) == "int32"
    assert ds.count() == 3


def test_read_jsonl_projection(ray_session, tmp_path):
    d = tmp_path / "jl2"
    d.mkdir()
    (d / "b.ndjson").write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    ds = read_jsonl(str(d), columns=["a"])
    assert ds.schema().names == ["a"]
    assert sorted(r["a"] for r in ds.take_all()) == [1, 2]


def test_export_csv_cli_roundtrip(ray_session, tmp_path, capsys):
    """store -> export-csv -> import-csv -> identical values (doubles too)."""
    import numpy as np
    import pyarrow.parquet as pq

    from orc_ray.pipeline.encode import encode_dataset

    rng = np.random.default_rng(7)
    t = pa.table({
        "k": np.arange(500, dtype=np.int64),
        "v": rng.uniform(0, 1e6, 500),  # shortest-roundtrip floats
        "s": [f"row-{i}" for i in range(500)],
    })
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=128)

    out = str(tmp_path / "csvout")
    assert main(["export-csv", store, out]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["rows"] == 500 and rec["parts"] >= 1

    store2 = str(tmp_path / "store2")
    assert main(["import-csv", out, store2,
                 "--schema", "k:bigint,v:double,s:string"]) == 0
    capsys.readouterr()
    back = pa.Table.from_pylist(decode_dataset(store2).take_all()).sort_by("k")
    assert back.column("k").to_pylist() == t.column("k").to_pylist()
    assert back.column("v").to_numpy().tolist() == t.column("v").to_numpy().tolist()
    assert back.column("s").to_pylist() == t.column("s").to_pylist()


def test_csv_roundtrip_nasty_strings(ray_session, tmp_path):
    """Quoting-hostile content (commas, quotes, newlines, unicode, leading
    zeros kept as strings) must survive write_csv_parts -> read_csv."""
    import ray

    from orc_ray.pipeline.orcio import read_csv, write_csv_parts

    vals = [
        'plain', 'comma,inside', 'quote "double" marks', "single ' quote",
        'line\nbreak', 'tab\there', 'unicode é中文\U0001f600',
        '  padded  ', '', '0042', '-', '\\backslash\\', '"fully quoted"',
    ]
    t = pa.table({
        "k": pa.array(range(len(vals)), pa.int64()),
        "s": pa.array(vals, pa.string()),
    })
    out = str(tmp_path / "nasty")
    write_csv_parts(ray.data.from_arrow(t), out)
    ds, _ = read_csv(out, schema="k:bigint,s:string")
    back = pa.Table.from_pylist(ds.take_all()).sort_by("k")
    assert back.column("s").to_pylist() == vals


def test_type_spec_property_roundtrip():
    """Render->parse round-trip over the full flat-struct grammar."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalar = st.sampled_from(
        ["boolean", "tinyint", "smallint", "int", "bigint", "float",
         "double", "string", "binary", "date", "timestamp"]
    )
    decimal = st.tuples(st.integers(1, 38), st.integers(0, 10)).map(
        lambda ps: f"decimal({ps[0]},{min(ps[1], ps[0])})"
    )
    sized = st.tuples(st.sampled_from(["char", "varchar"]), st.integers(1, 999)).map(
        lambda kn: f"{kn[0]}({kn[1]})"
    )
    name = st.from_regex(r"[a-z][a-z0-9_]{0,15}", fullmatch=True)
    fields = st.dictionaries(name, st.one_of(scalar, decimal, sized),
                             min_size=1, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(fields=fields, wrap=st.booleans())
    def check(fields, wrap):
        body = ",".join(f"{n}:{t}" for n, t in fields.items())
        spec = f"struct<{body}>" if wrap else body
        types, chars = parse_type_spec(spec)
        assert set(types) == set(fields)
        for n, t in fields.items():
            if t.startswith(("char(", "varchar(")):
                assert types[n] == pa.string() and chars[n] == t
            elif t.startswith("decimal("):
                p, s = t[8:-1].split(",")
                assert types[n] == pa.decimal128(int(p), int(s))
            else:
                assert n not in chars

    check()
