"""Schema-evolution conversion matrix (ConvertColumnReader analog,
apache/orc c++/src/ConvertColumnReader.cc + java
ConvertTreeReaderFactory): lossy values become NULL instead of failing
the read; floats truncate toward zero; decimals truncate extra digits."""

import decimal

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.convert import convert_column, convert_table


def _vals(arr):
    return arr.to_pylist()


# ---- numeric <-> numeric


def test_integer_widening_and_narrowing():
    a = pa.array([1, -2, 127, 128, -129, None], pa.int32())
    assert _vals(convert_column(a, pa.int64())) == [1, -2, 127, 128, -129, None]
    # narrowing: out-of-range -> null (ORC range check)
    assert _vals(convert_column(a, pa.int8())) == [1, -2, 127, None, None, None]
    # signed -> unsigned: negatives null
    assert _vals(convert_column(a, pa.uint16())) == [1, None, 127, 128, None, None]


def test_float_to_int_truncates_toward_zero_nan_nulls():
    a = pa.array([1.9, -1.9, 2.0, float("nan"), float("inf"), 1e20, None], pa.float64())
    got = _vals(convert_column(a, pa.int32()))
    assert got == [1, -1, 2, None, None, None, None]


def test_int_to_float():
    a = pa.array([1, 2**60, -5, None], pa.int64())
    got = _vals(convert_column(a, pa.float64()))
    assert got == [1.0, float(2**60), -5.0, None]


# ---- string <-> numeric


def test_string_to_int_unparseable_nulls():
    a = pa.array(["42", " 7", "abc", "", "3.9", None, "99999999999999999999"])
    got = _vals(convert_column(a, pa.int64()))
    assert got[0] == 42 and got[1] == 7
    assert got[2] is None and got[3] is None
    assert got[4] == 3  # float-looking string truncates like ORC double->long
    assert got[5] is None
    assert got[6] is None  # > int64 range


def test_string_to_double():
    a = pa.array(["1.5", "-0.25", "nope", None])
    assert _vals(convert_column(a, pa.float64())) == [1.5, -0.25, None, None]


def test_numeric_to_string():
    assert _vals(convert_column(pa.array([1, None, -3]), pa.string())) == ["1", None, "-3"]
    assert _vals(convert_column(pa.array([1.5]), pa.string())) == ["1.5"]


# ---- string <-> timestamp / date


def test_string_to_timestamp_and_back():
    a = pa.array(["2024-01-02 03:04:05", "not a date", None])
    got = convert_column(a, pa.timestamp("us"))
    assert got[0].as_py().isoformat() == "2024-01-02T03:04:05"
    assert got[1].as_py() is None and got[2].as_py() is None
    back = convert_column(got, pa.string())
    assert back[0].as_py().startswith("2024-01-02")


def test_timestamp_unit_narrowing():
    v = pa.array([1_700_000_000_123_456_789], pa.int64()).cast(pa.timestamp("ns"))
    got = convert_column(v, pa.timestamp("s"))
    assert got[0].as_py().isoformat() == "2023-11-14T22:13:20"


# ---- decimal


def test_decimal_rescale_widen_and_truncate():
    a = pa.array([decimal.Decimal("12.34"), None], pa.decimal128(10, 2))
    wide = convert_column(a, pa.decimal128(20, 4))
    assert _vals(wide) == [decimal.Decimal("12.3400"), None]
    narrow = convert_column(a, pa.decimal128(10, 1))
    assert _vals(narrow) == [decimal.Decimal("12.3"), None]  # truncated digits


def test_decimal_to_double_and_int():
    a = pa.array([decimal.Decimal("12.34")], pa.decimal128(10, 2))
    assert _vals(convert_column(a, pa.float64())) == [12.34]
    assert _vals(convert_column(a, pa.int64())) == [12]


def test_double_to_decimal():
    a = pa.array([1.25], pa.float64())
    got = convert_column(a, pa.decimal128(10, 2))
    assert _vals(got) == [decimal.Decimal("1.25")]


# ---- boolean


def test_bool_conversions():
    assert _vals(convert_column(pa.array([0, 1, 5, None]), pa.bool_())) == [False, True, True, None]
    assert _vals(convert_column(pa.array([True, False]), pa.int32())) == [1, 0]


# ---- table-level + end-to-end through the decode pipeline


def test_convert_table_multi_column():
    t = pa.table({"a": pa.array(["1", "x"]), "b": pa.array([1.9, -2.9])})
    out = convert_table(t, {"a": pa.int32(), "b": pa.int64()})
    assert out.column("a").to_pylist() == [1, None]
    assert out.column("b").to_pylist() == [1, -2]


def test_decode_dataset_cast_schema_forgiving(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    t = pa.table(
        {
            "id": pa.array(np.arange(1000, dtype=np.int64)),
            "big": pa.array(np.where(np.arange(1000) % 2 == 0, 10, 2**40)),
            "s": pa.array([str(i) if i % 3 else "bad" for i in range(1000)]),
        }
    )
    pq.write_table(t, tmp_path / "in.parquet")
    out = str(tmp_path / "store")
    encode_dataset(str(tmp_path / "in.parquet"), out)
    ds = decode_dataset(out, cast_schema={"big": pa.int32(), "s": pa.int64()})
    got = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("id")
    assert got.column("big").null_count == 500  # 2**40 overflows int32 -> null
    assert got.column("big").to_pylist()[0] == 10
    assert got.column("s").to_pylist()[:4] == [None, 1, 2, None]  # "bad" -> null
    assert got.schema.field("big").type == pa.int32()
    assert got.schema.field("s").type == pa.int64()


def test_char_varchar_reader_semantics():
    """CHAR(n)/VARCHAR(n) — the two ORC types with no Arrow analog — as
    read-time conversions: truncate to n; CHAR space-pads to exactly n."""
    import pyarrow as pa

    from orc_ray.convert import convert_column, convert_table

    arr = pa.array(["abcdef", "ab", "", None, "exact"])
    vc = convert_column(arr, "varchar(4)")
    assert vc.to_pylist() == ["abcd", "ab", "", None, "exac"]
    ch = convert_column(arr, "char(4)")
    assert ch.to_pylist() == ["abcd", "ab  ", "    ", None, "exac"]
    # via the table-level reader schema, mixed with an Arrow target
    t = pa.table({"s": arr, "n": pa.array([1, 2, 3, 4, 5])})
    out = convert_table(t, {"s": "char(3)", "n": pa.int16()})
    assert out.column("s").to_pylist() == ["abc", "ab ", "   ", None, "exa"]
    assert out.column("n").type == pa.int16()
    # non-string input converts through its string form
    num = convert_column(pa.array([123456, 7]), "varchar(3)")
    assert num.to_pylist() == ["123", "7"]


def test_char_varchar_write_side_enforcement():
    """Write-side CHAR/VARCHAR (EncodeOptions.char_specs — the reference
    enforces at write, ColumnWriter.cc ≈1700): the STORED values already
    carry the pad/truncate semantics, so a plain decode equals what the
    read-time conversion produces."""
    import pyarrow as pa

    from orc_ray.chunk import EncodeOptions, decode_chunk, encode_chunk
    from orc_ray.convert import convert_column

    arr = pa.array(["abcdef", "ab", "", None, "exact"] * 20)
    t = pa.table({"c": arr, "v": arr, "plain": arr})
    opts = EncodeOptions(char_specs={"c": "char(4)", "v": "varchar(4)"})
    back = decode_chunk(encode_chunk(t, opts))
    assert back.column("c").to_pylist() == convert_column(arr, "char(4)").to_pylist()
    assert back.column("v").to_pylist() == convert_column(arr, "varchar(4)").to_pylist()
    assert back.column("plain").to_pylist() == arr.to_pylist()  # untouched

    # a spec naming an absent column must raise, not silently no-op
    import pytest

    with pytest.raises(ValueError):
        encode_chunk(t, EncodeOptions(char_specs={"typo": "char(4)"}))
