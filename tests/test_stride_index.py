"""Sub-chunk row-group index (RowIndexEntry / seekToRowGroup analog,
apache/orc c++/src/ColumnWriter.cc:~200-260, ColumnReader.cc
PositionProvider + sargs/SargsApplier.cc pickRowGroups): a selective
predicate inside a matching 16k-row chunk decodes only the 2048-row
strides whose min/max can match, verified by the block-decode counter."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from orc_ray.chunk import STRIDE_ROWS, decode_chunk, encode_chunk, read_chunk_header
from orc_ray.codecs import intcodec
from orc_ray.pipeline.decode import _stride_ranges


def _mktable(n=16384, seed=7):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)  # sorted -> tight per-stride min/max
    vals = rng.integers(0, 1000, n, dtype=np.int32)
    floats = np.round(rng.uniform(0, 100, n), 2)
    strs = np.array([f"doc-{i:08d}" for i in range(n)])
    small = np.array(["ab", "cd", "ef", "gh"])[rng.integers(0, 4, n)]  # dict codec
    return pa.table(
        {
            "id": pa.array(ids),
            "val": pa.array(vals),
            "price": pa.array(floats),
            "name": pa.array(strs),
            "tag": pa.array(small),
        }
    )


def _reset_stats():
    intcodec.DECODE_STATS["blocks_decoded"] = 0
    intcodec.DECODE_STATS["blocks_total"] = 0


def test_header_carries_stride_stats():
    t = _mktable()
    hdr = read_chunk_header(encode_chunk(t))
    cols = {c["name"]: c for c in hdr["columns"]}
    st = cols["id"]["stride"]
    ns = (t.num_rows + STRIDE_ROWS - 1) // STRIDE_ROWS
    assert st["rows"] == STRIDE_ROWS and len(st["mins"]) == ns
    assert st["mins"][0] == 0 and st["maxs"][0] == STRIDE_ROWS - 1
    # string stride stats too
    assert "stride" in cols["name"]
    assert cols["name"]["stride"]["mins"][0] == "doc-00000000"


def test_stride_ranges_pruning_and_merge():
    t = _mktable()
    hdr = read_chunk_header(encode_chunk(t))
    # one stride survives
    r = _stride_ranges(hdr, [("id", "==", 5000)])
    assert r == [(2 * STRIDE_ROWS, 3 * STRIDE_ROWS)]
    # adjacent strides merge into one range
    r = _stride_ranges(hdr, [("id", "between", 1000, 5000)])
    assert r == [(0, 3 * STRIDE_ROWS)]
    # nothing survives
    assert _stride_ranges(hdr, [("id", ">", 10**9)]) == []
    # everything survives -> None (full decode path)
    assert _stride_ranges(hdr, [("val", ">=", 0)]) is None
    # string predicate prunes too
    r = _stride_ranges(hdr, [("name", "==", "doc-00005000")])
    assert r == [(2 * STRIDE_ROWS, 3 * STRIDE_ROWS)]


def test_range_decode_matches_full_and_skips_blocks():
    t = _mktable()
    blob = encode_chunk(t)
    hdr = read_chunk_header(blob)
    ranges = _stride_ranges(hdr, [("id", "between", 4000, 4500)])
    assert ranges == [(STRIDE_ROWS, 3 * STRIDE_ROWS)]
    _reset_stats()
    part = decode_chunk(blob, row_ranges=ranges, header=hdr)
    assert intcodec.DECODE_STATS["blocks_decoded"] < intcodec.DECODE_STATS["blocks_total"]
    full = decode_chunk(blob)
    exp = full.slice(STRIDE_ROWS, 2 * STRIDE_ROWS)
    assert part.equals(exp)
    # residual exact filter over the partial decode == filter over full
    m = pc.and_(pc.greater_equal(part["id"], 4000), pc.less_equal(part["id"], 4500))
    assert part.filter(m).equals(
        full.filter(pc.and_(pc.greater_equal(full["id"], 4000), pc.less_equal(full["id"], 4500)))
    )


def test_range_decode_with_nulls_and_all_codecs():
    n = 3 * STRIDE_ROWS
    rng = np.random.default_rng(3)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 100, n, dtype=np.int64)
    t = pa.table(
        {
            "id": pa.array(ids),
            "v": pa.array(vals, type=pa.int64()).take(
                pa.array(np.arange(n), mask=(ids % 7 == 0))  # every 7th null
            ),
            "s": pa.array([f"x{i % 100}" for i in range(n)]),  # dict
            "u": pa.array([f"unique-string-value-{i}" for i in range(n)]),
            "f": pa.array(rng.uniform(size=n)),
            "lst": pa.array([[int(i), int(i + 1)] for i in range(n)]),
        }
    )
    blob = encode_chunk(t)
    ranges = [(100, 2100), (4096, 5000)]
    part = decode_chunk(blob, row_ranges=ranges)
    exp = pa.concat_tables([t.slice(100, 2000), t.slice(4096, 904)])
    assert part.num_rows == exp.num_rows
    for col in t.column_names:
        assert part.column(col).combine_chunks().equals(
            exp.column(col).combine_chunks()
        ), col


def test_decode_dataset_stride_prunes_end_to_end(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    t = _mktable(n=20000)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src)
    out = str(tmp_path / "store")
    encode_dataset(str(src), out, batch_size=20000)
    ds = decode_dataset(out, predicates=[("id", "between", 3000, 3100)])
    got = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    )
    exp = t.filter(pc.and_(pc.greater_equal(t["id"], 3000), pc.less_equal(t["id"], 3100)))
    assert got.sort_by("id").equals(exp.sort_by("id"))
    # a predicate matching nothing inside the (matching-at-chunk-level)
    # chunk returns empty without error
    ds2 = decode_dataset(out, predicates=[("id", "==", 3), ("val", "<", -1)])
    parts = [b for b in ds2.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    assert not parts


def test_float_stats_and_stride_pruning():
    """Float columns record min/max (+stride) so predicates prune; NaN
    columns record none (comparisons with NaN are poison)."""
    n = 3 * STRIDE_ROWS
    v = np.round(np.linspace(0.0, 100.0, n), 7)  # non-decimal-scale floats
    t = pa.table({"f": pa.array(v), "g": pa.array(np.where(np.arange(n) == 5, np.nan, 1.0))})
    blob = encode_chunk(t)
    hdr = read_chunk_header(blob)
    cols = {c["name"]: c for c in hdr["columns"]}
    assert cols["f"]["min"] == 0.0 and cols["f"]["max"] == 100.0
    assert "stride" in cols["f"]
    assert "min" not in cols["g"]  # NaN present -> no stats
    r = _stride_ranges(hdr, [("f", "<", 30.0)])
    assert r == [(0, STRIDE_ROWS)]
    part = decode_chunk(blob, row_ranges=r, header=hdr)
    full = decode_chunk(blob).slice(0, STRIDE_ROWS)
    for c in part.column_names:  # equal_nan: Table.equals treats NaN != NaN
        assert np.array_equal(
            part.column(c).to_numpy(), full.column(c).to_numpy(), equal_nan=True
        ), c


def test_float_nulls_stats_stay_conservative():
    vals = pa.array([5.125, None, 9.875, 7.0625])  # raw path (not fdec-scaled)
    t = pa.table({"f": vals})
    hdr = read_chunk_header(encode_chunk(t))
    (c,) = hdr["columns"]
    # null filled as 0 widens min downward — conservative, never over-prunes
    assert c["min"] <= 5.125 and c["max"] == 9.875


def test_str_range_decode_skips_framing_blocks():
    """String columns decode only the framing blocks surviving strides
    touch (lengths stream + decompress_ranges), not the whole DATA buffer."""
    from orc_ray.chunk import EncodeOptions
    from orc_ray.codecs import framing

    import hashlib

    n = 4 * STRIDE_ROWS
    ids = np.arange(n, dtype=np.int64)
    # high-entropy bodies so codec selection lands on "str", not fsst/dict
    texts = pa.array(
        [hashlib.sha256(str(i).encode()).hexdigest() * 3 for i in range(n)]
    )
    t = pa.table({"id": pa.array(ids), "text": texts})
    opts = EncodeOptions(
        compression_block_size=64 * 1024,  # many blocks
        column_codecs={"text": "str"},  # pin direct (fsst has no range path)
    )
    blob = encode_chunk(t, opts)
    hdr = read_chunk_header(blob)
    assert {c["name"]: c["codec"] for c in hdr["columns"]}["text"] == "str"
    ranges = _stride_ranges(hdr, [("id", "between", 100, 200)])
    assert ranges == [(0, STRIDE_ROWS)]
    framing.RANGE_STATS["blocks_decompressed"] = 0
    framing.RANGE_STATS["blocks_total"] = 0
    part = decode_chunk(blob, row_ranges=ranges, header=hdr)
    assert framing.RANGE_STATS["blocks_total"] > 0
    assert framing.RANGE_STATS["blocks_decompressed"] < framing.RANGE_STATS["blocks_total"]
    assert part.equals(decode_chunk(blob).slice(0, STRIDE_ROWS))
    # multi-range + nulls correctness
    t2 = pa.table(
        {
            "id": pa.array(ids),
            "text": texts.take(pa.array(np.arange(n), mask=(ids % 5 == 0))),
        }
    )
    blob2 = encode_chunk(t2, opts)
    r2 = [(10, 2100), (4096, 6000)]
    part2 = decode_chunk(blob2, row_ranges=r2)
    exp2 = pa.concat_tables([t2.slice(10, 2090), t2.slice(4096, 1904)])
    assert part2.column("text").combine_chunks().equals(exp2.column("text").combine_chunks())


def test_stride_rows_option(ray_session, tmp_path):
    """rowIndexStride analog: a finer stride_rows yields more stride
    entries per chunk and at least as tight pruning."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orc_ray.chunk import EncodeOptions, read_chunk_header
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    t = pa.table({"k": np.arange(8192, dtype=np.int64), "v": np.arange(8192) % 7})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)

    import os

    stores = {}
    for rows in (2048, 256):
        out = str(tmp_path / f"s{rows}")
        encode_dataset([src], out, EncodeOptions(stride_rows=rows), batch_size=8192)
        cf = sorted(os.listdir(os.path.join(out, "chunks")))[0]
        hdr = read_chunk_header(open(os.path.join(out, "chunks", cf), "rb").read())
        kcol = next(c for c in hdr["columns"] if c["name"] == "k")
        assert kcol["stride"]["rows"] == rows
        assert len(kcol["stride"]["mins"]) == 8192 // rows
        stores[rows] = out

    # both decode the point lookup correctly; the finer stride decodes too
    for rows, out in stores.items():
        got = pa.concat_tables(
            decode_dataset(out, predicates=[("k", "==", 5000)]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        assert got.num_rows == 1 and got.column("k")[0].as_py() == 5000
