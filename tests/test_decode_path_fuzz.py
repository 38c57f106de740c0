"""Seeded fuzz over the decode-path feature matrix: random projections
(incl. nested struct subtrees), random predicates, and encoded-vector
mode, all cross-checked against pure-Arrow filtering of the source
table.  Catches interaction bugs none of the single-feature suites can
(e.g. subtree projection x stride pruning x dictionary codes)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.encode import encode_dataset


@pytest.fixture(scope="module", params=["0.12", "0.11", "0.12-shuf"])
def fuzz_store(request, tmp_path_factory, ray_session):
    rng = np.random.default_rng(77)
    n = 6000
    t = pa.table(
        {
            "k": np.arange(n, dtype=np.int64),
            "cat": pa.array([f"c{i}" if i % 5 else None for i in rng.integers(0, 12, n)]),
            "txt": pa.array([f"row text {i}" for i in range(n)]),
            "val": rng.normal(scale=100, size=n),
            "tok": pa.array((rng.zipf(1.3, n) % 50257).astype(np.int32)),
            "s": pa.StructArray.from_arrays(
                [pa.array(rng.integers(0, 1000, n)),
                 pa.array([f"tag-{i % 7}" for i in range(n)])],
                names=["a", "b"],
            ),
        }
    )
    src = str(tmp_path_factory.mktemp("fzsrc") / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path_factory.mktemp("fzstore"))
    # all three write lanes run the whole matrix: v0.11 integer streams
    # (RLEv1-analog layout) and the v5 byte-shuffled layouts (one
    # 6000-row chunk puts the zipf/gaussian streams over the SHUF probe
    # floor) must survive every projection x predicate x encoded-vector
    # combination through the same reader dispatch
    from orc_ray.chunk import EncodeOptions

    version, _, lane = request.param.partition("-")
    encode_dataset(
        [src], out, EncodeOptions(file_version=version),
        batch_size=6000 if lane == "shuf" else 1500,
    )
    if lane == "shuf":  # the lane must actually engage, or the param lies
        import glob as _glob
        import json as _json
        import struct as _struct

        from orc_ray.codecs.intcodec import INT_BLOCKS32_SHUF

        p = _glob.glob(out + "/chunks/*.oray")[0]
        with open(p, "rb") as f:
            head = f.read(9)
            (hlen,) = _struct.unpack_from("<I", head, 5)
            hdr = _json.loads(f.read(hlen))
        codecs = {c["name"]: c.get("codec") for c in hdr["columns"]}
        assert codecs["val"] == "rawsh", codecs
    return out, t


def _collect(ds) -> pa.Table:
    parts = [p for p in ds.iter_batches(batch_format="pyarrow", batch_size=None) if p.num_rows]
    return pa.concat_tables(parts).combine_chunks() if parts else pa.table({})


def _ref_mask(t: pa.Table, pred):
    col, op, *args = pred
    c = t.column(col)
    if op == "==":
        return pc.equal(c, args[0])
    if op == "<":
        return pc.less(c, args[0])
    if op == ">":
        return pc.greater(c, args[0])
    if op == "between":
        return pc.and_(pc.greater_equal(c, args[0]), pc.less_equal(c, args[1]))
    if op == "startswith":
        return pc.starts_with(c, pattern=args[0])
    raise AssertionError(op)


PRED_POOL = [
    None,
    [("k", "<", 1234)],
    [("k", "between", 700, 3200)],
    [("cat", "==", "c7")],
    [("txt", "startswith", "row text 12")],
    [("k", ">", 4000), ("cat", "==", "c3")],
]

PROJ_POOL = [
    None,
    ["k", "val"],
    ["k", "cat", "txt"],
    ["k", "s.a"],
    ["k", "s.b", "cat"],
    ["k", "s"],
]


@pytest.mark.parametrize("pi", range(len(PROJ_POOL)))
@pytest.mark.parametrize("qi", range(len(PRED_POOL)))
def test_decode_matrix(fuzz_store, pi, qi):
    out, t = fuzz_store
    proj, preds = PROJ_POOL[pi], PRED_POOL[qi]
    # encoded vectors only when no dotted projection conflicts arise
    enc = (pi + qi) % 2 == 0

    got = _collect(
        decode_dataset(out, columns=proj, predicates=preds, encoded_vectors=enc)
    )

    ref = t
    if preds:
        m = None
        for p in preds:
            mm = _ref_mask(t, p)
            m = mm if m is None else pc.and_(m, mm)
        ref = t.filter(m)
    assert got.num_rows == ref.num_rows
    if got.num_rows == 0:
        return
    got = got.sort_by("k")
    ref = ref.sort_by("k") if "k" in ref.column_names else ref
    # value fidelity on a per-column basis (cast dictionary back to flat)
    tops = [c.partition(".")[0] for c in (proj or t.column_names)]
    for name in dict.fromkeys(tops):
        g = got.column(name).combine_chunks()
        if pa.types.is_dictionary(g.type):
            g = g.cast(g.type.value_type)
        r = ref.column(name).combine_chunks()
        if pa.types.is_struct(g.type) and proj:
            sel = [c.split(".", 1)[1] for c in proj if c.startswith(f"{name}.")]
            if sel:
                for child in sel:
                    assert g.field(child).equals(r.field(child)), (name, child)
                continue
        assert g.equals(r), name
