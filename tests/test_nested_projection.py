"""Nested-subtree projection (RowReaderOptions nested-include analog —
apache/orc c++/src/Options.hh include-by-subtree): `columns=["s.a"]`
decompresses and decodes ONLY the named struct children; the output
struct carries only those fields."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.encode import encode_dataset


@pytest.fixture(scope="module")
def nested_store(tmp_path_factory, ray_session):
    n = 5000
    t = pa.table(
        {
            "k": np.arange(n, dtype=np.int64),
            "s": pa.StructArray.from_arrays(
                [
                    pa.array(np.arange(n, dtype=np.int64)),
                    pa.array([f"name-{i % 11}" for i in range(n)]),
                    pa.array(np.arange(n) * 0.5),
                ],
                names=["a", "b", "c"],
            ),
        }
    )
    src = str(tmp_path_factory.mktemp("nsrc") / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path_factory.mktemp("nstore"))
    encode_dataset([src], out, batch_size=2048)
    return out, t


def _collect(ds) -> pa.Table:
    parts = [p for p in ds.iter_batches(batch_format="pyarrow", batch_size=None) if p.num_rows]
    return pa.concat_tables(parts).combine_chunks()


def test_subtree_projection_values_and_schema(nested_store):
    out, t = nested_store
    got = _collect(decode_dataset(out, columns=["k", "s.a", "s.c"])).sort_by("k")
    assert [f.name for f in got.schema.field("s").type] == ["a", "c"]
    s = got.column("s").combine_chunks()
    ref = t.column("s").combine_chunks()
    assert s.field("a").equals(ref.field("a"))
    assert s.field("c").equals(ref.field("c"))


def test_whole_struct_wins_over_dotted(nested_store):
    out, _ = nested_store
    got = _collect(decode_dataset(out, columns=["s", "s.a"]))
    assert [f.name for f in got.schema.field("s").type] == ["a", "b", "c"]


def test_unknown_child_raises(nested_store):
    out, _ = nested_store
    with pytest.raises(Exception, match="zzz"):
        _collect(decode_dataset(out, columns=["s.zzz"]))


def test_subtree_with_predicate_and_strides(nested_store):
    """Dotted projection + a stride-prunable predicate on a flat column:
    the struct child decodes through the range-slice fallback."""
    out, t = nested_store
    got = _collect(
        decode_dataset(out, columns=["k", "s.b"], predicates=[("k", "<", 100)])
    ).sort_by("k")
    assert got.num_rows == 100
    assert got.column("s").combine_chunks().field("b").to_pylist() == [
        f"name-{i % 11}" for i in range(100)
    ]
