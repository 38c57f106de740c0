"""SearchArgument-style predicate trees: three-valued stats pruning
(TruthValue YES/NO/MAYBE — apache/orc c++/src/sargs/ExpressionTree.cc
analog) + exact row-level filters with AND/OR/NOT/IN/BETWEEN."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from orc_ray.pipeline.decode import NO, YES, MAYBE, _truth, decode_dataset, list_chunks
from orc_ray.pipeline.encode import encode_dataset
from orc_ray.fixtures import write_f1_parquet


def test_truth_values_leaves():
    st = {"x": {"min": 10, "max": 20}}
    assert _truth(st, ("x", ">", 25)) == NO
    assert _truth(st, ("x", ">", 5)) == YES
    assert _truth(st, ("x", ">", 15)) == MAYBE
    assert _truth(st, ("x", "==", 15)) == MAYBE
    assert _truth(st, ("x", "==", 30)) == NO
    assert _truth(st, ("x", "in", [1, 2, 3])) == NO
    assert _truth(st, ("x", "in", [1, 15])) == MAYBE
    assert _truth(st, ("x", "between", 0, 5)) == NO
    assert _truth(st, ("x", "between", 0, 50)) == YES
    assert _truth(st, ("y", ">", 0)) == MAYBE  # unknown column


def test_truth_values_trees():
    st = {"x": {"min": 10, "max": 20}, "y": {"min": 0, "max": 1}}
    assert _truth(st, ("and", ("x", ">", 25), ("y", ">=", 0))) == NO
    assert _truth(st, ("or", ("x", ">", 25), ("y", ">", 5))) == NO
    assert _truth(st, ("or", ("x", ">", 25), ("y", ">=", 0))) == YES
    assert _truth(st, ("not", ("x", ">", 25))) == YES
    assert _truth(st, ("not", ("x", ">", 5))) == NO
    assert _truth(st, ("not", ("x", ">", 15))) == MAYBE


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    src = str(tmp_path_factory.mktemp("psrc"))
    paths = write_f1_parquet(src, 4000, n_files=2)
    out = str(tmp_path_factory.mktemp("pstore"))
    encode_dataset(src, out, batch_size=500)
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    return out, full


def _run(out, preds):
    ds = decode_dataset(out, predicates=preds)
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables([p for p in parts if p.num_rows]) if parts else pa.table({})


def test_or_not_in_between_exact(store):
    out, full = store
    # OR tree
    got = _run(out, [("or", ("n_tok", "<", 20), ("n_tok", ">", 1500))])
    exp = full.filter(pc.or_(pc.less(full.column("n_tok"), 20), pc.greater(full.column("n_tok"), 1500)))
    assert got.num_rows == exp.num_rows
    # NOT
    got = _run(out, [("not", ("n_tok", ">", 100))])
    exp = full.filter(pc.invert(pc.greater(full.column("n_tok"), 100)))
    assert got.num_rows == exp.num_rows
    # IN on strings
    got = _run(out, [("source", "in", ["wiki", "code"])])
    exp = full.filter(pc.is_in(full.column("source"), value_set=pa.array(["wiki", "code"])))
    assert got.num_rows == exp.num_rows
    # BETWEEN
    got = _run(out, [("n_tok", "between", 64, 128)])
    exp = full.filter(
        pc.and_(pc.greater_equal(full.column("n_tok"), 64), pc.less_equal(full.column("n_tok"), 128))
    )
    assert got.sort_by("doc_id").equals(exp.sort_by("doc_id").select(got.column_names))


def test_tree_pruning_skips_chunks(store):
    out, _ = store
    _, kept, total = list_chunks(out, predicates=[("and", ("n_tok", ">", 2047), ("n_tok", "<", 10))])
    assert kept == 0  # contradictory AND prunes everything
    _, kept2, _ = list_chunks(out, predicates=[("n_tok", ">", 2047)])
    assert kept2 < total


def test_string_minmax_prunes_doc_id(store):
    """StringStatistics analog: doc_id equality prunes chunks through the
    manifest with NO bloom opt-in (r1 gap #2)."""
    out, full = store
    # f1 doc ids are doc-%016d, sequential -> chunks span disjoint ranges
    target = full.column("doc_id")[0].as_py()
    _, kept, total = list_chunks(out, predicates=[("doc_id", "==", target)])
    assert kept < total, (kept, total)
    got = _run(out, [("doc_id", "==", target)])
    assert got.num_rows == 1
    # type-mismatched literal must not mis-prune (conservative MAYBE)
    _, kept2, total2 = list_chunks(out, predicates=[("doc_id", "==", 123)])
    assert kept2 == total2


def test_timestamp_predicate_pushdown(tmp_path, ray_session):
    """Temporal predicates take epoch-count int literals (in the column's
    unit): the same literal drives chunk-stats pruning (integer min/max)
    AND the exact row filter (typed to the ts column)."""
    import numpy as np

    n = 4000
    us = (1_500_000_000_000_000 + np.arange(n, dtype=np.int64) * 60_000_000)
    t = pa.table({
        "id": pa.array(np.arange(n)),
        "ts": pa.array(us, pa.timestamp("us")),
    })
    src = str(tmp_path / "ts.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "store")
    encode_dataset([src], out, batch_size=500)
    cut = int(us[3500])
    _, kept, total = list_chunks(out, predicates=[("ts", ">", cut)])
    assert kept < total, (kept, total)
    got = _run(out, [("ts", ">", cut)])
    assert got.num_rows == n - 3501
    assert got.column("ts").to_pylist() == t.filter(
        pc.greater(t.column("ts"), t.column("ts")[3500])
    ).column("ts").to_pylist()
    # IN with epoch ints
    got_in = _run(out, [("ts", "in", [int(us[7]), int(us[1234])])])
    assert sorted(got_in.column("id").to_pylist()) == [7, 1234]


def test_startswith_truth_values():
    from orc_ray.pipeline.decode import _prefix_upper

    st = {"s": {"min": "doc-0002", "max": "doc-0004"}}
    assert _truth(st, ("s", "startswith", "doc-0005")) == NO
    assert _truth(st, ("s", "startswith", "doc-0001")) == NO
    assert _truth(st, ("s", "startswith", "doc-000")) == YES
    assert _truth(st, ("s", "startswith", "doc-0002")) == MAYBE
    # carry past the max code point
    assert _prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert _prefix_upper(chr(0x10FFFF)) is None
    # no finite upper bound for the all-max prefix -> conservative MAYBE
    big = chr(0x10FFFF)
    assert _truth({"s": {"min": "a", "max": big + "x"}}, ("s", "startswith", big)) == MAYBE


def test_startswith_prunes_and_filters(store):
    """LIKE 'pfx%' pushdown: sequential doc-%016d ids give disjoint chunk
    ranges, so a tight prefix prunes chunks AND the exact row filter
    matches Arrow's starts_with."""
    out, full = store
    pfx = full.column("doc_id")[0].as_py()[:17]  # doc-0000000000000 -> ids 0..999
    _, kept, total = list_chunks(out, predicates=[("doc_id", "startswith", pfx)])
    assert kept < total, (kept, total)
    got = _run(out, [("doc_id", "startswith", pfx)])
    exp = full.filter(pc.starts_with(full.column("doc_id"), pattern=pfx))
    assert got.num_rows == exp.num_rows > 0
    assert got.sort_by("doc_id").equals(exp.sort_by("doc_id").select(got.column_names))
