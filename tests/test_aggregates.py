"""Direct tests for functions/aggregates.py: sum_by_keys, agg_by_keys,
with_prefix_sum — adversarial key distributions and boundary healing."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.functions.aggregates import agg_by_keys, sum_by_keys, with_prefix_sum


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables([p for p in parts if p.num_rows]).combine_chunks()


def test_sum_by_keys_matches_pandas(ray_session):
    import pandas as pd
    import ray

    rng = np.random.default_rng(1)
    n = 30_000
    a = rng.integers(0, 800, n)
    b = rng.integers(0, 5, n)
    v = rng.integers(-50, 50, n)
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b, "v": v})).repartition(9)
    stats = {}
    got = _collect(sum_by_keys(ds, ["a", "b"], "v", out="s", stats_out=stats)).to_pandas()
    exp = (
        pd.DataFrame({"a": a, "b": b, "v": v})
        .groupby(["a", "b"], as_index=False)["v"]
        .sum()
        .rename(columns={"v": "s"})
    )
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    exp = exp.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"s": "int64"}), exp.astype({"s": "int64"}))
    assert 0 < stats["boundary_rows"] < 200  # O(blocks), not O(groups)


@pytest.mark.parametrize("case", ["one_key", "all_unique"])
def test_sum_by_keys_degenerate_distributions(ray_session, case):
    import ray

    n = 4_000
    if case == "one_key":
        k = np.zeros(n, np.int64)  # one group spanning every block
    else:
        k = np.arange(n)  # every row its own group
    v = np.ones(n, np.int64)
    ds = ray.data.from_arrow(pa.table({"k": k, "v": v})).repartition(5)
    got = _collect(sum_by_keys(ds, ["k"], "v", out="s"))
    if case == "one_key":
        assert got.num_rows == 1 and got.column("s")[0].as_py() == n
    else:
        assert got.num_rows == n
        assert set(got.column("s").to_pylist()) == {1}


def test_agg_by_keys_min_max_strings_and_counts(ray_session):
    import ray

    rng = np.random.default_rng(4)
    n = 10_000
    k = rng.integers(0, 300, n)
    s = np.array([f"v{x:05d}" for x in rng.integers(0, 10_000, n)], dtype=object)
    ds = ray.data.from_arrow(pa.table({"k": k, "s": pa.array(list(s))})).repartition(6)
    got = (
        _collect(
            agg_by_keys(
                ds, ["k"], [("s", "min", "lo"), ("s", "max", "hi"), ("s", "count_all", "n")]
            )
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    import pandas as pd

    df = pd.DataFrame({"k": k, "s": s})
    exp = df.groupby("k")["s"].agg(lo="min", hi="max", n="count")
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), exp.astype({"n": "int64"}))


def test_with_prefix_sum_empty_and_single(ray_session):
    import ray

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
    assert with_prefix_sum(empty, ["k"], "v").count() == 0
    one = ray.data.from_arrow(pa.table({"k": [5], "v": [7]}))
    t = _collect(with_prefix_sum(one, ["k"], "v", out="c"))
    assert t.column("c").to_pylist() == [0]
    t2 = _collect(with_prefix_sum(one, ["k"], "v", out="c", inclusive=True))
    assert t2.column("c").to_pylist() == [7]


def test_with_group_ranks_matches_pandas(ray_session):
    """ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, id) across many
    blocks, including keys that span several blocks."""
    import pandas as pd
    import ray

    from orc_ray.functions.aggregates import with_group_ranks

    rng = np.random.default_rng(9)
    n = 20_000
    # zipf-ish skew: a few huge keys (spanning many sorted blocks) + tail
    k = np.minimum(rng.zipf(1.3, n) % 200, 199).astype(np.int64)
    v = rng.integers(0, 1000, n)
    rid = np.arange(n)
    ds = ray.data.from_arrow(pa.table({"k": k, "v": v, "id": rid})).repartition(11)
    got = _collect(
        with_group_ranks(ds, ["k"], ["v", "id"], descending=[True, False], out="rnk")
    ).to_pandas()
    df = pd.DataFrame({"k": k, "v": v, "id": rid})
    df["rnk"] = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k")
        .cumcount()
        + 1
    )
    merged = got.merge(df, on=["k", "v", "id"], suffixes=("_got", "_exp"))
    assert len(merged) == n
    assert (merged["rnk_got"] == merged["rnk_exp"]).all()


def test_with_group_prefix_sum_matches_pandas(ray_session):
    """Segmented running sum per key across blocks (keys spanning several
    blocks included), inclusive and exclusive."""
    import pandas as pd
    import ray

    from orc_ray.functions.aggregates import with_group_prefix_sum

    rng = np.random.default_rng(13)
    n = 15_000
    k = np.minimum(rng.zipf(1.4, n) % 100, 99).astype(np.int64)
    o = rng.permutation(n)
    v = rng.integers(-20, 100, n)
    ds = ray.data.from_arrow(pa.table({"k": k, "o": o, "v": v})).repartition(8)
    got = _collect(
        with_group_prefix_sum(ds, ["k"], ["o"], "v", out="run")
    ).to_pandas()
    df = pd.DataFrame({"k": k, "o": o, "v": v}).sort_values(["k", "o"])
    df["run"] = df.groupby("k")["v"].cumsum()
    merged = got.merge(df, on=["k", "o", "v"], suffixes=("_got", "_exp"))
    assert len(merged) == n and (merged["run_got"] == merged["run_exp"]).all()
    got_ex = _collect(
        with_group_prefix_sum(ds, ["k"], ["o"], "v", out="run", inclusive=False)
    ).to_pandas()
    df["run_ex"] = df["run"] - df["v"]
    m2 = got_ex.merge(df, on=["k", "o", "v"], suffixes=("_got", "_exp"))
    assert len(m2) == n and (m2["run_got"] == m2["run_ex"]).all()


def test_with_group_lag_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from orc_ray.functions.aggregates import with_group_lag

    rng = np.random.default_rng(17)
    n = 12_000
    k = np.minimum(rng.zipf(1.4, n) % 80, 79).astype(np.int64)
    o = rng.permutation(n)
    v = rng.integers(0, 10**6, n)
    ds = ray.data.from_arrow(pa.table({"k": k, "o": o, "v": v})).repartition(9)
    got = _collect(with_group_lag(ds, ["k"], ["o"], "v", out="prev")).to_pandas()
    df = pd.DataFrame({"k": k, "o": o, "v": v}).sort_values(["k", "o"])
    df["prev"] = df.groupby("k")["v"].shift(1)
    merged = got.merge(df, on=["k", "o", "v"], suffixes=("_got", "_exp"))
    assert len(merged) == n
    both_null = merged["prev_got"].isna() & merged["prev_exp"].isna()
    assert (both_null | (merged["prev_got"] == merged["prev_exp"])).all()
    # exactly one null per key (its first row)
    assert int(merged["prev_got"].isna().sum()) == len(np.unique(k))


def test_with_group_cummin(ray_session):
    """Segmented running-min: brute-force parity across many blocks
    (boundary carries), including a key spanning several blocks and the
    extreme-range fallback path."""
    import numpy as np

    import ray

    from orc_ray.functions.aggregates import _add_group_cummin, with_group_cummin

    rng = np.random.default_rng(9)
    n = 4000
    k = np.sort(rng.integers(0, 37, n))  # sorted keys, many spanning blocks
    o = np.arange(n, dtype=np.int64)  # unique order column
    v = rng.integers(-10**6, 10**6, n)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k), "o": pa.array(o), "v": pa.array(v)})
    ).repartition(11)
    got = pa.concat_tables(
        with_group_cummin(ds, ["k"], ["o"], "v", out="m").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("o")
    # brute force per key
    exp = np.empty(n, np.int64)
    for key in np.unique(k):
        m = k == key
        exp[m] = np.minimum.accumulate(v[m])
    np.testing.assert_array_equal(got.column("m").to_numpy(zero_copy_only=False), exp)

    # extreme-range fallback (offsets would overflow int64): same kernel contract
    lo, hi = np.iinfo(np.int64).min // 2, np.iinfo(np.int64).max // 2
    t = pa.table(
        {
            "k": pa.array([0, 0, 1, 1, 1, 2], pa.int64()),
            "v": pa.array([hi, lo, 5, -7, 3, lo], pa.int64()),
        }
    )
    out = _add_group_cummin(t, ["k"], "v", "m", None)
    assert out.column("m").to_pylist() == [hi, lo, 5, -7, -7, lo]
    # carry applies to the first segment only
    out2 = _add_group_cummin(t, ["k"], "v", "m", carry=lo + 1)
    assert out2.column("m").to_pylist()[:2] == [lo + 1, lo]
    assert out2.column("m").to_pylist()[2:] == [5, -7, -7, lo]


def test_with_group_cummax(ray_session):
    import ray

    from orc_ray.functions.aggregates import with_group_cummax

    rng = np.random.default_rng(3)
    n = 2000
    k = np.sort(rng.integers(0, 17, n))
    o = np.arange(n, dtype=np.int64)
    v = rng.integers(-10**6, 10**6, n)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k), "o": pa.array(o), "v": pa.array(v)})
    ).repartition(7)
    got = pa.concat_tables(
        with_group_cummax(ds, ["k"], ["o"], "v", out="m").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("o")
    exp = np.empty(n, np.int64)
    for key in np.unique(k):
        m = k == key
        exp[m] = np.maximum.accumulate(v[m])
    np.testing.assert_array_equal(got.column("m").to_numpy(zero_copy_only=False), exp)
    # the value column itself comes back un-negated
    np.testing.assert_array_equal(got.column("v").to_numpy(zero_copy_only=False), v)


def test_agg_by_keys_null_keys(ray_session):
    """Null keys form their own group (SQL GROUP BY).  Regression: the
    edge detection used pc.equal against a possibly-null sort endpoint;
    the null poisoned the AND/OR chain and the interior/edge filters
    then dropped EVERY group in the block — one null key silently
    emptied the whole result."""
    import ray

    t = pa.table({
        "k": ["aa", "aa", None, None, "", "", "bb"],
        "v": [1, 2, 3, 4, 5, 6, 7],
    })
    out = agg_by_keys(
        ray.data.from_arrow(t).repartition(3),
        ["k"],
        [("v", "count_all", "n"), ("v", "min", "lo"), ("v", "sum", "s")],
    )
    rows = sorted(
        pa.concat_tables(
            out.iter_batches(batch_format="pyarrow", batch_size=None)
        ).to_pylist(),
        key=lambda r: (r["k"] is None, r["k"] or ""),
    )
    assert rows == [
        {"k": "", "n": 2, "lo": 5, "s": 11},
        {"k": "aa", "n": 2, "lo": 1, "s": 3},
        {"k": "bb", "n": 1, "lo": 7, "s": 7},
        {"k": None, "n": 2, "lo": 3, "s": 7},
    ]


def test_window_ops_null_partition_keys(ray_session):
    """PARTITION BY over a nullable key: null forms its own partition
    (SQL semantics).  Regression: Ray's sort raises TypeError comparing
    None boundary samples, so the window family routes through the same
    null-safe (flag, filled) sort as agg_by_keys."""
    import pandas as pd
    import ray

    from orc_ray.functions.aggregates import (
        with_group_lag,
        with_group_prefix_sum,
        with_group_ranks,
        with_group_tie_ranks,
        with_group_cummax,
    )

    rng = np.random.default_rng(7)
    n = 500
    keys = rng.choice(["a", "b", None, "c"], n).tolist()
    o = np.arange(n, dtype=np.int64)
    v = rng.integers(0, 100, n)
    t = pa.table({"k": pa.array(keys, pa.string()), "o": pa.array(o), "v": pa.array(v)})
    pdf = t.to_pandas()

    def collect(out_ds):
        return pa.concat_tables(
            out_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("o").to_pandas()

    ds = lambda: ray.data.from_arrow(t).repartition(5)  # noqa: E731

    got = collect(with_group_ranks(ds(), ["k"], ["o"], out="r"))
    exp = pdf.groupby("k", dropna=False)["o"].rank(method="first").astype("int64")
    assert got["r"].tolist() == exp.tolist()
    assert got["k"].isna().sum() == pdf["k"].isna().sum()

    got = collect(with_group_prefix_sum(ds(), ["k"], ["o"], "v", out="s"))
    exp = pdf.groupby("k", dropna=False)["v"].cumsum()
    assert got["s"].tolist() == exp.tolist()

    got = collect(with_group_lag(ds(), ["k"], ["o"], "v", out="lag"))
    exp = pdf.groupby("k", dropna=False)["v"].shift(1)
    both_null = got["lag"].isna() & exp.isna()
    assert (both_null | (got["lag"] == exp)).all()

    got = collect(with_group_tie_ranks(ds(), ["k"], ["v"], out="r", dense=True))
    exp = pdf.groupby("k", dropna=False)["v"].rank(method="dense").astype("int64")
    assert got["r"].tolist() == exp.tolist()

    got = collect(with_group_cummax(ds(), ["k"], ["o"], "v", out="m"))
    exp = pdf.groupby("k", dropna=False)["v"].cummax()
    assert got["m"].tolist() == exp.tolist()


def test_null_keys_fast_path_sparse(ray_session):
    """Sparse nulls that survive Ray's boundary sampling take the FAST
    (untagged) sort path: null groups must still aggregate to ONE row
    (they are forced onto the healing path regardless of placement) and
    the window carry walk must still rank them correctly."""
    import pandas as pd
    import ray

    from orc_ray.functions.aggregates import with_group_ranks

    rng = np.random.default_rng(31)
    n = 50_000
    keys = [f"k{int(x):04d}" for x in rng.integers(0, 500, n)]
    null_at = rng.choice(n, 25, replace=False)
    for i in null_at:
        keys[i] = None
    o = np.arange(n, dtype=np.int64)
    v = rng.integers(0, 100, n)
    t = pa.table({"k": pa.array(keys, pa.string()), "o": pa.array(o), "v": pa.array(v)})
    ds = ray.data.from_arrow(t).repartition(16)

    got = _collect(agg_by_keys(ds, ["k"], [("v", "sum", "s"), ("v", "count_all", "n")]))
    df = got.to_pandas()
    null_rows = df[df["k"].isna()]
    assert len(null_rows) == 1  # ONE healed null group, not one per block
    assert int(null_rows["n"].iloc[0]) == 25
    assert int(null_rows["s"].iloc[0]) == int(v[null_at].sum())
    assert len(df) == len(set(k for k in keys if k is not None)) + 1

    got2 = _collect(sum_by_keys(ds, ["k"], "v", out="s")).to_pandas()
    nr = got2[got2["k"].isna()]
    assert len(nr) == 1 and int(nr["s"].iloc[0]) == int(v[null_at].sum())

    ranked = pa.concat_tables(
        with_group_ranks(ds, ["k"], ["o"], out="r").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("o").to_pandas()
    exp = (
        pd.DataFrame({"k": keys, "o": o})
        .groupby("k", dropna=False)["o"]
        .rank(method="first")
        .astype("int64")
    )
    assert ranked["r"].tolist() == exp.tolist()
