"""HyperLogLog sketch (functions/sketch.py): accuracy bounds, merge
equivalence, determinism, and the distributed pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.functions.sketch import approx_distinct, hll_estimate, hll_merge, hll_partial


@pytest.mark.parametrize("true_n", [100, 5_000, 200_000])
def test_estimate_within_bounds(true_n):
    """Standard error is ~1.04/sqrt(m); assert 5 sigma at p=12."""
    rng = np.random.default_rng(true_n)
    vals = rng.choice(10**12, size=true_n, replace=False)
    data = np.repeat(vals, 3)  # duplicates must not matter
    rng.shuffle(data)
    regs = hll_partial(pa.array(data), p=12)
    est = hll_estimate(regs)
    rel = abs(est - true_n) / true_n
    assert rel < 5 * 1.04 / np.sqrt(1 << 12), (est, true_n, rel)


def test_merge_equals_single_pass():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 50_000, 120_000)
    whole = hll_partial(pa.array(data), p=10)
    parts = [hll_partial(pa.array(chunk), p=10) for chunk in np.array_split(data, 7)]
    assert np.array_equal(hll_merge(parts), whole)  # merge == union semantics


def test_string_and_int_hashing_deterministic():
    a = pa.array(["x", "y", "x", None, "z"])
    r1, r2 = hll_partial(a), hll_partial(a)
    assert np.array_equal(r1, r2)
    est = hll_estimate(r1)
    assert abs(est - 3) < 1  # tiny cardinalities: linear counting is near-exact


def test_approx_distinct_grouped(ray_session):
    import ray

    rng = np.random.default_rng(3)
    n = 60_000
    groups = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    users = np.where(groups == "a", rng.integers(0, 500, n), rng.integers(0, 8000, n))
    t = pa.table({"grp": pa.array(groups), "user": pa.array(users)})
    ds = ray.data.from_arrow(t).repartition(6)
    out = approx_distinct(ds, "user", group_col="grp")
    got = dict(zip(out.column("group").to_pylist(), out.column("approx_distinct").to_pylist()))
    import pandas as pd

    true = pd.DataFrame({"g": groups, "u": users}).groupby("g")["u"].nunique().to_dict()
    for g, tv in true.items():
        assert abs(got[g] - tv) / tv < 0.1, (g, got[g], tv)


def test_rank_exact_near_powers_of_two():
    """Regression (review finding): float log2 drifted in the last ulp —
    rest within half-ulp below 2^k got rank one too low, and rest >=
    2^64 - 2^10 produced rank 0 (a scatter-max no-op dropping the value).
    Ranks must come from integer bit-length."""
    from orc_ray.functions.sketch import _hashes_and_ranks

    # craft int values whose splitmix output we can't control — instead
    # drive the rank math directly through a fake column by checking the
    # pure function over the full rank table via hll_partial determinism:
    # ranks for rest near 2^64 (p=12): lz must be 0 -> rank 1 (never 0)
    import numpy as np

    from orc_ray.functions.sketch import _POW2

    rest = np.array([2**64 - 512, 2**63, 2**63 - 1, 1, 0], dtype=np.uint64)
    bitlen = np.searchsorted(_POW2, rest, side="right")
    lz = 64 - bitlen
    assert lz.tolist() == [0, 0, 1, 63, 64]
    ranks = np.minimum(lz + 1, 64 - 12 + 1)
    assert ranks.min() >= 1  # rank 0 (the no-op) is impossible


# --- Count-Min sketch ---


def test_cms_merge_equals_single_build():
    import numpy as np
    import pyarrow as pa

    from orc_ray.functions.sketch import cms_merge, cms_partial

    rng = np.random.default_rng(3)
    vals = (rng.zipf(1.4, 30000) % 500).astype(np.int64)
    parts = [cms_partial(pa.array(vals[i::5])) for i in range(5)]
    assert (cms_merge(parts) == cms_partial(pa.array(vals))).all()


def test_cms_overestimates_within_bound():
    import numpy as np
    import pyarrow as pa

    from orc_ray.functions.sketch import cms_estimate, cms_partial

    rng = np.random.default_rng(4)
    n = 50000
    vals = (rng.zipf(1.3, n) % 4000).astype(np.int64)
    regs = cms_partial(pa.array(vals), w=8192)
    uniq, true = np.unique(vals, return_counts=True)
    est = cms_estimate(regs, pa.array(uniq))
    assert (est >= true).all()  # CMS never underestimates
    assert (est - true).max() <= np.e / 8192 * n * 3  # loose 3x the 1-sigma bound


def test_cms_string_and_int_kinds_hash_independently():
    import numpy as np
    import pyarrow as pa

    from orc_ray.functions.sketch import cms_estimate, cms_partial

    svals = pa.array(["a", "b", "a", "c", "a"])
    regs = cms_partial(svals)
    est = cms_estimate(regs, pa.array(["a", "b", "c", "zz"]))
    assert est[0] >= 3 and est[1] >= 1 and est[2] >= 1
    assert est[3] <= 5  # absent key bounded by N


# --- t-digest ---


def test_tdigest_rank_error_and_merge():
    import numpy as np
    import pyarrow as pa

    from orc_ray.functions.sketch import tdigest_merge, tdigest_partial, tdigest_quantile

    rng = np.random.default_rng(8)
    v = rng.lognormal(0, 1, 100000)
    parts = [tdigest_partial(pa.array(v[i::6])) for i in range(6)]
    d = tdigest_merge(parts)
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    est = tdigest_quantile(d, qs)
    for e, q in zip(est, qs):
        assert abs((v < e).mean() - q) < 0.01  # <=1% rank error
    assert d[0].size < 400  # bounded summary


def test_tdigest_exact_on_tiny_input():
    import numpy as np
    import pyarrow as pa

    from orc_ray.functions.sketch import tdigest_partial, tdigest_quantile

    d = tdigest_partial(pa.array([1.0, 2.0, 3.0, 4.0]))
    assert abs(tdigest_quantile(d, [0.5])[0] - 2.5) < 1.0


def test_approx_quantiles_dataset(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from orc_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(9)
    v = rng.uniform(0, 1000, 50000)
    ds = ray.data.from_arrow(pa.table({"x": v}))
    out = approx_quantiles(ds, "x", [0.25, 0.5, 0.75]).to_pandas()
    for q, e in zip(out["q"], out["value_est"]):
        assert abs((v < e).mean() - q) < 0.01


def test_approx_group_quantiles_accuracy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from orc_ray.functions.sketch import approx_group_quantiles

    rng = np.random.default_rng(31)
    n = 30000
    g = rng.choice(["a", "b", "c"], n)
    v = np.where(g == "a", rng.uniform(0, 10, n), np.where(g == "b", rng.normal(100, 5, n), rng.lognormal(2, 1, n)))
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(7)
    out = approx_group_quantiles(ds, "g", "v", [0.1, 0.5, 0.9]).to_pandas()
    for _, row in out.iterrows():
        sub = v[g == row["group"]]
        rank = (sub < row["value_est"]).mean()
        assert abs(rank - row["q"]) < 0.015, (row.to_dict(), rank)
