"""profile_numeric: exact fields vs brute force; HLL distinct accuracy;
null handling."""

import numpy as np
import pyarrow as pa
import ray


def test_profile_exact_fields_and_distinct(ray_session):
    from orc_ray.functions.profile import profile_numeric

    rng = np.random.default_rng(5)
    n = 30000
    x = rng.integers(0, 5000, n).astype(np.float64)
    y = np.round(rng.uniform(0, 100, n), 2)
    yn = y.copy()
    mask = rng.random(n) < 0.1
    import pyarrow.compute as pc

    t = pa.table(
        {
            "x": pa.array(x),
            "y": pc.if_else(pa.array(mask), pa.nulls(n, pa.float64()), pa.array(yn)),
        }
    )
    ds = ray.data.from_arrow(t)
    prof = profile_numeric(ds, ["x", "y"]).to_pandas().set_index("col")

    assert prof.loc["x", "n"] == n and prof.loc["x", "nulls"] == 0
    assert prof.loc["y", "nulls"] == int(mask.sum())
    assert prof.loc["x", "min_e6"] == int(round(x.min() * 1e6))
    assert prof.loc["x", "max_e6"] == int(round(x.max() * 1e6))
    sum_cents = int(np.rint(x * 100).astype(np.int64).sum())
    assert prof.loc["x", "mean_e6"] == int(np.floor(sum_cents * 10000.0 / n + 0.5))

    true_distinct = len(np.unique(x))
    approx = prof.loc["x", "approx_distinct"]
    assert abs(approx - true_distinct) / true_distinct < 0.05  # HLL p=12 ~1.6% sigma
