"""Weighted reservoir sampling: determinism, weight bias, split-stability."""

import numpy as np
import pyarrow as pa
import ray


def test_weighted_sample_biases_toward_heavy_rows(ray_session):
    from orc_ray.functions.sampling import weighted_sample

    n = 4000
    ids = [f"d{i:05d}" for i in range(n)]
    w = np.where(np.arange(n) < n // 2, 1.0, 20.0)  # second half 20x heavier
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "w": w}))
    t = weighted_sample(ds, "doc_id", "w", k=200)
    sel = t.column("id").to_pylist()
    heavy = sum(1 for s in sel if int(s[1:]) >= n // 2)
    assert heavy > 160  # ~95% expected from 20x weights


def test_weighted_sample_split_invariant(ray_session):
    from orc_ray.functions.sampling import weighted_sample

    n = 3000
    t = pa.table({"doc_id": [f"x{i}" for i in range(n)], "w": np.ones(n)})
    one = weighted_sample(ray.data.from_arrow(t), "doc_id", "w", 50)
    many = weighted_sample(ray.data.from_arrow(t).repartition(13), "doc_id", "w", 50)
    assert one.column("id").to_pylist() == many.column("id").to_pylist()


def test_weighted_sample_zero_weight_excluded(ray_session):
    """A-ES semantics: zero-weight rows have zero inclusion probability
    and are silently dropped; negative weights are a caller error."""
    import pytest

    from orc_ray.functions.sampling import weighted_sample

    ds = ray.data.from_arrow(pa.table({"doc_id": ["a", "b"], "w": [1.0, 0.0]}))
    out = weighted_sample(ds, "doc_id", "w", 2)
    assert out.column("id").to_pylist() == ["a"]

    neg = ray.data.from_arrow(pa.table({"doc_id": ["a", "b"], "w": [1.0, -2.0]}))
    with pytest.raises(Exception, match="non-negative weights"):
        weighted_sample(neg, "doc_id", "w", 1)
