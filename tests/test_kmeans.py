"""Distributed Lloyd k-means vs an in-process reference on the same
deterministic seeding — centroids must match to float tolerance."""

import numpy as np
import pyarrow as pa
import ray


def _ref_kmeans(x, ids, k, iters=20):
    order = np.argsort(ids, kind="stable")[:k]
    c = x[order].copy()
    for _ in range(iters):
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        a = d2.argmin(1)
        new = np.stack([x[a == j].mean(0) if (a == j).any() else c[j] for j in range(k)])
        if np.allclose(new, c, rtol=0, atol=1e-12):
            return new
        c = new
    return c


def test_kmeans_matches_reference_and_separates_blobs(ray_session):
    from orc_ray.functions.kmeans import kmeans

    rng = np.random.default_rng(21)
    k, dim, per = 4, 8, 500
    centers = rng.normal(0, 10, (k, dim))
    x = np.concatenate([centers[j] + rng.normal(0, 0.5, (per, dim)) for j in range(k)])
    ids = np.arange(x.shape[0], dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array([row.tolist() for row in x], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    cents, assign = kmeans(ds, "embedding", k, id_col="vec_id")
    ref = _ref_kmeans(x, ids, k)
    # same deterministic seeding -> same fixpoint (order included)
    assert np.allclose(cents, ref, atol=1e-8)
    # blobs separated: assignment agrees with true generator up to relabel
    a = assign(x)
    for j in range(k):
        block = a[j * per : (j + 1) * per]
        assert (block == np.bincount(block).argmax()).mean() > 0.99


def test_kmeans_step_exact_matches_bruteforce(ray_session):
    """Single exact-integer Lloyd step == local int64 brute force."""
    import numpy as np
    import pyarrow as pa
    import ray

    from orc_ray.functions.kmeans import kmeans_step_exact

    rng = np.random.default_rng(17)
    n, dim, k = 300, 8, 5
    x = rng.normal(size=(n, dim)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    off = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
    emb = pa.ListArray.from_arrays(pa.array(off), pa.array(x.ravel(), pa.float32()))
    t = pa.table({"vec_id": pa.array(ids), "embedding": emb})
    ds = ray.data.from_arrow(t).repartition(4)
    got = kmeans_step_exact(ds, "embedding", k=k, id_col="vec_id")

    q = np.floor(x.astype(np.float64) * 1e6).astype(np.int64)
    seed_pos = np.argsort(ids, kind="stable")[:k]
    seeds = q[seed_pos]
    d2 = ((q[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    exp_n = np.bincount(a, minlength=k)
    exp_s = np.zeros(k, np.int64)
    np.add.at(exp_s, a, q.sum(axis=1))
    exp_ids = ids[seed_pos]
    order = np.argsort(exp_ids)
    keep = exp_n[order] > 0
    assert got.column("cluster").to_pylist() == list(exp_ids[order][keep])
    assert got.column("n_members").to_pylist() == list(exp_n[order][keep])
    assert got.column("coord_sum").to_pylist() == list(exp_s[order][keep])
