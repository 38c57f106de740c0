"""Tests for training-data pipeline functions: dedup (exact/minhash/
simhash/jaccard), similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.functions import dedup, multimodal, similarity, text


def _corpus_with_near_dups():
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away into the forest",
        "completely different text about ray data pipelines and columnar compression engines",
        "numpy vectorized kernels make python fast enough for heavy data processing work",
        "a third unrelated document mentioning nothing in common with the others at all",
    ]
    docs, ids = [], []
    for i, b in enumerate(base):
        docs.append(b)
        ids.append(f"doc{i}-orig")
        # near-dup: small edit
        docs.append(b.replace("the", "teh", 1) + " extra")
        ids.append(f"doc{i}-neardup")
    # unique extras
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota", "kappa"]
    for j in range(20):
        docs.append(" ".join(rng.choice(words, 12)) + f" unique{j}")
        ids.append(f"uniq{j}")
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})


def _varbytes(t):
    return dedup._varbytes(t.column("text"))


def test_minhash_signature_properties():
    t = _corpus_with_near_dups()
    concat, offsets = _varbytes(t)
    sig = dedup.minhash_signature(concat, offsets, num_hashes=64)
    assert sig.shape == (t.num_rows, 64)
    # near-dups share most minhashes; unrelated docs share few
    agree_nd = (sig[0] == sig[1]).mean()   # doc0-orig vs doc0-neardup
    agree_far = (sig[0] == sig[2]).mean()  # doc0 vs doc1
    assert agree_nd > 0.6 > agree_far


def test_minhash_deterministic_across_batch_splits():
    t = _corpus_with_near_dups()
    concat, offsets = _varbytes(t)
    whole = dedup.minhash_signature(concat, offsets)
    c1, o1 = _varbytes(t.slice(0, 3))
    part = dedup.minhash_signature(c1, o1)
    np.testing.assert_array_equal(whole[:3], part)


def test_simhash_hamming():
    t = _corpus_with_near_dups()
    concat, offsets = _varbytes(t)
    h = dedup.simhash64(concat, offsets)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h[0], h[1]) < 12        # near-dups close
    assert ham(h[0], h[2]) > 16        # unrelated far


def test_jaccard_pairs():
    t = _corpus_with_near_dups()
    concat, offsets = _varbytes(t)
    j = dedup.jaccard_pairs(concat, offsets, np.array([[0, 1], [0, 2], [0, 0]]))
    assert j[0] > 0.5 and j[1] < 0.2 and j[2] == 1.0


def test_jaccard_pairs_matches_scalar_reference():
    # the vectorized one-sort path must equal per-pair set intersection
    rng = np.random.default_rng(5)
    texts = ["".join(rng.choice(list("abcdefgh "), rng.integers(1, 60))) for _ in range(40)]
    t = pa.table({"text": texts})
    concat, offsets = _varbytes(t)
    pairs = rng.integers(0, 40, size=(200, 2))
    got = dedup.jaccard_pairs(concat, offsets, pairs)
    h, seg = dedup._shingle_keys(concat, offsets, 8)
    for (i, j), g in zip(pairs, got):
        a, b = h[seg[i] : seg[i + 1]], h[seg[j] : seg[j + 1]]
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        exp = inter / union if union else 1.0
        assert abs(g - exp) < 1e-12, (i, j, g, exp)
    assert dedup.jaccard_pairs(concat, offsets, np.empty((0, 2), dtype=np.int64)).size == 0


def test_dedup_minhash_pipeline(ray_session):
    import ray

    t = _corpus_with_near_dups()
    ds = ray.data.from_arrow(t)
    clusters = dedup.dedup_minhash(ds, id_col="doc_id", text_col="text")
    rep = dict(zip(clusters.column("doc_id").to_pylist(), clusters.column("cluster_rep").to_pylist()))
    for i in range(4):
        a, b = f"doc{i}-orig", f"doc{i}-neardup"
        assert rep.get(a, a) == rep.get(b, b), f"pair {i} not clustered"
    # unique docs must not be merged with the base docs
    for j in range(20):
        r = rep.get(f"uniq{j}", f"uniq{j}")
        assert not r.startswith("doc"), (j, r)


def test_dedup_exact_fingerprint(ray_session):
    import ray

    docs = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    ids = [f"d{i}" for i in range(len(docs))]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(3)
    out = pa.concat_tables(
        list(dedup.dedup_exact_fingerprint(ds).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    got = dict(zip(out.column("text").to_pylist(), out.column("doc_id").to_pylist()))
    assert got == {"aaa": "d0", "bbb": "d1", "ccc": "d3"}


def test_dedup_exact_fingerprint_collision_path(ray_session):
    """Force ALL fingerprints to collide: the fp2 disagreement detector
    must route every group through the exact text resolution and still
    produce the text-keyed answer."""
    import ray

    def colliding(concat, offsets, basis=None):
        return np.zeros(offsets.size - 1, dtype=np.uint64)

    docs = ["xx", "yy", "xx", "zz", "yy"]
    ids = [f"d{i}" for i in range(len(docs))]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(2)
    out = pa.concat_tables(
        list(
            dedup.dedup_exact_fingerprint(ds, _fp_fn=colliding).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    got = dict(zip(out.column("text").to_pylist(), out.column("doc_id").to_pylist()))
    assert got == {"xx": "d0", "yy": "d1", "zz": "d3"}


def test_dedup_ngram_distributed_vs_bruteforce(ray_session):
    """dedup_ngram_jaccard must (a) match a brute-force shingle-set
    computation and (b) keep the pair multiset OFF the driver: the rows
    collected driver-side (boundary members + final result) must be a
    small fraction of the emitted pair rows (the r2 verdict's row-count
    ceiling check)."""
    import ray

    rng = np.random.default_rng(7)
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "pack my box with five dozen liquor jugs before the storm arrives",
        "how vexingly quick daft zebras jump over fences in the moonlight",
    ]
    docs, ids = [], []
    for i in range(120):
        b = base[i % 3]
        # near-dups: shared long substrings -> many candidate pairs
        suffix = "" if i % 4 else f" variant {i}"
        docs.append(b + suffix)
        ids.append(i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(4)
    stats = {}
    out = dedup.dedup_ngram_jaccard(ds, max_df=200, stats_out=stats)

    # brute force with identical semantics (k=8 byte shingles, df cap)
    k, max_df = 8, 200
    sets = []
    for d in docs:
        bs = d.encode()
        sets.append({bs[i : i + k] for i in range(len(bs) - k + 1)} if len(bs) >= k else set())
    from collections import Counter

    df = Counter(s for st in sets for s in st)
    keep = {s for s, c in df.items() if c <= max_df}
    sets = [st & keep for st in sets]
    exp = []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            un = len(sets[i]) + len(sets[j]) - inter
            if inter and 2 * inter >= un:
                exp.append((ids[i], ids[j], inter, un))
    got = list(
        zip(
            out.column("doc_a").to_pylist(),
            out.column("doc_b").to_pylist(),
            out.column("inter").to_pylist(),
            out.column("un").to_pylist(),
        )
    )
    assert sorted(got) == sorted(exp)
    assert len(exp) > 100  # the corpus really produces many dup pairs
    # the scale assertions: the shuffled pair multiset (already shrunk by
    # the in-block combiner) exceeds the result, and the driver sees only
    # boundary rows + the result — never the multiset
    assert stats["emitted_pair_rows"] > 2 * len(exp), stats
    # the healing cost alone is O(blocks) — far under the multiset; the
    # total driver rows may also include the DEDUPLICATED candidate table
    # (adaptive small-join path) but never the multiset itself
    assert stats["boundary_driver_rows"] < stats["emitted_pair_rows"] / 4, stats
    assert stats["driver_rows"] < stats["emitted_pair_rows"], stats

    # the large-run path (distributed hash size-join instead of the
    # driver-side small-pair threshold) must produce identical pairs
    out_join = dedup.dedup_ngram_jaccard(ds, max_df=200, small_join_threshold=0)
    got_join = list(
        zip(
            out_join.column("doc_a").to_pylist(),
            out_join.column("doc_b").to_pylist(),
            out_join.column("inter").to_pylist(),
            out_join.column("un").to_pylist(),
        )
    )
    assert sorted(got_join) == sorted(exp)


def test_with_prefix_sum_distributed(ray_session):
    """Global running sum (exclusive + inclusive) must equal the serial
    scan regardless of block layout; blocks stay in the object store."""
    import ray

    from orc_ray.functions.aggregates import with_prefix_sum

    rng = np.random.default_rng(2)
    n = 5000
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 100, n)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(7)
    out = pa.concat_tables(
        list(
            with_prefix_sum(ds, ["k"], "v", out="cum").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    ).sort_by("k")
    order = np.argsort(keys)
    expect = np.cumsum(vals[order]) - vals[order]  # exclusive
    np.testing.assert_array_equal(out.column("cum").to_numpy(), expect)
    out_inc = pa.concat_tables(
        list(
            with_prefix_sum(ds, ["k"], "v", out="cum", inclusive=True).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    ).sort_by("k")
    np.testing.assert_array_equal(out_inc.column("cum").to_numpy(), np.cumsum(vals[order]))


def test_topk_cosine_exact(ray_session):
    import ray

    rng = np.random.default_rng(17)
    n, d = 400, 32
    m = rng.normal(size=(n, d)).astype(np.float32)
    queries = m[[5, 99]] + rng.normal(scale=0.01, size=(2, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n)),
            "embedding": pa.array([list(map(float, row)) for row in m], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    res = similarity.topk_cosine(ds, queries, k=5)
    by_q = {}
    for qi, vid, sim in zip(res.column("query_idx").to_pylist(), res.column("vec_id").to_pylist(), res.column("sim").to_pylist()):
        by_q.setdefault(qi, []).append((vid, sim))
    assert by_q[0][0][0] == 5 and by_q[1][0][0] == 99  # self best
    # verify against full numpy ground truth
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    truth = np.argsort(-(mn @ qn.T), axis=0)[:5]
    assert [v for v, _ in by_q[0]] == list(truth[:, 0])


def test_cosine_pairs_blockwise_exact_and_prunes(ray_session):
    """cosine_pairs must equal the brute-force all-pairs answer AND, on
    clustered data, skip a provable fraction of block pairs via the
    spherical-cap bound (no full-corpus broadcast)."""
    import ray

    from orc_ray.functions.similarity import _normalize, cosine_pairs

    rng = np.random.default_rng(23)
    d = 16
    # three well-separated clusters -> far block pairs are prunable
    centers = _normalize(rng.normal(size=(3, d)))
    vecs = np.concatenate(
        [_normalize(c + 0.05 * rng.normal(size=(400, d))) for c in centers]
    ).astype(np.float32)
    ids = rng.permutation(vecs.shape[0]).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    stats = {}
    out = cosine_pairs(ds, threshold=0.9, block_rows=128, n_clusters=6, stats_out=stats)

    m = _normalize(vecs.astype(np.float64))
    sims = m @ m.T
    exp = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] > 0.9:
                exp.add((int(ids[i]), int(ids[j])))
    got = set(zip(out.column("vec_id_a").to_pylist(), out.column("vec_id_b").to_pylist()))
    assert got == exp and len(exp) > 1000
    assert stats["block_pairs_pruned"] > 0, stats  # pruning must bite
    assert stats["block_pairs_pruned"] < stats["block_pairs_total"]


def test_topk_cosine_ivf(ray_session):
    import ray

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(4, 16)).astype(np.float32) * 5
    pts = np.concatenate([c + rng.normal(size=(100, 16)).astype(np.float32) for c in centers])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(pts))),
            "embedding": pa.array([list(map(float, r)) for r in pts], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    q = pts[7]
    exact = similarity.topk_cosine(ds, q, k=5)
    approx = similarity.topk_cosine_ivf(ds, q, k=5, n_clusters=8, nprobe=4)
    ex_ids = set(exact.column("vec_id").to_pylist())
    ap_ids = set(approx.column("vec_id").to_pylist())
    assert 7 in ap_ids
    assert len(ex_ids & ap_ids) >= 3  # high recall on clustered data


def test_ivf_store_prunes_chunks(ray_session, tmp_path):
    """The scale path: IVF-partition-sorted chunk store; a probe must READ
    fewer chunks than the store holds (manifest min/max pruning), not
    filter a full scan — and keep recall."""
    import ray
    import pyarrow.parquet as pq

    rng = np.random.default_rng(29)
    centers = rng.normal(size=(4, 16)).astype(np.float32) * 5
    pts = np.concatenate([c + rng.normal(size=(200, 16)).astype(np.float32) for c in centers])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(pts))),
            "embedding": pa.array([list(map(float, r)) for r in pts], pa.list_(pa.float32())),
        }
    )
    src = str(tmp_path / "emb.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "ivfstore")
    similarity.build_ivf_store(src, store, n_clusters=8, batch_size=100)
    q = pts[7]
    res, kept, total = similarity.topk_cosine_ivf_store(store, q, k=5, nprobe=2)
    assert kept < total, (kept, total)  # pruning actually skipped chunks
    ds = ray.data.from_arrow(t).repartition(4)
    exact = similarity.topk_cosine(ds, q, k=5)
    ex_ids = set(exact.column("vec_id").to_pylist())
    ap_ids = set(res.column("vec_id").to_pylist())
    assert 7 in ap_ids
    assert len(ex_ids & ap_ids) >= 3


def test_lsh_store_recall_and_pruning(ray_session, tmp_path):
    """LSH-bucketed ANN store: multiprobe top-k must hit high recall vs
    exact brute force AND prune chunks via the manifest."""
    import pyarrow.parquet as pq
    import ray

    from orc_ray.functions.similarity import (
        _normalize,
        build_lsh_store,
        topk_cosine_lsh_store,
    )

    rng = np.random.default_rng(31)
    n, d = 3000, 24
    vecs = _normalize(rng.normal(size=(n, d))).astype(np.float32)
    # plant true near-neighbors for the probed queries (uniform random
    # vectors have none, which would make recall meaningless)
    for base in (3, 700, 1500):
        for j in range(10):
            vecs[base + 1 + j] = _normalize(
                np.atleast_2d(vecs[base] + 0.08 * rng.normal(size=d).astype(np.float32))
            )[0]
    src = tmp_path / "emb.parquet"
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        src,
    )
    store = tmp_path / "lsh"
    build_lsh_store(str(src), str(store), n_bits=6, batch_size=256)
    hits = 0
    kept_total = 0
    for qi in [3, 700, 1500]:
        q = vecs[qi] + 0.05 * rng.normal(size=d).astype(np.float32)
        t, kept, total = topk_cosine_lsh_store(str(store), q, k=10, nprobe=12)
        assert kept < total, (kept, total)  # manifest pruning must bite
        kept_total += kept
        exact = np.argsort(-(_normalize(vecs.astype(np.float64)) @ _normalize(
            np.atleast_2d(q.astype(np.float64)))[0]))[:10]
        got = set(t.column("vec_id").to_pylist())
        hits += len(got & set(int(x) for x in exact))
    assert hits >= 20, hits  # >=2/3 recall@10 across the probes


def test_text_stats_kernels():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3]),
            "text": pa.array(["The quick brown fox. It is fast!", "der die das und ist", ""]),
        }
    )
    tc = text.token_counts(t)
    assert tc.column("n_ws_tokens").to_pylist() == [7, 5, 0]
    q = text.quality_score(t)
    assert 0 <= q.column("quality")[0].as_py() <= 1
    lid = text.lang_id(t)
    assert lid.column("lang_pred").to_pylist()[0] == "en"
    assert lid.column("lang_pred").to_pylist()[1] == "de"
    fp = text.fingerprint64(t)
    vals = fp.column("fingerprint").to_pylist()
    assert len(set(vals)) == 3
    # fingerprint matches reference FNV-1a
    import functools

    def fnv(s):
        h = 0xCBF29CE484222325
        for b in s.encode():
            h = ((h ^ b) * 0x100000001B3) % (1 << 64)
        return h

    assert vals[0] % (1 << 64) == fnv("The quick brown fox. It is fast!") or (vals[0] + (1 << 64)) == fnv("The quick brown fox. It is fast!")


def test_multimodal_plumbing(ray_session):
    import ray

    t = multimodal.synth_media_table(32)
    ds = ray.data.from_arrow(t)
    out = similarity  # noqa
    feats = multimodal.extract_features(ds, batch_size=8)
    res = pa.concat_tables(list(feats.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert res.num_rows == 32
    assert res.column("features").type == pa.list_(pa.float32())
    first = res.sort_by("media_id").column("features")[0].as_py()
    assert len(first) == 64
    # deterministic across runs
    feats2 = multimodal.extract_features(ray.data.from_arrow(t), batch_size=16)
    res2 = pa.concat_tables(list(feats2.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert res.sort_by("media_id").equals(res2.sort_by("media_id"))


def test_multimodal_resize_and_frame_sample(ray_session):
    import ray as _ray

    from orc_ray.functions.multimodal import (
        FrameSampleStage,
        ImageResizeStage,
        resize_images,
        sample_frames,
        synth_media_table,
    )

    t = synth_media_table(48)
    # stage-level determinism + semantics
    r = ImageResizeStage(64, 64)(t)
    assert r.schema.equals(t.schema)
    w = r.column("width").to_numpy()
    h = r.column("height").to_numpy()
    is_img = np.array([x == "image" for x in t.column("media_type").to_pylist()])
    assert (w[is_img] <= 64).all() and (h[is_img] <= 64).all()
    # non-image rows untouched
    assert r.filter(pa.compute.equal(r.column("media_type"), "audio")).equals(
        t.filter(pa.compute.equal(t.column("media_type"), "audio"))
    )
    assert ImageResizeStage(64, 64)(t).equals(r)  # deterministic

    f = FrameSampleStage(3)(t)
    n_vid = sum(1 for x in t.column("media_type").to_pylist() if x == "video")
    assert f.num_rows == 3 * n_vid
    assert sorted(set(f.column("frame_idx").to_pylist())) == [0, 1, 2]

    # through the Dataset pipeline (actor pool)
    ds = _ray.data.from_arrow(t)
    out = pa.concat_tables(
        list(sample_frames(resize_images(ds, max_w=64, max_h=64), k=2)
             .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert out.num_rows == 2 * n_vid
    assert out.column_names == ["media_id", "frame_idx", "frame"]


def test_fingerprint_md5_preserves_nulls():
    """Regression (review finding): SQL md5(NULL) is NULL — the engine
    must not hash nulls as empty strings."""
    from orc_ray.functions.text import fingerprint_md5

    t = pa.table({"doc_id": [1, 2], "text": pa.array(["abc", None])})
    out = fingerprint_md5(t)
    got = out.column("fp_md5").to_pylist()
    import hashlib

    assert got[0] == hashlib.md5(b"abc").hexdigest()
    assert got[1] is None


def test_cosine_pairs_empty_dataset(ray_session):
    """Regression (review finding): an empty stream returns the empty
    pairs table instead of raising from take_batch."""
    import ray

    from orc_ray.functions.similarity import cosine_pairs

    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float32()))}
    )
    out = cosine_pairs(ray.data.from_arrow(empty), threshold=0.5)
    assert out.num_rows == 0


def test_levenshtein_batch_matrix():
    """Vectorized byte-level edit distance vs a scalar reference DP,
    incl. empties, non-ASCII multibyte and long strings."""
    import numpy as np
    import pyarrow as pa

    from orc_ray.functions.text import levenshtein_batch

    def ref(a, b):
        a, b = a.encode(), b.encode()
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            ndp = [i + 1]
            for j, cb in enumerate(b):
                ndp.append(min(dp[j + 1] + 1, ndp[j] + 1, dp[j] + (ca != cb)))
            dp = ndp
        return dp[-1]

    import random

    random.seed(9)
    words = ["", "a", "kitten", "sitting", "naïve café", "x" * 40] + [
        "".join(random.choice("abcdé ") for _ in range(random.randint(0, 30)))
        for _ in range(150)
    ]
    for q in ["kitten", "", "éé", "abcde fgh"]:
        got = levenshtein_batch(q, pa.array(words))
        exp = np.array([ref(q, w) for w in words])
        assert (got == exp).all()
    # nulls behave as empty strings (insert-all distance)
    got = levenshtein_batch("ab", pa.array(["ab", None, "b"]))
    assert got.tolist() == [0, 2, 1]


def test_skyline_kernel_vs_bruteforce():
    """2-D min-skyline survivor mask vs the O(n^2) dominance definition,
    incl. duplicate points and dim ties (one strict dim required)."""
    import numpy as np

    from orc_ray.queries.tpch import _skyline_min2

    rng = np.random.default_rng(13)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        s = rng.integers(0, 6, n).astype(np.int64)
        p = rng.integers(0, 6, n).astype(np.int64)
        got = _skyline_min2(s, p)
        dom = np.zeros(n, dtype=bool)
        for i in range(n):
            for j in range(n):
                if s[j] <= s[i] and p[j] <= p[i] and (s[j] < s[i] or p[j] < p[i]):
                    dom[i] = True
                    break
        assert (got == ~dom).all()
