"""Duplicated-substring detection / span cutting vs brute-force references.

Covers functions/substring.py: the rolling-hash candidate pass, the exact
gram verify pass, per-doc stats, and the coverage cut — over corpora with
planted cross-doc duplicates, in-doc self-repeats, short docs (< L), and
multi-block layouts so duplicate pairs straddle batches.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray

from orc_ray.functions.substring import (
    _all_window_hashes,
    cut_dup_spans,
    dup_window_stats,
)


def _brute_dup_grams(texts, L):
    from collections import Counter

    c = Counter()
    for x in texts:
        b = x.encode()
        for i in range(max(len(b) - L + 1, 0)):
            c[b[i : i + L]] += 1
    return {g for g, n in c.items() if n >= 2}


def _brute_stats(ids, texts, L):
    dup = _brute_dup_grams(texts, L)
    out = {}
    for d, x in zip(ids, texts):
        b = x.encode()
        n = max(len(b) - L + 1, 0)
        if n == 0:
            continue
        out[d] = (n, sum(1 for i in range(n) if b[i : i + L] in dup))
    return out


def _brute_cut(ids, texts, L):
    dup = _brute_dup_grams(texts, L)
    out = {}
    for d, x in zip(ids, texts):
        b = x.encode()
        cov = np.zeros(len(b), bool)
        for i in range(max(len(b) - L + 1, 0)):
            if b[i : i + L] in dup:
                cov[i : i + L] = True
        kept = bytes(np.frombuffer(b, np.uint8)[~cov]) if len(b) else b""
        if kept:
            out[d] = kept.decode()
    return out


def _corpus():
    rng = np.random.default_rng(7)
    alphabet = np.frombuffer(b"abcd", np.uint8)
    texts = ["".join(chr(c) for c in rng.choice(alphabet, rng.integers(5, 90))) for _ in range(160)]
    texts += ["PLANTED-DUPLICATE-SPAN-xyz" + t[:10] for t in texts[:6]]  # shared 26-byte head
    texts += ["ab" * 40]  # heavy in-doc self-repeat
    texts += ["short", "", "exactly8"]  # sub-window docs
    texts += [texts[3]]  # whole-doc duplicate
    ids = list(range(len(texts)))
    return ids, texts


def _ds(ids, texts, blocks=5):
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    return ray.data.from_arrow(t).repartition(blocks)


def test_rolling_hash_gram_consistency(ray_session):
    rng = np.random.default_rng(0)
    b = rng.integers(0, 3, 4000).astype(np.uint8)
    L = 8
    h = _all_window_hashes(b, L)
    seen = {}
    for i in range(h.size):
        g = bytes(b[i : i + L])
        assert seen.setdefault(g, int(h[i])) == int(h[i])


def test_dup_window_stats_matches_bruteforce(ray_session):
    ids, texts = _corpus()
    L = 8
    stats = {}
    out = pa.concat_tables(
        list(dup_window_stats(_ds(ids, texts), L=L, stats_out=stats).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("doc_id")
    got = {d: (n, k) for d, n, k in zip(out.column("doc_id").to_pylist(),
                                        out.column("n_windows").to_pylist(),
                                        out.column("dup_windows").to_pylist())}
    assert got == _brute_stats(ids, texts, L)
    # exact set can only shrink the hash-candidate set
    assert stats["dup_grams"] <= stats["dup_hashes"]
    assert stats["driver_rows"] == stats["dup_hashes"] + stats["dup_grams"]


def test_cut_dup_spans_matches_bruteforce(ray_session):
    ids, texts = _corpus()
    L = 8
    out = pa.concat_tables(
        list(cut_dup_spans(_ds(ids, texts), L=L).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("doc_id")
    got = dict(zip(out.column("doc_id").to_pylist(), out.column("clean_text").to_pylist()))
    assert got == _brute_cut(ids, texts, L)


def test_no_duplicates_is_identity(ray_session):
    # all-distinct windows: every 16-byte window spans >=3 complete "ijjj"
    # position units, which pin (doc, offset) uniquely — nothing repeats
    texts = ["".join(f"{i}{j:03d}" for j in range(10)) for i in range(5)]
    ids = list(range(5))
    stats = {}
    out = pa.concat_tables(
        list(cut_dup_spans(_ds(ids, texts, blocks=2), L=16, stats_out=stats).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("doc_id")
    assert out.column("clean_text").to_pylist() == texts
    assert stats["dup_grams"] == 0


def test_fully_duplicated_doc_dropped(ray_session):
    texts = ["SAME-CONTENT-SAME-CONTENT!", "SAME-CONTENT-SAME-CONTENT!", "unique tail that survives here"]
    out = pa.concat_tables(
        list(cut_dup_spans(_ds([1, 2, 3], texts, blocks=2), L=8).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    assert out.column("doc_id").to_pylist() == [3]
    assert out.column("clean_text").to_pylist() == ["unique tail that survives here"]


def test_window_length_must_be_word_aligned(ray_session):
    with pytest.raises(ValueError):
        dup_window_stats(_ds([1], ["x" * 50]), L=12)


def _collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("doc_id")


def test_partitioned_arm_stats_parity(ray_session):
    # budget 0 forces the hash-co-partitioned semi-join arm; outputs must
    # be identical to the broadcast arm on the same corpus
    ids, texts = _corpus()
    s_b, s_p = {}, {}
    a = _collect(dup_window_stats(_ds(ids, texts), L=8, stats_out=s_b))
    b = _collect(dup_window_stats(_ds(ids, texts), L=8, stats_out=s_p,
                                  broadcast_budget_bytes=0, num_partitions=4))
    assert s_b["arm"] == "broadcast" and s_p["arm"] == "partitioned"
    assert a.equals(b), (a.num_rows, b.num_rows)
    # partitioned arm never holds grams on the driver
    assert s_p["driver_rows"] == s_p["dup_hashes"]
    assert s_p["candidate_windows"] >= s_b["dup_grams"]


def test_partitioned_arm_cut_parity(ray_session):
    ids, texts = _corpus()
    a = _collect(cut_dup_spans(_ds(ids, texts), L=8))
    b = _collect(cut_dup_spans(_ds(ids, texts), L=8,
                               broadcast_budget_bytes=0, num_partitions=4))
    assert a.equals(b), (a.num_rows, b.num_rows)


def test_partitioned_arm_no_duplicates(ray_session):
    # empty candidate set short-circuits: identity cut / zero stats
    texts = ["".join(f"{i}{j:03d}" for j in range(10)) for i in range(5)]
    ids = list(range(5))
    st = {}
    out = _collect(cut_dup_spans(_ds(ids, texts, blocks=2), L=16, stats_out=st,
                                 broadcast_budget_bytes=0))
    assert out.column("clean_text").to_pylist() == texts
    assert st["arm"] == "partitioned" and st["candidate_windows"] == 0
    stats = _collect(dup_window_stats(_ds(ids, texts, blocks=2), L=16,
                                      broadcast_budget_bytes=0))
    assert stats.column("dup_windows").to_pylist() == [0] * 5


def test_dedup_cut_store_roundtrip(ray_session, tmp_path):
    """Store -> dedup-cut -> store preserves non-text columns and equals
    the brute-force cut on text, on BOTH arms."""
    import pyarrow.parquet as pq

    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import dedup_cut_store, encode_dataset

    ids, texts = _corpus()
    extra = [i * 7 % 13 for i in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts),
                  "extra": pa.array(extra, pa.int32())})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset(src, store, batch_size=40)

    want = _brute_cut(ids, texts, 8)
    for arm, budget in (("broadcast", 64 << 20), ("partitioned", 0)):
        out_dir = str(tmp_path / f"cut-{arm}")
        stats: dict = {}
        dedup_cut_store(store, out_dir, window=8, batch_size=40, stats_out=stats,
                        broadcast_budget_bytes=budget)
        assert stats["arm"] == arm
        got = pa.concat_tables(
            decode_dataset(out_dir).iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("doc_id")
        assert dict(zip(got.column("doc_id").to_pylist(),
                        got.column("text").to_pylist())) == want
        # non-text columns ride along unchanged
        by_id = dict(zip(ids, extra))
        assert all(by_id[d] == e for d, e in zip(got.column("doc_id").to_pylist(),
                                                 got.column("extra").to_pylist()))
        assert got.schema.field("extra").type == pa.int32()
