"""BM25 search over the chunk-store inverted index: term-lookup pruning
and score sanity."""

import numpy as np
import pyarrow as pa
import ray


def test_bm25_index_prunes_term_lookups(ray_session, tmp_path):
    from orc_ray.functions.search import bm25_search, build_text_index

    rng = np.random.default_rng(13)
    vocab = [f"w{i:03d}" for i in range(300)]
    docs = [
        " ".join(rng.choice(vocab, rng.integers(5, 60)))
        for _ in range(3000)
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(3000, dtype=np.int64), "text": docs})
    ).repartition(8)
    idx = str(tmp_path / "bm25")
    build_text_index(ds, idx)

    st = {}
    out = bm25_search(idx, ["w007", "w123"], k=5, stats_out=st)
    assert out.num_rows == 5
    # sorted postings -> term lookup touches a fraction of the chunks
    assert st["chunks_total"] >= 4
    assert st["chunks_kept"] < st["chunks_total"] * 0.7, st
    # driver ceiling: only the per-term df rows and O(blocks x k) top-k
    # candidates reach the driver — never the postings or the doc-length
    # table (both scale with the corpus)
    assert 0 < st["driver_rows"] < 500, st

    # a doc stuffed with the query term must outrank background docs
    s = out.column("score_e6").to_numpy()
    assert (np.diff(s) <= 0).all()  # descending scores

    miss = bm25_search(idx, ["zzz_not_a_word"], k=5)
    assert miss.num_rows == 0


def test_multi_index_search_equals_combined_rebuild(ray_session, tmp_path):
    """Base + delta indexes must score identically to one rebuilt index
    over the union corpus (the incremental-indexing contract)."""
    from orc_ray.functions.search import bm25_search, build_text_index

    rng = np.random.default_rng(29)
    vocab = [f"t{i:02d}" for i in range(60)]
    docs = [" ".join(rng.choice(vocab, rng.integers(4, 30))) for _ in range(1200)]
    ids = np.arange(1200, dtype=np.int64)
    base_t = pa.table({"doc_id": ids[:900], "text": docs[:900]})
    delta_t = pa.table({"doc_id": ids[900:], "text": docs[900:]})
    full_t = pa.table({"doc_id": ids, "text": docs})

    b_idx, d_idx, f_idx = (str(tmp_path / n) for n in ("b", "d", "f"))
    build_text_index(ray.data.from_arrow(base_t).repartition(4), b_idx)
    build_text_index(ray.data.from_arrow(delta_t).repartition(2), d_idx)
    build_text_index(ray.data.from_arrow(full_t).repartition(4), f_idx)

    multi = bm25_search([b_idx, d_idx], ["t07", "t33"], k=15)
    single = bm25_search(f_idx, ["t07", "t33"], k=15)
    assert multi.column("doc_id").to_pylist() == single.column("doc_id").to_pylist()
    assert multi.column("score_e6").to_pylist() == single.column("score_e6").to_pylist()
