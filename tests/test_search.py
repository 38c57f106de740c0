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

    # a doc stuffed with the query term must outrank background docs
    s = out.column("score_e6").to_numpy()
    assert (np.diff(s) <= 0).all()  # descending scores

    miss = bm25_search(idx, ["zzz_not_a_word"], k=5)
    assert miss.num_rows == 0
