"""Driver-footprint ceiling pins for the bounded driver-side collections
(the bm25 pattern, tests/test_search.py): dedup_minhash's edge collection
and candidate-text fetch, and cosine_pairs' slice-stats gather.  A
pathological corpus or a code regression that starts concentrating
O(corpus) data on the driver fails these pins loudly at sf0.01 instead of
surfacing as an OOM at 100 TB.
"""

import os

import pytest

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="sf0.01 testdata absent")


def test_minhash_driver_ceilings(ray_session):
    from orc_ray.functions.dedup import dedup_minhash
    from orc_ray.queries._shared import _decoded

    ds = _decoded(SF, "documents", columns=["doc_id", "text"])
    stats: dict = {}
    out = dedup_minhash(ds, stats_out=stats)
    assert out.num_rows > 0
    # edge + boundary records: actual dup edges plus <= 2 rows per sorted
    # block — measured 843 at sf0.01 (5k docs); far below O(corpus)
    assert stats["driver_edge_rows"] < 2000, stats
    # candidate-text fetch is bounded by the candidate-pair set
    assert stats["fetched_docs"] <= 2 * stats["candidate_pairs"], stats
    assert stats["fetched_bytes"] < 200_000, stats
    # every retained edge passed the exact-Jaccard verify (precision 1.0)
    assert stats["min_edge_jaccard"] is None or stats["min_edge_jaccard"] >= 0.5, stats
    assert stats["verified_pairs"] <= stats["candidate_pairs"], stats


def test_cosine_pairs_driver_ceilings(ray_session):
    from orc_ray.functions.similarity import cosine_pairs
    from orc_ray.queries._shared import _decoded

    ds = _decoded(SF, "embeddings", columns=["vec_id", "embedding"])
    stats: dict = {}
    out = cosine_pairs(ds, threshold=0.4, stats_out=stats)
    assert out.num_rows > 0
    n_rows = ds.count()
    # the slice-stats gather is O(blocks), one (centroid, angle) summary
    # per 2048-row slice — NEVER O(rows)
    assert stats["driver_slice_rows"] <= n_rows // 2048 + 8, stats
    assert stats["driver_stats_bytes"] < 64 * 1024, stats
