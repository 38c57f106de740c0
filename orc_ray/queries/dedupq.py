"""Deduplication queries: exact, minhash, n-gram Jaccard, simhash, embedding.

Split from the monolithic queries.py (r3 verdict item 10); see the
package __init__ for the registry and the original design docstring.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..chunk import DEFAULT_OPTIONS
from ..pipeline.decode import decode_dataset
from ..pipeline.encode import encode_dataset
from ._shared import CACHE_ROOT, _decoded, _to_table, store_for


def q_dedup_exact(sf_dir: str):
    """Exact dedup on document text, keyed on content fingerprints so the
    shuffle moves (fp, fp2, doc_id) — not the text, and the surviving docs
    are fetched with a hash-partitioned semi-join (no broadcast winner
    set).  The collect+sort here is the driver-contract presentation of
    the result; at scale the returned Dataset streams to write_parquet."""
    from ..functions.dedup import dedup_exact_fingerprint

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_exact_fingerprint(ds, id_col="doc_id", text_col="text")
    return _to_table(out).select(["text", "doc_id"]).sort_by("doc_id")


def q_dedup_minhash(sf_dir: str):
    """Near-dup clusters over documents (MinHash+LSH; approximate — no SQL
    oracle, driver records rows-only).  The in-query self-asserts pin what
    CAN be pinned: every retained cluster edge passed the exact k-shingle
    Jaccard verify (edge precision 1.0 by construction — asserted so the
    verify pass can't be silently bypassed), and the driver-side
    collections (edge records, candidate-text fetch) stay bounded by the
    candidate set, never O(corpus)."""
    from ..functions.dedup import dedup_minhash

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    stats: dict = {}
    out = dedup_minhash(ds, id_col="doc_id", text_col="text", stats_out=stats)
    if stats["min_edge_jaccard"] is not None:
        assert stats["min_edge_jaccard"] >= 0.5, stats
    assert stats["verified_pairs"] <= stats["candidate_pairs"], stats
    # candidate-text fetch is bounded by the pair set (<= 2 docs/pair)
    assert stats["fetched_docs"] <= 2 * max(stats["candidate_pairs"], 1), stats
    return out


def q_dedup_ngram(sf_dir: str):
    """Exact byte-8-gram Jaccard near-dup pairs at threshold 0.5 over
    rare-shingle sets (stop-shingles with document frequency > 16 are
    excluded on BOTH sides — the df cap that bounds the inverted index's
    pair emission); the threshold test is pure integer arithmetic
    (2*inter >= union), so the SQL self-join oracle matches
    bit-exactly (functions/dedup.dedup_ngram_jaccard).  The oracle's char
    substrings equal the engine's byte windows because this corpus is
    ASCII; on non-ASCII data the SQL mirror would need byte semantics."""
    from ..functions.dedup import dedup_ngram_jaccard

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_ngram_jaccard(ds, id_col="doc_id", text_col="text")


def q_dedup_canonical(sf_dir: str):
    """End-to-end corpus deduplication — the operation an LLM-data user
    actually runs: exact n-gram Jaccard pairs (threshold 0.5, the
    dedup_ngram operator) -> connected components over the dup graph ->
    one canonical survivor (min doc_id) per cluster -> a per-document
    (canonical, kept) assignment over the full corpus.

    Scale shape: the pair/edge set is bounded by the near-dup rate (not
    the corpus); components run through the adaptive pointer-doubling
    backend; the per-doc assignment joins the doc_id stream against the
    O(clustered docs) label table via join_adaptive (broadcast below the
    threshold, hash-shuffle above) — nothing O(corpus) concentrates on
    the driver beyond this query's own returned assignment table.  The
    SQL mirror computes the same components with a recursive
    transitive-closure CTE, so the whole composition is oracle-exact."""
    from ..functions.dedup import dedup_ngram_jaccard
    from ..functions.graph import connected_components
    from ..functions.joins import join_adaptive

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup_ngram_jaccard(ds, id_col="doc_id", text_col="text")
    docs = _decoded(sf_dir, "documents", columns=["doc_id"])
    if pairs.num_rows == 0:
        ids = _to_table(docs)
        return pa.table(
            {
                "doc_id": ids.column("doc_id"),
                "canonical": ids.column("doc_id"),
                "kept": pa.array(np.ones(ids.num_rows, np.int64)),
            }
        ).sort_by("doc_id")
    edges = ray.data.from_arrow(
        pa.table({"a": pairs.column("doc_a"), "b": pairs.column("doc_b")})
    )
    labels = connected_components(edges)  # (node, label=min id of component)
    joined = join_adaptive(docs, labels, "doc_id", "node", ["label"], how="left")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "canonical": pa.array([], pa.int64()),
                    "kept": pa.array([], pa.int64()),
                }
            )
        canon = pc.coalesce(t.column("label").cast(pa.int64()), t.column("doc_id"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "canonical": canon,
                "kept": pc.equal(canon, t.column("doc_id")).cast(pa.int64()),
            }
        )

    return _to_table(
        joined.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("doc_id")


def q_prefix_clusters(sf_dir: str):
    """Prefix-bucket near-dup PREFILTER: documents sharing their first
    16 bytes of text, with each bucket's canonical (min doc_id) — the
    cheap O(1)-per-doc pass large pipelines run BEFORE shingle-level
    dedup to knock out boilerplate/templated heads.  Per-batch prefix
    extraction + in-batch combine, ONE agg_by_keys over the prefix
    (count + min doc), HAVING count > 1 applied per block — only
    actual clusters reach the driver."""
    from ..functions.aggregates import agg_by_keys

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def prefixes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prefix": pc.utf8_slice_codeunits(t.column("text"), 0, 16),
                "doc_id": t.column("doc_id"),
            }
        )

    agg = agg_by_keys(
        ds.map_batches(prefixes, batch_format="pyarrow", zero_copy_batch=True),
        ["prefix"],
        [("doc_id", "count_all", "n_docs"), ("doc_id", "min", "canonical")],
    )

    def clusters(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "canonical": pa.array([], pa.int64()),
                }
            )
        return t.filter(pc.greater(t.column("n_docs"), 1))

    return _to_table(
        agg.map_batches(clusters, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("prefix")


def q_simhash(sf_dir: str):
    """Per-document 64-bit SimHash fingerprints (rows-only: hash values
    are estimator-specific).  In-query self-assert: hamming distance must
    be MONOTONE in text similarity — for a bounded sample of real corpus
    texts, a lightly-perturbed copy (one appended word, Jaccard ~1) must
    sit strictly closer in hamming space than an unrelated document, on
    average.  That is the property SimHash exists to provide (Charikar
    2002); a kernel regression (bit order, token window, sign flip) breaks
    it loudly instead of producing plausible garbage fingerprints."""
    from ..functions.dedup import _varbytes, simhash64

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        concat, offsets = _varbytes(t.column("text"))
        h = simhash64(concat, offsets)
        return pa.table({"doc_id": t.column("doc_id"), "simhash": pa.array(h.view(np.int64))})

    out = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    # --- monotonicity self-assert over a bounded driver-side sample
    sample = pa.table(ds.limit(64).take_batch(64, batch_format="pyarrow"))
    texts = [t for t in sample.column("text").to_pylist() if t]
    if len(texts) >= 8:
        near = [t + " extra" for t in texts]  # J(text, near) ~ 1
        far = texts[1:] + texts[:1]  # unrelated documents
        def hashes(ts):
            concat, offsets = _varbytes(pa.array(ts))
            return simhash64(concat, offsets)
        h0, hn, hf = hashes(texts), hashes(near), hashes(far)
        d_near = np.mean(np.unpackbits((h0 ^ hn).view(np.uint8)).reshape(len(texts), -1).sum(1))
        d_far = np.mean(np.unpackbits((h0 ^ hf).view(np.uint8)).reshape(len(texts), -1).sum(1))
        assert d_near < d_far, (d_near, d_far)

    return out


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (exact, threshold 0.4):
    IVF-sorted blocks + one task per surviving block pair with exact
    spherical-cap pruning — no corpus broadcast, no driver-side matrix
    (functions/similarity.py cosine_pairs)."""
    from ..functions.similarity import cosine_pairs

    ds = _decoded(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs(ds, threshold=0.4)


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): semantic deduplication at the
    EMBEDDING level — cosine near-dup pairs over the vector space,
    connected components over the similarity graph, one canonical
    survivor (min vec_id) per semantic cluster, and the full per-vector
    (canonical, kept) assignment.  The paper buckets by k-means cluster
    before the pair scan; this engine's cosine_pairs gets the same
    bucketing from IVF-sorted blocks with EXACT spherical-cap pruning,
    so the composition stays oracle-exact end to end (threshold 0.4 —
    eps = 0.6 in the paper's 1-eps terms; vectors with null rows/
    elements can't pair and keep themselves).

    Composition of three proved operators: q_dedup_embedding's pair
    scan, pointer-doubling connected components (O(log diameter)
    rounds), and the adaptive canonical join — the dedup_canonical
    shape lifted from text shingles to embeddings."""
    from ..functions.graph import connected_components
    from ..functions.joins import join_adaptive

    pairs = q_dedup_embedding(sf_dir)
    vecs = _decoded(sf_dir, "embeddings", columns=["vec_id"])
    if pairs.num_rows == 0:
        ids = _to_table(vecs)
        return pa.table(
            {
                "vec_id": ids.column("vec_id"),
                "canonical": ids.column("vec_id"),
                "kept": pa.array(np.ones(ids.num_rows, np.int64)),
            }
        ).sort_by("vec_id")
    edges = ray.data.from_arrow(
        pa.table({"a": pairs.column("vec_id_a"), "b": pairs.column("vec_id_b")})
    )
    labels = connected_components(edges)
    joined = join_adaptive(vecs, labels, "vec_id", "node", ["label"], how="left")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "canonical": pa.array([], pa.int64()),
                    "kept": pa.array([], pa.int64()),
                }
            )
        canon = pc.coalesce(t.column("label").cast(pa.int64()), t.column("vec_id"))
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "canonical": canon,
                "kept": pc.equal(canon, t.column("vec_id")).cast(pa.int64()),
            }
        )

    return _to_table(
        joined.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("vec_id")


def q_dup_windows(sf_dir: str):
    """Exact duplicated-substring stats (Lee et al. 2022 family): per doc,
    how many 32-byte windows occur >= 2 times corpus-wide.  Rolling-hash
    candidate pass + exact gram-word verify pass through distributed
    sum_by_keys (functions/substring.py) — the corpus text never shuffles;
    the driver holds only the duplicated hash/gram sets (ceiling asserted
    so duplicate-volume growth can't silently regress it)."""
    from ..functions.substring import dup_window_stats

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    stats: dict = {}
    out = _to_table(dup_window_stats(ds, stats_out=stats)).sort_by("doc_id")
    # driver state is the dup-hash + dup-gram sets only: bounded by the
    # corpus's duplicate volume (<= total windows, and at this corpus a
    # small fraction of it), never by corpus size
    assert stats["driver_rows"] <= 2 * max(stats["dup_hashes"], 1) + stats["dup_grams"], stats
    assert stats["dup_grams"] <= stats["dup_hashes"], stats
    return out


def q_dedup_substrings(sf_dir: str):
    """Duplicated-span CUT (the Lee et al. dedup transform): every byte
    covered by a duplicated 32-byte window is removed; docs left empty are
    dropped.  Same two-pass exact dup-gram set as q_dup_windows, then one
    vectorized coverage pass (+1/-1 prefix sum) rebuilds the survivors."""
    from ..functions.substring import cut_dup_spans

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    stats: dict = {}
    out = _to_table(cut_dup_spans(ds, stats_out=stats)).sort_by("doc_id")
    assert stats["dup_grams"] <= stats["dup_hashes"], stats
    return out


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
def q_dup_source_matrix(sf_dir: str):
    """Cross-source duplication attribution: how many duplicate-document
    PAIRS each (source, source) combination contributes, keyed on the
    16-char text-prefix buckets prefix_clusters prefilters on — the
    report a curation team reads to see WHERE boilerplate flows between
    corpus slices (cc↔cc template spam vs wiki→forums mirroring).

    Scale shape: ONE sum_by_keys over (prefix, source) is the only
    shuffle.  Per block of the keyed stream, interior prefix runs
    scatter into an (runs × S) count matrix (S = distinct sources,
    broadcast once — the matrix is O(S²) by construction) and the
    block's pair contribution is ONE matmul Mᵀ·M; only the ≤2 runs
    touching each block edge reach the driver and heal with the same
    kernel.  Driver state: S×S partial sums, never O(prefixes).
    Cross-pairs(s1,s2) = Σ_fp c_s1·c_s2 (off-diagonal); within-pairs =
    (diag − Σc)/2.  Null sources form their own lane, ordered last."""
    from ..functions.aggregates import (
        _group_starts,
        _key_detection_np,
        _restore_null_keys,
        _sorted_for_keys,
        sum_by_keys,
    )

    ds = _decoded(sf_dir, "documents", columns=["text", "source"])

    def prefixes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prefix": pc.utf8_slice_codeunits(t.column("text"), 0, 16),
                "source": t.column("source"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    counts = sum_by_keys(
        ds.map_batches(prefixes, batch_format="pyarrow", zero_copy_batch=True),
        ["prefix", "source"],
        "one",
        out="c",
    )
    # sum_by_keys guarantees each (prefix, source) GROUP is complete, but
    # its healed boundary groups re-enter as an appended block — so one
    # prefix's source-rows can sit in non-adjacent blocks, which would
    # silently drop their cross pairs from the interior matmul.  One more
    # keyed sort of the (much smaller) counts stream restores global
    # prefix contiguity; the edge-run heal then covers exactly the <=2
    # block-spanning prefixes per block.
    counts, _aux = _sorted_for_keys(counts, ["prefix", "source"])
    keys_aux = list(_aux)
    # global source list (tiny): ascending, nulls last — the pair order.
    # Derived from the MATERIALIZED counts stream, not the lazy decoded
    # dataset: a second `ds` scan would re-decode the whole corpus (text
    # column included) just to list the distinct sources.  The sorted
    # stream carries the null-fill aux columns, so restore before unique.
    def _collect_sources(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table({"source": pa.array([], pa.string())})
        if _aux and _aux[0] in t.column_names:
            t = _restore_null_keys(t, ["prefix", "source"], list(_aux))
        return pa.table({"source": t.column("source").unique()})

    src_t = _to_table(
        counts.map_batches(_collect_sources, batch_format="pyarrow", zero_copy_batch=True)
    )
    src_vals = sorted({s for s in src_t.column("source").to_pylist() if s is not None})
    has_null = src_t.column("source").null_count > 0
    sources = src_vals + ([None] if has_null else [])
    S = len(sources)
    lookup = pa.array(src_vals, pa.string())

    def _src_idx(arr: pa.Array) -> np.ndarray:
        pos = pc.index_in(arr, value_set=lookup).to_numpy(zero_copy_only=False)
        return np.where(np.isnan(pos.astype(np.float64)), S - 1, pos).astype(np.int64)

    def block_matrix(t: pa.Table) -> pa.Table:
        if keys_aux and keys_aux[0] in t.column_names:
            t = _restore_null_keys(t, ["prefix", "source"], keys_aux)
        n = t.num_rows
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "i": pa.array([], pa.int32()),
                "j": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
                "prefix": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        det = _key_detection_np(t, ["prefix"])
        starts = _group_starts(det)
        nruns = starts.size
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts[1:]] = 1
        np.cumsum(run_id, out=run_id)
        interior = (run_id > 0) & (run_id < nruns - 1)
        parts = []
        if interior.any():
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            si = _src_idx(t.column("source").combine_chunks())
            M = np.zeros((nruns, S), dtype=np.int64)
            sel = np.flatnonzero(interior)
            M[run_id[sel], si[sel]] = c[sel]
            G = M.T @ M  # S×S pair partial for this block's interior runs
            csum = np.zeros(S, dtype=np.int64)
            np.add.at(csum, si[sel], c[sel])
            G[np.diag_indices(S)] -= csum  # diag now Σc²−Σc = 2·within
            ii, jj = np.nonzero(G)
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.zeros(ii.size, np.int8)),
                        "i": pa.array(ii.astype(np.int32)),
                        "j": pa.array(jj.astype(np.int32)),
                        "n": pa.array(G[ii, jj]),
                        "prefix": pa.nulls(ii.size, pa.string()),
                        "source": pa.nulls(ii.size, pa.string()),
                        "c": pa.nulls(ii.size, pa.int64()),
                    }
                )
            )
        edge = ~interior
        if edge.any():
            e = t.filter(pa.array(edge))
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.ones(e.num_rows, np.int8)),
                        "i": pa.nulls(e.num_rows, pa.int32()),
                        "j": pa.nulls(e.num_rows, pa.int32()),
                        "n": pa.nulls(e.num_rows, pa.int64()),
                        "prefix": e.column("prefix"),
                        "source": e.column("source"),
                        "c": e.column("c"),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else empty

    gathered = _to_table(
        counts.map_batches(block_matrix, batch_format="pyarrow", zero_copy_batch=True)
    )
    G = np.zeros((S, S), dtype=np.int64)
    if gathered.num_rows:
        mat = gathered.filter(pc.equal(gathered.column("kind"), 0))
        if mat.num_rows:
            np.add.at(
                G,
                (
                    mat.column("i").to_numpy(zero_copy_only=False).astype(np.int64),
                    mat.column("j").to_numpy(zero_copy_only=False).astype(np.int64),
                ),
                mat.column("n").to_numpy(zero_copy_only=False),
            )
        edge = gathered.filter(pc.equal(gathered.column("kind"), 1))
        if edge.num_rows:  # heal boundary prefixes with the same kernel
            e = edge.select(["prefix", "source", "c"]).sort_by(
                [("prefix", "ascending"), ("source", "ascending")]
            )
            det = _key_detection_np(e, ["prefix"])
            starts = _group_starts(det)
            run_id = np.zeros(e.num_rows, dtype=np.int64)
            run_id[starts[1:]] = 1
            np.cumsum(run_id, out=run_id)
            c = e.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            si = _src_idx(e.column("source").combine_chunks())
            M = np.zeros((starts.size, S), dtype=np.int64)
            M[run_id, si] = c
            Ge = M.T @ M
            csum = np.zeros(S, dtype=np.int64)
            np.add.at(csum, si, c)
            Ge[np.diag_indices(S)] -= csum
            G += Ge
    # report: cross pairs from the upper triangle, within from diag/2
    rows = []
    for i in range(S):
        w = G[i, i] // 2
        if w > 0:
            rows.append((sources[i], sources[i], int(w)))
        for j in range(i + 1, S):
            if G[i, j] > 0:
                rows.append((sources[i], sources[j], int(G[i, j])))
    rows.sort(key=lambda r: ((r[0] is None, r[0] or ""), (r[1] is None, r[1] or "")))
    return pa.table(
        {
            "s1": pa.array([r[0] for r in rows], pa.string()),
            "s2": pa.array([r[1] for r in rows], pa.string()),
            "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ORACLE_SQL = {
    "dup_source_matrix": """
        WITH f AS (SELECT substr(text, 1, 16) AS fp, source FROM documents),
        c AS (SELECT fp, source, COUNT(*) AS c FROM f GROUP BY fp, source),
        x AS (
            SELECT a.source AS s1, b.source AS s2, SUM(a.c * b.c) AS n
            FROM c a JOIN c b ON a.fp IS NOT DISTINCT FROM b.fp
             AND (a.source < b.source OR (a.source IS NOT NULL AND b.source IS NULL))
            GROUP BY a.source, b.source
        ),
        w AS (
            SELECT source AS s1, source AS s2, SUM(c * (c - 1) // 2) AS n
            FROM c WHERE c > 1 GROUP BY source
        )
        SELECT s1, s2, CAST(n AS BIGINT) AS n_pairs
        FROM (SELECT * FROM x UNION ALL SELECT * FROM w)
        WHERE n > 0
        ORDER BY s1 NULLS LAST, s2 NULLS LAST
    """,
    "dup_windows": """
        WITH w AS (
            SELECT doc_id, CAST(UNNEST(range(GREATEST(length(text) - 31, 0)))
                   AS BIGINT) AS i, text
            FROM documents
        ),
        g AS (SELECT doc_id, i, substr(text, CAST(i + 1 AS INT), 32) AS gram FROM w),
        c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram)
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
        FROM g JOIN c USING (gram)
        GROUP BY g.doc_id ORDER BY g.doc_id
    """,
    "dedup_substrings": """
        WITH w AS (
            SELECT doc_id, CAST(UNNEST(range(GREATEST(length(text) - 31, 0)))
                   AS BIGINT) AS i, text
            FROM documents
        ),
        g AS (SELECT doc_id, i, substr(text, CAST(i + 1 AS INT), 32) AS gram FROM w),
        c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        f AS (SELECT g.doc_id, g.i FROM g JOIN c USING (gram)),
        p AS (
            SELECT doc_id, CAST(UNNEST(range(length(text))) AS BIGINT) AS j, text
            FROM documents
        ),
        k AS (
            SELECT p.doc_id, p.j, substr(p.text, CAST(p.j + 1 AS INT), 1) AS ch
            FROM p
            WHERE NOT EXISTS (
                SELECT 1 FROM f
                WHERE f.doc_id = p.doc_id AND f.i BETWEEN p.j - 31 AND p.j
            )
        )
        SELECT doc_id, string_agg(ch, '' ORDER BY j) AS clean_text
        FROM k GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup_exact": """
        SELECT text, MIN(doc_id) AS doc_id FROM documents
        GROUP BY text ORDER BY doc_id
    """,
    "dedup_embedding": """
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS sim_e6
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL
                AND len(list_filter(embedding, x -> x IS NULL)) = 0) a,
             (SELECT * FROM embeddings WHERE embedding IS NOT NULL
                AND len(list_filter(embedding, x -> x IS NULL)) = 0) b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) > 0.4
        ORDER BY vec_id_a, vec_id_b
    """,
    "semdedup": """
        WITH RECURSIVE v AS (
            SELECT * FROM embeddings WHERE embedding IS NOT NULL
              AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ),
        pairs AS (
            SELECT a.vec_id AS pa, b.vec_id AS pb
            FROM v a, v b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) > 0.4
        ),
        e AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION ALL SELECT pb, pa FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM e
            UNION
            SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        ),
        mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a)
        SELECT d.vec_id,
               LEAST(d.vec_id, COALESCE(m.mn, d.vec_id)) AS canonical,
               CASE WHEN LEAST(d.vec_id, COALESCE(m.mn, d.vec_id)) = d.vec_id
                    THEN 1 ELSE 0 END AS kept
        FROM embeddings d LEFT JOIN mins m ON m.a = d.vec_id
        ORDER BY d.vec_id
    """,
    "dedup_ngram": """
        WITH sh AS (
            -- BYTE windows, exactly like the engine's rolling hash:
            -- to_hex(encode(text)) maps each byte to 2 hex chars, so an
            -- 8-byte window at byte offset u is the 16-char hex slice at
            -- 2u+1 — bijective, so DISTINCT/COUNT are unchanged, and
            -- non-ASCII text (multi-byte UTF-8) matches byte semantics
            SELECT DISTINCT doc_id,
                   substr(hx, CAST(2 * u + 1 AS INTEGER), 16) AS s
            FROM (
                SELECT doc_id, to_hex(encode(text)) AS hx,
                       unnest(range(0, octet_length(encode(text)) - 7)) AS u
                FROM documents WHERE octet_length(encode(text)) >= 8
            )
        ),
        keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 16),
        shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
        p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.doc_a, p.doc_b, p.inter, (sa.n + sb.n - p.inter) AS un
        FROM p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        WHERE 2 * p.inter >= (sa.n + sb.n - p.inter)
        ORDER BY p.doc_a, p.doc_b
    """,
    "prefix_clusters": """
        SELECT substr(text, 1, 16) AS prefix,
               COUNT(*) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS canonical
        FROM documents
        GROUP BY prefix HAVING COUNT(*) > 1
        ORDER BY prefix
    """,
    "dedup_canonical": """
        WITH RECURSIVE sh AS (
            SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 8) AS s
            FROM (
                SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS u
                FROM documents WHERE length(text) >= 8
            )
        ),
        keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 16),
        shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
        p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT p.doc_a, p.doc_b
            FROM p
            JOIN sizes sa ON sa.doc_id = p.doc_a
            JOIN sizes sb ON sb.doc_id = p.doc_b
            WHERE 2 * p.inter >= (sa.n + sb.n - p.inter)
        ),
        e AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM e
            UNION
            SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        ),
        mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a)
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS canonical,
               CASE WHEN LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) = d.doc_id
                    THEN 1 ELSE 0 END AS kept
        FROM documents d LEFT JOIN mins m ON m.a = d.doc_id
        ORDER BY d.doc_id
    """,
}
