"""Text analysis: token stats, quality, lang-id, fingerprints, terms, vocab, masking.

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


def q_text_stats(sf_dir: str):
    """Vectorized text analysis over the decoded stream."""
    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_chars = pc.utf8_length(text)
        no_sp = pc.replace_substring(text, pattern=" ", replacement="")
        n_spaces = pc.subtract(n_chars, pc.utf8_length(no_sp))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars_calc": n_chars.combine_chunks() if isinstance(n_chars, pa.ChunkedArray) else n_chars,
                "n_spaces": n_spaces,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def q_token_counts(sf_dir: str):
    from ..functions.text import token_counts

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(token_counts, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).select(["doc_id", "n_ws_tokens"])


def q_quality_scores(sf_dir: str):
    """Quality signals as floor-e6 integers: the ratio/clip/weighted-sum
    arithmetic is plain IEEE doubles in a fixed order, so the SQL oracle
    reproduces the integers bit-exactly (functions/text.quality_score)."""
    import functools

    from ..functions.text import quality_score

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        functools.partial(quality_score, scale_e6=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _to_table(out).sort_by("doc_id")


def _quality_oracle_sql() -> str:
    from ..functions.text import _STOPWORDS

    sw = ",".join(f"('{w}')" for w in sorted(_STOPWORDS["en"]))
    # mirrors quality_score op-for-op in IEEE doubles (same literals, same
    # left-assoc order); clip(x,0,1) == LEAST(GREATEST(x,0.0),1.0)
    return f"""
        WITH sw(word) AS (VALUES {sw}),
        base AS (
            -- COALESCE: null doc == empty doc (the kernel's fill_null);
            -- list_filter: no phantom '' words on tab-padded docs
            SELECT doc_id, COALESCE(text, '') AS text,
                   CAST(LENGTH(COALESCE(text, '')) AS DOUBLE) AS n,
                   GREATEST(CAST(LENGTH(COALESCE(text, '')) AS DOUBLE), 1.0) AS nz,
                   len(list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                                   x -> x <> '')) AS nw
            FROM documents
        ),
        words AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ),
        hits AS (
            SELECT words.doc_id, COUNT(*) AS h FROM words
            JOIN sw ON words.w = sw.word GROUP BY words.doc_id
        ),
        ratios AS (
            SELECT b.doc_id,
                   (b.n - LENGTH(regexp_replace(b.text, '[^\\w\\s]', '', 'g'))) / b.nz AS punct,
                   (b.n - LENGTH(regexp_replace(b.text, '[0-9]', '', 'g'))) / b.nz AS digits,
                   (b.n - LENGTH(regexp_replace(b.text, '[A-Z]', '', 'g'))) / b.nz AS upper_r,
                   COALESCE(h.h, 0) / CAST(GREATEST(b.nw, 1) AS DOUBLE) AS swr,
                   LEAST(GREATEST(b.n / 500.0, 0.0), 1.0) AS len_score
            FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
        )
        SELECT doc_id,
               CAST(FLOOR(punct * 1000000.0) AS BIGINT) AS punct_ratio_e6,
               CAST(FLOOR(digits * 1000000.0) AS BIGINT) AS digit_ratio_e6,
               CAST(FLOOR(upper_r * 1000000.0) AS BIGINT) AS upper_ratio_e6,
               CAST(FLOOR(swr * 1000000.0) AS BIGINT) AS stopword_ratio_e6,
               CAST(FLOOR(LEAST(GREATEST(
                    0.35 * len_score
                    + 0.3 * LEAST(GREATEST(swr * 3, 0.0), 1.0)
                    + 0.2 * (1 - LEAST(GREATEST(punct * 4, 0.0), 1.0))
                    + 0.15 * (1 - LEAST(GREATEST(digits * 5, 0.0), 1.0)),
                    0.0), 1.0) * 1000000.0) AS BIGINT) AS quality_e6
        FROM ratios ORDER BY doc_id
    """


def q_lang_id(sf_dir: str):
    """Language-ID heuristic.  The prediction column is oracle-checked:
    the winner is an argmax over INTEGER stopword hit counts (ties to the
    lexicographically larger language, 'unk' at zero hits), which SQL
    reproduces exactly — no float comparisons involved."""
    from ..functions.text import lang_id

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(lang_id, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).select(["doc_id", "lang_pred"]).sort_by("doc_id")


def _lang_pred_ctes() -> str:
    """Shared CTE prefix computing (doc_id, lang_pred) — used by the
    lang_id oracle and every query that composes on top of it."""
    from ..functions.text import _STOPWORDS

    rows = ",".join(
        f"('{lg}','{w}')" for lg in sorted(_STOPWORDS) for w in sorted(_STOPWORDS[lg])
    )
    return f"""
        WITH stopwords(lang, word) AS (VALUES {rows}),
        words AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ),
        hits AS (
            SELECT words.doc_id, s.lang, COUNT(*) AS h
            FROM words JOIN stopwords s ON words.w = s.word
            GROUP BY words.doc_id, s.lang
        ),
        best AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY h DESC, lang DESC) AS rn
            FROM hits
        ),
        lang AS (
            SELECT d.doc_id, COALESCE(b.lang, 'unk') AS lang_pred
            FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
        )"""


def _lang_id_oracle_sql() -> str:
    return _lang_pred_ctes() + """
        SELECT doc_id, lang_pred FROM lang ORDER BY doc_id"""


def q_fingerprints(sf_dir: str):
    """Document fingerprints in md5 mode — oracle-checkable against
    DuckDB's md5() (r2 verdict item 6).  The engine's fast path for
    internal fingerprinting stays the one-pass vectorized content_hash64
    (exercised by dedup_exact); FNV-1a remains as a reference impl."""
    from ..functions.text import fingerprint_md5

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint_md5, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).select(["doc_id", "fp_md5"]).sort_by("doc_id")


def q_token_histogram(sf_dir: str):
    """Top-50 whitespace tokens by frequency: vectorized split/flatten +
    per-batch value_counts (partial combine), merged by a small groupby."""
    from ..functions.text import _ws_words

    K = 50
    ds = _decoded(sf_dir, "documents", columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks() if isinstance(t.column("text"), pa.ChunkedArray) else t.column("text")
        _, flat, _ = _ws_words(text)
        vc = pc.value_counts(flat)
        tok = vc.field("values")
        cnt = vc.field("counts")
        keep = pc.not_equal(tok, "")  # empty docs split to [""] — drop
        return pa.table({"token": tok.filter(keep), "cnt": cnt.filter(keep).cast(pa.int64())})

    # distributed global sum per token (the vocabulary is unbounded at
    # scale — the full distinct-token table must never reach the driver),
    # then local top-K per aggregated batch; the driver merges only
    # K-per-batch candidates.  agg_by_keys keeps the per-token reduce in
    # Arrow C++ instead of Ray aggregate's per-group Python.
    from ..functions.aggregates import agg_by_keys

    summed = agg_by_keys(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        ["token"],
        [("cnt", "sum", "cnt_total")],
    )

    def _topk(t: pa.Table, tok_col: str, cnt_col: str) -> pa.Table:
        # vectorized (-cnt, token) top-K: one lexsort, no to_pylist/sorted
        cnt = t.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tokens = t.column(tok_col).to_numpy(zero_copy_only=False)  # <U strings
        order = np.lexsort((tokens, -cnt))[:K]
        idx = pa.array(order)
        return pa.table(
            {
                "token": pc.take(t.column(tok_col), idx),
                "cnt": pa.array(cnt[order]),
            }
        )

    cands = _to_table(
        summed.map_batches(
            functools.partial(_topk, tok_col="token", cnt_col="cnt_total"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return _topk(cands, "token", "cnt")


def q_scrub_pii(sf_dir: str):
    """PII scrubbing over the decoded stream: emails and phone-shaped
    runs replaced with typed placeholders (functions/mask.py scrub_pii —
    the standard text-curation privacy pass, vectorized RE2)."""
    from ..functions.mask import mask_columns

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    return _to_table(mask_columns(ds, {"text": "scrub_pii"})).sort_by("doc_id")


def _scrub_pii_oracle_sql() -> str:
    from ..functions.mask import _EMAIL_RE, _PHONE_RE

    e = _EMAIL_RE.replace("'", "''")
    p = _PHONE_RE.replace("'", "''")
    return f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text,
                   '{e}', '[EMAIL]', 'g'),
                   '{p}', '[PHONE]', 'g') AS text
        FROM documents ORDER BY doc_id
    """


def q_masked_export(sf_dir: str):
    """Masked export of documents (the DataMask analog, functions/mask.py):
    text redacted (x/X/9 char map), source sha256-hashed, lang nullified —
    applied to the engine-decoded stream, as a write-side mask would be."""
    from ..functions.mask import mask_columns

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    out = mask_columns(ds, {"text": "redact", "source": "sha256", "lang": "nullify"})
    return _to_table(out).sort_by("doc_id")


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (functions/decontam.py): docs whose md5
    bucket is '0' form the held-out benchmark; any other doc sharing a
    word 4-gram with it is dropped.  The benchmark gram set is broadcast
    once (ray.put) — zero shuffle; the training pass streams.  Real
    pipelines use 13-grams of a true eval set; n=4 keeps the overlap
    non-trivial on this tiny-vocab corpus."""
    from ..functions.decontam import decontaminate

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = decontaminate(ds, n=4)
    return _to_table(out).select(["doc_id"]).sort_by("doc_id")


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition metrics per doc (functions/text.py):
    top-word fraction + duplicate-2-gram fraction, floor-e6 integers.
    Pure per-batch map — embarrassingly parallel at any scale."""
    from ..functions.text import repetition_stats

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(repetition_stats, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).sort_by("doc_id")


def q_salient_terms(sf_dir: str):
    """Per-source salient terms: top-10 words by in-source count after
    dropping corpus-wide stop words (document frequency > 79% of docs) —
    integer-exact, so the SQL window mirror hash-matches.

    Shape: per-batch Arrow group_by combiner emits fused tf + df partial
    rows -> ONE sum_by_keys over the composite key (kind, source, w) (the
    dedup_ngram fusion pattern) -> the stop LIST (rare by Zipf: only the
    most common words exceed the cap) is the one driver-side object,
    broadcast back as an is_in filter -> distributed window rank
    (with_group_ranks) takes the per-source top-10."""
    from ..functions.aggregates import sum_by_keys, with_group_ranks
    from ..functions.text import word_tf_df_rows
    from ..pipeline.decode import count_rows

    # n_docs from the manifest's per-chunk row counts (the ORC footer
    # numberOfRows rollup) — no extra decode pass (r3 verdict item 6)
    n_docs = count_rows(store_for(sf_dir, "documents"), trust_stats=True)
    ds = _decoded(sf_dir, "documents", columns=["text", "source"])
    rows = ds.map_batches(word_tf_df_rows, batch_format="pyarrow", zero_copy_batch=True)
    fused = sum_by_keys(rows, ["kind", "source", "w"], "c", out="cnt").materialize()

    def df_stop(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t.column("kind"), 1))
        mask = pc.greater(pc.multiply(sub.column("cnt"), 100), 79 * n_docs)
        return pa.table({"w": sub.column("w").filter(mask)})

    stop_parts = [
        p
        for p in fused.map_batches(
            df_stop, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if p.num_rows
    ]
    stop = (
        pa.concat_tables(stop_parts).column("w").combine_chunks() if stop_parts else None
    )

    def tf_rows(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t.column("kind"), 0))
        if stop is not None:
            sub = sub.filter(pc.invert(pc.is_in(sub.column("w"), value_set=stop)))
        return pa.table(
            {"source": sub.column("source"), "w": sub.column("w"), "tf": sub.column("cnt")}
        )

    tf = fused.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
    ranked = with_group_ranks(tf, ["source"], ["tf", "w"], descending=[True, False])

    def top10(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return t.filter(pc.less_equal(t.column("rnk"), 10))

    out = _to_table(ranked.map_batches(top10, batch_format="pyarrow", zero_copy_batch=True))
    return out.sort_by([("source", "ascending"), ("rnk", "ascending")])


def q_vocab_table(sf_dir: str):
    """Tokenizer-prep vocabulary table: global term document-frequency
    (distinct docs) and term-frequency (occurrences), pruned at
    min_df=5, top-100 by (df DESC, tok) — the vocabulary-building pass
    in front of a BPE/unigram tokenizer training run.

    Shape: the same fused tf/df combiner as salient_terms
    (word_tf_df_rows) -> ONE sum_by_keys over (kind, w) (summing kind-0
    partials across sources IS the global tf; kind-1 partials sum to the
    exact df because each doc lives in one batch) -> per-block top-100
    df candidates (blocks cover disjoint key ranges, so block-local
    top-k + an O(blocks x k) driver merge is exact) -> the winning 100
    terms broadcast back as an is_in filter to pull their tf.  Nothing
    O(vocabulary) reaches the driver."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.text import word_tf_df_rows

    MIN_DF, K = 5, 100
    ds = _decoded(sf_dir, "documents", columns=["text", "source"])
    rows = ds.map_batches(word_tf_df_rows, batch_format="pyarrow", zero_copy_batch=True)
    fused = sum_by_keys(rows, ["kind", "w"], "c", out="cnt").materialize()

    def block_top(t: pa.Table) -> pa.Table:
        empty = pa.table({"w": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        sub = t.filter(
            pc.and_(pc.equal(t.column("kind"), 1), pc.greater_equal(t.column("cnt"), MIN_DF))
        )
        if sub.num_rows == 0:
            return empty
        cand = pa.table({"w": sub.column("w"), "df": sub.column("cnt")})
        return cand.sort_by([("df", "descending"), ("w", "ascending")]).slice(0, K)

    cands = _to_table(fused.map_batches(block_top, batch_format="pyarrow", zero_copy_batch=True))
    top = cands.sort_by([("df", "descending"), ("w", "ascending")]).slice(0, K)
    keys = top.column("w").combine_chunks()

    def tf_match(t: pa.Table, *, keys=keys) -> pa.Table:
        sub = t.filter(
            pc.and_(pc.equal(t.column("kind"), 0), pc.is_in(t.column("w"), value_set=keys))
        )
        return pa.table({"w": sub.column("w"), "tf": sub.column("cnt")})

    tf = _to_table(fused.map_batches(tf_match, batch_format="pyarrow", zero_copy_batch=True))
    tf_of = dict(zip(tf.column("w").to_pylist(), tf.column("tf").to_pylist()))
    toks = top.column("w").to_pylist()
    return pa.table(
        {
            "tok": pa.array(toks, pa.string()),
            "df": top.column("df"),
            "tf": pa.array([tf_of[w] for w in toks], pa.int64()),
        }
    )


def q_source_collocations(sf_dir: str):
    """Top-5 adjacent word bigrams PER SOURCE (grouped collocations —
    the per-domain phrase signature used to spot templated sources):
    per-batch pre-aggregated bigram emission with the source key
    attached, ONE sum_by_keys over (src, w1, w2), then the distributed
    window rank takes each source's top 5 with a fully deterministic
    tie order."""
    import functools

    from ..functions.aggregates import sum_by_keys, with_group_ranks
    from ..functions.text import bigram_rows

    ds = _decoded(sf_dir, "documents", columns=["text", "source"])
    rows = ds.map_batches(
        functools.partial(bigram_rows, source_col="source"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = sum_by_keys(rows, ["src", "w1", "w2"], "c")
    ranked = with_group_ranks(
        counts, ["src"], ["c", "w1", "w2"], descending=[True, False, False]
    )

    def top5(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        return t.filter(pc.less_equal(t.column("rnk"), 5))

    out = _to_table(ranked.map_batches(top5, batch_format="pyarrow", zero_copy_batch=True))
    return pa.table(
        {
            "source": out.column("src"),
            "w1": out.column("w1"),
            "w2": out.column("w2"),
            "c": out.column("c"),
            "rnk": out.column("rnk"),
        }
    ).sort_by([("source", "ascending"), ("rnk", "ascending")])


def q_lexical_diversity(sf_dir: str):
    """Per-source lexical diversity: the corpus-level type-token ratio
    Σ(distinct words per doc) / Σ(words per doc), floored at e6 with
    EXACT integer arithmetic ((1e6 * Σd) // Σw — no float anywhere, so
    the SQL mirror is bit-identical).  A standard text-quality signal:
    templated/spammy sources score low, natural prose high.

    Shape: per-batch vectorized per-doc distinct-word counts (one Arrow
    group_by over (doc, word), then a count per doc); the per-source
    (Σ distinct, Σ total) partials reduce through ONE agg_by_keys —
    nothing O(vocabulary) or O(rows) leaves the batch stage."""
    from ..functions.aggregates import agg_by_keys
    from ..functions.text import _concat_np, _ws_words

    ds = _decoded(sf_dir, "documents", columns=["text", "source"])

    def per_doc(t: pa.Table) -> pa.Table:
        text = _concat_np(t.column("text"))
        off, flat, n_words = _ws_words(text)
        d = len(n_words)
        doc_of = np.repeat(np.arange(d, dtype=np.int64), np.diff(off))
        valid = n_words[doc_of] > 0  # mask the phantom '' of empty docs
        wtab = pa.table({"d": pa.array(doc_of[valid]), "w": flat.filter(pa.array(valid))})
        per = wtab.group_by(["d", "w"]).aggregate([])  # distinct (doc, word)
        dis = per.group_by("d").aggregate([([], "count_all")])
        distinct = np.zeros(d, np.int64)
        distinct[dis.column("d").to_numpy(zero_copy_only=False)] = (
            dis.column("count_all").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "source": t.column("source"),
                "w": pa.array(n_words.astype(np.int64)),
                "dw": pa.array(distinct),
            }
        )

    agg = agg_by_keys(
        ds.map_batches(per_doc, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("w", "sum", "sw"), ("dw", "sum", "sd")],
    )
    t = _to_table(agg).sort_by("source")
    sw = t.column("sw").to_numpy(zero_copy_only=False)
    sd = t.column("sd").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "source": t.column("source"),
            "ttr_e6": pa.array((1_000_000 * sd) // np.maximum(sw, 1)),
            "n_words": pa.array(sw),
        }
    )


def q_word_bigrams(sf_dir: str):
    """Corpus-wide top-50 adjacent word bigrams by count (ties broken by
    words ascending — a full deterministic ordering, so the SQL mirror's
    LIMIT picks the identical set).

    Shape: per-batch vectorized bigram extraction + Arrow group_by
    combiner -> ONE sum_by_keys over (w1, w2) -> per-block top-50 (blocks
    cover disjoint key ranges after the range sort, so block-local top-50
    then a driver merge over O(blocks * 50) rows is exact)."""
    from ..functions.aggregates import sum_by_keys
    from ..functions.text import bigram_rows

    sort_keys = [("cnt", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    ds = _decoded(sf_dir, "documents", columns=["text"])
    rows = ds.map_batches(bigram_rows, batch_format="pyarrow", zero_copy_batch=True)
    counts = sum_by_keys(rows, ["w1", "w2"], "c", out="cnt")

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= 50:
            return t
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:50])

    tbl = _to_table(counts.map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True))
    return tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys)[:50])


CHUNK_W, CHUNK_S = 200, 150  # window chars, stride (50-char overlap)


def q_chunk_passages(sf_dir: str):
    """Passage chunking (RAG / context-window prep): split each document
    into overlapping character windows of width 200 and stride 150 — the
    1->N flat-map expansion op.  Chunk count per doc is
    ceil(max(len-W,0)/S)+1, so the tail is always covered and no
    degenerate all-overlap windows are emitted.

    Fully vectorized: one utf8_length pass, then one utf8_slice_codeunits
    kernel per chunk ORDINAL (bounded by the longest doc, not the row
    count).  Streams block-by-block — no driver materialization, no
    shuffle at all."""
    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        # Null text counts as length 0 (one chunk whose value stays null,
        # matching substr(NULL) in the SQL mirror).  Without the coalesce
        # the null lane becomes NaN -> INT64_MIN -> wraps POSITIVE after
        # the -W subtraction, and the per-ordinal loop runs ~6e16 rounds.
        nc = (
            pc.coalesce(pc.utf8_length(text), pa.scalar(0, pa.int32()))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_chunks = np.ceil(np.maximum(nc - CHUNK_W, 0) / CHUNK_S).astype(np.int64) + 1
        parts = []
        for k in range(int(n_chunks.max()) if n_chunks.size else 0):
            mask = pa.array(n_chunks > k)
            sub = text.filter(mask)
            parts.append(
                pa.table(
                    {
                        "doc_id": t.column("doc_id").combine_chunks().filter(mask),
                        "chunk_id": pa.array(
                            np.full(len(sub), k, np.int32), pa.int32()
                        ),
                        "chunk": pc.utf8_slice_codeunits(
                            sub, start=k * CHUNK_S, stop=k * CHUNK_S + CHUNK_W
                        ),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], t.column("doc_id").type),
                    "chunk_id": pa.array([], pa.int32()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


def q_source_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources (corpus-drift
    analytics): |vocab(A) ∩ vocab(B)| and |vocab(A) ∪ vocab(B)| for every
    source pair, integer-exact.

    Shape: word rows -> distributed DISTINCT (source, w) via agg_by_keys
    -> per-word source BITMASK (each distinct pair contributes its
    source bit exactly once, so a SUM is an exact OR — one sum_by_keys)
    -> per-batch mask histogram (<= 2^S distinct masks, S = #sources) ->
    O(blocks x 2^S) driver rows -> pairwise popcount math.  The word
    domain stays distributed end-to-end; only the tiny mask histogram
    reaches the driver."""
    from ..functions.aggregates import agg_by_keys, sum_by_keys
    from ..functions.text import word_tf_df_rows

    ds = _decoded(sf_dir, "documents", columns=["text", "source"])
    rows = ds.map_batches(word_tf_df_rows, batch_format="pyarrow", zero_copy_batch=True)

    def kind0(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t.column("kind"), 0))
        return pa.table({"source": sub.column("source"), "w": sub.column("w")})

    distinct = agg_by_keys(
        rows.map_batches(kind0, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "w"],
        [("w", "count_all", "c")],
    ).materialize()

    # tiny driver object: the distinct source list (O(blocks x S) rows in)
    src_parts = [
        p
        for p in distinct.map_batches(
            lambda t: pa.table({"source": pc.unique(t.column("source"))})
            if t.num_rows
            else pa.table({}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if p.num_rows
    ]
    if not src_parts:
        return pa.table(
            {
                "src_a": pa.array([], pa.string()),
                "src_b": pa.array([], pa.string()),
                "inter": pa.array([], pa.int64()),
                "uni": pa.array([], pa.int64()),
            }
        )
    sources = sorted(
        set(pa.concat_tables(src_parts).column("source").to_pylist())
    )
    src_arr = pa.array(sources, pa.string())

    def bit_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        idx = pc.index_in(t.column("source"), value_set=src_arr)
        bits = np.left_shift(
            np.int64(1), idx.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        g = (
            pa.table({"w": t.column("w"), "b": pa.array(bits)})
            .group_by("w")
            .aggregate([("b", "sum")])
        )
        return pa.table({"w": g.column("w"), "b": g.column("b_sum")})

    masks = sum_by_keys(
        distinct.map_batches(bit_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["w"],
        "b",
    )

    def mask_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        m, c = np.unique(t.column("b").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"m": pa.array(m), "c": pa.array(c.astype(np.int64))})

    hist = _to_table(
        masks.map_batches(mask_hist, batch_format="pyarrow", zero_copy_batch=True)
    )
    hist = hist.group_by("m").aggregate([("c", "sum")])
    m = hist.column("m").to_numpy(zero_copy_only=False)
    c = hist.column("c_sum").to_numpy(zero_copy_only=False)
    sizes = [int(c[(m >> i) & 1 == 1].sum()) for i in range(len(sources))]
    out_a, out_b, out_i, out_u = [], [], [], []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            inter = int(c[((m >> i) & 1 == 1) & ((m >> j) & 1 == 1)].sum())
            if inter == 0:
                continue  # SQL inner join emits no zero-intersection pairs
            out_a.append(sources[i])
            out_b.append(sources[j])
            out_i.append(inter)
            out_u.append(sizes[i] + sizes[j] - inter)
    return pa.table(
        {
            "src_a": pa.array(out_a, pa.string()),
            "src_b": pa.array(out_b, pa.string()),
            "inter": pa.array(out_i, pa.int64()),
            "uni": pa.array(out_u, pa.int64()),
        }
    )


def _source_lang_counts(sf_dir: str) -> pa.Table:
    """Distinct (source, lang) pair counts through ONE sum_by_keys —
    shared by the grouped-collect and entropy queries; the shuffle is
    O(sources x langs), never O(docs)."""
    from ..functions.aggregates import sum_by_keys

    ds = _decoded(sf_dir, "documents", columns=["source", "lang"])

    def ones(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "lang": g.column("lang"),
                "one": g.column("count_all").cast(pa.int64()),
            }
        )

    return _to_table(
        sum_by_keys(
            ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
            ["source", "lang"],
            "one",
            out="n",
        )
    ).sort_by([("source", "ascending"), ("lang", "ascending")])


def q_collect_langs(sf_dir: str):
    """Grouped collect (ARRAY_AGG/STRING_AGG DISTINCT): the sorted,
    comma-joined set of languages seen per source.  Distinct (source,
    lang) pairs reduce through ONE sum_by_keys (the shuffle is
    O(sources × langs), never O(docs)); the join epilogue is O(pairs) on
    the driver."""
    pairs = _source_lang_counts(sf_dir)
    src = pairs.column("source").to_numpy(zero_copy_only=False)
    lang = pairs.column("lang").to_numpy(zero_copy_only=False)
    brk = np.ones(src.size, dtype=bool)
    brk[1:] = src[1:] != src[:-1]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], src.size]
    # STRING_AGG / COUNT DISTINCT ignore NULL langs; a source whose every
    # lang is NULL keeps its group row with langs NULL and n_langs 0
    out_langs, out_n = [], []
    for st, en in zip(starts, ends):
        ls = [x for x in lang[st:en] if x is not None]
        out_langs.append(",".join(ls) if ls else None)
        out_n.append(len(ls))
    return pa.table(
        {
            "source": pa.array(src[starts], pa.string()),
            "langs": pa.array(out_langs, pa.string()),
            "n_langs": pa.array(out_n, pa.int64()),
        }
    )


_FUZZY_QUERIES = ["red widgt", "blu bolt", "smal gear", "hoot gizmo"]


def q_fuzzy_part_match(sf_dir: str):
    """Fuzzy string matching — nearest part name per misspelled query by
    Levenshtein distance (byte-exact DuckDB semantics).  The vectorized
    DP (functions/text.levenshtein_batch: |q| x max_len NumPy steps, each
    O(batch)) scores every (query, name) pair inside map_batches; each
    block emits ONE best row per query (min dist, then min name), and the
    driver merges O(queries x blocks) candidates with a lexsort."""
    from ..functions.text import levenshtein_batch

    ds = _decoded(sf_dir, "part", columns=["p_name"])

    def best_per_query(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "query": pa.array([], pa.string()),
                    "p_name": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        names = t.column("p_name")
        nm = names.to_numpy(zero_copy_only=False)
        qs, bn, bd = [], [], []
        for q in _FUZZY_QUERIES:  # O(queries), not O(rows)
            d = levenshtein_batch(q, names)
            m = d.min()
            at = nm[d == m]
            qs.append(q)
            bn.append(min(at))
            bd.append(int(m))
        return pa.table(
            {
                "query": pa.array(qs, pa.string()),
                "p_name": pa.array(bn, pa.string()),
                "dist": pa.array(bd, pa.int64()),
            }
        )

    cands = _to_table(
        ds.map_batches(best_per_query, batch_format="pyarrow", zero_copy_batch=True)
    )
    q = cands.column("query").to_numpy(zero_copy_only=False)
    nmc = cands.column("p_name").to_numpy(zero_copy_only=False)
    d = cands.column("dist").to_numpy(zero_copy_only=False)
    order = np.lexsort((nmc, d, q))
    q, nmc, d = q[order], nmc[order], d[order]
    first = np.ones(q.size, dtype=bool)
    first[1:] = q[1:] != q[:-1]
    return pa.table(
        {
            "query": pa.array(q[first], pa.string()),
            "p_name": pa.array(nmc[first], pa.string()),
            "dist": pa.array(d[first], pa.int64()),
        }
    )


def q_source_lang_entropy(sf_dir: str):
    """Shannon entropy of the language mix per source (the corpus-balance
    diagnostic a multilingual sampler needs): (source, lang) counts flow
    through ONE sum_by_keys; H = -Σ p·ln(p) is an O(pairs) float epilogue
    computed from exact integer counts, floored at e6 with the identical
    expression in SQL."""
    pairs = _source_lang_counts(sf_dir)
    src = pairs.column("source").to_numpy(zero_copy_only=False)
    n = pairs.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    brk = np.ones(src.size, dtype=bool)
    brk[1:] = src[1:] != src[:-1]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], src.size]
    out_s, out_h, out_n = [], [], []
    for st, en in zip(starts, ends):
        if src[st] is None:
            # the oracle's c JOIN t ON c.source = t.source is an inner
            # equality join: the NULL source group never matches itself
            continue
        tot = n[st:en].sum()
        p = n[st:en] / tot
        h = float(-(p * np.log(p)).sum())
        out_s.append(src[st])
        out_h.append(int(np.floor(h * 1_000_000)))
        out_n.append(int(tot))
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "entropy_e6": pa.array(out_h, pa.int64()),
            "n_docs": pa.array(out_n, pa.int64()),
        }
    )


def _unigram_scored(sf_dir: str, columns: list[str]):
    """Shared unigram-LM scoring stream (see q_unigram_logprob for the
    contract): returns a Dataset of the requested non-text ``columns``
    plus (avg_lp_e6, n_words) for every doc with >=1 word."""
    import ray as _ray

    from ..functions.aggregates import sum_by_keys
    from ..functions.text import _concat_np, _ws_words

    ds = _decoded(sf_dir, "documents", columns=columns + ["text"])

    def tok_counts(t: pa.Table, *, _ws_words=_ws_words, _concat_np=_concat_np) -> pa.Table:
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        # mask the phantom "" empty docs contribute — the SQL mirror's
        # WHERE trim(text) <> '' never sees them, and an unmasked ""
        # would inflate `total` and shift EVERY word's logp
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(n_words[word_doc] > 0))
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table({"w": g.column("w"), "one": g.column("count_all").cast(pa.int64())})

    vocab = _to_table(
        sum_by_keys(
            ds.map_batches(tok_counts, batch_format="pyarrow", zero_copy_batch=True),
            ["w"],
            "one",
            out="n",
        )
    )
    n = vocab.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    total = float(n.sum())
    lp = np.log(n / total)
    ref = _ray.put((vocab.column("w").combine_chunks(), lp))

    def score(t: pa.Table, *, ref=ref, _ws_words=_ws_words, _concat_np=_concat_np) -> pa.Table:
        words, logp = _ray.get(ref)
        text = _concat_np(t.column("text"))
        off, flat, n_words = _ws_words(text, lower=True)
        pos = pc.index_in(flat, value_set=words)
        # phantom "" words of empty docs are not in the (masked) vocab —
        # null position -> zero contribution; their docs drop below anyway
        hit = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        pos = pc.fill_null(pos, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        per_tok = np.where(hit, logp[pos], 0.0)  # full vocab -> every real token hits
        c = np.zeros(per_tok.size + 1)
        np.cumsum(per_tok, out=c[1:])
        sums = c[off[1:]] - c[off[:-1]]
        keep = n_words > 0  # empty docs have no distribution (SQL drops them)
        avg = sums[keep] / n_words[keep]
        cols = {
            name: t.column(name).filter(pa.array(keep))
            for name in t.column_names
            if name != "text"
        }
        cols["avg_lp_e6"] = pa.array(np.floor(avg * 1_000_000).astype(np.int64))
        cols["n_words"] = pa.array(n_words[keep].astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def q_unigram_logprob(sf_dir: str):
    """Unigram-LM perplexity proxy — per document, the average
    log-probability of its (lowercased, whitespace) tokens under the
    corpus's own unigram distribution.  Two passes, both distributed:
    (1) global token counts via ONE sum_by_keys (per-batch combiners, so
    the shuffle is O(vocab), not O(tokens)); (2) the (token -> ln p)
    table broadcasts once via ray.put and every batch scores its docs
    with index_in + a segmented sum — no Python in either pass.  At 100
    TB the vocab table is top-K + an OOV floor (documented); here the
    full vocab keeps the SQL mirror exact.  Scores floor at e6 from
    identical double math on exact integer counts."""
    return _to_table(_unigram_scored(sf_dir, ["doc_id"])).sort_by("doc_id")


def q_perplexity_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
    language, documents split into head/middle/tail NTILE(3) tertiles of
    their unigram-LM score (higher avg log-prob = head) — the standard
    LM-quality partition run before sampling pre-training data.

    Scale shape: the unigram scoring stream (one O(vocab) keyed sum +
    broadcast score pass) feeds the distributed window-rank partitioned
    by lang (one range sort, O(blocks) carries); per-language doc counts
    (O(langs), from the rank carries' own aggregation) broadcast for the
    NTILE split; output partials are O(langs x 3).  Integer-exact
    (avg_lp_e6 sums), oracle-exact vs the NTILE window SQL."""
    import ray as _ray

    from ..functions.aggregates import agg_by_keys, with_group_ranks

    scored = _unigram_scored(sf_dir, ["doc_id", "lang"])

    def labeled_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("lang")))

    scored = scored.map_batches(labeled_only, batch_format="pyarrow", zero_copy_batch=True)
    # per-lang doc counts: O(langs) driver rows
    counts = _to_table(
        agg_by_keys(scored, ["lang"], [("avg_lp_e6", "count", "n")])
    )
    n_by_lang = dict(
        zip(counts.column("lang").to_pylist(), counts.column("n").to_pylist())
    )
    ref = _ray.put(n_by_lang)

    ranked = with_group_ranks(
        scored, ["lang"], ["avg_lp_e6", "doc_id"], descending=[True, False]
    )

    def bucketize(t: pa.Table, *, ref=ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()), "bucket": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64()), "lp_sum_e6": pa.array([], pa.int64())}
            )
        n_by_lang = _ray.get(ref)
        langs = t.column("lang").to_pylist()
        rnk = t.column("rnk").to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.array([n_by_lang[x] for x in langs], dtype=np.int64)
        # NTILE(3): first n%3 buckets hold n//3+1 rows, the rest n//3
        q_, r_ = n // 3, n % 3
        cut = r_ * (q_ + 1)
        b = np.where(
            rnk <= cut,
            (rnk - 1) // np.maximum(q_ + 1, 1),
            r_ + (rnk - 1 - cut) // np.maximum(q_, 1),
        )
        lp = t.column("avg_lp_e6").to_numpy(zero_copy_only=False)
        g = (
            pa.table({"lang": t.column("lang"), "bucket": pa.array(b),
                      "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
                      "lp_sum_e6": pa.array(lp)})
        )
        out = g.group_by(["lang", "bucket"]).aggregate(
            [("n_docs", "sum"), ("lp_sum_e6", "sum")]
        )
        return pa.table(
            {"lang": out.column("lang"), "bucket": out.column("bucket"),
             "n_docs": out.column("n_docs_sum"), "lp_sum_e6": out.column("lp_sum_e6_sum")}
        )

    agg = agg_by_keys(
        ranked.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "bucket"],
        [("n_docs", "sum", "n_docs"), ("lp_sum_e6", "sum", "lp_sum_e6")],
    )
    return _to_table(agg).sort_by(
        [("lang", "ascending"), ("bucket", "ascending")]
    )


def q_oov_rate(sf_dir: str):
    """Out-of-vocabulary rate per source under a top-1000 corpus vocab —
    the coverage check run before fixing a tokenizer's vocab on a new
    corpus mix.  Integer-exact: (source, n_tokens, oov_tokens).

    Pass 1 is the unigram_logprob vocab build (ONE sum_by_keys, O(vocab)
    shuffle); the top-K cut happens on the driver's O(vocab) table with
    the deterministic (count DESC, word ASC) order the SQL mirror uses,
    and only the K surviving words broadcast.  Pass 2 is a per-batch
    index_in probe + per-source partials -> one tiny keyed sum.  At 100
    TB the vocab table is itself top-K'd distributedly (local top-K per
    block + merge, as in token_histogram); here the full table keeps the
    tie-break exact."""
    import ray as _ray

    from ..functions.aggregates import sum_by_keys
    from ..functions.text import _concat_np, _ws_words

    K = 1000
    ds = _decoded(sf_dir, "documents", columns=["source", "text"])

    def tok_counts(t: pa.Table, *, _ws_words=_ws_words, _concat_np=_concat_np) -> pa.Table:
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        # mask the phantom "" word (SQL's WHERE trim(text) <> '' exclusion);
        # unmasked it could displace a real word from the top-K cut
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(n_words[word_doc] > 0))
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table({"w": g.column("w"), "one": g.column("count_all").cast(pa.int64())})

    vocab = _to_table(
        sum_by_keys(ds.map_batches(tok_counts, batch_format="pyarrow", zero_copy_batch=True),
                    ["w"], "one", out="n")
    )
    order = pc.sort_indices(vocab, sort_keys=[("n", "descending"), ("w", "ascending")])
    top = vocab.take(order.slice(0, K)).column("w").combine_chunks()
    ref = _ray.put(top)

    def per_source(t: pa.Table, *, ref=ref, _ws_words=_ws_words, _concat_np=_concat_np) -> pa.Table:
        top = _ray.get(ref)
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        in_vocab = pc.is_in(flat, value_set=top).to_numpy(zero_copy_only=False)
        # mask out the phantom "" word empty docs contribute to `flat`
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        valid = n_words[word_doc] > 0
        src = t.column("source").take(pa.array(word_doc[valid]))
        g = pa.table({
            "source": src,
            "one": pa.array(np.ones(int(valid.sum()), np.int64)),
            "oov": pa.array((~in_vocab[valid]).astype(np.int64)),
        }).group_by("source").aggregate([("one", "sum"), ("oov", "sum")])
        return pa.table({"source": g.column("source"),
                         "n_tokens": g.column("one_sum"),
                         "oov_tokens": g.column("oov_sum")})

    partials = ds.map_batches(per_source, batch_format="pyarrow", zero_copy_batch=True)
    out = sum_by_keys(partials, ["source"], "n_tokens")
    # two values through one keyed sum: pack (n_tokens, oov) into one pass
    # would lose column names; run the second tiny sum instead (O(sources))
    oov = sum_by_keys(partials.select_columns(["source", "oov_tokens"]),
                      ["source"], "oov_tokens")
    a = _to_table(out).sort_by("source")
    b = _to_table(oov).sort_by("source")
    return pa.table({"source": a.column("source"),
                     "n_tokens": a.column("n_tokens"),
                     "oov_tokens": b.column("oov_tokens")})


def q_tokenize_corpus(sf_dir: str):
    """Raw text -> the north-star pre-tokenized table -> token-lane store.

    Closes the loop on BASELINE.md's input shape: documents.text is
    tokenized (whitespace words, lowercased — the oov_rate convention)
    against a deterministic top-4096 corpus vocabulary (count DESC, word
    ASC; OOV -> unk id 4096), materialized as EXACTLY the engine's input
    table (doc_id:string, tokens:list<int32>, n_tok:int32, source:string),
    encoded through the chunk store's FOR+bitpack token lane, decoded
    back, and reduced per source to integer-exact aggregates
    (n_docs, n_tok_sum, id_sum, n_unk) the DuckDB oracle reproduces via
    regexp_split + ROW_NUMBER vocab join.

    Scale shape: ONE sum_by_keys O(vocab) shuffle builds the vocabulary;
    the id assignment is a broadcast top-K probe per batch (index_in);
    the token table streams into the store and back out — it never
    materializes on the driver.  K is fixed so the broadcast is O(K)."""
    import ray as _ray

    from ..functions.aggregates import agg_by_keys, sum_by_keys
    from ..functions.text import _concat_np, _seg_sum, _ws_words

    K = 4096
    ds = _decoded(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def tok_counts(t: pa.Table, *, _ws_words=_ws_words, _concat_np=_concat_np) -> pa.Table:
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        # mask the phantom "" word empty docs contribute (the SQL mirror's
        # WHERE trim(text) <> '' exclusion)
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(n_words[word_doc] > 0))
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table({"w": g.column("w"), "one": g.column("count_all").cast(pa.int64())})

    vocab = _to_table(
        sum_by_keys(ds.map_batches(tok_counts, batch_format="pyarrow", zero_copy_batch=True),
                    ["w"], "one", out="n")
    )
    order = pc.sort_indices(vocab, sort_keys=[("n", "descending"), ("w", "ascending")])
    top = vocab.take(order.slice(0, K)).column("w").combine_chunks()
    ref = _ray.put(top)

    def to_tokens(t: pa.Table, *, ref=ref, K=K,
                  _ws_words=_ws_words, _concat_np=_concat_np) -> pa.Table:
        top = _ray.get(ref)
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        # index_in position IS the vocab id (top is in rank order); OOV -> K
        ids = pc.fill_null(pc.index_in(flat, value_set=top), K)
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int32)
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        vals = ids[n_words[word_doc] > 0]
        offsets = np.zeros(n_words.size + 1, dtype=np.int64)
        np.cumsum(n_words, out=offsets[1:])
        tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(vals))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "tokens": tokens,
            "n_tok": pa.array(n_words.astype(np.int32)),
            "source": t.column("source"),
        })

    src = os.path.join(sf_dir, "documents.parquet")
    store = os.path.join(
        CACHE_ROOT,
        f"tokenized-{hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]}",
    )
    import shutil

    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(
        None, store, DEFAULT_OPTIONS,
        ds=ds.map_batches(to_tokens, batch_format="pyarrow", zero_copy_batch=True),
        batch_size=8192,
    )

    def agg_parts(t: pa.Table, *, K=K, _seg_sum=_seg_sum) -> pa.Table:
        toks = t.column("tokens").combine_chunks()
        ids = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        g = pa.table({
            "source": t.column("source"),
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_tok_sum": t.column("n_tok").cast(pa.int64()),
            "id_sum": pa.array(_seg_sum(ids, off)),
            "n_unk": pa.array(_seg_sum((ids == K).astype(np.int64), off)),
        }).group_by("source").aggregate(
            [("n_docs", "sum"), ("n_tok_sum", "sum"), ("id_sum", "sum"), ("n_unk", "sum")]
        )
        return pa.table({
            "source": g.column("source"),
            "n_docs": g.column("n_docs_sum"),
            "n_tok_sum": g.column("n_tok_sum_sum"),
            "id_sum": g.column("id_sum_sum"),
            "n_unk": g.column("n_unk_sum"),
        })

    out = agg_by_keys(
        decode_dataset(store, columns=["source", "tokens", "n_tok"]).map_batches(
            agg_parts, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["source"],
        [("n_docs", "sum", "n_docs"), ("n_tok_sum", "sum", "n_tok_sum"),
         ("id_sum", "sum", "id_sum"), ("n_unk", "sum", "n_unk")],
    )
    return _to_table(out).sort_by("source")


def q_bigram_logprob(sf_dir: str):
    """Bigram-LM scoring — per document, the average ln P(w_i | w_{i-1})
    under the corpus's own MLE bigram model (P = c(a,b) / c(a,·)); the
    2-gram upgrade of unigram_logprob and the standard LM-quality filter
    feature.  Output (doc_id, avg_lp_e6, n_pairs), e6-floored like the
    unigram precedent.

    Pass 1: per-batch in-doc bigram counts (vectorized pair extraction:
    every word except each doc's last is a context) -> ONE sum_by_keys
    over (w1, w2) — the shuffle is O(distinct bigrams), never O(tokens).
    Context totals c(a,·) derive from the collected table by one Arrow
    group-sum on the driver; the (pair -> lp) map broadcasts once.  At
    100 TB the model table is top-K + a backoff floor (documented); the
    full table here keeps the SQL mirror exact."""
    import ray as _ray

    from ..functions.aggregates import sum_by_keys
    from ..functions.text import _concat_np, _ws_words

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    SEP = "\x1f"

    def _pairs(t: pa.Table, *, _ws_words=_ws_words, _concat_np=_concat_np):
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        total = int(off[-1])
        keep = np.ones(total, bool)
        last = off[1:] - 1
        keep[last[last >= 0]] = False  # no pair crosses a doc boundary
        # phantom "" words of empty docs are their own (excluded) last word
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        keep &= n_words[word_doc] > 1
        pos = np.flatnonzero(keep)
        w1 = flat.take(pa.array(pos))
        w2 = flat.take(pa.array(pos + 1))
        n_pairs = np.maximum(n_words - 1, 0)
        return w1, w2, pos, n_pairs

    def pair_counts(t: pa.Table) -> pa.Table:
        w1, w2, _, _ = _pairs(t)
        g = pa.table({"w1": w1, "w2": w2}).group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g.column("w1"), "w2": g.column("w2"),
                         "one": g.column("count_all").cast(pa.int64())})

    model = _to_table(
        sum_by_keys(ds.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True),
                    ["w1", "w2"], "one", out="nab")
    )
    ctx = model.group_by("w1").aggregate([("nab", "sum")])
    pos_ctx = pc.index_in(model.column("w1"), value_set=ctx.column("w1").combine_chunks())
    na = pc.take(ctx.column("nab_sum"), pos_ctx).to_numpy(zero_copy_only=False).astype(np.float64)
    nab = model.column("nab").to_numpy(zero_copy_only=False).astype(np.float64)
    lp = np.log(nab) - np.log(na)
    keys = pc.binary_join_element_wise(model.column("w1"), model.column("w2"), SEP)
    ref = _ray.put((keys.combine_chunks(), lp))

    def score(t: pa.Table, *, ref=ref) -> pa.Table:
        keys, lp = _ray.get(ref)
        w1, w2, _, n_pairs = _pairs(t)
        k = pc.binary_join_element_wise(w1, w2, SEP)
        pos = pc.index_in(k, value_set=keys).to_numpy(zero_copy_only=False).astype(np.int64)
        per_pair = lp[pos]  # full model -> every in-corpus pair hits
        c = np.zeros(per_pair.size + 1)
        np.cumsum(per_pair, out=c[1:])
        po = np.zeros(n_pairs.size + 1, np.int64)
        np.cumsum(n_pairs, out=po[1:])
        sums = c[po[1:]] - c[po[:-1]]
        keep = n_pairs > 0
        avg = sums[keep] / n_pairs[keep]
        return pa.table({
            "doc_id": t.column("doc_id").filter(pa.array(keep)),
            "avg_lp_e6": pa.array(np.floor(avg * 1_000_000).astype(np.int64)),
            "n_pairs": pa.array(n_pairs[keep]),
        })

    return _to_table(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("doc_id")


def q_dsir_weights(sf_dir: str):
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    hashed-n-gram (unigram + bigram) bucket counts over a TARGET domain
    (lang='en' — the quality-domain proxy) vs the RAW corpus, per-doc
    log importance weight = sum over its grams of
    ln(p_target(bucket)/p_raw(bucket)), Laplace-smoothed.

    Scale shape: ONE keyed sum over per-batch nonzero-bucket partials
    (the shuffle is O(B)=4096 buckets, never O(grams)); the dense e6-
    quantized log-weight vector (32 KB) broadcasts once; scoring is a
    stateless bincount pass.  Determinism: md5-bucket hashing (the
    hash_split/md5vec convention — bit-exact vs SQL), per-gram weights
    floored at e6 BEFORE the integer sums.  Oracle-exact: the SQL mirror
    reproduces buckets (substr(md5)::BIGINT % B), counts, lw and sums."""
    import ray as _ray

    from ..functions.aggregates import agg_by_keys
    from ..functions.md5vec import md5_hex15_int
    from ..functions.text import _concat_np, _ws_words

    B = 4096
    SEP = "\x1f"
    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _grams(t: pa.Table):
        """(bucket ids int64, owning-doc index int64, n_grams per doc)."""
        off, flat, n_words = _ws_words(_concat_np(t.column("text")), lower=True)
        word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
        real = n_words[word_doc] > 0
        uni = flat.filter(pa.array(real))
        uni_doc = word_doc[real]
        # in-doc bigrams: every word except each real doc's last
        keep = np.ones(int(off[-1]), bool)
        last = off[1:] - 1
        keep[last[last >= 0]] = False
        keep &= n_words[word_doc] > 1
        pos = np.flatnonzero(keep)
        bi = pc.binary_join_element_wise(
            flat.take(pa.array(pos)), flat.take(pa.array(pos + 1)), SEP
        )
        bi_doc = word_doc[pos]
        buckets = np.concatenate(
            [md5_hex15_int(uni) % B, md5_hex15_int(bi) % B]
        ) if len(uni) or len(bi) else np.zeros(0, dtype=np.int64)
        gram_doc = np.concatenate([uni_doc, bi_doc])
        n_grams = n_words + np.maximum(n_words - 1, 0)
        return buckets, gram_doc, n_grams

    def bucket_counts(t: pa.Table) -> pa.Table:
        buckets, gram_doc, _ = _grams(t)
        is_tgt = pc.fill_null(pc.equal(t.column("lang"), "en"), False)
        tgt_doc = is_tgt.to_numpy(zero_copy_only=False)
        c_all = np.bincount(buckets, minlength=B)
        c_tgt = np.bincount(buckets[tgt_doc[gram_doc]], minlength=B)
        nz = np.flatnonzero(c_all)
        return pa.table(
            {
                "b": pa.array(nz),
                "n_all": pa.array(c_all[nz]),
                "n_tgt": pa.array(c_tgt[nz]),
            }
        )

    counts = _to_table(
        agg_by_keys(
            ds.map_batches(bucket_counts, batch_format="pyarrow", zero_copy_batch=True),
            ["b"],
            [("n_all", "sum", "n_all"), ("n_tgt", "sum", "n_tgt")],
        )
    )
    c_all = np.zeros(B, dtype=np.int64)
    c_tgt = np.zeros(B, dtype=np.int64)
    bb = counts.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    c_all[bb] = counts.column("n_all").to_numpy(zero_copy_only=False)
    c_tgt[bb] = counts.column("n_tgt").to_numpy(zero_copy_only=False)
    t_all, t_tgt = float(c_all.sum()), float(c_tgt.sum())
    lw = np.floor(
        np.log(((c_tgt + 1.0) / (t_tgt + float(B))) / ((c_all + 1.0) / (t_all + float(B))))
        * 1_000_000
    ).astype(np.int64)
    ref = _ray.put(lw)

    def score(t: pa.Table, *, ref=ref) -> pa.Table:
        lw = _ray.get(ref)
        buckets, gram_doc, n_grams = _grams(t)
        w = np.zeros(n_grams.size, dtype=np.int64)
        np.add.at(w, gram_doc, lw[buckets])
        keep = n_grams > 0
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "w_e6": pa.array(w[keep]),
                "n_grams": pa.array(n_grams[keep].astype(np.int64)),
            }
        )

    return _to_table(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("doc_id")


def q_bpe_tokenize(sf_dir: str):
    """Byte-level BPE tokenizer end-to-end: train 200 merges on the
    corpus's own word-frequency table, tokenize every document, route the
    north-star-shaped result (doc_id, tokens:list<int32>, n_tok, source)
    through the chunk store's FOR+bitpack token lane, decode it back, and
    reduce to integer-exact per-source aggregates.

    Scale shape: train = ONE sum_by_keys word-count shuffle + an
    O(vocab x merges) driver loop (how every production BPE trainer
    works — the corpus never re-enters training); apply = broadcast merge
    table + per-batch unique-word merge replay; the aggregate is one tiny
    keyed sum.  No SQL oracle (the merge loop is iterative-argmax), so
    the gate is rows-only — hardened by in-query asserts: (a) apply runs
    with verify=True, so every batch proves detokenization is
    BYTE-IDENTICAL to its lowercased input words (byte-level BPE has no
    OOV case), (b) the vocab is exactly 256 + n_merges, (c) subword
    compression is real: total tokens < total word bytes.  Parity with a
    sequential reference trainer/applier is pinned in tests/test_bpe.py."""
    from ..functions.aggregates import agg_by_keys
    from ..functions.bpe import bpe_apply, bpe_train

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text", "source"])
    tstats = {}
    model = bpe_train(ds, text_col="text", n_merges=200, stats_out=tstats)
    merges, sym_bytes = model
    assert len(sym_bytes) == 256 + len(merges)

    tok = bpe_apply(ds, model, text_col="text", verify=True)

    src = os.path.join(sf_dir, "documents.parquet")
    store = os.path.join(
        CACHE_ROOT,
        f"bpe-{hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]}",
    )
    import shutil

    shutil.rmtree(store, ignore_errors=True)
    encode_dataset(None, store, DEFAULT_OPTIONS, ds=tok, batch_size=8192)

    def parts(t: pa.Table) -> pa.Table:
        toks = t.column("tokens").combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        off = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        c = np.zeros(flat.size + 1, dtype=np.int64)
        np.cumsum(flat, out=c[1:])
        id_sum = c[off[1:]] - c[off[:-1]]
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_tok_sum": pa.array(lens),
                "tok_id_sum": pa.array(id_sum),
            }
        )

    agg = agg_by_keys(
        decode_dataset(store).map_batches(parts, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_docs", "sum", "n_docs"), ("n_tok_sum", "sum", "n_tok_sum"),
         ("tok_id_sum", "sum", "tok_id_sum")],
    )
    out = _to_table(agg).sort_by("source")
    # subword compression is real: fewer tokens than lowercased word
    # bytes (every merge contracts >=2-count bigrams on this corpus)
    total_tok = sum(out.column("n_tok_sum").to_pylist())
    if merges and total_tok:
        assert total_tok < tstats["total_word_bytes"], (total_tok, tstats)
    return out


def q_nb_lang_confusion(sf_dir: str):
    """Multinomial Naive Bayes language classifier, trained AND evaluated
    on the corpus's own (lang, text) pairs — the classifier-gating
    curation op (fastText/CCNet family) with an exact confusion matrix
    as the compact, ORACLE-EXACT deliverable.

    Scale shape: train = ONE sum_by_keys over (lang, word) partials
    (O(labels x vocab) shuffle, doc counts riding under a sentinel word);
    the [(V+1) x C] e6-quantized model broadcasts once; predict is a
    stateless vectorized pass; the confusion rollup is one tiny
    agg_by_keys over O(C^2) groups.  Determinism: per-token log-probs
    floor at e6 BEFORE the integer sums, so scores are order-independent
    int64 and the argmax tie-break (ascending class name) matches the
    SQL's ROW_NUMBER ORDER BY s DESC, c ASC.  See functions/classify.py
    for the full contract."""
    from ..functions.aggregates import agg_by_keys
    from ..functions.classify import nb_predict, nb_train

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    # train and score the SAME labeled set (lang IS NOT NULL) so the SQL
    # mirror is one corpus: NULL-lang docs carry no supervision and have
    # no true row in the confusion matrix
    def drop_unlabeled(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("lang")))

    labeled = ds.map_batches(drop_unlabeled, batch_format="pyarrow", zero_copy_batch=True)
    model = nb_train(labeled, text_col="text", label_col="lang")
    preds = nb_predict(labeled, model, text_col="text")
    conf = agg_by_keys(
        preds,
        ["lang", "pred"],
        [("score_e6", "count", "n_docs"), ("score_e6", "sum", "score_sum_e6")],
    )
    return _to_table(conf).sort_by([("lang", "ascending"), ("pred", "ascending")])


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
ORACLE_SQL = {
    "dsir_weights": """
        WITH ws AS (
          SELECT doc_id, lang,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL
        ),
        uni AS (SELECT doc_id, lang, unnest(ws) AS g FROM ws),
        bi AS (
          SELECT doc_id, lang, ws[i] || chr(31) || ws[i + 1] AS g
          FROM (SELECT doc_id, lang, ws,
                       UNNEST(generate_series(1, len(ws) - 1)) AS i FROM ws)
        ),
        grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        gb AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 4096 AS b
          FROM grams
        ),
        counts AS (
          SELECT b, CAST(COUNT(*) AS BIGINT) AS n_all,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
          FROM gb GROUP BY b
        ),
        tot AS (SELECT CAST(SUM(n_all) AS DOUBLE) AS t_all,
                       CAST(SUM(n_tgt) AS DOUBLE) AS t_tgt FROM counts),
        lw AS (
          SELECT b,
                 CAST(FLOOR(LN(((CAST(n_tgt AS DOUBLE) + 1.0) / (t_tgt + 4096.0))
                               / ((CAST(n_all AS DOUBLE) + 1.0) / (t_all + 4096.0)))
                            * 1000000) AS BIGINT) AS l
          FROM counts, tot
        )
        SELECT gb.doc_id, CAST(SUM(lw.l) AS BIGINT) AS w_e6,
               CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM gb JOIN lw USING (b)
        GROUP BY gb.doc_id ORDER BY gb.doc_id
    """,
    "perplexity_buckets": """
        WITH words AS (
          SELECT doc_id, w FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
          ) WHERE w <> ''
        ),
        cnt AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS n FROM words GROUP BY w),
        tot AS (SELECT SUM(n) AS t FROM cnt),
        lp AS (SELECT w, LN(n / t) AS l FROM cnt, tot),
        scored AS (
          SELECT w2.doc_id,
                 CAST(FLOOR(AVG(lp.l) * 1000000) AS BIGINT) AS avg_lp_e6
          FROM words w2 JOIN lp ON w2.w = lp.w GROUP BY w2.doc_id
        ),
        nt AS (
          SELECT d.lang, s.avg_lp_e6,
                 NTILE(3) OVER (PARTITION BY d.lang
                                ORDER BY s.avg_lp_e6 DESC, s.doc_id ASC) AS b
          FROM scored s JOIN documents d USING (doc_id)
          WHERE d.lang IS NOT NULL
        )
        SELECT lang, CAST(b - 1 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(avg_lp_e6) AS BIGINT) AS lp_sum_e6
        FROM nt GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "nb_lang_confusion": """
        -- docs = labeled rows with >=1 whitespace word.  Derived FROM the
        -- word set (not via trim(text) <> ''): SQL trim strips only
        -- spaces, while the engine's utf8_trim_whitespace strips \\t\\n
        -- etc, so a tabs-only doc would otherwise count in the priors on
        -- one side only.
        WITH words AS (
          SELECT doc_id, lang, w FROM (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
            FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
          ) WHERE w <> ''
        ),
        docs AS (SELECT doc_id, any_value(lang) AS lang FROM words GROUP BY doc_id),
        cw AS (SELECT lang AS c, w, CAST(COUNT(*) AS BIGINT) AS n FROM words GROUP BY 1, 2),
        ct AS (SELECT c, CAST(SUM(n) AS BIGINT) AS t FROM cw GROUP BY 1),
        v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS nv FROM words),
        classes AS (SELECT DISTINCT lang AS c FROM docs),
        vocab AS (SELECT DISTINCT w FROM words),
        lpm AS (
          SELECT vocab.w, cl.c,
                 CAST(FLOOR(LN((CAST(COALESCE(cw.n, 0) AS DOUBLE) + 1.0)
                               / (CAST(ct.t AS DOUBLE) + CAST(v.nv AS DOUBLE)))
                            * 1000000) AS BIGINT) AS l
          FROM vocab CROSS JOIN classes cl CROSS JOIN v
          JOIN ct ON ct.c = cl.c
          LEFT JOIN cw ON cw.c = cl.c AND cw.w = vocab.w
        ),
        prior AS (
          SELECT lang AS c,
                 CAST(FLOOR(LN(CAST(COUNT(*) AS DOUBLE)
                               / (SELECT CAST(COUNT(*) AS DOUBLE) FROM docs))
                            * 1000000) AS BIGINT) AS p
          FROM docs GROUP BY 1
        ),
        scores AS (
          SELECT w2.doc_id, lpm.c, pr.p + SUM(lpm.l) AS s
          FROM words w2
          JOIN lpm ON w2.w = lpm.w
          JOIN prior pr ON pr.c = lpm.c
          GROUP BY 1, 2, pr.p
        ),
        pred AS (
          SELECT doc_id, c, s,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, c ASC) AS rn
          FROM scores
        )
        SELECT d.lang, p.c AS pred,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(p.s) AS BIGINT) AS score_sum_e6
        FROM pred p JOIN docs d USING (doc_id) WHERE p.rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "text_stats": """
        SELECT doc_id, LENGTH(text) AS n_chars_calc,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
        FROM documents
    """,
    "token_counts": r"""
        -- len(list_filter(..)) matches Python str.split(): null, empty,
        -- and tab/space-padded docs all count 0 words (DuckDB TRIM is
        -- space-only, so a '\t'-padded doc would otherwise emit phantom
        -- '' tokens and over-count)
        SELECT doc_id,
               CAST(COALESCE(len(list_filter(
                        string_split_regex(text, '\s+'), x -> x <> '')), 0)
                    AS BIGINT) AS n_ws_tokens
        FROM documents
    """,
    "token_histogram": r"""
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ) WHERE token <> ''  -- DuckDB trim() is space-only: tab-padded docs
                             -- emit phantom '' tokens Python split() never has
        GROUP BY token ORDER BY cnt DESC, token LIMIT 50
    """,
    "fingerprints": """
        SELECT doc_id, md5(text) AS fp_md5 FROM documents ORDER BY doc_id
    """,
    "masked_export": """
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[a-z]', 'x', 'g'), '[A-Z]', 'X', 'g'), '[0-9]', '9', 'g')
                   AS text,
               CAST(NULL AS VARCHAR) AS lang,
               sha256(source) AS source
        FROM documents ORDER BY doc_id
    """,
    "decontaminate": r"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                   FROM documents WHERE trim(text) <> ''),
        g AS (SELECT doc_id,
                     array_to_string(ws[CAST(u AS INTEGER):CAST(u AS INTEGER)+3], ' ') AS gram
              FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 2)) AS u
                    FROM w WHERE len(ws) >= 4)),
        bench AS (SELECT DISTINCT gram FROM g
                  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
        contaminated AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram))
        SELECT d.doc_id FROM documents d
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <> '0'
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY d.doc_id
    """,
    "repetition_stats": r"""
        WITH w AS (SELECT doc_id,
                          list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
                                      x -> x <> '') AS ws
                   FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
        wc AS (SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY doc_id, word),
        top AS (SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS nw FROM wc GROUP BY doc_id),
        g AS (SELECT doc_id,
                     ws[CAST(u AS INTEGER)] || ' ' || ws[CAST(u AS INTEGER) + 1] AS gram
              FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS u
                    FROM w WHERE len(ws) >= 2)),
        gc AS (SELECT doc_id, COUNT(*) AS n_g, COUNT(DISTINCT gram) AS n_d
               FROM g GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(top.nw, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(top.top_cnt, 0) * 1000000
                    // GREATEST(COALESCE(top.nw, 0), 1) AS BIGINT)
                   AS top_word_frac_e6,
               CAST(COALESCE(gc.n_g - gc.n_d, 0) * 1000000
                    // GREATEST(COALESCE(gc.n_g, 0), 1) AS BIGINT)
                   AS dup_2gram_frac_e6
        FROM documents d LEFT JOIN top USING (doc_id) LEFT JOIN gc USING (doc_id)
        ORDER BY d.doc_id
    """,
    "salient_terms": """
        WITH words AS (
            SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ), df AS (
            SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w
        ), tot AS (SELECT COUNT(*) n FROM documents),
        tf AS (
            SELECT source, w, COUNT(*) AS tf FROM words GROUP BY source, w
        ), kept AS (
            SELECT tf.* FROM tf JOIN df USING (w), tot
            WHERE df.df * 100 <= tot.n * 79
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY tf DESC, w) AS rnk
            FROM kept
        )
        SELECT source, w, tf, rnk FROM ranked WHERE rnk <= 10
        ORDER BY source, rnk
    """,
    "source_collocations": """
        WITH s AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
        p AS (SELECT source, ws, UNNEST(generate_series(1, len(ws) - 1)) AS i FROM s),
        cnt AS (
            SELECT source, ws[i] AS w1, ws[i + 1] AS w2, COUNT(*) AS c
            FROM p GROUP BY 1, 2, 3
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY c DESC, w1, w2) AS rnk
            FROM cnt
        )
        SELECT source, w1, w2, c, rnk FROM r WHERE rnk <= 5
        ORDER BY source, rnk
    """,
    "lexical_diversity": """
        WITH words AS (
            -- whitespace-exact tokens (Python split() semantics): regexp
            -- split + drop the '' phantoms space-only trim leaves behind
            SELECT doc_id, source, w FROM (
                SELECT doc_id, source,
                       UNNEST(string_split_regex(trim(text), '\\s+')) AS w
                FROM documents
            ) WHERE w <> ''
        ),
        per_doc AS (
            SELECT doc_id, source,
                   COUNT(*) AS w, COUNT(DISTINCT w) AS dw
            FROM words GROUP BY doc_id, source
        )
        SELECT source,
               CAST((1000000 * SUM(dw)) // GREATEST(SUM(w), 1) AS BIGINT) AS ttr_e6,
               CAST(SUM(w) AS BIGINT) AS n_words
        FROM per_doc GROUP BY source ORDER BY source
    """,
    "vocab_table": """
        WITH words AS (
            -- whitespace tokens == Python str.split(): no phantom ''
            -- tokens on multi-space/tab/padded docs, null docs -> 0 rows
            SELECT doc_id,
                   UNNEST(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS tok
            FROM documents
        ), t AS (
            SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
            FROM words GROUP BY tok
        )
        SELECT tok, df, tf FROM t WHERE df >= 5
        ORDER BY df DESC, tok LIMIT 100
    """,
    "word_bigrams": """
        WITH s AS (SELECT list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS ws FROM documents),
        p AS (SELECT ws, UNNEST(generate_series(1, len(ws) - 1)) AS i FROM s)
        SELECT ws[i] AS w1, ws[i + 1] AS w2, COUNT(*) AS cnt
        FROM p GROUP BY 1, 2
        ORDER BY cnt DESC, w1, w2 LIMIT 50
    """,
    "source_vocab_overlap": """
        WITH sw AS (
            SELECT DISTINCT source, w FROM (
                SELECT source,
                       UNNEST(list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> '')) AS w
                FROM documents)
        ),
        sz AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY source),
        ix AS (
            SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
            FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, inter, sa.n + sb.n - inter AS uni
        FROM ix
        JOIN sz sa ON sa.source = src_a
        JOIN sz sb ON sb.source = src_b
        ORDER BY src_a, src_b
    """,
    "chunk_passages": """
        WITH n AS (
            SELECT doc_id, text,
                   CAST(CEIL(GREATEST(length(text) - 200, 0) / 150.0)
                        AS BIGINT) + 1 AS n_chunks
            FROM documents
        )
        SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
               substr(text, CAST(k * 150 + 1 AS INTEGER), 200) AS chunk
        FROM (SELECT doc_id, text, UNNEST(range(n_chunks)) AS k FROM n)
        ORDER BY doc_id, chunk_id
    """,
    "collect_langs": """
        SELECT source,
               STRING_AGG(DISTINCT lang, ',' ORDER BY lang) AS langs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents GROUP BY source ORDER BY source
    """,
    "fuzzy_part_match": """
        WITH q(query) AS (VALUES ('red widgt'), ('blu bolt'), ('smal gear'), ('hoot gizmo')),
        d AS (
          SELECT q.query, p.p_name, levenshtein(q.query, p.p_name) AS dist
          FROM q CROSS JOIN part p
        ),
        r AS (
          SELECT query, p_name, CAST(dist AS BIGINT) AS dist,
                 ROW_NUMBER() OVER (PARTITION BY query ORDER BY dist, p_name) AS rn
          FROM d
        )
        SELECT query, p_name, dist FROM r WHERE rn = 1 ORDER BY query
    """,
    "source_lang_entropy": """
        WITH c AS (
          SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS n
          FROM documents GROUP BY source, lang
        ),
        t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY source)
        SELECT c.source,
               CAST(FLOOR(SUM(-(c.n / t.tot) * LN(c.n / t.tot)) * 1000000) AS BIGINT)
                 AS entropy_e6,
               CAST(t.tot AS BIGINT) AS n_docs
        FROM c JOIN t ON c.source = t.source
        GROUP BY c.source, t.tot ORDER BY c.source
    """,
    "oov_rate": """
        WITH words AS (
          SELECT source, w FROM (
            SELECT source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
          ) WHERE w <> ''
        ),
        vocab AS (
          SELECT w FROM (SELECT w, COUNT(*) AS n FROM words GROUP BY w)
          ORDER BY n DESC, w ASC LIMIT 1000
        )
        SELECT words.source,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS oov_tokens
        FROM words LEFT JOIN vocab ON words.w = vocab.w
        GROUP BY words.source ORDER BY words.source
    """,
    "tokenize_corpus": """
        WITH words AS (
          SELECT doc_id, source, w FROM (
            SELECT doc_id, source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
          ) WHERE w <> ''
        ),
        vocab AS (
          SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) - 1 AS BIGINT) AS id
          FROM (SELECT w, COUNT(*) AS n FROM words GROUP BY w)
          ORDER BY n DESC, w ASC LIMIT 4096
        ),
        tok AS (
          SELECT words.source, COALESCE(vocab.id, 4096) AS id
          FROM words LEFT JOIN vocab ON words.w = vocab.w
        ),
        pt AS (
          SELECT source, COUNT(*) AS n_tok_sum,
                 CAST(SUM(id) AS BIGINT) AS id_sum,
                 CAST(SUM(CASE WHEN id = 4096 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
          FROM tok GROUP BY source
        ),
        d AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
        SELECT d.source, d.n_docs,
               COALESCE(pt.n_tok_sum, 0) AS n_tok_sum,
               COALESCE(pt.id_sum, 0) AS id_sum,
               COALESCE(pt.n_unk, 0) AS n_unk
        -- null-safe join: the NULL source is ONE group on both sides,
        -- exactly like the engine's null-keyed aggregation
        FROM d LEFT JOIN pt ON d.source IS NOT DISTINCT FROM pt.source
        ORDER BY d.source
    """,
    "bigram_logprob": """
        WITH s AS (
          -- list_filter drops the '' phantoms of space-only trim so pair
          -- indexing never pairs a phantom with a real word
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x <> '') AS ws
          FROM documents WHERE trim(text) <> ''
        ),
        p AS (
          SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
          FROM (SELECT doc_id, ws,
                       UNNEST(generate_series(1, len(ws) - 1)) AS i FROM s)
        ),
        cab AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS nab
                FROM p GROUP BY w1, w2),
        ca AS (SELECT w1, SUM(nab) AS na FROM cab GROUP BY w1)
        SELECT p.doc_id,
               CAST(FLOOR(AVG(LN(cab.nab) - LN(ca.na)) * 1000000) AS BIGINT)
                 AS avg_lp_e6,
               COUNT(*) AS n_pairs
        FROM p JOIN cab USING (w1, w2) JOIN ca USING (w1)
        GROUP BY p.doc_id ORDER BY p.doc_id
    """,
    "unigram_logprob": """
        WITH words AS (
          SELECT doc_id, w FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
          ) WHERE w <> ''
        ),
        cnt AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS n FROM words GROUP BY w),
        tot AS (SELECT SUM(n) AS t FROM cnt),
        lp AS (SELECT w, LN(n / t) AS l FROM cnt, tot)
        SELECT w2.doc_id,
               CAST(FLOOR(AVG(lp.l) * 1000000) AS BIGINT) AS avg_lp_e6,
               COUNT(*) AS n_words
        FROM words w2 JOIN lp ON w2.w = lp.w
        GROUP BY w2.doc_id ORDER BY w2.doc_id
    """,
    "lang_id": _lang_id_oracle_sql(),
    "quality_scores": _quality_oracle_sql(),
    "scrub_pii": _scrub_pii_oracle_sql(),
}
