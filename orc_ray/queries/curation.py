"""Corpus curation: packing, capping, splits, samplers, upsert.

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
from .textq import _lang_pred_ctes, _quality_oracle_sql


_BALANCED_K = 100


def _balanced_sample_oracle_sql() -> str:
    from ..functions.sampling import _DENOM

    return _lang_pred_ctes() + f""",
        cnt AS (SELECT lang_pred, COUNT(*) AS n FROM lang GROUP BY lang_pred),
        tot AS (SELECT COUNT(*) AS n_total FROM lang),
        pri AS (
          SELECT l.doc_id, l.lang_pred,
                 CAST(FLOOR(
                   LN((CAST(('0x' || substr(md5(CAST(l.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                        / {_DENOM!r})
                   / SQRT(tot.n_total * 1.0 / cnt.n) * 1000000000) AS BIGINT) AS pri_e9
          FROM lang l JOIN cnt ON l.lang_pred = cnt.lang_pred CROSS JOIN tot
        )
        SELECT doc_id, lang_pred, pri_e9 FROM pri
        ORDER BY pri_e9 DESC, doc_id LIMIT {_BALANCED_K}
    """


PACK_WINDOW_TOKENS = 256


def _pack_by_tokens(ds) -> pa.Table:
    """(doc_id, text) Dataset -> (doc_id, n_tok, win_id) packing table:
    token counts -> distributed prefix scan -> win_id = offset // window.
    Shared by q_pack_sequences and the curation flagship so the packing
    rule lives in exactly one place."""
    from ..functions.aggregates import with_prefix_sum
    from ..functions.text import token_counts

    toks = ds.map_batches(token_counts, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda t: t.select(["doc_id", "n_ws_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = with_prefix_sum(toks, ["doc_id"], "n_ws_tokens", out="cum_prev")

    def win(t: pa.Table) -> pa.Table:
        cum = t.column("cum_prev").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tok": t.column("n_ws_tokens"),
                "win_id": pa.array(cum // PACK_WINDOW_TOKENS),
            }
        )

    return _to_table(
        scanned.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("doc_id")


def _pack_oracle_ctes(source_rel: str) -> str:
    """tok/s CTE block + final SELECT of the packing oracle, over any
    (doc_id, text) relation — generated from the same PACK_WINDOW_TOKENS
    constant the engine uses."""
    return f"""
        tok AS (
            -- len(list_filter(..)) == Python str.split(): null / empty /
            -- tab-padded docs count 0 tokens (no phantom '' words)
            SELECT doc_id,
                   COALESCE(len(list_filter(
                       string_split_regex(text, '\\s+'), x -> x <> '')), 0)
                       AS n_tok
            FROM {source_rel}
        ),
        s AS (
            SELECT doc_id, n_tok,
                   COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_prev
            FROM tok
        )
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(cum_prev // {PACK_WINDOW_TOKENS} AS BIGINT) AS win_id
        FROM s ORDER BY doc_id
    """


def q_pack_windows(sf_dir: str):
    """Sequence packing, MATERIALIZED: the actual fixed-context training
    rows, not just the window assignment.  Documents in doc_id order are
    laid head-to-tail in token space and cut at every PACK_WINDOW_TOKENS
    boundary — a document spanning a boundary is SPLIT, its tail starting
    the next window (the GPT-style concat-then-chunk dataloader rule).

    Shape: token counts -> distributed prefix scan (with_prefix_sum:
    O(blocks) driver state) -> a per-batch piece stage that slices each
    doc's word list at window boundaries (pieces are vectorized —
    np.repeat position algebra + ONE pyarrow binary_join per batch; a doc
    yields ~n_tok/window + 1 pieces) -> string_agg_by_key assembles each
    window's text in global token order (one range sort; <=2 boundary
    windows per block heal on the driver).  Output: (win_id, n_win_tok,
    win_text) with every interior window exactly PACK_WINDOW_TOKENS
    tokens."""
    from ..functions.aggregates import string_agg_by_key, with_prefix_sum
    from ..functions.text import _ws_words

    L = PACK_WINDOW_TOKENS
    docs = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        _, _, nw = _ws_words(t.column("text").combine_chunks())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "n_tok": pa.array(nw.astype(np.int64)),
            }
        )

    with_n = docs.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    scanned = with_prefix_sum(with_n, ["doc_id"], "n_tok", out="cum_prev")

    def pieces(t: pa.Table) -> pa.Table:
        off, flat, nw = _ws_words(t.column("text").combine_chunks())
        nw = nw.astype(np.int64)
        total = int(nw.sum())
        if total == 0:
            return pa.table(
                {
                    "win_id": pa.array([], pa.int64()),
                    "gpos": pa.array([], pa.int64()),
                    "piece": pa.array([], pa.large_string()),
                    "npc": pa.array([], pa.int64()),
                }
            )
        cum = t.column("cum_prev").to_numpy(zero_copy_only=False)
        # word -> (doc, local position); empty docs contribute nothing,
        # which also drops the phantom '' word split("") produces
        doc_idx = np.repeat(np.arange(nw.size), nw)
        word_local = np.arange(total) - np.repeat(np.cumsum(nw) - nw, nw)
        words = flat.take(pa.array(np.repeat(off[:-1], nw) + word_local))
        g = np.repeat(cum, nw) + word_local  # global token positions
        w = g // L
        brk = np.ones(total, dtype=bool)
        brk[1:] = (w[1:] != w[:-1]) | (doc_idx[1:] != doc_idx[:-1])
        starts = np.flatnonzero(brk)
        poff = np.empty(starts.size + 1, dtype=np.int64)
        poff[:-1] = starts
        poff[-1] = total
        if not isinstance(words, pa.LargeStringArray):
            words = words.cast(pa.large_string())
        piece = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(poff), words),
            pa.scalar(" ", pa.large_string()),
        )
        return pa.table(
            {
                "win_id": pa.array(w[starts]),
                "gpos": pa.array(g[starts]),
                "piece": piece,
                "npc": pa.array(np.diff(poff)),
            }
        )

    pcs = scanned.map_batches(pieces, batch_format="pyarrow", zero_copy_batch=True)
    agg = string_agg_by_key(
        pcs, "win_id", "gpos", "piece", "npc", sep=" ",
        out="win_text", n_out="n_win_tok",
    )
    res = _to_table(agg).sort_by("win_id")
    return res.select(["win_id", "n_win_tok", "win_text"]).set_column(
        2, "win_text", res.column("win_text").cast(pa.string())
    )


def q_pack_sequences(sf_dir: str):
    """Sequence packing (concat-then-chunk): documents in doc_id order are
    laid head-to-tail in token space and cut into fixed
    PACK_WINDOW_TOKENS context windows — each doc's window id is its
    exclusive running token offset // window.  The canonical pre-training
    packing op over a pre-tokenized corpus, built on the distributed
    prefix-scan primitive (functions/aggregates.with_prefix_sum: O(blocks)
    driver state, blocks never leave the object store)."""
    return _pack_by_tokens(_decoded(sf_dir, "documents", columns=["doc_id", "text"]))


SOURCE_CAP = 20


def q_source_cap(sf_dir: str):
    """Per-source quota capping (the per-domain cap of pretraining data
    curation): keep the top SOURCE_CAP docs of each source ranked by
    (n_chars DESC, doc_id), via the distributed window-rank operator
    (functions/aggregates.with_group_ranks: ROW_NUMBER OVER (PARTITION BY
    source ORDER BY ...) with an O(blocks) segmented carry — nothing
    O(sources) anywhere, so the key domain may be unbounded)."""
    from ..functions.aggregates import with_group_ranks

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    ranked = with_group_ranks(
        ds, ["source"], ["n_chars", "doc_id"], descending=[True, False], out="rnk"
    )

    def cap(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("rnk"), SOURCE_CAP))

    out = ranked.map_batches(cap, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).select(["source", "doc_id", "n_chars", "rnk"]).sort_by(
        [("source", "ascending"), ("rnk", "ascending")]
    )


def q_hash_split(sf_dir: str):
    """Deterministic holdout split: md5(doc_id) first hex digit in {0,1}
    selects a reproducible ~1/8 sample — the standard content-hash split
    that stays stable across runs, shards, and cluster sizes (no RNG
    state).  Vectorized through the block-parallel md5 kernel."""
    from ..functions.md5vec import md5_first_hex

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "source"])

    def split(t: pa.Table) -> pa.Table:
        # hash the string form of the id (matches SQL md5(doc_id), which
        # casts non-varchar ids to VARCHAR)
        keep = pa.array(np.isin(md5_first_hex(t.column("doc_id")), ["0", "1"]))
        return t.filter(keep)

    out = ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).sort_by("doc_id")


CURATION_QUALITY_E6 = 600_000  # keep docs at/above this quality score


def q_curation_pipeline(sf_dir: str):
    """Composed curation flagship — the end-to-end shape a training-data
    user actually runs, chaining the op library over one decoded stream:

        decode -> quality filter (floor-e6 score >= threshold)
               -> exact dedup (fingerprint shuffle + partitioned semi-join)
               -> token counts -> distributed prefix scan
               -> pack into fixed 256-token context windows

    Every stage is the same oracle-exact operator used standalone, so the
    whole composition has a single SQL mirror (quality CTE -> GROUP BY
    dedup -> window-SUM packing)."""
    from ..functions.dedup import dedup_exact_fingerprint
    from ..functions.text import quality_score

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def qfilter(t: pa.Table) -> pa.Table:
        q = quality_score(t, scale_e6=True)
        mask = pc.greater_equal(q.column("quality_e6"), CURATION_QUALITY_E6)
        return t.filter(mask)

    kept = ds.map_batches(qfilter, batch_format="pyarrow", zero_copy_batch=True)
    deduped = dedup_exact_fingerprint(kept, id_col="doc_id", text_col="text")
    return _pack_by_tokens(deduped)


def _curation_oracle_sql() -> str:
    return f"""
        WITH q AS ({_quality_oracle_sql()}),
        kept AS (
            SELECT d.doc_id, d.text FROM documents d
            JOIN q ON d.doc_id = q.doc_id
            WHERE q.quality_e6 >= {CURATION_QUALITY_E6}
        ),
        dedup AS (
            SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text
        ),
        {_pack_oracle_ctes("dedup")}
    """


def q_stratified_sample(sf_dir: str):
    """Deterministic per-source stratified sampling: the source NAME's
    md5 first nibble % 4 picks a tier with keep rate 100%/50%/25%/12.5%,
    applied via the md5(doc_id) first hex digit — RNG-free, stable
    across shards and cluster sizes (the sampling analog of
    q_hash_split), and total over arbitrary source strings (no
    'src<i>' naming assumption — an int parse here broke on corpora
    with non-numeric source names).  Per-batch vectorized tier lookup;
    the md5 buckets reuse the block-parallel md5 kernel."""
    from ..functions.decontam import md5_first_hex
    from ..functions.md5vec import md5_digests

    tier_digits = [None, list("01234567"), list("0123"), list("01")]
    ds = _decoded(sf_dir, "documents", columns=["doc_id", "source"])

    def sample(t: pa.Table) -> pa.Table:
        tiers = (md5_digests(t.column("source"))[:, 0] >> 4) % 4
        digits = md5_first_hex(t.column("doc_id"))
        keep = np.ones(t.num_rows, bool)
        for tier, allowed in enumerate(tier_digits):
            if allowed is not None:
                sel = tiers == tier
                keep[sel] = np.isin(digits[sel], allowed)
        return t.filter(pa.array(keep))

    out = ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out).sort_by("doc_id")


def q_weighted_sample(sf_dir: str):
    """Fixed-size weighted reservoir sample (Efraimidis-Spirakis A-ES)
    of 100 documents with inclusion priority ln(u)/n_chars — longer docs
    proportionally likelier.  Deterministic md5-derived uniforms make it
    RNG-free and shard/retry-stable; per batch only the local top-k
    leaves the task, and the e9-quantized priorities hash-match the
    identical-formula DuckDB oracle."""
    from ..functions.sampling import weighted_sample

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "n_chars"])
    t = weighted_sample(ds, "doc_id", "n_chars", k=100)
    return pa.table({"doc_id": t.column("id"), "pri_e9": t.column("pri_e9")})


def q_upsert_read(sf_dir: str):
    """Merge-on-read upsert (functions/upsert.py): a deterministic CDC
    delta (every doc with doc_id % 17 == 0, text upper-cased, n_chars
    kept) overlays the immutable base documents store at decode time —
    delta keys broadcast once behind a bloom fast path, base rows never
    shuffle, base chunks never rewritten.  The SQL mirror is the
    canonical anti-join UNION."""
    from ..functions.upsert import upsert_read

    base = _decoded(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def mk_delta(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % 17) == 0
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "text": pc.utf8_upper(sub.column("text")),
                "n_chars": sub.column("n_chars"),
            }
        )

    delta = _decoded(sf_dir, "documents", columns=["doc_id", "text", "n_chars"]).map_batches(
        mk_delta, batch_format="pyarrow", zero_copy_batch=True
    )
    return _to_table(upsert_read(base, delta, "doc_id")).sort_by("doc_id")


def q_balanced_sample(sf_dir: str):
    """Temperature-balanced corpus sampling (the multilingual-mix move:
    sample languages ∝ count^alpha, alpha=0.5): language-ID the decoded
    stream, lift per-language counts (tiny), give every doc weight
    sqrt(n_total / n_lang) — IEEE sqrt is exactly rounded, so the weight
    is bit-identical in SQL — and draw a 100-doc Efraimidis-Spirakis
    sample with the md5-uniform priorities.  Composes three proved
    operators (lang_id, distributed count, weighted_sample) into the
    standard data-mixing pipeline; rarer languages are up-weighted
    exactly as the alpha=0.5 temperature prescribes."""
    from ..functions.text import lang_id

    from ..functions.sampling import weighted_sample

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])
    # drop text + the unused lang_conf before materializing: only
    # (doc_id, lang_pred) is pinned in the object store
    tagged = ds.map_batches(
        lambda t: lang_id(t).select(["doc_id", "lang_pred"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    counts = _to_table(
        tagged.map_batches(
            lambda t: t.group_by("lang_pred").aggregate([([], "count_all")]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ).group_by("lang_pred").aggregate([("count_all", "sum")])
    langs = counts.column("lang_pred").combine_chunks()
    n_by = counts.column("count_all_sum").to_numpy(zero_copy_only=False).astype(np.float64)
    n_total = float(n_by.sum())
    weights = pa.array(np.sqrt(n_total / n_by))
    wref = ray.put((langs, weights))

    def add_weight(t: pa.Table, *, wref) -> pa.Table:
        langs, weights = ray.get(wref)
        pos = pc.index_in(t.column("lang_pred"), value_set=langs)
        return t.append_column("w", pc.take(weights, pos))

    t = weighted_sample(
        tagged.map_batches(functools.partial(add_weight, wref=wref), batch_format="pyarrow", zero_copy_batch=True),
        "doc_id",
        "w",
        k=_BALANCED_K,
        payload_cols=["lang_pred"],
    )
    return pa.table(
        {"doc_id": t.column("id"), "lang_pred": t.column("lang_pred"), "pri_e9": t.column("pri_e9")}
    )


def q_gopher_filter(sf_dir: str):
    """Gopher-style quality-rule document filter (Rae et al. 2021,
    MassiveText appendix A1.1) over the engine-decoded documents stream:
    keep docs with 30 <= words <= 80, mean word length in [4.0, 5.0],
    symbol marks ('#' + '...') <= 5% of words, and >= 2 hits of the
    10-word Gopher stop list.  One vectorized metric pass
    (functions/text.gopher_rules); thresholds applied per batch, so the
    filter streams — the driver collects only survivors' metric rows."""
    from ..functions.text import gopher_rules

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def rules(t: pa.Table) -> pa.Table:
        m = gopher_rules(t)
        nw = m.column("n_words")
        mwl = m.column("mwl_e6")
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(nw, 30), pc.less_equal(nw, 80)),
                pc.and_(pc.greater_equal(mwl, 4_000_000), pc.less_equal(mwl, 5_000_000)),
            ),
            pc.and_(
                # n_sym <= 0.05 * n_words in IEEE doubles (SQL parity)
                pc.less_equal(
                    m.column("n_sym").cast(pa.float64()),
                    pc.multiply(nw.cast(pa.float64()), 0.05),
                ),
                pc.greater_equal(m.column("stop_hits"), 2),
            ),
        )
        return m.filter(keep)

    return _to_table(
        ds.map_batches(rules, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("doc_id")


def q_normalize_text(sf_dir: str):
    """Canonical text normalization — the first stage of every dedup /
    tokenize pipeline: lowercase, collapse all whitespace runs to one
    space, trim.  Three Arrow kernels per batch (utf8_lower,
    replace_substring_regex, utf8_trim_whitespace), zero Python per row;
    output is the normalized text itself so the SQL mirror pins the
    exact bytes."""
    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t.column("text"))
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({"doc_id": t.column("doc_id"), "norm_text": s})

    return _to_table(
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("doc_id")


def q_bin_export(sf_dir: str):
    """Training-shard binary export gate — the last stage of the
    pre-training data path (tokenize -> dedup -> pack -> EXPORT).  A
    (doc_id, tokens:list<int32>) stream (tokens = byte lengths of the
    whitespace words, so the oracle can derive the identical list in SQL)
    is written through pipeline/orcio.write_bin_parts — self-indexed flat
    int32 shards, the Megatron-LM indexed-dataset idea as
    content-addressed parts — then READ BACK from the .bin files alone,
    and per-sequence (n_tok, token sum, first/last token) are computed
    from the binary payload.  Any infidelity in the shard writer, header
    layout, alignment or reader breaks the value hash vs the SQL that
    never saw the shards."""
    import ray as _ray

    from ..functions.text import _ws_words
    from ..pipeline.orcio import read_bin_part, write_bin_parts

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        off, flat, n_words = _ws_words(t.column("text"), lower=False)
        wl = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int32)
        starts = off[:-1]
        # an empty/whitespace-only doc contributed exactly one "" word
        mask = np.ones(len(wl), dtype=bool)
        mask[starts[np.flatnonzero(n_words == 0)]] = False
        new_off = np.zeros(len(t) + 1, dtype=np.int32)
        np.cumsum(n_words, out=new_off[1:])
        tokens = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), pa.array(wl[mask], pa.int32())
        )
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.string()), "tokens": tokens}
        )

    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|binshards|v2".encode()).hexdigest()[:10]
    shard_dir = os.path.join(CACHE_ROOT, f"binshards-{key}")
    man = write_bin_parts(
        ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True),
        shard_dir,
        batch_size=4096,
    )
    paths = man.column("path").to_pylist()  # O(shards) driver rows

    def summarize(b: pa.Table) -> pa.Table:
        outs = []
        for p in b.column("item").to_pylist():
            t = read_bin_part(p)
            toks = t.column("tokens").combine_chunks()
            off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            off = off - off[0]
            vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
            n_tok = np.diff(off)
            cs = np.zeros(len(vals) + 1, dtype=np.int64)
            np.cumsum(vals, out=cs[1:])
            sums = cs[off[1:]] - cs[off[:-1]]
            has = n_tok > 0
            if len(vals):
                first = np.where(has, vals[np.minimum(off[:-1], len(vals) - 1)], 0)
                last = np.where(has, vals[np.maximum(off[1:] - 1, 0)], 0)
            else:  # shard of only empty sequences: no payload to index
                first = np.zeros(len(n_tok), dtype=np.int64)
                last = first
            outs.append(
                pa.table(
                    {
                        "seq_id": t.column("seq_id"),
                        "n_tok": pa.array(n_tok),
                        "tok_sum": pa.array(sums),
                        "first_tok": pa.array(first, pa.int64()),
                        "last_tok": pa.array(last, pa.int64()),
                        "has": pa.array(has),
                    }
                )
            )
        out = pa.concat_tables(outs) if outs else pa.table({})
        if out.num_rows == 0:
            return out
        # NULL first/last for empty sequences (SQL list indexing parity)
        has = out.column("has")
        ft = pc.if_else(has, out.column("first_tok"), pa.scalar(None, pa.int64()))
        lt = pc.if_else(has, out.column("last_tok"), pa.scalar(None, pa.int64()))
        return pa.table(
            {
                "seq_id": out.column("seq_id"),
                "n_tok": out.column("n_tok"),
                "tok_sum": out.column("tok_sum"),
                "first_tok": ft,
                "last_tok": lt,
            }
        )

    rb = _ray.data.from_items(paths).map_batches(
        summarize, batch_format="pyarrow", zero_copy_batch=True
    )
    return _to_table(rb).sort_by("seq_id")


_MIX_K = 200
_NULL_SRC = "\x00\x01orc-null-source"  # lookup sentinel, never a real source


def q_mixture_schedule(sf_dir: str):
    """Deterministic source-mixture scheduling — the exact-proportions
    interleaving a pre-training mixer uses to realize per-source
    temperature weights as a concrete document ORDER (stride scheduling
    from the scheduler literature, the deterministic counterpart of
    sampling-with-weights): source s's k-th document in doc_id order is
    placed at virtual time k / sqrt(n_s) (temperature-0.5 weights, IEEE
    sqrt/div bit-identical in SQL), and the first _MIX_K positions of
    the global order are returned with their ordinal.  Rare sources
    surface early and proportions converge exactly — no RNG, stable
    across shards and cluster sizes.

    Shape: per-batch per-source count partials (O(sources) driver rows)
    -> distributed window rank (with_group_ranks: one range sort,
    O(blocks) carries) -> broadcast sqrt-weights, vectorized virtual
    times -> per-block top-_MIX_K candidates -> tiny driver merge.
    Null sources form their own schedule lane (null-safe lookup via a
    sentinel; SQL joins IS NOT DISTINCT FROM)."""
    from ..functions.aggregates import with_group_ranks

    ds = _decoded(sf_dir, "documents", columns=["doc_id", "source"])
    counts = (
        _to_table(
            ds.map_batches(
                lambda t: t.group_by("source").aggregate([([], "count_all")]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        .group_by("source")
        .aggregate([("count_all", "sum")])
    )
    srcs_filled = pc.fill_null(counts.column("source").combine_chunks(), _NULL_SRC)
    sw = np.sqrt(counts.column("count_all_sum").to_numpy(zero_copy_only=False).astype(np.float64))
    wref = ray.put((srcs_filled, pa.array(sw)))

    ranked = with_group_ranks(ds, ["source"], ["doc_id"], out="k")
    order = [("v_e9", "ascending"), ("source", "ascending"), ("doc_id", "ascending")]

    def vtime(t: pa.Table, *, wref) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            # schema-less empty sort partition (_add_ranks convention)
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "v_e9": pa.array([], pa.int64()),
                }
            )
        srcs, w_arr = ray.get(wref)
        pos = pc.index_in(pc.fill_null(t.column("source").combine_chunks(), _NULL_SRC), value_set=srcs)
        w = pc.take(w_arr, pos).to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.floor(k / w * 1000000000).astype(np.int64)
        out = pa.table(
            {"doc_id": t.column("doc_id"), "source": t.column("source"), "v_e9": pa.array(v)}
        )
        # the global top-K must be among each block's K smallest
        return out.sort_by(order).slice(0, _MIX_K)

    cand = ranked.map_batches(
        functools.partial(vtime, wref=wref), batch_format="pyarrow", zero_copy_batch=True
    )
    top = _to_table(cand).sort_by(order).slice(0, _MIX_K)
    return top.add_column(0, "pos", pa.array(np.arange(1, top.num_rows + 1)))


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
ORACLE_SQL = {
    "pack_sequences": "WITH " + _pack_oracle_ctes("documents"),
    "pack_windows": rf"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        off AS (
            SELECT doc_id, toks,
                   COALESCE(SUM(len(toks)) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum
            FROM tok
        ),
        g AS (
            SELECT cum + i AS gpos, tok
            FROM (SELECT cum, unnest(toks) AS tok,
                         unnest(range(len(toks))) AS i FROM off)
        )
        SELECT CAST(gpos // {PACK_WINDOW_TOKENS} AS BIGINT) AS win_id,
               COUNT(*) AS n_win_tok,
               STRING_AGG(tok, ' ' ORDER BY gpos) AS win_text
        FROM g GROUP BY win_id ORDER BY win_id
    """,
    "source_cap": """
        SELECT source, doc_id, n_chars, rnk FROM (
            SELECT source, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rnk
            FROM documents
        ) WHERE rnk <= 20 ORDER BY source, rnk
    """,
    "hash_split": """
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        ORDER BY doc_id
    """,
    "stratified_sample": r"""
        SELECT doc_id, source FROM documents
        WHERE CASE CAST(('0x' || substr(md5(source), 1, 1)) AS BIGINT) % 4
              WHEN 0 THEN TRUE
              WHEN 1 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('0','1','2','3','4','5','6','7')
              WHEN 2 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('0','1','2','3')
              ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') END
        ORDER BY doc_id
    """,
    "normalize_text": r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
        FROM documents ORDER BY doc_id
    """,
    "mixture_schedule": f"""
        WITH cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        r AS (SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS k
              FROM documents),
        v AS (SELECT r.doc_id, r.source,
                     CAST(FLOOR(r.k / sqrt(cnt.n) * 1000000000) AS BIGINT) AS v_e9
              FROM r JOIN cnt ON r.source IS NOT DISTINCT FROM cnt.source)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY v_e9, source, doc_id) AS BIGINT) AS pos,
               doc_id, source, v_e9
        FROM v ORDER BY v_e9, source, doc_id LIMIT {_MIX_K}
    """,
    "bin_export": r"""
        WITH w AS (
            SELECT CAST(doc_id AS VARCHAR) AS seq_id,
                   list_transform(
                       list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
                                   x -> x <> ''),
                       x -> CAST(strlen(x) AS BIGINT)) AS toks
            FROM documents
        )
        SELECT seq_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(COALESCE(list_aggregate(toks, 'sum'), 0) AS BIGINT) AS tok_sum,
               CASE WHEN len(toks) > 0 THEN toks[1] END AS first_tok,
               CASE WHEN len(toks) > 0 THEN toks[len(toks)] END AS last_tok
        FROM w ORDER BY seq_id
    """,
    "gopher_filter": r"""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\s+')) END AS n_words,
                   LENGTH(regexp_replace(text, '\s', '', 'g')) AS nonws,
                   (LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
                     + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS n_sym
            FROM documents
        ),
        words AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS stop_hits FROM words
            WHERE w IN ('the','be','to','of','and','that','have','with','a','in')
            GROUP BY doc_id
        ),
        met AS (
            SELECT b.doc_id, b.n_words,
                   CAST(FLOOR((b.nonws / GREATEST(b.n_words, 1)) * 1000000.0) AS BIGINT) AS mwl_e6,
                   b.n_sym, COALESCE(h.stop_hits, 0) AS stop_hits
            FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mwl_e6,
               CAST(n_sym AS BIGINT) AS n_sym, CAST(stop_hits AS BIGINT) AS stop_hits
        FROM met
        WHERE n_words BETWEEN 30 AND 80
          AND mwl_e6 BETWEEN 4000000 AND 5000000
          AND CAST(n_sym AS DOUBLE) <= 0.05 * n_words
          AND stop_hits >= 2
        ORDER BY doc_id
    """,
    "weighted_sample": """
        SELECT doc_id,
               CAST(FLOOR(LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                             / 1152921504606846977.0)
                          / n_chars * 1000000000) AS BIGINT) AS pri_e9
        FROM documents
        WHERE n_chars > 0  -- zero-weight rows have zero inclusion probability
        ORDER BY pri_e9 DESC, doc_id LIMIT 100
    """,
    "upsert_read": """
        WITH delta AS (
          SELECT doc_id, UPPER(text) AS text, n_chars
          FROM documents WHERE doc_id % 17 = 0
        )
        SELECT doc_id, text, n_chars FROM delta
        UNION ALL
        SELECT doc_id, text, n_chars FROM documents
        WHERE doc_id % 17 <> 0
        ORDER BY doc_id
    """,
    "balanced_sample": _balanced_sample_oracle_sql(),
    "curation_pipeline": _curation_oracle_sql(),
}
