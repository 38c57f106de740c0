"""Distributed multinomial Naive Bayes text classification.

The classifier-based curation step every large pre-training pipeline
runs (quality / domain filtering a la fastText-classifier gating,
CCNet, GPT-3's WebText-vs-CommonCrawl filter) reduced to its exactly
reproducible core: train a multinomial NB model over (label, word)
counts, score every document with integer-exact quantized
log-probabilities, keep/route documents by predicted class.

Scale shape (the part that matters at 10^12 docs):

- TRAIN is ONE ``sum_by_keys`` over per-batch (label, word) count
  partials — the shuffle is O(labels x vocab), never O(tokens); the
  per-class doc counts ride in the same reduction under a sentinel word
  (the empty string, which whitespace tokenization can never emit).
- The model (vocab array + dense [(V+1) x C] e6-quantized log-prob
  matrix + priors) broadcasts ONCE via ``ray.put``; at full-web scale
  the vocab is top-K'd with an OOV floor exactly like
  unigram_logprob/oov_rate (documented bound — here the full vocab
  keeps the SQL mirror exact, and the floor row only catches the
  phantom "" of empty docs, which is masked to zero anyway).
- PREDICT is a stateless map_batches pass: index_in probe, one
  cumsum-per-class segmented sum, argmax — no Python per row, nothing
  driver-side that scales with the corpus.

Determinism contract (what makes this ORACLE-EXACT where real-world NB
pipelines settle for "approximately the same"): every per-token
log-probability and every class prior is floored to e6 BEFORE summation,
so document scores are exact int64 sums — order-independent, shard- and
retry-stable — and the argmax tie-break is the ascending class name
(np.argmax over ascending-sorted classes picks the first maximum).
DuckDB reproduces the identical integers from the identical formula
(same libm ln on this host, same FLOOR, same integer sums).

Reference analog: the curation stage sits beside lang_id/quality_scores
in the text-analysis family (SURVEY.md LLM-pipeline ops); the reference
repo has no classifier, so this is a north-star addition like FSST.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _concat_np, _ws_words

# the doc-count sentinel: whitespace tokenization never yields "", so the
# per-class document counts can ride in the SAME keyed reduction as the
# (class, word) counts — one shuffle instead of two.
_DOC_SENTINEL = ""


def nb_count_stage(t: pa.Table, *, text_col: str = "text", label_col: str = "source") -> pa.Table:
    """Per-batch (label, word) -> count partials + per-label doc counts.

    Rows with a NULL label are excluded (they carry no supervision); docs
    with no words (empty/whitespace/null text) are excluded from BOTH the
    word counts and the doc counts — mirroring the SQL
    ``WHERE trim(text) <> '' AND label IS NOT NULL`` convention."""
    labels = t.column(label_col)
    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()  # NOT _concat_np: nulls must stay null
    off, flat, n_words = _ws_words(_concat_np(t.column(text_col)), lower=True)
    lab_valid = pc.is_valid(labels).to_numpy(zero_copy_only=False)
    doc_keep = lab_valid & (n_words > 0)

    word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
    word_keep = doc_keep[word_doc]
    flat = flat.filter(pa.array(word_keep))
    word_lab = labels.take(pa.array(word_doc[word_keep]))

    g = (
        pa.table({"c": word_lab, "w": flat})
        .group_by(["c", "w"])
        .aggregate([([], "count_all")])
    )
    doc_g = (
        pa.table({"c": labels.filter(pa.array(doc_keep))})
        .group_by("c")
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "c": pa.concat_arrays(
                [g.column("c").combine_chunks().cast(pa.string()),
                 doc_g.column("c").combine_chunks().cast(pa.string())]
            ),
            "w": pa.concat_arrays(
                [
                    g.column("w").combine_chunks().cast(pa.string()),
                    pa.array([_DOC_SENTINEL] * doc_g.num_rows, pa.string()),
                ]
            ),
            "n": pa.concat_arrays(
                [
                    g.column("count_all").cast(pa.int64()).combine_chunks(),
                    doc_g.column("count_all").cast(pa.int64()).combine_chunks(),
                ]
            ),
        }
    )


def nb_build_model(counts: pa.Table):
    """Driver-side model build from the O(labels x vocab) count table.

    Returns (classes: ascending str list, vocab: pa.StringArray sorted,
    logp_e6: int64[(V+1), C] Laplace-smoothed quantized log-probs with
    the OOV/zero-count floor ln(1/(tot_c+V)) as the LAST row,
    prior_e6: int64[C]).  All floors happen here, once, on exact integer
    counts — every downstream sum is integer math."""
    is_doc = pc.equal(counts.column("w"), _DOC_SENTINEL)
    doc_rows = counts.filter(is_doc)
    word_rows = counts.filter(pc.invert(is_doc))

    classes = sorted(doc_rows.column("c").to_pylist())
    cls_arr = pa.array(classes, pa.string())
    docs = np.zeros(len(classes), dtype=np.int64)
    di = pc.index_in(doc_rows.column("c"), value_set=cls_arr).to_numpy(zero_copy_only=False)
    np.add.at(docs, di.astype(np.int64),
              doc_rows.column("n").to_numpy(zero_copy_only=False))

    vocab = pc.unique(word_rows.column("w").combine_chunks())
    vocab = vocab.take(pc.sort_indices(vocab))
    V, C = len(vocab), len(classes)
    cw = np.zeros((V + 1, C), dtype=np.int64)
    if word_rows.num_rows:
        wi = pc.index_in(word_rows.column("w"), value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        ci = pc.index_in(word_rows.column("c"), value_set=cls_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(cw, (wi, ci), word_rows.column("n").to_numpy(zero_copy_only=False))
    tot = cw.sum(axis=0)  # tokens per class (floor row is all-zero)

    with np.errstate(divide="ignore"):
        logp = np.log((cw + 1.0) / (tot + float(V))) if C else np.zeros((V + 1, 0))
        prior = np.log(docs / float(docs.sum())) if docs.sum() else np.zeros(C)
    logp_e6 = np.floor(logp * 1_000_000).astype(np.int64)
    prior_e6 = np.floor(prior * 1_000_000).astype(np.int64)
    return classes, vocab, logp_e6, prior_e6


def nb_score_batch(
    t: pa.Table,
    model,
    *,
    text_col: str = "text",
) -> pa.Table:
    """Score one batch: every non-text column rides along, plus
    (pred, score_e6), for every doc with >=1 word.  Vectorized: index_in
    probe, ONE (n_tokens+1, C) cumsum, segmented-sum slice, argmax
    (ties -> first = ascending class name).  Words outside the training
    vocab (a different corpus, or docs whose label was NULL at train
    time) take the Laplace floor row."""
    classes, vocab, logp_e6, prior_e6 = model
    if not classes:  # no labeled training docs: nothing can be predicted
        out = {n: t.column(n).slice(0, 0) for n in t.column_names if n != text_col}
        out["pred"] = pa.array([], pa.string())
        out["score_e6"] = pa.array([], pa.int64())
        return pa.table(out)
    off, flat, n_words = _ws_words(_concat_np(t.column(text_col)), lower=True)
    pos = pc.index_in(flat, value_set=vocab)
    # OOV (incl. the phantom "" of empty docs, masked below) -> floor row
    pos = pc.fill_null(pos, len(vocab)).to_numpy(zero_copy_only=False).astype(np.int64)

    word_doc = np.repeat(np.arange(n_words.size, dtype=np.int64), np.diff(off))
    real = n_words[word_doc] > 0
    per_tok = logp_e6[pos]  # (n_tokens, C) copy
    per_tok[~real] = 0

    cum = np.zeros((per_tok.shape[0] + 1, per_tok.shape[1]), dtype=np.int64)
    np.cumsum(per_tok, axis=0, out=cum[1:])
    sums = cum[off[1:]] - cum[off[:-1]]  # (n_docs, C)
    scores = sums + prior_e6[None, :]
    pred_idx = np.argmax(scores, axis=1)

    keep = n_words > 0
    cols = {}
    for name in t.column_names:
        if name != text_col:
            cols[name] = t.column(name).filter(pa.array(keep))
    cls_arr = pa.array(classes, pa.string())
    cols["pred"] = cls_arr.take(pa.array(pred_idx[keep]))
    cols["score_e6"] = pa.array(scores[np.arange(scores.shape[0]), pred_idx][keep])
    return pa.table(cols)


def nb_train(ds, *, text_col: str = "text", label_col: str = "source",
             stats_out: dict | None = None):
    """Distributed train: one keyed reduction, model built on the driver.

    The driver-side table is O(labels x vocab) — pin the ceiling through
    ``stats_out`` (sum_by_keys boundary stats) when a test wants it."""
    from .aggregates import sum_by_keys

    def stage(t: pa.Table) -> pa.Table:
        return nb_count_stage(t, text_col=text_col, label_col=label_col)

    counts_ds = sum_by_keys(
        ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True),
        ["c", "w"],
        "n",
        stats_out=stats_out,
    )
    parts = list(counts_ds.iter_batches(batch_format="pyarrow", batch_size=None))
    counts = pa.concat_tables(parts).combine_chunks() if parts else pa.table(
        {"c": pa.array([], pa.string()), "w": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    if stats_out is not None:
        stats_out["model_rows"] = counts.num_rows
    return nb_build_model(counts)


def nb_predict(ds, model, *, text_col: str = "text"):
    """Broadcast the model once, score the stream."""
    import ray

    ref = ray.put(model)

    def stage(t: pa.Table) -> pa.Table:
        return nb_score_batch(t, ray.get(ref), text_col=text_col)

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
