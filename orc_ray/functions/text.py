"""Text analysis kernels — vectorized over Arrow string columns.

Training-data quality/statistics stages: token counting, quality scoring,
language-ID heuristic, document fingerprinting.  Each is a pure function
batch -> batch suitable for ``ds.map_batches(fn, batch_format="pyarrow")``;
stateful variants (compiled regexes, stopword tables) are prepared at
module import — i.e. once per Ray worker process, the actor-pool pattern.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer (GPT-2 style contraction/word/number/punct split),
# compiled once per worker
_BPE_RE = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "a", "is", "that", "it", "was", "for", "on", "with", "as", "at", "by"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans", "que", "pour", "sur", "pas"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "un", "una", "en", "que", "por", "para", "con", "no"},
}


def _concat_np(text: pa.ChunkedArray | pa.Array):
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return text


def token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace tokens + BPE-ish token count per document."""
    texts = _concat_np(batch.column(col)).to_pylist()
    ws = np.fromiter((len(t.split()) if t else 0 for t in texts), np.int64, len(texts))
    bpe = np.fromiter((len(_BPE_RE.findall(t)) if t else 0 for t in texts), np.int64, len(texts))
    out = batch.select([c for c in batch.column_names if c != col])
    out = out.append_column("n_ws_tokens", pa.array(ws))
    return out.append_column("n_bpe_tokens", pa.array(bpe))


def quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Heuristic quality signals: length, punctuation/upper/digit/stopword
    ratios and a combined [0,1] score — all pyarrow/numpy vectorized."""
    text = _concat_np(batch.column(col))
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    nz = np.maximum(n_chars, 1.0)

    def ratio_of(pattern: str) -> np.ndarray:
        kept = pc.utf8_length(pc.replace_substring_regex(text, pattern=pattern, replacement=""))
        return (n_chars - kept.to_numpy(zero_copy_only=False)) / nz

    punct = ratio_of(r"[^\w\s]")
    digits = ratio_of(r"[0-9]")
    upper = ratio_of(r"[A-Z]")
    # stopword hit-rate over lowercased whitespace tokens (vectorized via set)
    texts = text.to_pylist()
    sw = _STOPWORDS["en"]
    sw_ratio = np.fromiter(
        (
            (sum(1 for w in t.lower().split() if w in sw) / max(len(t.split()), 1)) if t else 0.0
            for t in texts
        ),
        np.float64,
        len(texts),
    )
    len_score = np.clip(n_chars / 500.0, 0, 1)
    score = np.clip(
        0.35 * len_score + 0.3 * np.clip(sw_ratio * 3, 0, 1) + 0.2 * (1 - np.clip(punct * 4, 0, 1)) + 0.15 * (1 - np.clip(digits * 5, 0, 1)),
        0,
        1,
    )
    out = batch.select([c for c in batch.column_names if c != col])
    for name, arr in [
        ("punct_ratio", punct),
        ("digit_ratio", digits),
        ("upper_ratio", upper),
        ("stopword_ratio", sw_ratio),
        ("quality", score),
    ]:
        out = out.append_column(name, pa.array(np.round(arr, 6)))
    return out


def lang_id(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stopword-profile language guess (n-gram heuristic class).  Returns
    the argmax language + its hit ratio."""
    texts = _concat_np(batch.column(col)).to_pylist()
    langs = list(_STOPWORDS)
    best_lang, best_ratio = [], []
    for t in texts:
        words = t.lower().split() if t else []
        denom = max(len(words), 1)
        scores = [(sum(1 for w in words if w in _STOPWORDS[lg]) / denom, lg) for lg in langs]
        s, lg = max(scores)
        best_lang.append(lg if s > 0 else "unk")
        best_ratio.append(round(s, 6))
    out = batch.select([c for c in batch.column_names if c != col])
    out = out.append_column("lang_pred", pa.array(best_lang, pa.string()))
    return out.append_column("lang_conf", pa.array(best_ratio, pa.float64()))


def fingerprint64(batch: pa.Table, col: str = "text") -> pa.Table:
    """64-bit FNV-1a content fingerprint per document, vectorized over the
    concatenated byte stream (segmented polynomial-hash trick)."""
    text = _concat_np(batch.column(col)).cast(pa.large_binary())
    bufs = text.buffers()
    off = np.frombuffer(bufs[1], np.int64, len(text) + 1, text.offset * 8)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lo = int(off[0])
    fps = _fnv1a_segmented(np.ascontiguousarray(data[lo : int(off[-1])]), (off - lo).astype(np.int64))
    out = batch.select(batch.column_names)
    return out.append_column("fingerprint", pa.array(fps.view(np.int64)))


def _fnv1a_segmented(concat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """FNV-1a per segment.  Sequential in segment length, vectorized across
    segments (the same lockstep pattern as the FSST parse)."""
    n = offsets.size - 1
    h = np.full(n, np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    lens = np.diff(offsets)
    max_len = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for i in range(max_len):
            active = lens > i
            idx = offsets[:-1][active] + i
            h[active] = (h[active] ^ concat[idx].astype(np.uint64)) * prime
    return h
