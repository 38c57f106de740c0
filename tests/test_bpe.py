"""Byte-level BPE (functions/bpe.py): parity with the sequential
reference algorithm (Sennrich'16 train / rank-order apply), overlap
semantics, unicode byte-exactness, null/empty docs, driver ceilings."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from orc_ray.functions.bpe import (
    apply_merges,
    bpe_apply,
    bpe_apply_batch,
    bpe_train,
    train_merges,
)


def ref_train(word_freqs: dict, n_merges: int):
    """Sequential reference: pair counts over the word-freq dict, merge
    (max count, lexicographically smallest pair), leftmost-greedy scan."""
    vocab = {w: [bytes([b]) for b in w.encode()] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, f in word_freqs.items():
            seq = vocab[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] = pairs.get((seq[i], seq[i + 1]), 0) + f
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < 2:
            break
        best = min([p for p, c in pairs.items() if c == mx])
        merges.append(best)
        for w in vocab:
            seq = vocab[w]
            new, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and (seq[i], seq[i + 1]) == best:
                    new.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            vocab[w] = new
    return merges, vocab


def _check_parity(word_freqs: dict, n_merges: int):
    words = pa.array(list(word_freqs), pa.string())
    freqs = np.array(list(word_freqs.values()), np.int64)
    merges, sym_bytes = train_merges(words, freqs, n_merges)
    rmerges, rvocab = ref_train(word_freqs, n_merges)
    assert [(sym_bytes[l], sym_bytes[r]) for l, r, _ in merges] == rmerges
    tok_flat, tok_off = apply_merges(words, merges)
    for i, w in enumerate(word_freqs):
        toks = [sym_bytes[t] for t in tok_flat[tok_off[i]: tok_off[i + 1]]]
        assert toks == rvocab[w], (w, toks, rvocab[w])


def test_train_apply_parity_basic():
    _check_parity(
        {"the": 10, "then": 4, "aaaa": 3, "banana": 5, "bandana": 2, "a": 7}, 12
    )


def test_overlap_runs():
    """left==right runs merge leftmost-greedy: aaaa -> (aa)(aa),
    aaa -> (aa)a — the sequential-scan semantics."""
    _check_parity({"aaaa": 5, "aaa": 4, "aa": 3}, 4)


def test_unicode_bytes():
    """Multi-byte UTF-8 words split at the BYTE level and detokenize
    byte-identically (no unicode special-casing anywhere)."""
    _check_parity({"café": 6, "naïve": 4, "你好": 5, "你好吗": 3}, 8)


def test_parity_fuzz():
    rng = np.random.default_rng(42)
    letters = list("abcdefg")
    for trial in range(5):
        words = {
            "".join(rng.choice(letters, rng.integers(1, 9))): int(rng.integers(1, 20))
            for _ in range(40)
        }
        _check_parity(words, 15)


def test_apply_batch_edges():
    merges, sym_bytes = train_merges(
        pa.array(["hello", "help"], pa.string()), np.array([5, 3], np.int64), 4
    )
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            "text": pa.array(["hello help", "", None, "   \t ", "HELLO"], pa.string()),
            "source": pa.array(["s1", "s2", "s3", "s4", "s5"], pa.string()),
        }
    )
    out = bpe_apply_batch(t, merges, sym_bytes, verify=True)
    assert out.num_rows == 5  # every doc kept, wordless ones empty
    ntok = out.column("n_tok").to_pylist()
    assert ntok[1] == 0 and ntok[2] == 0 and ntok[3] == 0
    assert ntok[0] > 0 and ntok[4] > 0
    # lowercasing: "HELLO" tokenizes exactly like "hello"
    toks = out.column("tokens").to_pylist()
    hello = [x for x in toks[0]][: len(toks[4])]
    assert toks[4] == hello
    assert out.column_names == ["doc_id", "source", "tokens", "n_tok"]


def test_detok_verify_catches_corruption():
    merges, sym_bytes = train_merges(
        pa.array(["abab"], pa.string()), np.array([4], np.int64), 2
    )
    t = pa.table({"text": pa.array(["abab"], pa.string())})
    bpe_apply_batch(t, merges, sym_bytes, verify=True)  # green path
    bad = list(sym_bytes)
    # corrupt the FINAL merge's symbol — the one the tokens actually use
    # (earlier merges get absorbed into later ones on this corpus)
    bad[merges[-1][2]] = b"zz"
    with pytest.raises(AssertionError):
        bpe_apply_batch(t, merges, bad, verify=True)


def test_distributed_train_matches_local(ray_session):
    texts = ["the cat sat", "the cat ran", "a cat sat on the mat", "", None, "THE THE"]
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(texts))], pa.string()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    stats = {}
    merges, sym_bytes = bpe_train(ds, text_col="text", n_merges=8, stats_out=stats)

    wf = {}
    for x in texts:
        for w in (x or "").lower().split():
            wf[w] = wf.get(w, 0) + 1
    rmerges, _ = ref_train(wf, 8)
    assert [(sym_bytes[l], sym_bytes[r]) for l, r, _ in merges] == rmerges
    assert stats["vocab_rows"] == len(wf)  # O(vocab) driver ceiling
    assert stats["total_word_bytes"] == sum(len(w) * f for w, f in wf.items())

    out = pa.concat_tables(
        list(
            bpe_apply(ds, (merges, sym_bytes), text_col="text", verify=True)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
    ).sort_by("doc_id")
    assert out.num_rows == len(texts)
    assert out.column("tokens").type.value_type == pa.int32()


def test_top_words_cap(ray_session):
    t = pa.table(
        {"text": pa.array([f"w{i} common" for i in range(50)], pa.string())}
    )
    ds = ray.data.from_arrow(t)
    stats = {}
    bpe_train(ds, text_col="text", n_merges=2, top_words=5, stats_out=stats)
    assert stats["vocab_rows"] == 5
