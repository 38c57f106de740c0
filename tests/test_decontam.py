"""Decontamination + repetition-stat kernels vs brute-force references."""
import collections
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from orc_ray.functions.decontam import decontaminate, md5_first_hex, word_ngrams
from orc_ray.functions.text import repetition_stats

VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "a", "the"]


def _rand_texts(rng, n, empties=True):
    out = []
    for i in range(n):
        if empties and i % 17 == 0:
            out.append("")
        elif empties and i % 17 == 1:
            out.append("   ")
        else:
            k = int(rng.integers(1, 30))
            out.append(" ".join(rng.choice(VOCAB, k)))
    return out


def _brute_grams(text, n):
    ws = text.split()
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


@pytest.mark.parametrize("n", [2, 4, 6])
def test_word_ngrams_matches_bruteforce(n):
    rng = np.random.default_rng(5)
    texts = _rand_texts(rng, 200)
    grams, doc_of = word_ngrams(pa.array(texts), n)
    got = collections.defaultdict(list)
    for g, d in zip(grams.to_pylist(), doc_of):
        got[int(d)].append(g)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _brute_grams(t, n), (i, t)


def test_word_ngrams_empty_batch():
    grams, doc_of = word_ngrams(pa.array([], pa.string()), 4)
    assert len(grams) == 0 and len(doc_of) == 0


def test_md5_first_hex_matches_hashlib():
    ids = pa.array([0, 7, 123456], pa.int64())
    got = md5_first_hex(ids)
    exp = [hashlib.md5(str(v).encode()).hexdigest()[0] for v in [0, 7, 123456]]
    assert list(got) == exp


def test_decontaminate_matches_bruteforce(ray_session):
    import ray

    rng = np.random.default_rng(11)
    n_docs, n = 300, 3
    texts = _rand_texts(rng, n_docs, empties=False)
    ids = [f"doc{i}" for i in range(n_docs)]
    t = pa.table({"doc_id": ids, "text": texts})
    out = (
        pa.concat_tables(
            decontaminate(
                ray.data.from_arrow(t).repartition(7), n=n
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
        .column("doc_id")
        .to_pylist()
    )

    bench_grams = set()
    for i, txt in zip(ids, texts):
        if hashlib.md5(i.encode()).hexdigest()[0] == "0":
            bench_grams.update(_brute_grams(txt, n))
    expect = [
        i
        for i, txt in zip(ids, texts)
        if hashlib.md5(i.encode()).hexdigest()[0] != "0"
        and not (set(_brute_grams(txt, n)) & bench_grams)
    ]
    assert sorted(out) == sorted(expect)
    # the op must actually discriminate on this corpus
    n_bench = sum(1 for i in ids if hashlib.md5(i.encode()).hexdigest()[0] == "0")
    assert 0 < len(expect) < n_docs - n_bench


def test_repetition_stats_matches_bruteforce():
    rng = np.random.default_rng(3)
    texts = _rand_texts(rng, 250)
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = repetition_stats(t).to_pylist()
    for row, txt in zip(got, texts):
        ws = txt.split()
        nw = len(ws)
        top = max(collections.Counter(ws).values()) if ws else 0
        grams = [(ws[i], ws[i + 1]) for i in range(nw - 1)]
        n_g = max(nw - 1, 0)
        dup = n_g - len(set(grams))
        assert row["n_words"] == nw
        assert row["top_word_frac_e6"] == top * 1_000_000 // max(nw, 1)
        assert row["dup_2gram_frac_e6"] == dup * 1_000_000 // max(n_g, 1)
