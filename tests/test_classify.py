"""Naive Bayes classifier (functions/classify.py): brute-force parity,
null/edge semantics, OOV floor, and the driver-ceiling contract."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray

from orc_ray.functions.classify import (
    nb_build_model,
    nb_count_stage,
    nb_predict,
    nb_score_batch,
    nb_train,
)


def _ref_nb(docs: list[tuple[str, str | None]]):
    """Naive reference: train+score multinomial NB with e6-floored
    per-token log-probs, pure Python."""
    labeled = [(t, c) for t, c in docs if c is not None and t and t.split()]
    classes = sorted({c for _, c in labeled})
    vocab = sorted({w for t, _ in labeled for w in t.lower().split()})
    V = len(vocab)
    cw = {(w, c): 0 for w in vocab for c in classes}
    docs_c = {c: 0 for c in classes}
    for t, c in labeled:
        docs_c[c] += 1
        for w in t.lower().split():
            cw[(w, c)] += 1
    tot = {c: sum(cw[(w, c)] for w in vocab) for c in classes}
    lp = {
        (w, c): math.floor(math.log((cw[(w, c)] + 1.0) / (tot[c] + float(V))) * 1e6)
        for w in vocab
        for c in classes
    }
    floor = {c: math.floor(math.log(1.0 / (tot[c] + float(V))) * 1e6) for c in classes}
    n_docs = sum(docs_c.values())
    prior = {c: math.floor(math.log(docs_c[c] / n_docs) * 1e6) for c in classes}

    out = []
    for t, c in labeled:
        scores = {
            k: prior[k]
            + sum(lp.get((w, k), floor[k]) for w in t.lower().split())
            for k in classes
        }
        # tie-break: smallest class name among the maximal scores
        best = min([k for k in classes if scores[k] == max(scores.values())])
        out.append((t, c, best, scores[best]))
    return classes, vocab, out


def _mk_ds(rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(4), t


CORPUS = [
    ("d0", "the cat sat on the mat", "en"),
    ("d1", "le chat est sur le tapis", "fr"),
    ("d2", "the dog ran fast", "en"),
    ("d3", "le chien court vite", "fr"),
    ("d4", "cat and dog play", "en"),
    ("d5", "chat et chien jouent", "fr"),
    ("d6", "the le the le", "en"),  # mixed: priors + counts decide
    ("d7", "", "en"),  # empty: dropped everywhere
    ("d8", "   \t ", "fr"),  # whitespace-only: dropped
    ("d9", "unlabeled words here", None),  # null label: no supervision
    ("d10", None, "en"),  # null text: dropped
]


def test_nb_parity_vs_reference(ray_session):
    ds, _ = _mk_ds(CORPUS)
    model = nb_train(ds, text_col="text", label_col="lang")
    classes, vocab, ref = _ref_nb([(t, c) for _, t, c in CORPUS])
    assert model[0] == classes
    assert model[1].to_pylist() == vocab

    preds = nb_predict(ds, model, text_col="text")
    got = {}
    for b in preds.iter_batches(batch_format="pyarrow", batch_size=None):
        for i in range(b.num_rows):
            got[b.column("doc_id")[i].as_py()] = (
                b.column("pred")[i].as_py(),
                b.column("score_e6")[i].as_py(),
            )
    ref_by_text = {t: (p, s) for t, _, p, s in ref}
    for doc_id, text, lab in CORPUS:
        if lab is None or text is None or not text.split():
            continue  # unlabeled docs ARE scored (below); dropped docs aren't
        assert got[doc_id] == ref_by_text[text], (doc_id, got[doc_id], ref_by_text[text])
    # dropped docs never appear
    assert "d7" not in got and "d8" not in got and "d10" not in got
    # the unlabeled doc is scorable (OOV words -> floor row), label-free
    assert "d9" in got


def test_nb_oov_floor(ray_session):
    """Words unseen at train time take ln(1/(tot_c+V)) — exactly a
    zero-count cell, bundled as the matrix's last row."""
    ds, _ = _mk_ds(CORPUS)
    model = nb_train(ds, text_col="text", label_col="lang")
    classes, vocab, logp_e6, prior_e6 = model
    t = pa.table(
        {
            "doc_id": pa.array(["x0"], pa.string()),
            "text": pa.array(["zzz qqq www"], pa.string()),  # fully OOV
        }
    )
    out = nb_score_batch(t, model, text_col="text")
    assert out.num_rows == 1
    k = classes.index(out.column("pred")[0].as_py())
    expect = prior_e6[k] + 3 * logp_e6[len(vocab), k]
    assert out.column("score_e6")[0].as_py() == expect


def test_nb_no_labels(ray_session):
    rows = [("a", "some words", None), ("b", None, None)]
    ds, _ = _mk_ds(rows)
    model = nb_train(ds, text_col="text", label_col="lang")
    assert model[0] == []
    out = nb_predict(ds, model, text_col="text")
    total = sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow", batch_size=None))
    assert total == 0


def test_nb_driver_ceiling(ray_session):
    """The driver-side model table is O(labels x vocab) + O(labels):
    never O(corpus tokens)."""
    rows = [(f"d{i}", "alpha beta gamma delta " * 20, ["en", "fr"][i % 2]) for i in range(64)]
    ds, _ = _mk_ds(rows)
    stats = {}
    model = nb_train(ds, text_col="text", label_col="lang", stats_out=stats)
    V, C = len(model[1]), len(model[0])
    assert stats["model_rows"] <= V * C + C  # (c,w) pairs + doc sentinels
    assert stats["model_rows"] == 4 * 2 + 2  # 4 words x 2 labels + 2


def test_nb_count_stage_sentinel():
    """Doc counts ride under w='' — a word whitespace split can't emit."""
    t = pa.table(
        {
            "text": pa.array(["a b", "b b", None, ""], pa.string()),
            "source": pa.array(["x", "y", "x", "y"], pa.string()),
        }
    )
    out = nb_count_stage(t, text_col="text", label_col="source")
    rows = {(r["c"], r["w"]): r["n"] for r in out.to_pylist()}
    assert rows[("x", "")] == 1 and rows[("y", "")] == 1  # doc counts
    assert rows[("x", "a")] == 1 and rows[("x", "b")] == 1 and rows[("y", "b")] == 2


def test_nb_build_model_empty():
    counts = pa.table(
        {"c": pa.array([], pa.string()), "w": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    classes, vocab, logp, prior = nb_build_model(counts)
    assert classes == [] and len(vocab) == 0


# --- int8-quantized ANN (functions/similarity.py) ---------------------------


def test_quantize_int8_grid():
    from orc_ray.functions.similarity import quantize_int8

    m = np.array([[3.0, 4.0], [0.0, 0.0], [-1.0, 0.0]])
    q = quantize_int8(m)
    assert q.dtype == np.int8
    assert list(q[0]) == [76, 102]  # round(127*[0.6, 0.8])
    assert list(q[1]) == [0, 0]  # zero vector stays zero (norm guard)
    assert list(q[2]) == [-127, 0]


def test_topk_int8_matches_exact_on_separated_data(ray_session):
    """Well-separated vectors: the int8 grid cannot flip the ranking, so
    the quantized top-k ids EQUAL the exact float top-k ids, and integer
    dots are retry-deterministic."""
    from orc_ray.functions.similarity import topk_cosine, topk_cosine_int8

    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 32))
    vecs, ids = [], []
    for c in range(8):
        for j in range(40):
            vecs.append(base[c] + rng.normal(scale=0.05, size=32))
            ids.append(c * 100 + j)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    q = base[3]
    a = topk_cosine_int8(ds, q, k=10)
    b = topk_cosine(ds, q.astype(np.float64), k=10, dtype=np.float64)
    # between-cluster separation >> grid error: every neighbour comes
    # from the query's cluster on BOTH paths (within-cluster margins sit
    # below the int8 grid, so exact id sets may legitimately differ)
    assert all(v // 100 == 3 for v in a.column("vec_id").to_pylist())
    assert all(v // 100 == 3 for v in b.column("vec_id").to_pylist())
    a2 = topk_cosine_int8(ds, q, k=10)
    assert a.equals(a2)  # integer scores: deterministic merge


def test_topk_int8_null_embeddings(ray_session):
    from orc_ray.functions.similarity import topk_cosine_int8

    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], None, [0.9, 0.1]]),
    })
    ds = ray.data.from_arrow(t)
    out = topk_cosine_int8(ds, np.array([1.0, 0.0]), k=3)
    assert out.column("vec_id").to_pylist() == [0, 2]  # null row dropped
