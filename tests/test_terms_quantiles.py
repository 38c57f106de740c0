"""Unit tests for the word-level aggregation combiners and the exact
distributed quantile selection — brute-force references independent of
the DuckDB oracle sweep (which covers the same queries end-to-end)."""

import numpy as np
import pyarrow as pa

from orc_ray.functions.text import bigram_rows, word_tf_df_rows


def _brute_words(docs):
    return [d.split() for d in docs]


def test_word_tf_df_rows_bruteforce():
    docs = ["a b a c", "", "b c b", "   ", "x", "a a a a"]
    srcs = ["s1", "s1", "s2", "s2", "s1", "s2"]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs))), "text": pa.array(docs), "source": pa.array(srcs)}
    )
    out = word_tf_df_rows(t)
    tf = {}
    df = {}
    for d, s in zip(docs, srcs):
        ws = d.split()
        for w in ws:
            tf[(s, w)] = tf.get((s, w), 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    got_tf = {}
    got_df = {}
    for k, s, w, c in zip(
        out.column("kind").to_pylist(),
        out.column("source").to_pylist(),
        out.column("w").to_pylist(),
        out.column("c").to_pylist(),
    ):
        if k == 0:
            got_tf[(s, w)] = c
        else:
            got_df[w] = c
    assert got_tf == tf
    assert got_df == df


def test_bigram_rows_bruteforce():
    docs = ["a b c a b", "", "x", "p q", "  "]
    t = pa.table({"text": pa.array(docs)})
    out = bigram_rows(t)
    exp = {}
    for d in docs:
        ws = d.split()
        for i in range(len(ws) - 1):
            exp[(ws[i], ws[i + 1])] = exp.get((ws[i], ws[i + 1]), 0) + 1
    got = {
        (a, b): c
        for a, b, c in zip(
            out.column("w1").to_pylist(),
            out.column("w2").to_pylist(),
            out.column("c").to_pylist(),
        )
    }
    assert got == exp


def test_quantile_selection_matches_duckdb():
    """The ceil(q*n) searchsorted selection must equal DuckDB's
    quantile_disc on arbitrary multisets (including heavy duplicates)."""
    import duckdb

    rng = np.random.default_rng(11)
    for n in [1, 2, 7, 100, 1001]:
        vals = rng.integers(-50, 50, size=n).astype(np.int64)
        v, c = np.unique(vals, return_counts=True)
        cum = np.cumsum(c)
        con = duckdb.connect()
        con.execute("CREATE TABLE t(v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(int(x),) for x in vals])
        for q in [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]:
            k = max(1, int(np.ceil(q * n)))
            mine = int(v[np.searchsorted(cum, k)])
            ref = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert mine == ref, (n, q, mine, ref)
