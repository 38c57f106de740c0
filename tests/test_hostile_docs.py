"""Hostile documents corpus through the documents-only query family.

The sf testdata is ASCII, single-space separated, never null — so it
cannot catch divergences that real corpora hit on day one: null/empty/
whitespace-only texts, multi-space and tab separators, non-ASCII
(multi-byte UTF-8), exact-duplicate rows, and non-numeric source names.
This corpus pins every one of those against the DuckDB oracles.

Regressions this file guards (each was a live bug found by the sweep):
- chunk_passages: null text -> NaN -> INT64_MIN -> ~6e16-round loop
- agg_by_keys: one null key silently emptied the ENTIRE result
- dedup_exact: null text deduped together with '' (SQL keeps them apart)
- _shingle_keys: empty doc at batch tail indexed past the key array
- weighted_sample: zero-weight rows raised instead of being excluded
- stratified_sample: int-parse of 'src<i>' broke on other source names
- token semantics: phantom '' words on tab-padded docs in the oracles
- dedup_ngram: char-substring oracle diverged from byte windows on UTF-8
"""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERY_NAMES = [
    "token_counts", "quality_scores", "repetition_stats", "pack_sequences",
    "pack_windows",
    "dedup_exact", "dedup_ngram", "prefix_clusters", "vocab_table",
    "word_bigrams", "source_vocab_overlap", "stratified_sample",
    "weighted_sample", "decontaminate", "chunk_passages",
    # single-language corpus edges: NB with ONE class (priors ln(1)=0),
    # DSIR with target == raw (every weight is exactly the smoothing
    # residue on both sides), NTILE tertiles within one partition
    "nb_lang_confusion", "dsir_weights", "perplexity_buckets",
]

HOSTILE_TEXTS = [
    "", "   \t  ", None, "\n\n\n", "word", "word ", " word", "word  word",
    "café naïve 你好 世界 \U0001F600",
    "a " * 40 + "a",
    "the the the the the",
    "tab\tseparated\ttokens",
    'comma, "quoted" text, with; punct!',
    "UPPER lower MiXeD 123 456",
]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostiledocs")
    rng = np.random.default_rng(23)
    vocab = ["the", "fast", "key", "order", "sort", "merge", "window",
             "scan", "batch", "stream", "join", "value"]
    texts, sources = [], []
    for i in range(90):
        if i % 3 == 2:
            texts.append(HOSTILE_TEXTS[i % len(HOSTILE_TEXTS)])
        else:
            texts.append(" ".join(rng.choice(vocab, rng.integers(6, 30))))
        sources.append(["srcA", "src1", "s rc", ""][i % 4])
    # exact duplicate + near-duplicate pair at the tail
    texts += [texts[0], texts[0], texts[0] + " extra", None, ""]
    sources += ["srcA"] * 5
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "de"][:1] * len(texts), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _norm(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()
    return len(df), tuple(df.columns), h


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_docs_query_on_hostile_corpus(name, sf_dir, ray_session):
    import ray as _ray

    from orc_ray.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](sf_dir)
    if isinstance(res, _ray.data.Dataset):
        res = pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        )
    mine = res.to_pandas() if isinstance(res, pa.Table) else res

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(ORACLE_SQL[name]).df()
    assert _norm(mine) == _norm(exp)


def test_minhash_runs_on_hostile_corpus(sf_dir, ray_session):
    """No oracle (approximate op) — but it must survive empty docs at
    batch tails and report the exact duplicate pair as a cluster edge."""
    from orc_ray.queries import QUERIES

    out = QUERIES["dedup_minhash"](sf_dir)
    df = out.to_pandas() if isinstance(out, pa.Table) else out
    assert len(df) > 0
