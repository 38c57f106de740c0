"""Empty/whitespace/null documents through the text-query family.

The DuckDB mirrors exclude empty docs via WHERE trim(text) <> '' — the
Ray side must mask the phantom "" word those docs contribute to the
flattened word stream (regexp_split('') == ['']), or vocab counts,
logprob totals and top-K cuts silently diverge on corpora containing
them.  The sf testdata has no empty docs, so this corpus pins the
behavior explicitly.
"""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERY_NAMES = ["oov_rate", "unigram_logprob", "tokenize_corpus",
               "bigram_logprob", "lexical_diversity", "token_histogram",
               "chunk_passages"]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("emptydocs")
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts, langs = [], []
    for i in range(400):
        kind = i % 8
        if kind == 5:
            texts.append("")              # empty
        elif kind == 6:
            texts.append("   \t  ")       # whitespace-only
        elif kind == 7:
            texts.append(None)            # null == empty
        else:
            texts.append(" ".join(rng.choice(vocab, rng.integers(1, 12))))
        langs.append("en" if i % 2 else "de")
    t = pa.table({
        "doc_id": [f"doc-{i:016d}" for i in range(400)],
        "text": pa.array(texts, pa.string()),
        "lang": langs,
        "source": [f"s{i % 3}" for i in range(400)],
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
def test_text_query_on_empty_doc_corpus(name, sf_dir, ray_session):
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
