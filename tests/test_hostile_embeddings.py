"""Hostile embeddings corpus through the vector/ANN query family.

The sf testdata's embeddings table is fully non-null, so it cannot catch
what real embedding pipelines hit immediately: rows whose encoder failed
(whole-NULL embedding), partially-corrupt vectors (null ELEMENTS inside
the list), and unlabeled rows (NULL label).  This corpus pins the
oracle-backed vector queries against DuckDB and keeps the approximate
ones alive through their in-query recall self-asserts.

Regressions this file guards (each was a live bug found by the
hostile-embeddings sweep):
- _matrix's flatten-reshape silently skipping null lists and misaligning
  every row of the batch (crash or wrong neighbours in every kernel)
- floor(NaN)->INT64_MIN terms in label_centroids / embedding_moments
  (which cancel mod 2^64 whenever the null count is even - the
  wraparound coincidence that made moments "match" before the fix)
- kmeans_step seeding: a null-list vector still occupies a LIMIT k seed
  slot but is inert; distances sum over jointly-observed dims only
- the NULL label as its own GROUP BY group
- _query_vec returning 0-d NaN garbage for a NULL stored vector
  (now: None for probe loops, loud ValueError for the required id 0)
"""

import hashlib
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLE_BACKED = [
    "ann_topk", "label_centroids", "kmeans_step", "embedding_moments",
    "hybrid_retrieval", "dedup_embedding", "semdedup",
]
SELF_ASSERTED = ["ann_ivf", "ann_lsh", "kmeans_embeddings", "ann_topk_int8"]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostileemb"))
    for name in TABLES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if name == "embeddings":
            rows = t.to_pylist()
            for i, r in enumerate(rows):
                if i == 0:
                    continue  # vec_id 0 is the broadcast query vector: keep valid
                if i % 9 == 4:
                    r["embedding"] = None          # whole-row null embedding
                elif i % 13 == 6 and r["embedding"]:
                    r["embedding"][3] = None       # one null element
                if i % 7 == 2:
                    r["label"] = None              # null label group
            t = pa.Table.from_pylist(rows, schema=t.schema)
        pq.write_table(t, os.path.join(d, f"{name}.parquet"))
    return d


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()
    return len(df), tuple(df.columns), h


def _run(name, sf_dir):
    import ray as _ray

    from orc_ray.queries import QUERIES

    res = QUERIES[name](sf_dir)
    if isinstance(res, _ray.data.Dataset):
        res = pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        )
    return res


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_vector_query_on_hostile_corpus(name, sf_dir, oracle_con, ray_session):
    from orc_ray.queries import ORACLE_SQL

    res = _run(name, sf_dir)
    mine = res.to_pandas() if isinstance(res, pa.Table) else res
    exp = oracle_con.execute(ORACLE_SQL[name]).df()
    assert _norm(mine) == _norm(exp)


@pytest.mark.parametrize("name", SELF_ASSERTED)
def test_approximate_query_survives_hostile_corpus(name, sf_dir, ray_session):
    """The recall / convergence self-asserts inside these queries ARE the
    check; here we also pin that no dropped-row garbage leaks out."""
    res = _run(name, sf_dir)
    t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
    assert t.num_rows > 0
    for col in t.column_names:
        assert t.column(col).null_count == 0


def test_roundtrip_embeddings_bit_exact(sf_dir, ray_session):
    """Arrow-level compare (the pandas-str hash is blind to DuckDB's
    masked-float64 rendering of null elements): the chunk store must
    round-trip null lists and null elements byte-exactly."""
    res = _run("roundtrip_embeddings", sf_dir)
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    out = res.sort_by("vec_id").combine_chunks()
    src = src.sort_by("vec_id").combine_chunks()
    assert out.num_rows == src.num_rows
    for col in src.column_names:
        a = src.column(col).combine_chunks()
        b = out.column(col).combine_chunks()
        assert a.cast(b.type).equals(b), col
