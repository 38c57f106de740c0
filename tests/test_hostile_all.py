"""Combined all-hostile corpus through every query family at once.

One directory carries the union of the hostile recipes: relational null
FKs/measures/group keys, hostile document texts (null/empty/unicode,
null lang/source), hostile events (null user/type/value), and hostile
embeddings (null rows/elements/labels).  This file pins the queries the
per-family hostile files don't cover — store ops (purge/shuffle/sample/
zorder/upsert/ACID/IVM/encoded-vectors), the curation pipeline, text
statistics, and search — against the same DuckDB oracles the driver
gate runs.

Regressions this file guards (live bugs found by the combined sweep):
- STRING_AGG/COUNT DISTINCT null-lang semantics (collect_langs)
- inner-equality-join NULL-group drops vs null-safe joins
  (source_lang_entropy vs tokenize_corpus - both directions exist)
- purge predicate null semantics: a NULL lang does not match lang='de'
  and SURVIVES the purge
- -sentinel cummax for running MAX over null measures
- NULL dictionary codes as their own group in encoded-vector aggregation
- np.rint(NaN) drift in the incremental-view and merge-on-read streams
"""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
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

QUERY_NAMES = [
    "balanced_sample", "bigram_logprob", "bm25_search", "collect_langs",
    "curation_pipeline", "dedup_canonical", "dedup_substrings",
    "distinct_users", "dup_windows", "encoded_groupby",
    "filter_groupby_events", "fingerprints", "funnel", "gopher_filter",
    "hash_split", "ivm_revenue", "json_extract_stats", "lang_id",
    "lexical_diversity", "masked_export", "normalize_text", "oov_rate",
    "point_lookup_events", "predicate_pushdown", "projection_pushdown",
    "purged_documents", "roundtrip_documents", "roundtrip_events",
    "running_high_order", "salient_terms", "sampled_documents",
    "scrub_pii", "shuffled_documents", "sliding_distinct_users",
    "source_cap", "source_collocations", "source_lang_entropy",
    "status_transitions", "text_stats", "token_histogram",
    "tokenize_corpus", "unigram_logprob", "nb_lang_confusion",
    "dsir_weights", "perplexity_buckets", "watermark_windows",
    "zorder_lookup", "upsert_read", "acid_table_read",
    # format/store roundtrips: nulls through CSV text, AES dual reads,
    # real .orc interop, RLEv1 streams, damage-salvage, schema union
    "csv_roundtrip", "encrypted_roundtrip", "rekeyed_roundtrip",
    "orc_file_roundtrip", "recovered_roundtrip", "roundtrip_v011",
    "schema_union_read", "roundtrip_lineitem", "bin_export",
    "mixture_schedule",
    "dup_source_matrix",
]
ROWS_ONLY = ["approx_quantiles", "simhash", "dedup_minhash",
             "media_pipeline", "multimodal_features", "bpe_tokenize"]


def _null_out(t, col, step, phase):
    mask = (np.arange(t.num_rows) % step) == phase
    arr = t.column(col).combine_chunks()
    new = pc.if_else(pa.array(~mask), arr, pa.scalar(None, arr.type))
    return t.set_column(t.schema.get_field_index(col), col, new)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostileall"))
    for name in TABLES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if name == "customer":
            t = _null_out(t, "c_nationkey", 11, 4)
            t = _null_out(t, "c_acctbal", 13, 6)
            t = _null_out(t, "c_mktsegment", 17, 9)
        elif name == "orders":
            t = _null_out(t, "o_custkey", 12, 5)
            t = _null_out(t, "o_totalprice", 19, 8)
            t = _null_out(t, "o_orderpriority", 23, 11)
        elif name == "lineitem":
            t = _null_out(t, "l_discount", 21, 3)
            t = _null_out(t, "l_tax", 27, 13)
            t = _null_out(t, "l_returnflag", 31, 17)
            t = _null_out(t, "l_quantity", 37, 19)
        elif name == "supplier":
            t = _null_out(t, "s_nationkey", 7, 2)
            t = _null_out(t, "s_acctbal", 9, 4)
        elif name == "part":
            t = _null_out(t, "p_size", 8, 3)
            t = _null_out(t, "p_type", 15, 7)
        elif name == "events":
            t = _null_out(t, "user_id", 13, 3)
            t = _null_out(t, "event_type", 17, 5)
            t = _null_out(t, "value", 19, 7)
            t = _null_out(t, "ts", 23, 9)  # null event-times through windows/joins
            # malformed / null / non-integer JSON through the props regex
            # pull (json_extract_stats): both sides must degrade to NULL
            props = t.column("props").to_pylist()
            bad = ["not json", "", None, "{", "[1,2]", '{"k": }',
                   '{"k": "str"}', '{"K": 5}', '{"k": null}', '{"k": 1e99}']
            for i in range(len(props)):
                if i % 7 == 2:
                    props[i] = bad[i % len(bad)]
            t = t.set_column(t.schema.get_field_index("props"), "props",
                             pa.array(props, pa.string()))
        elif name == "documents":
            texts = t.column("text").to_pylist()
            for i in range(len(texts)):
                if i % 11 == 5:
                    texts[i] = HOSTILE_TEXTS[i % len(HOSTILE_TEXTS)]
            t = t.set_column(t.schema.get_field_index("text"), "text",
                             pa.array(texts, pa.string()))
            t = _null_out(t, "lang", 15, 8)
            t = _null_out(t, "source", 21, 10)
            nc = pa.array([len(x) if x is not None else None
                           for x in t.column("text").to_pylist()], pa.int64())
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars", nc)
        elif name == "embeddings":
            rows = t.to_pylist()
            for i, r in enumerate(rows):
                if i == 0:
                    continue
                if i % 9 == 4:
                    r["embedding"] = None
                elif i % 13 == 6 and r["embedding"]:
                    r["embedding"][3] = None
                if i % 7 == 2:
                    r["label"] = None
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


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_on_combined_hostile_corpus(name, sf_dir, oracle_con, ray_session):
    from orc_ray.queries import ORACLE_SQL

    res = _run(name, sf_dir)
    mine = res.to_pandas() if isinstance(res, pa.Table) else res
    exp = oracle_con.execute(ORACLE_SQL[name]).df()
    assert _norm(mine) == _norm(exp)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_survives(name, sf_dir, ray_session):
    res = _run(name, sf_dir)
    t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
    assert t.num_rows > 0


def test_store_ops_on_null_keys(sf_dir, ray_session, tmp_path):
    """sort_store / zorder_store over columns CONTAINING nulls: the
    re-encode must keep every row (null keys included) byte-exact — a
    user clustering a real warehouse table sorts on nullable columns."""
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset, sort_store, zorder_store

    src = os.path.join(sf_dir, "orders.parquet")
    base = str(tmp_path / "base")
    encode_dataset([src], base)
    want = pq.read_table(src).sort_by("o_orderkey")

    for op, out in ((sort_store, str(tmp_path / "sorted")),
                    (zorder_store, str(tmp_path / "zordered"))):
        op(base, out, ["o_custkey", "o_totalprice"] if op is zorder_store
           else ["o_custkey"])
        got = pa.concat_tables(
            list(decode_dataset(out).iter_batches(batch_format="pyarrow", batch_size=None))
        ).sort_by("o_orderkey")
        assert got.num_rows == want.num_rows
        for col in ("o_orderkey", "o_custkey", "o_totalprice"):
            assert got.column(col).combine_chunks().equals(
                want.column(col).combine_chunks().cast(got.column(col).type)
            ), col
