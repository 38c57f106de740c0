"""Oracle parity for the round-2 query additions (windowed aggregate,
distributed top-k, distinct count, token histogram, embedding near-dup
pairs, stride point-lookup) — the driver's rows+schema+value-hash check
replicated against DuckDB at sf0.001."""

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

NEW_QUERIES = [
    "roundtrip_v011",
    "volume_shipping",
    "custdist",
    "top_supplier",
    "market_share",
    "profit_by_nation",
    "supplier_cnt",
    "small_qty_revenue",
    "excess_suppliers",
    "waiting_suppliers",
    "sales_opportunity",
    "dedup_canonical",
    "vocab_table",
    "mad_value",
    "full_join_daily",
    "ivm_revenue",
    "schema_union_read",
    "running_low_value",
    "running_high_order",
    "unpivot_part",
    "median_interarrival",
    "weighted_median",
    "sliding_distinct_users",
    "lexical_diversity",
    "source_collocations",
    "revenue_share",
    "prefix_clusters",
    "hourly_seasonality",
    "purged_documents",
    "encrypted_roundtrip",
    "rekeyed_roundtrip",
    "recovered_roundtrip",
    "point_lookup_events",
    "window_hourly_events",
    "top_revenue_orders",
    "distinct_users",
    "token_histogram",
    "dedup_embedding",
    "asof_join_events_orders",
    "range_join_events_orders",
    "session_windows",
    "lang_id",
    "quality_scores",
    "dedup_ngram",
    "global_quantiles",
    "salient_terms",
    "word_bigrams",
    "label_centroids",
    "top_segment_revenue",
    "source_vocab_overlap",
    "weekly_retention",
    "group_quantiles",
    "chunk_passages",
    "rollup_revenue",
    "nation_revenue",
    "promo_share",
    "bloom_join",
    "order_clusters",
    "heavy_users",
    "profile_lineitem",
    "weighted_sample",
    "pivot_weekday",
    "bm25_search",
    "embedding_moments",
    "funnel",
    "watermark_windows",
    "revenue_quartiles",
    "hybrid_retrieval",
    "upsert_read",
    "balanced_sample",
    "orc_file_roundtrip",
    "cube_revenue",
    "forecast_revenue",
    "large_orders",
    "anti_join_customers",
    "first_last_touch",
    "gopher_filter",
    "json_extract_stats",
    "value_histogram",
    "corr_moments",
    "acid_table_read",
    "returned_item_revenue",
    "value_rank_events",
    "normalize_text",
    "percentile_ranks",
    "order_priority_exists",
    "linestatus_priority_mix",
    "disjunctive_revenue",
    "customer_order_overlap",
    "argmax_events",
    "moving_avg_revenue",
    "gap_fill_revenue",
    "status_moments",
    "collect_langs",
    "prefix_scan_customers",
    "grouping_sets_revenue",
    "above_avg_orders",
    "having_customers",
    "fuzzy_part_match",
    "skyline_parts",
    "left_join_returns",
    "percentile_cont",
    "shuffled_documents",
    "distinct_users_by_type",
    "order_next_gap",
    "mode_priority",
    "same_day_order_pairs",
    "source_lang_entropy",
    "sampled_documents",
    "zorder_lookup",
    "encoded_groupby",
    "unigram_logprob",
    "revenue_trend_slope",
    "group_percentile_cont",
    "winsorized_stats",
    "pythagorean_means",
    "range_frame_revenue",
    "status_transitions",
    "union_tagged_values",
    "map_tagged_values",
    "struct_pruned_read",
    "time_weighted_value",
    "gini_user_activity",
    "csv_roundtrip",
    "tokenize_corpus",
    "bin_export",
    "mixture_schedule",
    "dup_source_matrix",
    "semdedup",
]


def test_asof_index_edges():
    import numpy as np

    from orc_ray.functions.joins import AsofIndex

    keys = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    times = np.array([10, 20, 20, 5, 30], dtype=np.int64)
    ix = AsofIndex(keys, times)
    idx, m = ix.asof(
        np.array([1, 1, 1, 2, 3, 1]), np.array([9, 10, 25, 100, 50, 10**9])
    )
    assert m.tolist() == [False, True, True, True, False, True]
    assert ix.times[idx[1]] == 10 and ix.times[idx[2]] == 20
    assert ix.times[idx[3]] == 30 and ix.times[idx[5]] == 20
    # range counts incl. tied times and out-of-window probes
    n = ix.range_count(
        np.array([1, 1, 2, 3]), np.array([10, 21, 0, 0]), np.array([20, 30, 4, 99])
    )
    assert n.tolist() == [3, 0, 0, 0]


def _norm(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()
    return len(df), tuple(df.columns), h


@pytest.fixture(scope="module")
def oracle():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in ["orders", "events", "documents", "embeddings", "lineitem", "customer", "supplier", "nation", "region", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_oracle(name, oracle, ray_session):
    if not os.path.isdir(SF):
        pytest.skip("testdata not present")
    from orc_ray.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    if not isinstance(res, (pa.Table, pd.DataFrame)):
        res = pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        )
    mine = res.to_pandas() if isinstance(res, pa.Table) else res
    exp = oracle.execute(ORACLE_SQL[name]).df()
    assert _norm(mine) == _norm(exp)
