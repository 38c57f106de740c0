"""Driver-contract query pipelines over /root/testdata tables.

Every pipeline routes the data THROUGH the engine: the input parquet table
is encoded into a chunk store (cached under /tmp, committed via the
manifest), then decoded back as a streaming ray.data.Dataset, and the
query operates on that decoded stream.  That makes the DuckDB oracle a
check of the whole engine (codecs, chunk format, pipelines), not just of
the query math — the analog of the reference's golden round-trip suites
(TestVectorOrcFile) wired into live SQL comparison.

No ray.init()/shutdown() here (driver owns the session).
"""

from ._shared import CACHE_ROOT, _decoded, _to_table, store_for  # noqa: F401
from .roundtrip import *  # noqa: F401,F403
from .tpch import *  # noqa: F401,F403
from .windows import *  # noqa: F401,F403
from .textq import *  # noqa: F401,F403
from .curation import *  # noqa: F401,F403
from .dedupq import *  # noqa: F401,F403
from .ann import *  # noqa: F401,F403
from .sketches import *  # noqa: F401,F403
from .media import *  # noqa: F401,F403
from .windows import _orders_build_side  # noqa: F401
from .textq import _lang_id_oracle_sql, _lang_pred_ctes, _quality_oracle_sql, _scrub_pii_oracle_sql  # noqa: F401
from .curation import _balanced_sample_oracle_sql, _curation_oracle_sql, _pack_oracle_ctes  # noqa: F401
from .ann import _bm25_index, ivf_store_for, lsh_store_for  # noqa: F401
from .media import media_store_for  # noqa: F401


QUERIES = {
    "roundtrip_documents": q_roundtrip_documents,
    "encrypted_roundtrip": q_encrypted_roundtrip,
    "rekeyed_roundtrip": q_rekeyed_roundtrip,
    "recovered_roundtrip": q_recovered_roundtrip,
    "roundtrip_lineitem": q_roundtrip_lineitem,
    "orc_file_roundtrip": q_orc_file_roundtrip,
    "csv_roundtrip": q_csv_roundtrip,
    "acid_table_read": q_acid_table_read,
    "ivm_revenue": q_ivm_revenue,
    "schema_union_read": q_schema_union_read,
    "roundtrip_events": q_roundtrip_events,
    "roundtrip_v011": q_roundtrip_v011,
    "purged_documents": q_purged_documents,
    "roundtrip_embeddings": q_roundtrip_embeddings,
    "projection_pushdown": q_projection_pushdown,
    "predicate_pushdown": q_predicate_pushdown,
    "agg_pricing_summary": q_agg_pricing_summary,
    "filter_groupby_events": q_filter_groupby_events,
    "join_orders_customer": q_join_orders_customer,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram": q_dedup_ngram,
    "dedup_canonical": q_dedup_canonical,
    "prefix_clusters": q_prefix_clusters,
    "text_stats": q_text_stats,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "dedup_minhash": q_dedup_minhash,
    "dup_windows": q_dup_windows,
    "dedup_substrings": q_dedup_substrings,
    "simhash": q_simhash,
    "ann_topk": q_ann_topk,
    "ann_topk_int8": q_ann_topk_int8,
    "ann_ivf": q_ann_ivf,
    "multimodal_features": q_multimodal_features,
    "point_lookup_events": q_point_lookup_events,
    "window_hourly_events": q_window_hourly_events,
    "top_revenue_orders": q_top_revenue_orders,
    "distinct_users": q_distinct_users,
    "token_histogram": q_token_histogram,
    "dedup_embedding": q_dedup_embedding,
    "asof_join_events_orders": q_asof_join_events_orders,
    "range_join_events_orders": q_range_join_events_orders,
    "session_windows": q_session_windows,
    "masked_export": q_masked_export,
    "pack_sequences": q_pack_sequences,
    "pack_windows": q_pack_windows,
    "source_cap": q_source_cap,
    "hash_split": q_hash_split,
    "sliding_window_events": q_sliding_window_events,
    "median_value": q_median_value,
    "approx_distinct_users": q_approx_distinct_users,
    "curation_pipeline": q_curation_pipeline,
    "ann_lsh": q_ann_lsh,
    "running_revenue": q_running_revenue,
    "order_gaps": q_order_gaps,
    "scrub_pii": q_scrub_pii,
    "media_pipeline": q_media_pipeline,
    "decontaminate": q_decontaminate,
    "repetition_stats": q_repetition_stats,
    "stratified_sample": q_stratified_sample,
    "join_lineitem_orders": q_join_lineitem_orders,
    "global_quantiles": q_global_quantiles,
    "salient_terms": q_salient_terms,
    "vocab_table": q_vocab_table,
    "lexical_diversity": q_lexical_diversity,
    "source_collocations": q_source_collocations,
    "word_bigrams": q_word_bigrams,
    "label_centroids": q_label_centroids,
    "top_segment_revenue": q_top_segment_revenue,
    "source_vocab_overlap": q_source_vocab_overlap,
    "weekly_retention": q_weekly_retention,
    "group_quantiles": q_group_quantiles,
    "chunk_passages": q_chunk_passages,
    "rollup_revenue": q_rollup_revenue,
    "cube_revenue": q_cube_revenue,
    "forecast_revenue": q_forecast_revenue,
    "large_orders": q_large_orders,
    "anti_join_customers": q_anti_join_customers,
    "first_last_touch": q_first_last_touch,
    "gopher_filter": q_gopher_filter,
    "returned_item_revenue": q_returned_item_revenue,
    "value_rank_events": q_value_rank_events,
    "running_low_value": q_running_low_value,
    "running_high_order": q_running_high_order,
    "median_interarrival": q_median_interarrival,
    "sliding_distinct_users": q_sliding_distinct_users,
    "hourly_seasonality": q_hourly_seasonality,
    "percentile_ranks": q_percentile_ranks,
    "normalize_text": q_normalize_text,
    "bin_export": q_bin_export,
    "mixture_schedule": q_mixture_schedule,
    "dup_source_matrix": q_dup_source_matrix,
    "semdedup": q_semdedup,
    "json_extract_stats": q_json_extract_stats,
    "value_histogram": q_value_histogram,
    "corr_moments": q_corr_moments,
    "nation_revenue": q_nation_revenue,
    "mad_value": q_mad_value,
    "full_join_daily": q_full_join_daily,
    "unpivot_part": q_unpivot_part,
    "weighted_median": q_weighted_median,
    "revenue_share": q_revenue_share,
    "volume_shipping": q_volume_shipping,
    "custdist": q_custdist,
    "top_supplier": q_top_supplier,
    "market_share": q_market_share,
    "profit_by_nation": q_profit_by_nation,
    "supplier_cnt": q_supplier_cnt,
    "small_qty_revenue": q_small_qty_revenue,
    "excess_suppliers": q_excess_suppliers,
    "waiting_suppliers": q_waiting_suppliers,
    "sales_opportunity": q_sales_opportunity,
    "promo_share": q_promo_share,
    "bloom_join": q_bloom_join,
    "order_clusters": q_order_clusters,
    "heavy_users": q_heavy_users,
    "profile_lineitem": q_profile_lineitem,
    "approx_quantiles": q_approx_quantiles,
    "weighted_sample": q_weighted_sample,
    "pivot_weekday": q_pivot_weekday,
    "bm25_search": q_bm25_search,
    "embedding_moments": q_embedding_moments,
    "kmeans_embeddings": q_kmeans_embeddings,
    "kmeans_step": q_kmeans_step,
    "funnel": q_funnel,
    "watermark_windows": q_watermark_windows,
    "revenue_quartiles": q_revenue_quartiles,
    "hybrid_retrieval": q_hybrid_retrieval,
    "upsert_read": q_upsert_read,
    "balanced_sample": q_balanced_sample,
    "order_priority_exists": q_order_priority_exists,
    "linestatus_priority_mix": q_linestatus_priority_mix,
    "disjunctive_revenue": q_disjunctive_revenue,
    "customer_order_overlap": q_customer_order_overlap,
    "argmax_events": q_argmax_events,
    "moving_avg_revenue": q_moving_avg_revenue,
    "gap_fill_revenue": q_gap_fill_revenue,
    "status_moments": q_status_moments,
    "collect_langs": q_collect_langs,
    "prefix_scan_customers": q_prefix_scan_customers,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "above_avg_orders": q_above_avg_orders,
    "having_customers": q_having_customers,
    "fuzzy_part_match": q_fuzzy_part_match,
    "skyline_parts": q_skyline_parts,
    "left_join_returns": q_left_join_returns,
    "percentile_cont": q_percentile_cont,
    "shuffled_documents": q_shuffled_documents,
    "distinct_users_by_type": q_distinct_users_by_type,
    "order_next_gap": q_order_next_gap,
    "mode_priority": q_mode_priority,
    "same_day_order_pairs": q_same_day_order_pairs,
    "pagerank": q_pagerank,
    "source_lang_entropy": q_source_lang_entropy,
    "sampled_documents": q_sampled_documents,
    "zorder_lookup": q_zorder_lookup,
    "encoded_groupby": q_encoded_groupby,
    "unigram_logprob": q_unigram_logprob,
    "nb_lang_confusion": q_nb_lang_confusion,
    "bpe_tokenize": q_bpe_tokenize,
    "dsir_weights": q_dsir_weights,
    "perplexity_buckets": q_perplexity_buckets,
    "bigram_logprob": q_bigram_logprob,
    "oov_rate": q_oov_rate,
    "tokenize_corpus": q_tokenize_corpus,
    "revenue_trend_slope": q_revenue_trend_slope,
    "group_percentile_cont": q_group_percentile_cont,
    "winsorized_stats": q_winsorized_stats,
    "pythagorean_means": q_pythagorean_means,
    "range_frame_revenue": q_range_frame_revenue,
    "status_transitions": q_status_transitions,
    "union_tagged_values": q_union_tagged_values,
    "map_tagged_values": q_map_tagged_values,
    "struct_pruned_read": q_struct_pruned_read,
    "time_weighted_value": q_time_weighted_value,
    "gini_user_activity": q_gini_user_activity,
}


from . import ann as _ann_mod  # noqa: E402
from . import curation as _curation_mod  # noqa: E402
from . import dedupq as _dedupq_mod  # noqa: E402
from . import roundtrip as _roundtrip_mod  # noqa: E402
from . import sketches as _sketches_mod  # noqa: E402
from . import textq as _textq_mod  # noqa: E402
from . import tpch as _tpch_mod  # noqa: E402
from . import windows as _windows_mod  # noqa: E402

# Per-domain oracle SQL lives beside the pipelines it mirrors (each
# module's ORACLE_SQL dict); the driver contract sees one merged dict.
# dedup_minhash / simhash / ann_ivf / ann_lsh / multimodal_features /
# media_pipeline / approx_distinct / kmeans / heavy hitters: heuristic
# or approximate ops with no SQL equivalent carry in-query self-asserts
# instead; the driver records the weaker rows-only check for them.
ORACLE_SQL = {
    **_roundtrip_mod.ORACLE_SQL,
    **_tpch_mod.ORACLE_SQL,
    **_windows_mod.ORACLE_SQL,
    **_textq_mod.ORACLE_SQL,
    **_curation_mod.ORACLE_SQL,
    **_dedupq_mod.ORACLE_SQL,
    **_ann_mod.ORACLE_SQL,
    **_sketches_mod.ORACLE_SQL,
}
