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
    "roundtrip_lineitem": q_roundtrip_lineitem,
    "orc_file_roundtrip": q_orc_file_roundtrip,
    "acid_table_read": q_acid_table_read,
    "roundtrip_events": q_roundtrip_events,
    "roundtrip_embeddings": q_roundtrip_embeddings,
    "projection_pushdown": q_projection_pushdown,
    "predicate_pushdown": q_predicate_pushdown,
    "agg_pricing_summary": q_agg_pricing_summary,
    "filter_groupby_events": q_filter_groupby_events,
    "join_orders_customer": q_join_orders_customer,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram": q_dedup_ngram,
    "text_stats": q_text_stats,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "dedup_minhash": q_dedup_minhash,
    "simhash": q_simhash,
    "ann_topk": q_ann_topk,
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
    "percentile_ranks": q_percentile_ranks,
    "normalize_text": q_normalize_text,
    "json_extract_stats": q_json_extract_stats,
    "value_histogram": q_value_histogram,
    "corr_moments": q_corr_moments,
    "nation_revenue": q_nation_revenue,
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
    "source_lang_entropy": q_source_lang_entropy,
    "sampled_documents": q_sampled_documents,
    "zorder_lookup": q_zorder_lookup,
    "encoded_groupby": q_encoded_groupby,
    "unigram_logprob": q_unigram_logprob,
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


ORACLE_SQL = {
    "roundtrip_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    # keyed read is exact -> plaintext aggregates; keyless read is all-null
    # masked -> public_text_vals is identically 0 by the encryption contract
    "encrypted_roundtrip": (
        "SELECT source, CAST(SUM(LENGTH(text)) AS BIGINT) AS len_sum, "
        "COUNT(*) AS n, CAST(0 AS BIGINT) AS public_text_vals "
        "FROM documents GROUP BY source ORDER BY source"
    ),
    "roundtrip_lineitem": "SELECT * FROM lineitem",
    # full fidelity through REAL .orc files (engine sink -> C++ ORC -> engine source)
    "orc_file_roundtrip": "SELECT * FROM lineitem",
    # versioned-table merge-on-read: SQL replays the same commit sequence
    # (seq-ordered ROW_NUMBER = last writer wins; op 'd' rows delete)
    "acid_table_read": """
        WITH all_rows AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
                   0 AS seq, 'u' AS op FROM orders
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 1000, '0-UPDATED', 1, 'u'
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 2000, '0-UPDATED', 2, 'u'
            FROM orders
            WHERE o_orderkey % 97 = 0 AND o_orderkey % 2 = 1 AND o_orderkey % 193 <> 0
            UNION ALL
            SELECT o_orderkey, NULL, NULL, NULL, 2, 'd'
            FROM orders WHERE o_orderkey % 193 = 0
        ),
        latest AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
            FROM all_rows
        )
        SELECT o_orderstatus,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_e2,
               CAST(SUM(CASE WHEN o_orderpriority = '0-UPDATED' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
               COUNT(*) AS n
        FROM latest WHERE rn = 1 AND op = 'u'
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "roundtrip_events": "SELECT * FROM events",
    "roundtrip_embeddings": "SELECT * FROM embeddings",
    "projection_pushdown": "SELECT l_orderkey, l_quantity FROM lineitem",
    "predicate_pushdown": "SELECT * FROM lineitem WHERE l_orderkey < 100",
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
               CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_cents,
               CAST(ROUND(SUM(l_discount) / COUNT(*) * 1000000) AS BIGINT) AS avg_disc_e6,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "filter_groupby_events": """
        SELECT event_type,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS total_value_cents,
               COUNT(value) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "join_orders_customer": """
        SELECT c.c_mktsegment,
               CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "dedup_exact": """
        SELECT text, MIN(doc_id) AS doc_id FROM documents
        GROUP BY text ORDER BY doc_id
    """,
    "text_stats": """
        SELECT doc_id, LENGTH(text) AS n_chars_calc,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
        FROM documents
    """,
    "token_counts": """
        SELECT doc_id,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE array_length(string_split_regex(TRIM(text), '\\s+')) END AS n_ws_tokens
        FROM documents
    """,
    "ann_topk": """
        SELECT e.vec_id,
               CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))
                    * 10000) AS BIGINT) AS sim_e4
        FROM embeddings e
        ORDER BY sim_e4 DESC, e.vec_id LIMIT 10
    """,
    "point_lookup_events": "SELECT * FROM events WHERE event_id = 777",
    "window_hourly_events": """
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS total_value_cents,
               COUNT(value) AS n_events
        FROM events GROUP BY event_type, hour_epoch
        ORDER BY event_type, hour_epoch
    """,
    "top_revenue_orders": """
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "distinct_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "token_histogram": r"""
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ) GROUP BY token ORDER BY cnt DESC, token LIMIT 50
    """,
    "dedup_embedding": """
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS sim_e6
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) > 0.4
        ORDER BY vec_id_a, vec_id_b
    """,
    "asof_join_events_orders": """
        SELECT e.event_id,
               CAST(epoch(o.o_orderdate) AS BIGINT) AS asof_order_epoch
        FROM events e ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        ORDER BY e.event_id
    """,
    "range_join_events_orders": """
        SELECT e.event_id, COUNT(o.o_orderdate) AS n_orders_7d
        FROM events e LEFT JOIN orders o
          ON e.user_id = o.o_custkey
         AND o.o_orderdate BETWEEN e.ts - INTERVAL 7 DAY AND e.ts
        GROUP BY e.event_id ORDER BY e.event_id
    """,
    "session_windows": """
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
                        THEN 1 ELSE 0 END AS brk
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "dedup_ngram": """
        WITH sh AS (
            -- char substrings == byte windows on this ASCII corpus
            SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 8) AS s
            FROM (
                SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS u
                FROM documents WHERE length(text) >= 8
            )
        ),
        keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 16),
        shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
        p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.doc_a, p.doc_b, p.inter, (sa.n + sb.n - p.inter) AS un
        FROM p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        WHERE 2 * p.inter >= (sa.n + sb.n - p.inter)
        ORDER BY p.doc_a, p.doc_b
    """,
    "fingerprints": """
        SELECT doc_id, md5(text) AS fp_md5 FROM documents ORDER BY doc_id
    """,
    "masked_export": """
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[a-z]', 'x', 'g'), '[A-Z]', 'X', 'g'), '[0-9]', '9', 'g')
                   AS text,
               CAST(NULL AS VARCHAR) AS lang,
               sha256(source) AS source
        FROM documents ORDER BY doc_id
    """,
    "pack_sequences": "WITH " + _pack_oracle_ctes("documents"),
    "source_cap": """
        SELECT source, doc_id, n_chars, rnk FROM (
            SELECT source, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rnk
            FROM documents
        ) WHERE rnk <= 20 ORDER BY source, rnk
    """,
    "hash_split": """
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        ORDER BY doc_id
    """,
    "sliding_window_events": """
        SELECT e.event_type,
               (epoch(date_trunc('hour', e.ts))::BIGINT - k.off * 3600)
                   AS win_start_epoch,
               CAST(ROUND(SUM(e.value) * 100) AS BIGINT) AS total_value_cents,
               COUNT(e.value) AS n_events
        FROM events e CROSS JOIN (VALUES (0), (1), (2)) AS k(off)
        GROUP BY e.event_type, win_start_epoch
        ORDER BY e.event_type, win_start_epoch
    """,
    "median_value": """
        SELECT event_type,
               CAST(ROUND(quantile_disc(value, 0.5) * 100) AS BIGINT)
                   AS median_cents
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "running_revenue": """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        FROM orders ORDER BY o_orderkey
    """,
    "order_gaps": """
        SELECT o_orderkey,
               (epoch_us(o_orderdate) - LAG(epoch_us(o_orderdate)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
                   // 86400000000 AS gap_days
        FROM orders ORDER BY o_orderkey
    """,
    "decontaminate": r"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                   FROM documents WHERE trim(text) <> ''),
        g AS (SELECT doc_id,
                     array_to_string(ws[CAST(u AS INTEGER):CAST(u AS INTEGER)+3], ' ') AS gram
              FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 2)) AS u
                    FROM w WHERE len(ws) >= 4)),
        bench AS (SELECT DISTINCT gram FROM g
                  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
        contaminated AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram))
        SELECT d.doc_id FROM documents d
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <> '0'
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY d.doc_id
    """,
    "repetition_stats": r"""
        WITH w AS (SELECT doc_id,
                          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), '\s+') END AS ws
                   FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
        wc AS (SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY doc_id, word),
        top AS (SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS nw FROM wc GROUP BY doc_id),
        g AS (SELECT doc_id,
                     ws[CAST(u AS INTEGER)] || ' ' || ws[CAST(u AS INTEGER) + 1] AS gram
              FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS u
                    FROM w WHERE len(ws) >= 2)),
        gc AS (SELECT doc_id, COUNT(*) AS n_g, COUNT(DISTINCT gram) AS n_d
               FROM g GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(top.nw, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(top.top_cnt, 0) * 1000000
                    // GREATEST(COALESCE(top.nw, 0), 1) AS BIGINT)
                   AS top_word_frac_e6,
               CAST(COALESCE(gc.n_g - gc.n_d, 0) * 1000000
                    // GREATEST(COALESCE(gc.n_g, 0), 1) AS BIGINT)
                   AS dup_2gram_frac_e6
        FROM documents d LEFT JOIN top USING (doc_id) LEFT JOIN gc USING (doc_id)
        ORDER BY d.doc_id
    """,
    "stratified_sample": r"""
        SELECT doc_id, source FROM documents
        WHERE CASE CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) % 4
              WHEN 0 THEN TRUE
              WHEN 1 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('0','1','2','3','4','5','6','7')
              WHEN 2 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('0','1','2','3')
              ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') END
        ORDER BY doc_id
    """,
    "join_lineitem_orders": """
        WITH l AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_e4
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_orderpriority, CAST(SUM(rev_e4) AS BIGINT) AS rev_e4,
               COUNT(*) AS n_orders
        FROM l JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "global_quantiles": """
        WITH v AS (SELECT CAST(ROUND(value * 1000000) AS BIGINT) v FROM events)
        SELECT 'p50' AS q, quantile_disc(v, 0.5) AS val_e6 FROM v
        UNION ALL SELECT 'p90', quantile_disc(v, 0.9) FROM v
        UNION ALL SELECT 'p99', quantile_disc(v, 0.99) FROM v
        ORDER BY q
    """,
    "salient_terms": """
        WITH words AS (
            SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ), df AS (
            SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w
        ), tot AS (SELECT COUNT(*) n FROM documents),
        tf AS (
            SELECT source, w, COUNT(*) AS tf FROM words GROUP BY source, w
        ), kept AS (
            SELECT tf.* FROM tf JOIN df USING (w), tot
            WHERE df.df * 100 <= tot.n * 79
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY tf DESC, w) AS rnk
            FROM kept
        )
        SELECT source, w, tf, rnk FROM ranked WHERE rnk <= 10
        ORDER BY source, rnk
    """,
    "word_bigrams": """
        WITH s AS (SELECT string_split(text, ' ') AS ws FROM documents),
        p AS (SELECT ws, UNNEST(generate_series(1, len(ws) - 1)) AS i FROM s)
        SELECT ws[i] AS w1, ws[i + 1] AS w2, COUNT(*) AS cnt
        FROM p GROUP BY 1, 2
        ORDER BY cnt DESC, w1, w2 LIMIT 50
    """,
    "label_centroids": """
        SELECT label, CAST(dim AS INTEGER) AS dim,
               CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
                    AS BIGINT) AS sum_e6,
               COUNT(*) AS n
        FROM (SELECT label, UNNEST(embedding) AS e,
                     UNNEST(range(len(embedding))) AS dim FROM embeddings)
        GROUP BY label, dim ORDER BY label, dim
    """,
    "top_segment_revenue": """
        WITH rev AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_e4
            FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey
        )
        SELECT o_orderkey, CAST(rev.rev_e4 AS BIGINT) AS rev_e4,
               o_orderdate, o_orderpriority
        FROM rev
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        ORDER BY rev_e4 DESC, o_orderdate, o_orderkey LIMIT 10
    """,
    "source_vocab_overlap": """
        WITH sw AS (
            SELECT DISTINCT source, w FROM (
                SELECT source, UNNEST(string_split(text, ' ')) AS w
                FROM documents)
        ),
        sz AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY source),
        ix AS (
            SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
            FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, inter, sa.n + sb.n - inter AS uni
        FROM ix
        JOIN sz sa ON sa.source = src_a
        JOIN sz sb ON sb.source = src_b
        ORDER BY src_a, src_b
    """,
    "promo_share": """
        SELECT (CAST(YEAR(l_shipdate) AS BIGINT) * 12
                + CAST(MONTH(l_shipdate) AS BIGINT) - 1) AS month_id,
               CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS BIGINT) AS promo_rev_e4,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS total_rev_e4
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY month_id ORDER BY month_id
    """,
    "nation_revenue": """
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY rev_e4 DESC, n_name
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "cube_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_e4
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "forecast_revenue": """
        SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)), 0) AS BIGINT) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24
    """,
    "large_orders": """
        WITH big AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 150
        )
        SELECT c_name, o_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_e2,
               CAST(sum_qty AS BIGINT) AS sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY price_e2 DESC, o_orderkey
        LIMIT 100
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_name,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_e2
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        ORDER BY c_custkey
    """,
    "first_last_touch": """
        SELECT DISTINCT user_id,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_type,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id
    """,
    "percentile_ranks": """
        SELECT event_id,
               CAST(FLOOR(PERCENT_RANK() OVER w * 1000000.0) AS BIGINT) AS percent_rank_e6,
               CAST(FLOOR(CUME_DIST() OVER w * 1000000.0) AS BIGINT) AS cume_dist_e6
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY CAST(FLOOR(value / 10.0) AS BIGINT))
        ORDER BY event_id
    """,
    "normalize_text": r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
        FROM documents ORDER BY doc_id
    """,
    "value_rank_events": """
        SELECT event_id,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS rnk_dense
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY CAST(FLOOR(value / 10.0) AS BIGINT))
        ORDER BY event_id
    """,
    "returned_item_revenue": """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_e2,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
        ORDER BY rev_e4 DESC, c.c_custkey
        LIMIT 20
    """,
    "json_extract_stats": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "value_histogram": """
        SELECT LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 19) AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY bucket ORDER BY bucket
    """,
    "corr_moments": """
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                    * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS syy
        FROM lineitem
    """,
    "gopher_filter": r"""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\s+')) END AS n_words,
                   LENGTH(regexp_replace(text, '\s', '', 'g')) AS nonws,
                   (LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
                     + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS n_sym
            FROM documents
        ),
        words AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS stop_hits FROM words
            WHERE w IN ('the','be','to','of','and','that','have','with','a','in')
            GROUP BY doc_id
        ),
        met AS (
            SELECT b.doc_id, b.n_words,
                   CAST(FLOOR((b.nonws / GREATEST(b.n_words, 1)) * 1000000.0) AS BIGINT) AS mwl_e6,
                   b.n_sym, COALESCE(h.stop_hits, 0) AS stop_hits
            FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mwl_e6,
               CAST(n_sym AS BIGINT) AS n_sym, CAST(stop_hits AS BIGINT) AS stop_hits
        FROM met
        WHERE n_words BETWEEN 30 AND 80
          AND mwl_e6 BETWEEN 4000000 AND 5000000
          AND CAST(n_sym AS DOUBLE) <= 0.05 * n_words
          AND stop_hits >= 2
        ORDER BY doc_id
    """,
    "chunk_passages": """
        WITH n AS (
            SELECT doc_id, text,
                   CAST(CEIL(GREATEST(length(text) - 200, 0) / 150.0)
                        AS BIGINT) + 1 AS n_chunks
            FROM documents
        )
        SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
               substr(text, CAST(k * 150 + 1 AS INTEGER), 200) AS chunk
        FROM (SELECT doc_id, text, UNNEST(range(n_chunks)) AS k FROM n)
        ORDER BY doc_id, chunk_id
    """,
    "group_quantiles": """
        WITH qv AS (
            SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS v
            FROM events
        )
        SELECT event_type, 'p50' AS q, quantile_disc(v, 0.5) AS val_e6
        FROM qv GROUP BY event_type
        UNION ALL
        SELECT event_type, 'p90' AS q, quantile_disc(v, 0.9) AS val_e6
        FROM qv GROUP BY event_type
        UNION ALL
        SELECT event_type, 'p99' AS q, quantile_disc(v, 0.99) AS val_e6
        FROM qv GROUP BY event_type
        ORDER BY event_type, q
    """,
    "weekly_retention": """
        WITH uw AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
            FROM events
        ),
        act AS (SELECT wk, COUNT(*) AS active FROM uw GROUP BY wk),
        ret AS (
            SELECT a.wk, COUNT(*) AS retained
            FROM uw a JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 1
            GROUP BY a.wk
        )
        SELECT act.wk, act.active, COALESCE(ret.retained, 0) AS retained
        FROM act LEFT JOIN ret ON act.wk = ret.wk
        ORDER BY act.wk
    """,
    "bloom_join": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 475000
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "order_clusters": """
        SELECT o_orderkey,
               MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS cluster_rep
        FROM orders ORDER BY o_orderkey
    """,
    "heavy_users": """
        SELECT user_id, COUNT(*) AS cnt FROM events
        GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20
    """,
    "profile_lineitem": """
        SELECT * FROM (SELECT 'l_orderkey' AS col, COUNT(l_orderkey) AS n, COUNT(*)-COUNT(l_orderkey) AS nulls,
            CAST(ROUND(MIN(l_orderkey)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_orderkey)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_orderkey*100) AS BIGINT)) * 10000.0 / COUNT(l_orderkey)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_partkey' AS col, COUNT(l_partkey) AS n, COUNT(*)-COUNT(l_partkey) AS nulls,
            CAST(ROUND(MIN(l_partkey)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_partkey)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_partkey*100) AS BIGINT)) * 10000.0 / COUNT(l_partkey)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_suppkey' AS col, COUNT(l_suppkey) AS n, COUNT(*)-COUNT(l_suppkey) AS nulls,
            CAST(ROUND(MIN(l_suppkey)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_suppkey)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_suppkey*100) AS BIGINT)) * 10000.0 / COUNT(l_suppkey)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_quantity' AS col, COUNT(l_quantity) AS n, COUNT(*)-COUNT(l_quantity) AS nulls,
            CAST(ROUND(MIN(l_quantity)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_quantity)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) * 10000.0 / COUNT(l_quantity)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col, COUNT(l_extendedprice) AS n, COUNT(*)-COUNT(l_extendedprice) AS nulls,
            CAST(ROUND(MIN(l_extendedprice)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_extendedprice)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) * 10000.0 / COUNT(l_extendedprice)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_discount' AS col, COUNT(l_discount) AS n, COUNT(*)-COUNT(l_discount) AS nulls,
            CAST(ROUND(MIN(l_discount)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_discount)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) * 10000.0 / COUNT(l_discount)) AS BIGINT) AS mean_e6
            FROM lineitem UNION ALL SELECT 'l_tax' AS col, COUNT(l_tax) AS n, COUNT(*)-COUNT(l_tax) AS nulls,
            CAST(ROUND(MIN(l_tax)*1000000) AS BIGINT) AS min_e6,
            CAST(ROUND(MAX(l_tax)*1000000) AS BIGINT) AS max_e6,
            CAST(ROUND(SUM(CAST(ROUND(l_tax*100) AS BIGINT)) * 10000.0 / COUNT(l_tax)) AS BIGINT) AS mean_e6
            FROM lineitem) ORDER BY col
    """,
    "weighted_sample": """
        SELECT doc_id,
               CAST(FLOOR(LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                             / 1152921504606846977.0)
                          / n_chars * 1000000000) AS BIGINT) AS pri_e9
        FROM documents
        ORDER BY pri_e9 DESC, doc_id LIMIT 100
    """,
    "pivot_weekday": """
        SELECT CAST(dayofweek(ts) AS BIGINT) AS weekday,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY weekday ORDER BY weekday
    """,
    "bm25_search": r"""
        WITH dl AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE array_length(string_split_regex(trim(text), '\s+')) END AS dl
          FROM documents
        ),
        st AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(text) <> ''
          ) WHERE tok IN ('window', 'merge', 'scan') GROUP BY doc_id, tok
        ),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        sc AS (
          SELECT tf.doc_id,
                 SUM( LN(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) ) AS s
          FROM tf CROSS JOIN st
               JOIN df ON tf.tok = df.tok
               JOIN dl ON tf.doc_id = dl.doc_id
          GROUP BY tf.doc_id
        )
        SELECT doc_id, CAST(FLOOR(s * 1000000 + 0.5) AS BIGINT) AS score_e6
        FROM sc ORDER BY score_e6 DESC, doc_id LIMIT 10
    """,
    "embedding_moments": """
        SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS sum_q,
               CAST(SUM(q * q) AS BIGINT) AS sumsq_q
        FROM (SELECT CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS q, dim
              FROM (SELECT UNNEST(embedding) AS e,
                           UNNEST(range(len(embedding))) AS dim FROM embeddings))
        GROUP BY dim ORDER BY dim
    """,
    "kmeans_step": """
        WITH q AS (
            SELECT vec_id, CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS qv, dim
            FROM (SELECT vec_id, UNNEST(embedding) AS e,
                         UNNEST(range(len(embedding))) AS dim FROM embeddings)
        ),
        seed_ids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
        seeds AS (SELECT q.* FROM q JOIN seed_ids USING (vec_id)),
        d AS (
            SELECT q.vec_id, s.vec_id AS cid,
                   SUM((q.qv - s.qv) * (q.qv - s.qv)) AS d2
            FROM q JOIN seeds s ON q.dim = s.dim
            GROUP BY q.vec_id, s.vec_id
        ),
        a AS (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM d
        ),
        rs AS (SELECT vec_id, CAST(SUM(qv) AS BIGINT) AS qsum FROM q GROUP BY vec_id)
        SELECT a.cid AS cluster, COUNT(*) AS n_members,
               CAST(SUM(rs.qsum) AS BIGINT) AS coord_sum
        FROM a JOIN rs USING (vec_id)
        WHERE rn = 1
        GROUP BY a.cid ORDER BY a.cid
    """,
    "funnel": """
        WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
                    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
                    AND e.ts <= s2.t2 + INTERVAL 24 HOUR
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
               (SELECT COUNT(*) FROM s2) AS n_click_after,
               (SELECT COUNT(*) FROM s3) AS n_purchase_after
    """,
    "watermark_windows": """
        WITH w AS (
          SELECT ts,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
                 MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id
                           ORDER BY md5(CAST(event_id AS VARCHAR))
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_s
          FROM events
        )
        SELECT (ts_s // 3600) * 3600 AS hour_epoch,
               CAST(SUM(CASE WHEN prev_s IS NULL OR ts_s >= prev_s - 600
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
               CAST(SUM(CASE WHEN prev_s IS NOT NULL AND ts_s < prev_s - 600
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM w GROUP BY hour_epoch ORDER BY hour_epoch
    """,
    "revenue_quartiles": """
        SELECT bucket, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM (SELECT CAST(NTILE(4) OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                         o_orderkey) AS BIGINT) AS bucket,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders)
        GROUP BY bucket ORDER BY bucket
    """,
    "hybrid_retrieval": r"""
        WITH dl AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE array_length(string_split_regex(trim(text), '\s+')) END AS dl
          FROM documents
        ),
        st AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(text) <> ''
          ) WHERE tok IN ('window', 'merge', 'scan') GROUP BY doc_id, tok
        ),
        dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        sc AS (
          SELECT tf.doc_id,
                 SUM( LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) ) AS s
          FROM tf CROSS JOIN st
               JOIN dfq ON tf.tok = dfq.tok
               JOIN dl ON tf.doc_id = dl.doc_id
          GROUP BY tf.doc_id
        ),
        bm AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS r
          FROM (SELECT doc_id, CAST(FLOOR(s * 1000000 + 0.5) AS BIGINT) AS score_e6
                FROM sc ORDER BY score_e6 DESC, doc_id LIMIT 50)
        ),
        ann AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim_e4 DESC, doc_id) AS r
          FROM (SELECT e.vec_id AS doc_id,
                       CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))
                            * 10000) AS BIGINT) AS sim_e4
                FROM embeddings e
                ORDER BY sim_e4 DESC, doc_id LIMIT 50)
        ),
        fused AS (
          SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
                 COALESCE(1.0 / (60 + bm.r), 0) + COALESCE(1.0 / (60 + ann.r), 0) AS s
          FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id
        )
        SELECT doc_id, CAST(FLOOR(s * 1000000000) AS BIGINT) AS rrf_e9
        FROM fused ORDER BY rrf_e9 DESC, doc_id LIMIT 10
    """,
    "upsert_read": """
        WITH delta AS (
          SELECT doc_id, UPPER(text) AS text, n_chars
          FROM documents WHERE doc_id % 17 = 0
        )
        SELECT doc_id, text, n_chars FROM delta
        UNION ALL
        SELECT doc_id, text, n_chars FROM documents
        WHERE doc_id % 17 <> 0
        ORDER BY doc_id
    """,
    "order_priority_exists": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "linestatus_priority_mix": """
        WITH j AS (
          SELECT l.l_linestatus, o.o_orderpriority
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        ), u AS (
          SELECT l_linestatus, 'high_line_count' AS kind,
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS one
          FROM j
          UNION ALL
          SELECT l_linestatus, 'low_line_count',
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END
          FROM j
        )
        SELECT l_linestatus, kind, CAST(SUM(one) AS BIGINT) AS n
        FROM u GROUP BY l_linestatus, kind ORDER BY l_linestatus, kind
    """,
    "disjunctive_revenue": """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 50)
    """,
    "customer_order_overlap": """
        WITH per AS (
          SELECT o_custkey,
                 SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
                 SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f
          FROM orders GROUP BY o_custkey
        )
        SELECT CASE WHEN n_o > 0 AND n_f > 0 THEN 'both'
                    WHEN n_o > 0 THEN 'only_open'
                    WHEN n_f > 0 THEN 'only_filled'
                    ELSE 'pending_only' END AS cls,
               COUNT(*) AS n_customers
        FROM per GROUP BY cls ORDER BY cls
    """,
    "argmax_events": """
        WITH m AS (SELECT event_type, MAX(value) AS mv FROM events GROUP BY event_type)
        SELECT e.event_type,
               CAST(ROUND(m.mv * 1000000) AS BIGINT) AS max_value_e6,
               MIN(e.event_id) AS argmax_event_id
        FROM events e JOIN m ON e.event_type = m.event_type AND e.value = m.mv
        GROUP BY e.event_type, m.mv ORDER BY e.event_type
    """,
    "moving_avg_revenue": """
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        )
        SELECT day,
               CAST(SUM(cents) OVER w AS BIGINT) AS win_sum_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS win_days
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "gap_fill_revenue": """
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        ),
        cal AS (
          SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily),
                                        (SELECT MAX(day) FROM daily))) AS day
        )
        SELECT c.day,
               CAST(COALESCE(d.cents,
                    LAST_VALUE(d.cents IGNORE NULLS) OVER
                      (ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    AS BIGINT) AS rev_cents,
               d.cents IS NULL AS is_filled
        FROM cal c LEFT JOIN daily d ON c.day = d.day
        ORDER BY c.day
    """,
    "status_moments": """
        WITH p AS (
          SELECT o_orderstatus AS s, COUNT(*) AS n,
                 SUM(x) AS s1, SUM(x*x) AS s2, SUM(x*x*x) AS s3, SUM(x*x*x*x) AS s4
          FROM (SELECT o_orderstatus, CAST(ROUND(o_totalprice / 1000) AS BIGINT) AS x
                FROM orders)
          GROUP BY o_orderstatus
        )
        SELECT s AS o_orderstatus, CAST(n AS BIGINT) AS n,
               CAST(ROUND((s3/n - 3*(s1/n)*s2/n + 2*(s1/n)^3)
                    / ((s2/n - (s1/n)*(s1/n))^1.5) * 1000000) AS BIGINT) AS skew_e6,
               CAST(ROUND(((s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n - 3*(s1/n)^4)
                    / ((s2/n - (s1/n)*(s1/n))^2) - 3) * 1000000) AS BIGINT) AS kurt_e6
        FROM p ORDER BY s
    """,
    "collect_langs": """
        SELECT source,
               STRING_AGG(DISTINCT lang, ',' ORDER BY lang) AS langs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents GROUP BY source ORDER BY source
    """,
    "prefix_scan_customers": """
        SELECT c_custkey, c_name,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_e2
        FROM customer WHERE c_name LIKE 'Customer#00000000%'
        ORDER BY c_custkey
    """,
    "grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS rev_e4
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag, l_linestatus
    """,
    "above_avg_orders": """
        WITH m AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_c,
                 COUNT(*) AS n_c
          FROM orders GROUP BY o_custkey
        )
        SELECT o.o_orderkey, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_e2
        FROM orders o JOIN m ON o.o_custkey = m.o_custkey
        WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * m.n_c > m.sum_c
        ORDER BY o.o_orderkey
    """,
    "having_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 13
        )
        ORDER BY c_custkey
    """,
    "fuzzy_part_match": """
        WITH q(query) AS (VALUES ('red widgt'), ('blu bolt'), ('smal gear'), ('hoot gizmo')),
        d AS (
          SELECT q.query, p.p_name, levenshtein(q.query, p.p_name) AS dist
          FROM q CROSS JOIN part p
        ),
        r AS (
          SELECT query, p_name, CAST(dist AS BIGINT) AS dist,
                 ROW_NUMBER() OVER (PARTITION BY query ORDER BY dist, p_name) AS rn
          FROM d
        )
        SELECT query, p_name, dist FROM r WHERE rn = 1 ORDER BY query
    """,
    "skyline_parts": """
        WITH pts AS (
          SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                 CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_e2
          FROM part
        )
        SELECT p.p_partkey, p.p_size, p.price_e2
        FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts q
          WHERE q.p_size <= p.p_size AND q.price_e2 <= p.price_e2
            AND (q.p_size < p.p_size OR q.price_e2 < p.price_e2)
        )
        ORDER BY p.p_partkey
    """,
    "left_join_returns": """
        WITH c AS (
          SELECT l_orderkey, COUNT(*) AS n_returned
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, CAST(COALESCE(c.n_returned, 0) AS BIGINT) AS n_returned
        FROM orders o LEFT JOIN c ON o.o_orderkey = c.l_orderkey
        ORDER BY o.o_orderkey
    """,
    "percentile_cont": """
        WITH v AS (
          SELECT CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DOUBLE) AS ve
          FROM lineitem
        )
        SELECT 25 AS q_pct, CAST(FLOOR(quantile_cont(ve, 0.25)) AS BIGINT) AS val_e2_floor FROM v
        UNION ALL SELECT 50, CAST(FLOOR(quantile_cont(ve, 0.5)) AS BIGINT) FROM v
        UNION ALL SELECT 75, CAST(FLOOR(quantile_cont(ve, 0.75)) AS BIGINT) FROM v
        UNION ALL SELECT 90, CAST(FLOOR(quantile_cont(ve, 0.9)) AS BIGINT) FROM v
        UNION ALL SELECT 99, CAST(FLOOR(quantile_cont(ve, 0.99)) AS BIGINT) FROM v
        ORDER BY q_pct
    """,
    "shuffled_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "distinct_users_by_type": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "order_next_gap": """
        SELECT o_orderkey,
               CAST(epoch(LEAD(o_orderdate) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                    - o_orderdate) / 86400 AS BIGINT) AS next_gap_days
        FROM orders ORDER BY o_orderkey
    """,
    "mode_priority": """
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          FROM orders GROUP BY o_orderstatus, o_orderpriority
        ),
        r AS (
          SELECT o_orderstatus, o_orderpriority, n,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY n DESC, o_orderpriority) AS rn
          FROM c
        )
        SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
        FROM r WHERE rn = 1 ORDER BY o_orderstatus
    """,
    "same_day_order_pairs": """
        WITH g AS (
          SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
                 COUNT(*) AS n
          FROM orders GROUP BY 1, 2
        )
        SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_pairs FROM g
    """,
    "source_lang_entropy": """
        WITH c AS (
          SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS n
          FROM documents GROUP BY source, lang
        ),
        t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY source)
        SELECT c.source,
               CAST(FLOOR(SUM(-(c.n / t.tot) * LN(c.n / t.tot)) * 1000000) AS BIGINT)
                 AS entropy_e6,
               CAST(t.tot AS BIGINT) AS n_docs
        FROM c JOIN t ON c.source = t.source
        GROUP BY c.source, t.tot ORDER BY c.source
    """,
    "sampled_documents": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 20
        ORDER BY doc_id
    """,
    "zorder_lookup": """
        SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS value_e2
        FROM events
        WHERE user_id BETWEEN 3 AND 8 AND value BETWEEN 50.0 AND 100.0
        ORDER BY event_id
    """,
    "encoded_groupby": """
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source ORDER BY source
    """,
    "unigram_logprob": """
        WITH words AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
          FROM documents WHERE trim(text) <> ''
        ),
        cnt AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS n FROM words GROUP BY w),
        tot AS (SELECT SUM(n) AS t FROM cnt),
        lp AS (SELECT w, LN(n / t) AS l FROM cnt, tot)
        SELECT w2.doc_id,
               CAST(FLOOR(AVG(lp.l) * 1000000) AS BIGINT) AS avg_lp_e6,
               COUNT(*) AS n_words
        FROM words w2 JOIN lp ON w2.w = lp.w
        GROUP BY w2.doc_id ORDER BY w2.doc_id
    """,
    "revenue_trend_slope": """
        WITH b AS (
          SELECT o_orderstatus AS s,
                 CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) - 9131 AS x,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
          FROM orders
        ),
        p AS (
          SELECT s, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx
          FROM b GROUP BY s
        )
        SELECT s AS o_orderstatus, CAST(n AS BIGINT) AS n,
               CAST(FLOOR((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1000000) AS BIGINT)
                 AS slope_e6
        FROM p ORDER BY s
    """,
    "group_percentile_cont": """
        WITH v AS (
          SELECT event_type,
                 CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DOUBLE) AS ve
          FROM events
        )
        SELECT event_type, 50 AS q_pct,
               CAST(FLOOR(quantile_cont(ve, 0.5)) AS BIGINT) AS val_e6_floor
        FROM v GROUP BY event_type
        UNION ALL
        SELECT event_type, 90, CAST(FLOOR(quantile_cont(ve, 0.9)) AS BIGINT)
        FROM v GROUP BY event_type
        ORDER BY event_type, q_pct
    """,
    "winsorized_stats": """
        WITH v AS (
          SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS ve FROM events
        ),
        b AS (
          SELECT event_type,
                 quantile_disc(ve, 0.05) AS lo, quantile_disc(ve, 0.95) AS hi,
                 COUNT(*) AS n
          FROM v GROUP BY event_type
        )
        SELECT v.event_type, CAST(b.lo AS BIGINT) AS lo_e6, CAST(b.hi AS BIGINT) AS hi_e6,
               CAST(SUM(LEAST(GREATEST(v.ve, b.lo), b.hi)) AS BIGINT) AS winsorized_sum_e6,
               CAST(b.n AS BIGINT) AS n
        FROM v JOIN b ON v.event_type = b.event_type
        GROUP BY v.event_type, b.lo, b.hi, b.n ORDER BY v.event_type
    """,
    "pythagorean_means": """
        WITH p AS (
          SELECT o_orderstatus AS s, CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(LN(o_totalprice)) AS lnx, SUM(1.0 / o_totalprice) AS inv
          FROM orders GROUP BY o_orderstatus
        )
        SELECT s AS o_orderstatus, CAST(n AS BIGINT) AS n,
               CAST(FLOOR(EXP(lnx / n) * 100) AS BIGINT) AS geo_mean_e2,
               CAST(FLOOR(n / inv * 100) AS BIGINT) AS harm_mean_e2
        FROM p ORDER BY s
    """,
    "range_frame_revenue": """
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1
        )
        SELECT day,
               CAST(SUM(cents) OVER w AS BIGINT) AS range_sum_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS range_days
        FROM daily
        WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "status_transitions": """
        WITH s AS (
          SELECT o_orderstatus,
                 LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS prev
          FROM orders
        )
        SELECT prev AS from_status, o_orderstatus AS to_status, COUNT(*) AS n
        FROM s WHERE prev IS NOT NULL
        GROUP BY prev, o_orderstatus ORDER BY from_status, to_status
    """,
    "union_tagged_values": """
        SELECT CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
               CAST(SUM(CASE WHEN event_id % 2 = 0
                             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS sum_cents,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_str
        FROM events
    """,
    "map_tagged_values": """
        WITH base AS (
          SELECT event_id, user_id,
                 CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
          FROM events
        )
        SELECT 'k' AS key, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_v FROM base
        UNION ALL
        SELECT 'u', COUNT(*), CAST(SUM(user_id) AS BIGINT)
        FROM base WHERE event_id % 2 = 1
        ORDER BY key
    """,
    "struct_pruned_read": """
        SELECT COUNT(*) AS n,
               CAST(SUM(user_id) AS BIGINT) AS sum_uid,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events
    """,
    "time_weighted_value": """
        WITH s AS (
          SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          - ts) AS held
          FROM events
        )
        SELECT user_id,
               CAST(SUM(cents * held) AS BIGINT) AS weighted_cents_sum,
               CAST(SUM(held) AS BIGINT) AS held_us
        FROM s WHERE held IS NOT NULL
        GROUP BY user_id HAVING SUM(held) > 0 ORDER BY user_id
    """,
    "gini_user_activity": """
        WITH c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
        r AS (
          SELECT n_events,
                 ROW_NUMBER() OVER (ORDER BY n_events, user_id) AS i
          FROM c
        ),
        t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(n_events) AS DOUBLE) AS tot,
                     CAST(SUM(i * n_events) AS DOUBLE) AS num
              FROM r)
        SELECT CAST(n AS BIGINT) AS n_users, CAST(tot AS BIGINT) AS n_events,
               CAST(FLOOR((2.0 * num / (n * tot) - (n + 1) / n) * 1000000) AS BIGINT)
                 AS gini_e6
        FROM t
    """,
    "lang_id": _lang_id_oracle_sql(),
    "balanced_sample": _balanced_sample_oracle_sql(),
    "quality_scores": _quality_oracle_sql(),
    "curation_pipeline": _curation_oracle_sql(),
    "scrub_pii": _scrub_pii_oracle_sql(),
    # dedup_minhash / simhash / ann_ivf / multimodal_features: heuristic
    # or approximate ops with no SQL equivalent — driver records the
    # weaker rows-only check.
}
