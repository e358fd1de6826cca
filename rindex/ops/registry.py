"""Aggregates QUERIES / ORACLE registries from all ops modules."""

from __future__ import annotations


def _modules():
    # imports fail LOUD: a swallowed ImportError would silently drop a
    # whole module's ops from the driver's query set and verification
    # would pass vacuously on the remainder
    from rindex.ops import (
        analysis_ext, ann, atomic, dedup, dismax, evaluators, facets,
        fulltext, intervals, livedocs, loaders, lucene8, ml, monitor,
        multimodal, multiterm, nested, relational, search_ext, sketches,
        sqlhandler, streamlang, streams, surround, textstats, transcripts,
    )

    return [
        relational, fulltext, dedup, textstats, ann, multimodal,
        search_ext, loaders, analysis_ext, sketches, streams, evaluators,
        nested, dismax, livedocs, facets, atomic, multiterm, streamlang,
        ml, sqlhandler, monitor, lucene8, intervals, transcripts, surround,
    ]


# r3 rotation of the driver's 50-slot prefix-sampling window.  Priority:
# (1) the two r2 hash_match fails, fixed this round, (2) ops whose
# implementation or oracle CHANGED this round (dedup scale rewrites,
# vectorized repetition gates, merge-join dtype fix, actor-resident
# suggester family), (3) ops NEW this round, (4) oldest never-driver-
# sampled ops (r1∪r2 covered 93 of 152).  Purely an ordering hint —
# every op is always present either way; the judge sweep covers all.
_SAMPLE_FIRST = [
    # (1) r2 hash_match fails, fixed (oracle ::BIGINT + integer-cents)
    "pivot_facet_orders", "json_facet_nested_events",
    # (1b) conversation-level ops over the transcripts-shaped view (newest)
    "conv_flatten_documents", "conv_stats_documents",
    "conv_window_context_documents", "conv_dedup_documents",
    "conv_search_topk_documents", "conv_renumber_documents",
    "fuzzy_suggest_documents", "analysis_debug_documents",
    "result_clustering_documents", "term_range_search_documents",
    "setsim_topk_documents", "continuous_topk_events",
    "span_within_documents", "span_containing_documents",
    "bigram_nll_documents", "conv_latency_documents",
    "conv_curation_pipeline_documents", "conv_packing_documents",
    "json_facet_block_children_orders", "json_facet_unique_block_orders",
    "json_facet_relatedness_documents", "metaphone_topterms_documents",
    "conv_lang_consistency_documents", "geo_polygon_events",
    "covering_query_documents", "sweetspot_sim_topk_documents",
    "surround_query_documents", "conv_contamination_documents",
    "lm_delta_documents", "text_tagger_documents",
    "ltr_feature_log_documents", "surround_unordered_documents",
    "span_position_range_documents", "ltr_rerank_documents",
    "facet_pagination_documents", "spellcheck_extended_documents",
    # (2) changed this round — need fresh driver verification
    "embedding_cosine_neardup", "ngram_jaccard_neardup",
    "dedup_clusters_documents",
    "repetition_stats_documents", "curation_pipeline_documents",
    "merge_join_orders_customers", "merge_left_outer_customer_orders",
    "eval_temporal_events",
    "suggest_prefix_documents", "suggest_infix_documents",
    "spellcheck_documents", "spellcheck_collate_documents",
    # (3) new this round — newest (least-verified) first
    "substring_dedup_documents", "monitor_percolate_documents",
    "sessionize_events", "shard_split_search_documents",
    "naive_bayes_classify_documents",
    "common_terms_query_documents", "complex_phrase_documents",
    "dsir_weights_documents",
    "stream_expr_search_rollup", "stream_expr_update_search",
    "stream_expr_random_sample",
    "unigram_nll_documents", "domain_cap_documents",
    "stream_expr_parallel_rollup", "date_range_facet_events",
    "boilerplate_removal_documents", "stream_expr_significant_terms",
    "eval_calculus_events", "json_facet_multiselect_events",
    "stream_expr_drill", "luke_index_documents", "stream_expr_let_col",
    "chunk_windows_documents", "train_classify_documents",
    "features_ig_documents", "semdedup_embeddings",
    "ann_filtered_topk", "multimodal_box_downsample",
    "block_join_children_threads", "top_passage_documents",
    "sql_handler_orders", "word_dropout_documents",
    "freetext_suggest_documents", "bpe_train_documents",
    "bpe_encode_documents", "eval_density_fits_lineitem",
    "pii_luhn_documents", "eval_outliers_events",
    "collocations_documents", "textrank_keywords_documents",
    "term_dispersion_documents", "kwic_documents",
    "zipf_fit_documents", "ann_recall_mrr", "corpus_drift_documents", "ann_ndcg",
    "span_near_unordered_documents", "span_not_documents",
    "kstem_top_terms_documents",
    "blended_term_topk_documents", "bm25f_combined_topk_documents",
    "outer_hash_join_customer_orders", "full_outer_join_customer_orders",
    "eval_let_matrix_events", "eval_ks_uniform_lineitem",
    "stream_expr_outer_join", "stream_expr_complement",
    "eval_timeseries_moving_events", "eval_distance_embeddings",
    "eval_fft_events", "eval_ttest_lineitem",
    "eval_poisson_orders", "eval_polyfit_lineitem",
    "stream_expr_facet_events", "stream_expr_timeseries_events",
    "word_delimiter_topterms_documents", "common_grams_documents",
    "soundex_topterms_documents", "terms_set_filter_documents",
    "sequence_packing_documents", "mixture_sample_documents",
    "json_facet_allbuckets_events",
    "eval_describe_daily_events", "eval_mannwhitney_lineitem",
    "eval_chisquare_events", "eval_analyze_documents",
    "embedding_pq_codes", "rrf_fusion_topk", "c4_line_clean_documents",
    "eval_dist_fits_lineitem", "span_or_near_documents",
    "stream_expr_knn_embeddings", "vocab_oov_documents",
    "regexp_search_documents", "mmr_rerank_embeddings",
    "eval_signal_events", "facet_prefix_documents",
    "json_facet_percentile_events",
    # (4) never driver-sampled (registry order)
    "wildcard_search_documents", "query_elevation_documents",
    "expand_collapsed_events", "shortest_path_users",
    "multimodal_decode_features", "multimodal_resize_plan",
    "multimodal_frame_sample",
    "eval_regress_lineitem",
    "ascii_fold_topterms_documents",
    "mapping_charfilter_topterms_documents", "char_ngram_topterms_documents",
    "minimal_stem_topterms_documents", "keyword_trim_documents",
    "classic_sim_topk_documents", "query_string_extended_documents",
    "expression_sim_topk_documents", "dismax_qf_documents",
    "terms_enum_documents", "termvectors_documents",
    "delete_soft_search_documents", "delete_expunge_search_documents",
    "eval_math_funcs_events", "eval_string_funcs_documents",
    "sql_loader_events", "eval_select_lineitem",
    "block_join_orders_lineitem", "graph_gather_orders_of_nation",
    # still never-sampled after this window (for the r4 rotation):
    # significant_terms, json/csv/xml loaders, stopword/synonym/shingle/
    # edge_ngram/porter/snowball topterms, urp_parse_props, fetch_enrich,
    # ltr_score, geo_radius, train_test_split, percentile_tdigest,
    # eval_array_scale, terms_facet_missing, plus every entry below
    # slot 50 in THIS list — the 14 session-2 r3 ops (stream_expr_search_
    # rollup .. chunk_windows_documents, inserted at the head of group 3
    # as newest-least-verified) displaced roughly word_delimiter_topterms
    # onward; everything below the window keeps judge-sweep credit and
    # stays listed so the r4 rotation can promote the oldest first
]


def all_queries() -> dict:
    merged = {}
    for m in _modules():
        merged.update(getattr(m, "QUERIES", {}))
    out = {k: merged.pop(k) for k in _SAMPLE_FIRST if k in merged}
    out.update(merged)
    return out


def all_oracle_sql() -> dict:
    out = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return out
