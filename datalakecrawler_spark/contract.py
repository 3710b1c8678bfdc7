"""SURVEY.md §2 contract inventory — the 97 operator names in inventory
order (A1..K5).

The external correctness driver walks ``queries()`` in registration
order and may be capped (round 1 checked exactly the first 50 entries,
covering none of groups A-D/F-K — VERDICT.md "What's missing" §1). This
module pins the contract order so ``registry.reorder_contract_first``
can place all 97 §2 operators at the head of the registry: a capped or
time-boxed driver run then always covers the binding contract before
any extension query.

Kept in exact SURVEY.md §2 table order; ``tests/test_contract.py``
asserts (a) every name here is registered and (b) the first 97
registry entries are exactly this list.
"""

from __future__ import annotations

# fmt: off
CONTRACT: tuple[str, ...] = (
    # 2.A scans / sources / sinks
    "scan_parquet", "scan_csv_infer", "scan_json_infer", "sink_parquet",
    "sink_partitioned", "source_files_metadata",
    # 2.B crawler / catalog
    "catalog_infer_schema", "catalog_profile_numeric",
    "catalog_profile_distinct", "catalog_profile_distinct_exact",
    "catalog_topk_values", "catalog_null_fraction", "catalog_snapshot_diff",
    "catalog_row_count_estimate",
    # 2.C projections / filters
    "project_select", "filter_comparison", "filter_compound",
    "filter_in_between_like", "filter_null_handling", "case_when",
    # 2.D joins
    "join_inner_broadcast", "join_inner_shuffle", "join_left_outer",
    "join_right_outer", "join_full_outer", "join_left_semi",
    "join_left_anti", "join_cross", "join_theta_range", "join_asof",
    "join_multiway_star", "join_self",
    # 2.E aggregations
    "agg_groupby_basic", "agg_count_distinct", "agg_approx_distinct",
    "agg_filtered", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_stats", "agg_minmax_by", "agg_percentile_exact",
    "agg_percentile_approx", "agg_collect_sorted", "agg_pivot",
    "agg_distinct_rows",
    # 2.F windows
    "win_row_number_topk", "win_rank_dense", "win_ntile_percent",
    "win_lag_lead", "win_running_sum", "win_moving_avg", "win_first_last",
    "win_agg_over",
    # 2.G sorts / limits / set ops
    "sort_multikey", "limit_topn", "setop_union_all",
    "setop_union_distinct", "setop_intersect", "setop_except",
    # 2.H scalar functions
    "str_basics", "str_split_regexp", "str_levenshtein", "date_parts",
    "date_arith", "math_fns", "cond_fns", "arr_basics", "arr_explode",
    "arr_higher_order", "map_json_get", "json_schema_infer", "hash_fns",
    # 2.I streaming (batch twins)
    "stream_tumbling_count", "stream_sliding_avg", "stream_session_window",
    "stream_dedup_watermark", "stream_static_join", "stream_late_data",
    # 2.J LLM-data-pipeline
    "dedup_exact", "dedup_near_minhash", "sim_topk_query", "sim_knn_join",
    "sim_pairwise_dups", "text_tokenize_wordcount", "text_ngrams",
    "text_tfidf_topterms", "text_doc_stats", "text_lang_distribution",
    "mm_embed_pooling", "mm_vector_norms", "cluster_assign_centroid",
    # 2.K UDF / UDAF / UDTF
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped_agg",
    "udtf_grouped_map", "udtf_arrow_table",
)
# fmt: on

assert len(CONTRACT) == 97, len(CONTRACT)
assert len(set(CONTRACT)) == 97
