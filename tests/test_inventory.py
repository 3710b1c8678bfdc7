"""Contract guard: every operator named in SURVEY.md §2's binding
inventory must stay registered (a rename or accidental drop fails here
before the driver's t2 discovers a missing key)."""

from __future__ import annotations

import datalakecrawler_spark as dlc

SURVEY_INVENTORY = {
    # A — scans/sources/sinks
    "scan_parquet", "scan_csv_infer", "scan_json_infer", "sink_parquet",
    "sink_partitioned", "source_files_metadata",
    # B — crawler/catalog
    "catalog_infer_schema", "catalog_profile_numeric", "catalog_profile_distinct",
    "catalog_profile_distinct_exact", "catalog_topk_values",
    "catalog_null_fraction", "catalog_snapshot_diff", "catalog_row_count_estimate",
    # C — projections/filters
    "project_select", "filter_comparison", "filter_compound",
    "filter_in_between_like", "filter_null_handling", "case_when",
    # D — joins
    "join_inner_broadcast", "join_inner_shuffle", "join_left_outer",
    "join_right_outer", "join_full_outer", "join_left_semi", "join_left_anti",
    "join_cross", "join_theta_range", "join_asof", "join_multiway_star",
    "join_self",
    # E — aggregations
    "agg_groupby_basic", "agg_count_distinct", "agg_approx_distinct",
    "agg_filtered", "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_stats",
    "agg_minmax_by", "agg_percentile_exact", "agg_percentile_approx",
    "agg_collect_sorted", "agg_pivot", "agg_distinct_rows",
    # F — windows
    "win_row_number_topk", "win_rank_dense", "win_ntile_percent",
    "win_lag_lead", "win_running_sum", "win_moving_avg", "win_first_last",
    "win_agg_over",
    # G — sorts/limits/set ops
    "sort_multikey", "limit_topn", "setop_union_all", "setop_union_distinct",
    "setop_intersect", "setop_except",
    # H — scalar functions
    "str_basics", "str_split_regexp", "str_levenshtein", "date_parts",
    "date_arith", "math_fns", "cond_fns", "arr_basics", "arr_explode",
    "arr_higher_order", "map_json_get", "json_schema_infer", "hash_fns",
    # I — streaming
    "stream_tumbling_count", "stream_sliding_avg", "stream_session_window",
    "stream_dedup_watermark", "stream_static_join", "stream_late_data",
    # J — LLM-pipeline
    "dedup_exact", "dedup_near_minhash", "sim_topk_query", "sim_knn_join",
    "sim_pairwise_dups", "text_tokenize_wordcount", "text_ngrams",
    "text_tfidf_topterms", "text_doc_stats", "text_lang_distribution",
    "mm_embed_pooling", "mm_vector_norms", "cluster_assign_centroid",
    # K — UDF surface
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped_agg",
    "udtf_grouped_map", "udtf_arrow_table",
}

# single source of truth for the headline suite is bench.py (what the
# driver actually times); COVERAGE.md and PLANS.md follow it.
from bench import HEADLINE as _BENCH_HEADLINE  # noqa: E402

HEADLINE = set(_BENCH_HEADLINE)


def test_survey_inventory_complete():
    assert len(SURVEY_INVENTORY) == 97, len(SURVEY_INVENTORY)
    registered = set(dlc.registry.all_queries())
    missing = SURVEY_INVENTORY - registered
    assert not missing, f"SURVEY §2 operators missing from registry: {sorted(missing)}"


def test_headline_suite_registered():
    registered = set(dlc.registry.all_queries())
    assert HEADLINE <= registered


def test_every_query_has_fn_and_group():
    for name, q in dlc.registry.all_queries().items():
        assert callable(q.fn), name
        assert q.group, f"{name} missing group tag"
