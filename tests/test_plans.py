"""Physical-plan regression tests: pin the scale-critical properties of
headline plans (pushdown, broadcast choice, codegen, no accidental
Python boundary) so a de-optimization fails here instead of on a
cluster. Runs uncached (caching replaces the scan and hides pushdown).
"""

from __future__ import annotations

import pytest

from datalakecrawler_spark import registry
from datalakecrawler_spark.plans.explain import audit

# Audit on the sf0.001 tier: other test modules cache the sf0.01 tables,
# and Spark's CacheManager substitutes InMemoryRelation into ANY new plan
# over a cached path — which hides PushedFilters/ReadSchema from the scan.
PLAN_SF_DIR = "/root/testdata/sf0.001"


def _audit_uncached(spark, name):
    import datalakecrawler_spark.io as io

    old = io._CACHE_ON
    io._CACHE_ON = False
    spark.catalog.clearCache()  # CacheManager rewrites plans over cached
    io._CACHE.clear()           # paths — drop both layers for a true scan
    try:
        df = registry.all_queries()[name].fn(spark, PLAN_SF_DIR)
        df.collect()  # materialize AQE's final plan (codegen ids appear there)
        return audit(df)
    finally:
        io._CACHE_ON = old


def test_q1_filter_pushdown_and_codegen(spark):
    a = _audit_uncached(spark, "q1_pricing_summary")
    assert any("LessThanOrEqual(l_shipdate" in p for p in a.pushed_filters), (
        a.pushed_filters
    )
    assert not a.has_python_eval
    assert a.n_codegen_stages >= 1, "q1 must run inside WholeStageCodegen"


def test_q3_broadcasts_dims(spark):
    a = _audit_uncached(spark, "q3_star_join")
    assert "BroadcastHashJoin" in a.joins
    assert "CartesianProduct" not in a.joins
    assert any("GreaterThanOrEqual(o_orderdate" in p for p in a.pushed_filters), (
        "orders date filter must reach the scan"
    )
    assert not a.has_python_eval


def test_theta_range_join_is_equi_not_nested_loop(spark):
    """The bucketized range join must plan as a hash join on the bin
    key — a BroadcastNestedLoopJoin/CartesianProduct here means the
    O(N²) formulation leaked back in."""
    a = _audit_uncached(spark, "join_theta_range")
    assert "CartesianProduct" not in a.joins
    assert "BroadcastNestedLoopJoin" not in a.joins
    assert any(
        j in a.joins for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), a.joins


def test_no_python_eval_in_builtin_operators(spark):
    """Only the K-group and multimodal stubs may cross into Python."""
    allowed = {
        "udf_python_scalar",
        "udf_pandas_scalar",
        "udaf_pandas_grouped_agg",
        "udtf_grouped_map",
        "udtf_arrow_table",
        "mm_decode_stub",
        "mm_frame_sample",
    }
    offenders = []
    for name in ["q1_pricing_summary", "doc_wordcount", "embedding_topk_cosine",
                 "dedup_near_minhash", "text_tfidf_topterms", "mm_embed_pooling",
                 "sim_knn_join", "win_moving_avg", "catalog_profile_numeric"]:
        assert name not in allowed
        if _audit_uncached(spark, name).has_python_eval:
            offenders.append(name)
    assert not offenders, f"built-in operators crossed into Python: {offenders}"


def test_topk_uses_window_group_limit(spark):
    """Spark 3.5+ pushes a per-partition WindowGroupLimit below the
    shuffle for rn<=k filters — the property that makes top-k-per-group
    viable at 100 TB."""
    a = _audit_uncached(spark, "win_row_number_topk")
    assert "WindowGroupLimit" in a.text, "rank filter not pushed into window"


def test_contamination_broadcasts_benchmark_grams(spark):
    """The benchmark 5-gram set must broadcast — the corpus side of the
    contamination gate never shuffles before the join at 100 TB."""
    a = _audit_uncached(spark, "text_contamination_ngram")
    assert "BroadcastHashJoin" in a.joins, a.joins
    assert "CartesianProduct" not in a.joins
    assert not a.has_python_eval


def test_quality_rules_single_codegen_scan(spark):
    """The quality sweep is one codegen'd scan + partial agg — no join,
    no Python, nothing that would add a corpus-sized shuffle."""
    a = _audit_uncached(spark, "text_quality_rules")
    assert not a.joins, a.joins
    assert not a.has_python_eval
    assert a.n_codegen_stages >= 1
    # exactly one logical shuffle: the per-lang final agg (AQE's formatted
    # text repeats the Exchange node per stage, so count distinct keys)
    import re

    keys = {k.split("#")[0] for k in re.findall(r"hashpartitioning\((\w+#?\w*)", a.text)}
    assert keys == {"lang"}, f"quality sweep shuffles on unexpected keys: {keys}"


def test_stream_stream_join_twin_not_cartesian(spark):
    """The interval join twin must hash/merge on user_id with the time
    range as residual condition — a nested-loop here would explode."""
    a = _audit_uncached(spark, "stream_stream_join")
    assert "CartesianProduct" not in a.joins
    assert "BroadcastNestedLoopJoin" not in a.joins
    assert any(
        j in a.joins for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), a.joins


def test_pack_sequences_no_python_no_global_sort(spark):
    """Packing is a partitioned window — per-shard sort, never a single
    global ordering."""
    a = _audit_uncached(spark, "pack_sequences")
    assert not a.has_python_eval
    import re

    # the window's sort must be partition-local (formatted-mode Sort
    # arguments are `[keys...], <global>, 0` — global must be false) and
    # keyed by shard, and the only exchange hash-partitions on shard
    # (never rangepartitioning, which would be a global sort)
    sort_args = re.findall(r"Arguments: \[shard#\d+L ASC[^\]]*\], (\w+), \d+", a.text)
    assert sort_args and all(g == "false" for g in sort_args), sort_args
    assert "rangepartitioning" not in a.text, "packing must not global-sort"
    assert re.search(r"hashpartitioning\(shard", a.text), "window exchange must key on shard"


def test_q10_pushdown_broadcast_takeordered(spark):
    """Q10: returnflag + date filters must reach their scans, dims must
    broadcast, and the top-20 must plan as TakeOrderedAndProject (no
    global sort of the aggregate output)."""
    a = _audit_uncached(spark, "q10_returned_items")
    assert any("EqualTo(l_returnflag,R)" in p for p in a.pushed_filters), (
        a.pushed_filters
    )
    assert any("GreaterThanOrEqual(o_orderdate" in p for p in a.pushed_filters)
    assert "BroadcastHashJoin" in a.joins
    assert "CartesianProduct" not in a.joins
    assert "TakeOrderedAndProject" in a.text
    assert not a.has_python_eval


def test_merge_upsert_single_shuffle_anti_join(spark):
    """The MERGE plan's anti join must be a hash join on the key, and
    nothing may route through Python."""
    a = _audit_uncached(spark, "sink_merge_upsert")
    assert "CartesianProduct" not in a.joins
    assert "BroadcastNestedLoopJoin" not in a.joins
    assert not a.has_python_eval


def test_constraint_suite_no_python_no_cartesian(spark):
    a = _audit_uncached(spark, "quality_constraint_suite")
    assert "CartesianProduct" not in a.joins
    assert not a.has_python_eval


def test_bucketed_join_no_shuffle_on_key(spark):
    """Co-located bucketed join: neither side may shuffle on the join
    key — the only allowed Exchange is the post-join aggregation's
    (hashpartitioning on o_orderstatus)."""
    a = _audit_uncached(spark, "sink_bucketed_join")
    assert "SortMergeJoin" in a.joins
    assert "hashpartitioning(o_orderkey" not in a.text
    assert "hashpartitioning(l_orderkey" not in a.text
    assert not a.has_python_eval


def test_e2e_pipeline_broadcasts_and_stays_jvm(spark):
    """The composed funnel must broadcast the benchmark gram set and the
    contaminated-id set (both tiny), never cartesian, never Python."""
    a = _audit_uncached(spark, "pipeline_training_data_e2e")
    assert "BroadcastHashJoin" in a.joins, a.joins
    assert "CartesianProduct" not in a.joins
    assert not a.has_python_eval


def test_embed_quantize_no_python(spark):
    """Quantization is pure higher-order lambdas — JVM only."""
    a = _audit_uncached(spark, "mm_embed_quantize")
    assert not a.has_python_eval
    assert not a.joins


def test_q18_semi_join_and_takeordered(spark):
    """Q18: the qualifying-keys filter must apply as a semi join (no
    collected IN-list), and the top-100 as TakeOrderedAndProject."""
    a = _audit_uncached(spark, "q18_large_orders")
    assert "LeftSemi" in a.text, "HAVING subquery must become a semi join"
    assert "CartesianProduct" not in a.joins
    assert "TakeOrderedAndProject" in a.text
    assert not a.has_python_eval


def test_q6_all_predicates_pushed_scalar_agg(spark):
    """Q6 is pure scan→filter→agg: every predicate must reach parquet
    and nothing may leave codegen."""
    a = _audit_uncached(spark, "q6_forecast_revenue")
    joined = " ".join(a.pushed_filters)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in joined, (frag, a.pushed_filters)
    assert not a.has_python_eval
    assert a.n_codegen_stages >= 1


def test_q7_broadcasts_dims_no_cartesian(spark):
    a = _audit_uncached(spark, "q7_volume_shipping")
    assert "BroadcastHashJoin" in a.joins
    assert "CartesianProduct" not in a.joins
    assert not a.has_python_eval


def test_q19_disjunction_prunes_and_broadcasts(spark):
    """The OR-of-brands must reach the part scan (CNF extraction) and
    part must broadcast."""
    a = _audit_uncached(spark, "q19_disjunctive_predicates")
    assert "BroadcastHashJoin" in a.joins
    assert any("p_brand" in p for p in a.pushed_filters), a.pushed_filters
    assert not a.has_python_eval


def test_q22_anti_join_no_per_row_subquery(spark):
    """The NOT EXISTS must plan as one anti join; the scalar threshold
    as a broadcast, not a correlated per-row subquery."""
    a = _audit_uncached(spark, "q22_dormant_rich_customers")
    assert "LeftAnti" in a.text, a.joins
    assert "CartesianProduct" not in a.joins  # 1-row threshold must broadcast
    assert not a.has_python_eval


def test_fk_discovery_distinct_before_join(spark):
    """FK containment must semi-join NDV-sized distinct sets, never raw
    tables, and stay JVM-side."""
    a = _audit_uncached(spark, "catalog_fk_discovery")
    assert not a.has_python_eval
    assert "LeftSemi" in a.text, a.joins
    assert "HashAggregate" in a.text  # distinct runs as agg before the join


def _shuffle_keys(a):
    import re

    return {m.split("#")[0] for m in re.findall(r"hashpartitioning\((\w+)", a.text)}


def test_q8_single_fact_shuffle_all_dims_broadcast(spark):
    """Q8 market share: every dim broadcasts, the date filter reaches
    the orders scan, and the only exchange is the final group-by-year
    (share numerator and denominator come out of one pass)."""
    a = _audit_uncached(spark, "q8_market_share")
    assert set(a.joins) == {"BroadcastHashJoin"}, a.joins
    assert any("GreaterThanOrEqual(o_orderdate" in p for p in a.pushed_filters)
    assert _shuffle_keys(a) == {"_groupingexpression"}, _shuffle_keys(a)
    assert not a.has_python_eval


def test_q11_single_shuffle_scalar_total_on_agg_frame(spark):
    """Q11: the global total must come from a scalar aggregate of the
    already aggregated per-part frame broadcast back (r5 — never a
    single-partition window over the part-grain frame, and never a
    second scan-wide aggregation): one l_partkey shuffle only."""
    a = _audit_uncached(spark, "q11_important_parts")
    assert _shuffle_keys(a) == {"l_partkey"}, _shuffle_keys(a)
    assert "BroadcastHashJoin" in a.joins
    assert not a.has_python_eval


def test_q15_scalar_max_no_second_fact_shuffle(spark):
    """Q15: scalar max of the aggregated frame broadcast back (r5 —
    not a single-partition window over the supplier-grain frame) —
    the fact shuffles once on l_suppkey and the max adds no keyed
    exchange."""
    a = _audit_uncached(spark, "q15_top_supplier")
    assert _shuffle_keys(a) == {"l_suppkey"}, _shuffle_keys(a)
    assert any("GreaterThanOrEqual(l_shipdate" in p for p in a.pushed_filters)
    assert not a.has_python_eval


def test_q17_correlated_avg_broadcasts_back(spark):
    """Q17: the per-part average frame must broadcast back onto the
    brand-filtered fact (never a fact⋈fact shuffle join), and the brand
    equality must reach the part scan."""
    a = _audit_uncached(spark, "q17_small_quantity_revenue")
    assert set(a.joins) == {"BroadcastHashJoin"}, a.joins
    assert any("EqualTo(p_brand,Brand#3)" in p for p in a.pushed_filters)
    assert _shuffle_keys(a) == {"l_partkey"}, _shuffle_keys(a)
    assert not a.has_python_eval


def test_q21_two_level_agg_reuses_orderkey_partitioning(spark):
    """Q21: the (order, supplier) flag agg, the per-order counts, and
    the sl⋈og join must all ride the same l_orderkey partitioning —
    the only other exchange is the tiny final per-supplier count."""
    a = _audit_uncached(spark, "q21_waiting_suppliers")
    assert "CartesianProduct" not in a.joins
    assert _shuffle_keys(a) <= {"l_orderkey", "s_name"}, _shuffle_keys(a)
    assert not a.has_python_eval


def test_q2_q16_q20_dim_filters_pushed_and_broadcast(spark):
    """The remaining subquery shapes: filtered dims broadcast and their
    predicates reach the scans (IN-list for Q16, LIKE-contains for
    Q20, size bound for Q2)."""
    for name, pushed in [
        ("q2_min_cost_part", "LessThanOrEqual(p_size,25)"),
        ("q16_part_supplier_counts", "In(p_size"),
        ("q20_promotion_suppliers", "StringContains(p_name,widget)"),
    ]:
        a = _audit_uncached(spark, name)
        assert "BroadcastHashJoin" in a.joins, (name, a.joins)
        assert "CartesianProduct" not in a.joins, name
        assert any(pushed in p for p in a.pushed_filters), (name, a.pushed_filters)
        assert not a.has_python_eval, name


def test_dynamic_partition_pruning_fires(spark):
    """The partitioned-fact ⋈ filtered-dim join must inject a
    dynamicpruning partition filter into the fact scan (DPP) — the
    fact's non-matching partitions are never read."""
    df = registry.all_queries()["join_partition_pruned_dynamic"].fn(
        spark, PLAN_SF_DIR
    )
    df.collect()
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in text, "DPP did not fire on the fact scan"
    assert "SubqueryBroadcast" in text, "DPP should reuse the broadcast dim"


def test_batch_inference_is_map_only(spark):
    """Batched inference must be a pure map stage: scan → Arrow-batched
    Python → project. Any exchange here would shuffle the corpus for no
    reason."""
    a = _audit_uncached(spark, "mm_batch_inference")
    assert a.has_python_eval  # the one op where Python IS the point
    assert not a.joins, a.joins
    assert "Exchange" not in a.text, "inference stage must not shuffle"


def test_runtime_bloom_filter_injection(spark):
    """Runtime bloom-filter join pruning (InjectRuntimeFilter): with a
    selective filter on the dim side of a SHUFFLE join, Spark builds a
    bloom filter from the dim keys and semi-filters the fact scan with
    might_contain BEFORE the shuffle — at 100 TB this cuts the fact
    exchange by the dim filter's selectivity. Thresholds are tuned down
    here (they default to 10 MB / 10 GB cluster sizes); broadcast is
    disabled to force the shuffle join the optimization targets."""
    import datalakecrawler_spark.io as io
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = io.load(spark, PLAN_SF_DIR, "lineitem")
        o = io.load(spark, PLAN_SF_DIR, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        df = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "bloom filter was not injected:\n" + plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q12_pushdown_and_join(spark):
    """Q12 shape: the shipdate year-range predicate must reach the scan
    (it is not join-dependent), and the fact⋈fact join must be an equi
    hash/merge join, never a nested loop — the o_orderdate comparison
    rides inside the equi join as a post-join condition."""
    a = _audit_uncached(spark, "q12_priority_linecount")
    assert any("GreaterThanOrEqual(l_shipdate" in p for p in a.pushed_filters), (
        a.pushed_filters
    )
    assert any(
        j in a.joins for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), a.joins
    assert "CartesianProduct" not in a.joins
    assert not a.has_python_eval


def test_ohlc_single_aggregation_no_extra_shuffle(spark):
    """The OHLC resample is one hash aggregation: exactly one shuffle
    (partial → exchange on the group key → final), min_by/max_by
    partials mergeable, everything JVM-side."""
    a = _audit_uncached(spark, "ts_resample_ohlc")
    assert a.n_exchanges == 1, a.text
    assert not a.has_python_eval


def test_range_search_never_shuffles_corpus(spark):
    """Radius search must broadcast the single query row; any Exchange
    of the embeddings side or a corpus-side sort means the scan-only
    plan regressed."""
    a = _audit_uncached(spark, "sim_range_search")
    assert "SortMergeJoin" not in a.joins and "ShuffledHashJoin" not in a.joins
    assert a.n_exchanges == 0, a.text
    assert not a.has_python_eval


def test_entropy_single_pass_per_column(spark):
    """Per-column entropy uses the ln(N) − Σc·ln c / N identity — no
    window over the counts, no Python, and one pair of exchanges per
    column (count shuffle + scalar-agg collapse)."""
    a = _audit_uncached(spark, "catalog_column_entropy")
    assert not a.has_python_eval
    assert "Window" not in a.text


def test_pit_join_single_natural_key_shuffle(spark):
    """The point-in-time SCD2 join must shuffle only on user_id (the
    windows AND the join share the natural key) and never plan a
    cartesian/nested-loop for the interval residual."""
    a = _audit_uncached(spark, "join_pit_scd2")
    assert "CartesianProduct" not in a.joins
    assert not a.has_python_eval
    import re

    keys = {
        m.split(",")[0].split("#")[0].strip()
        for m in re.findall(r"hashpartitioning\(([^)]*)\)", a.text)
    }
    assert keys <= {"user_id"}, keys


def test_pmi_broadcasts_marginals(spark):
    """PMI joins the bigram counts to vocabulary-sized unigram frames —
    those must broadcast, never shuffle the bigram table on the word."""
    a = _audit_uncached(spark, "text_pmi_bigrams")
    assert "BroadcastHashJoin" in a.joins
    assert "SortMergeJoin" not in a.joins, a.joins
    assert not a.has_python_eval


def test_trending_parts_aggregates_before_windows(spark):
    """The leaderboard's data-sized shuffle is the monthly aggregation;
    the two windows run over the monthly frame (month / l_partkey
    partitioning), with the shipdate filter pushed to the scan."""
    a = _audit_uncached(spark, "win_trending_parts")
    assert any("l_shipdate" in p for p in a.pushed_filters), a.pushed_filters
    assert not a.has_python_eval


def test_attribution_shuffles_on_user_only(spark):
    """Last-click attribution joins purchases to clicks on user_id with
    a range residual — no cartesian, shuffles only user/event keys."""
    a = _audit_uncached(spark, "events_attribution_lastclick")
    assert "CartesianProduct" not in a.joins
    assert "BroadcastNestedLoopJoin" not in a.joins
    assert not a.has_python_eval


def test_bloom_prefilter_injects_runtime_filter(spark):
    """The selective-dim shuffle join must carry an injected Bloom
    runtime filter on the fact side (the 100 TB shuffle-reduction
    pattern): bloom_filter_agg builds over the filtered dim keys and
    might_contain prunes fact rows before the exchange."""
    from datalakecrawler_spark.operators.joins import (
        _BLOOM_CONFS,
        _bloom_prefilter_frames,
    )

    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = _bloom_prefilter_frames(spark, PLAN_SF_DIR)
        df.collect()
        from datalakecrawler_spark.plans.explain import audit

        a = audit(df)
        assert "might_contain" in a.text, a.text[:2000]
        assert "bloom_filter_agg" in a.text
        assert any(j in ("SortMergeJoin", "ShuffledHashJoin") for j in a.joins)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_headline_suite_lints_clean(spark):
    """Zero plan lints across the whole headline benchmark suite: no
    Cartesian products, no Python eval in built-in plans, no
    excess-shuffle plans."""
    from bench import HEADLINE
    from datalakecrawler_spark.plans.explain import lint

    findings = {}
    for name in HEADLINE:
        q = registry.all_queries()[name]
        a = _audit_uncached(spark, name)
        issues = lint(a, name, q.group)
        if issues:
            findings[name] = issues
    assert not findings, findings


def test_signature_pass_fans_out(spark):
    """The MinHash signature pass must carry full-core partitioning:
    partition counts are sized by input BYTES, so compute-dense stages
    over one parquet split would otherwise run in a single task
    (measured 55 s → 9 s at sf0.01 when _spread landed — keep it)."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.dedup import (
        _SHINGLE_K,
        _band_signatures,
        _shingles,
    )

    d = load(spark, PLAN_SF_DIR, "documents").where(
        F.size(F.split("text", " ")) >= _SHINGLE_K
    )
    banded = _band_signatures(d.select("doc_id", _shingles().alias("shingles")))
    n = banded.rdd.getNumPartitions()
    p = spark.sparkContext.defaultParallelism
    assert n >= min(p, 8), f"signature stage has {n} partitions (cores={p})"


def test_connected_components_edges_pinned(spark):
    """connected_components must checkpoint the symmetric edge set
    before iterating — otherwise every propagation round re-executes
    the full upstream pipeline that produced the edges (measured 174 s
    → 4 s for dedup_components when the checkpoint landed). An
    RDD-backed (checkpointed) leaf shows up as a scan of an existing
    RDD instead of the upstream join tree."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.dedup import connected_components

    d = load(spark, PLAN_SF_DIR, "documents").limit(50)
    edges = d.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    )
    labels = connected_components(edges, max_iter=1)
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan[:1000]


def test_dedup_pair_scans_are_inverted_index_joins(spark):
    """The dedup diagnostics that score exact Jaccard (threshold
    sweep, component histogram, shingle-k sweep, containment) must
    plan their pair generation as an EQUI-join on the exploded gram —
    a CartesianProduct means the round-1 quadratic
    a.doc_id < b.doc_id self-join leaked back in. threshold_sweep
    additionally carries one BENIGN BroadcastNestedLoopJoin (the
    5-row broadcast-tau crossJoin), so the strict no-BNLJ assertion
    runs on the other three and on _exact_jac_pairs itself."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.dedup import (
        _exact_jac_pairs,
        _shingles,
    )
    from datalakecrawler_spark.plans.explain import audit

    for name in (
        "dedup_threshold_sweep",
        "dedup_component_size_hist",
        "dedup_shingle_k_sweep",
        "dedup_containment",
    ):
        a = _audit_uncached(spark, name)
        assert "CartesianProduct" not in a.joins, (name, a.joins)
        if name != "dedup_threshold_sweep":
            assert "BroadcastNestedLoopJoin" not in a.joins, (name, a.joins)
        if name != "dedup_component_size_hist":
            # size_hist's pair join hides behind the checkpointed
            # component labels (LogicalRDD leaf); its pair generation
            # is covered by the _exact_jac_pairs audit below.
            assert any(
                j in a.joins
                for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
            ), (name, a.joins)

    d = load(spark, PLAN_SF_DIR, "documents").limit(50)
    sh = d.select("doc_id", _shingles().alias("shingles"))
    pairs = _exact_jac_pairs(sh, 0.8)
    pairs.collect()
    a = audit(pairs)
    assert "CartesianProduct" not in a.joins, a.joins
    assert "BroadcastNestedLoopJoin" not in a.joins, a.joins


def test_ann_index_paths_stay_broadcast(spark):
    """The promoted ANN operators (IVF top-k, nprobe sweep, PQ, RP-LSH)
    must never materialize a data-sized cartesian/shuffled pair plan:
    centroid/codebook/distance-table sides are tiny and broadcast; the
    only permitted nested-loop joins are those 10-to-128-row
    broadcasts. A SortMergeJoin against the corpus or a
    CartesianProduct means the index degenerated to the O(N²) scan it
    exists to avoid."""
    for name in ("sim_topk_ivf", "sim_topk_pq"):
        a = _audit_uncached(spark, name)
        assert "CartesianProduct" not in a.joins, (name, a.joins)
        assert "SortMergeJoin" not in a.joins, (name, a.joins)
    # RP-LSH's signature self-join is data-sized on BOTH sides by
    # design — a shuffled equi-join on the sig key is exactly the
    # linear-shuffle plan (never broadcast, never cartesian).
    a = _audit_uncached(spark, "dedup_embedding_rplsh")
    assert "CartesianProduct" not in a.joins, a.joins
