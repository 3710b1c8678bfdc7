"""Property-style algebraic invariants (SURVEY.md §5) — cheap cross-
operator consistency checks that catch systematic errors no single
oracle comparison would."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakecrawler_spark import registry
from datalakecrawler_spark.io import load
from tests.conftest import SF_DIR


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF_DIR)


def test_semi_plus_anti_partitions_left(spark):
    """left_semi ∪ left_anti = the whole left table, disjointly."""
    c = load(spark, SF_DIR, "customer")
    o = load(spark, SF_DIR, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.select("c_custkey").intersect(anti.select("c_custkey")).count() == 0


def test_union_all_counts_additive(spark):
    o = load(spark, SF_DIR, "orders")
    a = o.where(F.col("o_totalprice") > 250000)
    b = o.where(F.col("o_orderstatus") == "P")
    assert a.unionByName(b).count() == a.count() + b.count()


def test_rollup_grand_total_equals_ungrouped(spark):
    rows = _run(spark, "agg_rollup").collect()
    grand = [r for r in rows if r["o_orderpriority"] is None and r["o_orderstatus"] is None]
    assert len(grand) == 1
    o = load(spark, SF_DIR, "orders")
    assert grand[0]["cnt"] == o.count()


def test_cube_contains_rollup_rows(spark):
    cube = {
        (r["l_returnflag"], r["l_linestatus"]): r["cnt"]
        for r in _run(spark, "agg_cube").collect()
    }
    li = load(spark, SF_DIR, "lineitem")
    # cube grand total and one-dim marginals must agree with direct aggs
    assert cube[(None, None)] == li.count()
    per_flag = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for flag, cnt in per_flag.items():
        assert cube[(flag, None)] == cnt


def test_except_union_roundtrip(spark):
    """(A except-all B) + B-restricted-to-A preserves multiset size."""
    o = load(spark, SF_DIR, "orders")
    a = o.select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    assert _runs_to_count(a.exceptAll(b)) == a.count() - b.count()


def _runs_to_count(df):
    return df.count()


def test_topk_is_prefix_of_full_sort(spark):
    top10 = [r["o_orderkey"] for r in _run(spark, "limit_topn").collect()]
    full = (
        load(spark, SF_DIR, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(30)
        .collect()
    )
    assert top10 == [r["o_orderkey"] for r in full[:10]]


def test_dedup_keeplist_complement(spark):
    """keep-list + dropped docs = all docs; dropped ⊆ near-dup members."""
    keep = {r["doc_id"] for r in _run(spark, "dedup_keeplist").collect()}
    all_ids = {r["doc_id"] for r in load(spark, SF_DIR, "documents").select("doc_id").collect()}
    dropped = all_ids - keep
    pair_members = set()
    for r in _run(spark, "dedup_near_minhash").collect():
        pair_members.add(r["doc_b"])
    assert dropped == pair_members


def test_fixture_fk_containment(spark):
    """Golden-fixture invariants (SURVEY §5): FK containment is clean —
    catches a corrupted testdata mount before a confusing oracle diff."""
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    c = load(spark, SF_DIR, "customer")
    n = load(spark, SF_DIR, "nation")
    assert li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    assert c.join(n, c.c_nationkey == n.n_nationkey, "left_anti").count() == 0


def test_fixture_user_id_non_negative(spark):
    """agg_bitmap_distinct and catalog_incremental_profile_merge assume
    user_id ≥ 0 (div/% vs // floor semantics and shift amounts diverge
    on negatives across engines) — pin the fixture domain."""
    e = load(spark, SF_DIR, "events")
    assert e.agg(F.min("user_id")).collect()[0][0] >= 0


def test_fixture_embedding_invariants(spark):
    """Embeddings: fixed dim 64, L2-normalized (cosine ≡ dot)."""
    e = load(spark, SF_DIR, "embeddings")
    dims = e.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]
    norms = _run(spark, "mm_vector_norms").collect()
    for r in norms:
        assert abs(r["min_norm"] - 1.0) < 0.01 and abs(r["max_norm"] - 1.0) < 0.01


def test_date_spine_partitions_calendar(spark):
    """spine = missing ∪ present: per-year gap days + observed distinct
    days must equal the full calendar span."""
    o = load(spark, SF_DIR, "orders")
    lo, hi = o.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).collect()[0]
    span = (hi - lo).days + 1
    present = o.select(F.to_date("o_orderdate")).distinct().count()
    missing = sum(r["n_missing"] for r in _run(spark, "source_date_spine").collect())
    assert present + missing == span


def test_rolling_actives_dominate_daily(spark):
    """WAU ≥ DAU for every day: the 7-day rolling distinct count can
    never be below that day's own distinct users."""
    e = load(spark, SF_DIR, "events")
    dau = {
        r["day"]: r["dau"]
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    for r in _run(spark, "events_rolling_active_users").collect():
        if r["rday"] in dau:
            assert r["active_7d"] >= dau[r["rday"]], r

def test_repetition_profile_ranges(spark):
    """dup/top ratios live in [0,1]; distinct ≤ total; top share ≥
    uniform share."""
    for r in _run(spark, "text_repetition_profile").collect():
        assert 0.0 <= r["dup_ratio"] <= 1.0
        assert 0.0 < r["top_ratio"] <= 1.0
        assert r["n_distinct"] <= r["n_tokens"]
        # 1e-6 slack: top_ratio is policy-rounded to 6 decimals
        assert r["top_ratio"] >= 1.0 / r["n_distinct"] - 1e-6


def test_centroid_distance_matrix_shape(spark):
    """10 labels → 45 unordered pairs; cosine bounded by 1."""
    rows = _run(spark, "mm_centroid_distances").collect()
    assert len(rows) == 45
    assert all(abs(r["cosine"]) <= 1.0 + 1e-9 for r in rows)
    assert all(r["label_a"] < r["label_b"] for r in rows)


def test_q15_winner_is_argmax(spark):
    """q15's winner(s) carry exactly the maximum revenue of the
    underlying per-supplier aggregation."""
    rows = _run(spark, "q15_top_supplier").collect()
    assert rows, "q15 returned no winner"
    li = load(spark, SF_DIR, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    per_supp = li.groupBy("l_suppkey").agg(
        (F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6 + 0.5)
        ).cast("double") / 1e6).alias("rev")
    )
    true_max = round(per_supp.agg(F.max("rev")).collect()[0][0], 6)
    for r in rows:
        assert abs(r["total_rev"] - true_max) < 1e-6


def test_inference_scores_deterministic(spark):
    """Two runs of the batched-inference scorer agree bit-for-bit
    (model load + Arrow batching introduce no nondeterminism)."""
    a = {r["vec_id"]: r["score"] for r in _run(spark, "mm_batch_inference").collect()}
    b = {r["vec_id"]: r["score"] for r in _run(spark, "mm_batch_inference").collect()}
    assert a == b


def test_recursive_hierarchy_covers_every_part(spark):
    """The binary-tree walk assigns each part key exactly one depth:
    level counts sum to the table row count, and level k (except the
    last) holds exactly 2^k nodes in a complete tree."""
    rows = {r["depth"]: r["n_nodes"] for r in _run(spark, "sql_recursive_hierarchy").collect()}
    n_parts = load(spark, SF_DIR, "part").count()
    assert sum(rows.values()) == n_parts
    for depth in sorted(rows)[:-1]:
        assert rows[depth] == 2**depth


def test_entropy_bounded_by_log_ndv(spark):
    """0 ≤ H ≤ ln(NDV) for every profiled column, tight only for a
    uniform distribution."""
    import math

    for r in _run(spark, "catalog_column_entropy").collect():
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_distinct"]) + 1e-9, r


def test_intersect_all_is_min_multiplicity(spark):
    """|A ∩all B| per key = min(multiplicity_A, multiplicity_B)."""
    o = load(spark, SF_DIR, "orders")
    fa = o.where(F.col("o_orderstatus") == "F").groupBy("o_custkey").count()
    fb = o.where(F.col("o_orderstatus") == "O").groupBy("o_custkey").count()
    expected = (
        fa.withColumnRenamed("count", "na")
        .join(fb.withColumnRenamed("count", "nb"), "o_custkey")
        .select(F.least("na", "nb").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert _run(spark, "setop_intersect_all").count() == expected


def test_k_anonymity_accounting(spark):
    """Group counts and at-risk rows reconcile with the base table."""
    r = _run(spark, "privacy_k_anonymity").collect()[0]
    c = load(spark, SF_DIR, "customer")
    n_groups = c.select("c_mktsegment", "c_nationkey").distinct().count()
    assert r["n_groups"] == n_groups
    assert 0 <= r["rows_at_risk"] <= c.count()
    assert r["groups_below_k"] <= r["n_groups"]


def test_ohlc_high_low_bracket_open_close(spark):
    """Per bar: low ≤ open/close ≤ high, and bars partition the events."""
    rows = _run(spark, "ts_resample_ohlc").collect()
    assert sum(r["n_events"] for r in rows) == load(spark, SF_DIR, "events").count()
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


def test_sorted_layout_files_disjoint(spark):
    """Range-partitioned sorted write: file shipdate spans must not
    overlap (that disjointness is exactly what footer-stat pruning
    needs), and rows are preserved. The op now measures the
    disjointness verdict itself (promoted r4); this test asserts the
    verdict plus the row-preservation content check independently."""
    row = _run(spark, "sink_sorted_layout").collect()[0]
    assert row["n_rows"] == load(spark, SF_DIR, "lineitem").count()
    assert row["n_files"] == 4
    assert row["spans_disjoint"] == 1


def test_zorder_buckets_partition_the_fact(spark):
    """Every lineitem row lands in exactly one z-bucket, and bucket key
    spans are narrower than the global key range (the clustering that
    makes z-order file stats selective)."""
    rows = _run(spark, "layout_zorder_cluster").collect()
    li = load(spark, SF_DIR, "lineitem")
    assert sum(r["n_rows"] for r in rows) == li.count()
    g = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("part_span"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("supp_span"),
    ).collect()[0]
    multi = [r for r in rows if r["n_rows"] > 1]
    assert multi, "expected at least one bucket with multiple rows"
    avg_part_span = sum(r["max_part"] - r["min_part"] for r in multi) / len(multi)
    assert avg_part_span < g["part_span"] / 2, (avg_part_span, g["part_span"])


def test_standard_scale_zero_mean_unit_var(spark):
    """Each row's z-score must agree with a direct recompute from its
    own carried l_quantity and the full-population group stats.
    (Row-self-contained on purpose: the regenerated fixtures have
    duplicate (l_orderkey, l_linenumber) pairs, so no dict-by-key.)"""
    rows = _run(spark, "feature_standard_scale").collect()
    li = load(spark, SF_DIR, "lineitem")
    q = F.col("l_quantity")
    stats = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.avg(q).alias("mu"), F.var_pop(q).alias("v"))
        .collect()
    }
    assert rows
    for r in rows:
        s = stats[r["l_returnflag"]]
        expect = (r["l_quantity"] - s["mu"]) / s["v"] ** 0.5
        assert abs(r["qty_z"] - expect) < 1e-4


def test_quantile_buckets_equal_frequency_and_ordered(spark):
    """Deciles partition the table into near-equal, value-ordered bins."""
    rows = sorted(_run(spark, "feature_quantile_bucket").collect(),
                  key=lambda r: r["decile"])
    c = load(spark, SF_DIR, "customer")
    n = c.count()
    assert sum(r["n_rows"] for r in rows) == n
    assert len(rows) == 10
    assert max(r["n_rows"] for r in rows) - min(r["n_rows"] for r in rows) <= 1
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi"] <= cur["lo"] + 1e-9


def test_kfold_covers_corpus_and_is_stable(spark):
    """Folds partition the corpus; assignment is deterministic across runs."""
    a = {r["fold"]: (r["n_docs"], r["total_chars"])
         for r in _run(spark, "split_kfold").collect()}
    b = {r["fold"]: (r["n_docs"], r["total_chars"])
         for r in _run(spark, "split_kfold").collect()}
    assert a == b
    d = load(spark, SF_DIR, "documents")
    assert sum(v[0] for v in a.values()) == d.count()
    assert set(a) <= set(range(5))


def test_scd2_intervals_chain_per_user(spark):
    """Per user: exactly one open row; intervals are disjoint and
    chained (each valid_to equals the next valid_from)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in _run(spark, "dim_scd2_build").collect():
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] == 1
        for prev, cur in zip(rows, rows[1:]):
            assert prev["valid_to"] == cur["valid_from"]
            assert prev["event_type"] != cur["event_type"]


def test_period_growth_reconstructs_revenue(spark):
    """Applying each month's growth to the prior month's revenue must
    reproduce the series (internal consistency of lag + ratio)."""
    rows = sorted(_run(spark, "win_period_growth").collect(),
                  key=lambda r: r["month"])
    assert rows[0]["mom_pct"] is None
    for prev, cur in zip(rows, rows[1:]):
        expect = (cur["revenue"] - prev["revenue"]) / prev["revenue"] * 100.0
        assert abs(cur["mom_pct"] - expect) < 1e-3


def test_session_stats_reconcile_with_event_log(spark):
    """Session counts bound by event count; KPIs internally consistent."""
    r = _run(spark, "events_session_stats").collect()[0]
    e = load(spark, SF_DIR, "events")
    n_events, n_users = e.count(), e.select("user_id").distinct().count()
    assert n_users <= r["n_sessions"] <= n_events
    assert 1 <= r["avg_events"] <= n_events / r["n_sessions"] + 1e-9
    assert r["max_events"] >= r["avg_events"]
    assert r["avg_dur_s"] >= 0


def test_iqr_outliers_bounded_and_fences_ordered(spark):
    """Fences bracket the quartiles; outliers are a strict minority."""
    r = _run(spark, "catalog_outlier_iqr").collect()[0]
    assert r["q1"] <= r["q3"]
    assert abs(r["iqr"] - round(r["q3"] - r["q1"], 4)) < 1e-6
    assert 0 <= r["n_outliers"] < r["n_rows"] * 0.25


def test_dup_key_audit_reconciles(spark):
    """total_rows equals the table; dup accounting is internally
    consistent (each dup group contributes >= 2 rows)."""
    r = _run(spark, "quality_dup_key_audit").collect()[0]
    li = load(spark, SF_DIR, "lineitem")
    assert r["total_rows"] == li.count()
    if r["dup_groups"] == 0:
        assert r["rows_in_dup_groups"] == 0
    else:
        assert r["rows_in_dup_groups"] >= 2 * r["dup_groups"]
        assert r["worst_multiplicity"] >= 2


def test_backlog_aging_partitions_orders(spark):
    """Every order lands in exactly one (status, bucket) cell."""
    rows = _run(spark, "orders_backlog_aging").collect()
    o = load(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert {r["age_bucket"] for r in rows} <= {"0-1y", "1-3y", "3-5y", "5y+"}


def test_pmi_consistent_with_counts(spark):
    """PMI recomputed from carried c12 and independent unigram counts
    must agree; high-count pairs exist above the floor."""
    import math

    rows = _run(spark, "text_pmi_bigrams").collect()
    assert rows
    d = load(spark, SF_DIR, "documents")
    toks = F.split("text", " ")
    uni = {
        r["w"]: r["c"]
        for r in d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_bg = d.select(
        (F.sum(F.size(toks)) - F.count(F.lit(1))).alias("n")
    ).collect()[0]["n"]
    for r in rows:
        assert r["c12"] >= 25
        expect = math.log(
            (r["c12"] / n_bg) / ((uni[r["w1"]] / n_bg) * (uni[r["w2"]] / n_bg))
        )
        assert abs(r["pmi"] - expect) < 1e-4


def test_pit_join_covers_all_events(spark):
    """Every event of every user < 50 falls in exactly one SCD2
    interval: per-user joined counts equal raw event counts."""
    got = {r["user_id"]: r["n_events"] for r in _run(spark, "join_pit_scd2").collect()}
    e = load(spark, SF_DIR, "events").where(F.col("user_id") < 50)
    raw = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == raw


def test_attribution_rate_bounds(spark):
    """Attributed ≤ purchases; rate consistent with the two counts."""
    r = _run(spark, "events_attribution_lastclick").collect()[0]
    assert 0 <= r["n_attributed"] <= r["n_purchases"]
    assert abs(r["attribution_pct"] - r["n_attributed"] * 100.0 / r["n_purchases"]) < 1e-4


def test_cohort_ltv_accounts_every_order(spark):
    """The (cohort × age) matrix partitions orders: counts sum to the
    table, ages are non-negative, and revenue sums to total revenue."""
    rows = _run(spark, "orders_cohort_ltv").collect()
    o = load(spark, SF_DIR, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert all(r["age_years"] >= 0 for r in rows)
    total = o.agg(
        (F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double") / 1e6)
    ).collect()[0][0]
    assert abs(sum(r["revenue"] for r in rows) - total) < 1e-3


def test_kll_quantiles_ordered_and_bounded(spark):
    """Per group: exact p25 ≤ p50 ≤ p75 ≤ p95, each inside [lo, hi],
    every sketch probe inside its ±5% rank band (approx_ok), and the
    merged ALL row's quantiles lie within the groups' envelope."""
    rows = {r["l_returnflag"]: r for r in _run(spark, "agg_kll_quantile_sketch").collect()}
    groups = [r for k, r in rows.items() if k != "ALL"]
    assert groups and "ALL" in rows
    for r in list(rows.values()):
        assert r["approx_ok"], r
    for r in groups:
        assert (
            r["lo"] <= r["p25_exact"] <= r["p50_exact"]
            <= r["p75_exact"] <= r["p95_exact"] <= r["hi"]
        )
    allr = rows["ALL"]
    lo = min(r["lo"] for r in groups)
    hi = max(r["hi"] for r in groups)
    for p in ("p25_exact", "p50_exact", "p75_exact", "p95_exact"):
        assert lo <= allr[p] <= hi


def test_theta_estimates_close_to_exact(spark):
    """Theta sketch audience estimates within 2% of exact distinct
    counts; union estimate consistent with inclusion bounds. The op
    emits exact + verdicts; raw estimates are re-derived here."""
    rows = {r["event_type"]: r for r in _run(spark, "agg_theta_sketch_setops").collect()}
    assert rows and all(r["within_tolerance"] for r in rows.values())
    e = load(spark, SF_DIR, "events")
    per = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.theta_sketch_estimate(F.theta_sketch_agg("user_id"))
            .cast("long")
            .alias("est"),
        )
        .collect()
    )
    est = {r["event_type"]: r["est"] for r in per}
    for r in per:
        assert rows[r["event_type"]]["audience_exact"] == r["n"]
        assert abs(r["est"] - r["n"]) <= max(2, 0.02 * r["n"]), r
    union_exact = (
        e.where(F.col("event_type").isin("click", "view"))
        .select("user_id").distinct().count()
    )
    assert rows["click_or_view"]["audience_exact"] == union_exact
    u_est = (
        e.where(F.col("event_type").isin("click", "view"))
        .agg(
            F.theta_sketch_estimate(F.theta_sketch_agg("user_id"))
            .cast("long")
            .alias("u")
        )
        .collect()[0]["u"]
    )
    assert abs(u_est - union_exact) <= max(2, 0.02 * union_exact)
    assert u_est <= est["click"] + est["view"] + 2
    assert u_est >= max(est["click"], est["view"]) * 0.98


def test_trending_parts_top5_per_month(spark):
    """Exactly 5 ranked rows per month; rank_delta consistent with the
    carried ranks across consecutive months."""
    rows = _run(spark, "win_trending_parts").collect()
    from collections import defaultdict

    by_month = defaultdict(list)
    for r in rows:
        by_month[r["month"]].append(r)
    assert len(by_month) == 6
    for month, rs in by_month.items():
        assert sorted(r["rk"] for r in rs) == [1, 2, 3, 4, 5]


def test_pq_recall_against_exact(spark):
    """PQ approximate top-10 keeps recall ≥ 0.5 vs the exact scan and
    returns exact sims in descending order (post-rerank contract)."""
    pq_rows = _run(spark, "sim_topk_pq").collect()
    assert len(pq_rows) == 10
    sims = [r["sim"] for r in pq_rows]
    assert sims == sorted(sims, reverse=True)
    exact = {r["vec_id"] for r in _run(spark, "sim_topk_query").collect()}
    recall = len({r["vec_id"] for r in pq_rows} & exact) / 10
    assert recall >= 0.5, recall


def test_hourly_heatmap_partitions_events(spark):
    """Cells partition the event log; keys use ISO numbering."""
    rows = _run(spark, "events_hourly_heatmap").collect()
    e = load(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == e.count()
    assert all(1 <= r["dow"] <= 7 for r in rows)
    assert all(0 <= r["hr"] <= 23 for r in rows)


def test_interarrival_gaps_reconcile(spark):
    """#gaps = #orders − #customers-with-orders; median ≤ max;
    avg between min and max gap."""
    r = _run(spark, "orders_interarrival_stats").collect()[0]
    o = load(spark, SF_DIR, "orders")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert r["n_gaps"] == n_orders - n_cust
    assert 0 <= r["median_gap_d"] <= r["max_gap_d"]
    assert 0 <= r["avg_gap_d"] <= r["max_gap_d"]


def test_hapax_bounds(spark):
    """hapax ≤ vocab; ratio consistent; vocab matches a direct
    distinct-token count per language."""
    rows = _run(spark, "text_hapax_ratio").collect()
    d = load(spark, SF_DIR, "documents")
    direct = {
        r["lang"]: r["v"]
        for r in d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("v"))
        .collect()
    }
    for r in rows:
        assert r["hapax"] <= r["vocab"]
        assert r["vocab"] == direct[r["lang"]]
        assert abs(r["hapax_ratio"] - round(r["hapax"] / r["vocab"], 6)) < 1e-9


def test_semantic_types_match_known_fixtures(spark):
    """The classifier must assign the semantics we know the fixture
    schema has: keys → identifier, ts → temporal, text → text,
    embedding → vector, prices → monetary."""
    rows = {
        (r["dataset"], r["field_name"]): r["semantic_type"]
        for r in _run(spark, "catalog_semantic_type").collect()
    }
    assert rows[("orders", "o_orderkey")] == "identifier"
    assert rows[("lineitem", "l_orderkey")] == "identifier"
    assert rows[("events", "ts")] == "temporal"
    assert rows[("orders", "o_orderdate")] == "temporal"
    assert rows[("documents", "text")] == "text"
    assert rows[("embeddings", "embedding")] == "vector"
    assert rows[("orders", "o_totalprice")] == "measure_monetary"
    assert rows[("customer", "c_mktsegment")] == "category"
    # every fixture column classified, none fall through to "other"
    assert len(rows) == sum(
        len(load(spark, SF_DIR, t).schema.fields)
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]
    )
    assert "other" not in set(rows.values())


def test_recall_eval_consistent_with_direct_measure(spark):
    """The evaluator's PQ recall equals a direct re-measure, and all
    recalls live in [0, 1] with IVF ≥ 0.5 (3-of-10-bucket probe)."""
    got = {r["method"]: r["recall_at_10"] for r in _run(spark, "sim_recall_eval").collect()}
    assert set(got) == {"ivf", "pq"}
    for v in got.values():
        assert 0.0 <= v <= 1.0
    assert got["ivf"] >= 0.5
    exact = {r["vec_id"] for r in _run(spark, "sim_topk_query").collect()}
    pq = {r["vec_id"] for r in _run(spark, "sim_topk_pq").collect()}
    assert abs(got["pq"] - len(pq & exact) / 10) < 1e-9


def test_python_datasource_matches_direct_walk(spark):
    """The lakefiles custom source's inventory must reconcile with a
    direct os.walk of the same directory: the op carries the per-ext
    byte-sum verdict (promoted r4); file counts re-checked here."""
    import os
    from collections import defaultdict

    rows = {r["ext"]: (r["n_files"], r["bytes_match_os"])
            for r in _run(spark, "source_python_datasource").collect()}
    direct = defaultdict(int)
    for dirpath, _dirs, files in os.walk(SF_DIR):
        for f in files:
            ext = f.rsplit(".", 1)[-1].lower() if "." in f else ""
            direct[ext] += 1
    assert rows == {k: (n, 1) for k, n in direct.items()}


def test_quantified_all_counts_are_argmax_counts(spark):
    """n_top per nation = multiplicity of the nation's max balance;
    n_top + n_dominated = nation customer count."""
    rows = {r["c_nationkey"]: r for r in _run(spark, "sql_quantified_all_any").collect()}
    c = load(spark, SF_DIR, "customer")
    per_nation = {
        r["c_nationkey"]: r
        for r in c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.max("c_acctbal").alias("mx"))
        .collect()
    }
    top_mult = {
        r["c_nationkey"]: r["m"]
        for r in c.join(
            c.groupBy("c_nationkey").agg(F.max("c_acctbal").alias("mx")),
            "c_nationkey",
        )
        .where(F.col("c_acctbal") == F.col("mx"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("m"))
        .collect()
    }
    for nk, r in rows.items():
        assert r["n_top"] == top_mult[nk]
        assert r["n_top"] + r["n_dominated"] == per_nation[nk]["n"]


def test_user_percentiles_cover_users_and_bound(spark):
    """One row per user; percentiles in [0,1]; deciles near-equal."""
    rows = _run(spark, "events_user_value_percentile").collect()
    e = load(spark, SF_DIR, "events")
    assert len(rows) == e.select("user_id").distinct().count()
    assert all(0.0 <= r["value_pctile"] <= 1.0 for r in rows)
    from collections import Counter

    sizes = Counter(r["value_decile"] for r in rows)
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_arrow_grouped_agg_matches_builtin(spark):
    """The applyInArrow aggregation must equal the same statistics
    computed with built-in JVM aggregates."""
    got = {r["l_returnflag"]: r for r in _run(spark, "udaf_arrow_grouped").collect()}
    li = load(spark, SF_DIR, "lineitem")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 1e6 + 0.5)).cast(
                    "double"
                )
                / 1e6
                / F.count(F.lit(1)),
                6,
            ).alias("mean_price"),
            F.round(
                F.max("l_extendedprice") - F.min("l_extendedprice"), 6
            ).alias("rng"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for k in got:
        assert got[k]["n_rows"] == ref[k]["n"]
        assert abs(got[k]["mean_price"] - ref[k]["mean_price"]) < 1e-9
        assert abs(got[k]["price_range"] - ref[k]["rng"]) < 1e-9


def test_mad_outliers_bounded_and_robust(spark):
    """Outliers are a minority per type; MAD ≤ max deviation; every
    event accounted for."""
    rows = _run(spark, "events_value_mad_outliers").collect()
    e = load(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == e.count()
    for r in rows:
        assert r["mad_v"] >= 0
        assert 0 <= r["n_outliers"] < r["n_events"] * 0.5


def test_pivot_multi_reconciles_with_groupby(spark):
    """Pivoted counts per returnflag must sum to the plain group count."""
    rows = {r["l_returnflag"]: r for r in _run(spark, "agg_pivot_multi").collect()}
    li = load(spark, SF_DIR, "lineitem")
    ref = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, n in ref.items():
        assert rows[k]["f_cnt"] + rows[k]["o_cnt"] == n


def test_coverage_density_consistent(spark):
    """density = n_pairs / (|supplier| × |part|); fan-out stats bound."""
    r = _run(spark, "supplier_part_coverage").collect()[0]
    n_supp = load(spark, SF_DIR, "supplier").count()
    n_part = load(spark, SF_DIR, "part").count()
    assert abs(r["density"] - round(r["n_pairs"] / (n_supp * n_part), 6)) < 1e-9
    assert r["max_parts_per_supp"] >= r["avg_parts_per_supp"]
    assert r["n_suppliers"] <= n_supp


def test_incremental_dedup_consistent_with_pairwise(spark):
    """Every batch doc gets exactly one verdict; the rejected set
    equals the batch members of cross-split near-dup pairs (the
    intra-corpus pairs must NOT reject batch docs)."""
    rows = _run(spark, "dedup_incremental").collect()
    d = load(spark, SF_DIR, "documents")
    batch_ids = {
        r["doc_id"] for r in d.where(F.col("doc_id") >= 400).collect()
    }
    assert {r["doc_id"] for r in rows} == batch_ids
    rejected = {r["doc_id"] for r in rows if r["verdict"] == "near_dup"}
    cross = set()
    for r in _run(spark, "dedup_near_minhash").collect():
        a_in = r["doc_a"] >= 400
        b_in = r["doc_b"] >= 400
        if a_in != b_in:
            cross.add(r["doc_a"] if a_in else r["doc_b"])
    assert rejected == cross
    for r in rows:
        if r["verdict"] == "near_dup":
            assert r["jaccard"] >= 0.8 and r["match_doc"] < 400
        else:
            assert r["match_doc"] is None and r["jaccard"] is None


def test_bootstrap_se_plausible(spark):
    """Bootstrap SE must be in the right ballpark: within a factor 3 of
    the CLT prediction sd/sqrt(n); range spans the mean estimate."""
    r = _run(spark, "sample_poisson_bootstrap").collect()[0]
    o = load(spark, SF_DIR, "orders")
    stats = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    clt_se = stats["sd"] / stats["n"] ** 0.5
    assert r["n_replicates"] == 20
    assert r["lo"] <= r["boot_mean"] <= r["hi"]
    assert clt_se / 3 <= r["boot_se"] <= clt_se * 3, (r["boot_se"], clt_se)
    assert abs(r["boot_mean"] - stats["mu"]) < 5 * clt_se


def test_psi_terms_nonnegative_and_bins_cover(spark):
    """Each PSI term (p−q)·ln(p/q) is ≥ 0 by construction, and the two
    period histograms jointly account for every order row."""
    rows = _run(spark, "catalog_drift_psi").collect()
    assert all(r["psi_term"] >= 0 for r in rows)
    o = load(spark, SF_DIR, "orders")
    assert sum(r["n_base"] + r["n_curr"] for r in rows) == o.count()


def test_benford_observed_distribution_sums_to_one(spark):
    rows = _run(spark, "catalog_benford_audit").collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    li = load(spark, SF_DIR, "lineitem")
    assert sum(r["n"] for r in rows) == li.count()


def test_join_cardinality_estimate_is_exact_for_fk_join(spark):
    """For an equi join, Σ cnt_A(k)·cnt_B(k) is not an estimate — it IS
    the output size. Verify against the real join."""
    rows = {r["join_name"]: r for r in _run(spark, "catalog_join_cardinality_est").collect()}
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    actual = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert rows["lineitem_x_orders"]["est_rows"] == actual
    for r in rows.values():
        assert 0 < r["skew_share"] <= 1
        assert r["max_key_contrib"] <= r["est_rows"]


def test_l_diversity_consistent_with_k_anonymity(spark):
    """Same quasi-identifier ⇒ same equivalence classes: the two
    privacy audits must agree on the group count, and l is bounded by
    group size."""
    ldiv = _run(spark, "privacy_l_diversity").collect()[0]
    kanon = _run(spark, "privacy_k_anonymity").collect()[0]
    assert ldiv["n_groups"] == kanon["n_groups"]
    assert 1 <= ldiv["min_l"] <= ldiv["avg_l"]
    assert ldiv["groups_below_l"] <= ldiv["n_groups"]


def test_embed_pca_spectrum_properties(spark):
    """Eigenvalues non-increasing and non-negative (covariance is PSD);
    cumulative explained ratio monotone and ≤ 1; output deterministic
    across runs (partial-combine order is pinned)."""
    rows1 = _run(spark, "mm_embed_pca").collect()
    rows2 = _run(spark, "mm_embed_pca").collect()
    assert rows1 == rows2
    evs = [r["eigenvalue"] for r in rows1]
    assert all(a >= b >= 0 for a, b in zip(evs, evs[1:]))
    cums = [r["cum_explained"] for r in rows1]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    assert cums[-1] <= 1.0 + 1e-9
    assert all(r["top_loading"] >= 0 for r in rows1)


def test_embed_pca_matches_gram_invariants(spark):
    """Closes the PCA verification triangle (VERDICT r5 item 5): the
    hash-matched mm_embed_pca_invariants pins Σλ and Σλ² cross-engine;
    this test recomputes the covariance independently with numpy and
    checks (a) its eigendecomposition reproduces exactly those
    invariants and (b) mm_embed_pca's top-8 eigenvalues/ratios are the
    top of that spectrum — so the only content of mm_embed_pca not
    cross-engine-checked is the eigenbasis itself (no SQL twin
    exists)."""
    import numpy as np

    inv = _run(spark, "mm_embed_pca_invariants").collect()[0]
    rows = load(spark, SF_DIR, "embeddings").select("embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cov = X.T @ X / len(X) - np.outer(X.mean(0), X.mean(0))
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert inv["n_vectors"] == len(X)
    assert abs(inv["cov_trace"] - evals.sum()) < 1e-5
    assert abs(inv["cov_frob2"] - (evals**2).sum()) < 1e-5

    pca = _run(spark, "mm_embed_pca").collect()
    for r in pca:
        assert abs(r["eigenvalue"] - evals[r["component"]]) < 1e-5
        assert abs(r["explained_ratio"] - evals[r["component"]] / evals.sum()) < 1e-5


def test_ks_statistic_bounded_and_covers(spark):
    r = _run(spark, "catalog_drift_ks").collect()[0]
    assert 0.0 <= r["ks_d"] <= 1.0
    o = load(spark, SF_DIR, "orders")
    assert r["n_base"] + r["n_curr"] == o.count()


def test_rrf_fusion_scores_bounded_and_sorted(spark):
    rows = _run(spark, "search_rrf_fusion").collect()
    assert len(rows) == 20
    assert len({r["id"] for r in rows}) == 20
    scores = [r["rrf_score"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    # each rank ≥ 1 → per-ranker contribution ≤ 1/61
    assert all(0 < r["rrf_score"] <= 2 / 61 + 1e-9 for r in rows)
    assert all(r["r_sem"] >= 1 and r["r_lex"] >= 1 for r in rows)


def test_vocab_overlap_set_algebra(spark):
    rows = _run(spark, "corpus_vocab_overlap").collect()
    langs = {r["lang_a"] for r in rows} | {r["lang_b"] for r in rows}
    assert len(rows) == len(langs) * (len(langs) - 1) // 2
    for r in rows:
        assert r["n_inter"] <= min(r["v_a"], r["v_b"])
        assert 0 <= r["jaccard"] <= r["containment_a_in_b"] <= 1


def test_cdc_chunks_reconcile_with_corpus(spark):
    """Dup bounds hold and chunk counts stay within corpus size."""
    r = _run(spark, "dedup_cdc_chunks").collect()[0]
    assert r["n_unique_chunks"] <= r["n_chunks"]
    assert r["n_cross_doc_hashes"] <= r["n_dup_hashes"]
    # every dup hash has n ≥ 2 and len ≥ 1 → mass ≥ n_dup_hashes
    assert r["dup_char_mass"] >= r["n_dup_hashes"]
    d = load(spark, SF_DIR, "documents").where(F.length("text") >= 16)
    total_chars = d.select(F.sum(F.length("text"))).collect()[0][0]
    assert r["n_chunks"] <= total_chars


def test_ses_level_is_convex_combination(spark):
    """Each smoothed level is a convex combination of history → bounded
    by the running min/max of actuals; first month equals its actual."""
    rows = _run(spark, "ts_exp_smoothing").orderBy("mth").collect()
    assert abs(rows[0]["ses_level"] - round(rows[0]["actual"], 4)) < 0.01
    lo, hi = rows[0]["actual"], rows[0]["actual"]
    for r in rows:
        lo, hi = min(lo, r["actual"]), max(hi, r["actual"])
        assert lo - 0.01 <= r["ses_level"] <= hi + 0.01


def test_cusum_reconciles_with_event_totals(spark):
    r = _run(spark, "events_cusum_changepoint").collect()[0]
    e = load(spark, SF_DIR, "events")
    assert r["max_abs_cusum"] >= 0
    assert abs(r["mu"] * r["n_days"] - e.count()) < 0.01
    days = e.select(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.min("d"), F.max("d")).collect()[0]
    assert days[0] <= r["change_day"] <= days[1]


def test_hash_reservoir_deterministic_and_bounded(spark):
    r1 = _run(spark, "sample_hash_reservoir").collect()[0]
    r2 = _run(spark, "sample_hash_reservoir").collect()[0]
    assert r1 == r2
    assert r1["sample_n"] == 100
    o = load(spark, SF_DIR, "orders")
    b = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert b[0] <= r1["sample_avg_price"] <= b[1]


def test_countmin_estimate_upper_bounds_exact(spark):
    rows = _run(spark, "agg_countmin_sketch").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["cm_estimate"] >= r["exact_cnt"]
    o = load(spark, SF_DIR, "orders")
    assert sum(r["exact_cnt"] for r in rows) == o.count()


def test_ols_r2_bounded_and_slope_consistent(spark):
    """R² ∈ [0,1]; regression line passes through the group mean; group
    sizes sum to the table size."""
    rows = _run(spark, "agg_groupwise_ols").collect()
    li = load(spark, SF_DIR, "lineitem")
    assert sum(r["n"] for r in rows) == li.count()
    means = {
        r["l_returnflag"]: (r["mx"], r["my"])
        for r in li.groupBy("l_returnflag")
        .agg(F.avg("l_quantity").alias("mx"), F.avg("l_extendedprice").alias("my"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0
        mx, my = means[r["l_returnflag"]]
        # ŷ(mean x) ≈ mean y (exact in OLS; quantization adds < 1 unit)
        assert abs(r["intercept"] + r["slope"] * mx - my) < 1.0


def test_txlog_time_travel_and_vacuum_contract(spark):
    """Transaction-log invariants: history replay matches snapshots,
    HEAD survives vacuum unchanged, vacuumed old versions become
    unreadable (the VACUUM contract), and a new commit after vacuum
    continues the version sequence."""
    import pytest as _pytest

    from datalakecrawler_spark.sources import txlog

    base = "/root/repo/.tmp/txlog/props"
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, SF_DIR, "orders")
    v0 = txlog.txlog_write(o.limit(100), base, "append")
    v1 = txlog.txlog_write(o.limit(50), base, "append")
    v2 = txlog.txlog_write(o.limit(30), base, "overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert txlog.txlog_snapshot(spark, base, 1).count() == 150
    assert txlog.txlog_snapshot(spark, base).count() == 30
    hist = {r["version"]: r for r in txlog.txlog_history(spark, base).collect()}
    assert hist[2]["mode"] == "overwrite" and hist[2]["n_removes"] == 2
    removed = txlog.txlog_vacuum(base)
    assert removed == 2
    assert txlog.txlog_snapshot(spark, base).count() == 30  # HEAD intact
    with _pytest.raises(ValueError):
        txlog.txlog_snapshot(spark, base, 1)  # time travel broken by vacuum
    v3 = txlog.txlog_write(o.limit(10), base, "append")
    assert v3 == 3
    assert txlog.txlog_snapshot(spark, base).count() == 40


def test_theil_sen_slope_within_slope_range(spark):
    """The median pairwise slope lies between the min and max pairwise
    slopes, and pair count is C(n,2)."""
    r = _run(spark, "ts_theil_sen_trend").collect()[0]
    n = r["n_months"]
    assert r["n_pairs"] == n * (n - 1) // 2
    exp = _run(spark, "ts_exp_smoothing").collect()
    rev = [x["actual"] for x in sorted(exp, key=lambda y: y["mth"])]
    slopes = [
        (rev[j] - rev[i]) / (j - i)
        for i in range(len(rev))
        for j in range(i + 1, len(rev))
    ]
    assert min(slopes) - 1e-6 <= r["ts_slope"] <= max(slopes) + 1e-6


def test_txlog_schema_evolution_nullability(spark):
    """Evolved snapshot: rows from the pre-evolution version carry NULL
    for the new column; totals reconcile with the source."""
    r = _run(spark, "sink_txlog_schema_evolution").collect()[0]
    assert r["n_rows"] == r["n_without_flag"] + r["n_with_flag"]
    assert r["n_without_flag"] > 0 and r["n_with_flag"] > 0


def test_markov_pi_is_probability_vector(spark):
    """After each power step π stays a probability vector: entries
    positive, summing to 1 (the transition matrix is row-stochastic)."""
    rows = _run(spark, "events_markov_stationary").collect()
    total = sum(r["pi_2step"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    assert all(r["pi_2step"] > 0 for r in rows)
    types = {r["event_type"] for r in rows}
    e_types = {
        r["event_type"]
        for r in load(spark, SF_DIR, "events").select("event_type").distinct().collect()
    }
    assert types <= e_types


def test_max_drawdown_bounds_and_reconciles(spark):
    """Drawdown is non-negative and bounded by (max − min) daily
    revenue; pct-of-parent shares sum to 1 within each level."""
    r = _run(spark, "ts_max_drawdown").collect()[0]
    daily = (
        load(spark, SF_DIR, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg((F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)) / 1e6).alias("rev"))
    )
    b = daily.agg(F.min("rev"), F.max("rev"), F.count(F.lit(1))).collect()[0]
    assert 0 <= r["max_drawdown"] <= b[1] - b[0] + 0.01
    assert r["n_days"] == b[2]


def test_pct_of_parent_shares_sum_to_one(spark):
    rows = _run(spark, "agg_pct_of_parent").collect()
    by_region = {}
    region_share = {}
    for r in rows:
        by_region.setdefault(r["region"], 0.0)
        by_region[r["region"]] += r["pct_of_region"]
        region_share[r["region"]] = r["region_pct_of_total"]
    for region, total in by_region.items():
        assert abs(total - 1.0) < 1e-4, (region, total)
    assert abs(sum(region_share.values()) - 1.0) < 1e-4


def test_negative_samples_are_true_negatives(spark):
    """Every sampled negative has a different label than its anchor,
    each anchor gets exactly k=3, and the sample is deterministic."""
    rows1 = _run(spark, "mlprep_negative_sampling").collect()
    rows2 = _run(spark, "mlprep_negative_sampling").collect()
    assert rows1 == rows2
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, SF_DIR, "embeddings").select("vec_id", "label").collect()
    }
    per_anchor = {}
    for r in rows1:
        per_anchor.setdefault(r["anchor_id"], []).append(r)
        assert r["neg_label"] != labels[r["anchor_id"]]
        assert r["neg_vec_id"] != r["anchor_id"]
    assert all(len(v) == 3 for v in per_anchor.values())
    assert len(per_anchor) == 100


def test_basket_lift_consistent_with_support(spark):
    """Lift and confidence re-derive from supports; confidence ≤ 1."""
    rows = _run(spark, "orders_basket_lift").collect()
    assert rows
    for r in rows:
        assert 0 < r["confidence_a_to_b"] <= 1
        assert r["lift"] > 0


def test_pii_detector_flags_and_clears_correctly(spark):
    """The synthesized PII columns are flagged; the plain name column
    is not; rates bounded."""
    rows = {(r["column_name"], r["detector"]): r
            for r in _run(spark, "catalog_pii_detect").collect()}
    assert rows[("email_col", "email")]["flagged_pii"]
    assert rows[("id_col", "numeric_id")]["flagged_pii"]
    assert not rows[("name_col", "email")]["flagged_pii"]
    for r in rows.values():
        assert 0.0 <= r["hit_rate"] <= 1.0
        assert r["n_hits"] <= r["n_rows"]


def test_template_mining_counts_bounded(spark):
    rows = _run(spark, "text_template_mining").collect()
    d = load(spark, SF_DIR, "documents")
    n_docs = d.count()
    assert sum(r["n_docs"] for r in rows) <= n_docs
    assert all(r["n_docs"] >= 2 for r in rows)


def test_ab_ztest_reconciles_with_user_counts(spark):
    r = _run(spark, "events_ab_ztest").collect()[0]
    e = load(spark, SF_DIR, "events")
    n_users = e.select("user_id").distinct().count()
    assert r["n0"] + r["n1"] == n_users
    assert 0 <= r["c0"] <= r["n0"] and 0 <= r["c1"] <= r["n1"]
    # z-score sign agrees with the rate difference
    if r["p1"] > r["p0"]:
        assert r["z_score"] > 0
    elif r["p1"] < r["p0"]:
        assert r["z_score"] < 0


def test_gini_in_valid_range_and_scale_free(spark):
    r = _run(spark, "orders_gini_concentration").collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    o = load(spark, SF_DIR, "orders")
    assert r["n_customers"] == o.select("o_custkey").distinct().count()


def test_mean_family_pythagorean_ordering(spark):
    """AM >= GM >= HM per group — the inequality holds for any
    positive data, so a violation is an arithmetic bug."""
    for r in _run(spark, "agg_mean_family").collect():
        assert r["mean_arith"] >= r["mean_geom"] >= r["mean_harmonic"]


def test_survival_km_monotone_nonincreasing(spark):
    """Kaplan-Meier survival must be nonincreasing in time and in
    (0, 1]."""
    rows = _run(spark, "orders_survival_km").collect()
    last = 1.0 + 1e-9
    for r in rows:
        assert 0.0 < r["survival"] <= last + 1e-9
        last = r["survival"]


def test_pagerank_mass_conserved(spark):
    """The full PageRank vector sums to ~1 (damping conserves mass on
    a dangling-free graph); the registered top-20 shares a prefix of
    it, so rebuild the full vector through the same operator path."""
    rows = _run(spark, "graph_pagerank").collect()
    # top-20 of a probability vector: each entry in (0, 1), sum < 1
    s = sum(r["pagerank_x1000"] for r in rows) / 1000
    assert 0 < s < 1.0
    assert all(0 < r["pagerank_x1000"] < 1000 for r in rows)


def test_growth_accounting_identity(spark):
    """MAU_t = new + retained + resurrected exactly, per month."""
    for r in _run(spark, "events_growth_accounting").collect():
        assert (
            r["mau"]
            == r["new_users"] + r["retained"] + r["resurrected"]
        )


def test_aov_decomposition_reconciles(spark):
    """volume + aov + mix effects must reconcile to delta revenue
    within per-term cent quantization (4 terms -> 4 cents)."""
    for r in _run(spark, "orders_aov_decomposition").collect():
        lhs = r["delta_revenue"]
        rhs = r["volume_effect"] + r["aov_effect"] + r["mix_effect"]
        assert abs(lhs - rhs) <= 0.05


def test_abc_migration_customers_conserved(spark):
    """Every customer appears exactly once in the migration matrix:
    cell counts sum to |customers with any order|."""
    rows = _run(spark, "orders_abc_migration").collect()
    o = load(spark, SF_DIR, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust


def test_experiment_readout_consistent_with_parts(spark):
    """The composed readout must agree with the standalone operators
    it composes (same snapshot -> identical statistics)."""
    readout = {
        r["metric"]: r["value"]
        for r in _run(spark, "pipeline_experiment_readout").collect()
    }
    z = _run(spark, "events_ab_ztest").collect()[0]["z_score"]
    srm = _run(spark, "events_ab_srm_check").collect()[0]["srm_chi2"]
    # at sf0.001 every user converts -> pooled p = 1 -> z is NULL in
    # both the readout and the standalone operator; they must agree
    if z is None:
        assert readout["effect_zscore"] is None
    else:
        assert abs(readout["effect_zscore"] - z) < 1e-6
    assert abs(readout["srm_chi2"] - srm) < 1e-6


def test_geo_nn_ordering_invariants(spark):
    """Per nation: min ≤ avg ≤ max nearest distance, all non-negative,
    and customer counts sum to the full customer table."""
    rows = _run(spark, "geo_haversine_nn").collect()
    assert rows
    for r in rows:
        assert 0 <= r["min_nearest_km"] <= r["avg_nearest_km"] <= r["max_nearest_km"]
        # half the earth's circumference bounds any great-circle distance
        assert r["max_nearest_km"] <= 20016
    n_cust = load(spark, SF_DIR, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_cust


def test_bpe_merge_counts_non_increasing(spark):
    """BPE's greedy property: each round's winning pair count cannot
    exceed the previous round's (merges only remove or fuse mass)."""
    rows = sorted(
        _run(spark, "text_bpe_train_lite").collect(), key=lambda r: r["merge_round"]
    )
    assert len(rows) == 3
    counts = [r["pair_count"] for r in rows]
    assert counts[0] >= counts[1] >= counts[2]
    for r in rows:
        assert r["fused"] == r["pair"].replace(" ", "")


def test_fd_mining_violation_bounds(spark):
    """FD checks: violating LHS count bounded by LHS cardinality;
    holds flag consistent; the PK-determined FD must hold."""
    rows = {r["fd"]: r for r in _run(spark, "catalog_fd_mining").collect()}
    for r in rows.values():
        assert 0 <= r["n_violating_lhs"] <= r["n_lhs_values"]
        assert r["holds"] == (1 if r["n_violating_lhs"] == 0 else 0)
    assert rows["nation: n_nationkey -> n_regionkey"]["holds"] == 1


def test_watermark_lateness_profile_mass(spark):
    """Lateness histogram: shares sum to 1, bucket 0 (on-time within
    10 min) exists, no negative buckets (watermark never runs behind
    an already-seen event)."""
    rows = _run(spark, "events_watermark_lateness_profile").collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    buckets = {r["late_bucket_10m"] for r in rows}
    assert 0 in buckets
    assert min(buckets) >= 0


def test_incremental_profile_merge_is_exact(spark):
    """The merged split profiles must equal the full scan bit-for-bit
    (the operator's own merge_exact flag)."""
    row = _run(spark, "catalog_incremental_profile_merge").collect()[0]
    assert row["merge_exact"] == 1


def test_dedup_aware_split_no_leakage(spark):
    """Near-dup clusters must never straddle the split, and the sides
    must partition the corpus."""
    rows = _run(spark, "mlprep_dedup_aware_split").collect()
    assert {r["side"] for r in rows} == {"train", "holdout"}
    for r in rows:
        assert r["n_leaky_clusters"] == 0
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_business_day_closed_form_exhaustive(spark):
    """The closed-form weekday count in date_business_days must equal
    brute-force enumeration for EVERY (starting weekday, span length)
    equivalence class: 7 distinct starting weekdays × lengths 1..60
    (covering zero, partial, exactly-one and multi full weeks, both
    with and without the Sunday wrap). The fixture oracle only proves
    the spans that occur in the data; this pins the formula itself."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.date(2024, 1, 1)  # a Monday
    grid = spark.createDataFrame(
        [(s, n) for s in range(7) for n in range(1, 61)],
        "start_off int, span int",
    )
    lo = F.date_add(F.lit(base), F.col("start_off"))
    hi = F.date_add(lo, F.col("span") - 1)
    n = F.datediff(hi, lo) + 1
    d0 = (F.dayofweek(lo) + 5) % 7
    rem = n % 7
    head = F.greatest(F.lit(0), F.least(rem, 5 - d0))
    wrap = F.greatest(F.lit(0), F.least(d0 + rem - 7, F.lit(5)))
    closed = F.floor(n / 7) * 5 + head + wrap
    got = {
        (r["start_off"], r["span"]): r["biz"]
        for r in grid.select("start_off", "span", closed.alias("biz")).collect()
    }
    for s in range(7):
        for span in range(1, 61):
            start = base + dt.timedelta(days=s)
            want = sum(
                1
                for i in range(span)
                if (start + dt.timedelta(days=i)).weekday() < 5
            )
            assert got[(s, span)] == want, (s, span, got[(s, span)], want)


def test_exact_jac_pairs_equals_bruteforce(spark):
    """_exact_jac_pairs (the inverted-index pair scorer every dedup
    diagnostic now routes through) must equal the quadratic
    brute-force scan on an adversarial synthetic corpus: tiny
    alphabet (hot shared grams), duplicated docs, subset docs,
    singleton docs with no overlap, and an empty-overlap isolate.
    Seeded PRNG → deterministic corpus."""
    import random

    from pyspark.sql import functions as F

    from datalakecrawler_spark.pipeline.dedup import _exact_jac_pairs

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]  # tiny alphabet → heavy sharing
    docs = []
    for i in range(40):
        k = rng.randint(1, 9)
        docs.append((i, sorted(set(rng.choices(vocab, k=k)))))
    docs.append((40, docs[3][1]))          # exact duplicate
    docs.append((41, docs[5][1][:1]))      # subset of another doc
    docs.append((42, ["zz_unique"]))       # isolate: shares nothing
    sh = spark.createDataFrame(
        [(i, g) for i, g in docs], "doc_id int, shingles array<string>"
    )
    tau = 0.3
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jac"], 9)
        for r in _exact_jac_pairs(sh, tau).collect()
    }
    want = {}
    for i, (ida, sa) in enumerate(docs):
        for idb, sb in docs[i + 1 :]:
            a, b = set(sa), set(sb)
            lo, hi = (ida, idb) if ida < idb else (idb, ida)
            j = len(a & b) / len(a | b)
            if j >= tau:
                want[(lo, hi)] = round(j, 9)
    assert got == want, (
        len(got), len(want),
        sorted(set(got) ^ set(want))[:5],
    )


def test_prefix_filter_pairs_equals_bruteforce(spark):
    """_prefix_filter_pairs (the AllPairs/PPJoin candidate path behind
    dedup_ngram_jaccard) must equal the quadratic brute-force scan on
    an adversarial synthetic corpus engineered against the prefix
    bound specifically: tiny alphabet so document frequencies TIE
    heavily (the rare-first global order then falls to the gram-text
    tie-break — a wrong tie-break silently drops candidates),
    duplicated docs, subset docs, size-filter boundary pairs, and an
    isolate. Two τ values cross the ceil() boundary of the prefix
    length both ways. Seeded PRNG → deterministic corpus."""
    import random

    from datalakecrawler_spark.pipeline.dedup import _prefix_filter_pairs

    rng = random.Random(20260815)
    vocab = [f"g{i}" for i in range(10)]  # heavy sharing → df ties
    docs = []
    for i in range(45):
        k = rng.randint(1, 8)
        docs.append((i, sorted(set(rng.choices(vocab, k=k)))))
    docs.append((45, docs[7][1]))            # exact duplicate
    docs.append((46, docs[11][1][:2] or docs[11][1]))  # subset doc
    docs.append((47, ["zz_isolate"]))        # shares nothing
    g = spark.createDataFrame(
        [(i, gr, len(gr)) for i, gr in docs],
        "doc_id int, grams array<string>, n int",
    )
    for tau in (0.5, 0.34):
        got = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
            for r in _prefix_filter_pairs(g, tau).collect()
        }
        want = {}
        for i, (ida, sa) in enumerate(docs):
            for idb, sb in docs[i + 1 :]:
                a, b = set(sa), set(sb)
                j = len(a & b) / len(a | b)
                if j >= tau:
                    want[(min(ida, idb), max(ida, idb))] = round(j, 6)
        assert got == want, (
            tau, len(got), len(want),
            sorted(set(got) ^ set(want))[:5],
        )


def test_shingled_matches_expression_form(spark):
    """_shingled / _shingled_k (the materialized-token-array builders
    the dedup family now routes through) must produce exactly the
    shingle sets of the original expression form — the O(len²) fix
    must be a pure evaluation-strategy change, not a semantic one.
    Includes docs shorter than k (empty shingle set) and repeated
    tokens (array_distinct path)."""
    from datalakecrawler_spark.pipeline.dedup import (
        _shingled,
        _shingled_k,
        _shingles,
    )

    rows = [
        (1, "a b c d e f g"),
        (2, "a a a a a a"),
        (3, "x y"),                      # shorter than k=5
        (4, "p q r s t p q r s t"),      # duplicate shingles
        (5, "solo"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    want = {
        r["doc_id"]: sorted(r["sh"])
        for r in d.select("doc_id", _shingles().alias("sh")).collect()
    }
    got = {
        r["doc_id"]: sorted(r["shingles"])
        for r in _shingled(d, "doc_id").collect()
    }
    assert got == want
    got2 = {
        r["doc_id"]: sorted(r["shingles"])
        for r in _shingled_k(d, 2, "doc_id").collect()
    }
    toks = {i: t.split(" ") for i, t in rows}
    want2 = {
        i: sorted({" ".join(t[j : j + 2]) for j in range(len(t) - 1)})
        for i, t in toks.items()
    }
    assert got2 == want2


def test_python_levenshtein_matches_duckdb(ddb):
    """The Python Levenshtein DP inside udf_edit_similarity_linkage
    must equal DuckDB's native levenshtein on adversarial strings —
    the exact bug class that killed the Jaro-Winkler op (VERDICT r2
    What's-wrong §3) was an implementation divergence invisible on
    textbook pairs: repeated characters, empty strings, 1-char
    strings, prefix/suffix overlaps. Seeded PRNG over a tiny alphabet
    maximizes repeats."""
    import random

    from datalakecrawler_spark.udfs import _lev as lev

    rng = random.Random(20260815)
    cases = [("", ""), ("", "a"), ("a", "a"), ("a", "b"),
             ("aaaa", "aa"), ("abab", "baba"), ("Supplier#000000012",
             "Customer#000001204")]
    for _ in range(200):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        a = "".join(rng.choices("abc#01", k=la))
        b = "".join(rng.choices("abc#01", k=lb))
        cases.append((a, b))
    for a, b in cases:
        want = ddb.execute(
            "select levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert lev(a, b) == want, (a, b, lev(a, b), want)


def test_lev_batch_matches_scalar():
    """The numpy batch-lane Levenshtein (_lev_batch, the hot path in
    udf_edit_similarity_linkage) must equal the scalar DP (_lev,
    itself pinned against DuckDB above) pair-for-pair on a corpus
    engineered for its failure modes: empty strings, pairs much
    shorter than the batch max (garbage-lane isolation), repeated
    characters, and length skew inside one batch."""
    import random

    from datalakecrawler_spark.udfs import _lev, _lev_batch

    rng = random.Random(20260815)
    a_list, b_list = [], []
    for la, lb in [(0, 0), (0, 7), (7, 0), (1, 1), (1, 25), (25, 1)]:
        a_list.append("".join(rng.choices("ab#0", k=la)))
        b_list.append("".join(rng.choices("ab#0", k=lb)))
    for _ in range(300):
        a_list.append(
            "".join(rng.choices("abc#01", k=rng.randint(0, 25)))
        )
        b_list.append(
            "".join(rng.choices("abc#01", k=rng.randint(0, 25)))
        )
    got = _lev_batch(a_list, b_list)
    for k, (a, b) in enumerate(zip(a_list, b_list)):
        assert got[k] == _lev(a, b), (a, b, got[k], _lev(a, b))
    assert len(_lev_batch([], [])) == 0
