"""Registry-wide global-window plan lint (r5, VERDICT r4 §4).

SCALE.md states the rule — no data-proportional single-partition
windows anywhere in the registry (distrank.py is the replacement) —
and until r5 only discipline enforced it. This test walks the physical
plan of EVERY registered query at sf0.001 via
``plans.explain.global_window_findings`` and fails on any global
window (empty partitionSpec) whose input the lint cannot prove bounded
(limit/TakeOrdered below it, WindowGroupLimit prune, or the distrank
``__pid`` offset table).

Boundedness that is semantic rather than structural — a frame whose
row count is fixed by the CALENDAR (per-day/month rollups), by a
CATEGORY domain (contingency cells, language/bin/grid keys), or by a
design constant — cannot be detected from the plan, so those queries
are allowlisted BY NAME with the reason, exactly the shape VERDICT r4
asked for. The test is two-sided: an un-allowlisted finding fails it,
and an allowlist entry that stops flagging fails it too (stale
entries would silently widen the exemption).
"""

from __future__ import annotations

import datalakecrawler_spark.contract  # noqa: F401 — populate registry
from datalakecrawler_spark import registry
from datalakecrawler_spark.plans.explain import global_window_findings

PLAN_SF_DIR = "/root/testdata/sf0.001"

# name -> why its global window is NOT data-proportional. Every frame
# below has a row count that does not grow with the data volume:
# calendar spans, category/bin domains, or a layout constant.
ALLOWED_GLOBAL_WINDOWS: dict[str, str] = {
    # -- calendar-bounded frames (per-day / per-month / per-week
    #    rollups precede the window; span grows with time, not bytes)
    "events_anomaly_zscore": "per-day aggregate frame",
    "events_cumulative_reach": "per-day aggregate frame",
    "events_cusum_changepoint": "per-day aggregate frame",
    "orders_aov_decomposition": "per-month aggregate frame",
    "orders_seasonality_index": "per-month aggregate frame",
    "orders_survival_km": "weeks-to-event frame (calendar span)",
    "ts_acf": "per-day series frame",
    "ts_ccf_view_purchase": "per-day series frame",
    "ts_dominant_period": "per-day series frame",
    "ts_exp_smoothing": "per-month series frame",
    "ts_forecast_combination": "per-month series frame",
    "ts_gapfill_ffill": "per-day series frame",
    "ts_max_drawdown": "per-day series frame",
    "ts_pattern_vshape": "per-day series frame",
    "ts_peak_detection": "per-day series frame",
    "ts_record_days": "per-day series frame",
    "ts_rolling_median_band": "per-day series frame",
    "ts_rolling_slope": "per-day series frame",
    "ts_seasonal_naive_error": "per-month series frame",
    "ts_theil_sen_trend": "per-month series frame",
    "ts_yoy_growth": "per-month series frame",
    "win_moving_avg": "per-day aggregate frame (contract F6)",
    "win_running_sum": "per-day aggregate frame (contract F5)",
    "win_period_growth": "per-month aggregate frame",
    "catalog_temporal_coverage_gaps": "distinct-day frame",
    # -- category/bin-bounded frames (domain fixed by schema/config,
    #    not by row count)
    "agg_pct_of_parent": "region/nation dimension frame (fixed dims)",
    "customer_nation_segment_mix": "nation x segment cells",
    "customer_quadrant_analysis": "quadrant cells",
    "events_daypart_mix": "daypart x event-type cells",
    "events_transition_entropy": "event-type-pair cells",
    "events_watermark_lateness_profile": "lateness-bucket cells",
    "stats_chi2_independence": "contingency cells",
    "stats_cramers_v": "contingency cells",
    "stats_mutual_information": "contingency cells",
    "stats_fdr_bh": "hourly hypothesis family (24 tests)",
    "text_anova_two_way": "factor cells",
    "text_lang_distribution": "language cells",
    "corpus_mixture_balance": "language cells",
    "corpus_source_league_table": "source-dimension league rows",
    "catalog_drift_psi": "decile-bin cells",
    "catalog_benford_audit": "9 leading-digit cells",
    "geo_grid_density": "grid cells (resolution-bounded)",
    "feature_label_encode": "distinct label vocabulary (design-bounded)",
    # -- layout-constant frames
    "sink_sorted_layout": "file-span frame of the registered 4-file layout",
}


def test_no_unjustified_global_windows_or_cartesians(spark):
    flagged: dict[str, list[str]] = {}
    cartesian: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, q in registry.all_queries().items():
        try:
            f = global_window_findings(
                q.fn(spark, PLAN_SF_DIR), flag_cartesian=True
            )
        except Exception as ex:  # a query that cannot build is a bug too
            errors[name] = repr(ex)[:200]
            continue
        carts = [x for x in f if x.startswith("CartesianProductExec")]
        wins = [x for x in f if not x.startswith("CartesianProductExec")]
        if carts:
            cartesian[name] = carts
        if wins:
            flagged[name] = wins
    assert not errors, f"queries failed to build a plan: {errors}"
    # gate 2 (r5): the registry is CartesianProduct-free — bounded
    # grids broadcast one side (BroadcastNestedLoopJoin). No allowlist.
    assert not cartesian, f"CartesianProductExec in registered plans: {cartesian}"
    rogue = {n: f for n, f in flagged.items() if n not in ALLOWED_GLOBAL_WINDOWS}
    assert not rogue, (
        "data-proportional single-partition window(s) outside the "
        f"allowlist — convert via distrank.py or justify here: {rogue}"
    )
    stale = sorted(set(ALLOWED_GLOBAL_WINDOWS) - set(flagged))
    assert not stale, (
        "allowlist entries that no longer flag (remove them so the "
        f"exemption stays tight): {stale}"
    )
