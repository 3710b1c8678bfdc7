#!/usr/bin/env python
"""Benchmark harness — runs the headline query suite (the 8 BASELINE.md
queries) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors BASELINE.md: per query, one cold run then 3+ warm
re-executions of the prepared plan; report min warm; `value` is the
warm suite total, which is what the 2× criterion tracks (per-query JVM
overhead cannot amortize inside a 10 ms query — BASELINE.md "How the
2× criterion is applied"). Since r10 the whole suite runs
N_SUITE_PASSES times in one process and `queries`/`replan_queries`
carry per-query minima across passes (pass-1-only numbers are kept as
`queries_pass1`/`replan_queries_pass1`), and the payload stamps the
run's /proc/stat steal share — this box's hypervisor steals CPU in
multi-second windows that loadavg cannot see (VERDICT r9 #3), and the
cross-pass minimum is what makes one contended window unable to own
the reported numbers. Three companion totals are stamped:
`replan_total_sec` (a second plan construction per query — Python
build + Catalyst analyze/optimize/physical — gated against a 20 s
budget), `cold_exec_total_sec` (executing that fresh plan instance,
i.e. one-shot cost without shuffle-stage reuse), and trust signals
(start-load wait, a start/end control probe, per-query rep spread).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_star_join",
    "topk_per_group_window",
    "distinct_users_daily",
    "doc_wordcount",
    "embedding_topk_cosine",
    "rollup_order_priority",
    "semi_anti_join",
    # extended suite — measured in BASELINE.md alongside the original 8
    "q8_market_share",
    "q21_waiting_suppliers",
    "text_tfidf_topterms",
    "events_rolling_active_users",
    "orders_market_basket",
    "catalog_column_correlation",
    # round-2 additions — measured in BASELINE.md "Round-2 additions"
    "win_trending_parts",
    "orders_cohort_ltv",
    # drift/retrieval/chunking additions — BASELINE.md third table
    "catalog_drift_psi",
    "search_rrf_fusion",
    "dedup_cdc_chunks",
    # stats/graph/retrieval additions — BASELINE.md fourth table
    "search_bm25",
    "graph_pagerank",
    "graph_triangle_count",
    "stats_spearman_corr",
    "stats_covariance_matrix",
    "stats_mutual_information",
    "events_power_user_curve",
    # geo/linkage/collocation/walk additions — BASELINE.md fifth table
    "geo_haversine_nn",
    "dedup_fellegi_sunter",
    "text_collocation_llr",
    "graph_random_walks",
    "dedup_duplicate_spans",
    "mlprep_pack_concat_chunks",
]

# DuckDB warm ms at sf0.1 from BASELINE.md (measured 2026-08-13/14) —
# carried into the JSON so BENCH_r{N} is self-contained next to the
# per-query table and the suite-amortization argument (VERDICT r1 §10).
BASELINE_WARM_MS = {
    "q1_pricing_summary": 75, "q3_star_join": 191,
    "topk_per_group_window": 10, "distinct_users_daily": 72,
    "doc_wordcount": 29, "embedding_topk_cosine": 10,
    "rollup_order_priority": 31, "semi_anti_join": 23,
    "q8_market_share": 54, "q21_waiting_suppliers": 86,
    "text_tfidf_topterms": 96, "events_rolling_active_users": 64,
    "orders_market_basket": 111, "catalog_column_correlation": 58,
    "win_trending_parts": 219, "orders_cohort_ltv": 92,
    "catalog_drift_psi": 22, "search_rrf_fusion": 31,
    "dedup_cdc_chunks": 639, "search_bm25": 72, "graph_pagerank": 2354,
    "graph_triangle_count": 573, "stats_spearman_corr": 600,
    "stats_covariance_matrix": 54, "stats_mutual_information": 34,
    "events_power_user_curve": 7, "geo_haversine_nn": 137,
    "dedup_fellegi_sunter": 666, "text_collocation_llr": 103,
    "graph_random_walks": 1972,
    "dedup_duplicate_spans": 1309, "mlprep_pack_concat_chunks": 52,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from datalakecrawler_spark import registry
    from datalakecrawler_spark.session import get_spark

    spark = get_spark("dlc-bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    def _load() -> float | None:
        try:
            return float(open("/proc/loadavg").read().split()[0])
        except Exception:
            return None

    def _cpu_jiffies() -> tuple[int, int] | None:
        """(steal, total) jiffies from the aggregate /proc/stat cpu line.
        Steal is field 8 (0-indexed col 8 after the 'cpu' tag) — time the
        hypervisor ran someone else while this guest was runnable. The
        r9 postmortem (VERDICT r9 'What's wrong' #3) showed ~35 % steal
        with guest loadavg < 0.5: loadavg-based trust alone cannot see
        the host's dominant noise source, so the payload now carries the
        start→end steal share of the run itself."""
        try:
            parts = open("/proc/stat").readline().split()
            vals = [int(x) for x in parts[1:]]
            steal = vals[7] if len(vals) > 7 else 0
            return steal, sum(vals)
        except Exception:
            return None

    # stamp BEFORE the suite runs: bench itself drives 32 threads, so a
    # post-run reading mostly measures bench's own footprint, not the
    # external background load the noise protocol gates on.
    #
    # Trust gate (VERDICT r5 §2): BENCH_r05 was recorded at load 2.29,
    # above the BASELINE.md noise-protocol threshold of 1.5, and
    # nothing in the payload said so. Now bench WAITS for the box to
    # go quiet (up to ~2 min, re-reading every 10 s) and, if it never
    # does, runs anyway but stamps trusted=false so a loaded run can
    # never masquerade as a clean number.
    TRUST_LOAD = 1.5
    jiffies_start = _cpu_jiffies()
    load_start = _load()
    waited = 0
    while load_start is not None and load_start >= TRUST_LOAD and waited < 120:
        time.sleep(10)
        waited += 10
        load_start = _load()
    trusted = load_start is None or load_start < TRUST_LOAD

    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    replan_times: dict[str, float] = {}
    cold_exec_times: dict[str, float] = {}
    replan_total = 0.0

    def _warm_reps(df, reps: int = 3) -> list[float]:
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.collect()
            out.append(time.perf_counter() - t0)
        return out

    control_df = None
    control_before = None
    prepared: dict = {}  # name -> prepared plan, for the extra suite passes
    for name in names:
        # prepared-statement protocol: build/analyze the plan once, time
        # the re-execution (BASELINE's DuckDB warm runs similarly re-run
        # an already-parsed query; Catalyst analysis is the analogue).
        # Warm time = best of 3 re-executions: this box shares cores
        # with the build harness (~2 load floor), and min-of-N is the
        # standard way to report the query's own cost, not the noise.
        df = qs[name](spark, sf_dir)
        prepared[name] = df
        df.collect()  # cold run: analysis + codegen + cache warm-up
        reps = _warm_reps(df)
        # Noise re-probe (VERDICT r7 §3): a contended box inflates even
        # the min-of-3 (r7: search_bm25 49 ms quiet vs 168 ms official).
        # If the reps disagree badly, take 3 more — a transient spike
        # then cannot own the reported number; sustained contention
        # still shows as a wide spread, which the trust stamp reads.
        if min(reps) > 0 and (max(reps) - min(reps)) / min(reps) > 0.75:
            reps += _warm_reps(df)
        times[name] = round(min(reps), 4)
        spreads[name] = round(
            (max(reps) - min(reps)) / max(min(reps), 1e-9), 2
        )
        if control_df is None:
            # contention control probe: keep the first query's prepared
            # plan and its warm time; re-timing the identical plan at
            # suite END detects contention that ARRIVED mid-run (the r7
            # failure mode: start load 1.33 → end 7.67, 26/32 warm
            # numbers inflated, stamp still 'trusted').
            control_df = df
            control_before = times[name]
        # replan variant: a SECOND plan construction for the same query
        # — Python DataFrame build + Catalyst analysis + optimization +
        # physical planning, i.e. everything a long-lived service pays
        # to re-issue a registered query. Phase profiling (r8, quiet
        # box) showed the r7 formulation — which also re-EXECUTED the
        # fresh plan — was measuring shuffle re-materialization, not
        # replanning: for geo_haversine_nn analysis was 2 ms, optimize
        # 49 ms, physical 19 ms, execution 1.4 s (the same execution the
        # warm metric above already times, minus shuffle-stage reuse).
        # So the budget now gates the planning phases, and the fresh
        # execution is reported separately as cold_exec (nothing is
        # hidden — both totals are in the payload).
        t0 = time.perf_counter()
        fresh = qs[name](spark, sf_dir)
        qe = fresh._jdf.queryExecution()
        qe.analyzed()
        qe.optimizedPlan()
        qe.executedPlan()
        replan_times[name] = round(time.perf_counter() - t0, 4)
        replan_total += replan_times[name]
        # cold-exec variant: execute the freshly planned instance — no
        # shuffle-stage reuse, so this is the one-shot cost of the
        # query (codegen compile + full stage execution included).
        t0 = time.perf_counter()
        fresh.collect()
        cold_exec_times[name] = round(time.perf_counter() - t0, 4)

    # Multi-pass minima (VERDICT r9 'Next round' #2): this host's
    # hypervisor steals CPU in multi-second windows that a single
    # suite pass — even with min-of-3 back-to-back reps per query —
    # sits entirely inside (r9: four same-tree runs spanned 2.01–5.46 s
    # warm total). Re-running the WHOLE suite ≥2 more times spreads
    # each query's reps across minutes, so a steal window can inflate
    # one pass's numbers but not the per-query minimum across passes.
    # Pass 1 above is the unchanged original methodology (cold run,
    # 3+ warm reps, replan, cold-exec, control probe); the extra
    # passes only add warm re-executions and fresh replans of the
    # same prepared plans, and the pass-1 numbers are kept in the
    # payload (queries_pass1 / replan_queries_pass1) so every round's
    # bench remains comparable to the old single-pass protocol.
    N_SUITE_PASSES = 3
    times_pass1 = dict(times)
    replan_pass1 = dict(replan_times)
    for _pass in range(2, N_SUITE_PASSES + 1):
        for name in names:
            reps = _warm_reps(prepared[name])
            if min(reps) > 0 and (max(reps) - min(reps)) / min(reps) > 0.75:
                reps += _warm_reps(prepared[name])
            if min(reps) < times[name]:
                times[name] = round(min(reps), 4)
            t0 = time.perf_counter()
            fresh = qs[name](spark, sf_dir)
            qe = fresh._jdf.queryExecution()
            qe.analyzed()
            qe.optimizedPlan()
            qe.executedPlan()
            replan_rep = round(time.perf_counter() - t0, 4)
            if replan_rep < replan_times[name]:
                replan_times[name] = replan_rep
    replan_total = sum(replan_times.values())

    total = round(sum(times.values()), 4)
    cold_exec_total = round(sum(cold_exec_times.values()), 4)
    # Replan budget (VERDICT r6 "Next round" §5): cold-plan cost grows
    # with query complexity, not registry size (closures are built per
    # call), but the suite's replan total is the closest thing to a
    # planning-regression ceiling — stamp it against a hard budget so
    # a blowup is machine-visible in BENCH_r{N}, not just prose.
    REPLAN_BUDGET_SEC = 20.0
    replan_ok = replan_total < REPLAN_BUDGET_SEC
    baseline_total = round(
        sum(BASELINE_WARM_MS[n] for n in names if n in BASELINE_WARM_MS) / 1000, 4
    )
    # noise stamps (VERDICT r4 §2): this box shares cores with a
    # periodic background harness; a START load ≳1.5 means the warm
    # numbers are untrustworthy and should be re-run idle. The END
    # stamp bounds whether the background cycle returned mid-run
    # (bench's own threads inflate it too — interpret loosely).
    load_1min = load_start
    load_end = _load()
    # steal share of the whole run (start→end, all-CPU): the dominant
    # noise source on this box, invisible to loadavg (r9 postmortem).
    jiffies_end = _cpu_jiffies()
    steal_pct = None
    if jiffies_start is not None and jiffies_end is not None:
        dtot = jiffies_end[1] - jiffies_start[1]
        if dtot > 0:
            steal_pct = round(
                100.0 * (jiffies_end[0] - jiffies_start[0]) / dtot, 2
            )
    STEAL_PCT_MAX = 10.0
    # Trust stamp, tightened (VERDICT r7 §3): r7's official run started
    # at load 1.33 (→ trusted) but ended at 7.67 — external contention
    # arrived mid-run and inflated 26/32 warm numbers, and the stamp
    # never noticed. Raw end-load cannot gate this: bench's OWN
    # cold-exec phase runs 32-thread stages right before the reading
    # (measured 4.97 on a box that started at 1.41), so loadavg at end
    # mostly reflects bench itself. Two self-calibrating signals do:
    #  - control probe: the first query's prepared plan re-timed at
    #    suite end — same plan, same shuffle reuse, so any slowdown is
    #    the box, not the query;
    #  - per-query rep spread: sustained contention makes the 3-6 warm
    #    reps of many queries disagree; if >1/4 of the suite has
    #    (max-min)/min > 1.0 even after the re-probe, the run is noisy.
    CONTROL_DRIFT_MAX = 2.5
    control_after = (
        round(min(_warm_reps(control_df)), 4) if control_df is not None else None
    )
    control_drift = (
        round(control_after / control_before, 2)
        if control_after is not None and control_before
        else None
    )
    noisy = sorted(n for n, s in spreads.items() if s > 1.0)
    trusted = (
        trusted
        and (control_drift is None or control_drift <= CONTROL_DRIFT_MAX)
        and len(noisy) <= len(names) // 4
        and (steal_pct is None or steal_pct <= STEAL_PCT_MAX)
    )
    ratios = {
        n: round(times[n] / (BASELINE_WARM_MS[n] / 1000), 2)
        for n in names
        if n in BASELINE_WARM_MS and BASELINE_WARM_MS[n]
    }
    worst3 = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:3])
    payload = (
            {
                "metric": "headline_suite_warm_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "n_queries": len(names),
                "replan_total_sec": round(replan_total, 4),
                "replan_budget_sec": REPLAN_BUDGET_SEC,
                "replan_within_budget": replan_ok,
                "replan_queries": replan_times,
                "n_suite_passes": N_SUITE_PASSES,
                "queries_pass1": times_pass1,
                "replan_queries_pass1": replan_pass1,
                "pass_protocol": (
                    "queries/replan_queries are per-query minima across "
                    "n_suite_passes full suite passes in one process "
                    "(pass 1 = the original cold+3-warm-rep protocol, "
                    "kept verbatim in *_pass1); multi-second host-steal "
                    "windows inflate one pass, not the cross-pass min"
                ),
                "replan_measures": (
                    "python build + catalyst analyze/optimize/physical "
                    "per fresh plan instance; execution of the fresh "
                    "instance is cold_exec_* (separate, untruncated)"
                ),
                "cold_exec_total_sec": cold_exec_total,
                "cold_exec_queries": cold_exec_times,
                "warm_rep_spreads": spreads,
                "noisy_queries": noisy,
                "baseline_warm_total_sec": baseline_total,
                "suite_ratio_vs_baseline": round(total / baseline_total, 4)
                if baseline_total
                else None,
                "load_1min": load_1min,
                "load_1min_end": load_end,
                "steal_pct": steal_pct,
                "steal_pct_max": STEAL_PCT_MAX,
                "trusted": trusted,
                "trust_load_threshold": TRUST_LOAD,
                "control_query": names[0] if names else None,
                "control_warm_start_sec": control_before,
                "control_warm_end_sec": control_after,
                "control_drift": control_drift,
                "control_drift_max": CONTROL_DRIFT_MAX,
                "waited_for_quiet_sec": waited,
                "worst3_vs_baseline": worst3,
                "baseline_queries_ms": {
                    n: BASELINE_WARM_MS[n] for n in names if n in BASELINE_WARM_MS
                },
                "note": (
                    "2x criterion applied per-suite (BASELINE.md 'How the 2x "
                    "criterion is applied'): the fixed ~30-50 ms Spark action "
                    "floor cannot amortize inside sub-100 ms queries, so "
                    "individual tiny-query ratios above 2x with a flat "
                    "pushed-down plan are overhead-bound, not plan defects. "
                    "search_rrf_fusion joined that class in r8: its fusion "
                    "SortMergeJoin was replaced by a union+max-aggregate "
                    "(no sorts, one tiny exchange); the remaining time is "
                    "two ranker legs at the job floor — a bare collect of a "
                    "1-partition cached 2000-row scan measured 61 ms on the "
                    "same box vs 147 ms for the whole fused query."
                ),
            }
    )
    # Sidecar (VERDICT r2 §4): the FULL payload lives in a file so the
    # bench evidence can never be clipped.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(payload, f, indent=1)
    # stdout carries ONE COMPACT line (VERDICT r4 §2a): the driver's
    # capture keeps only a ~2000-char tail, and the full payload
    # (~4 KB) never parsed — BENCH_r01..r04 all show "parsed": null.
    # Keep the contract fields + per-query warm times (3 decimals),
    # push everything else to the sidecar, and verify the budget.
    compact = {
        "metric": "headline_suite_warm_total",
        "value": total,
        "unit": "sec",
        "queries": {n: round(t, 3) for n, t in times.items()},
        "sf": float(sf),
        "n_queries": len(names),
        "replan_total_sec": round(replan_total, 2),
        "replan_within_budget": replan_ok,
        "cold_exec_total_sec": round(cold_exec_total, 2),
        "baseline_warm_total_sec": baseline_total,
        "suite_ratio_vs_baseline": payload["suite_ratio_vs_baseline"],
        "load_1min": load_1min,
        "load_end": load_end,
        "steal_pct": steal_pct,
        "n_passes": N_SUITE_PASSES,
        "control_drift": control_drift,
        "trusted": trusted,
        "worst3_vs_baseline": worst3,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # stay inside the capture tail with margin
        compact.pop("queries")
        compact["queries_in"] = "BENCH_DETAIL.json"
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
