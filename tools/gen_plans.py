"""Regenerate PLANS.md: the executed physical plan + audit summary for
every headline benchmark query, so the scale-critical plan properties
(pushdown, broadcasts, shuffle keys, codegen) are reviewable without
running Spark. Run: python tools/gen_plans.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import datalakecrawler_spark as dlc  # noqa: E402
import datalakecrawler_spark.io as io  # noqa: E402
from datalakecrawler_spark.plans.explain import audit  # noqa: E402
from datalakecrawler_spark.session import get_spark  # noqa: E402
from tests.test_inventory import HEADLINE  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

HEADER = """# PLANS — executed physical plans of the headline benchmark suite

Auto-generated (`python tools/gen_plans.py`) at sf0.001 with the fixture
cache disabled, so scans show real `PushedFilters`/`ReadSchema`. These
are the plans the bench suite executes; tests/test_plans.py pins the
load-bearing properties so they cannot silently regress.

Summary legend: joins seen in the final (AQE) plan; shuffle keys =
distinct `hashpartitioning` columns; python = whether any stage crosses
into a Python worker.
"""


def main() -> None:
    spark = get_spark()
    io._CACHE_ON = False
    spark.catalog.clearCache()
    io._CACHE.clear()
    out = [HEADER]
    for name in sorted(HEADLINE):
        df = dlc.registry.all_queries()[name].fn(spark, SF_DIR)
        df.collect()
        a = audit(df)
        keys = sorted(
            {m.split("#")[0] for m in re.findall(r"hashpartitioning\((\w+)", a.text)}
        )
        out.append(f"\n## {name}\n")
        out.append(
            f"- joins: {sorted(set(a.joins)) or 'none'}; shuffle keys: "
            f"{keys or 'none'}; codegen stages: {a.n_codegen_stages}; "
            f"python: {a.has_python_eval}\n"
        )
        pushed = [p for p in a.pushed_filters if p]
        if pushed:
            out.append("- pushed filters: " + "; ".join(sorted(set(pushed))[:4]) + "\n")
        # keep the plan section compact: drop the verbose per-node
        # details block, keep the tree + scan summaries
        tree = a.text.split("\n\n")[0]
        out.append("\n```\n" + tree.strip()[:4000] + "\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print(f"wrote PLANS.md: {len(HEADLINE)} plans")


if __name__ == "__main__":
    main()
