"""Regenerate COVERAGE.md from the registry + test_inventory's SURVEY/HEADLINE sets."""
import sys

sys.path.insert(0, "/root/repo")
import datalakecrawler_spark as dlc
from tests.test_inventory import HEADLINE, SURVEY_INVENTORY

HEADER = """# COVERAGE — SURVEY.md §2 inventory → registered queries

Auto-generated from `datalakecrawler_spark.registry` (guarded by
`tests/test_inventory.py`; regenerate with `python tools/gen_coverage.py`).
Check kind: **oracle** = DuckDB hash-match at sf0.01 (driver t2);
**rows-only** = executed + semantics-tested in pytest
(approximate/engine-specific/binary ops).

| group | query | check | in SURVEY §2 | headline |
| --- | --- | --- | --- | --- |
"""

qs = dlc.registry.all_queries()
rows = []
for name, q in sorted(qs.items(), key=lambda kv: (kv[1].group, kv[0])):
    check = "oracle" if q.oracle else "rows-only"
    in_survey = "§2" if name in SURVEY_INVENTORY else "ext"
    head = "bench" if name in HEADLINE else ""
    rows.append(f"| {q.group} | `{name}` | {check} | {in_survey} | {head} |")

n_oracle = sum(1 for q in qs.values() if q.oracle)
total = (
    f"\n**Totals: {len(qs)} queries — {n_oracle} oracle-checked, "
    f"{len(qs) - n_oracle} rows-only; "
    f"{len(SURVEY_INVENTORY & set(qs))}/{len(SURVEY_INVENTORY)} SURVEY §2 rows covered; "
    f"{len(HEADLINE)} headline benchmark queries.**\n"
)
with open("/root/repo/COVERAGE.md", "w") as f:
    f.write(HEADER + "\n".join(rows) + "\n" + total)
print(f"wrote COVERAGE.md: {len(qs)} queries, {n_oracle} oracle")
