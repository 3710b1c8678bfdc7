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
total += """
## Why each remaining rows-only op is rows-only

Round 4 promoted every sink/crawl/txlog op (verdict-boolean /
literal-outcome patterns); round 5 promoted the four binary-codec ops
(`mm_decode_stub`, `mm_image_resize_stub`, `mm_frame_sample`,
`mm_audio_frame_features`) by teaching the oracle byte-level access —
DuckDB's `hex(encode(text))` exposes the same utf-8 bytes Spark's
codecs consume, so the SQL twins regenerate the synthesized payloads
(BMP pixel cycles, PCM sample formulas) and hash-match the decoded
features bit-for-bit; frame payloads cross the canonicalizer as
md5-over-hex digests (raw BLOB reprs differ between engines). What
remains is genuinely un-oracle-able:

- `mm_embed_pca` — eigendecomposition of the Gram matrix (LAPACK);
  eigenvector sign/order and iterative convergence are not
  reproducible as portable SQL. Variance-accounting and
  reconstruction-error invariants are pytest-pinned.
- `sim_ann_brp_lsh` — Spark-ML's BucketedRandomProjectionLSH draws
  hyperplanes from JVM RNG state that no other engine can replay
  (unlike the hand-rolled md5-derived `dedup_embedding_rplsh`, which
  IS oracle-checked end-to-end). Kept to cover the MLlib surface;
  recall vs the exact brute-force result is pytest-pinned.
"""
with open("/root/repo/COVERAGE.md", "w") as f:
    f.write(HEADER + "\n".join(rows) + "\n" + total)
print(f"wrote COVERAGE.md: {len(qs)} queries, {n_oracle} oracle")
