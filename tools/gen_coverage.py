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

Round 4 promoted every promotable op (sinks/crawls/txlog via the
verdict-boolean or literal-outcome patterns; filesystem outcomes proved
deterministic). What remains is genuinely un-oracle-able:

- `mm_decode_stub`, `mm_image_resize_stub`, `mm_frame_sample`,
  `mm_audio_frame_features` — operate on BINARY media payloads
  synthesized in-op (BMP pixel buffers, WAV PCM); DuckDB has no
  equivalent codec surface to recompute the features from the same
  bytes. Byte-level truth is pinned instead by
  `tests/test_multimodal_bytes.py` (hand-computed pixels/samples).
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
