"""Semantics tests for rows-only pipeline operators — the ones the
DuckDB oracle can't check (approximate / engine-specific / binary)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakecrawler_spark import registry
from tests.conftest import SF_DIR


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF_DIR)


def test_ivf_recall_vs_bruteforce(spark):
    """IVF probes 3/10 buckets → its top-10 must overlap the exact
    top-10 reasonably; every returned pair must be exact-correct (the
    sim values are true dot products, only coverage is approximate)."""
    exact = {r["vec_id"]: r["sim"] for r in _run(spark, "sim_topk_query").collect()}
    ivf = {r["vec_id"]: r["sim"] for r in _run(spark, "sim_topk_ivf").collect()}
    assert len(ivf) == 10
    # sims of overlapping ids must agree exactly (same dot, same rounding)
    for vid in set(exact) & set(ivf):
        assert exact[vid] == ivf[vid]
    recall = len(set(exact) & set(ivf)) / 10
    assert recall >= 0.2, f"IVF recall@10 collapsed: {recall}"


def test_simhash_identical_docs_collide(spark):
    """Exact duplicates (from dedup_exact) must land in the same simhash
    band bucket — signature is a pure function of token content."""
    dup_groups = _run(spark, "dedup_exact").collect()
    if not dup_groups:
        return
    buckets = _run(spark, "dedup_simhash").collect()
    bucket_sets = [set(r["doc_ids"]) for r in buckets]
    # take one known-duplicate pair and assert same bucket
    from datalakecrawler_spark.io import load

    d = load(spark, SF_DIR, "documents")
    key = F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("k")
    pairs = (
        d.select("doc_id", key)
        .groupBy("k")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(5)
        .collect()
    )
    for row in pairs:
        a, b = row["ids"][0], row["ids"][1]
        assert any(a in s and b in s for s in bucket_sets), (
            f"exact dups {a},{b} not in any shared simhash bucket"
        )


def test_minhash_lsh_matches_bruteforce(spark):
    """LSH recall check: the banded MinHash pipeline must return exactly
    the pairs a quadratic shingle-Jaccard scan finds at τ=0.8 (the
    (1-J²)³² miss bound makes a real miss a ~1e-14 event)."""
    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.dedup import _TAU, _shingles

    near = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _run(spark, "dedup_near_minhash").collect()
    }
    d = load(spark, SF_DIR, "documents").where(
        F.size(F.split("text", " ")) >= 3
    )
    sh = d.select("doc_id", _shingles().alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) * 1.0 / F.size(
        F.array_union("sh_a", "sh_b")
    )
    brute = {
        (r["doc_a"], r["doc_b"]): r["j"]
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("j", F.round(jac, 6))
        .where(jac >= _TAU)
        .collect()
    }
    assert near == brute, (
        f"LSH missed {set(brute) - set(near)} / invented {set(near) - set(brute)}"
    )


def test_decode_stub_shape(spark):
    """mapInPandas decode: one row per doc, dimensions exactly match
    the deterministic synth scheme, real BT.601 luma in range."""
    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.multimodal import bmp_dims

    rows = _run(spark, "mm_decode_stub").collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    for r in rows[:50]:
        assert (r["width"], r["height"]) == bmp_dims(r["doc_id"])
        assert 0 <= r["mean_luma"] <= 255


def test_frame_sample_expands_rows(spark):
    """Frame sampler is row-expanding with stride-4 indices, ≤256B
    frames, and content-exact digests (md5 over the frame's uppercase
    hex — the engine-portable form the DuckDB oracle reproduces)."""
    import hashlib

    from datalakecrawler_spark.io import load

    df = _run(spark, "mm_frame_sample")
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["frame_idx"] % 4 == 0 for r in rows)
    assert all(0 <= r["frame_len"] <= 256 for r in rows)
    # re-derive one doc's first frame digest independently
    doc = load(spark, SF_DIR, "documents").where(F.col("doc_id") == 0).first()
    payload = doc["text"].encode("utf-8")
    frame = payload[:256]
    want = hashlib.md5(frame.hex().upper().encode()).hexdigest()
    got = {r["frame_idx"]: r for r in rows if r["doc_id"] == 0}
    assert got[0]["frame_md5"] == want
    assert got[0]["frame_len"] == len(frame)


def test_approx_distinct_close_to_exact(spark):
    """HLL estimate within tolerance of the exact NDV per day: the op
    emits the exact count plus the Spark-computed verdict (the sketch
    value itself is engine-specific and left out of the hashed output);
    the raw estimate is re-derived here and held to a tighter 10%."""
    rows = _run(spark, "agg_approx_distinct").collect()
    assert rows and all(r["approx_ok"] for r in rows)
    from datalakecrawler_spark.io import load

    e = load(spark, SF_DIR, "events")
    both = {
        r["day"]: (r["u"], r["a"])
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.approx_count_distinct("user_id", 0.05).alias("a"),
        )
        .collect()
    }
    exact_from_op = {r["day"]: r["exact_users"] for r in rows}
    for day, (u, a) in both.items():
        assert exact_from_op[day] == u
        assert abs(a - u) / u < 0.10


def test_rplsh_subset_of_exact_pairs(spark):
    """RP-LSH near-dup: perfect precision (every pair real, sims exact),
    calibrated recall vs the exact all-pairs scan."""
    lsh = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in _run(spark, "dedup_embedding_rplsh").collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in _run(spark, "sim_pairwise_dups").collect()
    }
    assert set(lsh) <= set(exact), f"false positives: {set(lsh) - set(exact)}"
    for pair, sim in lsh.items():
        assert sim == exact[pair]
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.15, f"RP-LSH recall collapsed: {recall:.2f}"


def test_sample_stratified_deterministic_and_plausible(spark):
    """Same seed → identical verdicts; en within the 3σ binomial band,
    other strata kept whole (frac=1.0 ⇒ bound 0 ⇒ exact equality is
    what sample_ok asserts for them)."""
    a = {
        r["lang"]: (r["n_total"], r["sample_ok"])
        for r in _run(spark, "sample_stratified").collect()
    }
    b = {
        r["lang"]: (r["n_total"], r["sample_ok"])
        for r in _run(spark, "sample_stratified").collect()
    }
    assert a == b, "sampleBy with fixed seed must be deterministic"
    from datalakecrawler_spark.io import load

    full = {
        r["lang"]: r["n"]
        for r in load(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang in ["en", "de", "es", "fr", "zh"]:
        n_total, ok = a[lang]
        assert n_total == full[lang], f"{lang} exact total wrong"
        assert ok, f"{lang} sampled count outside the 3σ binomial band"


def test_scan_binary_files_matches_filesystem(spark):
    """binaryFile listing must agree with os.stat over the same glob —
    the op's in-result verdicts plus an independent glob count here."""
    import glob as _glob

    row = _run(spark, "scan_binary_files").collect()[0]
    n_direct = len(_glob.glob(f"{SF_DIR}/*.parquet"))
    assert row["n_files"] == n_direct == 10
    assert row["sizes_match_os"] == 1
    assert row["all_nonempty"] == 1


def test_dedup_components_match_union_find(spark):
    """Connected components over the LSH pair graph must equal a Python
    union-find over the exact same pairs (clusters, sizes, keepers)."""
    from datalakecrawler_spark import registry

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in registry.all_queries()["dedup_near_minhash"].fn(spark, SF_DIR).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in parent:
        want.setdefault(find(n), set()).add(n)
    expected = sorted((min(m), len(m), max(m)) for m in want.values())

    got = sorted(
        (r["keeper"], r["n_docs"], r["max_member"])
        for r in _run(spark, "dedup_components").collect()
    )
    assert got == expected


def test_sim_ann_brp_lsh_pairs_valid_with_recall(spark):
    """Every LSH pair must truly be within the distance threshold, and
    recall vs the exact pair set must not collapse."""
    import numpy as np

    from datalakecrawler_spark.io import load

    rows = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    diff = X[:, None, :] - X[None, :, :]
    D = np.sqrt((diff * diff).sum(-1))
    iu, ju = np.triu_indices(len(X), 1)
    exact = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i, j in zip(iu[D[iu, ju] <= 1.15], ju[D[iu, ju] <= 1.15])
    }

    got = {(r["vec_a"], r["vec_b"]): r["dist"] for r in _run(spark, "sim_ann_brp_lsh").collect()}
    for (a, b), dist in got.items():
        i, j = int(np.where(ids == a)[0][0]), int(np.where(ids == b)[0][0])
        assert abs(dist - D[i, j]) < 1e-4, (a, b)
        assert dist <= 1.15 + 1e-9
    assert set(got) <= exact | set()  # no false positives beyond threshold
    if exact:
        assert len(set(got) & exact) / len(exact) >= 0.5, (len(got), len(exact))


def test_hll_mergeability_error_bounds(spark):
    """Two-level sketch merge must estimate within HLL error (lgK=12 →
    ~1.6% rse; allow 4σ) of the exact distinct count — the property
    that makes distributed count-distinct a small-merge, not a shuffle.
    The op emits exact + verdicts (sketch values are engine-specific);
    the raw estimates are re-derived here and held to the tighter 6.5%."""
    row = _run(spark, "agg_hll_mergeable").collect()[0]
    exact = row["exact_distinct"]
    assert row["direct_ok"] and row["merged_ok"]
    from datalakecrawler_spark.io import load

    o = load(spark, SF_DIR, "orders")
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", 12)).alias("d")
    ).collect()[0][0]
    merged = (
        o.groupBy("o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey", 12).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m"))
        .collect()[0][0]
    )
    for name, est in (("direct", direct), ("merged", merged)):
        rel = abs(est - exact) / exact
        assert rel < 0.065, (name, est, exact)


def test_crawl_incremental_picks_only_new_file(spark):
    row = _run(spark, "crawl_incremental").collect()[0]
    assert row["n_new_files"] == row["n_expected_new"] == 1, dict(row.asDict())


def test_holt_forecast_recurrence(spark):
    """ts_holt_forecast must equal the plain-Python Holt recurrence
    (α=0.3, β=0.1) recomputed from its own actuals — the grouped-map
    must be a faithful, sorted, single-pass recurrence. Rounding is
    the engine-portable floor(x·1e4+0.5)/1e4 half-up (matches the
    recursive-CTE oracle bit-for-bit)."""
    import math

    def r4(v):
        return math.floor(v * 1e4 + 0.5) / 1e4

    rows = sorted(_run(spark, "ts_holt_forecast").collect(), key=lambda r: r["wk"])
    assert len(rows) > 10
    x = [r["actual"] for r in rows]
    alpha, beta = 0.3, 0.1
    level, trend = x[0], x[1] - x[0]
    assert rows[0]["level"] == r4(level)
    assert rows[0]["trend"] == r4(trend)
    # pandas NaN crosses Arrow as null
    assert rows[0]["fitted"] is None or math.isnan(rows[0]["fitted"])
    for t in range(1, len(x)):
        prev = level + trend
        new_level = alpha * x[t] + (1 - alpha) * prev
        new_trend = beta * (new_level - level) + (1 - beta) * trend
        assert abs(rows[t]["fitted"] - r4(prev)) < 1e-6, t
        assert abs(rows[t]["level"] - r4(new_level)) < 1e-6, t
        assert abs(rows[t]["trend"] - r4(new_trend)) < 1e-6, t
        level, trend = new_level, new_trend


def test_bitmap_distinct_equals_exact(spark):
    """The bitmap popcount path must agree with count(distinct) on
    every event_type (both columns are in the operator's own output)."""
    for r in _run(spark, "agg_bitmap_distinct").collect():
        assert r["n_users_bitmap"] == r["n_users_exact"], r


def test_holt_winters_seasonal_recurrence(spark):
    """ts_holt_winters_seasonal must equal the plain-Python additive
    Holt-Winters recurrence replayed from its own actuals. The
    recurrence runs in integer cents (actual·100 recovers them
    exactly) and rounds half-up like the recursive-CTE oracle."""
    import math

    def r4d(v):
        return math.floor((v / 100) * 1e4 + 0.5) / 1e4

    rows = sorted(
        _run(spark, "ts_holt_winters_seasonal").collect(), key=lambda r: r["mth"]
    )
    assert len(rows) >= 24, "needs ≥2 seasonal periods of monthly history"
    x = [r["actual"] * 100 for r in rows]  # exact cents
    m, alpha, beta, gamma = 12, 0.3, 0.05, 0.2
    base = sum(x[:m]) / m
    seas = [v - base for v in x[:m]]
    level = base
    trend = (sum(x[m : 2 * m]) / m - base) / m
    for t in range(len(x)):
        s = seas[t % m]
        fitted = level + trend + s
        new_level = alpha * (x[t] - s) + (1 - alpha) * (level + trend)
        new_trend = beta * (new_level - level) + (1 - beta) * trend
        seas[t % m] = gamma * (x[t] - new_level) + (1 - gamma) * s
        assert abs(rows[t]["fitted"] - r4d(fitted)) < 1e-4, t
        assert abs(rows[t]["level"] - r4d(new_level)) < 1e-4, t
        assert abs(rows[t]["seasonal"] - r4d(seas[t % m])) < 1e-4, t
        level, trend = new_level, new_trend


def test_image_resize_stub_invariants(spark):
    """Resize plumbing: output fits 224², aspect ratio preserved within
    integer truncation, thumbnail no larger than the source budget."""
    rows = _run(spark, "mm_image_resize_stub").collect()
    assert rows
    for r in rows[:50]:
        assert r["out_w"] <= 224 and r["out_h"] <= 224
        assert r["out_w"] >= 1 and r["out_h"] >= 1
        if r["scale"] < 1.0:  # downscaled: the larger side hits ~224
            assert max(r["out_w"], r["out_h"]) >= 220
        assert r["thumb_bytes"] >= 1


def test_audio_frame_features_shape(spark):
    """ASR framing: ≤8 frames per doc, contiguous indices from 0,
    energy non-negative, zero-crossings < window length."""
    rows = _run(spark, "mm_audio_frame_features").collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert r["energy"] >= 0
        assert 0 <= r["zero_crossings"] < 400
    for idxs in list(by_doc.values())[:50]:
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) <= 8


def test_ivf_nprobe_sweep_monotone(spark):
    """The nprobe tuning curve must be monotone: more probed buckets
    can only add candidates, so n_candidates, frac_scanned and
    recall@10 are all non-decreasing in nprobe, and frac_scanned
    stays strictly below 1 (otherwise the 'index' is a full scan)."""
    rows = sorted(
        _run(spark, "sim_ivf_nprobe_sweep").collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 5]
    for a, b in zip(rows, rows[1:]):
        assert b["n_candidates"] >= a["n_candidates"]
        assert b["frac_scanned"] >= a["frac_scanned"]
        assert b["recall_at_10"] >= a["recall_at_10"]
    assert rows[-1]["frac_scanned"] < 1.0
    assert rows[-1]["recall_at_10"] >= 0.5


def test_ivf_prune_engages_on_clustered_data(spark):
    """The bucket-pair triangle-inequality prune must actually PRUNE
    when the geometry allows it, and stay lossless while doing so.

    The fixture embeddings are isotropic on the 64-sphere (measured
    mean pairwise cos ~1e-5), where every radius bound collapses and
    100% candidate survival is the mathematically expected result —
    so this test builds what real corpora look like instead: 8 tight
    clusters around orthogonal axes (unit vectors, cos(noise) >= 0.95
    within a cluster, cross-cluster cos <= ~0.31). With the true
    cluster centers as the quantizer, candidates must shrink to
    roughly the within-cluster pairs, and the verified output must
    equal brute force exactly."""
    import itertools
    import math

    from datalakecrawler_spark.pipeline.similarity import (
        _prune_candidates_for,
        dot,
    )

    dim, k, per = 64, 8, 25
    # deterministic "noise": small fixed rotations within each axis plane
    vecs = []
    for c in range(k):
        for j in range(per):
            ang = 0.05 + 0.25 * j / per  # max ~0.30 rad off-axis
            v = [0.0] * dim
            v[c] = math.cos(ang)
            v[(c + 8 + j % 8) % dim + (8 if (c + 8 + j % 8) % dim < 8 else 0)] = (
                math.sin(ang)
            )
            vecs.append((c * per + j, v))
    n = len(vecs)
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [
            (c, [1.0 if i == c else 0.0 for i in range(dim)])
            for c in range(k)
        ],
        "c_label long, cvec array<double>",
    )
    tau = 0.8
    cand = _prune_candidates_for(e, cents, tau)
    n_cand = cand.count()
    all_pairs = n * (n - 1) // 2
    # 8 clusters of 25 → within-cluster pairs = 8 * C(25,2) = 2400 of
    # 19900; the prune must reject the cross-cluster bucket pairs
    # (cross-cluster cos <= cos(pi/2 - 0.3 - 0.3) ~ 0.56 < tau bound)
    assert n_cand < 0.25 * all_pairs, (n_cand, all_pairs)

    got = sorted(
        map(
            tuple,
            cand.withColumn("sim", F.round(dot("e_a", "e_b"), 6))
            .where(F.col("sim") >= tau)
            .select("vec_a", "vec_b")
            .collect(),
        )
    )
    # brute force on the driver (n=200, fine)
    import numpy as np

    M = np.array([v for _, v in vecs])
    S = M @ M.T
    exp = sorted(
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if round(S[a, b], 6) >= tau
    )
    assert got == exp
    assert len(exp) > 0  # the threshold actually selects something


def test_ivf_sampled_trainer_stays_lossless(spark):
    """r5 (VERDICT r4 §3): the Lloyd trainer runs on a bounded
    md5-ordered sample — min(N, train_per_cell·nlist) vectors. At the
    default 128/cell the fixture corpora fit entirely, so this test
    forces the sampling path with train_per_cell=1 (sample = nlist of
    N vectors, the most degraded trainer possible) and asserts the
    prune built from those centroids is STILL lossless: radii come
    from the full-corpus assignment, so output identity holds for any
    centroid table. Also pins that sampling genuinely engaged."""
    import math

    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.similarity import (
        _PAIR_TAU,
        _kmeans_cells_plan,
        _prune_candidates_for,
        dot,
    )

    e = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n = e.count()
    nlist = max(10, math.isqrt(max(n - 1, 0)) + 1)
    assert nlist < n, "fixture must be large enough for sampling to engage"

    cents = _kmeans_cells_plan(spark, SF_DIR, train_per_cell=1).withColumnRenamed(
        "label", "c_label"
    )
    assert cents.count() <= nlist

    cand = _prune_candidates_for(e, cents, _PAIR_TAU)
    got = sorted(
        map(
            tuple,
            cand.withColumn("sim", F.round(dot("e_a", "e_b"), 6))
            .where(F.col("sim") >= _PAIR_TAU)
            .select("vec_a", "vec_b")
            .collect(),
        )
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"))
    exp = sorted(
        map(
            tuple,
            a.join(b, F.col("vec_a") < F.col("vec_b"))
            .withColumn("sim", F.round(dot("e_a", "e_b"), 6))
            .where(F.col("sim") >= _PAIR_TAU)
            .select("vec_a", "vec_b")
            .collect(),
        )
    )
    assert got == exp
