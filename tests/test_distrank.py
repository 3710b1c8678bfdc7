"""distrank must be BIT-IDENTICAL to the single-partition global
window it replaces — rank, inclusive/exclusive prefix sums, multi-
column prefix sums, prefix max (incl. first-row NULL semantics), and
the closed-form ntile. Checked value-by-value against the WindowExec
forms on a frame that spans many range partitions."""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from datalakecrawler_spark.distrank import (
    ntile_from_rank,
    with_global_cummax,
    with_global_cumsum,
    with_global_row_number,
)


def _frame(spark):
    # deterministic pseudo-random keys; values include negatives
    return spark.range(997).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("k"),
        ((F.col("id") * 37) % 101 - 50).alias("v"),
        ((F.col("id") * 13) % 89).alias("v2"),
    )


def test_row_number_and_total_match_window(spark):
    df = _frame(spark)
    got = with_global_row_number(
        df, spark, ["k", "id"], out="rn", with_total="n"
    )
    exp = df.withColumn("rn", F.row_number().over(W.orderBy("k", "id")))
    g = {r["id"]: (r["rn"], r["n"]) for r in got.collect()}
    e = {r["id"]: r["rn"] for r in exp.collect()}
    assert all(g[i][0] == e[i] for i in e)
    assert all(g[i][1] == 997 for i in e)


def test_cumsum_inclusive_exclusive_extra_match_window(spark):
    df = _frame(spark)
    w = W.orderBy("k", "id")
    exp = df.select(
        "id",
        F.sum("v").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("ci"),
        F.coalesce(
            F.sum("v").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("ce"),
        F.sum("v2").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("c2"),
    )
    got_i = with_global_cumsum(
        df, spark, ["k", "id"], "v", out="ci", inclusive=True,
        with_total="tot", rn_out="rn", rows_total="nr",
        extra=[("v2", "c2")],
    )
    got_e = with_global_cumsum(
        df, spark, ["k", "id"], "v", out="ce", inclusive=False
    )
    e = {r["id"]: (r["ci"], r["ce"], r["c2"]) for r in exp.collect()}
    gi = {r["id"]: (r["ci"], r["c2"], r["tot"], r["rn"], r["nr"]) for r in got_i.collect()}
    ge = {r["id"]: r["ce"] for r in got_e.collect()}
    total_v = sum((i * 37) % 101 - 50 for i in range(997))
    for i in e:
        assert gi[i][0] == e[i][0]
        assert gi[i][1] == e[i][2]
        assert gi[i][2] == total_v
        assert gi[i][4] == 997
        assert ge[i] == e[i][1]
    # rn from the cumsum call matches the rank call
    rn_ref = {
        r["id"]: r["rn"]
        for r in with_global_row_number(df, spark, ["k", "id"], out="rn").collect()
    }
    assert all(gi[i][3] == rn_ref[i] for i in e)


def test_cummax_matches_window_including_null_first_row(spark):
    df = _frame(spark)
    w = W.orderBy("k", "id")
    exp = df.select(
        "id",
        F.max("v").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("mi"),
        F.max("v").over(w.rowsBetween(W.unboundedPreceding, -1)).alias("me"),
    )
    gi = {
        r["id"]: r["mi"]
        for r in with_global_cummax(df, ["k", "id"], "v", out="mi").collect()
    }
    ge = {
        r["id"]: r["me"]
        for r in with_global_cummax(
            df, ["k", "id"], "v", out="me", inclusive=False
        ).collect()
    }
    for r in exp.collect():
        assert gi[r["id"]] == r["mi"]
        assert ge[r["id"]] == r["me"]  # includes the first-row NULL


def test_ntile_from_rank_matches_window_ntile(spark):
    df = _frame(spark)
    w = W.orderBy("k", "id")
    for k in (2, 4, 7, 10, 32):
        exp = {
            r["id"]: r["t"]
            for r in df.withColumn("t", F.ntile(k).over(w)).collect()
        }
        ranked = with_global_row_number(
            df, spark, ["k", "id"], out="rn", with_total="n"
        )
        got = {
            r["id"]: r["t"]
            for r in ranked.withColumn(
                "t", ntile_from_rank(F.col("rn"), F.col("n"), k)
            ).collect()
        }
        assert got == exp, f"ntile({k})"


def test_edge_frames_empty_single_and_ties(spark):
    """Empty frames, 1-row frames, and heavily tied order keys (range
    boundaries land inside tie runs) must all behave: empty in → empty
    out, 1-row ranks/sums/maxes are exact, and value-at-rank over a
    tied sort is the sorted multiset regardless of tie placement."""
    empty = spark.range(0).select(F.col("id"), F.col("id").alias("v"))
    assert with_global_row_number(empty, spark, ["id"], out="rn").count() == 0
    assert (
        with_global_cumsum(empty, spark, ["id"], "v", out="c").count() == 0
    )
    assert with_global_cummax(empty, ["id"], "v", out="m").count() == 0

    one = spark.range(1).select(F.col("id"), (F.col("id") + 7).alias("v"))
    r = with_global_row_number(one, spark, ["id"], out="rn", with_total="n").collect()[0]
    assert (r["rn"], r["n"]) == (1, 1)
    c = with_global_cumsum(one, spark, ["id"], "v", out="c", inclusive=False).collect()[0]
    assert c["c"] == 0  # exclusive frame, no predecessor
    m = with_global_cummax(one, ["id"], "v", out="m", inclusive=False).collect()[0]
    assert m["m"] is None  # matches WindowExec NULL

    # 600 rows, only 3 distinct keys: every range partition boundary
    # falls inside a tie run. Value at rank k must equal the sorted
    # multiset (tie-order-invariant), and ranks must be a permutation.
    tied = spark.range(600).select(
        (F.col("id") % 3).alias("k"), F.col("id")
    )
    got = with_global_row_number(tied, spark, ["k"], out="rn").collect()
    by_rank = sorted((r["rn"], r["k"]) for r in got)
    assert [rn for rn, _ in by_rank] == list(range(1, 601))
    expected_sorted = sorted(i % 3 for i in range(600))
    assert [k for _, k in by_rank] == expected_sorted


def test_extra_totals_match_scalar_sums(spark):
    """extra_totals must carry each extra running sum's grand total
    (the two-sample-ECDF denominator) from the same offset collect."""
    df = _frame(spark)
    got = with_global_cumsum(
        df, spark, ["k", "id"], "v",
        out="c1", with_total="t1",
        extra=[("v2", "c2")], extra_totals=["t2"],
    )
    exp = df.agg(F.sum("v").alias("t1"), F.sum("v2").alias("t2")).collect()[0]
    rows = got.collect()
    assert all(r["t1"] == exp["t1"] for r in rows)
    assert all(r["t2"] == exp["t2"] for r in rows)
    last = max(rows, key=lambda r: (r["k"], r["id"]))
    assert last["c1"] == exp["t1"] and last["c2"] == exp["t2"]


def test_layout_storage_is_bounded_and_released(spark):
    """ADVICE r4 (medium): distrank localCheckpoints its input per
    call; the per-app FIFO must (a) bound the number of live layouts
    at _KEEP_LAYOUTS and (b) honestly release evicted layouts' blocks
    from the context's persistent-RDD registry."""
    from datalakecrawler_spark import distrank, memo

    sc = spark.sparkContext
    app = sc.applicationId
    evicted_ids: set = set()
    seen_layouts = 0
    df = _frame(spark)
    for i in range(distrank._KEEP_LAYOUTS + 5):
        before = {e[1] for e in distrank._LAYOUTS if e[0] == app}
        out = with_global_row_number(df, spark, ["k", "id"], out="rn")
        out.collect()  # fully consume before the next layout is cut
        after = {e[1] for e in distrank._LAYOUTS if e[0] == app}
        evicted_ids |= set().union(*(before - after)) if before - after else set()
        seen_layouts += 1
        assert (
            sum(1 for e in distrank._LAYOUTS if e[0] == app)
            <= distrank._KEEP_LAYOUTS
        )
    assert seen_layouts > distrank._KEEP_LAYOUTS  # eviction did happen
    assert evicted_ids, "expected at least one evicted layout with rdd ids"
    live = memo._persistent_rdd_ids(sc)
    assert not (evicted_ids & live), (
        "evicted layout blocks still persistent: " f"{evicted_ids & live}"
    )
    # evicted ids must also have left the cross-registry claim set
    assert not (evicted_ids & memo._CLAIMED)


def test_memoized_layout_matches_and_skips_rebuild(spark):
    """r10: with memo_key the layout + offset collect are memoized per
    application — results stay bit-identical to the unmemoized path,
    repeat builds hit the memo (no new checkpoint), and the offsets
    are stored with the layout entry."""
    from datalakecrawler_spark import distrank

    df = _frame(spark)
    key = ("test_distrank.memoized", "v1")
    got1 = with_global_cumsum(
        df, spark, ["k", "id"], "v", out="ci", inclusive=True,
        with_total="tot", rn_out="rn", memo_key=key,
    )
    ref = with_global_cumsum(
        df, spark, ["k", "id"], "v", out="ci", inclusive=True,
        with_total="tot", rn_out="rn",
    )
    g = {r["id"]: (r["ci"], r["tot"], r["rn"]) for r in got1.collect()}
    e = {r["id"]: (r["ci"], r["tot"], r["rn"]) for r in ref.collect()}
    assert g == e
    app = spark.sparkContext.applicationId
    npart = distrank._npart(spark)
    entry = distrank._RANK_MEMO[(app, key, npart)]
    stats_before = dict(entry[2])
    assert stats_before, "offsets must be cached with the layout"
    got2 = with_global_cumsum(
        df, spark, ["k", "id"], "v", out="ci", inclusive=True,
        with_total="tot", rn_out="rn", memo_key=key,
    )
    assert distrank._RANK_MEMO[(app, key, npart)][0] is entry[0]
    g2 = {r["id"]: (r["ci"], r["tot"], r["rn"]) for r in got2.collect()}
    assert g2 == e
