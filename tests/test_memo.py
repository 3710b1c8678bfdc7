"""Bounded-memo discipline (memo.py, ADVICE r3 item 3): entries beyond
keep-last-N per application are evicted and their checkpointed RDD
blocks actually released from the context's persistent-RDD registry."""
from __future__ import annotations

import pyspark.sql.functions as F

from datalakecrawler_spark import memo as memo_mod
from datalakecrawler_spark.memo import (
    _persistent_rdd_ids,
    memoized_checkpoint,
)


def test_memo_bounds_and_unpersists(spark):
    m: dict = {}

    def build(i):
        return lambda: spark.range(100).select(
            F.col("id"), F.lit(i).alias("tag")
        )

    baseline = _persistent_rdd_ids(spark.sparkContext)
    dfs = {}
    for i in range(7):
        dfs[i] = memoized_checkpoint(m, spark, f"dir{i}", build(i), keep=3)

    # bounded: only the last 3 entries survive
    assert len(m) == 3
    kept = {k[1] for k in m}
    assert kept == {"dir4", "dir5", "dir6"}

    # storage released: at most the 3 kept entries' RDDs remain beyond
    # the baseline snapshot (evicted ids were unpersisted)
    now = _persistent_rdd_ids(spark.sparkContext) - baseline
    claimed = set()
    for _df, ids in m.values():
        claimed |= ids
    assert now <= claimed | baseline
    assert len(now) <= len(claimed)

    # kept entries still readable (their blocks were NOT released)
    assert dfs[6].count() == 100
    # memo hit returns the identical object, no rebuild
    again = memoized_checkpoint(m, spark, "dir6", build(6), keep=3)
    assert again is dfs[6]

    # _CLAIMED does not leak evicted ids
    for _df, ids in m.values():
        assert ids <= memo_mod._CLAIMED


def test_memo_nested_attribution(spark):
    """An outer memoized build that consumes an inner memo entry must
    not claim the inner entry's RDD ids — evicting the outer must leave
    the inner readable."""
    inner: dict = {}
    outer: dict = {}

    def inner_build():
        return spark.range(50).select(F.col("id").alias("k"))

    def outer_build():
        base = memoized_checkpoint(inner, spark, "shared", inner_build)
        return base.groupBy((F.col("k") % 5).alias("g")).count()

    out_df = memoized_checkpoint(outer, spark, "derived", outer_build, keep=1)
    (_idf, inner_ids), = inner.values()
    (_odf, outer_ids), = outer.values()
    assert inner_ids.isdisjoint(outer_ids)

    # evict the outer entry by inserting past keep=1
    memoized_checkpoint(
        outer, spark, "derived2",
        lambda: spark.range(5).select("id"), keep=1,
    )
    assert ("derived" not in {k[1] for k in outer})
    # inner entry survives eviction of the outer and is still readable
    # (out_df itself is now released — evicted entries give up their
    # blocks by design, so we do NOT read it again)
    hit = memoized_checkpoint(inner, spark, "shared", inner_build)
    assert hit.count() == 50


def test_memoized_query_families_are_idempotent(spark):
    """The four r4-memoized shared intermediates (SNM rank index,
    dup-span gram index, spearman rank pairs, basket table) must make
    their consumer queries idempotent within a session: a second call
    hits the memo (same checkpointed object) and returns identical
    rows. Guards the memo-key discipline — a key that accidentally
    excluded sf_dir or included per-call state would break one side."""
    from datalakecrawler_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.all_queries()
    for name in (
        "dedup_fellegi_sunter",
        "dedup_duplicate_spans",
        "stats_spearman_corr",
        "orders_market_basket",
        "orders_basket_lift",
    ):
        first = sorted(map(tuple, qs[name].fn(spark, sf).collect()))
        second = sorted(map(tuple, qs[name].fn(spark, sf).collect()))
        assert first == second, name

    from datalakecrawler_spark.operators.joins import _BASKET_MEMO
    from datalakecrawler_spark.operators.stats import _SPEARMAN_RANK_MEMO
    from datalakecrawler_spark.pipeline.dedup import (
        _SNM_RANK_MEMO,
        _SPAN_INDEX_MEMO,
    )

    app = spark.sparkContext.applicationId
    for memo in (
        _BASKET_MEMO,
        _SPEARMAN_RANK_MEMO,
        _SNM_RANK_MEMO,
        _SPAN_INDEX_MEMO,
    ):
        assert (app, sf) in memo
