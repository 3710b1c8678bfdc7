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
