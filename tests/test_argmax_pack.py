"""Focused tests for the r10 packed-bigint argmax rewrite (VERDICT r9
#1): the r9 min(struct(...)) argmax aggregates planned as SortAggregate
because Spark cannot hash-aggregate a struct min/max buffer. The r10
form packs the (score desc, label asc) order into ONE bigint so a plain
max() runs as HashAggregate. These tests pin (a) winner-identity against
the window formulation including exact tie-breaks and negative scores,
and (b) the physical-plan property the rewrite exists for."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark import registry
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_assign_step_matches_window_reference(spark):
    """_assign_step (packed argmax) picks the identical
    (sim desc, c_label asc) winner as the row_number window, including
    on exact sim ties, and decodes sim bit-identically to round(·,6)."""
    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.pipeline.similarity import (
        _assign_step,
        _label_centroids,
        dot,
    )

    e = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = _label_centroids(spark, SF_DIR).select(
        F.col("label").alias("c_label"), "cvec"
    )
    got = {
        r["vec_id"]: (r["assigned"], r["sim"])
        for r in _assign_step(e, cents).collect()
    }
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "c_label",
        F.round(dot("embedding", "cvec"), 6).alias("sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "c_label")
    ref = {
        r["vec_id"]: (r["c_label"], r["sim"])
        for r in scored.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .collect()
    }
    assert got == ref


def test_packed_argmax_tie_and_negative_scores(spark):
    """Synthetic frame with exact ties and negative scores: the packed
    key must break ties toward the SMALLEST label, exactly like the
    (score desc, label asc) window order."""
    rows = [
        # gid 1: tie at -0.5 between labels 7 and 2 -> 2 wins
        (1, 7, -0.5), (1, 2, -0.5), (1, 9, -0.700001),
        # gid 2: negative vs positive
        (2, 3, -1.0), (2, 8, 0.000001), (2, 1, 0.0),
        # gid 3: all equal -> label 0 wins
        (3, 5, 0.25), (3, 0, 0.25), (3, 11, 0.25),
    ]
    df = spark.createDataFrame(rows, "gid int, lbl int, sim double")
    key = (
        F.round(F.col("sim") * 1e6, 0).cast("long")
        * F.lit(1 << 20).cast("long")
        + (F.lit((1 << 20) - 1).cast("long") - F.col("lbl").cast("long"))
    )
    agg = (
        df.select("gid", key.alias("__k"))
        .groupBy("gid")
        .agg(F.max("__k").alias("__k"))
        .select(
            "gid",
            (
                F.lit((1 << 20) - 1).cast("long")
                - F.pmod(F.col("__k"), F.lit(1 << 20).cast("long"))
            ).cast("int").alias("lbl"),
            (F.shiftright(F.col("__k"), 20).cast("double") / 1e6).alias("sim"),
        )
    )
    got = {r["gid"]: (r["lbl"], r["sim"]) for r in agg.collect()}
    assert got == {1: (2, -0.5), 2: (8, 0.000001), 3: (0, 0.25)}


def test_packed_argmax_plans_hash_aggregate(spark):
    """The whole point of the rewrite: the assignment/favourite
    aggregates must run as HashAggregate — no SortAggregate (and hence
    no map-side sort of the candidate fanout) anywhere in the plan."""
    qs = registry.all_queries()
    for name in ("cluster_assign_centroid", "cluster_kmeans_lloyd"):
        txt = _plan(qs[name].fn(spark, SF_DIR))
        assert "SortAggregate" not in txt, name
        assert "HashAggregate" in txt, name


def test_part_brand_switching_hash_aggregate_and_dict(spark):
    """part_brand_switching: favourite-brand argmax is hash-aggregated
    via the deterministic brand dictionary; result still matches the
    struct-min reference computed inline."""
    qs = registry.all_queries()
    df = qs["part_brand_switching"].fn(spark, SF_DIR)
    txt = _plan(df)
    assert "SortAggregate" not in txt
    # reference: original struct-min formulation over the same inputs
    from datalakecrawler_spark.io import load

    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    p = load(spark, SF_DIR, "part")
    spend = (
        li.join(
            o.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            "o_custkey",
            "p_brand",
            F.when(
                F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"),
                "p1",
            )
            .otherwise("p2")
            .alias("period"),
        )
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 1e6 + 0.5)).alias("s"))
    )
    fav = (
        spend.groupBy("o_custkey", "period")
        .agg(
            F.min(
                F.struct(
                    (-F.col("s")).alias("ns"), F.col("p_brand").alias("p_brand")
                )
            ).alias("m")
        )
        .select("o_custkey", "period", F.col("m.p_brand").alias("p_brand"))
    )
    a = fav.filter(F.col("period") == "p1").select(
        "o_custkey", F.col("p_brand").alias("brand_p1")
    )
    b = fav.filter(F.col("period") == "p2").select(
        "o_custkey", F.col("p_brand").alias("brand_p2")
    )
    ref = (
        a.join(b, "o_custkey")
        .groupBy("brand_p1", "brand_p2")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") >= 3)
        .select(
            "brand_p1",
            "brand_p2",
            "n_customers",
            (F.col("brand_p1") == F.col("brand_p2")).alias("is_loyal"),
        )
        .orderBy(F.col("n_customers").desc(), "brand_p1", "brand_p2")
        .limit(20)
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))
