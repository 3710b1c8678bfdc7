"""Group J (vectors/multimodal columns) — pooling and profiling over
``array<float>`` embedding columns (SURVEY.md §2 J11/J12).

Both operators stay in Tungsten: posexplode + positional groupBy for
pooling (SURVEY §4 — the alternative, a Python UDF per row, pays the
Arrow boundary for nothing), higher-order lambdas for norms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import register


@register(
    "mm_embed_pooling",
    group="J",
    oracle="""
    with flat as (
        select label, unnest(range(len(embedding))) as pos,
               unnest(embedding) as v
        from embeddings
    ),
    cent as (
        select label, pos,
               round(cast(sum(cast(v as decimal(38,10))) as double)
                     / count(v), 6) as cv
        from flat group by 1, 2
    )
    select label, count(distinct pos) as dim,
           list(cv order by pos) as centroid
    from cent group by label
    """,
)
def mm_embed_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: mean-pool embeddings per label → centroid vectors.
    posexplode → (label, pos) decimal-avg → re-assemble ordered by
    position. One shuffle on (label, pos): 10 labels × 64 dims = 640
    groups regardless of corpus size — this is the plan that holds at
    100 TB (a collect-and-average would not)."""
    e = load(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = flat.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("v"),
            6,
        ).alias("cv")
    )
    return cent.groupBy("label").agg(
        F.countDistinct("pos").alias("dim"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("centroid"),
    )


@register(
    "mm_vector_norms",
    group="J",
    oracle="""
    with norms as (
        select label,
               round(sqrt(list_aggregate(list_transform(embedding,
                     x -> cast(x as double) * cast(x as double)), 'sum')), 6)
                   as l2
        from embeddings
    )
    select label, count(*) as n_vectors,
           min(l2) as min_norm, max(l2) as max_norm,
           round(cast(sum(cast(l2 as decimal(38,10))) as double)
                 / count(l2), 6) as avg_norm
    from norms group by label
    """,
)
def mm_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: per-vector L2 norm, profiled per label — the sanity check
    that catches unnormalized/corrupt vector columns at ingest (all
    fixture norms ≈ 1.0)."""
    e = load(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.transform(
            "embedding", lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norms = e.select("label", F.round(F.sqrt(sumsq), 6).alias("l2"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("l2").alias("min_norm"),
        F.max("l2").alias("max_norm"),
        F.round(
            F.sum(F.col("l2").cast("decimal(38,10)")).cast("double")
            / F.count("l2"),
            6,
        ).alias("avg_norm"),
    )
