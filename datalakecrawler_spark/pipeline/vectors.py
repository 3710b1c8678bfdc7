"""Group J (vectors/multimodal columns) — pooling and profiling over
``array<float>`` embedding columns (SURVEY.md §2 J11/J12).

Both operators stay in Tungsten: posexplode + positional groupBy for
pooling (SURVEY §4 — the alternative, a Python UDF per row, pays the
Arrow boundary for nothing), higher-order lambdas for norms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
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
    )
    select label, cast(pos as bigint) as pos,
           round(cast(sum(cast(v as decimal(38,10))) as double)
                 / count(v), 6) as centroid_v
    from flat group by 1, 2
    """,
)
def mm_embed_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: mean-pool embeddings per label → centroid vectors, emitted
    as flat (label, pos, centroid_v) rows — one row per centroid
    coordinate. The flat shape is deliberate: the driver's
    canonicalizer cannot hash nested columns (VERDICT r1 What's-wrong
    §1), and downstream consumers (cluster_assign_centroid) re-assemble
    with collect_list anyway. posexplode → (label, pos) decimal-avg:
    one shuffle on (label, pos), 10 labels × 64 dims = 640 groups
    regardless of corpus size — the plan that holds at 100 TB (a
    collect-and-average would not)."""
    e = load(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return flat.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("v"),
            6,
        ).alias("centroid_v")
    ).select("label", F.col("pos").cast("long").alias("pos"), "centroid_v")


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


@register(
    "mm_embed_quantize",
    group="J",
    oracle="""
    with v as (
        select label,
               list_transform(embedding, x -> cast(x as double)) as e
        from embeddings
    ),
    s as (
        select label, e,
               list_max(list_transform(e, x -> abs(x))) as scale
        from v
    ),
    q as (
        select label, scale, e,
               list_transform(e, x -> cast(round(x / scale * 127) as int))
                   as qv
        from s
    ),
    err as (
        select label,
               list_sum(list_transform(range(len(e)),
                        i -> abs(e[i+1] - qv[i+1] * scale / 127))) / len(e)
                   as mae
        from q
    )
    select label, count(*) as n_vecs,
           round(cast(sum(cast(floor(mae * 1e6 + 0.5) as bigint)) as double)
                 / count(mae) / 1e6, 6) as avg_mae,
           round(max(mae), 6) as max_mae
    from err group by 1
    """,
)
def mm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: int8 scalar quantization of the embedding column — the
    storage/bandwidth lever for vector corpora (float32→int8 is 4× off
    disk and over the shuffle). Per vector: symmetric absmax scaling,
    quantize q = round(x/scale·127), and the reconstruction
    mean-absolute-error per label as the quality report. Everything is
    higher-order SQL lambdas on the JVM — no Python boundary, codegen
    keeps it in one scan + one tiny agg. The per-element arithmetic has
    identical expression shape in both engines (exact float→double
    widening, same IEEE op order), so the MAEs hash-match; per-label
    averaging routes through micro-unit sums per the float policy."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    d = e.select(
        "label",
        emb.alias("e"),
        scale.alias("scale"),
    )
    qv = F.transform(
        F.col("e"), lambda x: F.round(x / F.col("scale") * 127).cast("int")
    )
    mae = F.aggregate(
        F.zip_with(
            F.col("e"),
            qv,
            lambda x, q: F.abs(x - q * F.col("scale") / 127),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(F.col("e"))
    per_vec = d.select("label", mae.alias("mae"))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.floor(F.col("mae") * 1e6 + 0.5)).cast("double")
            / F.count("mae")
            / 1e6,
            6,
        ).alias("avg_mae"),
        F.round(F.max("mae"), 6).alias("max_mae"),
    )


@register(
    "mm_centroid_distances",
    group="J",
    oracle="""
    with pe as (
      select label, generate_subscripts(embedding, 1) - 1 as pos,
             unnest(embedding) as v
      from embeddings
    ),
    cent as (
      select label, pos,
             round(cast(sum(cast(floor(v * 1e6 + 0.5) as bigint)) as double)
                   / count(*) / 1e6, 6) as va
      from pe group by 1, 2
    ),
    norms as (
      select label, sum(cast(floor(va * va * 1e12 + 0.5) as bigint)) as nsq
      from cent group by 1
    ),
    dots as (
      select a.label as label_a, b.label as label_b,
             sum(cast(floor(a.va * b.va * 1e12 + 0.5) as bigint)) as dot
      from cent a join cent b on a.pos = b.pos and a.label < b.label
      group by 1, 2
    )
    select label_a, label_b,
           round((cast(dot as double) / 1e12)
                 / (sqrt(cast(na.nsq as double) / 1e12)
                  * sqrt(cast(nb.nsq as double) / 1e12)), 6) as cosine
    from dots
    join norms na on label_a = na.label
    join norms nb on label_b = nb.label
    """,
)
def mm_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: inter-class centroid similarity matrix — mean-pool each
    label's embeddings (posexplode + per-position avg, the Tungsten-side
    pooling from mm_embed_pooling), then pairwise cosine between the 10
    class centroids. This is the cluster-overlap diagnostic run before
    semantic dedup: labels whose centroids sit close produce cross-label
    near-dup pairs. Scale: after pooling everything is (labels × dims)
    rows — the pairwise stage is dimension-sized no matter how many
    input vectors. Per-position averages are micro-unit-rounded and the
    dot/norm sums are 1e-12-quantized int64, so both engines hash-match
    bit-exactly despite float inputs."""
    e = load(spark, sf_dir, "embeddings")
    pe = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = pe.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.floor(F.col("v") * 1e6 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("va")
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.floor(F.col("va") * F.col("va") * 1e12 + 0.5)).alias("nsq")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(F.sum(F.floor(F.col("a.va") * F.col("b.va") * 1e12 + 0.5)).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("nsq").alias("nsq_a"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("nsq").alias("nsq_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                (F.col("dot").cast("double") / 1e12)
                / (
                    F.sqrt(F.col("nsq_a").cast("double") / 1e12)
                    * F.sqrt(F.col("nsq_b").cast("double") / 1e12)
                ),
                6,
            ).alias("cosine"),
        )
    )


@register(
    "mm_embed_silhouette",
    group="J",
    oracle="""
    with pe as (
      select vec_id, label, generate_subscripts(embedding, 1) - 1 as pos,
             unnest(embedding) as v
      from embeddings
    ),
    cent as (
      select label, pos,
             round(cast(sum(cast(floor(v * 1e6 + 0.5) as bigint)) as double)
                   / count(*) / 1e6, 6) as va
      from pe group by 1, 2
    ),
    d2 as (
      select pe.vec_id, pe.label as own_label, cent.label as c_label,
             sum(cast(floor((pe.v - cent.va) * (pe.v - cent.va) * 1e12
                 + 0.5) as bigint)) as dsq12
      from pe join cent on cent.pos = pe.pos
      group by 1, 2, 3
    ),
    ab as (
      select vec_id, own_label,
             max(case when c_label = own_label then dsq12 end) as a12,
             min(case when c_label <> own_label then dsq12 end) as b12
      from d2 group by 1, 2
    ),
    s as (
      select own_label,
             cast(floor((sqrt(cast(b12 as double) / 1e12)
                         - sqrt(cast(a12 as double) / 1e12))
                        / greatest(sqrt(cast(a12 as double) / 1e12),
                                   sqrt(cast(b12 as double) / 1e12))
                        * 1e9 + 0.5) as bigint) as s9
      from ab
    )
    select own_label as label,
           count(*) as n_vecs,
           round(cast(sum(s9) as double) / count(*) / 1e9, 6)
             as mean_silhouette
    from s group by 1 order by label
    """,
)
def mm_embed_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: centroid-silhouette score per label — the clustering
    quality diagnostic, in the O(n·k) centroid approximation (true
    silhouette is O(n²) pairwise; the centroid form a = dist to own
    centroid, b = nearest other centroid is the standard large-scale
    surrogate and what sklearn users switch to beyond ~1e5 points).
    Labels with mean s near 0 overlap their neighbor — the classes
    semantic dedup (dedup_semdedup) will merge across. Determinism
    layering: centroids are micro-quantized means re-rounded at 6
    (exact doubles), per-(vector, centroid) squared distances are
    pico-quantized int sums over positions, sqrt/ratio runs in fixed
    IEEE order, and the per-vector silhouette is nano-quantized
    before the label mean. Scale: one posexplode pass, centroid table
    broadcasts (k×dims rows), distances are a map-side join — linear
    in vectors at any corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    )
    cent = pe.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.floor(F.col("v") * 1e6 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("va")
    )
    c = F.broadcast(
        cent.select(
            F.col("label").alias("c_label"), "pos", "va"
        )
    )
    diff = F.col("v") - F.col("va")
    d2 = (
        pe.join(c, "pos")
        .groupBy(
            "vec_id", F.col("label").alias("own_label"), "c_label"
        )
        .agg(
            F.sum(F.floor(diff * diff * 1e12 + 0.5)).alias("dsq12")
        )
    )
    ab = d2.groupBy("vec_id", "own_label").agg(
        F.max(
            F.when(F.col("c_label") == F.col("own_label"), F.col("dsq12"))
        ).alias("a12"),
        F.min(
            F.when(F.col("c_label") != F.col("own_label"), F.col("dsq12"))
        ).alias("b12"),
    )
    da = F.sqrt(F.col("a12").cast("double") / 1e12)
    db = F.sqrt(F.col("b12").cast("double") / 1e12)
    s = ab.select(
        "own_label",
        F.floor((db - da) / F.greatest(da, db) * 1e9 + 0.5).alias("s9"),
    )
    return (
        s.groupBy(F.col("own_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("s9").cast("double") / F.count(F.lit(1)) / 1e9, 6
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


@register(
    "mm_embed_dim_profile",
    group="J",
    oracle="""
    with pe as (
      select generate_subscripts(embedding, 1) - 1 as pos,
             unnest(embedding) as v
      from embeddings
    ),
    m as (
      select pos,
             cast(count(*) as bigint) as n,
             cast(sum(cast(floor(v * 1e6 + 0.5) as bigint)) as bigint)
               as s6,
             cast(sum(cast(floor(v * v * 1e9 + 0.5) as bigint))
                  as bigint) as sq9
      from pe group by 1
    ),
    stats as (
      select pos, n,
             cast(s6 as double) / 1e6 / n as mu,
             (cast(sq9 as double) / 1e9
              - n * (cast(s6 as double) / 1e6 / n)
                * (cast(s6 as double) / 1e6 / n)) / (n - 1) as var
      from m
    )
    select pos as dim,
           round(mu, 6) as mean,
           round(var, 6) as variance,
           var < 0.001 as is_low_variance
    from stats
    order by variance, dim limit 16
    """,
)
def mm_embed_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: per-dimension embedding statistics — mean and variance
    for every vector position, surfacing the 16 lowest-variance
    dimensions (dead or collapsed dims carry no information: they
    waste index bytes, and in cosine space a high-|mean|
    low-variance dim acts as a hub bias — the diagnosis that decides
    whether to drop dims before mm_embed_pca or re-center before
    LSH). One posexplode pass with per-position micro/nano-quantized
    moment sums — exact ints, dimension-sized output (64 rows at
    any corpus size); the low-variance flag compares identical
    doubles against an exact literal."""
    emb = load(spark, sf_dir, "embeddings")
    pe = emb.select(F.posexplode("embedding").alias("pos", "v"))
    m = pe.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("v") * 1e6 + 0.5)).alias("s6"),
        F.sum(F.floor(F.col("v") * F.col("v") * 1e9 + 0.5)).alias(
            "sq9"
        ),
    )
    mu = F.col("s6").cast("double") / 1e6 / F.col("n")
    var = (F.col("sq9").cast("double") / 1e9 - F.col("n") * mu * mu) / (
        F.col("n") - 1
    )
    return (
        m.select(
            F.col("pos").alias("dim"),
            F.round(mu, 6).alias("mean"),
            F.round(var, 6).alias("variance"),
            (var < 0.001).alias("is_low_variance"),
        )
        .orderBy("variance", "dim")
        .limit(16)
    )


@register(
    "sim_1nn_label_consistency",
    group="J",
    oracle="""
    with sub as (
      select vec_id, label, embedding from embeddings
      where vec_id < 300
    ),
    pairs as (
      select a.vec_id as qa, a.label as la,
             b.vec_id as qb, b.label as lb,
             list_sum(list_transform(
               list_zip(a.embedding, b.embedding),
               p -> cast(floor(cast(p[1] as double) * p[2] * 1e12
                          + 0.5) as bigint))) as dot12
      from sub a join sub b on a.vec_id <> b.vec_id
    ),
    nn as (
      select qa, la, lb,
             row_number() over (partition by qa
               order by dot12 desc, qb) as rk
      from pairs
    )
    select la as label,
           count(*) as n_queries,
           cast(count(*) filter (where la = lb) as bigint) as n_match,
           round(cast(count(*) filter (where la = lb) as double)
                 / count(*), 6) as consistency_1nn
    from nn where rk = 1
    group by 1 order by label
    """,
)
def sim_1nn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: leave-one-out 1-NN label consistency — for each vector
    (300-vector evaluation slice), does its nearest neighbor (by
    inner product) share its label? The per-class consistency rate
    is the standard embedding-quality probe (high = classes are
    locally separable = semantic dedup and kNN search will behave;
    mm_embed_silhouette measures the same thing via centroids —
    this is the local, sample-level view). Each pairwise dot is a
    per-dimension pico-quantized integer sum (the mm_centroid
    technique applied to raw pairs), so the neighbor ranking and
    the tie-break (vec_id) are exact-integer deterministic. At
    corpus scale the eval slice stays fixed-size — this is a
    bounded diagnostic, not the ANN path (sim_topk_ivf is)."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    a = emb.alias("a")
    b = emb.alias("b")
    dot12 = F.aggregate(
        F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: F.floor(
                x.cast("double") * y * 1e12 + 0.5
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = a.join(
        b, F.col("a.vec_id") != F.col("b.vec_id")
    ).select(
        F.col("a.vec_id").alias("qa"),
        F.col("a.label").alias("la"),
        F.col("b.vec_id").alias("qb"),
        F.col("b.label").alias("lb"),
        dot12.alias("dot12"),
    )
    # argmax aggregate ≡ row_number-over-(dot12 desc, qb) + rk=1 (r9,
    # guide §2.3): one hash aggregate with map-side partials instead of
    # sorting every candidate pair per query vector.
    nn = (
        pairs.groupBy("qa")
        .agg(
            F.min(
                F.struct(
                    (-F.col("dot12")).alias("nd"),
                    F.col("qb").alias("qb"),
                    F.col("la").alias("la"),
                    F.col("lb").alias("lb"),
                )
            ).alias("m")
        )
        .select("qa", F.col("m.la").alias("la"), F.col("m.lb").alias("lb"))
    )
    return (
        nn.groupBy(F.col("la").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.count(F.when(F.col("la") == F.col("lb"), 1)).alias(
                "n_match"
            ),
            F.round(
                F.count(
                    F.when(F.col("la") == F.col("lb"), 1)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("consistency_1nn"),
        )
        .orderBy("label")
    )


@register(
    "sim_quantized_recall",
    group="J",
    oracle="""
    with sub as (
      select vec_id, embedding from embeddings where vec_id < 200
    ),
    q as (select embedding as qe from sub where vec_id = 0),
    scales as (
      select vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(cast(x as double)))) as sc
      from sub
    ),
    qs as (
      select list_max(list_transform(qe,
               x -> abs(cast(x as double)))) as qsc, qe
      from q
    ),
    full_rank as (
      select s.vec_id,
             row_number() over (order by
               list_sum(list_transform(list_zip(s.embedding, q.qe),
                 p -> cast(floor(cast(p[1] as double) * p[2] * 1e12
                      + 0.5) as bigint))) desc, s.vec_id) as rk
      from sub s cross join q
      where s.vec_id <> 0
    ),
    quant_rank as (
      select s.vec_id,
             row_number() over (order by
               list_sum(list_transform(
                 list_zip(s.embedding, qs.qe),
                 p -> cast(floor(cast(p[1] as double) / s.sc * 127
                           + 0.5) as bigint)
                      * cast(floor(cast(p[2] as double) / qs.qsc * 127
                           + 0.5) as bigint))) desc, s.vec_id) as rk
      from scales s cross join qs
      where s.vec_id <> 0
    )
    select cast((select count(*) from full_rank) as bigint)
             as n_candidates,
           cast((select count(*) from full_rank f
                 join quant_rank qr on qr.vec_id = f.vec_id
                 where f.rk <= 10 and qr.rk <= 10) as bigint)
             as top10_overlap,
           round((select count(*) from full_rank f
                  join quant_rank qr on qr.vec_id = f.vec_id
                  where f.rk <= 10 and qr.rk <= 10) / 10.0, 6)
             as recall_at_10
    """,
)
def sim_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: int8-quantization impact on retrieval — recall@10 of
    the max-abs int8 index (mm_embed_quantize's scheme) against the
    full-precision ranking for a fixed query: the accuracy-per-byte
    deal memo (4× memory saved; this measures what it costs —
    sim_recall_eval scores the ANN bucketing paths, this scores the
    CODEC). Both rankings use exact-integer deterministic scores:
    full precision via per-dim pico-quantized products, int8 via
    exact integer dot products of floor-quantized codes; ties break
    on vec_id. Fixed 200-vector eval slice — a bounded diagnostic
    like sim_1nn_label_consistency."""
    sub = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    q = sub.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cand = sub.where(F.col("vec_id") != 0)
    full_dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qe"),
            lambda x, y: F.floor(
                x.cast("double") * y * 1e12 + 0.5
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    full_rank = (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.row_number()
            .over(W.orderBy(full_dot.desc(), "vec_id"))
            .alias("rk"),
        )
    )
    sc = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    qsc = F.array_max(
        F.transform(F.col("qe"), lambda x: F.abs(x.cast("double")))
    )
    scaled = cand.select("vec_id", "embedding", sc.alias("sc"))
    qs = q.select("qe", qsc.alias("qsc"))
    quant_dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qe"),
            lambda x, y: (
                F.floor(
                    x.cast("double") / F.col("sc") * 127 + 0.5
                ).cast("long")
                * F.floor(
                    y.cast("double") / F.col("qsc") * 127 + 0.5
                ).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    quant_rank = (
        scaled.crossJoin(F.broadcast(qs))
        .select(
            "vec_id",
            F.row_number()
            .over(W.orderBy(quant_dot.desc(), "vec_id"))
            .alias("rk"),
        )
    )
    f10 = full_rank.where(F.col("rk") <= 10).select("vec_id")
    q10 = quant_rank.where(F.col("rk") <= 10).select("vec_id")
    overlap = f10.join(q10, "vec_id").agg(
        F.count(F.lit(1)).alias("top10_overlap")
    )
    # count from the candidate table, NOT full_rank: an unfiltered
    # aggregate over the ranked frame would execute the full window
    # (single-partition) that the rk<=10 consumers let
    # WindowGroupLimit prune
    n = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    return n.crossJoin(F.broadcast(overlap)).select(
        "n_candidates",
        "top10_overlap",
        F.round(F.col("top10_overlap") / 10.0, 6).alias("recall_at_10"),
    )


@register(
    "sim_ndcg_label_eval",
    group="J",
    oracle="""
    with sub as (
      select vec_id, label, embedding from embeddings
      where vec_id < 300
    ),
    q as (select embedding as qe, label as ql from sub
          where vec_id = 0),
    ranked as (
      select s.vec_id,
             case when s.label = q.ql then 1 else 0 end as rel,
             row_number() over (order by
               list_sum(list_transform(list_zip(s.embedding, q.qe),
                 p -> cast(floor(cast(p[1] as double) * p[2] * 1e12
                      + 0.5) as bigint))) desc, s.vec_id) as rk
      from sub s cross join q
      where s.vec_id <> 0
    ),
    dcg as (
      select cast(sum(cast(floor(
               rel / (ln(rk + 1) / ln(2)) * 1e9 + 0.5) as bigint))
               as bigint) as dcg9,
             cast(sum(rel) as bigint) as n_rel_in_10
      from ranked where rk <= 10
    ),
    ideal as (
      select cast(sum(cast(floor(
               1.0 / (ln(i + 1) / ln(2)) * 1e9 + 0.5) as bigint))
               as bigint) as idcg9
      from (select unnest(range(1, 11)) as i) t,
           (select least(cast(10 as bigint),
                   (select count(*) from ranked where rel = 1)) as m) mm
      where i <= mm.m
    )
    select n_rel_in_10,
           round(cast(dcg9 as double) / 1e9, 6) as dcg_at_10,
           round(cast(idcg9 as double) / 1e9, 6) as idcg_at_10,
           round(cast(dcg9 as double) / idcg9, 6) as ndcg_at_10
    from dcg, ideal
    """,
)
def sim_ndcg_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: nDCG@10 of the inner-product ranking against same-label
    relevance — the GRADED ranking metric the retrieval stack should
    be judged by (sim_recall_eval counts hits anywhere in the top-k;
    nDCG rewards putting them EARLY, which is what users and RAG
    context windows actually experience). Binary relevance = label
    match; DCG discounts are 1/log₂(rank+1) nano-quantized per rank
    (ln ratios are identical IEEE both engines); the ideal DCG uses
    min(10, #relevant) positions so nDCG ∈ [0, 1] exactly. The
    ranking reuses the exact-integer dot products of
    sim_1nn_label_consistency — same eval slice, same
    determinism."""
    sub = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    q = sub.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("label").alias("ql")
    )
    cand = sub.where(F.col("vec_id") != 0)
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qe"),
            lambda x, y: F.floor(
                x.cast("double") * y * 1e12 + 0.5
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    ranked = cand.crossJoin(F.broadcast(q)).select(
        F.when(F.col("label") == F.col("ql"), 1).otherwise(0).alias(
            "rel"
        ),
        F.row_number()
        .over(W.orderBy(dot.desc(), "vec_id"))
        .alias("rk"),
    )
    ln2 = float(__import__("math").log(2))
    dcg = ranked.where(F.col("rk") <= 10).agg(
        F.sum(
            F.floor(
                F.col("rel")
                / (F.log(F.col("rk") + 1) / ln2)
                * 1e9
                + 0.5
            )
        ).alias("dcg9"),
        F.sum("rel").alias("n_rel_in_10"),
    )
    # relevance count needs no ranks — computing it from `ranked`
    # would force the full single-partition window the rk<=10 branch
    # avoids via WindowGroupLimit
    n_rel_total = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("label") == F.col("ql"))
        .count()
    )
    m = min(10, n_rel_total)
    import math as _m

    idcg9 = sum(
        int(_m.floor(1.0 / (_m.log(i + 1) / _m.log(2)) * 1e9 + 0.5))
        for i in range(1, m + 1)
    )
    return dcg.select(
        "n_rel_in_10",
        F.round(F.col("dcg9").cast("double") / 1e9, 6).alias(
            "dcg_at_10"
        ),
        F.round(F.lit(idcg9).cast("double") / 1e9, 6).alias(
            "idcg_at_10"
        ),
        F.round(
            F.col("dcg9").cast("double") / F.lit(idcg9), 6
        ).alias("ndcg_at_10"),
    )


@register(
    "mm_embed_outlier_mahalanobis",
    group="J",
    oracle="""
    with pe as (
      select vec_id, label,
             generate_subscripts(embedding, 1) - 1 as pos,
             unnest(embedding) as v
      from embeddings
    ),
    m as (
      select label, pos,
             cast(count(*) as bigint) as n,
             cast(sum(cast(floor(v * 1e6 + 0.5) as bigint)) as bigint) as s6,
             cast(sum(cast(floor(v * v * 1e9 + 0.5) as bigint)) as bigint)
               as sq9
      from pe group by 1, 2
    ),
    stats as (
      select label, pos,
             cast(s6 as double) / 1e6 / n as mu,
             (cast(sq9 as double) / 1e9
              - n * (cast(s6 as double) / 1e6 / n)
                * (cast(s6 as double) / 1e6 / n)) / (n - 1) as var
      from m
    ),
    scored as (
      select pe.vec_id, pe.label,
             cast(sum(cast(floor(
               (cast(pe.v as double) - mu) * (cast(pe.v as double) - mu)
               / (var + 1e-9) * 1e6 + 0.5) as bigint)) as bigint) as s6
      from pe join stats
        on pe.label = stats.label and pe.pos = stats.pos
      group by 1, 2
    )
    select vec_id, label,
           round(cast(s6 as double) / 1e6, 6) as mahalanobis_sq
    from scored
    order by mahalanobis_sq desc, vec_id limit 10
    """,
)
def mm_embed_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: per-label diagonal-covariance Mahalanobis outlier scan —
    each vector scored by sum_d (v_d - mu_{label,d})^2 /
    (sigma^2_{label,d} + eps), the top-10 most out-of-class vectors
    reported. This is the embedding-space mislabeled-sample /
    corrupted-row detector that runs after every batch-inference job
    (full covariance needs a per-label 64x64 solve — the diagonal
    approximation is the standard first pass and stays in pure SQL).
    Plan: one posexplode, per-(label,pos) exact micro/nano moment
    sums (640 rows at any scale), broadcast back, and a per-vector
    micro-quantized integer sum so the 64-term addition order never
    touches a float accumulation. Shuffles on (label,pos) then
    vec_id — both key-bounded."""
    emb = load(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    )
    m = pe.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("v") * 1e6 + 0.5)).alias("s6"),
        F.sum(F.floor(F.col("v") * F.col("v") * 1e9 + 0.5)).alias("sq9"),
    )
    mu = F.col("s6").cast("double") / 1e6 / F.col("n")
    var = (
        F.col("sq9").cast("double") / 1e9 - F.col("n") * mu * mu
    ) / (F.col("n") - 1)
    stats = m.select("label", "pos", mu.alias("mu"), var.alias("var"))
    vd = F.col("v").cast("double")
    scored = (
        pe.join(F.broadcast(stats), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.floor(
                    (vd - F.col("mu"))
                    * (vd - F.col("mu"))
                    / (F.col("var") + 1e-9)
                    * 1e6
                    + 0.5
                )
            ).alias("s6")
        )
    )
    return (
        scored.select(
            "vec_id",
            "label",
            F.round(F.col("s6").cast("double") / 1e6, 6).alias(
                "mahalanobis_sq"
            ),
        )
        .orderBy(F.col("mahalanobis_sq").desc(), "vec_id")
        .limit(10)
    )
