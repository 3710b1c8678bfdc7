"""ML-prep operators — the remaining fit/transform and temporal-modeling
steps a training pipeline runs after the catalog and before the trainer:
z-score scaling, quantile binning, k-fold assignment, slowly-changing
dimension (SCD2) construction, period-over-period growth, and batch
sessionization stats. All pure DataFrame compositions: fitted state is a
small DataFrame broadcast back onto the data, never a driver-side
object, so every transform scales from sf0.001 to 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.pipeline.dedup import _jac_pairs_sql
from datalakecrawler_spark.registry import register


@register(
    "feature_standard_scale",
    group="J",
    oracle="""
    with stats as (
      select l_returnflag,
             cast(sum(cast(l_quantity as bigint)) as double)
               / count(*) as mu,
             cast(sum(cast(l_quantity * l_quantity as bigint)) as double)
               / count(*) as m2
      from lineitem group by 1
    )
    select l_orderkey, l_linenumber, l.l_returnflag, l_quantity,
           round((l_quantity - mu) / sqrt(m2 - mu * mu), 6) as qty_z
    from lineitem l join stats s on l.l_returnflag = s.l_returnflag
    where l_orderkey < 500
    """,
)
def feature_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: per-group z-score standardization — the fit (mean and
    population variance per returnflag) is one aggregation whose sums
    stay EXACT because l_quantity is integer-valued (1..50, measured
    FIXTURES.md): sum and sum-of-squares as bigint are order-independent
    in both engines, so the derived mu/sigma are bit-identical and the
    scaled value is deterministic arithmetic, policy-rounded at 6. The
    stats frame is group-count-sized (3 rows) and broadcasts back onto
    the fact — no driver round-trip, same plan shape at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    stats = li.groupBy("l_returnflag").agg(
        (F.sum(q.cast("long")).cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum((q * q).cast("long")).cast("double") / F.count(F.lit(1))).alias(
            "m2"
        ),
    )
    mu, m2 = F.col("mu"), F.col("m2")
    return (
        li.where(F.col("l_orderkey") < 500)
        .join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            F.round((q - mu) / F.sqrt(m2 - mu * mu), 6).alias("qty_z"),
        )
    )


@register(
    "feature_quantile_bucket",
    group="J",
    oracle="""
    with tiled as (
      select ntile(10) over (order by c_acctbal, c_custkey) as decile,
             c_acctbal
      from customer
    )
    select decile, count(*) as n_rows,
           round(min(c_acctbal), 6) as lo,
           round(max(c_acctbal), 6) as hi
    from tiled group by decile
    """,
)
def feature_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: equal-frequency (quantile) binning of a numeric feature —
    ntile(10) over account balance with the PK as tiebreak (§2.L trap 3)
    so bucket edges are deterministic, then per-bucket occupancy and
    [lo, hi] edge report, which is the binning table a feature store
    persists. The ntile is DISTRIBUTED since r4 (distrank exact global
    row number + closed-form ntile_from_rank — bit-identical to the
    window form), so the plan survives any row cardinality; the
    approx_percentile sketch path remains the option when even the
    range sort is too much."""
    from datalakecrawler_spark.distrank import (
        ntile_from_rank,
        with_global_row_number,
    )

    c = load(spark, sf_dir, "customer")
    r = with_global_row_number(
        c.select("c_acctbal", "c_custkey"),
        spark,
        ["c_acctbal", "c_custkey"],
        out="rn",
        with_total="n",
    )
    return (
        r.select(
            ntile_from_rank(F.col("rn"), F.col("n"), 10).alias("decile"),
            "c_acctbal",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("c_acctbal"), 6).alias("lo"),
            F.round(F.max("c_acctbal"), 6).alias("hi"),
        )
    )


@register(
    "split_kfold",
    group="J",
    oracle="""
    with folds as (
      select cast(('0x' || substr(md5('fold|' || cast(doc_id as varchar)), 1, 8))
                  as bigint) % 5 as fold,
             n_chars
      from documents
    )
    select fold, count(*) as n_docs,
           cast(sum(n_chars) as bigint) as total_chars
    from folds group by fold
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: deterministic k-fold cross-validation assignment — fold =
    portable_hash('fold|' || doc_id) mod 5, the same first-8-hex-of-md5
    recipe as the samplers (§2.L trap 7: Spark xxhash64 has no DuckDB
    twin). Hash-mod splitting is the only fold assignment that is stable
    under re-partitioning, re-ordering, and incremental data arrival —
    exactly what a 100 TB corpus needs so fold membership never shifts
    between runs. Output is the per-fold size/char audit used to check
    balance before training."""
    d = load(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold|"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    return (
        d.select(fold.alias("fold"), "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "dim_scd2_build",
    group="J",
    oracle="""
    with seg as (
      select user_id, ts, event_type,
             lag(event_type) over (partition by user_id order by ts, event_id)
               as prev_type,
             event_id
      from events where user_id < 50
    ), changes as (
      select user_id, ts as valid_from, event_type, event_id
      from seg
      where prev_type is null or prev_type <> event_type
    )
    select user_id, event_type, valid_from,
           coalesce(lead(valid_from) over (partition by user_id
                                           order by valid_from, event_id),
                    timestamp '2200-01-01 00:00:00') as valid_to,
           cast(lead(valid_from) over (partition by user_id
                                       order by valid_from, event_id) is null
                as integer) as is_current
    from changes
    """,
)
def dim_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: build a Type-2 slowly-changing dimension from an event
    log — collapse consecutive identical states per user (lag-compare),
    then derive [valid_from, valid_to) intervals with lead() and an
    open-ended 2200-01-01 sentinel plus an is_current flag. The
    sentinel is deliberately INSIDE Arrow's ns-timestamp range (max
    2262-04-11): the classic 9999-12-31 convention cannot round-trip
    through Arrow/pandas (ArrowInvalid on toPandas), which breaks any
    pandas-based consumer of the dimension — including the external
    correctness driver's canonicalizer. This is the
    canonical warehouse pattern for turning a 100 TB change stream into
    a point-in-time joinable dimension; both windows partition by
    user_id so the whole build is one shuffle on the natural key, and
    event_id tiebreaks make interval edges deterministic (§2.L trap 3)."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seg.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", F.col("ts").alias("valid_from"), "event_type", "event_id")
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.coalesce(nxt, F.lit("2200-01-01 00:00:00").cast("timestamp")).alias(
            "valid_to"
        ),
        nxt.isNull().cast("int").alias("is_current"),
    )


@register(
    "win_period_growth",
    group="F",
    oracle="""
    with monthly as (
      select date_trunc('month', o_orderdate) as month,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) as double)
               / 1e6 as revenue
      from orders group by 1
    )
    select month, round(revenue, 2) as revenue,
           round(100.0 * (revenue - lag(revenue) over (order by month))
                 / lag(revenue) over (order by month), 6) as mom_pct
    from monthly
    """,
)
def win_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: period-over-period growth — monthly revenue with
    month-over-month percent change via lag() over the pre-aggregated
    monthly frame. The window runs over ~tens of rows regardless of
    input scale (aggregate first, window second — the only safe order
    at 100 TB); revenue uses the micro-unit exact-sum policy so the
    growth ratio is engine-identical before its round-at-6."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        # cast to DATE: DuckDB's date_trunc('month', ts) yields DATE,
        # Spark's yields TIMESTAMP — align the output type for the hash
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        (F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double") / 1e6)
        .alias("revenue")
    )
    prev = F.lag("revenue").over(W.orderBy("month"))
    return monthly.select(
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 6).alias("mom_pct"),
    )


@register(
    "events_session_stats",
    group="J",
    oracle="""
    with marked as (
      select user_id, ts, event_id,
             case when lag(ts) over (partition by user_id
                                     order by ts, event_id) is null
                    or date_diff('second',
                         lag(ts) over (partition by user_id
                                       order by ts, event_id), ts) > 1800
                  then 1 else 0 end as is_new
      from events
    ), sess as (
      select user_id, ts, event_id,
             sum(is_new) over (partition by user_id order by ts, event_id
                               rows between unbounded preceding and current row)
               as session_no
      from marked
    ), per_session as (
      select user_id, session_no, count(*) as n_events,
             date_diff('second', min(ts), max(ts)) as dur_s
      from sess group by user_id, session_no
    )
    select count(*) as n_sessions,
           round(avg(n_events), 6) as avg_events,
           round(avg(dur_s), 6) as avg_dur_s,
           max(n_events) as max_events
    from per_session
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: batch sessionization audit — gaps-and-islands with a
    30-minute inactivity gap (lag + cumulative sum of new-session
    markers, the batch twin of stream_session_window's state machine),
    then corpus-level session KPIs: count, mean events/session, mean
    duration, max burst. Both windows and the per-session groupBy
    partition on user_id, so the whole job is ONE shuffle of the event
    log on its natural key — the layout a clickstream warehouse already
    buckets by, making this scan-plus-one-exchange at 100 TB."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_ts.isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "dur_s"
        ),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
        F.round(F.avg("dur_s"), 6).alias("avg_dur_s"),
        F.max("n_events").alias("max_events"),
    )


@register(
    "mlprep_negative_sampling",
    group="J",
    oracle="""
    with anchors as (
      select vec_id as anchor_id, label as anchor_label
      from embeddings where vec_id < 100
    ),
    ranked as (
      select anchor_id, e.vec_id as neg_vec_id, e.label as neg_label,
             row_number() over (
               partition by anchor_id
               order by md5(concat(cast(anchor_id as varchar), '-',
                                   cast(e.vec_id as varchar))), e.vec_id
             ) as neg_rank
      from anchors a
      join embeddings e
        on e.vec_id <> a.anchor_id and e.label <> a.anchor_label
    )
    select anchor_id, neg_rank, neg_vec_id, neg_label
    from ranked where neg_rank <= 3
    order by anchor_id, neg_rank
    """,
)
def mlprep_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: deterministic negative sampling for contrastive training
    — for each anchor vector, k=3 negatives drawn from OTHER classes,
    ranked by a content hash md5(anchor-candidate) instead of rand():
    the sample is reproducible across engines, runs, and
    partitionings, so a training run can be audited and exactly
    re-materialized (same argument as sample_hash_reservoir, applied
    per-anchor). The class constraint (label ≠ anchor label) is what
    makes these true negatives rather than potential false ones.
    Anchor set bounded to 100 for the demo; at 100 TB the candidate
    join is hash-bucketed (join on a truncated-hash band instead of
    the full cross product) — the per-anchor top-k then probes one
    bucket, the same pre-filter pattern as the LSH dedup family."""
    e = load(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label")
    )
    cands = e.select(
        F.col("vec_id").alias("neg_vec_id"), F.col("label").alias("neg_label")
    )
    pairs = anchors.join(
        cands,
        (F.col("neg_vec_id") != F.col("anchor_id"))
        & (F.col("neg_label") != F.col("anchor_label")),
    )
    rk = F.row_number().over(
        W.partitionBy("anchor_id").orderBy(
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit("-"),
                    F.col("neg_vec_id").cast("string"),
                )
            ),
            "neg_vec_id",
        )
    )
    return (
        pairs.withColumn("neg_rank", rk)
        .where(F.col("neg_rank") <= 3)
        .select("anchor_id", "neg_rank", "neg_vec_id", "neg_label")
        .orderBy("anchor_id", "neg_rank")
    )


@register(
    "sample_balanced_classes",
    group="J",
    oracle="""
    with ranked as (
      select lang, doc_id,
             row_number() over (partition by lang
               order by md5(cast(doc_id as varchar)), doc_id) as rk
      from documents
    ),
    mins as (
      select min(cnt) as min_cnt from (
        select count(*) as cnt from documents group by lang) c
    ),
    kept as (
      select lang from ranked, mins where rk <= min_cnt
    )
    select r.lang,
           count(*) as n_before,
           (select count(*) from kept k where k.lang = r.lang) as n_after
    from documents r
    group by r.lang
    order by r.lang
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: class-balanced downsampling — truncate every language to
    the minority-class count so a classifier's training mix is
    uniform (the complement of sample_stratified, which PRESERVES
    proportions; this EQUALIZES them). Selection must be deterministic
    AND unbiased, so rows are ranked by md5(doc_id) — a stable
    pseudo-random order both engines compute identically — and the
    first min_count per class are kept. One window over
    lang-partitioned docs + a broadcast scalar; at 100 TB the
    full-sort-per-class becomes a per-class threshold on the hash
    value instead (keep if hash < quota/class_count quantile), which
    needs no sort at all — same keys, same statistical guarantee."""
    d = load(spark, sf_dir, "documents")
    ranked = d.select(
        "lang",
        "doc_id",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rk"),
    )
    mins = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("min_cnt"))
    )
    kept = ranked.crossJoin(F.broadcast(mins)).filter(
        F.col("rk") <= F.col("min_cnt")
    )
    before = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after"))
    return (
        before.join(after, "lang", "left")
        .na.fill({"n_after": 0})
        .orderBy("lang")
    )


@register(
    "mlprep_curriculum_buckets",
    group="J",
    oracle="""
    with staged as (
      select lang, n_chars,
             ntile(5) over (order by n_chars, doc_id) as stage
      from documents
    )
    select stage,
           count(*) as n_docs,
           cast(min(n_chars) as bigint) as min_chars,
           cast(max(n_chars) as bigint) as max_chars,
           round(cast(sum(n_chars) as double) / count(*), 4) as avg_chars,
           count(distinct lang) as n_langs
    from staged group by 1 order by stage
    """,
)
def mlprep_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: curriculum staging — order the corpus by a difficulty
    proxy (document length) and cut it into 5 equal training stages,
    reporting each stage's composition (the curriculum-learning
    prep: short/simple docs first, long ones last; pack_sequences
    then packs each stage). ntile over (n_chars, doc_id) is fully
    deterministic; per-stage stats are exact ints and one exact
    ratio. The ntile is DISTRIBUTED since r4 (distrank row number +
    closed-form ntile_from_rank): one range shuffle of the doc-grain
    frame, no single-partition window, bit-identical stages."""
    from datalakecrawler_spark.distrank import (
        ntile_from_rank,
        with_global_row_number,
    )

    d = load(spark, sf_dir, "documents")
    r = with_global_row_number(
        d.select("lang", "n_chars", "doc_id"),
        spark,
        ["n_chars", "doc_id"],
        out="rn",
        with_total="n",
    )
    staged = r.select(
        "lang",
        "n_chars",
        ntile_from_rank(F.col("rn"), F.col("n"), 5).alias("stage"),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("stage")
    )


@register(
    "dedup_rate_by_source",
    group="J",
    oracle="""
    with h as (
      select source, md5(text) as th from documents
    ),
    dup as (
      select th, count(*) as n from h group by 1
    )
    select h.source,
           count(*) as n_docs,
           count(*) filter (where dup.n > 1) as n_in_dup_groups,
           round(cast(count(*) filter (where dup.n > 1) as double)
                 / count(*), 6) as dup_rate
    from h join dup on dup.th = h.th
    group by 1 order by h.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: duplication rate per source — the contamination
    scorecard that decides which feeds get down-weighted in the
    corpus mixture (dedup_exact removes duplicates; this ATTRIBUTES
    them: a source whose rows mostly collide with the corpus is a
    scraper echo). A doc is 'in a dup group' when its exact text
    hash occurs >1 time corpus-wide — note cross-source collisions
    count for both sources, which is the point. One hash projection,
    one group count, one hash-keyed join back (shuffle on th, both
    sides pre-aggregated); exact-count ratio at 6."""
    d = load(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("th"))
    dup = h.groupBy("th").agg(F.count(F.lit(1)).alias("n"))
    return (
        h.join(dup, "th")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("n") > 1, 1)).alias("n_in_dup_groups"),
            F.round(
                F.count(F.when(F.col("n") > 1, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "events_entropy_per_user",
    group="J",
    oracle="""
    with uc as (
      select user_id, event_type, cast(count(*) as bigint) as c
      from events group by 1, 2
    ),
    ut as (
      select user_id, event_type, c,
             sum(c) over (partition by user_id) as n
      from uc
    ),
    ue as (
      select user_id,
             sum(cast(floor(-(cast(c as double) / n)
                 * ln(cast(c as double) / n) * 1e9 + 0.5) as bigint))
               as h9,
             count(*) as n_types
      from ut group by 1
    )
    select count(*) as n_users,
           round(cast(sum(h9) as double) / count(*) / 1e9, 6)
             as avg_entropy_nats,
           round(cast(min(h9) as double) / 1e9, 6) as min_entropy,
           round(cast(max(h9) as double) / 1e9, 6) as max_entropy,
           round(cast(count(*) filter (where n_types = 1) as double)
                 / count(*), 6) as single_type_user_rate
    from ue
    """,
)
def events_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: behavioral entropy per user — how diverse each user's
    action mix is (0 nats = single-action bots/scrapers; high =
    engaged explorers), aggregated to the population summary a
    monitoring dashboard tracks. catalog_column_entropy is the
    COLUMN-level version; this is the per-ENTITY distribution. Each
    −p·ln p term is nano-quantized BEFORE the per-user sum (the ≤5
    per-type terms would otherwise add in engine-specific order), so
    per-user entropies are exact ints and every population statistic
    (mean, min, max, bot-rate) is integer-derived. Two rollups on
    the same user_id shuffle key."""
    e = load(spark, sf_dir, "events")
    uc = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    ut = uc.select(
        "user_id",
        "c",
        F.sum("c").over(W.partitionBy("user_id")).alias("n"),
    )
    p = F.col("c").cast("double") / F.col("n")
    ue = ut.groupBy("user_id").agg(
        F.sum(F.floor(-p * F.log(p) * 1e9 + 0.5)).alias("h9"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return ue.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.sum("h9").cast("double") / F.count(F.lit(1)) / 1e9, 6
        ).alias("avg_entropy_nats"),
        F.round(F.min("h9").cast("double") / 1e9, 6).alias("min_entropy"),
        F.round(F.max("h9").cast("double") / 1e9, 6).alias("max_entropy"),
        F.round(
            F.count(F.when(F.col("n_types") == 1, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("single_type_user_rate"),
    )


@register(
    "mlprep_dataset_card",
    group="J",
    oracle="""
    with tagged as (
      select doc_id, lang, source, n_chars, md5(text) as th,
             case when (doc_id * 2654435761) % 100 < 80
                  then 'train' else 'holdout' end as split
      from documents
    ),
    dup as (select th, count(*) as k from tagged group by 1),
    j as (select t.*, dup.k from tagged t join dup using (th)),
    langs as (
      select split, lang, cast(count(*) as bigint) as c
      from j group by 1, 2
    ),
    ltot as (
      select split, cast(sum(c) as bigint) as tc from langs group by 1
    ),
    lang_h as (
      select langs.split,
             cast(floor(-(cast(c as double) / tc)
                 * ln(cast(c as double) / tc) * 1e9 + 0.5) as bigint)
               as h9
      from langs join ltot using (split)
    ),
    hh as (select split, cast(sum(h9) as bigint) as h9 from lang_h
           group by 1)
    select j.split,
           count(*) as n_docs,
           cast(sum(j.n_chars) as bigint) as total_chars,
           count(distinct j.lang) as n_langs,
           count(distinct j.source) as n_sources,
           round(cast(count(*) filter (where j.k > 1) as double)
                 / count(*), 6) as dup_rate,
           round(cast(max(hh.h9) as double) / 1e9, 6) as lang_entropy
    from j join hh on hh.split = j.split
    group by 1 order by j.split
    """,
)
def mlprep_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the dataset card — per split (deterministic 80/20 Knuth
    multiplicative-hash assignment, the split_train_holdout rule): row count, total
    characters, language/source cardinalities, exact-dup pressure,
    and language-mix entropy. This is the datasheet artifact a
    training-data release ships (Datasheets for Datasets /
    Model Cards lineage) and the summary every downstream consumer
    reads FIRST — composed entirely from operators the repo already
    proves individually (hash split, dup audit, entropy), here as
    ONE plan so the card is internally consistent (same snapshot,
    same split). Entropy terms nano-quantized; everything else exact
    counts. Two shuffles: the dup rollup on text hash and the split
    rollup."""
    d = load(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("th"),
        F.when(
            (F.col("doc_id") * 2654435761) % 100 < 80, "train"
        )
        .otherwise("holdout")
        .alias("split"),
    )
    dup = tagged.groupBy("th").agg(F.count(F.lit(1)).alias("k"))
    j = tagged.join(dup, "th")
    langs = j.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot_w = W.partitionBy("split")
    p = F.col("c").cast("double") / F.sum("c").over(tot_w)
    lang_h = langs.select(
        "split", F.floor(-p * F.log(p) * 1e9 + 0.5).alias("h9")
    )
    hh = lang_h.groupBy("split").agg(F.sum("h9").alias("h9"))
    return (
        j.join(F.broadcast(hh), "split")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
            F.count_distinct("source").alias("n_sources"),
            F.round(
                F.count(F.when(F.col("k") > 1, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
            F.round(F.max("h9").cast("double") / 1e9, 6).alias(
                "lang_entropy"
            ),
        )
        .orderBy("split")
    )


@register(
    "corpus_importance_weights",
    group="J",
    oracle="""
    with src as (
      select source, cast(count(*) as bigint) as c from documents
      group by 1
    ),
    tot as (
      select cast(sum(c) as bigint) as n,
             cast(count(*) as bigint) as k
      from src
    )
    select source, c as n_docs,
           round(cast(c as double) / n, 6) as current_share,
           round(1.0 / k, 6) as target_share,
           round((1.0 / k) / (cast(c as double) / n), 6) as weight,
           round((cast(n as double) * n / k / k) / c, 4)
             as effective_docs
    from src, tot
    order by source
    """,
)
def corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: importance weights to reach a target corpus mixture —
    per source: weight = target_share / current_share (uniform
    target here; any target vector drops in), plus the per-source
    effective sample size n·w²-normalized ((Σw)²/Σw² with constant
    within-source weights collapses to n_target²/c) — the number
    that says how much statistical power survives the reweighting
    (a 10× upweighted source contributes many epochs of the same
    few docs). This is the sampling-weights half of
    corpus_mixture_balance's diagnosis, and what
    sample_quality_weighted consumes. One rollup + a two-scalar
    broadcast; all exact-count ratios in fixed order."""
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = src.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    cur = F.col("c").cast("double") / F.col("n")
    tgt = 1.0 / F.col("k")
    return (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("c").alias("n_docs"),
            F.round(cur, 6).alias("current_share"),
            F.round(tgt, 6).alias("target_share"),
            F.round(tgt / cur, 6).alias("weight"),
            F.round(
                (
                    F.col("n").cast("double")
                    * F.col("n")
                    / F.col("k")
                    / F.col("k")
                )
                / F.col("c"),
                4,
            ).alias("effective_docs"),
        )
        .orderBy("source")
    )


@register(
    "mlprep_epoch_shuffle_stats",
    group="J",
    oracle="""
    with r as (
      select doc_id,
             row_number() over (order by
               md5(cast(doc_id as varchar) || '|0'), doc_id) as rk0,
             row_number() over (order by
               md5(cast(doc_id as varchar) || '|1'), doc_id) as rk1
      from documents
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(rk0) as bigint) as s0,
             cast(sum(rk1) as bigint) as s1,
             cast(sum(rk0 * rk1) as bigint) as s01,
             cast(sum(rk0 * rk0) as bigint) as s00,
             cast(sum(rk1 * rk1) as bigint) as s11
      from r
    ),
    head_overlap as (
      select cast(count(*) as bigint) as k
      from r, m where rk0 * 10 <= n and rk1 * 10 <= n
    )
    select m.n as n_docs,
           round((cast(m.n as double) * s01
                  - cast(s0 as double) * s1)
                 / sqrt((cast(m.n as double) * s00
                         - cast(s0 as double) * s0)
                        * (cast(m.n as double) * s11
                           - cast(s1 as double) * s1)), 6)
             as epoch_rank_correlation,
           head_overlap.k as first_decile_overlap,
           round(cast(head_overlap.k as double)
                 / (cast(m.n as double) / 100), 6)
             as head_overlap_vs_random
    from m, head_overlap
    """,
)
def mlprep_epoch_shuffle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: epoch-shuffle decorrelation audit — two training epochs
    order the corpus by md5(doc|epoch); this verifies the orders are
    actually independent: rank correlation between epoch-0 and
    epoch-1 positions (should be ≈ 0 — a correlated shuffle means
    the model sees near-identical batch sequences every epoch,
    hurting convergence) plus the first-decile overlap against its
    random expectation n/100 (ratio ≈ 1; ≫1 means the two epochs
    front-load the same documents). Hash-ranked shuffling is the
    distributed, resumable way to shuffle (no global RNG state —
    the sample_balanced_classes discipline); this operator is its
    unit-test-as-query. Integer ranks, exact moment sums, the
    shared fixed-order Pearson."""
    from datalakecrawler_spark.distrank import with_global_row_number

    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("|0"))
        ).alias("h0"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("|1"))
        ).alias("h1"),
    )
    r = with_global_row_number(keyed, spark, ["h0", "doc_id"], out="rk0")
    r = with_global_row_number(r, spark, ["h1", "doc_id"], out="rk1")
    r = r.select("doc_id", "rk0", "rk1")
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rk0").alias("s0"),
        F.sum("rk1").alias("s1"),
        F.sum(F.col("rk0") * F.col("rk1")).alias("s01"),
        F.sum(F.col("rk0") * F.col("rk0")).alias("s00"),
        F.sum(F.col("rk1") * F.col("rk1")).alias("s11"),
    )
    overlap = (
        r.crossJoin(F.broadcast(m.select("n")))
        .where(
            (F.col("rk0") * 10 <= F.col("n"))
            & (F.col("rk1") * 10 <= F.col("n"))
        )
        .agg(F.count(F.lit(1)).alias("k"))
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("s01") - F.col("s0").cast("double") * F.col("s1")
    den = F.sqrt(
        (nd * F.col("s00") - F.col("s0").cast("double") * F.col("s0"))
        * (nd * F.col("s11") - F.col("s1").cast("double") * F.col("s1"))
    )
    return m.crossJoin(F.broadcast(overlap)).select(
        F.col("n").alias("n_docs"),
        F.round(num / den, 6).alias("epoch_rank_correlation"),
        F.col("k").alias("first_decile_overlap"),
        F.round(F.col("k").cast("double") / (nd / 100), 6).alias(
            "head_overlap_vs_random"
        ),
    )


@register(
    "split_leakage_audit",
    group="J",
    oracle="""
    with tagged as (
      select md5(text) as th,
             case when (doc_id * 2654435761) % 100 < 80
                  then 'train' else 'holdout' end as split
      from documents
    ),
    grp as (
      select th, cast(count(*) as bigint) as k,
             cast(count(distinct split) as bigint) as n_splits,
             cast(sum(case when split = 'holdout' then 1 else 0 end)
                  as bigint) as n_holdout
      from tagged group by 1
    ),
    tot as (
      select cast(count(*) as bigint) as n_groups,
             cast(sum(case when k > 1 then 1 else 0 end) as bigint)
               as n_dup_groups,
             cast(sum(case when k > 1 and n_splits = 2 then 1 else 0 end)
                  as bigint) as n_leaking_groups,
             cast(sum(case when k > 1 and n_splits = 2 then n_holdout
                           else 0 end) as bigint) as n_holdout_docs_leaked
      from grp
    )
    select n_groups, n_dup_groups, n_leaking_groups, n_holdout_docs_leaked,
           round(cast(n_leaking_groups as double)
                 / nullif(n_dup_groups, 0), 6) as leak_rate
    from tot
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: train/holdout contamination audit — exact-duplicate text
    groups (md5 of raw text, the dedup_exact key) whose members
    STRADDLE the hash split (the same multiplicative-hash assignment
    as mlprep_dataset_card / split_train_holdout). Eval leakage via
    duplicated documents is the canonical silent benchmark inflation
    in LLM training; this is the pre-training gate that catches it.
    One hash rollup carrying (size, distinct-splits, holdout-member
    count) — map-combinable, linear at 100 TB; the verdict row is
    four exact integers and one gated ratio."""
    d = load(spark, sf_dir, "documents")
    tagged = d.select(
        F.md5("text").alias("th"),
        F.when((F.col("doc_id") * 2654435761) % 100 < 80, "train")
        .otherwise("holdout")
        .alias("split"),
    )
    grp = tagged.groupBy("th").agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct("split").alias("n_splits"),
        F.sum(F.when(F.col("split") == "holdout", 1).otherwise(0)).alias(
            "n_holdout"
        ),
    )
    leak = F.col("k") > 1
    straddle = leak & (F.col("n_splits") == 2)
    tot = grp.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(leak, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.when(straddle, 1).otherwise(0)).alias("n_leaking_groups"),
        F.sum(F.when(straddle, F.col("n_holdout")).otherwise(0)).alias(
            "n_holdout_docs_leaked"
        ),
    )
    return tot.select(
        "n_groups",
        "n_dup_groups",
        "n_leaking_groups",
        "n_holdout_docs_leaked",
        F.round(
            F.col("n_leaking_groups").cast("double")
            / F.nullif(F.col("n_dup_groups"), F.lit(0)),
            6,
        ).alias("leak_rate"),
    )


@register(
    "corpus_sampling_plan",
    group="J",
    oracle="""
    with tok as (
      select source,
             cast(sum(len(string_split(text, ' '))) as bigint) as toks
      from documents group by 1
    ),
    tot as (
      select cast(sum(toks) as bigint) as total,
             cast(count(*) as bigint) as ns
      from tok
    )
    select source, toks as n_tokens,
           round(1.0 / ns, 6) as target_weight,
           round(least(1.0, (0.5 * total / ns) / toks), 6) as sample_rate,
           cast(ceil((0.5 * total / ns) / toks) as bigint) as epochs
    from tok, tot order by source
    """,
)
def corpus_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: training-mixture sampling plan — given a token budget
    (50% of the corpus) and a target mixture (uniform across
    sources), the per-source sample RATE (downsample factor for
    over-represented sources) and EPOCH count (repeat factor for
    under-represented ones). This is the data-mixology table every
    LLM pretraining run is driven by (the Llama/Pile-style 'weights
    and epochs' sheet), derived here entirely warehouse-side: one
    token-count rollup (map-combinable size(split()) — no Python),
    then closed-form planning math on a source-sized table. Token
    counts exact ints; rate/epochs are fixed-order IEEE with one
    division chain."""
    d = load(spark, sf_dir, "documents")
    tok = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("toks")
    )
    tot = tok.agg(
        F.sum("toks").alias("total"), F.count(F.lit(1)).alias("ns")
    )
    j = tok.crossJoin(F.broadcast(tot))
    needed = 0.5 * F.col("total") / F.col("ns")
    return j.select(
        "source",
        F.col("toks").alias("n_tokens"),
        F.round(1.0 / F.col("ns"), 6).alias("target_weight"),
        F.round(F.least(F.lit(1.0), needed / F.col("toks")), 6).alias(
            "sample_rate"
        ),
        F.ceil(needed / F.col("toks")).cast("long").alias("epochs"),
    ).orderBy("source")


@register(
    "mlprep_padding_efficiency",
    group="J",
    oracle="""
    with lens as (
      select doc_id, len(string_split(text, ' ')) as n_tok,
             cast(('0x' || substring(md5(cast(doc_id as varchar) || '|pad'), 1, 8))
               as bigint) as coin
      from documents
    ),
    rnd as (
      select n_tok,
             (row_number() over (order by coin, doc_id) - 1) // 32 as batch
      from lens
    ),
    srt as (
      select n_tok,
             (row_number() over (order by n_tok, doc_id) - 1) // 32 as batch
      from lens
    ),
    r as (
      select sum(mx * n - s) as pad, sum(s) as tok from (
        select max(n_tok) as mx, count(*) as n, sum(n_tok) as s
        from rnd group by batch)
    ),
    s as (
      select sum(mx * n - s) as pad, sum(s) as tok from (
        select max(n_tok) as mx, count(*) as n, sum(n_tok) as s
        from srt group by batch)
    )
    select 'random' as strategy,
           cast(pad as bigint) as padding_tokens,
           cast(tok as bigint) as real_tokens,
           round(pad * 1.0 / (pad + tok), 6) as waste_fraction
    from r
    union all
    select 'length_sorted', cast(pad as bigint), cast(tok as bigint),
           round(pad * 1.0 / (pad + tok), 6)
    from s
    """,
)
def mlprep_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficiency audit for batch assembly (the public
    length-grouped-batching practice in LLM trainers): form batch-32
    groups two ways — deterministic-random order (md5 coin) vs sorted
    by token length — and compare padding waste (each batch pads to
    its max length). The waste delta IS the throughput argument for
    length-grouped batching. Length computation is one scan; each
    strategy is a distributed exact row number (distrank, r4 — no
    global window at any corpus size) + grouped rollup."""
    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|pad"))), 1, 8
            ),
            16,
            10,
        ).cast("long").alias("coin"),
    )

    def waste(df: DataFrame, order_cols, strategy: str) -> DataFrame:
        from datalakecrawler_spark.distrank import with_global_row_number

        ranked = with_global_row_number(df, spark, order_cols, out="__rn")
        batched = ranked.select(
            "n_tok",
            ((F.col("__rn") - 1) / 32).cast("long").alias("batch"),
        )
        per_batch = batched.groupBy("batch").agg(
            F.max("n_tok").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tok").alias("s"),
        )
        return per_batch.agg(
            F.lit(strategy).alias("strategy"),
            F.sum(F.col("mx") * F.col("n") - F.col("s")).alias("padding_tokens"),
            F.sum("s").alias("real_tokens"),
            F.round(
                F.sum(F.col("mx") * F.col("n") - F.col("s"))
                / (
                    F.sum(F.col("mx") * F.col("n") - F.col("s"))
                    + F.sum("s")
                ),
                6,
            ).alias("waste_fraction"),
        )

    rnd = waste(lens, [F.col("coin"), F.col("doc_id")], "random")
    srt = waste(lens, [F.col("n_tok"), F.col("doc_id")], "length_sorted")
    return rnd.unionByName(srt)


@register(
    "mlprep_dedup_aware_split",
    group="J",
    oracle="with recursive "
    + _jac_pairs_sql(k=3, tau=0.8)
    + """,
    edges as materialized (
        select doc_a as a, doc_b as b from jpairs
        union select doc_b, doc_a from jpairs
    ),
    reach as (
        select a as node, b as peer from edges
        union
        select r.node, e.b from reach r join edges e on e.a = r.peer
    ),
    labels as (
        select node, least(node, min(peer)) as comp from reach group by node
    ),
    clustered as (
      select d.doc_id, coalesce(l.comp, d.doc_id) as cluster_key
      from documents d left join labels l on l.node = d.doc_id
    ),
    assigned as (
      select doc_id, cluster_key,
             case when cast(('0x' || substring(md5(cast(cluster_key as varchar)
                    || '|split'), 1, 8)) as bigint) < 0.8 * 4294967296
                  then 'train' else 'holdout' end as side
      from clustered
    )
    select side,
           count(*) as n_docs,
           count(distinct cluster_key) as n_clusters,
           (select count(*) from (
              select cluster_key from assigned
              group by cluster_key having count(distinct side) > 1))
             as n_leaky_clusters
    from assigned group by side
    """,
)
def mlprep_dedup_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/holdout split — the leakage control an LLM
    data pipeline MUST have: near-duplicate documents (MinHash-LSH
    τ-graph components) are assigned to a side as a CLUSTER, keyed by
    a deterministic md5 coin on the cluster keeper, so no near-dup
    pair ever straddles the split (the n_leaky_clusters column proves
    0). Singletons are their own cluster. Composes the components
    operator with the hash-split discipline of split_train_holdout;
    one extra broadcast join over the doc table at any scale."""
    from datalakecrawler_spark.pipeline.dedup import connected_components
    from datalakecrawler_spark.registry import all_queries

    d = load(spark, sf_dir, "documents")
    pairs = all_queries()["dedup_near_minhash"].fn(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges)
    clustered = d.join(
        F.broadcast(labels.withColumnRenamed("node", "doc_id")), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_key")
    )
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.col("cluster_key").cast("string"), F.lit("|split"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    assigned = clustered.withColumn(
        "side",
        F.when(coin < F.lit(0.8) * 4294967296, "train").otherwise("holdout"),
    )
    leaky = (
        assigned.groupBy("cluster_key")
        .agg(F.countDistinct("side").alias("n_sides"))
        .where(F.col("n_sides") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaky_clusters"))
    )
    return (
        assigned.groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_key").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leaky))
    )


@register(
    "mlprep_pack_concat_chunks",
    group="J",
    oracle="""
    with docs as (
      select source, doc_id,
             cast(len(string_split(text, ' ')) as bigint) as n_tok
      from documents
    ),
    off as (
      select source, doc_id, n_tok,
             sum(n_tok) over (partition by source order by doc_id
                              rows unbounded preceding) as off_end
      from docs
    ),
    marked as (
      select source, n_tok,
             (off_end - n_tok) // 256 as first_bin,
             (off_end - 1) // 256 as last_bin
      from off
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_tok) as bigint) as total_tokens,
           cast(max(last_bin) + 1 as bigint) as n_bins,
           cast(count(*) filter (where last_bin > first_bin) as bigint)
             as n_boundary_docs,
           round(sum(n_tok) * 1.0 / ((max(last_bin) + 1) * 256), 6)
             as utilization
    from marked group by source order by source
    """,
)
def mlprep_pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: concat-and-chunk sequence packing — the GPT-style packing
    plan: per source shard, documents are concatenated in doc_id order
    and sliced into fixed 256-token context windows; reported per
    source: window count, how many documents straddle a window
    boundary (these get split across training sequences — the
    cross-document-attention contamination the packing policy must
    budget for), and utilization (1.0 minus tail padding; concat-chunk
    pads only the final window, which is WHY it beats pad-per-doc —
    compare mlprep_padding_efficiency's waste numbers).

    Everything is one running-sum window per shard: a doc spans
    [off_end − n_tok, off_end) in the concatenated token stream, so
    its first/last window ids are integer divisions — no explode of
    the token stream. Partitioning by source keeps the window
    parallel (packing needs per-shard order, not global order — the
    property that makes this scale; a global orderBy would serialize
    at 100 TB)."""
    B = 256
    d = load(spark, sf_dir, "documents")
    docs = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = docs.withColumn("off_end", F.sum("n_tok").over(w))
    marked = off.select(
        "source",
        "n_tok",
        F.expr(f"(off_end - n_tok) div {B}").alias("first_bin"),
        F.expr(f"(off_end - 1) div {B}").alias("last_bin"),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.max("last_bin") + 1).alias("n_bins"),
            F.sum(
                (F.col("last_bin") > F.col("first_bin")).cast("long")
            ).alias("n_boundary_docs"),
            F.round(
                F.sum("n_tok") * 1.0 / ((F.max("last_bin") + 1) * B), 6
            ).alias("utilization"),
        )
        .orderBy("source")
    )


@register(
    "mlprep_token_budget_plan",
    group="J",
    oracle="""
    with w as (
        select * from (values ('en', 0.4), ('de', 0.2), ('es', 0.2),
                              ('fr', 0.1), ('zh', 0.1)) w(lang, weight)
    ),
    avail as (
        select lang,
               cast(sum(len(string_split(text, ' '))) as bigint)
                   as available_tokens
        from documents group by lang
    ),
    tot as (
        select cast(sum(available_tokens) as bigint) as total_avail
        from avail
    )
    select a.lang,
           a.available_tokens,
           cast(round(w.weight * 0.6 * tot.total_avail, 0) as bigint)
               as target_tokens,
           round(w.weight * 0.6 * tot.total_avail
                 / a.available_tokens, 6) as sample_rate,
           cast(ceil(w.weight * 0.6 * tot.total_avail
                     / a.available_tokens) as bigint) as n_epochs,
           w.weight * 0.6 * tot.total_avail > a.available_tokens
               as needs_repeat
    from avail a join w on w.lang = a.lang cross join tot
    order by a.lang
    """,
)
def mlprep_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data BUDGET planning — the calculation every LLM run
    does before touching a byte: given target mixture weights per
    language and a total token budget (0.6× the corpus here), derive
    per-stratum sampling rate and epoch count. rate < 1 → subsample
    (hand the rate to sample_stratified_hash / filter_deterministic_
    sample so the subsample is reproducible); rate > 1 → the stratum
    must REPEAT (needs_repeat), and n_epochs = ⌈rate⌉ is the repeat
    factor whose last epoch is partial. The whole plan is one
    per-stratum aggregate + a broadcast 5-row weight table + one
    scalar total — no shuffle beyond the rollup, closed-form
    arithmetic on exact integer token counts, so the plan (not just
    the counts) is identical cross-engine at any corpus size. At
    100 TB this runs on the catalog's token-count statistics instead
    of a raw scan — same query, different input table."""
    d = load(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        [("en", 0.4), ("de", 0.2), ("es", 0.2), ("fr", 0.1), ("zh", 0.1)],
        ["lang", "weight"],
    )
    avail = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias(
            "available_tokens"
        )
    )
    tot = avail.agg(F.sum("available_tokens").alias("total_avail"))
    target = F.col("weight") * 0.6 * F.col("total_avail")
    return (
        avail.join(F.broadcast(weights), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "available_tokens",
            F.round(target, 0).cast("bigint").alias("target_tokens"),
            F.round(target / F.col("available_tokens"), 6).alias("sample_rate"),
            F.ceil(target / F.col("available_tokens"))
            .cast("bigint")
            .alias("n_epochs"),
            (target > F.col("available_tokens")).alias("needs_repeat"),
        )
        .orderBy("lang")
    )
