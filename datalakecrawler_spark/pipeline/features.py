"""Feature-engineering operators — the training-data prep steps between
the catalog and the model: categorical encoding, numeric scaling,
time-bounded behavior sequences. All pure DataFrame compositions; the
fitted "state" (vocabularies, min/max stats) is itself a DataFrame that
broadcasts back onto the data — no driver-side fitting, which is what
keeps the transforms identical from sf0.001 to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import dsum, register


@register(
    "feature_label_encode",
    group="J",
    oracle="""
    with vocab as (
      select p_brand, dense_rank() over (order by p_brand) - 1 as brand_idx
      from (select distinct p_brand from part)
    )
    select p_partkey, p.p_brand, brand_idx
    from part p join vocab v on p.p_brand = v.p_brand
    where p_partkey < 300
    """,
)
def feature_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: categorical label encoding — each distinct value mapped to
    a contiguous index by sorted order (deterministic, unlike
    StringIndexer's frequency ordering which ties arbitrarily). The
    vocabulary is distinct + dense_rank over the *distinct* frame
    (vocabulary-sized, so the global window is safe at any scale), then
    broadcast back onto the data: the fit is a DataFrame, the transform
    a broadcast join — nothing passes through the driver."""
    p = load(spark, sf_dir, "part")
    vocab = (
        p.select("p_brand")
        .distinct()
        .withColumn(
            "brand_idx", F.dense_rank().over(W.orderBy("p_brand")) - F.lit(1)
        )
    )
    return (
        p.where(F.col("p_partkey") < 300)
        .join(F.broadcast(vocab), "p_brand")
        .select("p_partkey", "p_brand", "brand_idx")
    )


@register(
    "feature_minmax_scale",
    group="J",
    oracle="""
    with stats as (
      select l_returnflag, min(l_extendedprice) as mn, max(l_extendedprice) as mx
      from lineitem group by 1
    )
    select l_orderkey, l_linenumber, l.l_returnflag,
           round((l_extendedprice - mn) / (mx - mn), 6) as price_scaled
    from lineitem l join stats s on l.l_returnflag = s.l_returnflag
    where l_orderkey < 500
    """,
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: per-group min-max scaling to [0,1] — numeric feature
    normalization fit on the FULL table (the stats frame is
    group-count-sized and broadcasts back), applied to the slice being
    exported. min/max over parquet-read doubles are exact (no
    accumulation), so the scaled value is one deterministic subtract/
    divide in both engines, policy-rounded at 6."""
    li = load(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    return (
        li.where(F.col("l_orderkey") < 500)
        .join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(
                (F.col("l_extendedprice") - F.col("mn")) / (F.col("mx") - F.col("mn")),
                6,
            ).alias("price_scaled"),
        )
    )


@register(
    "events_sequence_chains",
    group="J",
    oracle="""
    with v as (select user_id, event_id, ts from events where event_type = 'view'),
    c as (select user_id, ts from events where event_type = 'click'),
    p as (select user_id, ts from events where event_type = 'purchase'),
    vc as (
      select v.user_id, v.event_id, min(c.ts) as click_ts
      from v join c on v.user_id = c.user_id
                   and c.ts > v.ts and c.ts <= v.ts + interval 30 minutes
      group by 1, 2
    ),
    vcp as (
      select vc.user_id, vc.event_id, min(p.ts) as purchase_ts
      from vc join p on vc.user_id = p.user_id
                    and p.ts > vc.click_ts
                    and p.ts <= vc.click_ts + interval 30 minutes
      group by 1, 2
    )
    select user_id, count(*) as n_chains
    from vcp group by 1
    """,
)
def events_sequence_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: time-bounded event-sequence detection (CEP-lite) — count
    completed view → click(≤30 min) → purchase(≤30 min after the click)
    chains per user, each stage anchored to the EARLIEST qualifying
    successor (min-ts semantics make the result order-independent).
    Unlike funnel_conversion's whole-history stages, every hop here is
    deadline-bounded — the abandoned-cart/attribution query shape.

    Scale: both stage joins are equi on user_id with the time bound as
    residual predicate — partition by user, never a time-range
    explosion; stage outputs shrink monotonically. The same plan
    streams with two interval stream-stream joins."""
    e = load(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    vc = (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("ts"))
            & (F.col("c_ts") <= F.col("ts") + F.expr("interval 30 minutes")),
        )
        .groupBy("user_id", "event_id")
        .agg(F.min("c_ts").alias("click_ts"))
    )
    vcp = (
        vc.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("interval 30 minutes")),
        )
        .groupBy("user_id", "event_id")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    return vcp.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_chains"))


@register(
    "corpus_mixture_balance",
    group="J",
    oracle="""
    with b as (
      select lang, count(*) as n_docs,
             sum(cast(n_chars as bigint)) as chars
      from documents group by 1
    ),
    t as (
      select lang, n_docs, chars,
             sum(chars) over () as total_chars,
             count(*) over ()  as n_langs
      from b
    )
    select lang, n_docs, cast(chars as bigint) as chars,
           round(cast(chars as double) / cast(total_chars as double), 6)
             as cur_share,
           round(1.0 / n_langs, 6) as target_share,
           round(least(1.0, (1.0 / n_langs) * 0.5
                 * cast(total_chars as double) / cast(chars as double)), 6)
             as sample_rate,
           cast(floor(round(least(1.0, (1.0 / n_langs) * 0.5
                 * cast(total_chars as double) / cast(chars as double)), 6)
                 * cast(chars as double)) as bigint) as expected_chars
    from t
    """,
)
def corpus_mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: training-mixture balancing — the data-recipe step: given a
    uniform per-language target and a 50%-of-corpus token budget,
    compute each language's current share and the per-bucket sampling
    rate that hits the target (capped at 1.0 — upsampling is a separate
    decision). This is the arithmetic behind every published LLM data
    mixture; the output rates feed the deterministic sampler
    (sample_quality_weighted / split_train_holdout's hash gate).

    Scale: one aggregation to language granularity (dozens of rows), a
    window over that tiny frame for totals, pure arithmetic after —
    cost is one corpus scan regardless of size. Integer char sums and a
    shared double expression keep both engines bit-identical; the final
    expected_chars floors AFTER the policy-rounded rate so the two
    engines floor the same double."""
    d = load(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("chars"),
    )
    w = W.partitionBy()
    t = b.withColumn("total_chars", F.sum("chars").over(w)).withColumn(
        "n_langs", F.count(F.lit(1)).over(w)
    )
    chars_d = F.col("chars").cast("double")
    total_d = F.col("total_chars").cast("double")
    rate = F.round(
        F.least(F.lit(1.0), (1.0 / F.col("n_langs")) * 0.5 * total_d / chars_d), 6
    )
    return t.select(
        "lang",
        "n_docs",
        "chars",
        F.round(chars_d / total_d, 6).alias("cur_share"),
        F.round(1.0 / F.col("n_langs"), 6).alias("target_share"),
        rate.alias("sample_rate"),
        F.floor(rate * chars_d).cast("bigint").alias("expected_chars"),
    )


@register(
    "privacy_k_anonymity",
    group="J",
    oracle="""
    with g as (
        select c_mktsegment, c_nationkey, count(*) as grp_size
        from customer group by 1, 2
    )
    select count(*) as n_groups,
           min(grp_size) as min_k,
           count(*) filter (where grp_size < 5) as groups_below_k,
           cast(coalesce(sum(grp_size) filter (where grp_size < 5), 0)
               as bigint) as rows_at_risk
    from g
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: k-anonymity audit over a quasi-identifier tuple
    (c_mktsegment, c_nationkey) — the privacy gate a training-data
    pipeline runs before releasing user-derived records: the dataset
    is k-anonymous iff min group size ≥ k, and rows in groups below k
    (here k=5) are re-identifiable and must be suppressed or
    generalized. Two chained hash aggregations: the first shuffles the
    quasi-identifier keys (map-side partials), the second collapses
    group sizes to one audit row — group count, smallest equivalence
    class, and the suppression workload. sum(bigint) would widen to
    HUGEINT in DuckDB, so the at-risk row count stays a filtered sum
    of int-cast sizes (both engines BIGINT)."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("grp_size")
    )
    below = F.col("grp_size") < 5
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp_size").alias("min_k"),
        F.count_if(below).alias("groups_below_k"),
        F.coalesce(
            F.sum(F.when(below, F.col("grp_size"))), F.lit(0)
        ).alias("rows_at_risk"),
    )


@register(
    "events_funnel_ttc",
    group="J",
    oracle="""
    with v as (
        select user_id, min(ts) as t_view from events
        where event_type = 'view' group by 1
    ),
    p as (
        select e.user_id, min(e.ts) as t_purchase
        from events e join v using (user_id)
        where e.event_type = 'purchase' and e.ts >= v.t_view
        group by 1
    ),
    gaps as (
        select cast(epoch_us(p.t_purchase) - epoch_us(v.t_view) as double)
               / 86400000000.0 as gap_days
        from v join p using (user_id)
    )
    select count(*) as n_converted,
           round(quantile_cont(gap_days, 0.25), 4) as p25_days,
           round(quantile_cont(gap_days, 0.50), 4) as median_days,
           round(quantile_cont(gap_days, 0.75), 4) as p75_days
    from gaps
    """,
)
def events_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: funnel time-to-convert — the latency distribution between
    a user's first view and their first purchase at-or-after it
    (funnel_conversion counts WHO converts; this measures HOW LONG).
    Gaps are computed in exact epoch microseconds (no truncation
    semantics to reconcile across engines) and only then divided to
    double days; percentile_cont/quantile_cont share the standard
    lo + (hi−lo)·frac interpolation, with round(4) absorbing last-ulp
    drift. Both stage tables collapse events to one row per user
    before joining, so the join sides are user-dimension-sized — at
    100 TB the two event scans dominate and the rest is broadcast."""
    e = load(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(F.broadcast(v), "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    gaps = v.join(p, "user_id").select(
        (
            (F.unix_micros("t_purchase") - F.unix_micros("t_view")).cast("double")
            / 86400000000.0
        ).alias("gap_days")
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("gap_days", F.lit(0.25)), 4).alias("p25_days"),
        F.round(F.percentile("gap_days", F.lit(0.50)), 4).alias("median_days"),
        F.round(F.percentile("gap_days", F.lit(0.75)), 4).alias("p75_days"),
    )


@register(
    "feature_hash_bucket",
    group="J",
    oracle="""
    with h as (
        select cast(('0x' || substr(md5(c_mktsegment || '|' ||
                                        cast(c_nationkey as varchar)), 1, 8))
                    as bigint) % 32 as bucket
        from customer
    )
    select bucket, count(*) as n_rows
    from h group by bucket
    """,
)
def feature_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the hashing trick — project a high-cardinality
    categorical cross (segment × nation) into a fixed 32-bucket
    feature space via a PORTABLE hash (first 8 hex chars of md5, the
    same cross-engine recipe as the deterministic samplers; Spark's
    xxhash64/hash have no DuckDB twin, §2.L trap 7). Output is the
    bucket occupancy histogram a feature pipeline uses to check
    collision balance before training. One narrow projection + one
    32-key aggregation — scan-bound at any scale, and the hash is
    reproducible across engines, runs, and languages, which is what
    makes the feature stable between training and serving."""
    c = load(spark, sf_dir, "customer")
    key = F.concat_ws(
        "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
    )
    bucket = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 32)
    return (
        c.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "events_attribution_lastclick",
    group="J",
    oracle="""
    with purchases as (
      select event_id, user_id, ts
      from events where event_type = 'purchase'
    ), clicks as (
      select user_id, ts from events where event_type = 'click'
    ), attributed as (
      select p.event_id, p.user_id,
             max(c.ts) as click_ts
      from purchases p
      left join clicks c
        on c.user_id = p.user_id
       and c.ts <= p.ts
       and c.ts >= p.ts - interval 7 day
      group by p.event_id, p.user_id
    )
    select count(*) as n_purchases,
           count(click_ts) as n_attributed,
           round(count(click_ts) * 100.0 / count(*), 6) as attribution_pct
    from attributed
    """,
)
def events_attribution_lastclick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: last-click attribution — each purchase attributed to the
    same user's most recent click within a 7-day lookback. The asof
    family's marketing shape: equi-join on user + bounded range
    residual, then max() picks the last qualifying touchpoint, so no
    window over the raw log is needed. Shuffle is one exchange of both
    event slices on user_id (the log's natural bucketing at 100 TB);
    the lookback bound keeps the per-user join fan-out finite however
    long the history grows. Output is the attribution summary a
    marketing pipeline reports: purchases, attributed count, rate."""
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    attributed = (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts <= p.ts)
            & (c.c_ts >= p.ts - F.expr("interval 7 days")),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.max("c_ts").alias("click_ts"))
    )
    n, attr = F.count(F.lit(1)), F.count("click_ts")
    return attributed.agg(
        n.alias("n_purchases"),
        attr.alias("n_attributed"),
        F.round(attr * 100.0 / n, 6).alias("attribution_pct"),
    )


@register(
    "orders_cohort_ltv",
    group="J",
    oracle="""
    with firsts as (
      select o_custkey,
             date_trunc('year', min(o_orderdate)) as cohort
      from orders group by 1
    ), joined as (
      select cast(f.cohort as date) as cohort,
             date_diff('year', f.cohort, o.o_orderdate) as age_years,
             o.o_totalprice
      from orders o join firsts f on o.o_custkey = f.o_custkey
    )
    select cohort, age_years,
           count(*) as n_orders,
           cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) as double)
             / 1e6 as revenue
    from joined group by 1, 2
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: cohort lifetime-value matrix — customers grouped by
    first-order year (the cohort), revenue accumulated by cohort age
    in years. The (cohort × age) grid is how subscription/commerce
    teams read retention-adjusted value; the same matrix over a
    training corpus (source × time-since-crawl) tracks data aging.
    Two aggregations: per-customer min(orderdate) (shuffle on
    custkey — same key the orders table would be bucketed by), then a
    broadcast-back join and a tiny (cohort, age) hash agg with exact
    micro-unit revenue sums."""
    o = load(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("year", F.min("o_orderdate")).alias("cohort")
    )
    joined = o.join(firsts, "o_custkey").select(
        F.col("cohort").cast("date").alias("cohort"),
        (F.year("o_orderdate") - F.year("cohort")).alias("age_years"),
        "o_totalprice",
    )
    return joined.groupBy("cohort", "age_years").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


_BOOT_R = 20  # bootstrap replicates
# Poisson(1) CDF cut points: P(X<=k) for k = 0..4; tail mass → 5
_POIS_CDF = [0.367879, 0.735759, 0.919699, 0.981012, 0.996340]


@register(
    "sample_poisson_bootstrap",
    group="J",
    oracle=f"""
    with reps as (
      select o_totalprice, r,
             cast(('0x' || substr(md5('boot|' || cast(r as varchar) || '|' ||
                                      cast(o_orderkey as varchar)), 1, 8))
                  as bigint) / 4294967296.0 as u
      from orders cross join unnest(range({_BOOT_R})) as t(r)
    ), weighted as (
      select r, o_totalprice,
             case when u < {_POIS_CDF[0]} then 0
                  when u < {_POIS_CDF[1]} then 1
                  when u < {_POIS_CDF[2]} then 2
                  when u < {_POIS_CDF[3]} then 3
                  when u < {_POIS_CDF[4]} then 4
                  else 5 end as w
      from reps
    ), per_rep as (
      select r,
             cast(sum(w * cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as double) / 1e6 / sum(w) as mean_price
      from weighted group by r
    )
    select count(*) as n_replicates,
           round(avg(mean_price), 4) as boot_mean,
           round(stddev_samp(mean_price), 4) as boot_se,
           round(min(mean_price), 4) as lo,
           round(max(mean_price), 4) as hi
    from per_rep
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Poisson bootstrap of the mean order price — the
    resampling scheme that actually works distributed: instead of
    drawing n rows with replacement (needs global coordination), each
    row independently receives a Poisson(1) weight per replicate,
    which converges to the same bootstrap distribution. Weights come
    from the portable md5 hash mapped through the Poisson CDF, so
    every replicate is deterministic and engine-identical —
    'randomized' statistics with a hash-matchable oracle. One explode
    (×20 replicates) + two tiny aggregations; per-replicate means use
    the exact micro-unit sum. At 100 TB you run the same plan with
    the explode pushed AFTER any filters, and the 20-replicate frame
    is the only thing that leaves the scan. Output: bootstrap mean,
    standard error, and range of the replicate means — the confidence
    statement a profiler attaches to its point estimates. Replicate
    means are ratios of exact integers (order-independent), and the
    final stats are rounded at 4 where stddev's accumulation order
    cannot flip a digit."""
    o = load(spark, sf_dir, "orders")
    reps = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit("boot"),
                        F.col("r").cast("string"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
    )
    weighted = reps.select("r", "o_totalprice", w.alias("w"))
    per_rep = weighted.groupBy("r").agg(
        (
            F.sum(
                F.col("w") * F.floor(F.col("o_totalprice") * 1e6 + 0.5)
            ).cast("double")
            / 1e6
            / F.sum("w")
        ).alias("mean_price")
    )
    return per_rep.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.avg("mean_price"), 4).alias("boot_mean"),
        F.round(F.stddev_samp("mean_price"), 4).alias("boot_se"),
        F.round(F.min("mean_price"), 4).alias("lo"),
        F.round(F.max("mean_price"), 4).alias("hi"),
    )


@register(
    "privacy_l_diversity",
    group="J",
    oracle="""
    with g as (
        select c_mktsegment, c_nationkey,
               count(distinct cast(floor(c_acctbal / 1000.0) as int)) as l,
               count(*) as grp_size
        from customer group by 1, 2
    )
    select count(*) as n_groups,
           min(l) as min_l,
           count(*) filter (where l < 3) as groups_below_l,
           cast(coalesce(sum(grp_size) filter (where l < 3), 0) as bigint)
               as rows_at_risk,
           round(cast(sum(l) as double) / count(*), 6) as avg_l
    from g
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: l-diversity audit — the companion gate to
    privacy_k_anonymity. k-anonymity only bounds group SIZE; a group of
    50 people who all share the same sensitive value still leaks it
    (homogeneity attack). l-diversity requires each quasi-identifier
    equivalence class (c_mktsegment, c_nationkey) to contain ≥ l
    distinct sensitive values — here the account-balance band
    floor(c_acctbal/1000), l = 3. Same two-aggregation shape as the
    k-audit (shuffle on the QI key with a distinct-count, then collapse
    to one audit row), so the two gates share one scan in a combined
    release pipeline. rows_at_risk counts members of homogeneous
    groups needing suppression/generalization before release."""
    c = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("int")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.countDistinct(band).alias("l"),
        F.count(F.lit(1)).alias("grp_size"),
    )
    below = F.col("l") < 3
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l").alias("min_l"),
        F.count_if(below).alias("groups_below_l"),
        F.coalesce(F.sum(F.when(below, F.col("grp_size"))), F.lit(0)).alias(
            "rows_at_risk"
        ),
        F.round(F.sum("l").cast("double") / F.count(F.lit(1)), 6).alias("avg_l"),
    )


@register(
    "events_ab_ztest",
    group="J",
    oracle="""
    with assign as (
      select user_id, user_id % 2 as variant,
             max(case when event_type = 'purchase' then 1 else 0 end)
               as converted
      from events group by 1
    ),
    arms as (
      select variant, count(*) as n,
             cast(sum(converted) as bigint) as conv
      from assign group by 1
    ),
    w as (
      select max(case when variant = 0 then n end) as n0,
             max(case when variant = 0 then conv end) as c0,
             max(case when variant = 1 then n end) as n1,
             max(case when variant = 1 then conv end) as c1
      from arms
    )
    select n0, c0, n1, c1,
           round(cast(c0 as double) / n0, 6) as p0,
           round(cast(c1 as double) / n1, 6) as p1,
           round((cast(c1 as double) / n1 - cast(c0 as double) / n0)
                 / sqrt((cast(c0 + c1 as double) / (n0 + n1))
                        * (1 - cast(c0 + c1 as double) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) as z_score
    from w
    """,
)
def events_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: two-proportion z-test — the experimentation primitive:
    users deterministically assigned to arms (user_id parity — in
    production, a hash bucket), per-user conversion = any purchase
    event, and the pooled-variance z-score for the conversion-rate
    difference. The whole statistic reduces to four exact integers
    (per-arm users and conversions) collected in one aggregation over
    the per-user collapse — at 100 TB the z-test costs one groupBy
    regardless of event volume, and the same four counters stream
    incrementally (they're plain sums). The final expression is
    identical IEEE arithmetic in both engines, rounded at 6."""
    e = load(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("variant"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    n0 = F.col("n0").cast("double")
    c0 = F.col("c0").cast("double")
    n1 = F.col("n1").cast("double")
    c1 = F.col("c1").cast("double")
    pooled = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / n0 + 1.0 / n1)
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        F.round(c0 / n0, 6).alias("p0"),
        F.round(c1 / n1, 6).alias("p1"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "feature_target_encode",
    group="J",
    oracle="""
    with j as (
      select c.c_mktsegment as segment,
             cast(floor(o.o_totalprice * 1e6 + 0.5) as bigint) as p_micro
      from orders o join customer c on c.c_custkey = o.o_custkey
    ),
    g as (
      select cast(count(*) as bigint) as n_all,
             cast(sum(p_micro) as bigint) as s_all
      from j
    ),
    seg as (
      select segment, cast(count(*) as bigint) as n_seg,
             cast(sum(p_micro) as bigint) as s_seg
      from j group by 1
    )
    select segment, n_seg as n_orders,
           round(cast(s_seg as double) / 1e6 / n_seg, 2) as raw_mean,
           round((cast(s_seg as double) / 1e6
                  + 50 * (cast(s_all as double) / 1e6 / n_all))
                 / (n_seg + 50), 6) as encoded
    from seg, g
    order by segment
    """,
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: smoothed mean target encoding — the workhorse categorical
    feature for tabular models: replace c_mktsegment with a
    shrunk-toward-global mean of the target (order value),
    enc = (Σ_seg + m·ȳ_global)/(n_seg + m), m = 50. The additive
    smoothing is what keeps rare categories from memorizing noise —
    with n→0 the code degrades to the global mean. Distributed shape:
    one broadcast join (customer dim) + one map-combinable rollup;
    per-segment and global sums are micro-unit-exact ints, the
    shrinkage formula is a single fixed-order double expression.
    At 100 TB the encoding table is |categories| rows — it broadcasts
    back onto the fact table for the actual transform (same pattern
    as feature_label_encode)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c), c.c_custkey == o.o_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("o_totalprice") * 1e6 + 0.5).alias("p_micro"),
    )
    g = j.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("p_micro").alias("s_all")
    )
    seg = j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_seg"), F.sum("p_micro").alias("s_seg")
    )
    gmean = F.col("s_all").cast("double") / 1e6 / F.col("n_all")
    return (
        seg.crossJoin(F.broadcast(g))
        .select(
            "segment",
            F.col("n_seg").alias("n_orders"),
            F.round(
                F.col("s_seg").cast("double") / 1e6 / F.col("n_seg"), 2
            ).alias("raw_mean"),
            F.round(
                (F.col("s_seg").cast("double") / 1e6 + 50 * gmean)
                / (F.col("n_seg") + 50),
                6,
            ).alias("encoded"),
        )
        .orderBy("segment")
    )


@register(
    "privacy_t_closeness",
    group="J",
    oracle="""
    with base as (
      select c_mktsegment as segment,
             cast(floor(c_acctbal / 1000) as bigint) as bucket
      from customer
    ),
    buckets as (select distinct bucket from base),
    segs as (
      select segment, count(*) as n_seg from base group by 1
    ),
    gdist as (
      select bucket, count(*) as n_b from base group by 1
    ),
    n as (select count(*) as n_all, count(distinct bucket) as k from base),
    grid as (
      select s.segment, b.bucket, s.n_seg,
             coalesce(c.cnt, 0) as cnt
      from segs s cross join buckets b
      left join (select segment, bucket, count(*) as cnt
                 from base group by 1, 2) c
        on c.segment = s.segment and c.bucket = b.bucket
    ),
    cum as (
      select segment, bucket, n_seg,
             sum(cast(cnt as double) / n_seg)
               over (partition by segment order by bucket) as cum_p,
             sum(cast(n_b as double) / n_all)
               over (partition by segment order by bucket) as cum_q
      from grid
      join gdist using (bucket) cross join n
    )
    select segment, max(n_seg) as n_rows,
           round(cast(sum(cast(floor(
               abs(cum_p - cum_q) * 1e9 + 0.5) as bigint)) as double)
             / 1e9 / (max(k) - 1), 6) as t_emd
    from cum cross join n
    group by segment
    order by segment
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: t-closeness — the third rung of the anonymity ladder
    after privacy_k_anonymity / privacy_l_diversity: how far each
    quasi-identifier group's SENSITIVE-value distribution (account
    balance, bucketed to $1000 bands) drifts from the global one,
    measured by the ordered-attribute Earth Mover's Distance
    EMD = Σ|cumP − cumQ| / (k−1). A group that passes k and l can
    still leak by skew; t-closeness catches it. Distributed shape:
    two count rollups + a |segments|×|buckets| grid (trivially
    broadcastable); cumulative sums run in a deterministic bucket
    order (sequential window — same addition order both engines),
    and the final Σ|·| is nano-quantized before crossing rows."""
    c = load(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).alias("bucket"),
    )
    buckets = base.select("bucket").distinct()
    segs = base.groupBy("segment").agg(F.count(F.lit(1)).alias("n_seg"))
    glob = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_b"))
    n = base.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count_distinct("bucket").alias("k"),
    )
    cnts = base.groupBy("segment", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = (
        segs.crossJoin(F.broadcast(buckets))
        .join(cnts, ["segment", "bucket"], "left")
        .na.fill({"cnt": 0})
    )
    w = W.partitionBy("segment").orderBy("bucket")
    cum = (
        grid.join(F.broadcast(glob), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "segment",
            "bucket",
            "n_seg",
            "k",
            F.sum(
                F.col("cnt").cast("double") / F.col("n_seg")
            ).over(w).alias("cum_p"),
            F.sum(
                F.col("n_b").cast("double") / F.col("n_all")
            ).over(w).alias("cum_q"),
        )
    )
    return (
        cum.groupBy("segment")
        .agg(
            F.max("n_seg").alias("n_rows"),
            F.round(
                F.sum(
                    F.floor(
                        F.abs(F.col("cum_p") - F.col("cum_q")) * 1e9 + 0.5
                    )
                ).cast("double")
                / 1e9
                / (F.max("k") - 1),
                6,
            ).alias("t_emd"),
        )
        .orderBy("segment")
    )


@register(
    "split_time_based",
    group="J",
    oracle="""
    with s as (
      select o_orderkey, o_custkey,
             case when o_orderdate < timestamp '1999-01-01'
                  then 'train' else 'test' end as split
      from orders
    )
    select
      (select count(*) from s where split = 'train') as n_train,
      (select count(*) from s where split = 'test') as n_test,
      (select count(*) from (
         select o_custkey from s where split = 'train'
         intersect
         select o_custkey from s where split = 'test') t)
        as n_customers_in_both,
      (select count(distinct o_custkey) from s where split = 'test'
         and o_custkey not in
           (select o_custkey from s where split = 'train'))
        as n_coldstart_customers
    """,
)
def split_time_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: time-based train/test split with leakage audit — the
    split discipline for forecasting/recommendation training data
    (random splits leak the future; split_train_holdout is the IID
    variant, this is the temporal one). Cutoff 1999-01-01. Beyond the
    partition counts it reports the two quantities that decide model
    evaluation design: customers present on BOTH sides (their test
    rows are warm-start) and test-only cold-start customers. Shape:
    one predicate pass + two distinct-key set ops on the (small)
    customer-key projections; at scale the intersect is a broadcast
    semi-join on the distinct keys, not a data-sized shuffle."""
    o = load(spark, sf_dir, "orders")
    s = o.select(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"),
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )
    train_k = s.filter(F.col("split") == "train").select("o_custkey")
    test_k = s.filter(F.col("split") == "test").select("o_custkey")
    counts = s.agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
    )
    both = (
        train_k.distinct()
        .intersect(test_k.distinct())
        .agg(F.count(F.lit(1)).alias("n_customers_in_both"))
    )
    cold = (
        test_k.distinct()
        .join(train_k.distinct(), "o_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_coldstart_customers"))
    )
    return counts.crossJoin(F.broadcast(both)).crossJoin(F.broadcast(cold))


@register(
    "feature_winsorize",
    group="J",
    oracle="""
    with p as (
      select quantile_disc(o_totalprice, 0.05) as p05,
             quantile_disc(o_totalprice, 0.95) as p95
      from orders
    ),
    w as (
      select case when o_totalprice < p05 then p05
                  when o_totalprice > p95 then p95
                  else o_totalprice end as xw,
             o_totalprice as x, p05, p95
      from orders, p
    )
    select max(p05) as p05, max(p95) as p95,
           count(*) filter (where x < p05) as n_clipped_low,
           count(*) filter (where x > p95) as n_clipped_high,
           round(cast(sum(cast(floor(x * 1e6 + 0.5) as bigint)) as double)
                 / count(*) / 1e6, 6) as mean_raw,
           round(cast(sum(cast(floor(xw * 1e6 + 0.5) as bigint)) as double)
                 / count(*) / 1e6, 6) as mean_winsorized
    from w
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: winsorization at [p05, p95] — the outlier treatment that
    caps rather than drops (feature_minmax_scale's robust sibling;
    events_value_mad_outliers flags, this repairs). Cut points use
    DISCRETE percentiles (actual data values — bit-exact across
    engines, the agg_percentile_disc property), broadcast back onto
    the fact table for the clip pass; means are micro-unit-exact.
    Two passes over the data (quantile, then clip+aggregate) — the
    classic trade; at 100 TB swap the exact quantile for the KLL
    sketch (agg_kll_quantile_sketch) and it becomes one pass with a
    bounded cut-point error."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_wz")
    p = spark.sql(
        """
        select percentile_disc(0.05) within group (order by o_totalprice)
                 as p05,
               percentile_disc(0.95) within group (order by o_totalprice)
                 as p95
        from orders_wz
        """
    )
    w = o.crossJoin(F.broadcast(p)).select(
        F.col("o_totalprice").alias("x"),
        "p05",
        "p95",
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice"))
        .alias("xw"),
    )
    return w.agg(
        F.max("p05").alias("p05"),
        F.max("p95").alias("p95"),
        F.count(F.when(F.col("x") < F.col("p05"), 1)).alias(
            "n_clipped_low"
        ),
        F.count(F.when(F.col("x") > F.col("p95"), 1)).alias(
            "n_clipped_high"
        ),
        F.round(
            F.sum(F.floor(F.col("x") * 1e6 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("mean_raw"),
        F.round(
            F.sum(F.floor(F.col("xw") * 1e6 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("mean_winsorized"),
    )


@register(
    "events_stickiness_ratio",
    group="J",
    oracle="""
    with base as (
      select cast(date_trunc('month', ts) as date) as month,
             cast(date_trunc('day', ts) as date) as day,
             user_id
      from events
    ),
    m as (
      select month,
             cast(count(distinct (day, user_id)) as bigint) as user_days,
             cast(count(distinct day) as bigint) as n_days,
             cast(count(distinct user_id) as bigint) as mau
      from base group by 1
    )
    select month, n_days, mau,
           round(cast(user_days as double) / n_days, 6) as avg_dau,
           round(cast(user_days as double) / n_days / mau, 6)
             as stickiness
    from m order by month
    """,
)
def events_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: DAU/MAU stickiness — the engagement-quality ratio
    (stickiness 1.0 = every monthly user active every observed day;
    typical products sit 0.1–0.3). avg-DAU = distinct (day,user)
    pairs / observed days, over each calendar month;
    events_rolling_active_users is the trailing-window cousin, this
    is the calendar-month management metric. One pass: the distinct
    pair count is a two-key rollup (partial-agg friendly via
    per-partition hash dedup); all three counters are exact ints, so
    the two ratios are fixed-order double divisions. At 100 TB the
    per-month groups are huge but the distinct-count shuffle keys
    (month, day, user) are well-spread — no skew; the approximate
    variant swaps in HLL (agg_hll_mergeable) for a one-shuffle
    sketch."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        F.date_trunc("month", "ts").cast("date").alias("month"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    )
    m = base.groupBy("month").agg(
        F.count_distinct("day", "user_id").alias("user_days"),
        F.count_distinct("day").alias("n_days"),
        F.count_distinct("user_id").alias("mau"),
    )
    return m.select(
        "month",
        "n_days",
        "mau",
        F.round(
            F.col("user_days").cast("double") / F.col("n_days"), 6
        ).alias("avg_dau"),
        F.round(
            F.col("user_days").cast("double") / F.col("n_days") / F.col("mau"),
            6,
        ).alias("stickiness"),
    ).orderBy("month")


@register(
    "events_power_user_curve",
    group="J",
    oracle="""
    with per_user as (
      select user_id, cast(count(*) as bigint) as cnt
      from events group by 1
    ),
    dec as (
      select cnt,
             ntile(10) over (order by cnt desc, user_id) as decile,
             sum(cnt) over () as total
      from per_user
    )
    select decile,
           count(*) as n_users,
           cast(sum(cnt) as bigint) as n_events,
           round(cast(sum(cnt) as double) / max(total), 6) as event_share
    from dec group by 1 order by decile
    """,
)
def events_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the power-user curve — activity share by user decile
    (decile 1 = heaviest users), the engagement-concentration
    profile ('do 10% of users generate 60% of events?') that pairs
    with orders_gini_concentration on the revenue side. Per-user
    counts are one map-combinable rollup; the decile comes from the
    distributed exact global row number over the user aggregate with
    (cnt desc, user_id) tie-free ordering (r5: users are entity-grain
    and GROW with the data — distrank + the closed-form
    ntile_from_rank replace the single-partition ntile window,
    bit-identical per tests/test_distrank.py; the total event count
    rides the same offset collect). Integer sums throughout; the
    share is one double division."""
    from datalakecrawler_spark.distrank import (
        ntile_from_rank,
        with_global_cumsum,
    )

    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    r = with_global_cumsum(
        per_user,
        spark,
        [F.col("cnt").desc(), F.col("user_id")],
        "cnt",
        out="__cum",
        with_total="total",
        rn_out="rn",
        rows_total="n",
        # per_user is a pure function of the immutable events fixture,
        # so the frozen layout + offset collect are memoizable per app
        # (r10: drops the two build-time actions from every fresh plan
        # build of this registered query — the bench replan tail).
        memo_key=("events_power_user_curve.per_user", sf_dir.rstrip("/")),
    )
    dec = r.select(
        "cnt",
        ntile_from_rank(F.col("rn"), F.col("n"), 10).alias("decile"),
        "total",
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cnt").alias("n_events"),
            F.round(
                F.sum("cnt").cast("double") / F.max("total"), 6
            ).alias("event_share"),
        )
        .orderBy("decile")
    )


@register(
    "events_interevent_hist",
    group="J",
    oracle="""
    with gaps as (
      select epoch_us(ts)
             - epoch_us(lag(ts) over (partition by user_id
                    order by ts, event_id)) as gap_us
      from events
    ),
    g as (select gap_us // 1000000 as gap_s from gaps
          where gap_us is not null),
    b as (
      select case when gap_s = 0 then -1
                  else length(printf('%b', gap_s)) - 1 end as bucket,
             gap_s
      from g
    )
    select bucket, count(*) as n_gaps,
           cast(min(gap_s) as bigint) as min_gap_s,
           cast(max(gap_s) as bigint) as max_gap_s
    from b group by 1 order by bucket
    """,
)
def events_interevent_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: inter-event-time histogram on log2 buckets — the
    user-tempo fingerprint (bot traffic shows sub-second spikes,
    human sessions cluster at minutes, returns at days; the bucket
    boundaries feed the sessionization gap threshold that
    events_session_stats hard-codes). The log2 bucket is computed by
    BINARY LENGTH (bits(gap)−1), not floor(log2(x)) — a float log at
    an exact power-of-two boundary can land on either side by one
    ulp across engines, while bit length is pure integer arithmetic.
    One lag window per user (co-partitioned by user_id — the same
    shuffle every per-user operator shares) and a tiny rollup."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us")
        )
        .filter(F.col("gap_us").isNotNull())
        .select(F.expr("gap_us div 1000000").alias("gap_s"))
    )
    b = gaps.select(
        F.when(F.col("gap_s") == 0, -1)
        .otherwise(F.length(F.bin(F.col("gap_s"))) - 1)
        .cast("bigint")
        .alias("bucket"),
        "gap_s",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("bucket")
    )


@register(
    "orders_survival_km",
    group="J",
    oracle="""
    with firsts as (
      select o_custkey,
             min(o_orderdate) as first_dt,
             min(case when rn = 2 then o_orderdate end) as second_dt
      from (
        select o_custkey, o_orderdate,
               row_number() over (partition by o_custkey
                 order by o_orderdate, o_orderkey) as rn
        from orders) t
      group by 1
    ),
    horizon as (select max(o_orderdate) as max_dt from orders),
    durations as (
      select case when second_dt is not null
                  then date_diff('day', first_dt, second_dt) // 7
                  else date_diff('day', first_dt, max_dt) // 7
             end as t_week,
             case when second_dt is not null then 1 else 0 end as event
      from firsts, horizon
    ),
    weekly as (
      select t_week,
             cast(sum(event) as bigint) as d,
             cast(count(*) as bigint) as ending
      from durations group by 1
    ),
    risk as (
      select t_week, d,
             sum(ending) over (order by t_week desc
               rows between unbounded preceding and current row) as n
      from weekly
    ),
    km as (
      select t_week, d, n,
             sum(cast(floor(ln(1 - cast(d as double) / n) * 1e9 - 0.5)
                 as bigint))
               over (order by t_week
                 rows between unbounded preceding and current row) as l9
      from risk where d > 0 and d < n
    )
    select t_week, d as n_repeats, cast(n as bigint) as n_at_risk,
           round(exp(cast(l9 as double) / 1e9), 6) as survival
    from km order by t_week limit 30
    """,
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Kaplan-Meier survival curve of time-to-second-purchase —
    the censoring-correct repeat-purchase model (a plain histogram of
    repeat lags is biased: customers whose window was cut short by
    the data horizon never got the CHANCE to repeat; KM divides
    deaths by the risk set that was still observable). Weekly
    buckets; customers without a second order are censored at the
    data horizon. The risk set n(t) is a reverse-cumulative count
    (exact ints); the product Π(1−d/n) runs in log space with each
    ln term FLOOR-quantized at 1e9 (floor(x·1e9 − 0.5) on the
    negative values — symmetric to the +0.5 convention on positives)
    so the cumulative sum is integer-exact and engine-identical; one
    exp at the end, round 6. Per-customer collapse is one window
    over the custkey shuffle; everything after runs on the ~100-row
    weekly table."""
    o = load(spark, sf_dir, "orders")
    rn = F.row_number().over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    firsts = (
        o.select("o_custkey", "o_orderdate", rn.alias("rn"))
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_dt"),
            F.min(
                F.when(F.col("rn") == 2, F.col("o_orderdate"))
            ).alias("second_dt"),
        )
    )
    horizon = o.agg(F.max("o_orderdate").alias("max_dt"))
    durations = firsts.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("second_dt").isNotNull(),
            F.floor(
                F.datediff(F.col("second_dt"), F.col("first_dt")) / 7
            ),
        )
        .otherwise(
            F.floor(F.datediff(F.col("max_dt"), F.col("first_dt")) / 7)
        )
        .alias("t_week"),
        F.when(F.col("second_dt").isNotNull(), 1).otherwise(0).alias(
            "event"
        ),
    )
    weekly = durations.groupBy("t_week").agg(
        F.sum("event").alias("d"), F.count(F.lit(1)).alias("ending")
    )
    w_desc = W.orderBy(F.col("t_week").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = weekly.select(
        "t_week", "d", F.sum("ending").over(w_desc).alias("n")
    )
    w_asc = W.orderBy("t_week").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    km = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n"))).select(
        "t_week",
        "d",
        "n",
        F.sum(
            F.floor(
                F.log(1 - F.col("d").cast("double") / F.col("n")) * 1e9
                - 0.5
            )
        )
        .over(w_asc)
        .alias("l9"),
    )
    return (
        km.select(
            "t_week",
            F.col("d").alias("n_repeats"),
            F.col("n").alias("n_at_risk"),
            F.round(F.exp(F.col("l9").cast("double") / 1e9), 6).alias(
                "survival"
            ),
        )
        .orderBy("t_week")
        .limit(30)
    )


@register(
    "events_transition_entropy",
    group="J",
    oracle="""
    with seq as (
      select event_type,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events
    ),
    trans as (
      select prev_type, event_type as next_type,
             cast(count(*) as bigint) as c
      from seq where prev_type is not null group by 1, 2
    ),
    m as (
      select prev_type, next_type, c,
             sum(c) over (partition by prev_type) as cp,
             sum(c) over () as n
      from trans
    )
    select cast(max(n) as bigint) as n_transitions,
           count(distinct prev_type) as n_states,
           round(cast(sum(cast(floor(
               -(cast(c as double) / n)
               * ln(cast(c as double) / cp) * 1e9 + 0.5) as bigint))
               as double) / 1e9, 6) as entropy_rate_nats,
           round(exp(cast(sum(cast(floor(
               -(cast(c as double) / n)
               * ln(cast(c as double) / cp) * 1e9 + 0.5) as bigint))
               as double) / 1e9), 4) as perplexity
    from m
    """,
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: entropy rate of the user-journey Markov chain —
    H(next|prev) = −Σ p(prev,next)·ln p(next|prev) over the empirical
    transition distribution, with perplexity e^H ('how many
    effectively-random next actions'). This is the predictability
    ceiling of the journey model events_transition_matrix /
    events_markov_stationary parameterize: near-zero means journeys
    are deterministic funnels; near ln(|states|) means navigation is
    noise. Same lag-window + count plumbing as the transition matrix;
    each joint-probability term is computed from exact counts in
    fixed IEEE order and nano-quantized before the cross-cell sum."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = trans.select(
        "prev_type",
        "c",
        F.sum("c").over(W.partitionBy("prev_type")).alias("cp"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    term = F.floor(
        -(F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("c").cast("double") / F.col("cp"))
        * 1e9
        + 0.5
    )
    return m.agg(
        F.max("n").alias("n_transitions"),
        F.count_distinct("prev_type").alias("n_states"),
        F.round(F.sum(term).cast("double") / 1e9, 6).alias(
            "entropy_rate_nats"
        ),
        F.round(F.exp(F.sum(term).cast("double") / 1e9), 4).alias(
            "perplexity"
        ),
    )


@register(
    "orders_discount_elasticity",
    group="J",
    oracle="""
    with lv as (
      select cast(floor(l_discount * 100 + 0.5) as bigint) as d_pct,
             cast(count(*) as bigint) as w,
             cast(sum(cast(floor(ln(l_quantity) * 1e9 + 0.5) as bigint))
                  as bigint) as sly9
      from lineitem group by 1
    ),
    pts as (
      select d_pct, w,
             ln(1 + cast(d_pct as double) / 100) as x,
             cast(sly9 as double) / 1e9 / w as y
      from lv
    ),
    m as (
      select cast(sum(w) as bigint) as sw,
             sum(cast(floor(w * x * 1e9 + 0.5) as bigint)) as swx9,
             sum(cast(floor(w * y * 1e9 + 0.5) as bigint)) as swy9,
             sum(cast(floor(w * x * x * 1e9 + 0.5) as bigint)) as swxx9,
             sum(cast(floor(w * x * y * 1e9 + 0.5) as bigint)) as swxy9,
             count(*) as n_levels
      from pts
    )
    select n_levels, sw as n_lines,
           round((cast(swxy9 as double) / 1e9
                  - (cast(swx9 as double) / 1e9)
                    * (cast(swy9 as double) / 1e9) / sw)
                 / (cast(swxx9 as double) / 1e9
                    - (cast(swx9 as double) / 1e9)
                      * (cast(swx9 as double) / 1e9) / sw), 6)
             as elasticity_loglog
    from m
    """,
)
def orders_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: discount elasticity of demand — the weighted log-log OLS
    slope of quantity on (1+discount) across the 11 discrete discount
    levels: the pricing-analytics primitive ('a 1% deeper discount
    moves quantity by β%'). Distributed shape: one rollup to discount
    levels carrying count + Σln(quantity) (per-row ln nano-quantized
    → exact int sums), then closed-form weighted OLS over ≤11 points
    (the same moment-sum pattern as agg_groupwise_ols, with weights).
    Level means are exact ratios; the 11 weighted moments are
    re-quantized before the cross-level sums so both engines sum
    identical integers."""
    li = load(spark, sf_dir, "lineitem")
    lv = li.groupBy(
        F.floor(F.col("l_discount") * 100 + 0.5).alias("d_pct")
    ).agg(
        F.count(F.lit(1)).alias("w"),
        F.sum(
            F.floor(F.log(F.col("l_quantity")) * 1e9 + 0.5)
        ).alias("sly9"),
    )
    pts = lv.select(
        "d_pct",
        "w",
        F.log(1 + F.col("d_pct").cast("double") / 100).alias("x"),
        (F.col("sly9").cast("double") / 1e9 / F.col("w")).alias("y"),
    )
    m = pts.agg(
        F.sum("w").alias("sw"),
        F.sum(F.floor(F.col("w") * F.col("x") * 1e9 + 0.5)).alias("swx9"),
        F.sum(F.floor(F.col("w") * F.col("y") * 1e9 + 0.5)).alias("swy9"),
        F.sum(
            F.floor(F.col("w") * F.col("x") * F.col("x") * 1e9 + 0.5)
        ).alias("swxx9"),
        F.sum(
            F.floor(F.col("w") * F.col("x") * F.col("y") * 1e9 + 0.5)
        ).alias("swxy9"),
        F.count(F.lit(1)).alias("n_levels"),
    )
    swd = F.col("sw")
    swx = F.col("swx9").cast("double") / 1e9
    swy = F.col("swy9").cast("double") / 1e9
    swxx = F.col("swxx9").cast("double") / 1e9
    swxy = F.col("swxy9").cast("double") / 1e9
    return m.select(
        "n_levels",
        F.col("sw").alias("n_lines"),
        F.round(
            (swxy - swx * swy / swd) / (swxx - swx * swx / swd), 6
        ).alias("elasticity_loglog"),
    )


@register(
    "events_session_bounce_rate",
    group="J",
    oracle="""
    with marked as (
      select user_id, ts, event_id,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w)
                       > 1800 * 1000000
                  then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ),
    sess as (
      select user_id, ts,
             sum(is_new) over (partition by user_id
               order by ts, event_id
               rows between unbounded preceding and current row)
               as session_id
      from marked
    ),
    per_sess as (
      select user_id, session_id,
             cast(date_trunc('day', min(ts)) as date) as day,
             count(*) as n_events
      from sess group by 1, 2
    )
    select day,
           count(*) as n_sessions,
           count(*) filter (where n_events = 1) as n_bounces,
           round(cast(count(*) filter (where n_events = 1) as double)
                 / count(*), 6) as bounce_rate
    from per_sess group by 1 order by day
    """,
)
def events_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: daily bounce rate — share of sessions (30-minute-gap
    sessionization, the events_session_stats state machine) that
    contain exactly one event, keyed by session START day: the
    landing-quality KPI. Gap tests use exact integer microseconds
    (the events_interevent_hist lesson — second-truncated subtraction
    differs across engines on sub-second timestamps). Everything
    partitions on user_id through sessionization, then re-keys on
    day for the report — two shuffles total, both on natural keys."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            gap_us.isNull() | (gap_us > 1800 * 1000000), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = marked.select(
        "user_id", "ts", F.sum("is_new").over(wc).alias("session_id")
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_sess.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count(F.when(F.col("n_events") == 1, 1)).alias(
                "n_bounces"
            ),
            F.round(
                F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


@register(
    "events_conversion_by_segment",
    group="J",
    oracle="""
    with u as (
      select user_id,
             max(case when event_type = 'purchase' then 1 else 0 end)
               as converted,
             cast(count(*) as bigint) as n_events,
             cast(sum(cast(floor(coalesce(value, 0) * 1e6 + 0.5)
                  as bigint)) as bigint) as value_micro
      from events group by 1
    ),
    j as (
      select c.c_mktsegment as segment, u.*
      from u join customer c on c.c_custkey = u.user_id
    )
    select segment,
           count(*) as n_users,
           cast(sum(converted) as bigint) as n_converted,
           round(cast(sum(converted) as double) / count(*), 6)
             as conversion_rate,
           round(cast(sum(value_micro) as double) / 1e6
                 / sum(n_events), 6) as value_per_event
    from j group by 1 order by segment
    """,
)
def events_conversion_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: behavioral KPIs joined to a CRM dimension — conversion
    rate and value-per-event by market segment, the cross-dataset
    join (event log × customer dim on user_id = custkey) every
    product-analytics warehouse runs hourly. The per-user collapse
    happens BEFORE the dimension join — entity-grain first, then a
    broadcast hash join against the small dim — so the join input is
    users, not raw events (the aggregate-then-join rewrite Catalyst
    cannot always derive itself because the collapse changes grain).
    Exact counters; two fixed-order ratios."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1e6 + 0.5)
        ).alias("value_micro"),
    )
    j = u.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        u.user_id == F.col("c_custkey"),
    )
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_converted"),
            F.round(
                F.sum("converted").cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
            F.round(
                F.sum("value_micro").cast("double")
                / 1e6
                / F.sum("n_events"),
                6,
            ).alias("value_per_event"),
        )
        .orderBy("segment")
    )


@register(
    "orders_priority_mix_shift",
    group="B",
    oracle="""
    with split as (
      select o_orderpriority as prio,
             case when o_orderdate < timestamp '1998-01-01'
                  then 'a' else 'b' end as period
      from orders
    ),
    cnt as (
      select prio,
             cast(sum(case when period = 'a' then 1 else 0 end)
                  as bigint) as ca,
             cast(sum(case when period = 'b' then 1 else 0 end)
                  as bigint) as cb
      from split group by 1
    ),
    tot as (
      select cast(sum(ca) as bigint) as ta, cast(sum(cb) as bigint) as tb
      from cnt
    )
    select prio,
           ca as n_before, cb as n_after,
           round(cast(ca as double) / ta, 6) as share_before,
           round(cast(cb as double) / tb, 6) as share_after,
           round((cast(cb as double) / tb - cast(ca as double) / ta)
                 * ln((cast(cb as double) / tb)
                      / (cast(ca as double) / ta)), 6) as psi_term
    from cnt, tot
    order by prio
    """,
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: categorical-mix drift — the per-category PSI terms for
    order priority before/after a cutover date (catalog_drift_psi is
    the NUMERIC-binned form; categorical columns drift too, and the
    per-category term decomposition shows WHICH category moved, which
    the summed statistic hides). Exact counts per (category, period)
    in one pass; each (q−p)·ln(q/p) term is a fixed-order expression
    on exact ratios, reported per category (the monitor alarms on
    Σterms > 0.2). All categories present in both periods here;
    production code adds Laplace smoothing for empty cells."""
    o = load(spark, sf_dir, "orders")
    split = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
            "a",
        )
        .otherwise("b")
        .alias("period"),
    )
    cnt = split.groupBy("prio").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("cb"),
    )
    tot = cnt.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    p = F.col("ca").cast("double") / F.col("ta")
    q = F.col("cb").cast("double") / F.col("tb")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "prio",
            F.col("ca").alias("n_before"),
            F.col("cb").alias("n_after"),
            F.round(p, 6).alias("share_before"),
            F.round(q, 6).alias("share_after"),
            F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        )
        .orderBy("prio")
    )


@register(
    "customer_order_gap_regularity",
    group="J",
    oracle="""
    with gaps as (
      select o_custkey,
             date_diff('day',
               lag(o_orderdate) over (partition by o_custkey
                 order by o_orderdate, o_orderkey),
               o_orderdate) as gap_d
      from orders
    ),
    per_cust as (
      select o_custkey,
             cast(count(*) as bigint) as n_gaps,
             cast(sum(gap_d) as bigint) as s,
             cast(sum(gap_d * gap_d) as bigint) as sq
      from gaps where gap_d is not null
      group by 1 having count(*) >= 2
    ),
    cv as (
      select o_custkey, n_gaps,
             cast(floor(
               sqrt((cast(sq as double)
                     - n_gaps * (cast(s as double) / n_gaps)
                       * (cast(s as double) / n_gaps)) / (n_gaps - 1))
               / (cast(s as double) / n_gaps) * 1e9 + 0.5) as bigint)
               as cv9
      from per_cust where s > 0
    )
    select count(*) as n_customers,
           round(cast(sum(cv9) as double) / count(*) / 1e9, 6)
             as mean_cv,
           round(cast(count(*) filter (where cv9 < 500000000) as double)
                 / count(*), 6) as regular_rate,
           round(cast(count(*) filter (where cv9 > 1000000000) as double)
                 / count(*), 6) as bursty_rate
    from cv
    """,
)
def customer_order_gap_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: purchase-rhythm regularity — the coefficient of
    variation of each customer's inter-order gaps, summarized as the
    population mean CV plus the regular (CV < 0.5, clockwork
    replenishers) and bursty (CV > 1, Poisson-or-worse) shares: the
    temporal dimension RFM (customer_rfm_segmentation) ignores, and
    the feature that separates subscription-like behavior from
    sporadic. Gaps are exact integer days from a lag window on the
    custkey shuffle; per-customer (n, Σ, Σ²) are exact ints, the CV
    is one fixed-order expression nano-quantized per customer, and
    the population rollup is integer sums + threshold counts done on
    the quantized ints (5e8 = CV 0.5) so boundaries are exact."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_d"),
    ).filter(F.col("gap_d").isNotNull())
    per_cust = (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_d").alias("s"),
            F.sum(F.col("gap_d") * F.col("gap_d")).alias("sq"),
        )
        .filter((F.col("n_gaps") >= 2) & (F.col("s") > 0))
    )
    mean = F.col("s").cast("double") / F.col("n_gaps")
    sd = F.sqrt(
        (F.col("sq").cast("double") - F.col("n_gaps") * mean * mean)
        / (F.col("n_gaps") - 1)
    )
    cv = per_cust.select(
        F.floor(sd / mean * 1e9 + 0.5).alias("cv9")
    )
    return cv.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum("cv9").cast("double") / F.count(F.lit(1)) / 1e9, 6
        ).alias("mean_cv"),
        F.round(
            F.count(F.when(F.col("cv9") < 500000000, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("regular_rate"),
        F.round(
            F.count(F.when(F.col("cv9") > 1000000000, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bursty_rate"),
    )


@register(
    "events_new_vs_returning",
    group="J",
    oracle="""
    with firsts as (
      select user_id,
             cast(date_trunc('day', min(ts)) as date) as first_day
      from events group by 1
    ),
    daily as (
      select cast(date_trunc('day', e.ts) as date) as day,
             e.user_id, f.first_day
      from events e join firsts f using (user_id)
      group by 1, 2, 3
    )
    select day,
           count(*) as n_active,
           count(*) filter (where day = first_day) as n_new,
           count(*) filter (where day > first_day) as n_returning,
           round(cast(count(*) filter (where day > first_day) as double)
                 / count(*), 6) as returning_share
    from daily group by 1 order by day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: daily new-vs-returning split — each active day's users
    partitioned by whether it is their FIRST-seen day: the growth-
    accounting decomposition (DAU = new + retained) that
    events_retention_cohort expands into the full cohort matrix and
    events_stickiness_ratio compresses into one ratio. First-seen is
    a per-user min (one rollup on the user shuffle), joined back to
    the distinct (day, user) activity pairs — both map-combinable;
    exact counts throughout. At 100 TB first-seen is maintained
    incrementally as a keep-min upsert (sink_merge_upsert) instead of
    recomputed."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    daily = (
        e.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "user_id",
        )
        .distinct()
        .join(firsts, "user_id")
    )
    return (
        daily.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count(
                F.when(F.col("day") == F.col("first_day"), 1)
            ).alias("n_new"),
            F.count(
                F.when(F.col("day") > F.col("first_day"), 1)
            ).alias("n_returning"),
            F.round(
                F.count(
                    F.when(F.col("day") > F.col("first_day"), 1)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("returning_share"),
        )
        .orderBy("day")
    )


@register(
    "repair_impute_group_median",
    group="J",
    oracle="""
    with flagged as (
      select l_returnflag,
             case when l_discount = 0 then null else l_discount end
               as disc
      from lineitem
    ),
    med as (
      select l_returnflag,
             quantile_disc(disc, 0.5) as group_median
      from flagged where disc is not null group by 1
    ),
    repaired as (
      select f.l_returnflag,
             f.disc is null as was_missing,
             coalesce(f.disc, m.group_median) as disc_repaired
      from flagged f join med m using (l_returnflag)
    )
    select l_returnflag,
           count(*) as n_rows,
           count(*) filter (where was_missing) as n_imputed,
           round(max(case when was_missing then disc_repaired end), 4)
             as imputed_value,
           round(cast(sum(cast(floor(disc_repaired * 1e6 + 0.5)
                 as bigint)) as double) / count(*) / 1e6, 6)
             as mean_after_repair
    from repaired group by 1 order by l_returnflag
    """,
)
def repair_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: group-median imputation — the standard numeric repair
    (fill missing with the GROUP's median, not the global one:
    conditioning on returnflag preserves between-group structure
    that global imputation erases). 'Missing' is modeled as
    zero-discount rows (the fixture has no physical nulls; the
    repair path — null detection, per-group percentile_disc cut,
    coalesce broadcast-back — is exactly what production runs).
    Median is DISCRETE (bit-exact, the agg_percentile_disc
    property); counts exact; post-repair mean micro-quantized. Two
    passes: quantile then repair — same shape as feature_winsorize,
    same KLL-sketch single-pass variant at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    flagged = li.select(
        "l_returnflag",
        F.when(F.col("l_discount") == 0, None)
        .otherwise(F.col("l_discount"))
        .alias("disc"),
    )
    flagged.filter(F.col("disc").isNotNull()).createOrReplaceTempView(
        "rep_nn"
    )
    med = spark.sql(
        """
        select l_returnflag,
               percentile_disc(0.5) within group (order by disc)
                 as group_median
        from rep_nn group by l_returnflag
        """
    )
    repaired = flagged.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.col("disc").isNull().alias("was_missing"),
        F.coalesce("disc", "group_median").alias("disc_repaired"),
    )
    return (
        repaired.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("was_missing"), 1)).alias("n_imputed"),
            F.round(
                F.max(
                    F.when(F.col("was_missing"), F.col("disc_repaired"))
                ),
                4,
            ).alias("imputed_value"),
            F.round(
                F.sum(
                    F.floor(F.col("disc_repaired") * 1e6 + 0.5)
                ).cast("double")
                / F.count(F.lit(1))
                / 1e6,
                6,
            ).alias("mean_after_repair"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "supplier_balance_zscore_by_nation",
    group="J",
    oracle="""
    with m as (
      select s_nationkey,
             cast(count(*) as bigint) as n,
             cast(sum(cast(floor(s_acctbal * 1e6 + 0.5) as bigint))
                  as bigint) as s_micro,
             cast(sum(cast(floor(s_acctbal * s_acctbal + 0.5) as bigint))
                  as bigint) as sq
      from supplier group by 1 having count(*) >= 5
    ),
    z as (
      select s.s_suppkey, s.s_name, n.n_name as nation, s.s_acctbal,
             (s.s_acctbal - cast(m.s_micro as double) / 1e6 / m.n)
             / sqrt((cast(m.sq as double)
                     - m.n * (cast(m.s_micro as double) / 1e6 / m.n)
                       * (cast(m.s_micro as double) / 1e6 / m.n))
                    / (m.n - 1)) as zscore
      from supplier s
      join m on m.s_nationkey = s.s_nationkey
      join nation n on n.n_nationkey = s.s_nationkey
    )
    select s_suppkey, s_name, nation,
           round(s_acctbal, 2) as acctbal,
           round(zscore, 6) as zscore
    from z where abs(zscore) >= 2
    order by abs(zscore) desc, s_suppkey limit 20
    """,
)
def supplier_balance_zscore_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: within-nation account-balance outliers — each supplier
    scored against its NATION's mean/std (a supplier normal for
    Germany may be 3σ for Kenya; grouping first is what makes the
    flag meaningful — the events_anomaly_seasonal_zscore principle
    applied to a dimension table). Group moments are the exact-int
    (n, Σmicro, Σx²-unit) triple; z is fixed-order IEEE on identical
    operands; the ≥5-supplier floor keeps variances stable. Two
    broadcast joins (moments + nation names) onto one supplier scan;
    top-20 by |z| with key tie-break."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    m = (
        s.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("s_acctbal") * 1e6 + 0.5)).alias(
                "s_micro"
            ),
            F.sum(
                F.floor(F.col("s_acctbal") * F.col("s_acctbal") + 0.5)
            ).alias("sq"),
        )
        .filter(F.col("n") >= 5)
    )
    mean = F.col("s_micro").cast("double") / 1e6 / F.col("n")
    sd = F.sqrt(
        (F.col("sq").cast("double") - F.col("n") * mean * mean)
        / (F.col("n") - 1)
    )
    z = (
        s.join(F.broadcast(m), "s_nationkey")
        .join(
            F.broadcast(n), n.n_nationkey == F.col("s_nationkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            "s_acctbal",
            ((F.col("s_acctbal") - mean) / sd).alias("zscore"),
        )
    )
    return (
        z.filter(F.abs(F.col("zscore")) >= 2)
        .select(
            "s_suppkey",
            "s_name",
            "nation",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round("zscore", 6).alias("zscore"),
        )
        .orderBy(F.abs(F.col("zscore")).desc(), "s_suppkey")
        .limit(20)
    )


@register(
    "events_retention_halflife",
    group="J",
    oracle="""
    with wk as (
      select user_id,
             cast(floor(date_diff('day', timestamp '2024-01-01', ts)
                  / 7) as bigint) as w
      from events
    ),
    firsts as (select user_id, min(w) as w0 from wk group by 1),
    active as (select distinct user_id, w from wk),
    ages as (
      select a.w - f.w0 as age, count(distinct a.user_id) as retained
      from active a join firsts f using (user_id)
      group by 1
    ),
    base as (
      select cast((select count(*) from firsts) as bigint) as cohort
    ),
    pts as (
      select cast(age as double) as x,
             ln(cast(retained as double) / cohort) as y
      from ages, base
      where age >= 1 and retained > 0
    ),
    m as (
      select cast(count(*) as bigint) as n,
             sum(cast(floor(x * 1e6 + 0.5) as bigint)) as sx6,
             sum(cast(floor(y * 1e9 + 0.5) as bigint)) as sy9,
             sum(cast(floor(x * y * 1e9 + 0.5) as bigint)) as sxy9,
             sum(cast(floor(x * x * 1e6 + 0.5) as bigint)) as sxx6
      from pts
    )
    select n as n_ages,
           round((cast(sxy9 as double) / 1e9
                  - (cast(sx6 as double) / 1e6)
                    * (cast(sy9 as double) / 1e9) / n)
                 / (cast(sxx6 as double) / 1e6
                    - (cast(sx6 as double) / 1e6)
                      * (cast(sx6 as double) / 1e6) / n), 6)
             as decay_rate_per_week,
           round(-ln(2)
                 / ((cast(sxy9 as double) / 1e9
                     - (cast(sx6 as double) / 1e6)
                       * (cast(sy9 as double) / 1e9) / n)
                    / (cast(sxx6 as double) / 1e6
                       - (cast(sx6 as double) / 1e6)
                         * (cast(sx6 as double) / 1e6) / n)), 4)
             as halflife_weeks
    from m
    """,
)
def events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: retention half-life — fit ln(retention) = a + b·age by
    OLS over weekly ages and report b (decay per week) and
    −ln2/b (weeks to lose half the cohort): the single number that
    summarizes the retention triangle events_retention_cohort
    tabulates, and the metric growth teams actually track. Pooled
    cohort (all users, age = weeks since each user's first week);
    retention counts are exact distinct-user integers, the ln points
    are quantized into integer moment sums (the weighted-OLS
    pattern of orders_discount_elasticity), and both engines
    evaluate the identical slope expression. Week indexing is
    anchored at a fixed epoch so cohort and age are exact integer
    arithmetic."""
    e = load(spark, sf_dir, "events")
    wk = e.select(
        "user_id",
        F.floor(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            / 7
        ).alias("w"),
    )
    firsts = wk.groupBy("user_id").agg(F.min("w").alias("w0"))
    active = wk.distinct()
    ages = (
        active.join(firsts, "user_id")
        .groupBy((F.col("w") - F.col("w0")).alias("age"))
        .agg(F.count_distinct("user_id").alias("retained"))
    )
    base = firsts.agg(F.count(F.lit(1)).alias("cohort"))
    pts = (
        ages.crossJoin(F.broadcast(base))
        .filter((F.col("age") >= 1) & (F.col("retained") > 0))
        .select(
            F.col("age").cast("double").alias("x"),
            F.log(
                F.col("retained").cast("double") / F.col("cohort")
            ).alias("y"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("x") * 1e6 + 0.5)).alias("sx6"),
        F.sum(F.floor(F.col("y") * 1e9 + 0.5)).alias("sy9"),
        F.sum(F.floor(F.col("x") * F.col("y") * 1e9 + 0.5)).alias(
            "sxy9"
        ),
        F.sum(F.floor(F.col("x") * F.col("x") * 1e6 + 0.5)).alias(
            "sxx6"
        ),
    )
    sx = F.col("sx6").cast("double") / 1e6
    sy = F.col("sy9").cast("double") / 1e9
    sxy = F.col("sxy9").cast("double") / 1e9
    sxx = F.col("sxx6").cast("double") / 1e6
    slope = (sxy - sx * sy / F.col("n")) / (sxx - sx * sx / F.col("n"))
    return m.select(
        F.col("n").alias("n_ages"),
        F.round(slope, 6).alias("decay_rate_per_week"),
        F.round(-float(__import__("math").log(2)) / slope, 4).alias(
            "halflife_weeks"
        ),
    )


@register(
    "events_cumulative_reach",
    group="F",
    oracle="""
    with firsts as (
      select user_id,
             cast(date_trunc('day', min(ts)) as date) as first_day
      from events group by 1
    ),
    daily_new as (
      select first_day as day, cast(count(*) as bigint) as n_new
      from firsts group by 1
    ),
    tot as (select cast(count(*) as bigint) as n_users from firsts)
    select day, n_new,
           cast(sum(n_new) over (order by day
             rows between unbounded preceding and current row)
             as bigint) as cumulative_reach,
           round(cast(sum(n_new) over (order by day
             rows between unbounded preceding and current row)
             as double) / n_users, 6) as reach_share
    from daily_new, tot
    order by day
    """,
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: cumulative reach — running count of distinct users ever
    seen, by day (the audience-growth S-curve; its derivative is
    events_new_vs_returning's n_new and its plateau is total
    addressable reach). Counting cumulative DISTINCT users naively
    needs a growing state set; collapsing to per-user FIRST day
    turns it into a plain cumulative SUM of daily first-appearance
    counts — exact, mergeable, and calendar-sized after the user
    rollup (the standard rewrite for cumulative-distinct at scale).
    One user-keyed rollup, one ordered window over the day table."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    daily_new = firsts.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    tot = firsts.agg(F.count(F.lit(1)).alias("n_users"))
    wc = W.orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        daily_new.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n_new",
            F.sum("n_new").over(wc).alias("cumulative_reach"),
            F.round(
                F.sum("n_new").over(wc).cast("double") / F.col("n_users"),
                6,
            ).alias("reach_share"),
        )
        .orderBy("day")
    )


@register(
    "events_attribution_linear",
    group="J",
    oracle="""
    with purchases as (
      select event_id as p_id, user_id, ts as p_ts,
             cast(floor(coalesce(value, 0) * 1e6 + 0.5) as bigint)
               as v_micro
      from events where event_type = 'purchase'
    ),
    clicks as (
      select user_id, ts as c_ts,
             cast(date_trunc('day', ts) as date) as c_day
      from events where event_type = 'click'
    ),
    touch as (
      select p.p_id, p.v_micro, c.c_day,
             count(*) over (partition by p.p_id) as k
      from purchases p join clicks c
        on c.user_id = p.user_id
       and c.c_ts <= p.p_ts
       and epoch_us(p.p_ts) - epoch_us(c.c_ts)
           <= cast(7 as bigint) * 86400 * 1000000
    ),
    credit as (
      select c_day,
             sum(cast(floor(cast(v_micro as double) / k + 0.5)
                 as bigint)) as credit_micro,
             count(*) as n_touches
      from touch group by 1
    )
    select c_day as day, n_touches,
           cast((credit_micro + 5000) // 10000 as double) / 100
             as credited_value
    from credit order by day
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: LINEAR multi-touch attribution — every click in the 7
    days before a purchase shares the purchase value equally
    (events_attribution_lastclick gives the final touch everything;
    linear is the other canonical model, and the delta between the
    two reports is itself the 'how top-heavy is our funnel'
    diagnostic). Credit per touch = value/k computed identically in
    both engines and HALF-EVEN-quantized per touch before the
    per-day sum, so no cross-engine penny drift; the touch window
    is exact integer microseconds. One user-keyed join bounded by
    the 7-day predicate + a per-purchase count window — at 100 TB
    the join prunes by time-bucketing both sides (the join_asof
    machinery) before the pair expansion."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1e6 + 0.5).alias(
            "v_micro"
        ),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.date_trunc("day", "ts").cast("date").alias("c_day"),
    )
    week_us = 7 * 86400 * 1000000
    touch = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_micros("p_ts") - F.unix_micros("c_ts")
            <= F.lit(week_us)
        ),
    ).select(
        "p_id",
        "v_micro",
        "c_day",
        F.count(F.lit(1)).over(W.partitionBy("p_id")).alias("k"),
    )
    return (
        touch.groupBy(F.col("c_day").alias("day"))
        .agg(
            F.sum(
                F.floor(
                    F.col("v_micro").cast("double") / F.col("k") + 0.5
                )
            ).alias("credit_micro"),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .select(
            "day",
            "n_touches",
            # exact-integer cent rounding (see orders_revenue_waterfall
            # dsum2): round(x, 2) on the micro quotient is
            # engine-divergent at half-cent boundaries
            (
                (
                    (
                        (F.col("credit_micro") + 5000)
                        - F.pmod(F.col("credit_micro") + 5000, F.lit(10000))
                    )
                    / F.lit(10000)
                ).cast("double")
                / 100
            ).alias("credited_value"),
        )
        .orderBy("day")
    )


@register(
    "events_dwell_time_profile",
    group="J",
    oracle="""
    with g as (
      select event_type,
             epoch_us(lead(ts) over (partition by user_id
               order by ts, event_id)) - epoch_us(ts) as dwell_us
      from events
    ),
    d as (select event_type, dwell_us // 1000000 as dwell_s
          from g where dwell_us is not null)
    select event_type,
           count(*) as n_dwells,
           cast(quantile_disc(dwell_s, 0.5) as bigint) as p50_s,
           cast(quantile_disc(dwell_s, 0.9) as bigint) as p90_s,
           round(cast(sum(dwell_s) as double) / count(*), 4)
             as mean_dwell_s
    from d group by 1 order by event_type
    """,
)
def events_dwell_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: dwell time by action — how long users linger AFTER each
    event type before their next action (lead-gap attribution to the
    PRECEDING event, the convention engagement analytics uses: a
    long dwell after 'view' is reading; after 'error' it's
    abandonment-in-progress). Exact integer microsecond gaps
    (events_interevent_hist discipline) floor-divided to seconds;
    p50/p90 are DISCRETE quantiles (bit-exact values), mean is an
    exact-int ratio. One lead window on the user shuffle + a
    per-type rollup; the per-type quantile sort runs on gap values,
    not raw events."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        e.select(
            "event_type",
            (
                F.unix_micros(F.lead("ts").over(w))
                - F.unix_micros("ts")
            ).alias("dwell_us"),
        )
        .filter(F.col("dwell_us").isNotNull())
        .select(
            "event_type",
            F.expr("dwell_us div 1000000").alias("dwell_s"),
        )
    )
    g.createOrReplaceTempView("dwell_g")
    return spark.sql(
        """
        select event_type,
               count(*) as n_dwells,
               cast(percentile_disc(0.5) within group (order by dwell_s)
                 as bigint) as p50_s,
               cast(percentile_disc(0.9) within group (order by dwell_s)
                 as bigint) as p90_s,
               round(cast(sum(dwell_s) as double) / count(*), 4)
                 as mean_dwell_s
        from dwell_g group by event_type order by event_type
        """
    )


@register(
    "events_abandonment_rate",
    group="J",
    oracle="""
    with clicks as (
      select user_id, ts as c_ts,
             cast(date_trunc('day', ts) as date) as day
      from events where event_type = 'click'
    ),
    converted as (
      select distinct c.user_id, c.c_ts
      from clicks c join events p
        on p.user_id = c.user_id
       and p.event_type = 'purchase'
       and p.ts >= c.c_ts
       and epoch_us(p.ts) - epoch_us(c.c_ts)
           <= cast(72 as bigint) * 3600 * 1000000
    )
    select day,
           count(*) as n_clicks,
           count(*) filter (where cv.user_id is null) as n_abandoned,
           round(cast(count(*) filter (where cv.user_id is null)
                 as double) / count(*), 6) as abandonment_rate
    from clicks c
    left join converted cv
      on cv.user_id = c.user_id and cv.c_ts = c.c_ts
    group by 1 order by day
    """,
)
def events_abandonment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: abandonment rate — clicks with NO purchase by the same
    user within 72 h, per day: the complement of
    events_funnel_maxgap's conversion edge (what the funnel DROPS,
    tracked as its own KPI because its spikes localize breakage to
    a day). The converted set is an existence join (left-anti
    semantics via left join + null test — both engines agree on
    null semantics here because the join key is never null), with
    the window as exact integer microseconds; counts exact. At
    100 TB both sides time-bucket before the join — the same
    pruning the attribution operators use."""
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    win = 72 * 3600 * 1000000
    converted = (
        clicks.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (
                F.unix_micros("p_ts") - F.unix_micros("c_ts")
                <= F.lit(win)
            ),
        )
        .select("user_id", "c_ts")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    j = clicks.join(converted, ["user_id", "c_ts"], "left")
    return (
        j.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias(
                "n_abandoned"
            ),
            F.round(
                F.count(F.when(F.col("hit").isNull(), 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("abandonment_rate"),
        )
        .orderBy("day")
    )


@register(
    "events_concurrency_peak",
    group="F",
    oracle="""
    with marked as (
      select user_id, ts, event_id,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w)
                       > 1800 * 1000000
                  then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ),
    sess_rows as (
      select user_id, ts,
             sum(is_new) over (partition by user_id
               order by ts, event_id
               rows between unbounded preceding and current row)
               as session_id
      from marked
    ),
    sessions as (
      select user_id, session_id,
             min(ts) as s_start,
             max(ts) + interval 30 minute as s_end
      from sess_rows group by 1, 2
    ),
    deltas as (
      select s_start as t, 1 as d from sessions
      union all
      select s_end as t, -1 from sessions
    ),
    sweep as (
      select t,
             sum(d) over (order by t, d desc
               rows between unbounded preceding and current row)
               as concurrent
      from deltas
    ),
    daily as (
      select cast(date_trunc('day', t) as date) as day,
             cast(max(concurrent) as bigint) as peak_concurrent
      from sweep group by 1
    )
    select day, peak_concurrent
    from daily order by peak_concurrent desc, day limit 15
    """,
)
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: peak concurrent sessions per day — the capacity-planning
    number (licensing, connection pools, autoscaling floors) via the
    classic interval sweep: sessions (30-min-gap sessionization, end
    = last event + 30 min) become +1/−1 boundary events, the running
    sum is instantaneous concurrency, per-day max is the peak.
    Boundary ordering puts +1 before −1 at identical timestamps
    (order by t, d desc — the 'touching intervals overlap'
    convention) so both engines sweep identically; all integers.
    The global sweep is one ordered window over session boundaries
    (2 rows per session — session-scale, not event-scale); at
    extreme scale the sweep shards by day with carry-in offsets."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1000000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = (
        marked.select(
            "user_id", "ts", F.sum("is_new").over(wc).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias("s_end"),
        )
    )
    deltas = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    from datalakecrawler_spark.distrank import with_global_cumsum

    # distributed sweep-line: the +1/-1 boundary stream is session-
    # grain (data-proportional). (t, d desc) ties are share-a-value
    # runs whose per-day max is tie-order-invariant (+1 runs peak at
    # the run end, -1 runs at the run start), so the range-partitioned
    # prefix sum gives the identical answer to the global window.
    sweep = with_global_cumsum(
        deltas,
        spark,
        [F.col("t"), F.col("d").desc()],
        "d",
        out="concurrent",
        inclusive=True,
    ).select("t", "concurrent")
    return (
        sweep.groupBy(
            F.date_trunc("day", "t").cast("date").alias("day")
        )
        .agg(F.max("concurrent").alias("peak_concurrent"))
        .orderBy(F.col("peak_concurrent").desc(), "day")
        .limit(15)
    )


@register(
    "events_bot_flags",
    group="J",
    oracle="""
    with gaps as (
      select user_id,
             (epoch_us(ts) - epoch_us(lag(ts) over (
                partition by user_id order by ts, event_id)))
               // 1000000 as gap_s
      from events
    ),
    gap_med as (
      select user_id,
             cast(quantile_disc(gap_s, 0.5) as bigint) as med_gap_s
      from gaps where gap_s is not null group by 1
    ),
    profile as (
      select user_id,
             cast(count(*) as bigint) as n_events,
             cast(count(distinct event_type) as bigint) as n_types
      from events group by 1
    )
    select p.user_id, p.n_events, p.n_types, g.med_gap_s,
           g.med_gap_s <= 2 as flag_rapid_fire,
           p.n_types = 1 as flag_single_action,
           (g.med_gap_s <= 2 and p.n_types = 1) as flag_bot_likely
    from profile p join gap_med g using (user_id)
    where g.med_gap_s <= 2 or p.n_types = 1
    order by p.user_id
    """,
)
def events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: rule-based bot flags — users whose median inter-event
    gap is ≤2 s (rapid fire) or whose action repertoire is a single
    type (replay/scraper), with the conjunction as the
    high-confidence flag: the triage list a traffic-quality pipeline
    feeds to review before excluding from events_ab_ztest (bots in
    one arm are how SRM and fake lifts happen — the composite
    policy over signals events_interevent_hist and
    events_entropy_per_user profile in aggregate). Median gap is
    DISCRETE on exact integer seconds (bit-exact); flags are
    integer comparisons. Two rollups on the user shuffle."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "user_id",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
        .select("user_id", F.expr("gap_us div 1000000").alias("gap_s"))
    )
    gaps.createOrReplaceTempView("bot_gaps")
    gap_med = spark.sql(
        """
        select user_id,
               cast(percentile_disc(0.5) within group (order by gap_s)
                 as bigint) as med_gap_s
        from bot_gaps group by user_id
        """
    )
    profile = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
    )
    j = profile.join(gap_med, "user_id")
    return (
        j.filter(
            (F.col("med_gap_s") <= 2) | (F.col("n_types") == 1)
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            "med_gap_s",
            (F.col("med_gap_s") <= 2).alias("flag_rapid_fire"),
            (F.col("n_types") == 1).alias("flag_single_action"),
            (
                (F.col("med_gap_s") <= 2) & (F.col("n_types") == 1)
            ).alias("flag_bot_likely"),
        )
        .orderBy("user_id")
    )


@register(
    "customer_lifecycle_stages",
    group="J",
    oracle="""
    with snap as (
      select max(o_orderdate) as as_of from orders
    ),
    cust as (
      select o_custkey,
             cast(count(*) as bigint) as n_orders,
             min(o_orderdate) as first_dt,
             max(o_orderdate) as last_dt
      from orders group by 1
    ),
    staged as (
      select o_custkey, n_orders,
             date_diff('day', last_dt, as_of) as recency_d,
             date_diff('day', first_dt, as_of) as tenure_d,
             case
               when date_diff('day', first_dt, as_of) <= 90 then 'new'
               when date_diff('day', last_dt, as_of) <= 180
                 then 'active'
               when date_diff('day', last_dt, as_of) <= 365
                 then 'at_risk'
               else 'churned'
             end as stage
      from cust, snap
    )
    select stage,
           count(*) as n_customers,
           round(cast(sum(n_orders) as double) / count(*), 4)
             as avg_orders,
           cast(min(recency_d) as bigint) as min_recency_d,
           cast(max(recency_d) as bigint) as max_recency_d
    from staged group by 1 order by stage
    """,
)
def customer_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: lifecycle stage classification — every customer binned
    new (≤90 d tenure) / active (ordered within 180 d) / at-risk
    (180–365 d silent) / churned (>1 y silent) as of the data
    horizon: the CRM state machine whose stage-count trend is the
    health dashboard, and whose at-risk list is the win-back
    campaign input (customer_rfm_segmentation scores; this assigns
    the OPERATIONAL state; orders_survival_km calibrates where the
    thresholds should sit). Per-customer first/last/count ride one
    rollup; stage rules are integer day comparisons against the
    broadcast as-of scalar."""
    o = load(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("as_of"))
    cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").alias("first_dt"),
        F.max("o_orderdate").alias("last_dt"),
    )
    j = cust.crossJoin(F.broadcast(snap))
    recency = F.datediff(F.col("as_of"), F.col("last_dt"))
    tenure = F.datediff(F.col("as_of"), F.col("first_dt"))
    staged = j.select(
        "n_orders",
        recency.alias("recency_d"),
        F.when(tenure <= 90, "new")
        .when(recency <= 180, "active")
        .when(recency <= 365, "at_risk")
        .otherwise("churned")
        .alias("stage"),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum("n_orders").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_orders"),
            F.min("recency_d").cast("bigint").alias("min_recency_d"),
            F.max("recency_d").cast("bigint").alias("max_recency_d"),
        )
        .orderBy("stage")
    )


@register(
    "events_daypart_mix",
    group="J",
    oracle="""
    with parted as (
      select event_type,
             case
               when date_part('hour', ts) between 6 and 11
                 then 'morning'
               when date_part('hour', ts) between 12 and 17
                 then 'afternoon'
               when date_part('hour', ts) between 18 and 23
                 then 'evening'
               else 'night'
             end as daypart
      from events
    ),
    cells as (
      select event_type, daypart, cast(count(*) as bigint) as c
      from parted group by 1, 2
    ),
    m as (
      select event_type, daypart, c,
             sum(c) over (partition by event_type) as ct,
             sum(c) over (partition by daypart) as cd,
             sum(c) over () as n
      from cells
    )
    select event_type, daypart, c as n_events,
           round(cast(c as double) / ct, 6) as share_of_type,
           round((cast(c as double) / ct)
                 / (cast(cd as double) / n), 6) as index_vs_overall
    from m
    order by event_type, daypart
    """,
)
def events_daypart_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: daypart mix with over-index — each action type's
    distribution across morning/afternoon/evening/night, and its
    index against the overall daypart mix (index > 1 = the action
    over-concentrates in that daypart; purchases indexing high at
    night is the fraud/timezone smell, errors indexing at one
    daypart localizes a batch-job collision). Hour extraction uses
    the session-pinned UTC zone in both engines; the contingency +
    marginal windows run on the 20-cell table; exact counts, two
    fixed-order ratios."""
    e = load(spark, sf_dir, "events")
    hour = F.hour("ts")
    parted = e.select(
        "event_type",
        F.when(hour.between(6, 11), "morning")
        .when(hour.between(12, 17), "afternoon")
        .when(hour.between(18, 23), "evening")
        .otherwise("night")
        .alias("daypart"),
    )
    cells = parted.groupBy("event_type", "daypart").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = cells.select(
        "event_type",
        "daypart",
        "c",
        F.sum("c").over(W.partitionBy("event_type")).alias("ct"),
        F.sum("c").over(W.partitionBy("daypart")).alias("cd"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    return m.select(
        "event_type",
        "daypart",
        F.col("c").alias("n_events"),
        F.round(F.col("c").cast("double") / F.col("ct"), 6).alias(
            "share_of_type"
        ),
        F.round(
            (F.col("c").cast("double") / F.col("ct"))
            / (F.col("cd").cast("double") / F.col("n")),
            6,
        ).alias("index_vs_overall"),
    ).orderBy("event_type", "daypart")


@register(
    "events_returning_conversion_lift",
    group="J",
    oracle="""
    with firsts as (
      select user_id, cast(date_trunc('day', min(ts)) as date)
               as first_day
      from events group by 1
    ),
    daily_user as (
      select e.user_id,
             cast(date_trunc('day', e.ts) as date) as day,
             max(case when e.event_type = 'purchase' then 1 else 0 end)
               as purchased
      from events e group by 1, 2
    ),
    tagged as (
      select d.purchased,
             case when d.day = f.first_day then 'new'
                  else 'returning' end as cohort
      from daily_user d join firsts f using (user_id)
    ),
    g as (
      select cohort, cast(count(*) as bigint) as n_user_days,
             cast(sum(purchased) as bigint) as n_converted
      from tagged group by 1
    ),
    w as (
      select max(case when cohort = 'new' then n_user_days end) as nn,
             max(case when cohort = 'new' then n_converted end) as cn,
             max(case when cohort = 'returning' then n_user_days end)
               as nr,
             max(case when cohort = 'returning' then n_converted end)
               as cr
      from g
    )
    select nn as new_user_days, cn as new_conversions,
           nr as returning_user_days, cr as returning_conversions,
           round(cast(cn as double) / nn, 6) as new_rate,
           round(cast(cr as double) / nr, 6) as returning_rate,
           round((cast(cr as double) / nr)
                 / (cast(cn as double) / nn), 6) as returning_lift
    from w
    """,
)
def events_returning_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: returning-vs-new conversion lift — per user-day, does a
    RETURNING visit convert more often than a first visit? The ratio
    of the two day-level conversion rates is the retention-value
    argument in one number ('a returning visit is worth 1.8 first
    visits'), joining events_new_vs_returning's traffic split to
    outcome quality. Day-level grain avoids survivor bias from
    heavy users dominating user-level rates. Exact counts from two
    rollups sharing the user shuffle; fixed-order ratios."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    daily_user = e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("purchased")
    )
    tagged = daily_user.join(firsts, "user_id").select(
        "purchased",
        F.when(F.col("day") == F.col("first_day"), "new")
        .otherwise("returning")
        .alias("cohort"),
    )
    g = tagged.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum("purchased").alias("n_converted"),
    )
    w = g.agg(
        F.max(
            F.when(F.col("cohort") == "new", F.col("n_user_days"))
        ).alias("nn"),
        F.max(
            F.when(F.col("cohort") == "new", F.col("n_converted"))
        ).alias("cn"),
        F.max(
            F.when(F.col("cohort") == "returning", F.col("n_user_days"))
        ).alias("nr"),
        F.max(
            F.when(F.col("cohort") == "returning", F.col("n_converted"))
        ).alias("cr"),
    )
    return w.select(
        F.col("nn").alias("new_user_days"),
        F.col("cn").alias("new_conversions"),
        F.col("nr").alias("returning_user_days"),
        F.col("cr").alias("returning_conversions"),
        F.round(F.col("cn").cast("double") / F.col("nn"), 6).alias(
            "new_rate"
        ),
        F.round(F.col("cr").cast("double") / F.col("nr"), 6).alias(
            "returning_rate"
        ),
        F.round(
            (F.col("cr").cast("double") / F.col("nr"))
            / (F.col("cn").cast("double") / F.col("nn")),
            6,
        ).alias("returning_lift"),
    )


@register(
    "events_session_action_lift",
    group="J",
    oracle="""
    with marked as (
      select user_id, ts, event_id, event_type,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w)
                       > 1800 * 1000000
                  then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ),
    sess as (
      select user_id, event_type,
             sum(is_new) over (partition by user_id
               order by ts, event_id
               rows between unbounded preceding and current row)
               as session_id
      from marked
    ),
    sa as (
      select distinct user_id, session_id, event_type from sess
    ),
    n as (
      select cast(count(distinct (user_id, session_id)) as bigint)
               as n_sessions
      from sa
    ),
    singles as (
      select event_type, cast(count(*) as bigint) as c
      from sa group by 1
    ),
    pairs as (
      select a.event_type as t1, b.event_type as t2,
             cast(count(*) as bigint) as c12
      from sa a join sa b
        on a.user_id = b.user_id and a.session_id = b.session_id
       and a.event_type < b.event_type
      group by 1, 2
    )
    select t1, t2, c12 as n_cooccur,
           round(cast(c12 as double) * n.n_sessions
                 / (s1.c * cast(s2.c as double)), 6) as lift
    from pairs
    join singles s1 on s1.event_type = t1
    join singles s2 on s2.event_type = t2
    cross join n
    order by t1, t2
    """,
)
def events_session_action_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: within-session action co-occurrence lift — for every
    action pair, P(both in a session)/(P(a)·P(b)): the behavioral
    basket analysis (orders_market_basket over SESSIONS instead of
    orders — lift > 1 pairs define flows worth bundling in UX;
    error co-occurring with purchase above chance is a checkout-bug
    signal). Sessionization shares the 30-min machinery; the
    distinct (session, action) projection collapses to
    session-grain before the pair self-join (fan-out ≤ 5²/2 pairs
    per session). Exact counts; one fixed-order lift expression."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1000000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sa = (
        marked.select(
            "user_id",
            "event_type",
            F.sum("is_new").over(wc).alias("session_id"),
        )
        .distinct()
    )
    n = sa.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    singles = sa.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = sa.alias("a")
    b = sa.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    s1 = singles.select(
        F.col("event_type").alias("t1"), F.col("c").alias("c1")
    )
    s2 = singles.select(
        F.col("event_type").alias("t2"), F.col("c").alias("c2")
    )
    return (
        pairs.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            F.col("c12").alias("n_cooccur"),
            F.round(
                F.col("c12").cast("double")
                * F.col("n_sessions")
                / (F.col("c1") * F.col("c2").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy("t1", "t2")
    )


@register(
    "events_prop_value_profile",
    group="J",
    oracle="""
    with ex as (
      select cast(json_extract(props, '$.k') as bigint) as k,
             event_type
      from events where props is not null
    )
    select event_type,
           count(*) as n_events,
           cast(count(distinct k) as bigint) as n_distinct_k,
           cast(min(k) as bigint) as min_k,
           cast(max(k) as bigint) as max_k,
           round(cast(sum(k) as double) / count(*), 6) as mean_k
    from ex group by 1 order by event_type
    """,
)
def events_prop_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: semi-structured property profiling — extract the
    numeric `k` from the JSON props payload and profile it per
    event type (the schema-on-read drill: the crawler's numeric
    profiler (catalog_profile_numeric) applied THROUGH a JSON
    path, which is how event instrumentation actually ships
    fields; map_json_get covers extraction mechanics, this is the
    downstream statistics pass). JSON path evaluation is JVM-side
    in both engines with identical integer results; all stats are
    exact ints + one exact ratio."""
    e = load(spark, sf_dir, "events")
    ex = e.where(F.col("props").isNotNull()).select(
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        "event_type",
    )
    return (
        ex.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("k").alias("n_distinct_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_post_error_behavior",
    group="J",
    oracle="""
    with seq as (
      select event_type,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events
    ),
    post_err as (
      select event_type as next_type, cast(count(*) as bigint) as c
      from seq where prev_type = 'error' group by 1
    ),
    base as (
      select event_type as next_type, cast(count(*) as bigint) as b
      from seq where prev_type is not null group by 1
    ),
    tot as (
      select (select cast(sum(c) as bigint) from post_err) as tc,
             (select cast(sum(b) as bigint) from base) as tb
    )
    select p.next_type,
           p.c as n_after_error,
           round(cast(p.c as double) / tot.tc, 6) as p_after_error,
           round(cast(base.b as double) / tot.tb, 6) as p_baseline,
           round((cast(p.c as double) / tot.tc)
                 / (cast(base.b as double) / tot.tb), 6) as lift
    from post_err p join base using (next_type) cross join tot
    order by p.next_type
    """,
)
def events_post_error_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: post-error behavior — the next-action distribution
    immediately after an error vs the overall next-action baseline,
    as a lift per action (lift < 1 on 'purchase' after errors
    quantifies revenue damage per error; lift > 1 on 'error'
    measures error cascading — the single transition-matrix ROW
    that operations actually stares at, pulled out with its
    significance-ready counts). Same lag plumbing as
    events_transition_matrix; exact counts; fixed-order lift."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    post_err = (
        seq.filter(F.col("prev_type") == "error")
        .groupBy(F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    base = seq.groupBy(F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("b")
    )
    tc = post_err.agg(F.sum("c").alias("tc"))
    tb = base.agg(F.sum("b").alias("tb"))
    j = (
        post_err.join(base, "next_type")
        .crossJoin(F.broadcast(tc))
        .crossJoin(F.broadcast(tb))
    )
    pa = F.col("c").cast("double") / F.col("tc")
    pb = F.col("b").cast("double") / F.col("tb")
    return j.select(
        "next_type",
        F.col("c").alias("n_after_error"),
        F.round(pa, 6).alias("p_after_error"),
        F.round(pb, 6).alias("p_baseline"),
        F.round(pa / pb, 6).alias("lift"),
    ).orderBy("next_type")


@register(
    "events_user_type_overlap",
    group="J",
    oracle="""
    with ut as (
      select distinct event_type, user_id from events
    ),
    sizes as (
      select event_type, cast(count(*) as bigint) as n
      from ut group by 1
    ),
    inter as (
      select a.event_type as t1, b.event_type as t2,
             cast(count(*) as bigint) as both_users
      from ut a join ut b
        on a.user_id = b.user_id and a.event_type < b.event_type
      group by 1, 2
    )
    select t1, t2, both_users,
           round(cast(both_users as double)
                 / (s1.n + s2.n - both_users), 6) as user_jaccard
    from inter
    join sizes s1 on s1.event_type = t1
    join sizes s2 on s2.event_type = t2
    order by t1, t2
    """,
)
def events_user_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: audience overlap between behaviors — Jaccard of USER
    SETS per action pair ('are viewers and purchasers the same
    people?'): near-1 overlap means one engaged population (segment
    by intensity, not action); low purchase∩error overlap would
    clear errors of revenue impact — the audience-level complement
    to events_session_action_lift's session-level co-occurrence.
    Distinct (type, user) projection → pair intersection via
    user-keyed self-join → inclusion-exclusion union; exact counts,
    one ratio; entity-sized throughout."""
    e = load(spark, sf_dir, "events")
    ut = e.select("event_type", "user_id").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).alias("both_users"))
    )
    s1 = sizes.select(
        F.col("event_type").alias("t1"), F.col("n").alias("n1")
    )
    s2 = sizes.select(
        F.col("event_type").alias("t2"), F.col("n").alias("n2")
    )
    return (
        inter.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1",
            "t2",
            "both_users",
            F.round(
                F.col("both_users").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("both_users")),
                6,
            ).alias("user_jaccard"),
        )
        .orderBy("t1", "t2")
    )


@register(
    "events_value_by_position",
    group="J",
    oracle="""
    with pos as (
      select coalesce(value, 0) as v,
             least(row_number() over (partition by user_id,
               cast(date_trunc('day', ts) as date)
               order by ts, event_id), 10) as position
      from events
    )
    select cast(position as bigint) as position_capped_10,
           count(*) as n_events,
           round(cast(sum(cast(floor(v * 1e6 + 0.5) as bigint))
                 as double) / count(*) / 1e6, 6) as avg_value
    from pos group by 1 order by position_capped_10
    """,
)
def events_value_by_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: value by within-day event position — average event
    value at the 1st, 2nd, … 10th+ action of a user's day (position
    capped at 10): the engagement-depth value curve ('do later
    actions in a visit monetize better?' — rising curves justify
    session-extension features, falling ones front-load). Position
    is a per-(user, day) row_number — the same user_id shuffle every
    per-user operator rides; value sums micro-exact."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy(
        "user_id", F.date_trunc("day", "ts").cast("date")
    ).orderBy("ts", "event_id")
    pos = e.select(
        F.coalesce(F.col("value"), F.lit(0)).alias("v"),
        F.least(F.row_number().over(w), F.lit(10)).alias("position"),
    )
    return (
        pos.groupBy(
            F.col("position").cast("bigint").alias("position_capped_10")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.floor(F.col("v") * 1e6 + 0.5)).cast("double")
                / F.count(F.lit(1))
                / 1e6,
                6,
            ).alias("avg_value"),
        )
        .orderBy("position_capped_10")
    )


@register(
    "events_onboarding_predictor",
    group="J",
    oracle="""
    with firsts as (
      select user_id,
             cast(date_trunc('day', min(ts)) as date) as first_day
      from events group by 1
    ),
    first_day_events as (
      select e.user_id, cast(count(*) as bigint) as x
      from events e join firsts f using (user_id)
      where cast(date_trunc('day', e.ts) as date) = f.first_day
      group by 1
    ),
    retained as (
      select e.user_id,
             max(case when date_diff('day', f.first_day,
                   cast(date_trunc('day', e.ts) as date)) >= 14
                 then 1 else 0 end) as y
      from events e join firsts f using (user_id)
      group by 1
    ),
    j as (
      select fd.x, r.y
      from first_day_events fd join retained r using (user_id)
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as sx,
             cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx
      from j
    )
    select n as n_users,
           round(cast(sy as double) / n, 6) as retained_14d_rate,
           round((cast(n as double) * sxy
                  - cast(sx as double) * sy)
                 / sqrt((cast(n as double) * sxx
                         - cast(sx as double) * sx)
                        * (cast(n as double) * sy
                           - cast(sy as double) * sy)), 6)
             as pointbiserial_corr
    from m
    """,
)
def events_onboarding_predictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: does day-one intensity predict retention? The
    point-biserial correlation between first-day event count and a
    14-day-return flag — the canonical 'aha-moment' analysis
    (Facebook's 7-friends-in-10-days genre): a strong correlation
    justifies optimizing onboarding for depth, a weak one debunks
    the vanity metric. Point-biserial is Pearson with a binary y,
    so Σy = Σy² — five exact integer moment sums and the shared
    fixed-order formula. Two user-keyed rollups on the same
    shuffle."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    j = e.join(firsts, "user_id")
    fd = (
        j.where(
            F.date_trunc("day", "ts").cast("date") == F.col("first_day")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    ret = j.groupBy("user_id").agg(
        F.max(
            F.when(
                F.datediff(
                    F.date_trunc("day", "ts").cast("date"),
                    F.col("first_day"),
                )
                >= 14,
                1,
            ).otherwise(0)
        ).alias("y")
    )
    m = fd.join(ret, "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("sy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias(
            "retained_14d_rate"
        ),
        F.round(num / den, 6).alias("pointbiserial_corr"),
    )


@register(
    "events_session_depth_curve",
    group="J",
    oracle="""
    with marked as (
      select user_id, ts, event_id,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w)
                       > 1800 * 1000000
                  then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ),
    sess as (
      select user_id,
             sum(is_new) over (partition by user_id
               order by ts, event_id
               rows between unbounded preceding and current row)
               as session_id
      from marked
    ),
    depth as (
      select cast(count(*) as bigint) as d
      from sess group by user_id, session_id
    ),
    tot as (select cast(count(*) as bigint) as n_sessions from depth),
    ks as (select unnest(range(1, 11)) as k)
    select k as min_depth,
           cast(count(*) filter (where d >= k) as bigint) as n_sessions,
           round(cast(count(*) filter (where d >= k) as double)
                 / max(tot.n_sessions), 6) as share_reaching
    from ks cross join depth cross join tot
    group by k order by k
    """,
)
def events_session_depth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: session-depth survival curve — the share of sessions
    reaching at least k events, k = 1..10 (the engagement funnel in
    its purest form: each step's drop-off is where sessions die,
    and the curve's area is mean session depth —
    events_session_bounce_rate is exactly the k=2 complement).
    Session depths from the shared 30-min sessionization; the curve
    is ten threshold counts over the session-grain table. Exact
    counts throughout."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1000000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    depth = (
        marked.select(
            "user_id", F.sum("is_new").over(wc).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tot = depth.agg(F.count(F.lit(1)).alias("n_sessions"))
    ks = spark.range(1, 11).select(F.col("id").alias("k"))
    return (
        F.broadcast(ks)
        .crossJoin(depth)
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").alias("min_depth"))
        .agg(
            F.count(F.when(F.col("d") >= F.col("k"), 1)).alias(
                "n_sessions"
            ),
            F.round(
                F.count(
                    F.when(F.col("d") >= F.col("k"), 1)
                ).cast("double")
                / F.max("n_sessions"),
                6,
            ).alias("share_reaching"),
        )
        .orderBy("min_depth")
    )


@register(
    "events_attribution_position",
    group="J",
    oracle="""
    with purchases as (
      select event_id as p_id, user_id, ts as p_ts,
             cast(floor(coalesce(value, 0) * 1e6 + 0.5) as bigint)
               as v_micro
      from events where event_type = 'purchase'
    ),
    touch as (
      select p.p_id, p.v_micro,
             cast(date_trunc('day', c.ts) as date) as c_day,
             row_number() over (partition by p.p_id
               order by c.ts, c.event_id) as pos,
             count(*) over (partition by p.p_id) as k
      from purchases p join events c
        on c.user_id = p.user_id
       and c.event_type = 'click'
       and c.ts <= p.p_ts
       and epoch_us(p.p_ts) - epoch_us(c.ts)
           <= cast(7 as bigint) * 86400 * 1000000
    ),
    credited as (
      select c_day,
             cast(floor(cast(v_micro as double) *
               case
                 when k = 1 then 1.0
                 when k = 2 then 0.5
                 when pos = 1 then 0.4
                 when pos = k then 0.4
                 else 0.2 / (k - 2)
               end + 0.5) as bigint) as credit,
             case when pos = 1 or pos = k then 'endpoint'
                  else 'middle' end as role
      from touch
    )
    select c_day as day, role,
           count(*) as n_touches,
           round(cast(sum(credit) as double) / 1e6, 2)
             as credited_value
    from credited group by 1, 2 order by day, role
    """,
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: position-based (U-shaped) attribution — 40% of purchase
    credit to the FIRST touch, 40% to the LAST, 20% split across the
    middle (the model that values discovery and closing over
    mid-journey noise; with last-click and linear this completes the
    standard three-model comparison set — the spread between models
    IS the channel-mix uncertainty band). Touch positions are
    deterministic window ranks inside the 7-day exact-microsecond
    window; per-touch credit is quantized before the per-day/role
    sums so the U-weights reconcile to purchase totals within
    per-touch rounding."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1e6 + 0.5).alias(
            "v_micro"
        ),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.date_trunc("day", "ts").cast("date").alias("c_day"),
    )
    week_us = 7 * 86400 * 1000000
    touch = purchases.join(
        clicks,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_micros("p_ts") - F.unix_micros("c_ts")
            <= F.lit(week_us)
        ),
    ).select(
        "p_id",
        "v_micro",
        "c_day",
        F.row_number()
        .over(W.partitionBy("p_id").orderBy("c_ts", "c_id"))
        .alias("pos"),
        F.count(F.lit(1)).over(W.partitionBy("p_id")).alias("k"),
    )
    weight = (
        F.when(F.col("k") == 1, 1.0)
        .when(F.col("k") == 2, 0.5)
        .when(F.col("pos") == 1, 0.4)
        .when(F.col("pos") == F.col("k"), 0.4)
        .otherwise(0.2 / (F.col("k") - 2))
    )
    credited = touch.select(
        "c_day",
        F.floor(
            F.col("v_micro").cast("double") * weight + 0.5
        ).alias("credit"),
        F.when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("k")),
            "endpoint",
        )
        .otherwise("middle")
        .alias("role"),
    )
    return (
        credited.groupBy(F.col("c_day").alias("day"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(
                F.sum("credit").cast("double") / 1e6, 2
            ).alias("credited_value"),
        )
        .orderBy("day", "role")
    )


@register(
    "events_growth_accounting",
    group="J",
    oracle="""
    with mu as (
      select distinct user_id,
             cast(date_trunc('month', ts) as date) as m
      from events
    ),
    firsts as (
      select user_id, min(m) as first_m from mu group by 1
    ),
    months as (select distinct m from mu),
    curr as (
      select mu.m, mu.user_id, f.first_m,
             exists (select 1 from mu p
                     where p.user_id = mu.user_id
                       and p.m = mu.m - interval 1 month) as was_prev
      from mu join firsts f using (user_id)
    ),
    flows as (
      select m,
             count(*) filter (where m = first_m) as new_users,
             count(*) filter (where m <> first_m and was_prev)
               as retained,
             count(*) filter (where m <> first_m and not was_prev)
               as resurrected
      from curr group by 1
    ),
    churn as (
      select cast(p.m + interval 1 month as date) as m,
             cast(count(*) as bigint) as churned
      from mu p
      where not exists (select 1 from mu c
                        where c.user_id = p.user_id
                          and c.m = p.m + interval 1 month)
        and exists (select 1 from months mm
                    where mm.m = cast(p.m + interval 1 month as date))
      group by 1
    )
    select f.m as month,
           cast(f.new_users + f.retained + f.resurrected as bigint)
             as mau,
           cast(f.new_users as bigint) as new_users,
           cast(f.retained as bigint) as retained,
           cast(f.resurrected as bigint) as resurrected,
           cast(coalesce(c.churned, 0) as bigint) as churned_from_prev
    from flows f left join churn c using (m)
    order by f.m
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: monthly growth accounting — MAU decomposed into the
    standard four flows: new (first month), retained (also active
    last month), resurrected (returning after a gap), churned
    (active last month, absent now) — with the identity MAU_t =
    new + retained + resurrected and ΔMAU = new + resurrected −
    churned holding exactly (the Social-Capital/a16z growth
    accounting framework; events_new_vs_returning is its daily
    2-flow shadow, events_retention_halflife its decay model). All
    set memberships from the distinct (user, month) frame via
    keyed self-joins (entity-sized); churn attributes to the month
    the user went missing, only for months that exist in the data.
    Exact counts throughout."""
    e = load(spark, sf_dir, "events")
    mu = e.select(
        "user_id",
        F.date_trunc("month", "ts").cast("date").alias("m"),
    ).distinct()
    firsts = mu.groupBy("user_id").agg(F.min("m").alias("first_m"))
    prev = mu.select(
        "user_id", F.add_months(F.col("m"), 1).alias("m")
    ).withColumn("was_prev", F.lit(True))
    curr = (
        mu.join(firsts, "user_id")
        .join(prev, ["user_id", "m"], "left")
        .na.fill({"was_prev": False})
    )
    flows = curr.groupBy("m").agg(
        F.count(F.when(F.col("m") == F.col("first_m"), 1)).alias(
            "new_users"
        ),
        F.count(
            F.when(
                (F.col("m") != F.col("first_m")) & F.col("was_prev"), 1
            )
        ).alias("retained"),
        F.count(
            F.when(
                (F.col("m") != F.col("first_m")) & ~F.col("was_prev"), 1
            )
        ).alias("resurrected"),
    )
    months = mu.select("m").distinct()
    nxt = mu.select(
        "user_id", F.add_months(F.col("m"), 1).alias("m")
    )
    churn = (
        nxt.join(mu, ["user_id", "m"], "left_anti")
        .join(months, "m", "left_semi")
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        flows.join(churn, "m", "left")
        .na.fill({"churned": 0})
        .select(
            F.col("m").alias("month"),
            (
                F.col("new_users")
                + F.col("retained")
                + F.col("resurrected")
            ).alias("mau"),
            "new_users",
            "retained",
            "resurrected",
            F.col("churned").alias("churned_from_prev"),
        )
        .orderBy("month")
    )


@register(
    "customer_quadrant_analysis",
    group="J",
    oracle="""
    with rev as (
      select c.c_custkey, c.c_acctbal,
             cast(coalesce(sum(cast(floor(o.o_totalprice * 1e6 + 0.5)
                  as bigint)), 0) as bigint) as r
      from customer c
      left join orders o on o.o_custkey = c.c_custkey
      group by 1, 2
    ),
    med as (
      select quantile_disc(c_acctbal, 0.5) as bal_med,
             quantile_disc(r, 0.5) as rev_med
      from rev
    ),
    quad as (
      select case when c_acctbal > med.bal_med then 'hi_bal'
                  else 'lo_bal' end as balance_side,
             case when r > med.rev_med then 'hi_rev'
                  else 'lo_rev' end as revenue_side
      from rev, med
    )
    select balance_side, revenue_side,
           cast(count(*) as bigint) as n_customers,
           round(cast(count(*) as double)
                 / sum(count(*)) over (), 6) as share
    from quad group by 1, 2
    order by balance_side, revenue_side
    """,
)
def customer_quadrant_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: balance × revenue quadrant — customers split at the
    medians of account balance and total spend into the classic 2×2
    (hi-bal/lo-rev = untapped capacity, the acquisition-free growth
    list; lo-bal/hi-rev = credit-risk watch). Median splits use
    DISCRETE quantiles (bit-exact cut points) on exact micro-int
    revenue including zero-order customers via the left join —
    dropping them (inner join) would bias the revenue median up.
    One dim-fact rollup + a broadcast two-scalar row; exact
    counts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rev = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)),
                F.lit(0),
            ).alias("r")
        )
    )
    rev.createOrReplaceTempView("cq_rev")
    med = spark.sql(
        """
        select percentile_disc(0.5) within group (order by c_acctbal)
                 as bal_med,
               percentile_disc(0.5) within group (order by r)
                 as rev_med
        from cq_rev
        """
    )
    quad = rev.crossJoin(F.broadcast(med)).select(
        F.when(F.col("c_acctbal") > F.col("bal_med"), "hi_bal")
        .otherwise("lo_bal")
        .alias("balance_side"),
        F.when(F.col("r") > F.col("rev_med"), "hi_rev")
        .otherwise("lo_rev")
        .alias("revenue_side"),
    )
    counts = quad.groupBy("balance_side", "revenue_side").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return counts.select(
        "balance_side",
        "revenue_side",
        "n_customers",
        F.round(
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(W.partitionBy()),
            6,
        ).alias("share"),
    ).orderBy("balance_side", "revenue_side")


@register(
    "catalog_value_null_by_type",
    group="B",
    oracle="""
    select event_type,
           cast(count(*) as bigint) as n_events,
           cast(count(*) filter (where value is null) as bigint)
             as n_null_value,
           round(cast(count(*) filter (where value is null) as double)
                 / count(*), 6) as null_rate
    from events group by 1 order by event_type
    """,
)
def catalog_value_null_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: CONDITIONAL null profiling — the value column's null
    rate per event type (catalog_null_fraction reports the marginal
    rate; nulls concentrated in specific types are usually SCHEMA
    SEMANTICS — 'view has no value' — while nulls spread evenly are
    instrumentation loss; the split decides whether to fix the
    pipeline or document the contract). One conditional-count
    rollup."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("value").isNull(), 1)).alias(
                "n_null_value"
            ),
            F.round(
                F.count(F.when(F.col("value").isNull(), 1)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("null_rate"),
        )
        .orderBy("event_type")
    )


@register(
    "events_error_burst_runs",
    group="F",
    oracle="""
    with seq as (
      select user_id, ts, event_id,
             case when event_type = 'error' then 1 else 0 end as is_err,
             row_number() over (partition by user_id
               order by ts, event_id) as i
      from events
    ),
    err as (
      select user_id, i,
             i - row_number() over (partition by user_id
               order by i) as grp
      from seq where is_err = 1
    ),
    runs as (
      select user_id, cast(count(*) as bigint) as run_len
      from err group by user_id, grp
    )
    select cast(count(*) as bigint) as n_error_runs,
           cast(max(run_len) as bigint) as longest_run,
           round(cast(sum(run_len) as double) / count(*), 6)
             as mean_run_len,
           cast(count(*) filter (where run_len >= 3) as bigint)
             as n_runs_ge3
    from runs
    """,
)
def events_error_burst_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: error-burst run lengths — consecutive-error streaks per
    user via gaps-and-islands (i − row_number over errors groups
    contiguous error positions), summarized as run count, longest
    burst, mean length and ≥3 bursts (a mean near 1 = independent
    errors; long runs = users STUCK in an error loop, the signal
    events_post_error_behavior quantifies transition-wise). Two
    windows on the user shuffle; exact integer runs."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
        F.row_number().over(w).alias("i"),
    )
    err = seq.filter(F.col("is_err") == 1).select(
        "user_id",
        (
            F.col("i")
            - F.row_number().over(
                W.partitionBy("user_id").orderBy("i")
            )
        ).alias("grp"),
    )
    runs = err.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.agg(
        F.count(F.lit(1)).alias("n_error_runs"),
        F.max("run_len").alias("longest_run"),
        F.round(
            F.sum("run_len").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_run_len"),
        F.count(F.when(F.col("run_len") >= 3, 1)).alias("n_runs_ge3"),
    )


@register(
    "events_daily_metrics_long",
    group="J",
    oracle="""
    with d as (
      select cast(date_trunc('day', ts) as date) as day,
             cast(count(*) as bigint) as events,
             cast(count(distinct user_id) as bigint) as dau,
             cast(count(*) filter (where event_type = 'purchase')
                  as bigint) as purchases,
             cast(count(*) filter (where event_type = 'error')
                  as bigint) as errors
      from events group by 1
    )
    select day, metric, value from (
      select day, 'events' as metric, cast(events as double) as value
      from d
      union all
      select day, 'dau', cast(dau as double) from d
      union all
      select day, 'purchases', cast(purchases as double) from d
      union all
      select day, 'error_rate',
             round(cast(errors as double) / events, 6) from d
    ) t
    order by day, metric
    """,
)
def events_daily_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the metrics-store export — four daily KPIs (events, DAU,
    purchases, error rate) in LONG format (day, metric, value): the
    contract shape every metrics layer and dashboard ingests, where
    adding a metric adds ROWS not columns (schema-stable under
    metric growth — the reason semantic layers standardize on long
    form; the wide per-metric operators remain the computation, this
    is the publishing surface). One rollup computes all four; the
    unpivot is a 4-way literal projection. Counts exact; the one
    ratio fixed-order."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.count_distinct("user_id").alias("dau"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "purchases"
        ),
        F.count(F.when(F.col("event_type") == "error", 1)).alias(
            "errors"
        ),
    )
    rows = (
        d.select(
            "day",
            F.lit("events").alias("metric"),
            F.col("events").cast("double").alias("value"),
        )
        .unionAll(
            d.select(
                "day",
                F.lit("dau").alias("metric"),
                F.col("dau").cast("double").alias("value"),
            )
        )
        .unionAll(
            d.select(
                "day",
                F.lit("purchases").alias("metric"),
                F.col("purchases").cast("double").alias("value"),
            )
        )
        .unionAll(
            d.select(
                "day",
                F.lit("error_rate").alias("metric"),
                F.round(
                    F.col("errors").cast("double") / F.col("events"), 6
                ).alias("value"),
            )
        )
    )
    return rows.orderBy("day", "metric")


@register(
    "feature_onehot_encode",
    group="J",
    oracle="""
    with topk as (
      select p_brand, row_number() over (
               order by count(*) desc, p_brand) as rk
      from part group by 1
    ),
    keep as (select p_brand from topk where rk <= 5),
    enc as (
      select p.p_partkey,
             case when k.p_brand is not null
                  then 'brand=' || p.p_brand
                  else 'brand=__other__' end as feature
      from part p left join keep k on p.p_brand = k.p_brand
      where p.p_partkey <= 50
    )
    select p_partkey, feature, 1 as value
    from enc order by p_partkey, feature
    """,
)
def feature_onehot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: learned top-k one-hot encoding in LONG format — the top-5
    brands by frequency become 'brand=X' features, the tail collapses
    to 'brand=__other__' (the standard vocabulary-capped one-hot that
    keeps feature width bounded no matter the category cardinality —
    at 100 TB the vocabulary is learned with one map-combinable
    count and broadcast back; the encode pass is embarrassingly
    parallel). Long format (row, feature, value) keeps the schema
    STATIC regardless of k — the pivot to wide columns is a separate,
    schema-known step (agg_pivot). Deterministic tie-break on brand
    name; output restricted to 50 audit rows."""
    p = load(spark, sf_dir, "part")
    topk = (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "p_brand",
            F.row_number()
            .over(W.orderBy(F.col("c").desc(), "p_brand"))
            .alias("rk"),
        )
    )
    keep = topk.filter(F.col("rk") <= 5).select(
        F.col("p_brand").alias("kb")
    )
    enc = (
        p.filter(F.col("p_partkey") <= 50)
        .join(F.broadcast(keep), F.col("p_brand") == F.col("kb"), "left")
        .select(
            "p_partkey",
            F.when(
                F.col("kb").isNotNull(),
                F.concat(F.lit("brand="), F.col("p_brand")),
            )
            .otherwise(F.lit("brand=__other__"))
            .alias("feature"),
        )
    )
    return enc.select(
        "p_partkey", "feature", F.lit(1).cast("int").alias("value")
    ).orderBy("p_partkey", "feature")


@register(
    "privacy_dp_count_noise",
    group="J",
    oracle="""
    with c as (
      select c_mktsegment, cast(count(*) as bigint) as true_count
      from customer group by 1
    ),
    u as (
      select c_mktsegment, true_count,
             cast(('0x' || substr(md5('dp|' || c_mktsegment), 1, 8))
                  as bigint) / 4294967296.0 as u
      from c
    )
    select c_mktsegment,
           round(true_count
                 + (case when u < 0.5 then 1.0 else -1.0 end)
                   * ln(1 - 2 * abs(u - 0.5)), 3) as noisy_count
    from u order by c_mktsegment
    """,
)
def privacy_dp_count_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: epsilon=1 Laplace-mechanism noisy counts per customer
    segment — the differential-privacy release primitive for catalog
    statistics (count sensitivity 1 → Laplace(1/eps) noise). The
    noise draw is DERANDOMIZED the way every sampler in this repo is
    (§2.L trap 7): u = first-8-hex-of-md5(segment)/2^32 is a
    reproducible uniform, inverted through the Laplace CDF
    -sign(u-1/2)*ln(1-2|u-1/2|). In production the seed would be a
    per-release secret salt — the PLUMBING (group sizes never leave
    the engine un-noised) is what the operator proves. True counts
    exact; one ln per group row, round-3 gated."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp|"), F.col("c_mktsegment"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / 4294967296.0
    )
    noise = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.log(
        1 - 2 * F.abs(u - 0.5)
    )
    return c.select(
        "c_mktsegment",
        F.round(F.col("true_count") + noise, 3).alias("noisy_count"),
    ).orderBy("c_mktsegment")


@register(
    "events_odds_ratio_ci",
    group="J",
    oracle="""
    with assign as (
      select user_id, user_id % 2 as variant,
             max(case when event_type = 'purchase' then 1 else 0 end)
               as converted
      from events group by 1
    ),
    cells as (
      select cast(sum(case when variant = 1 and converted = 1
                           then 1 else 0 end) as bigint) as a,
             cast(sum(case when variant = 1 and converted = 0
                           then 1 else 0 end) as bigint) as b,
             cast(sum(case when variant = 0 and converted = 1
                           then 1 else 0 end) as bigint) as c,
             cast(sum(case when variant = 0 and converted = 0
                           then 1 else 0 end) as bigint) as d
      from assign
    )
    select a as t_conv, b as t_nonconv, c as c_conv, d as c_nonconv,
           round(cast(a as double) * d / (cast(b as double) * c), 6)
             as odds_ratio,
           round(exp(ln(cast(a as double) * d / (cast(b as double) * c))
                 - 1.959963985 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             as ci_lo,
           round(exp(ln(cast(a as double) * d / (cast(b as double) * c))
                 + 1.959963985 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             as ci_hi
    from cells
    """,
)
def events_odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: conversion odds ratio between experiment arms with the
    Woolf log-normal 95% CI — exp(ln OR ± 1.96*sqrt(1/a+1/b+1/c+1/d)).
    The odds ratio is the effect measure that stays stable under
    outcome-dependent sampling (unlike the risk ratio), so it is the
    readout of record when conversion events are downsampled into the
    warehouse — a routine reality at 100 TB event volume. One per-user
    rollup (shuffle on user_id) then a 2x2 exact-integer table; the
    CI is fixed-order IEEE with ln/exp round-6 gated."""
    e = load(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("variant"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    cells = assign.agg(
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    orr = (
        F.col("a").cast("double")
        * F.col("d")
        / (F.col("b").cast("double") * F.col("c"))
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        F.col("a").alias("t_conv"),
        F.col("b").alias("t_nonconv"),
        F.col("c").alias("c_conv"),
        F.col("d").alias("c_nonconv"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - 1.959963985 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + 1.959963985 * se), 6).alias("ci_hi"),
    )


@register(
    "sample_weighted_ares",
    group="J",
    oracle="""
    with keyed as (
      select doc_id, lang, n_chars,
             -ln((cast(('0x' || substring(md5(cast(doc_id as varchar) || '|ares'), 1, 8))
                   as bigint) + 0.5) / 4294967296.0) / n_chars as expkey
      from documents
    )
    select doc_id, lang, n_chars, round(expkey * 1e6, 4) as key_micro
    from keyed
    order by expkey, doc_id
    limit 20
    """,
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res, 2006 — public algorithm): each row draws a deterministic
    md5-uniform u ∈ (0,1) and gets the exponential key −ln(u)/w with
    weight w = n_chars; the global k smallest keys ARE a weighted
    sample without replacement. Distribution-friendly by construction:
    the key is computed row-local (no shuffle), and top-k by key is
    Spark's TakeOrderedAndProject — per-partition local top-k then a
    k-sized merge on the driver, never a global sort. The (u + 0.5)
    offset keeps u strictly positive so ln is finite."""
    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|ares"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    expkey = -F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            expkey.alias("expkey"),
        )
        .orderBy("expkey", "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(F.col("expkey") * 1e6, 4).alias("key_micro"),
        )
    )


@register(
    "privacy_column_masking",
    group="J",
    oracle="""
    select c_custkey,
           'cust_' || substring(md5('pepper|' || cast(c_custkey as varchar)), 1, 12)
             as pseudonym,
           regexp_replace(c_name, '[0-9]', '*', 'g') as name_masked,
           case when c_acctbal < 0 then 'NEGATIVE' else 'NON-NEGATIVE' end
             as acctbal_band,
           c_mktsegment
    from customer
    """,
)
def privacy_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level masking / pseudonymization — the governance
    transform a catalog applies before sharing: a keyed deterministic
    pseudonym (md5 with a pepper; same input → same token, so joins
    across masked datasets still work), digit redaction on the name,
    and value generalization (balance → sign band). All pure codegen'd
    expressions — masking at 100 TB is a map-only projection with zero
    shuffle, and the pseudonym stays portable across engines. The
    pepper would come from a secret store in production; the literal
    here keeps the op oracle-checkable."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(
            F.lit("cust_"),
            F.substring(
                F.md5(F.concat(F.lit("pepper|"), F.col("c_custkey").cast("string"))),
                1,
                12,
            ),
        ).alias("pseudonym"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("name_masked"),
        F.when(F.col("c_acctbal") < 0, "NEGATIVE")
        .otherwise("NON-NEGATIVE")
        .alias("acctbal_band"),
        "c_mktsegment",
    )
