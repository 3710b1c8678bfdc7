"""End-to-end training-data pipeline: the composed funnel every LLM
data team runs — raw corpus → quality gate → exact dedup → benchmark
decontamination → train/holdout split — reported as per-stage survivor
counts. Each stage reuses the exact semantics of its standalone
operator (text_quality_rules, dedup_exact, text_contamination_ngram,
split_train_holdout), so the composition is oracle-checkable end to
end: the DuckDB SQL replays the full funnel and must hash-match.

Scale shape (100 TB): quality is a codegen'd scan (no shuffle); dedup
shuffles 32-byte keys (~0.03% of text volume); decontamination
broadcasts the benchmark gram set and anti-joins; the split is a pure
column predicate (pushes into downstream scans). No stage materializes
to the driver; stage counts come from one job over a multi-branch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import register


@register(
    "pipeline_training_data_e2e",
    group="J",
    oracle="""
    with m as (
        select doc_id, text,
               len(string_split(text, ' ')) as wc,
               cast(len(replace(text, ' ', '')) as double)
                   / len(string_split(text, ' ')) as mean_wlen,
               cast(len(list_filter(string_split(text, ' '),
                                    x -> x in ('the', 'a'))) as double)
                   / len(string_split(text, ' ')) as stop_frac
        from documents
    ),
    quality as (
        select doc_id, text from m
        where wc between 40 and 10000
          and mean_wlen between 3.2 and 4.6
          and stop_frac >= 0.02
    ),
    deduped as (
        select min(doc_id) as doc_id
        from quality group by sha256(lower(trim(text)))
    ),
    toks as (
        select doc_id, string_split(text, ' ') as t from documents
    ),
    ng as (
        select doc_id, array_to_string(t[i + 1 : i + 5], ' ') as gram
        from toks, unnest(range(greatest(len(t) - 4, 0))) as u(i)
    ),
    bench as (
        select distinct gram from ng where doc_id % 97 = 0
    ),
    contaminated as (
        select distinct g.doc_id
        from ng g join bench b using (gram)
        where g.doc_id % 97 <> 0
    ),
    clean as (
        select d.doc_id from deduped d
        where d.doc_id % 97 <> 0
          and not exists (select 1 from contaminated c
                          where c.doc_id = d.doc_id)
    ),
    split as (
        select doc_id,
               case when (doc_id * 2654435761) % 100 < 90
                    then 'train' else 'holdout' end as s
        from clean
    )
    select 'raw' as stage, count(*) as n_docs from documents
    union all select 'quality_pass', count(*) from quality
    union all select 'deduped', count(*) from deduped
    union all select 'decontaminated', count(*) from clean
    union all select 'train', count(*) from split where s = 'train'
    union all select 'holdout', count(*) from split where s = 'holdout'
    """,
)
def pipeline_training_data_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the full training-data funnel, stages composed exactly as
    their standalone operators define them (see module docstring)."""
    d = load(spark, sf_dir, "documents")

    # stage 1 — Gopher-style quality gate (text_quality_rules semantics)
    toks = F.split("text", " ")
    wc = F.size(toks)
    chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    mean_wlen = chars.cast("double") / wc
    stop_frac = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast("double") / wc
    )
    quality = d.filter(
        wc.between(40, 10000)
        & mean_wlen.between(3.2, 4.6)
        & (stop_frac >= 0.02)
    )

    # stage 2 — exact dedup, keep min doc_id (dedup_exact semantics)
    deduped = quality.groupBy(
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("content_key")
    ).agg(F.min("doc_id").alias("doc_id"))

    # stage 3 — benchmark decontamination (text_contamination_ngram
    # semantics): 5-gram overlap with the doc_id % 97 == 0 benchmark set
    grams5 = F.when(
        F.size(toks) >= 5,
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 5),"
            " i -> array_join(slice(split(text, ' '), i + 1, 5), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", F.explode(grams5).alias("gram"))
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = (
        deduped.filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id")
    )

    # stage 4 — deterministic train/holdout split (split_train_holdout)
    split = clean.select(
        "doc_id",
        F.when((F.col("doc_id") * 2654435761) % 100 < 90, "train")
        .otherwise("holdout")
        .alias("s"),
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_docs")
        )

    out = stage("raw", d)
    for name, df in [
        ("quality_pass", quality),
        ("deduped", deduped),
        ("decontaminated", clean),
        ("train", split.filter(F.col("s") == "train")),
        ("holdout", split.filter(F.col("s") == "holdout")),
    ]:
        out = out.unionByName(stage(name, df))
    return out


@register(
    "pipeline_observed_metrics",
    group="J",
    oracle="""
    select count(*) as rows_in,
           cast(sum(cast(floor(l_quantity * 1e6 + 0.5) as bigint)) as double)
             / 1e6 as qty_in,
           count(*) filter (where l_discount > 0.05) as rows_discounted
    from lineitem
    where l_shipdate >= timestamp '1996-01-01'
    """,
)
def pipeline_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: single-pass pipeline observability — the Observation API
    attaches metric expressions to a flowing DataFrame, so data-quality
    counters (rows in, quantity mass, discounted fraction) are computed
    DURING the main job instead of by a second scan: at 100 TB the
    difference between metrics-for-free and doubling the pipeline cost.
    The observed values are collected after the action and returned as
    a one-row frame; the oracle recomputes the same metrics directly.
    This is the modern replacement for accumulators (exactly-once
    semantics per action, no task-retry double counting)."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    obs = Observation("pipeline_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        (F.sum(F.floor(F.col("l_quantity") * 1e6 + 0.5)).cast("double") / 1e6).alias(
            "qty_in"
        ),
        F.count_if(F.col("l_discount") > 0.05).alias("rows_discounted"),
    )
    # the "real" pipeline job — any action populates the observation
    observed.groupBy("l_returnflag").count().collect()
    m = obs.get
    return spark.createDataFrame(
        [(m["rows_in"], m["qty_in"], m["rows_discounted"])],
        "rows_in long, qty_in double, rows_discounted long",
    )


@register(
    "pipeline_readiness_scorecard",
    group="J",
    oracle="""
    with orphan as (
      select count(*) as n_orphans
      from lineitem l
      where not exists (select 1 from orders o
                        where o.o_orderkey = l.l_orderkey)
    ),
    nulls as (
      select count(*) filter (where o_custkey is null) as n_null_cust,
             count(*) as n_orders
      from orders
    ),
    dup as (
      select count(*) as n_docs,
             count(*) - count(distinct md5(text)) as n_dup_docs
      from documents
    ),
    neg as (
      select count(*) filter (where o_totalprice <= 0) as n_nonpos
      from orders
    ),
    fresh as (
      select date_diff('day', max(o_orderdate),
                       (select max(ts) from events)) as lag_days
      from orders
    )
    select check_name, round(value, 6) as value, pass
    from (
      select 'lineitem_fk_orphan_rate' as check_name,
             cast(n_orphans as double)
               / (select count(*) from lineitem) as value,
             n_orphans = 0 as pass
      from orphan
      union all
      select 'orders_custkey_null_rate',
             cast(n_null_cust as double) / n_orders,
             n_null_cust = 0
      from nulls
      union all
      select 'documents_exact_dup_rate',
             cast(n_dup_docs as double) / n_docs,
             cast(n_dup_docs as double) / n_docs < 0.25
      from dup
      union all
      select 'orders_nonpositive_price_rate',
             cast(n_nonpos as double) / (select n_orders from nulls),
             n_nonpos = 0
      from neg
      union all
      select 'events_vs_orders_freshness_days',
             cast(lag_days as double),
             lag_days is not null
      from fresh
    ) t
    order by check_name
    """,
)
def pipeline_readiness_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the one-page data-readiness scorecard — five
    cross-table go/no-go checks a pipeline gate evaluates before a
    training run or a mart publish: referential integrity (lineitem
    orphan rate, the anti-join quality_dup_key_audit's sibling),
    key-null rate, exact-duplicate pressure, domain violations
    (non-positive prices), and cross-dataset freshness skew (events
    clock vs orders clock). Each check is a scalar aggregate over its
    own table — Spark runs them as independent single-pass jobs and
    the union is driver-sized; at 100 TB the scorecard is the cheap
    daily job whose failures decide whether the expensive ones run
    (the Deequ pattern; quality_constraint_suite is the per-table
    deep version). Exact counts; ratios fixed-order; statuses are
    integer comparisons."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "events")
    orphan = (
        li.join(
            o.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .crossJoin(
            F.broadcast(li.agg(F.count(F.lit(1)).alias("n_lines")))
        )
        .select(
            F.lit("lineitem_fk_orphan_rate").alias("check_name"),
            F.round(
                F.col("n_orphans").cast("double") / F.col("n_lines"), 6
            ).alias("value"),
            (F.col("n_orphans") == 0).alias("pass"),
        )
    )
    o_agg = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_null"),
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpos"),
        F.max("o_orderdate").alias("max_od"),
    )
    null_check = o_agg.select(
        F.lit("orders_custkey_null_rate").alias("check_name"),
        F.round(
            F.col("n_null").cast("double") / F.col("n_orders"), 6
        ).alias("value"),
        (F.col("n_null") == 0).alias("pass"),
    )
    nonpos_check = o_agg.select(
        F.lit("orders_nonpositive_price_rate").alias("check_name"),
        F.round(
            F.col("n_nonpos").cast("double") / F.col("n_orders"), 6
        ).alias("value"),
        (F.col("n_nonpos") == 0).alias("pass"),
    )
    dup_check = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias(
            "n_dup"
        ),
    ).select(
        F.lit("documents_exact_dup_rate").alias("check_name"),
        F.round(
            F.col("n_dup").cast("double") / F.col("n_docs"), 6
        ).alias("value"),
        (F.col("n_dup").cast("double") / F.col("n_docs") < 0.25).alias(
            "pass"
        ),
    )
    fresh = (
        o_agg.crossJoin(
            F.broadcast(e.agg(F.max("ts").alias("max_ts")))
        )
        .select(
            F.lit("events_vs_orders_freshness_days").alias("check_name"),
            F.round(
                F.datediff(
                    F.col("max_ts").cast("date"),
                    F.col("max_od").cast("date"),
                ).cast("double"),
                6,
            ).alias("value"),
            F.col("max_ts").isNotNull().alias("pass"),
        )
    )
    return (
        orphan.unionAll(null_check)
        .unionAll(dup_check)
        .unionAll(nonpos_check)
        .unionAll(fresh)
        .orderBy("check_name")
    )


@register(
    "pipeline_experiment_readout",
    group="J",
    oracle="""
    with assign as (
      select user_id, user_id % 2 as variant,
             max(case when event_type = 'purchase' then 1 else 0 end)
               as conv
      from events group by 1, 2
    ),
    arms as (
      select variant, cast(count(*) as bigint) as n,
             cast(sum(conv) as bigint) as x
      from assign group by 1
    ),
    w as (
      select max(case when variant = 0 then n end) as n0,
             max(case when variant = 0 then x end) as x0,
             max(case when variant = 1 then n end) as n1,
             max(case when variant = 1 then x end) as x1
      from arms
    ),
    stats as (
      select n0, n1, x0, x1,
             ((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
              + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0))
             / ((n0 + n1) / 2.0) as srm_chi2,
             (cast(x1 as double) / n1 - cast(x0 as double) / n0)
             / sqrt((cast(x0 + x1 as double) / (n0 + n1))
                    * (1 - cast(x0 + x1 as double) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)) as z,
             (1.959964 + 0.841621)
             * sqrt(2 * (cast(x0 + x1 as double) / (n0 + n1))
                    * (1 - cast(x0 + x1 as double) / (n0 + n1))
                    / least(n0, n1))
             / (cast(x0 + x1 as double) / (n0 + n1)) as mde_rel
      from w
    )
    select metric, round(value, 6) as value, pass
    from (
      select 'srm_chi2' as metric, srm_chi2 as value,
             srm_chi2 <= 3.841459 as pass from stats
      union all
      select 'effect_zscore', z, abs(z) <= 1.959964 or true from stats
      union all
      select 'mde_relative', mde_rel, mde_rel < 0.5 from stats
      union all
      select 'arm_balance_ratio',
             cast(least(n0, n1) as double) / greatest(n0, n1),
             cast(least(n0, n1) as double) / greatest(n0, n1) > 0.9
      from stats
    ) t
    order by metric
    """,
)
def pipeline_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the one-page experiment readout — validity gates and
    effect statistics in a single composed plan: SRM chi-square
    (assignment integrity), arm-balance ratio, the two-proportion
    effect z-score, and the relative MDE at 80% power ('was this
    experiment even capable of detecting what it sought'). Each
    number exists as a standalone operator (events_ab_srm_check /
    events_ab_ztest / stats_mde_power); the readout composes them
    from ONE per-user collapse so every statistic refers to the
    same population snapshot — the internal-consistency property a
    dashboard assembled from separate queries silently loses. The
    z row's pass field is informational (true): significance is a
    decision, not a health check."""
    e = load(spark, sf_dir, "events")
    assign = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    w = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    x0 = F.col("x0").cast("double")
    x1 = F.col("x1").cast("double")
    exp = (F.col("n0") + F.col("n1")) / 2.0
    srm = (
        (F.col("n0") - exp) * (F.col("n0") - exp)
        + (F.col("n1") - exp) * (F.col("n1") - exp)
    ) / exp
    pooled = (x0 + x1) / (n0 + n1)
    z = (x1 / n1 - x0 / n0) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / n0 + 1.0 / n1)
    )
    mde = (
        (1.959964 + 0.841621)
        * F.sqrt(2 * pooled * (1 - pooled) / F.least(n0, n1))
        / pooled
    )
    balance = F.least(n0, n1) / F.greatest(n0, n1)
    rows = (
        w.select(
            F.lit("srm_chi2").alias("metric"),
            F.round(srm, 6).alias("value"),
            (srm <= 3.841459).alias("pass"),
        )
        .unionAll(
            w.select(
                F.lit("effect_zscore").alias("metric"),
                F.round(z, 6).alias("value"),
                ((F.abs(z) <= 1.959964) | F.lit(True)).alias("pass"),
            )
        )
        .unionAll(
            w.select(
                F.lit("mde_relative").alias("metric"),
                F.round(mde, 6).alias("value"),
                (mde < 0.5).alias("pass"),
            )
        )
        .unionAll(
            w.select(
                F.lit("arm_balance_ratio").alias("metric"),
                F.round(balance, 6).alias("value"),
                (balance > 0.9).alias("pass"),
            )
        )
    )
    return rows.orderBy("metric")
