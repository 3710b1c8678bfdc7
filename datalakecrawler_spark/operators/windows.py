"""Group F — window functions (SURVEY.md §2.F) + headline top-k.

Parity traps handled here (SURVEY §2.L trap 3):
- every ORDER BY inside a window carries a unique tie-break key, so
  rank/ntile/lag assignments are deterministic;
- windowed SUMs go through decimal: DuckDB evaluates window aggregates
  with a segment tree (different addition order than Spark's running
  accumulation), so double sums would drift in the last ulp.

Scale: a window = one shuffle on partitionBy keys + per-partition sort.
Top-k per group (F1) filters rn<=k immediately after row_number — at
100 TB Spark pushes a per-partition limit (WindowGroupLimit) before the
shuffle, so the full ranked set never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import SUM_D, dsum, register

_DEC = "decimal(38,10)"

_TOPK_ORACLE = """
    select c_mktsegment, c_name, c_acctbal, rn from (
        select c_mktsegment, c_name, c_acctbal,
               row_number() over (partition by c_mktsegment
                                  order by c_acctbal desc, c_custkey) as rn
        from customer) t
    where rn <= 5
"""


def _topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("c_mktsegment", "c_name", "c_acctbal", "rn")
    )


@register("win_row_number_topk", group="F", oracle=_TOPK_ORACLE)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: top-5 customers per segment by balance (unique c_custkey
    tie-break makes row_number deterministic)."""
    return _topk_per_group(spark, sf_dir)


@register("topk_per_group_window", group="F", oracle=_TOPK_ORACLE)
def topk_per_group_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline benchmark twin of F1 (BASELINE.md)."""
    return _topk_per_group(spark, sf_dir)


@register(
    "win_rank_dense",
    group="F",
    oracle="""
    select o_orderkey, o_orderstatus, o_orderpriority,
           rank() over (partition by o_orderstatus order by o_orderpriority) as rnk,
           dense_rank() over (partition by o_orderstatus
                              order by o_orderpriority) as drnk
    from orders
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: rank + dense_rank with massive ties (5 priorities) — tie
    groups share rank values, so the result set is still deterministic."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_ntile_percent",
    group="F",
    oracle="""
    select c_custkey, c_mktsegment,
           ntile(4) over w as quartile,
           percent_rank() over w as pct_rank,
           cume_dist() over w as cume
    from customer
    window w as (partition by c_mktsegment order by c_acctbal, c_custkey)
    """,
)
def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: ntile/percent_rank/cume_dist. (rank-1)/(n-1) and rank/n are
    exact small-int divisions — identical doubles in both engines given
    the deterministic (c_acctbal, c_custkey) order."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "win_lag_lead",
    group="F",
    oracle="""
    select event_id, user_id, value,
           value - lag(value) over w as delta_prev,
           lead(event_id) over w as next_event
    from events
    window w as (partition by user_id order by ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: per-user deltas via lag/lead (event_id breaks ts ties)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@register(
    "win_running_sum",
    group="F",
    oracle=f"""
    with daily as (
        select cast(o_orderdate as date) as day,
               sum(cast(o_totalprice as {_DEC})) as rev
        from orders group by 1
    )
    select day,
           cast(cast(rev as decimal(38,6)) as double) as day_rev,
           cast(cast(sum(rev) over (order by day
                     rows between unbounded preceding and current row)
                as decimal(38,6)) as double) as cum_rev
    from daily
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: cumulative revenue by day. Both the daily and the running sum
    stay in decimal until the final cast (DuckDB's segment-tree window
    accumulation would drift from Spark's running sum in double)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        F.col("rev").cast("decimal(38,6)").cast("double").alias("day_rev"),
        F.sum("rev").over(w).cast("decimal(38,6)").cast("double").alias("cum_rev"),
    )


@register(
    "win_moving_avg",
    group="F",
    oracle=f"""
    with daily as (
        select date_diff('day', date '2024-01-01', cast(ts as date)) as day_num,
               sum(cast(value as {_DEC})) as rev,
               count(*) as n
        from events group by 1
    )
    select day_num,
           round(cast(sum(rev) over w as double) / sum(n) over w, 6) as avg_7d
    from daily
    window w as (order by day_num range between 6 preceding and current row)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: 7-day moving average of event value — RANGE frame over an
    integer day number (robust to missing days, unlike a rows frame).
    Decimal numerator / exact count → deterministic division."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "day_num"
        )
    ).agg(
        F.sum(F.col("value").cast(_DEC)).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    w = W.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day_num",
        F.round(
            F.sum("rev").over(w).cast("double") / F.sum("n").over(w), 6
        ).alias("avg_7d"),
    )


@register(
    "win_first_last",
    group="F",
    oracle="""
    select c_custkey, c_mktsegment, c_acctbal,
           first_value(c_acctbal) over w as seg_min_bal,
           last_value(c_acctbal) over w as seg_max_bal
    from customer
    window w as (partition by c_mktsegment order by c_acctbal, c_custkey
                 rows between unbounded preceding and unbounded following)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: first/last value with an explicit full-partition frame (the
    default frame would make last_value = current row)."""
    c = load(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_acctbal").over(w).alias("seg_min_bal"),
        F.last("c_acctbal").over(w).alias("seg_max_bal"),
    )


@register(
    "win_agg_over",
    group="F",
    oracle=f"""
    select o_orderkey, o_orderpriority, o_totalprice,
           round(o_totalprice /
                 cast(sum(cast(o_totalprice as {_DEC}))
                      over (partition by o_orderpriority) as double),
                 10) as ratio_to_group
    from orders
    """,
)
def win_agg_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: aggregate-as-window — each order's share of its priority
    group's revenue. Group total computed in decimal (order-independent),
    ratio rounded at 1e-10 (values ~1e-5, double ulp ~1e-21 → safe)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority")
    total = F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.col("o_totalprice") / total, 10).alias("ratio_to_group"),
    )


@register(
    "ts_gapfill_ffill",
    group="F",
    oracle="""
    with bounds as (
        select cast(min(ts) as date) as lo, cast(max(ts) as date) as hi
        from events
    ),
    cal as (
        select cast(unnest(generate_series(lo, hi, interval 1 day)) as date)
               as day
        from bounds
    ),
    daily as (
        select cast(ts as date) as day, count(*) as n_events
        from events where value > 300 group by 1
    )
    select c.day, d.n_events,
           coalesce(last_value(d.n_events ignore nulls)
                    over (order by c.day
                          rows between unbounded preceding and current row),
                    0) as n_filled
    from cal c left join daily d using (day)
    """,
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: time-series gap-fill + forward-fill — the resample step
    every monitoring/feature pipeline needs. A dense calendar is
    generated from the observed [min, max] day range (sequence+explode,
    no driver round-trip), left-joined to the sparse daily counts, and
    holes are carried forward with last(ignorenulls) over an ordered
    running frame (0 before the first observation). Scale: the calendar
    is O(days) — broadcast-sized for any horizon worth plotting — and
    the single window is one shuffle; at 100 TB partition the window by
    (series_id) so each series fills independently."""
    e = load(spark, sf_dir, "events")
    cal = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"))
    daily = (
        e.filter(F.col("value") > 300)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return cal.join(daily, "day", "left").select(
        "day",
        "n_events",
        F.coalesce(F.last("n_events", ignorenulls=True).over(w), F.lit(0)).alias(
            "n_filled"
        ),
    )


@register(
    "ts_gapfill_interpolate",
    group="F",
    oracle="""
    with bounds as (
        select cast(min(ts) as date) as lo, cast(max(ts) as date) as hi
        from events
    ),
    cal as (
        select cast(unnest(generate_series(lo, hi, interval 1 day)) as date)
               as day
        from bounds
    ),
    daily as (
        select event_type, cast(ts as date) as day, count(*) as n
        from events where value > 300 group by 1, 2
    ),
    spine as (
        select t.event_type, c.day
        from cal c cross join (select distinct event_type from daily) t
    ),
    j as (
        select s.event_type, s.day, d.n
        from spine s left join daily d using (event_type, day)
    ),
    scored as (
        select event_type, day, n,
               last_value(n ignore nulls) over wp as prev_v,
               last_value(case when n is not null then day end ignore nulls)
                   over wp as prev_d,
               first_value(n ignore nulls) over wn as next_v,
               first_value(case when n is not null then day end ignore nulls)
                   over wn as next_d
        from j
        window
          wp as (partition by event_type order by day
                 rows between unbounded preceding and current row),
          wn as (partition by event_type order by day
                 rows between current row and unbounded following)
    )
    select event_type, day, n as observed,
           round(case
               when n is not null then cast(n as double)
               when prev_v is null then cast(next_v as double)
               when next_v is null then cast(prev_v as double)
               else prev_v + (next_v - prev_v) * (day - prev_d)
                    / cast(next_d - prev_d as double)
           end, 4) as filled
    from scored
    """,
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: gap-fill by LINEAR INTERPOLATION between the bracketing
    observations — the `interpolate()` sibling of ts_gapfill_ffill
    (TimescaleDB/pandas semantics): interior holes get
    prev + (next−prev)·Δt_left/Δt_span; leading holes back-fill from
    the first observation and trailing holes carry the last one
    forward. Per-series fill via partitionBy(event_type): a forward
    running frame supplies (prev value, prev day), a backward frame
    supplies (next value, next day) — same partitioning + ordering, so
    Catalyst evaluates both frames after ONE shuffle and sort. The
    arithmetic keeps int·int products exact on both engines and makes
    the single double division last (round-4 absorbs sub-ulp). Scale:
    spine is O(days × series) — generated distributed (sequence +
    explode × broadcast dim), never on the driver; each series fills
    inside its own partition, so 10⁶ series parallelize cleanly."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("value") > 300)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cal = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"))
    spine = cal.crossJoin(F.broadcast(daily.select("event_type").distinct()))
    j = spine.join(daily, ["event_type", "day"], "left")
    wp = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("n").isNotNull(), F.col("day"))
    prev_v = F.last("n", ignorenulls=True).over(wp)
    prev_d = F.last(obs_day, ignorenulls=True).over(wp)
    next_v = F.first("n", ignorenulls=True).over(wn)
    next_d = F.first(obs_day, ignorenulls=True).over(wn)
    filled = (
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(prev_v.isNull(), next_v.cast("double"))
        .when(next_v.isNull(), prev_v.cast("double"))
        .otherwise(
            prev_v
            + (next_v - prev_v)
            * F.datediff(F.col("day"), prev_d)
            / F.datediff(next_d, prev_d)
        )
    )
    return j.select(
        "event_type",
        "day",
        F.col("n").alias("observed"),
        F.round(filled, 4).alias("filled"),
    )


@register(
    "events_anomaly_zscore",
    group="F",
    oracle="""
    with daily as (
        select cast(ts as date) as day, count(*) as n_events
        from events group by 1
    ),
    scored as (
        select day, n_events,
               avg(n_events) over win as mu,
               stddev_samp(n_events) over win as sd,
               count(*) over win as n_prior
        from daily
        window win as (order by day rows between 7 preceding and 1 preceding)
    )
    select day, n_events, round(mu, 2) as trailing_mean,
           round((n_events - mu) / sd, 2) as zscore,
           abs((n_events - mu) / sd) > 2 as is_anomaly
    from scored where n_prior = 7 and sd <> 0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: trailing-window anomaly detection — each day's event count
    scored against the mean/stddev of the prior 7 days (the frame
    excludes the current row, so an anomalous day can't mask itself).
    Warm-up days (fewer than 7 priors) are dropped. Inputs to the
    window stats are exact small integers, so mu is IEEE-exact and sd
    divergence is sub-ulp; z rounded at 2 per the stat-family policy.
    Scale: daily pre-aggregation reduces the window input to O(days)
    rows; partition the window by series key when scoring many metrics."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = W.orderBy("day").rowsBetween(-7, -1)
    z = (F.col("n_events") - F.col("mu")) / F.col("sd")
    return (
        daily.select(
            "day",
            "n_events",
            F.avg("n_events").over(w).alias("mu"),
            F.stddev_samp("n_events").over(w).alias("sd"),
            F.count(F.lit(1)).over(w).alias("n_prior"),
        )
        .filter((F.col("n_prior") == 7) & (F.col("sd") != 0))
        .select(
            "day",
            "n_events",
            F.round("mu", 2).alias("trailing_mean"),
            F.round(z, 2).alias("zscore"),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
    )


@register(
    "events_transition_matrix",
    group="F",
    oracle="""
    with seq as (
        select user_id, event_type,
               lag(event_type) over (partition by user_id
                                     order by ts, event_id) as prev_type
        from events
    )
    select prev_type, event_type as next_type, count(*) as n_transitions
    from seq where prev_type is not null
    group by 1, 2
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: behavioral transition matrix — counts of consecutive
    (prev event → next event) pairs per user, the input to Markov-chain
    journey models and Sankey funnels. One lag window partitioned by
    user (shuffle on user_id, per-user local sort with event_id as the
    deterministic tiebreak for equal timestamps), then an O(types²)
    aggregate. Scale: the window state is one row (lag-1), streaming-
    friendly; skewed power-users are bounded by per-user event counts,
    not corpus size."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


_RFM_MONETARY = (
    "cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) as double) / 1e6"
)


@register(
    "customer_rfm_segmentation",
    group="F",
    oracle=f"""
    with rfm as (
        select o_custkey,
               max(o_orderdate) as last_order,
               count(*) as frequency,
               {_RFM_MONETARY} as monetary
        from orders group by 1
    ),
    scored as (
        select ntile(4) over (order by last_order, o_custkey) as r_quartile,
               ntile(4) over (order by frequency, o_custkey) as f_quartile,
               ntile(4) over (order by monetary, o_custkey) as m_quartile
        from rfm
    )
    select r_quartile, f_quartile, m_quartile, count(*) as n_customers
    from scored group by 1, 2, 3
    """,
)
def customer_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: RFM segmentation — each customer scored into quartiles of
    recency (last order date), frequency (order count), and monetary
    (micro-unit-exact revenue, so the quartile sort key is identical in
    both engines), then counted per segment cell. The ntile windows
    are DISTRIBUTED since r4: each quartile is an exact global row
    number (distrank range-partition + offsets) fed through
    ntile_from_rank — the closed-form WindowExec ntile definition
    (bucket sizes differ by ≤1, larger first) — so results are
    bit-identical to global ntile at any customer cardinality, with
    three range shuffles instead of three single-task windows. Every
    orderBy carries o_custkey as tiebreak (§2.L trap 3)."""
    from datalakecrawler_spark.distrank import (
        ntile_from_rank,
        with_global_row_number,
    )

    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        (F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double") / 1e6).alias(
            "monetary"
        ),
    )
    r = with_global_row_number(
        rfm, spark, ["last_order", "o_custkey"], out="rn_r", with_total="n"
    )
    r = with_global_row_number(
        r, spark, ["frequency", "o_custkey"], out="rn_f"
    )
    r = with_global_row_number(
        r, spark, ["monetary", "o_custkey"], out="rn_m"
    )
    n = F.col("n")
    scored = r.select(
        ntile_from_rank(F.col("rn_r"), n, 4).alias("r_quartile"),
        ntile_from_rank(F.col("rn_f"), n, 4).alias("f_quartile"),
        ntile_from_rank(F.col("rn_m"), n, 4).alias("m_quartile"),
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "win_trailing_interval_spend",
    group="F",
    oracle="""
    select o_orderkey, o_custkey, o_orderdate,
           round(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                 over (partition by o_custkey
                       order by cast(epoch(o_orderdate) as bigint)
                       range between 2592000 preceding and current row)
                 as double) / 1e6, 6) as trailing_30d_spend
    from orders where o_custkey < 100
    """,
)
def win_trailing_interval_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: true time-interval RANGE frame at event granularity —
    each order's trailing-30-day spend for its customer, frame keyed on
    epoch seconds (not pre-aggregated day numbers like win_moving_avg).
    RANGE on a physical-time key is the pattern hypertable rollups and
    trailing-exposure queries need; both engines define the frame as
    the closed interval [v-30d, v] including ties. The windowed sum
    runs on int64 micro-units so incremental frame add/remove is exact
    and order-independent. Scale: one shuffle on o_custkey; frames are
    per-customer and never cross partitions."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    micro = F.floor(F.col("o_totalprice") * 1e6 + 0.5)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum(micro).over(w).cast("double") / 1e6, 6).alias(
            "trailing_30d_spend"
        ),
    )


@register(
    "events_longest_streak",
    group="F",
    oracle="""
    with du as (select distinct user_id, cast(ts as date) as day from events),
    grp as (
      select user_id, day,
             day - cast(row_number() over (partition by user_id order by day)
                        as integer) as anchor
      from du
    ),
    runs as (
      select user_id, count(*) as run_len
      from grp group by user_id, anchor
    )
    select user_id, max(run_len) as longest_streak
    from runs group by 1
    """,
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: longest consecutive-active-day streak per user — the
    gaps-and-islands identity: for sorted distinct days,
    (day − row_number) is constant exactly along a consecutive run, so
    grouping by that anchor measures every run with one window + one
    aggregate. One shuffle on user_id; all windows partition-local.
    The retention/engagement metric next to the cohort matrix
    (events_retention_cohort)."""
    e = load(spark, sf_dir, "events")
    du = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = du.withColumn(
        "anchor", F.date_sub("day", F.row_number().over(w))
    )
    runs = grp.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(F.max("run_len").alias("longest_streak"))


@register(
    "events_trigram_paths",
    group="F",
    oracle="""
    with seq as (
      select user_id, ts, event_id, event_type,
             lead(event_type, 1) over w as e2,
             lead(event_type, 2) over w as e3
      from events
      window w as (partition by user_id order by ts, event_id)
    )
    select event_type || '>' || e2 || '>' || e3 as path, count(*) as cnt
    from seq where e3 is not null
    group by 1
    order by cnt desc, path
    limit 10
    """,
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: top user paths — the 3-step event-type sequences users
    actually take (product-analytics path analysis; the n-gram
    generalization of events_transition_matrix's pairs). Double lead()
    over (user, time) builds the trigrams in one window pass — one
    user_id shuffle, no self-joins; the top-10 is TakeOrdered with a
    deterministic (cnt, path) tie-break."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "path")
        .limit(10)
    )


@register(
    "orders_abc_analysis",
    group="F",
    oracle="""
    with pr as (
      select l_partkey,
             sum(cast(floor(l_extendedprice * 1e6 + 0.5) as bigint)) as rev_micro
      from lineitem group by 1
    ),
    ranked as (
      select l_partkey, rev_micro,
             sum(rev_micro) over (order by rev_micro desc, l_partkey
                                  rows between unbounded preceding
                                  and current row) as cum_micro,
             sum(rev_micro) over () as total_micro
      from pr
    ),
    classed as (
      select l_partkey, rev_micro,
             case when cast(cum_micro as double) / cast(total_micro as double)
                       <= 0.8 then 'A'
                  when cast(cum_micro as double) / cast(total_micro as double)
                       <= 0.95 then 'B'
                  else 'C' end as abc_class
      from ranked
    )
    select abc_class, count(*) as n_parts,
           round(cast(sum(rev_micro) as double) / 1e6, 6) as class_revenue
    from classed group by 1
    """,
)
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: ABC / Pareto classification — parts bucketed by cumulative
    revenue share (A: first 80%, B: to 95%, C: tail), the inventory-
    prioritization classic. The running sum is a ROWS frame over the
    *per-part aggregate* (|parts| rows, not |lineitems|) with a unique
    (rev desc, partkey) order; cumulative and total come from the same
    int64 micro-units so the 0.8/0.95 boundaries cut identically in
    both engines. The running sum is the distributed exact prefix sum
    (distrank, r4) — range-partitioned, never a single-partition
    global window, so the plan survives any part-grain cardinality."""
    li = load(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 1e6 + 0.5)).alias("rev_micro")
    )
    from datalakecrawler_spark.distrank import with_global_cumsum

    # distributed running revenue + total over the part grain in one
    # range shuffle (parts grow with the data; this replaces the
    # global-window form the docstring's RFM note promised to retire)
    ranked = with_global_cumsum(
        pr,
        spark,
        [F.col("rev_micro").desc(), F.col("l_partkey")],
        "rev_micro",
        out="cum_micro",
        inclusive=True,
        with_total="total_micro",
    )
    share = F.col("cum_micro").cast("double") / F.col("total_micro").cast("double")
    classed = ranked.withColumn(
        "abc_class",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("rev_micro").cast("double") / 1e6, 6).alias("class_revenue"),
    )


@register(
    "win_trending_parts",
    group="F",
    oracle="""
    with monthly as (
      select cast(date_trunc('month', l_shipdate) as date) as month,
             l_partkey,
             cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 1e6 + 0.5)
                           as bigint)) as double) / 1e6 as revenue
      from lineitem
      where l_shipdate >= timestamp '1996-01-01'
        and l_shipdate < timestamp '1996-07-01'
      group by 1, 2
    ), ranked as (
      select month, l_partkey, round(revenue, 2) as revenue,
             row_number() over (partition by month
                                order by revenue desc, l_partkey) as rk
      from monthly
    ), with_prev as (
      select r.*,
             lag(rk) over (partition by l_partkey order by month) as prev_rk
      from ranked r
    )
    select month, l_partkey, revenue, rk,
           coalesce(prev_rk - rk, 0) as rank_delta
    from with_prev where rk <= 5
    """,
)
def win_trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: trending items — monthly top-5 parts by discounted
    revenue with each part's rank movement vs the previous month
    (positive delta = climbing). The leaderboard-with-momentum shape
    every commerce/trending dashboard runs. Aggregation first (the
    only data-sized shuffle), then two windows over the tiny monthly
    frame: rank within month, lag across months per part. Exact
    micro-unit revenue sums and a partkey tiebreak keep the ranking
    deterministic cross-engine (§2.L traps 1/3); rank_delta is
    computed BEFORE the rk<=5 filter so a part entering the top-5
    still sees its true climb from last month's rank."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    monthly = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
            "l_partkey",
        )
        .agg(
            (F.sum(F.floor(rev * 1e6 + 0.5)).cast("double") / 1e6).alias(
                "revenue"
            )
        )
    )
    w_rank = W.partitionBy("month").orderBy(
        F.col("revenue").desc(), "l_partkey"
    )
    ranked = monthly.select(
        "month",
        "l_partkey",
        F.round("revenue", 2).alias("revenue"),
        F.row_number().over(w_rank).alias("rk"),
    )
    w_prev = W.partitionBy("l_partkey").orderBy("month")
    return (
        ranked.withColumn("prev_rk", F.lag("rk").over(w_prev))
        .where(F.col("rk") <= 5)
        .select(
            "month",
            "l_partkey",
            "revenue",
            "rk",
            F.coalesce(F.col("prev_rk") - F.col("rk"), F.lit(0)).alias(
                "rank_delta"
            ),
        )
    )


@register(
    "events_user_value_percentile",
    group="F",
    oracle="""
    with per_user as (
      select user_id,
             cast(sum(cast(floor(value * 1e6 + 0.5) as bigint)) as double)
               / 1e6 as total_value
      from events group by user_id
    )
    select user_id, round(total_value, 2) as total_value,
           round(percent_rank() over (order by total_value, user_id), 6)
             as value_pctile,
           ntile(10) over (order by total_value, user_id) as value_decile
    from per_user
    """,
)
def events_user_value_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: per-user lifetime-value percentile and decile — the
    user-scoring table a personalization/billing pipeline exports.
    Aggregate first (one user-keyed shuffle of the event log — its
    natural bucketing), THEN rank the per-user frame — and since r4
    that rank is the distributed exact global row number (distrank;
    users grow with the data, so even the per-user frame must not
    single-task). The (total_value, user_id) order is tie-free, so
    rank ≡ row_number: percent_rank = (rn−1)/(n−1) and ntile(10) via
    the closed-form ntile_from_rank are bit-identical to the window
    forms (§2.L trap 3 tiebreak). Exact micro-unit sums make the rank
    keys engine-identical before the policy round."""
    from datalakecrawler_spark.distrank import (
        ntile_from_rank,
        with_global_row_number,
    )

    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        (F.sum(F.floor(F.col("value") * 1e6 + 0.5)).cast("double") / 1e6)
        .alias("total_value")
    )
    r = with_global_row_number(
        per_user, spark, ["total_value", "user_id"], out="rn", with_total="n"
    )
    return r.select(
        "user_id",
        F.round("total_value", 2).alias("total_value"),
        F.round(
            # percent_rank() yields 0.0 (not 0/0) on a one-row frame —
            # guard the closed form so it stays bit-identical there too
            # (ADVICE r4, low)
            F.when(
                F.col("n") > 1,
                (F.col("rn") - 1).cast("double") / (F.col("n") - 1),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("value_pctile"),
        ntile_from_rank(F.col("rn"), F.col("n"), 10).alias("value_decile"),
    )


@register(
    "ts_exp_smoothing",
    group="F",
    oracle=f"""
    with monthly as (
      select date_trunc('month', o_orderdate) as mth,
             {SUM_D.format('o_totalprice')} as revenue
      from orders group by 1
    ),
    ranked as (
      select mth, revenue,
             row_number() over (order by mth) as i
      from monthly
    )
    select n.mth,
           round(n.revenue, 2) as actual,
           round(sum(case when p.i = 1 then pow(0.7, n.i - 1) * p.revenue
                          else 0.3 * pow(0.7, n.i - p.i) * p.revenue
                     end), 4) as ses_level
    from ranked n
    join ranked p on p.i <= n.i
    group by n.mth, n.revenue
    order by n.mth
    """,
)
def ts_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: simple exponential smoothing of monthly revenue
    (α = 0.3) — the short-horizon forecasting level a pipeline keeps
    per series. The textbook recursion s_n = αx_n + (1−α)s_{n−1} is
    sequential — useless distributed — so this uses the closed form
    s_n = Σᵢ wᵢxᵢ with wᵢ = α(1−α)^{n−i} (and the s₁ = x₁ boundary
    carrying (1−α)^{n−1}): a self-join of the MONTHLY table (≈ 80
    rows however big the fact table is; the only data-sized work is
    the monthly dsum rollup). The closed form is also the cross-engine
    safe one: a running-state formulation would hit DuckDB's
    segment-tree window summation (different add order), while here
    each sₙ is one grouped sum of ≤ n explicitly-constructed terms —
    order still differs, but term magnitudes (≤ x_max) put the
    reorder error ~1e-9, absorbed by round 4. Monthly inputs are
    exact via micro-unit sums."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("mth")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    ranked = monthly.withColumn("i", F.row_number().over(W.orderBy("mth")))
    n = ranked.alias("n")
    p = ranked.alias("p")
    weight = F.when(
        F.col("p.i") == 1, F.pow(F.lit(0.7), F.col("n.i") - 1)
    ).otherwise(F.lit(0.3) * F.pow(F.lit(0.7), F.col("n.i") - F.col("p.i")))
    return (
        n.join(p, F.col("p.i") <= F.col("n.i"))
        .groupBy(F.col("n.mth").alias("mth"), F.col("n.revenue").alias("revenue"))
        .agg(F.round(F.sum(weight * F.col("p.revenue")), 4).alias("ses_level"))
        .select("mth", F.round("revenue", 2).alias("actual"), "ses_level")
        .orderBy("mth")
    )


@register(
    "events_cusum_changepoint",
    group="F",
    oracle="""
    with daily as (
      select date_trunc('day', ts) as day, count(*) as x
      from events group by 1
    ),
    stats as (
      select count(*) as n_days,
             cast(sum(x) as bigint) as total
      from daily
    ),
    cusum as (
      select day,
             cast(sum(x) over (order by day
                  rows between unbounded preceding and current row) as double)
             - (row_number() over (order by day))
               * (cast((select total from stats) as double)
                  / (select n_days from stats)) as s
      from daily
    ),
    m as (select max(abs(s)) as smax from cusum)
    select (select n_days from stats) as n_days,
           round(cast((select total from stats) as double)
                 / (select n_days from stats), 6) as mu,
           round((select smax from m), 6) as max_abs_cusum,
           min(day) as change_day
    from cusum where abs(s) = (select smax from m)
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: CUSUM changepoint detection over the daily event-count
    series — the classic sequential drift monitor: Sₙ = Σᵢ≤ₙ(xᵢ − μ)
    drifts away from 0 after the point where the level shifts, and
    argmax |Sₙ| is the maximum-likelihood single changepoint under a
    mean-shift model. Cross-engine trick: Sₙ = Cₙ − n·μ where Cₙ is
    the cumulative INTEGER count — the running sum stays exact int64
    (immune to DuckDB's segment-tree float reordering) and only the
    final subtraction is float, identically computed per row. The
    argmax filter compares identically-derived doubles; min(day)
    breaks exact ties deterministically. Daily rollup is the only
    data-sized pass."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    whole = W.partitionBy()
    run = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    mu = F.sum("x").over(whole).cast("double") / F.count(F.lit(1)).over(whole)
    s = (
        F.sum("x").over(run).cast("double")
        - F.row_number().over(W.orderBy("day")) * mu
    )
    cusum = daily.select(
        "day",
        s.alias("s"),
        mu.alias("mu"),
        F.count(F.lit(1)).over(whole).alias("n_days"),
    ).withColumn("smax", F.max(F.abs("s")).over(whole))
    return cusum.where(F.abs("s") == F.col("smax")).agg(
        F.max("n_days").alias("n_days"),
        F.round(F.max("mu"), 6).alias("mu"),
        F.round(F.max("smax"), 6).alias("max_abs_cusum"),
        F.min("day").alias("change_day"),
    )


@register(
    "ts_theil_sen_trend",
    group="F",
    oracle=f"""
    with monthly as (
      select date_trunc('month', o_orderdate) as mth,
             {SUM_D.format('o_totalprice')} as revenue
      from orders group by 1
    ),
    ranked as (
      select revenue, row_number() over (order by mth) as i from monthly
    ),
    slopes as (
      select (b.revenue - a.revenue) / (b.i - a.i) as s
      from ranked a join ranked b on a.i < b.i
    ),
    ts as (select quantile_cont(s, 0.5) as slope from slopes)
    select (select count(*) from ranked) as n_months,
           cast((select count(*) from slopes) as bigint) as n_pairs,
           round((select slope from ts), 4) as ts_slope,
           round((select quantile_cont(revenue - (select slope from ts) * i,
                                       0.5) from ranked), 4) as ts_intercept
    """,
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: Theil–Sen robust trend of monthly revenue — the
    median-of-pairwise-slopes estimator, the standard robust companion
    to OLS (agg_groupwise_ols): a single wild month moves the OLS line
    but not the median of C(n,2) slopes (breakdown point ≈ 29%).
    Scale shape mirrors ts_exp_smoothing: the only data-sized work is
    the monthly rollup; the O(n²) pair join runs on the ~80-row series
    table (3 k pairs — trivial; for series with ≥10⁵ points switch to
    the repeated-median or sampling variant). Slopes are differences
    of micro-unit-exact revenues over integer index gaps → identical
    doubles in both engines; the median uses the shared
    percentile_cont interpolation (parity established by
    agg_percentile_exact) and rounds at 4."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mth")
    ).agg(dsum("o_totalprice").alias("revenue"))
    ranked = monthly.withColumn("i", F.row_number().over(W.orderBy("mth")))
    a = ranked.alias("a")
    b = ranked.alias("b")
    slopes = a.join(b, F.col("a.i") < F.col("b.i")).select(
        (
            (F.col("b.revenue") - F.col("a.revenue"))
            / (F.col("b.i") - F.col("a.i"))
        ).alias("s")
    )
    stats = slopes.agg(
        F.percentile("s", F.lit(0.5)).alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    resid = (
        ranked.crossJoin(F.broadcast(stats))
        .select(
            (F.col("revenue") - F.col("slope") * F.col("i")).alias("r"),
            "slope",
            "n_pairs",
        )
        .groupBy("slope", "n_pairs")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.percentile("r", F.lit(0.5)).alias("intercept"),
        )
    )
    return resid.select(
        "n_months",
        "n_pairs",
        F.round("slope", 4).alias("ts_slope"),
        F.round("intercept", 4).alias("ts_intercept"),
    )


@register(
    "events_markov_stationary",
    group="F",
    oracle="""
    with seq as (
      select event_type,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events
    ),
    trans as (
      select prev_type, event_type as next_type, count(*) as n
      from seq where prev_type is not null group by 1, 2
    ),
    p as (
      select prev_type, next_type,
             cast(n as double)
               / sum(cast(n as bigint)) over (partition by prev_type) as prob
      from trans
    ),
    states as (select distinct prev_type as s from trans),
    pi0 as (
      select s, 1.0 / (select count(*) from states) as pi from states
    ),
    pi1 as (
      select p.next_type as s, sum(pi0.pi * p.prob) as pi
      from pi0 join p on p.prev_type = pi0.s group by 1
    ),
    pi2 as (
      select p.next_type as s, sum(pi1.pi * p.prob) as pi
      from pi1 join p on p.prev_type = pi1.s group by 1
    )
    select s as event_type, round(pi, 6) as pi_2step
    from pi2 order by s
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: Markov stationary-distribution estimate by UNROLLED power
    iteration — two steps of π ← πP from a uniform start over the
    user-journey transition matrix (events_transition_matrix is the
    count form; this normalizes rows to probabilities and iterates).
    Same engine pattern as cluster_kmeans_lloyd: an iterative
    algorithm run as a bounded DataFrame loop whose every round is
    hash-checked by an unrolled-CTE oracle. Each iteration is a join
    of the π vector (|states| rows) with P (|states|² rows) — at scale
    the matrix broadcasts and iterations are cheap; convergence
    checking would compare successive π vectors (‖π₂−π₁‖, driver-side
    scalar). Probabilities are exact-count ratios → identical doubles;
    the per-state dot products sum ≤ |states| terms, reorder error
    ~1e-17, absorbed by round 6."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_w = W.partitionBy("prev_type")
    p = trans.select(
        "prev_type",
        "next_type",
        (F.col("n").cast("double") / F.sum("n").over(row_w).cast("double")).alias(
            "prob"
        ),
    )
    states = trans.select(F.col("prev_type").alias("s")).distinct()
    n_states = states.count()
    pi = states.select("s", F.lit(1.0 / n_states).alias("pi"))
    for _ in range(2):
        pi = (
            pi.join(F.broadcast(p), pi.s == p.prev_type)
            .groupBy(F.col("next_type").alias("s_next"))
            .agg(F.sum(F.col("pi") * F.col("prob")).alias("pi"))
            .withColumnRenamed("s_next", "s")
        )
    return pi.select(
        F.col("s").alias("event_type"), F.round("pi", 6).alias("pi_2step")
    ).orderBy("event_type")


@register(
    "ts_max_drawdown",
    group="F",
    oracle=f"""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as rev_micro
      from orders group by 1
    ),
    dd as (
      select day, rev_micro,
             max(rev_micro) over (order by day
               rows between unbounded preceding and current row) as peak
      from daily
    )
    select count(*) as n_days,
           round(cast(max(peak - rev_micro) as double) / 1e6, 2)
             as max_drawdown,
           min(day) filter (where peak - rev_micro =
               (select max(peak - rev_micro) from dd)) as trough_day
    from dd
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: maximum drawdown of the daily revenue series — the
    running-peak-minus-current statistic (finance's risk measure;
    here 'worst single-day drop from the best day so far', the alarm
    a revenue monitor raises). Note the series monitored is the DAILY
    level, not the cumulative sum — a cumulative sum of positive
    values never draws down. Every running quantity stays in exact
    micro-unit int64 (running max of exact ints is order-safe), so
    the window chain is engine-deterministic; only the final drawdown
    converts to double. One ordered window over the ~160-row daily
    series (the day rollup is the only data-sized pass); trough day
    tie-breaks by min(day)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias("rev_micro"))
    run = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    dd = daily.withColumn("peak", F.max("rev_micro").over(run)).select(
        "day", (F.col("peak") - F.col("rev_micro")).alias("draw")
    )
    whole = W.partitionBy()
    dd = dd.withColumn("dmax", F.max("draw").over(whole))
    return dd.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("dmax").cast("double") / 1e6, 2).alias("max_drawdown"),
        F.min(F.when(F.col("draw") == F.col("dmax"), F.col("day"))).alias(
            "trough_day"
        ),
    )


@register(
    "agg_pct_of_parent",
    group="E",
    oracle=f"""
    with rev as (
      select r.r_name as region, n.n_name as nation,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as rev_micro
      from orders o
      join customer c on o.o_custkey = c.c_custkey
      join nation n on c.c_nationkey = n.n_nationkey
      join region r on n.n_regionkey = r.r_regionkey
      group by 1, 2
    )
    select region, nation,
           round(cast(rev_micro as double) / 1e6, 2) as revenue,
           round(cast(rev_micro as double)
                 / cast(sum(rev_micro) over (partition by region) as double),
                 6) as pct_of_region,
           round(cast(sum(rev_micro) over (partition by region) as double)
                 / cast(sum(rev_micro) over () as double), 6)
             as region_pct_of_total
    from rev
    order by region, nation
    """,
)
def agg_pct_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext: percent-of-parent hierarchical shares — each nation's
    share of its region and each region's share of the total, in one
    pass: aggregate once at the leaf grain (nation), then two
    window-sums re-derive the parent levels WITHOUT rescanning facts
    (the rollup-cube alternative when you need ratios, not subtotal
    rows). Denominators are window sums of exact micro-unit ints —
    order-independent across engines — and the dims broadcast into the
    fact join. ~25 leaf rows after the aggregation; everything above
    the leaf agg is free."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias("rev_micro"))
    )
    by_region = W.partitionBy("region")
    whole = W.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round(F.col("rev_micro").cast("double") / 1e6, 2).alias("revenue"),
        F.round(
            F.col("rev_micro").cast("double")
            / F.sum("rev_micro").over(by_region).cast("double"),
            6,
        ).alias("pct_of_region"),
        F.round(
            F.sum("rev_micro").over(by_region).cast("double")
            / F.sum("rev_micro").over(whole).cast("double"),
            6,
        ).alias("region_pct_of_total"),
    ).orderBy("region", "nation")


@register(
    "win_nth_value",
    group="F",
    oracle="""
    with j as (
      select o_custkey, o_orderdate, o_orderkey, o_totalprice,
             row_number() over w as rn,
             nth_value(o_totalprice, 2) over w as second_value,
             nth_value(o_totalprice, 3) over w as third_value,
             first_value(o_totalprice) over w as first_value
      from orders
      window w as (partition by o_custkey
                   order by o_orderdate, o_orderkey
                   rows between unbounded preceding
                   and current row)
    ),
    lastrow as (
      select o_custkey, first_value, second_value, third_value,
             row_number() over (partition by o_custkey
               order by rn desc) as inv
      from j
    )
    select o_custkey as custkey,
           round(first_value, 2) as first_order_value,
           round(second_value, 2) as second_order_value,
           round(third_value, 2) as third_order_value
    from lastrow
    where inv = 1 and third_value is not null
    order by custkey limit 25
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: nth_value over a growing frame — each customer's 1st,
    2nd and 3rd order values read positionally from the
    chronological window (the onboarding-trajectory feature: 'does
    the second order grow?' — the input to second-order-uplift
    analyses; lag/lead give RELATIVE offsets, nth_value gives
    ABSOLUTE positions within the frame, the less-used half of the
    window spec). The growing frame makes nth_value null until the
    position exists — the final per-customer row (selected by an
    inverse row_number) carries the settled values; customers with
    ≥3 orders only. Values are read directly from data → bit-exact;
    one custkey-partitioned window chain."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    j = o.select(
        "o_custkey",
        F.row_number().over(
            W.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        ).alias("rn"),
        F.first("o_totalprice").over(w).alias("first_value"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_value"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_value"),
    )
    lastrow = j.select(
        "o_custkey",
        "first_value",
        "second_value",
        "third_value",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy(F.col("rn").desc()))
        .alias("inv"),
    )
    return (
        lastrow.filter(
            (F.col("inv") == 1) & F.col("third_value").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.round("first_value", 2).alias("first_order_value"),
            F.round("second_value", 2).alias("second_order_value"),
            F.round("third_value", 2).alias("third_order_value"),
        )
        .orderBy("custkey")
        .limit(25)
    )


@register(
    "win_cume_dist",
    group="F",
    oracle="""
    with cd as (
      select o_orderpriority, o_orderkey, o_totalprice,
             cume_dist() over (partition by o_orderpriority
               order by o_totalprice) as cd
      from orders
    )
    select o_orderpriority,
           cast(count(*) filter (where cd <= 0.5) as bigint)
             as n_below_median_cd,
           round(min(case when cd >= 0.5 then o_totalprice end), 2)
             as median_by_cd,
           round(max(o_totalprice), 2) as max_price
    from cd group by 1 order by o_orderpriority
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: cume_dist — the cumulative-distribution window function
    (fraction of partition rows ≤ current by the sort key; ties
    share a value, unlike percent_rank's rank-based form in
    win_ntile_percent), exercised by reading each priority's median
    off the CDF (smallest price with cd ≥ 0.5 — which must equal
    percentile_disc(0.5), a cross-operator invariant). Tie semantics
    are engine-identical because cume_dist counts peers inclusively
    in both; the rollup reduces the per-row CDF to deterministic
    summaries."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    cd = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        cd.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("cd") <= 0.5, 1)).alias(
                "n_below_median_cd"
            ),
            F.round(
                F.min(
                    F.when(F.col("cd") >= 0.5, F.col("o_totalprice"))
                ),
                2,
            ).alias("median_by_cd"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "win_ignore_nulls_fns",
    group="F",
    oracle="""
    with sparse as (
      select o_custkey, o_orderdate, o_orderkey,
             case when o_orderpriority = '1-URGENT'
                  then o_totalprice end as urgent_price
      from orders
    ),
    filled as (
      select o_custkey, o_orderdate, o_orderkey, urgent_price,
             last_value(urgent_price ignore nulls) over w
               as last_urgent_price,
             first_value(urgent_price ignore nulls) over w
               as first_urgent_price
      from sparse
      window w as (partition by o_custkey
                   order by o_orderdate, o_orderkey
                   rows between unbounded preceding and current row)
    )
    select count(*) as n_rows,
           cast(count(urgent_price) as bigint) as n_nonnull_source,
           cast(count(last_urgent_price) as bigint) as n_filled_last,
           cast(count(first_urgent_price) as bigint) as n_filled_first,
           round(cast(sum(cast(floor(coalesce(last_urgent_price, 0)
                 * 1e6 + 0.5) as bigint)) as double) / 1e6, 2)
             as checksum_last
    from filled
    """,
)
def win_ignore_nulls_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: IGNORE NULLS window navigation — last_value and
    first_value skipping nulls over a growing frame (the
    forward-fill primitive: 'carry each customer's most recent
    urgent-order price forward across non-urgent orders' — the same
    mechanism join_asof and ts_gapfill_ffill build on, here
    exercised as the bare windowed function with a checksum).
    Sparse column synthesized by a CASE; fill counts are exact and
    the checksum is micro-quantized per row before summation."""
    o = load(spark, sf_dir, "orders")
    sparse = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.col("o_totalprice"),
        ).alias("urgent_price"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = sparse.select(
        "urgent_price",
        F.last("urgent_price", ignorenulls=True)
        .over(w)
        .alias("last_urgent_price"),
        F.first("urgent_price", ignorenulls=True)
        .over(w)
        .alias("first_urgent_price"),
    )
    return filled.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("urgent_price").alias("n_nonnull_source"),
        F.count("last_urgent_price").alias("n_filled_last"),
        F.count("first_urgent_price").alias("n_filled_first"),
        F.round(
            F.sum(
                F.floor(
                    F.coalesce(F.col("last_urgent_price"), F.lit(0))
                    * 1e6
                    + 0.5
                )
            ).cast("double")
            / 1e6,
            2,
        ).alias("checksum_last"),
    )


@register(
    "win_exclude_current",
    group="F",
    oracle="""
    select o_orderkey, o_custkey,
           round(o_totalprice, 2) as price,
           round(avg(o_totalprice) over (
             partition by o_custkey
             rows between unbounded preceding and unbounded following
             exclude current row), 4) as loo_avg,
           round(o_totalprice / nullif(avg(o_totalprice) over (
             partition by o_custkey
             rows between unbounded preceding and unbounded following
             exclude current row), 0), 4) as vs_peers
    from orders
    where o_orderdate >= timestamp '1995-01-01'
      and o_orderdate <  timestamp '1995-04-01'
    """,
)
def win_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-exclusion window (SQL:2011 EXCLUDE CURRENT ROW): each
    order's price vs the leave-one-out mean of the same customer's other
    orders in the quarter. Spark has no EXCLUDE clause, so it is
    emulated algebraically — loo_avg = (sum − x) / (n − 1), null when
    the row is alone — which is also the scale-friendly form: one
    partition-wide sum+count window (a single shuffle on the partition
    key), no per-row frame re-scan. DuckDB's oracle uses the native
    EXCLUDE clause, pinning the emulation to the standard semantics."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    w = W.partitionBy("o_custkey")
    n = F.count(F.lit(1)).over(w)
    loo = F.when(
        n > 1,
        (F.sum("o_totalprice").over(w) - F.col("o_totalprice")) / (n - 1),
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(loo, 4).alias("loo_avg"),
        F.round(F.col("o_totalprice") / F.nullif(loo, F.lit(0)), 4).alias("vs_peers"),
    )


@register(
    "win_distinct_count",
    group="F",
    oracle="""
    select o_orderkey, o_custkey,
           count(distinct o_orderpriority) over (partition by o_custkey)
             as n_priorities_used,
           count(*) over (partition by o_custkey) as n_orders
    from orders
    where o_orderdate >= timestamp '1997-01-01'
    """,
)
def win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) OVER — Spark rejects DISTINCT aggregates in
    window frames, so it is emulated with size(collect_set(...) over w):
    the set state is bounded by the attribute's cardinality (5
    priorities here), which is exactly when a windowed distinct is
    sensible at scale — for unbounded attributes the right tool is the
    dense_rank-max trick or a pre-aggregated join, not per-row set
    state. DuckDB's oracle uses its native windowed DISTINCT, pinning
    the emulation to standard semantics. One shuffle on the partition
    key."""
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    w = W.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderpriority").over(w)).alias("n_priorities_used"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )


@register(
    "ts_forecast_combination",
    group="F",
    oracle="""
    with mth as (
      select row_number() over (order by m) as i,
             cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))
                  as double) / 100 as x
      from (select cast(date_trunc('month', o_orderdate) as date) as m,
                   o_totalprice from orders) group by m
    ),
    n as (select max(i) as n_months from mth),
    ses as (
      -- closed-form SES level through month t (alpha = 0.3)
      select t.i,
             sum(case when p.i = 1 then pow(0.7, t.i - 1) * p.x
                      else 0.3 * pow(0.7, t.i - p.i) * p.x end) as level
      from mth t join mth p on p.i <= t.i
      group by t.i
    ),
    fc as (
      select m.i, m.x as actual,
             s.level as ses_fc,
             lag12.x as naive_fc,
             (s.level + lag12.x) / 2 as combo_fc
      from mth m
      join ses s on s.i = m.i - 1
      join mth lag12 on lag12.i = m.i - 12
      cross join n
      where m.i > n.n_months - 12
    )
    select 'ses' as method,
           round(avg(abs(actual - ses_fc)), 4) as mae from fc
    union all
    select 'seasonal_naive', round(avg(abs(actual - naive_fc)), 4) from fc
    union all
    select 'combination', round(avg(abs(actual - combo_fc)), 4) from fc
    """,
)
def ts_forecast_combination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast combination backtest (Bates–Granger 1969, public: the
    mean of two weak forecasters usually beats either): one-step SES
    (closed-form level through t−1) and seasonal-naive (month t−12)
    forecasts for the last 12 months, plus their 50/50 combination,
    scored by MAE. The monthly rollup is the only data-sized pass; the
    closed-form SES is the same ~80-row self-join as ts_exp_smoothing.
    MAE of ~1e8-magnitude doubles: reorder noise ~1e-7, rounded at 4
    absorbs it."""
    o = load(spark, sf_dir, "orders")
    mth = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("m"))
        .agg(
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("double") / 100)
            .alias("x")
        )
        .withColumn("i", F.row_number().over(W.orderBy("m")))
        .select("i", "x")
    )
    n = mth.agg(F.max("i").alias("n_months"))
    t = mth.alias("t")
    p = mth.alias("p")
    weight = F.when(
        F.col("p.i") == 1, F.pow(F.lit(0.7), F.col("t.i") - 1)
    ).otherwise(F.lit(0.3) * F.pow(F.lit(0.7), F.col("t.i") - F.col("p.i")))
    ses = (
        t.join(p, F.col("p.i") <= F.col("t.i"))
        .groupBy(F.col("t.i").alias("i"))
        .agg(F.sum(weight * F.col("p.x")).alias("level"))
    )
    m = mth.alias("m")
    lag12 = mth.select(F.col("i").alias("li"), F.col("x").alias("lx"))
    fc = (
        m.join(ses.select(F.col("i").alias("si"), "level"), F.col("si") == F.col("m.i") - 1)
        .join(lag12, F.col("li") == F.col("m.i") - 12)
        .crossJoin(F.broadcast(n))
        .where(F.col("m.i") > F.col("n_months") - 12)
        .select(
            F.col("m.x").alias("actual"),
            F.col("level").alias("ses_fc"),
            F.col("lx").alias("naive_fc"),
            ((F.col("level") + F.col("lx")) / 2).alias("combo_fc"),
        )
    )

    def mae(col, name):
        return fc.agg(
            F.lit(name).alias("method"),
            F.round(F.avg(F.abs(F.col("actual") - F.col(col))), 4).alias("mae"),
        )

    return (
        mae("ses_fc", "ses")
        .unionByName(mae("naive_fc", "seasonal_naive"))
        .unionByName(mae("combo_fc", "combination"))
    )
