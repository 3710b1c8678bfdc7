"""Statistical inference operators — hypothesis tests and rank
statistics over the fixture tables.

The reference ships an experimentation/analysis toolkit beyond plain
aggregation (SURVEY.md §2.J ext; the two-proportion z-test in
pipeline/features.py is the first member). This module adds the
classical test battery a data-quality / experimentation pipeline needs:
chi-square independence, Welch's unequal-variance t-test,
Mann-Whitney U, and Spearman rank correlation.

Determinism strategy (registry module doc): every statistic reduces to
a handful of EXACT integer sums (counts, micro-unit sums, integer
ranks) collected distributively, then a single closed-form double
expression evaluated in identical operation order in Spark and DuckDB,
rounded at 6. No double is ever summed across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.memo import memoized_checkpoint
from datalakecrawler_spark.registry import davg, register

_SPEARMAN_RANK_MEMO: dict = {}


@register(
    "stats_chi2_independence",
    group="J",
    oracle="""
    with cells as (
      select user_id % 2 as variant, event_type, count(*) as o
      from events group by 1, 2
    ),
    tot as (
      select variant, event_type, o,
             sum(o) over (partition by variant) as row_tot,
             sum(o) over (partition by event_type) as col_tot,
             sum(o) over () as n
      from cells
    ),
    terms as (
      select variant, event_type, o,
             cast(row_tot as double) * col_tot / n as e
      from tot
    )
    select count(*) as n_cells,
           (count(distinct variant) - 1)
             * (count(distinct event_type) - 1) as dof,
           round(cast(sum(cast(floor(
               (o - e) * (o - e) / e * 1e6 + 0.5) as bigint)) as double)
             / 1e6, 6) as chi2
    from terms
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: chi-square test of independence between experiment arm
    (user_id parity — a hash bucket in production) and event_type —
    the categorical companion to events_ab_ztest: 'did the variant
    change the MIX of actions', not just one conversion rate. The
    contingency table is one groupBy (map-side combinable counts);
    marginals are windows over the ~10-cell table, so data-sized work
    is a single pass regardless of event volume, and the counters are
    plain sums → the statistic updates incrementally under streaming.
    Each (o-e)²/e term is computed from exact integers in identical
    IEEE order in both engines, micro-quantized, and integer-summed
    across cells (cross-cell double addition would be order-dependent)."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.col("user_id") % 2).alias("variant"), "event_type"
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = cells.select(
        "variant",
        "event_type",
        "o",
        F.sum("o").over(W.partitionBy("variant")).alias("row_tot"),
        F.sum("o").over(W.partitionBy("event_type")).alias("col_tot"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    terms = tot.select(
        "variant",
        "event_type",
        "o",
        (F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")).alias(
            "e"
        ),
    )
    d = F.col("o") - F.col("e")
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct("variant") - 1)
            * (F.count_distinct("event_type") - 1)
        ).alias("dof"),
        F.round(
            F.sum(F.floor(d * d / F.col("e") * 1e6 + 0.5)).cast("double")
            / 1e6,
            6,
        ).alias("chi2"),
    )


@register(
    "stats_ttest_welch",
    group="J",
    oracle="""
    with g as (
      select case when o_orderpriority = '1-URGENT' then 1 else 0
             end as grp,
             count(*) as n,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as s_micro,
             cast(sum(cast(floor(o_totalprice * o_totalprice + 0.5)
                  as bigint)) as bigint) as sq
      from orders group by 1
    ),
    w as (
      select max(case when grp = 1 then n end) as n1,
             max(case when grp = 1 then s_micro end) as s1,
             max(case when grp = 1 then sq end) as q1,
             max(case when grp = 0 then n end) as n0,
             max(case when grp = 0 then s_micro end) as s0,
             max(case when grp = 0 then sq end) as q0
      from g
    ),
    m as (
      select n1, n0,
             cast(s1 as double) / 1e6 / n1 as m1,
             cast(s0 as double) / 1e6 / n0 as m0,
             (cast(q1 as double)
               - n1 * (cast(s1 as double) / 1e6 / n1)
                    * (cast(s1 as double) / 1e6 / n1)) / (n1 - 1) as v1,
             (cast(q0 as double)
               - n0 * (cast(s0 as double) / 1e6 / n0)
                    * (cast(s0 as double) / 1e6 / n0)) / (n0 - 1) as v0
      from w
    )
    select n1 as n_urgent, n0 as n_rest,
           round(m1, 2) as mean_urgent, round(m0, 2) as mean_rest,
           round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6) as t_stat,
           round((v1 / n1 + v0 / n0) * (v1 / n1 + v0 / n0)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v0 / n0) * (v0 / n0) / (n0 - 1)), 2) as df_welch
    from m
    """,
)
def stats_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Welch's unequal-variance t-test — do URGENT orders have a
    different mean value than the rest? The distributed shape is the
    canonical moment-sum reduction: per group (n, Σx, Σx²) — three
    map-side-combinable integer counters — then the t statistic and
    Welch–Satterthwaite df in closed form on the driver-sized 2-row
    table. Σx is micro-unit-exact (dsum envelope); Σx² is quantized at
    unit scale (x² ≈ 2.5e11 per row — 1e6 scaling would overflow
    int64; unit scale keeps |Σ| ≤ ~4e15 at sf0.1 with ≤4e-12 relative
    error, far below the round-6 gate). Both engines evaluate the
    identical expression tree on identical integers → identical
    doubles. DuckDB accumulates sum(bigint) in int128, Spark in long —
    both exact in the envelope."""
    o = load(spark, sf_dir, "orders")
    g = o.groupBy(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias("s_micro"),
        F.sum(
            F.floor(F.col("o_totalprice") * F.col("o_totalprice") + 0.5)
        ).alias("sq"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s_micro"))).alias("s1"),
        F.max(F.when(F.col("grp") == 1, F.col("sq"))).alias("q1"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("s_micro"))).alias("s0"),
        F.max(F.when(F.col("grp") == 0, F.col("sq"))).alias("q0"),
    )
    m1 = F.col("s1").cast("double") / 1e6 / F.col("n1")
    m0 = F.col("s0").cast("double") / 1e6 / F.col("n0")
    v1 = (F.col("q1").cast("double") - F.col("n1") * m1 * m1) / (
        F.col("n1") - 1
    )
    v0 = (F.col("q0").cast("double") - F.col("n0") * m0 * m0) / (
        F.col("n0") - 1
    )
    se2_1 = v1 / F.col("n1")
    se2_0 = v0 / F.col("n0")
    return w.select(
        F.col("n1").alias("n_urgent"),
        F.col("n0").alias("n_rest"),
        F.round(m1, 2).alias("mean_urgent"),
        F.round(m0, 2).alias("mean_rest"),
        F.round((m1 - m0) / F.sqrt(se2_1 + se2_0), 6).alias("t_stat"),
        F.round(
            (se2_1 + se2_0)
            * (se2_1 + se2_0)
            / (
                se2_1 * se2_1 / (F.col("n1") - 1)
                + se2_0 * se2_0 / (F.col("n0") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


@register(
    "stats_mannwhitney_u",
    group="J",
    oracle="""
    with v as (
      select o_totalprice as x,
             case when o_orderpriority = '1-URGENT' then 1 else 0
             end as grp
      from orders
    ),
    r as (
      select grp,
             2 * rank() over (order by x)
               + count(*) over (partition by x) - 1 as rank2x
      from v
    ),
    ties as (
      select cast(sum(t * t * t - t) as bigint) as tie_corr
      from (select count(*) as t from v group by x) tt
    ),
    s as (
      select cast(sum(case when grp = 1 then rank2x end) as bigint)
               as r1_2x,
             cast(sum(case when grp = 1 then 1 else 0 end) as bigint)
               as n1,
             cast(sum(case when grp = 0 then 1 else 0 end) as bigint)
               as n0
      from r
    )
    select n1, n0,
           round((cast(r1_2x as double)
                  - n1 * (cast(n1 as double) + 1)) / 2, 1) as u1,
           round(((cast(r1_2x as double)
                   - n1 * (cast(n1 as double) + 1)) / 2
                  - cast(n1 as double) * n0 / 2)
                 / sqrt(cast(n1 as double) * n0 / 12
                        * ((n1 + n0 + 1)
                           - cast(tie_corr as double)
                             / ((n1 + n0) * (cast(n1 as double) + n0 - 1)))),
                 6) as z_stat
    from s, ties
    """,
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric
    counterpart to stats_ttest_welch on the same split: robust to the
    heavy right tail of order values. Average ranks with ties are kept
    INTEGRAL via the 2×-rank trick: 2·avg_rank = 2·cum_before + t + 1
    at the DISTINCT-VALUE grain, so the rank sum is an exact bigint
    and the tie-correction Σ(t³-t) is exact too; only the final U/z
    expression touches doubles, in identical order both engines.

    Scale shape (r4): ranks never touch the row level — the frame is
    collapsed to (x, t, t₁) per distinct value, cum_before comes from
    the distributed exact prefix sum (distrank.with_global_cumsum —
    range-partition + local window + offsets, NOT a single-partition
    global window), and the weighted rank sum Σ t₁·(2·cum_before+t+1)
    reduces at the value grain directly. One shuffle to the value
    grain, one range-shuffle for the prefix sum; identical integers to
    the old row-level rank()+count() window form at any partitioning.
    Normal approximation with tie-corrected variance; z rounded at 6."""
    from datalakecrawler_spark.distrank import with_global_cumsum

    o = load(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("grp"),
    )
    per_val = v.groupBy("x").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("t1"),
    )
    ranked = with_global_cumsum(
        per_val, spark, ["x"], "t", out="cb", inclusive=False
    )
    j = ranked.agg(
        F.sum(
            F.col("t1") * (2 * F.col("cb") + F.col("t") + 1)
        ).alias("r1_2x"),
        F.sum("t1").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).alias("n0"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_corr"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    u1 = (F.col("r1_2x").cast("double") - F.col("n1") * (n1d + 1)) / 2
    sigma = F.sqrt(
        n1d
        * n0d
        / 12
        * (
            (F.col("n1") + F.col("n0") + 1)
            - F.col("tie_corr").cast("double")
            / ((F.col("n1") + F.col("n0")) * (n1d + n0d - 1))
        )
    )
    return j.select(
        "n1",
        "n0",
        F.round(u1, 1).alias("u1"),
        F.round((u1 - n1d * n0d / 2) / sigma, 6).alias("z_stat"),
    )


@register(
    "stats_spearman_corr",
    group="J",
    oracle="""
    with r as (
      select 2 * rank() over (order by l_quantity)
               + count(*) over (partition by l_quantity) - 1 as rx,
             2 * rank() over (order by l_extendedprice)
               + count(*) over (partition by l_extendedprice) - 1 as ry
      from lineitem
    ),
    s as (
      select cast(count(*) as bigint) as n,
             cast(sum(rx) as bigint) as sx,
             cast(sum(ry) as bigint) as sy,
             cast(sum(rx * ry) as bigint) as sxy,
             cast(sum(rx * rx) as bigint) as sxx,
             cast(sum(ry * ry) as bigint) as syy
      from r
    )
    select n,
           round((cast(n as double) * sxy
                  - cast(sx as double) * sy)
                 / sqrt((cast(n as double) * sxx
                         - cast(sx as double) * sx)
                        * (cast(n as double) * syy
                           - cast(sy as double) * sy)), 6) as spearman_rho
    from s
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Spearman rank correlation between quantity and extended
    price — the monotone-association measure a profiler reports where
    Pearson (catalog_column_correlation) misleads on skewed columns.
    Ranks use the same integral 2×-average-rank trick as
    stats_mannwhitney_u, so ALL six moment sums (n, Σrx, Σry, Σrxy,
    Σrx², Σry²) are exact bigints — Pearson-on-ranks then evaluates as
    one fixed-order double expression. Envelope: rx ≤ 2n, so Σrx² ≤
    4n³ ≈ 8.6e17 at sf0.1 (fits int64); at sf1+ switch ranks to a
    1e-3-scaled double or spill to Spark decimal. Casts >2^53 round
    identically in both engines (same IEEE nearest-even on the same
    integers), so round-6 parity holds.

    Scale note: ranks are NOT per-row global windows (those funnel
    every row through one partition). Each column's rank map is built
    at the DISTINCT-VALUE level — count per value, one prefix-sum
    window over |distinct| rows, then 2·avg_rank(v) = 2·cum_before(v)
    + cnt(v) + 1 — and joined back onto the rows. The sort shrinks
    from 600 k rows to 50 (quantity) / ~100 k (price) at sf0.1, and
    the join back is an ordinary scalable shuffle join. The oracle
    keeps the per-row window form (native in DuckDB); both produce
    identical integer 2×-ranks."""
    li = load(spark, sf_dir, "lineitem")

    def rank_map(col: str, alias: str) -> DataFrame:
        from datalakecrawler_spark.distrank import with_global_cumsum

        per_val = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        # distributed exact prefix sum over the distinct values — a
        # plain global window would funnel the (data-proportional for
        # high-cardinality columns) value frame through one task
        cum = with_global_cumsum(
            per_val, spark, [col], "cnt", out="cb", inclusive=False
        )
        return cum.select(
            col, (2 * F.col("cb") + F.col("cnt") + 1).alias(alias)
        )

    # The joined rank-pair table is the materialized rank transform of
    # the two profiled columns — the reusable artifact every rank
    # statistic over the same snapshot reads (Spearman here; Kendall /
    # rank regressions in a fuller battery), so it is memoized per
    # (applicationId, sf_dir) like the banded MinHash signature table.
    # The |distinct|-sized prefix-sum windows and the row-level rank
    # join run once per snapshot, not once per query.
    r = memoized_checkpoint(
        _SPEARMAN_RANK_MEMO,
        spark,
        sf_dir,
        lambda: (
            li.select("l_quantity", "l_extendedprice")
            .join(F.broadcast(rank_map("l_quantity", "rx")), "l_quantity")
            .join(rank_map("l_extendedprice", "ry"), "l_extendedprice")
        ),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select("n", F.round(num / den, 6).alias("spearman_rho"))


@register(
    "ts_acf",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(floor(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5)
                  as bigint)) as double) / 1e9 + 0.5) as bigint) as xk
      from orders group by 1
    ),
    r as (
      select xk, row_number() over (order by day) as i from daily
    ),
    lags as (select * from (values (1), (2), (3), (4), (5), (6), (7)) l(lag)),
    pairs as (
      select l.lag, a.xk as x, b.xk as y
      from lags l
      join r a on true
      join r b on b.i = a.i + l.lag
    ),
    m as (
      select lag, cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx,
             cast(sum(y * y) as bigint) as syy
      from pairs group by 1
    )
    select lag, n as n_pairs,
           round((cast(n as double) * sxy - cast(sx as double) * sy)
                 / sqrt((cast(n as double) * sxx
                         - cast(sx as double) * sx)
                        * (cast(n as double) * syy
                           - cast(sy as double) * sy)), 6) as acf
    from m order by lag
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: the correlogram — lag-1..7 autocorrelation of the daily
    revenue series (the diagnostic behind 'is there weekly
    seasonality' and ARIMA order selection; the sample-Pearson-per-lag
    estimator). The day rollup is the only data-sized pass; the
    series table (~a few thousand rows) then self-joins per lag — at
    100 TB of events the series is still tiny because its length is
    the CALENDAR, not the row count. Daily revenue is micro-unit
    exact, then re-quantized to kilodollar ints (xk = rev/1e3,
    deterministic double→int), so all six per-lag moment sums are
    exact bigints and the Pearson expression is fixed-order IEEE —
    same parity argument as stats_spearman_corr."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double")
            / 1e9
            + 0.5
        ).alias("xk")
    )
    r = daily.select(
        "xk", F.row_number().over(W.orderBy("day")).alias("i")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = r.alias("a")
    b = r.alias("b")
    pairs = F.broadcast(lags).join(
        a, F.lit(True)
    ).join(b, F.col("b.i") == F.col("a.i") + F.col("lag")).select(
        "lag", F.col("a.xk").alias("x"), F.col("b.xk").alias("y")
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        "lag", F.col("n").alias("n_pairs"), F.round(num / den, 6).alias("acf")
    ).orderBy("lag")


@register(
    "stats_covariance_matrix",
    group="B",
    oracle="""
    with q as (
      select cast(floor(l_quantity * 1e2 + 0.5) as bigint) as q2,
             cast(floor(l_extendedprice * 1e1 + 0.5) as bigint) as p1,
             cast(floor(l_discount * 1e4 + 0.5) as bigint) as d4
      from lineitem
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(q2) as bigint) as sq, cast(sum(p1) as bigint) as sp,
             cast(sum(d4) as bigint) as sd,
             cast(sum(q2 * p1) as bigint) as sqp,
             cast(sum(q2 * d4) as bigint) as sqd,
             cast(sum(p1 * d4) as bigint) as spd,
             cast(sum(q2 * q2) as bigint) as sqq,
             cast(sum(p1 * p1) as bigint) as spp,
             cast(sum(d4 * d4) as bigint) as sdd
      from q
    )
    select x_col, y_col,
           round((sxy - sx * sy / n) / (n - 1), 4) as cov,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             as corr
    from (
      select 'l_quantity' as x_col, 'l_extendedprice' as y_col,
             cast(n as double) as n,
             cast(sq as double) / 1e2 as sx, cast(sp as double) / 1e1 as sy,
             cast(sqp as double) / 1e3 as sxy,
             cast(sqq as double) / 1e4 as sxx,
             cast(spp as double) / 1e2 as syy
      from m
      union all
      select 'l_quantity', 'l_discount', cast(n as double),
             cast(sq as double) / 1e2, cast(sd as double) / 1e4,
             cast(sqd as double) / 1e6,
             cast(sqq as double) / 1e4, cast(sdd as double) / 1e8
      from m
      union all
      select 'l_extendedprice', 'l_discount', cast(n as double),
             cast(sp as double) / 1e1, cast(sd as double) / 1e4,
             cast(spd as double) / 1e5,
             cast(spp as double) / 1e2, cast(sdd as double) / 1e8
      from m
    ) pairs
    order by x_col, y_col
    """,
)
def stats_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: the pairwise covariance/correlation matrix over the
    numeric lineitem measures — the profiler output behind feature
    selection and multicollinearity checks (catalog_column_correlation
    is the single-pair bench variant; this is the full long-format
    matrix from ONE pass). All nine moment sums are collected in a
    single map-combinable aggregate over per-column fixed-point ints
    (quantity at 1e2, price at 1e1, discount at 1e4 — scales chosen
    so every Σproduct fits int64 through sf1: max |Σp1²| ≈ 6e17 at
    sf0.1). The 3-row matrix projection is then driver-sized; cov
    uses the (Σxy − ΣxΣy/n)/(n−1) form and corr the same fixed-order
    Pearson as stats_spearman_corr. One shuffle-free pass at any
    scale; extending to k columns is k(k+1)/2 counters, still one
    pass."""
    li = load(spark, sf_dir, "lineitem")
    q = li.select(
        F.floor(F.col("l_quantity") * 1e2 + 0.5).alias("q2"),
        F.floor(F.col("l_extendedprice") * 1e1 + 0.5).alias("p1"),
        F.floor(F.col("l_discount") * 1e4 + 0.5).alias("d4"),
    )
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q2").alias("sq"),
        F.sum("p1").alias("sp"),
        F.sum("d4").alias("sd"),
        F.sum(F.col("q2") * F.col("p1")).alias("sqp"),
        F.sum(F.col("q2") * F.col("d4")).alias("sqd"),
        F.sum(F.col("p1") * F.col("d4")).alias("spd"),
        F.sum(F.col("q2") * F.col("q2")).alias("sqq"),
        F.sum(F.col("p1") * F.col("p1")).alias("spp"),
        F.sum(F.col("d4") * F.col("d4")).alias("sdd"),
    )

    def pair(x_col, y_col, sx, sy, sxy, sxx, syy, kx, ky):
        nd = F.col("n").cast("double")
        sxd = F.col(sx).cast("double") / kx
        syd = F.col(sy).cast("double") / ky
        sxyd = F.col(sxy).cast("double") / (kx * ky)
        sxxd = F.col(sxx).cast("double") / (kx * kx)
        syyd = F.col(syy).cast("double") / (ky * ky)
        return m.select(
            F.lit(x_col).alias("x_col"),
            F.lit(y_col).alias("y_col"),
            F.round((sxyd - sxd * syd / nd) / (nd - 1), 4).alias("cov"),
            F.round(
                (nd * sxyd - sxd * syd)
                / F.sqrt(
                    (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
                ),
                6,
            ).alias("corr"),
        )

    out = (
        pair("l_quantity", "l_extendedprice", "sq", "sp", "sqp", "sqq",
             "spp", 1e2, 1e1)
        .unionAll(
            pair("l_quantity", "l_discount", "sq", "sd", "sqd", "sqq",
                 "sdd", 1e2, 1e4)
        )
        .unionAll(
            pair("l_extendedprice", "l_discount", "sp", "sd", "spd",
                 "spp", "sdd", 1e1, 1e4)
        )
    )
    return out.orderBy("x_col", "y_col")


@register(
    "stats_mutual_information",
    group="J",
    oracle="""
    with cells as (
      select l_returnflag as x, l_linestatus as y,
             cast(count(*) as bigint) as c
      from lineitem group by 1, 2
    ),
    m as (
      select x, y, c,
             sum(c) over (partition by x) as cx,
             sum(c) over (partition by y) as cy,
             sum(c) over () as n
      from cells
    ),
    terms as (
      select n,
             cast(floor(cast(c as double) / n
                  * ln(cast(c as double) * n / (cast(cx as double) * cy))
                  * 1e9 + 0.5) as bigint) as mi9,
             case when y = (select min(y) from cells)
                  then cast(floor(-(cast(cx as double) / n)
                       * ln(cast(cx as double) / n) * 1e9 + 0.5) as bigint)
                  else 0 end as hx9,
             case when x = (select min(x) from cells)
                  then cast(floor(-(cast(cy as double) / n)
                       * ln(cast(cy as double) / n) * 1e9 + 0.5) as bigint)
                  else 0 end as hy9
      from m
    )
    select cast(max(n) as bigint) as n,
           round(cast(sum(mi9) as double) / 1e9, 6) as mi_nats,
           round(cast(sum(hx9) as double) / 1e9, 6) as h_x,
           round(cast(sum(hy9) as double) / 1e9, 6) as h_y,
           round(cast(sum(mi9) as double)
                 / sqrt(cast(sum(hx9) as double)
                        * cast(sum(hy9) as double)), 6) as nmi
    from terms
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: mutual information between return flag and line status —
    the model-free dependence measure a profiler reports for
    categorical pairs (catalog_column_correlation's categorical
    counterpart; MI = 0 ⟺ independence, and unlike chi-square it IS
    the KL divergence from independence, in nats). Also reports both
    marginal entropies (catalog_column_entropy per column) and the
    sqrt-normalized NMI ∈ [0,1]. One contingency rollup + windows
    over the tiny cell table; each p·ln(p/q) term is computed from
    exact integers in identical IEEE order and nano-quantized before
    the cross-cell sum. Marginal entropy terms are attached to one
    designated cell per row/column (min partner key) so the same
    single pass yields all three statistics."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("x"), F.col("l_linestatus").alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    min_y = cells.agg(F.min("y").alias("min_y"))
    min_x = cells.agg(F.min("x").alias("min_x"))
    m = (
        cells.select(
            "x",
            "y",
            "c",
            F.sum("c").over(W.partitionBy("x")).alias("cx"),
            F.sum("c").over(W.partitionBy("y")).alias("cy"),
            F.sum("c").over(W.partitionBy()).alias("n"),
        )
        .crossJoin(F.broadcast(min_y))
        .crossJoin(F.broadcast(min_x))
    )
    cd = F.col("c").cast("double")
    cxd = F.col("cx").cast("double")
    cyd = F.col("cy").cast("double")
    nd = F.col("n")
    terms = m.select(
        "n",
        F.floor(
            cd / nd * F.log(cd * nd / (cxd * F.col("cy"))) * 1e9 + 0.5
        ).alias("mi9"),
        F.when(
            F.col("y") == F.col("min_y"),
            F.floor(-(cxd / nd) * F.log(cxd / nd) * 1e9 + 0.5),
        )
        .otherwise(0)
        .alias("hx9"),
        F.when(
            F.col("x") == F.col("min_x"),
            F.floor(-(cyd / nd) * F.log(cyd / nd) * 1e9 + 0.5),
        )
        .otherwise(0)
        .alias("hy9"),
    )
    return terms.agg(
        F.max("n").alias("n"),
        F.round(F.sum("mi9").cast("double") / 1e9, 6).alias("mi_nats"),
        F.round(F.sum("hx9").cast("double") / 1e9, 6).alias("h_x"),
        F.round(F.sum("hy9").cast("double") / 1e9, 6).alias("h_y"),
        F.round(
            F.sum("mi9").cast("double")
            / F.sqrt(
                F.sum("hx9").cast("double") * F.sum("hy9").cast("double")
            ),
            6,
        ).alias("nmi"),
    )


@register(
    "stats_cramers_v",
    group="J",
    oracle="""
    with cells as (
      select l_returnflag as x, l_linestatus as y,
             cast(count(*) as bigint) as c
      from lineitem group by 1, 2
    ),
    m as (
      select x, y, c,
             sum(c) over (partition by x) as cx,
             sum(c) over (partition by y) as cy,
             sum(c) over () as n
      from cells
    ),
    chi as (
      select max(n) as n,
             count(distinct x) as r, count(distinct y) as s,
             cast(sum(cast(floor(
               (c - cast(cx as double) * cy / n)
               * (c - cast(cx as double) * cy / n)
               / (cast(cx as double) * cy / n) * 1e6 + 0.5)
               as bigint)) as double) / 1e6 as chi2
      from m
    )
    select cast(n as bigint) as n, (r - 1) * (s - 1) as dof,
           round(chi2, 4) as chi2,
           round(sqrt(chi2 / (n * least(r - 1, s - 1))), 6) as cramers_v
    from chi
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Cramér's V — the normalized effect size for categorical
    association (chi-square tells you IF the dependence is
    significant — at 100 TB everything is significant; V ∈ [0,1]
    tells you WHETHER IT MATTERS, sample-size-free). Same
    contingency-table plumbing as stats_chi2_independence applied to
    the returnflag × linestatus pair, with V = √(χ²/(n·min(r−1,s−1)))
    on top. Exact-count cells, micro-quantized term sum, fixed-order
    final expression."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("x"), F.col("l_linestatus").alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = cells.select(
        "x",
        "y",
        "c",
        F.sum("c").over(W.partitionBy("x")).alias("cx"),
        F.sum("c").over(W.partitionBy("y")).alias("cy"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    e = F.col("cx").cast("double") * F.col("cy") / F.col("n")
    chi = m.agg(
        F.max("n").alias("n"),
        F.count_distinct("x").alias("r"),
        F.count_distinct("y").alias("s"),
        (
            F.sum(
                F.floor((F.col("c") - e) * (F.col("c") - e) / e * 1e6 + 0.5)
            ).cast("double")
            / 1e6
        ).alias("chi2"),
    )
    return chi.select(
        "n",
        ((F.col("r") - 1) * (F.col("s") - 1)).alias("dof"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("s") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "ts_seasonal_naive_error",
    group="F",
    oracle="""
    with monthly as (
      select date_trunc('month', o_orderdate) as mth,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as rev_micro
      from orders group by 1
    ),
    r as (
      select rev_micro, row_number() over (order by mth) as i from monthly
    ),
    sn as (
      select a.rev_micro as actual, b.rev_micro as pred
      from r a join r b on b.i = a.i - 12
    ),
    n1 as (
      select a.rev_micro as actual, b.rev_micro as pred
      from r a join r b on b.i = a.i - 1
    )
    select (select count(*) from sn) as n_forecasts,
           cast(floor((select cast(sum(abs(actual - pred)) as double)
                  / count(*) from sn) / 1e4 + 0.5) as double) / 100
             as mae_seasonal,
           round(((select cast(sum(abs(actual - pred)) as double)
                   / count(*) from sn)
                  / (select cast(sum(abs(actual - pred)) as double)
                     / count(*) from n1)), 6) as mase_vs_naive1,
           round((select cast(sum(cast(floor(
               2.0 * abs(actual - pred)
               / (cast(actual as double) + pred) * 1e9 + 0.5) as bigint))
               as double) / count(*) from sn) / 1e9, 6) as smape
    """,
)
def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: forecast-baseline backtest — the seasonal-naive
    predictor (month m forecast = month m−12 actual) scored with
    MAE, MASE (scaled against the naive-1 walk-forward error — the
    scale-free accuracy standard; MASE < 1 beats last-value
    carry-forward) and sMAPE. This is the evaluation harness every
    forecasting operator (ts_exp_smoothing, ts_theil_sen_trend)
    should be judged against before shipping. Monthly revenues are
    micro-unit exact ints, so MAE/MASE numerators are EXACT integer
    sums; only sMAPE needs per-term doubles, nano-quantized. The
    series table is calendar-sized regardless of fact volume — all
    joins are on the ~80-row monthly frame."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mth")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias("rev_micro")
    )
    r = monthly.select(
        "rev_micro", F.row_number().over(W.orderBy("mth")).alias("i")
    )
    a = r.alias("a")
    b = r.alias("b")
    sn = a.join(b, F.col("b.i") == F.col("a.i") - 12).select(
        F.col("a.rev_micro").alias("actual"),
        F.col("b.rev_micro").alias("pred"),
    )
    n1 = a.join(b, F.col("b.i") == F.col("a.i") - 1).select(
        F.col("a.rev_micro").alias("actual"),
        F.col("b.rev_micro").alias("pred"),
    )
    err = F.abs(F.col("actual") - F.col("pred"))
    sn_agg = sn.agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        (F.sum(err).cast("double") / F.count(F.lit(1))).alias("mae_sn"),
        (
            F.sum(
                F.floor(
                    2.0
                    * err
                    / (F.col("actual").cast("double") + F.col("pred"))
                    * 1e9
                    + 0.5
                )
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("smape9"),
    )
    n1_agg = n1.agg(
        (F.sum(err).cast("double") / F.count(F.lit(1))).alias("mae_n1")
    )
    return sn_agg.crossJoin(F.broadcast(n1_agg)).select(
        "n_forecasts",
        (
            F.floor(F.col("mae_sn") / 1e4 + 0.5).cast("double") / 100
        ).alias("mae_seasonal"),
        F.round(F.col("mae_sn") / F.col("mae_n1"), 6).alias(
            "mase_vs_naive1"
        ),
        F.round(F.col("smape9") / 1e9, 6).alias("smape"),
    )


@register(
    "events_value_gini_by_type",
    group="J",
    oracle="""
    with v as (
      select event_type,
             cast(floor(value * 1e6 + 0.5) as bigint) as x,
             event_id
      from events where value is not null
    ),
    r as (
      select event_type, x,
             row_number() over (partition by event_type
               order by x, event_id) as i,
             count(*) over (partition by event_type) as n,
             sum(x) over (partition by event_type) as sx
      from v
    )
    select event_type,
           max(n) as n_events,
           round(cast(max(sx) as double) / 1e6, 2) as total_value,
           round((2.0 * cast(sum(i * x) as double))
                   / (cast(max(n) as double) * max(sx))
                 - (cast(max(n) as double) + 1) / max(n), 6) as gini
    from r group by event_type
    order by event_type
    """,
)
def events_value_gini_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: per-group Gini concentration of event values —
    orders_gini_concentration generalized to grouped data: is value
    concentration a property of one event type (a few whale
    purchases) or uniform across behaviors? Uses the rank-sum
    identity G = 2Σi·xᵢ/(nΣx) − (n+1)/n on ascending-sorted exact
    micro-unit ints; Σi·x grows as n²·x̄ (~2e17 at sf0.1), so it is
    summed in wide exact integers on both engines — decimal(38,0)
    in Spark, DuckDB's native INT128 — before one final double
    expression; the sort is PER GROUP (partitioned window — no global funnel),
    ties ordered by event_id for engine-identical ranks. One shuffle
    on event_type, exact integers until the final two divisions."""
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 1e6 + 0.5).alias("x"),
        "event_id",
    )
    wp = W.partitionBy("event_type")
    r = v.select(
        "event_type",
        "x",
        F.row_number().over(wp.orderBy("x", "event_id")).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wp).alias("sx"),
    )
    nd = F.max("n").cast("double")
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.round(F.max("sx").cast("double") / 1e6, 2).alias(
                "total_value"
            ),
            F.round(
                (
                    2.0
                    * F.sum(
                        F.col("i").cast("decimal(19,0)")
                        * F.col("x").cast("decimal(19,0)")
                    ).cast("double")
                )
                / (nd * F.max("sx"))
                - (nd + 1) / F.max("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_permutation_null",
    group="J",
    oracle="""
    with reps as (select unnest(range(20)) as b),
    assign as (
      select r.b, e.user_id,
             ascii(substr(md5(cast(e.user_id as varchar) || '|'
                   || cast(r.b as varchar)), 1, 1)) % 2 as arm,
             max(case when e.event_type = 'purchase' then 1 else 0 end)
               as conv
      from events e cross join reps r
      group by 1, 2, 3
    ),
    per_b as (
      select b,
             cast(sum(case when arm = 1 then conv else 0 end) as double)
               / sum(case when arm = 1 then 1 else 0 end)
             - cast(sum(case when arm = 0 then conv else 0 end) as double)
               / sum(case when arm = 0 then 1 else 0 end) as diff
      from assign group by 1
    ),
    obs as (
      select cast(sum(case when user_id % 2 = 1 then conv else 0 end)
                  as double)
               / sum(case when user_id % 2 = 1 then 1 else 0 end)
             - cast(sum(case when user_id % 2 = 0 then conv else 0 end)
                    as double)
               / sum(case when user_id % 2 = 0 then 1 else 0 end)
               as observed
      from (select user_id,
                   max(case when event_type = 'purchase' then 1 else 0
                       end) as conv
            from events group by 1) u
    )
    select count(*) as n_replicates,
           round((select observed from obs), 6) as observed_diff,
           count(*) filter (where abs(diff)
             >= abs((select observed from obs))) as n_as_extreme,
           round((count(*) filter (where abs(diff)
                  >= abs((select observed from obs))) + 1.0)
                 / (count(*) + 1), 6) as p_value_mc
    from per_b
    """,
)
def stats_permutation_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: permutation-test null distribution by DETERMINISTIC
    hash re-randomization — 20 pseudo-permutations reassign each user to
    an arm via md5(user_id|replicate) parity and recompute the
    conversion-rate difference; the Monte-Carlo p-value (with the +1
    add-one correction) locates the observed events_ab_ztest diff in
    its own null. Hash assignment is the distributed-systems answer
    to 'shuffle the labels': no global permutation state, perfectly
    reproducible, embarrassingly parallel (the same trick behind
    sample_poisson_bootstrap). One grid expansion (users × 20 — the
    per-user collapse keeps it entity-sized, not event-sized) and
    exact-count ratios; comparisons run on identical doubles."""
    e = load(spark, sf_dir, "events")
    reps = spark.range(20).select(F.col("id").alias("b"))
    assign = (
        e.crossJoin(F.broadcast(reps))
        .groupBy(
            "b",
            "user_id",
            (
                F.ascii(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("user_id").cast("string"),
                                F.lit("|"),
                                F.col("b").cast("string"),
                            )
                        ),
                        1,
                        1,
                    )
                )
                % 2
            ).alias("arm"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    arm1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    arm0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    per_b = assign.groupBy("b").agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
            .cast("double")
            / F.sum(arm1)
            - F.sum(
                F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)
            ).cast("double")
            / F.sum(arm0)
        ).alias("diff")
    )
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    p1 = F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)
    p0 = F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
    obs = u.agg(
        (
            F.sum(
                F.when(F.col("user_id") % 2 == 1, F.col("conv")).otherwise(0)
            ).cast("double")
            / F.sum(p1)
            - F.sum(
                F.when(F.col("user_id") % 2 == 0, F.col("conv")).otherwise(0)
            ).cast("double")
            / F.sum(p0)
        ).alias("observed")
    )
    j = per_b.crossJoin(F.broadcast(obs))
    extreme = F.abs(F.col("diff")) >= F.abs(F.col("observed"))
    return j.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.max("observed"), 6).alias("observed_diff"),
        F.count(F.when(extreme, 1)).alias("n_as_extreme"),
        F.round(
            (F.count(F.when(extreme, 1)) + 1.0) / (F.count(F.lit(1)) + 1),
            6,
        ).alias("p_value_mc"),
    )


@register(
    "events_anomaly_seasonal_zscore",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', ts) as date) as day,
             isodow(cast(date_trunc('day', ts) as date)) as dow,
             cast(count(*) as bigint) as c
      from events group by 1, 2
    ),
    dow_stats as (
      select dow,
             cast(count(*) as bigint) as n,
             cast(sum(c) as bigint) as s,
             cast(sum(c * c) as bigint) as sq
      from daily group by 1
    ),
    z as (
      select d.day, d.dow, d.c,
             (cast(d.c as double) - cast(s.s as double) / s.n)
             / sqrt((cast(s.sq as double)
                     - s.n * (cast(s.s as double) / s.n)
                       * (cast(s.s as double) / s.n))
                    / (s.n - 1)) as zscore
      from daily d join dow_stats s using (dow)
      where s.n >= 3
    )
    select day, dow, c as n_events, round(zscore, 6) as seasonal_z
    from z
    where abs(zscore) >= 2
    order by day
    """,
)
def events_anomaly_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: day-of-week-adjusted anomaly detection — each day's
    event count scored against ITS WEEKDAY's mean/std, flagging
    |z| ≥ 2 (events_anomaly_zscore scores against the global
    distribution, which falsely alarms every weekend when traffic is
    weekly-seasonal; conditioning on dow is the minimum viable
    seasonal model before STL). Daily counts are exact ints; per-dow
    (n, Σ, Σ²) are exact int sums over the ≤7-group rollup; the z
    expression is fixed-order IEEE on identical operands. The |z|≥2
    gate compares identical doubles — deterministic. Calendar-sized
    working set after one count pass."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    daily = daily.select(
        "day", F.dayofweek("day").alias("dow_sun1"), "c"
    ).select(
        "day",
        # isodow: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7
        F.when(F.col("dow_sun1") == 1, 7)
        .otherwise(F.col("dow_sun1") - 1)
        .alias("dow"),
        "c",
    )
    stats = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("sq").cast("double") - F.col("n") * mean * mean)
        / (F.col("n") - 1)
    )
    z = (
        daily.join(F.broadcast(stats.filter(F.col("n") >= 3)), "dow")
        .select(
            "day",
            "dow",
            "c",
            ((F.col("c").cast("double") - mean) / sd).alias("zscore"),
        )
    )
    return (
        z.filter(F.abs(F.col("zscore")) >= 2)
        .select(
            "day",
            "dow",
            F.col("c").alias("n_events"),
            F.round("zscore", 6).alias("seasonal_z"),
        )
        .orderBy("day")
    )


@register(
    "agg_skewness_kurtosis",
    group="E",
    oracle="""
    with k as (
      select o_orderpriority,
             cast(floor(o_totalprice + 0.5) as bigint) as x
      from orders
    ),
    m as (
      select o_orderpriority,
             cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as s1,
             cast(sum(x * x) as bigint) as s2,
             sum(cast(x as double) * x * x) as s3,
             sum(cast(x as double) * x * x * x) as s4
      from k group by 1
    ),
    mom as (
      select o_orderpriority, n,
             cast(s1 as double) / n as mu,
             cast(s2 as double) / n as r2,
             s3 / n as r3,
             s4 / n as r4
      from m
    )
    select o_orderpriority, n,
           round((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
                 / pow(r2 - mu * mu, 1.5), 6) as skewness,
           round((r4 - 4 * mu * r3 + 6 * mu * mu * r2
                  - 3 * mu * mu * mu * mu)
                 / ((r2 - mu * mu) * (r2 - mu * mu)) - 3, 6)
             as excess_kurtosis
    from mom order by o_orderpriority
    """,
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext: third and fourth standardized moments per group —
    skewness (tail asymmetry) and excess kurtosis (tail weight), the
    profiler stats that decide whether mean±std summaries
    (agg_stats) are even meaningful for a column. One-pass raw-moment
    reduction: values rounded to whole units (prices — well below
    any distributional signal), Σx and Σx² exact int64; Σx³/Σx⁴ would
    overflow int64 (x⁴ ≈ 1e23) so they accumulate as DOUBLES — safe
    here because summing same-sign doubles of similar magnitude is
    reorder-stable to ~1e-13 relative, absorbed by round 6 after the
    standardization divides; the population formulas expand raw
    moments around the mean in fixed order. DuckDB sums the identical
    per-row doubles (int multiplication promoted identically)."""
    o = load(spark, sf_dir, "orders")
    k = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") + 0.5).alias("x"),
    )
    xd = F.col("x").cast("double")
    m = k.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(xd * F.col("x") * F.col("x")).alias("s3"),
        F.sum(xd * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3") / F.col("n")
    r4 = F.col("s4") / F.col("n")
    var = r2 - mu * mu
    skew = (r3 - 3 * mu * r2 + 2 * mu * mu * mu) / F.pow(var, 1.5)
    kurt = (
        r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    ) / (var * var) - 3
    return m.select(
        "o_orderpriority",
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    ).orderBy("o_orderpriority")


@register(
    "customer_nation_segment_mix",
    group="J",
    oracle="""
    with cells as (
      select n.n_name as nation, c.c_mktsegment as segment,
             cast(count(*) as bigint) as o
      from customer c join nation n on n.n_nationkey = c.c_nationkey
      group by 1, 2
    ),
    m as (
      select nation, segment, o,
             sum(o) over (partition by nation) as rt,
             sum(o) over (partition by segment) as ct,
             sum(o) over () as n
      from cells
    ),
    r as (
      select nation, segment, o,
             cast(rt as double) * ct / n as e,
             (o - cast(rt as double) * ct / n)
               / sqrt(cast(rt as double) * ct / n) as resid
      from m
    )
    select nation, segment, o as n_customers,
           round(e, 4) as expected,
           round(resid, 6) as std_residual
    from r
    order by abs(resid) desc, nation, segment limit 15
    """,
)
def customer_nation_segment_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: standardized Pearson residuals of the nation × segment
    contingency table — the DRILL-DOWN companion to
    stats_chi2_independence/stats_cramers_v: the summed statistic
    says dependence exists; the per-cell residual (o−e)/√e says WHICH
    nation over/under-indexes on which segment (|resid| > 2 ≈
    cell-level significance — the geo-marketing anomaly list). One
    broadcast dim join + contingency rollup + windows over the
    ~125-cell table; residuals are fixed-order expressions on exact
    counts, top-15 by |residual| with full tie-break."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    m = cells.select(
        "nation",
        "segment",
        "o",
        F.sum("o").over(W.partitionBy("nation")).alias("rt"),
        F.sum("o").over(W.partitionBy("segment")).alias("ct"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    resid = (F.col("o") - e) / F.sqrt(e)
    return (
        m.select(
            "nation",
            "segment",
            F.col("o").alias("n_customers"),
            F.round(e, 4).alias("expected"),
            F.round(resid, 6).alias("std_residual"),
        )
        .orderBy(F.abs(F.col("std_residual")).desc(), "nation", "segment")
        .limit(15)
    )


@register(
    "text_anova_two_way",
    group="J",
    oracle="""
    with base as (
      select lang, source, cast(n_chars as bigint) as x
      from documents
    ),
    cell as (
      select lang, source,
             cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as s
      from base group by 1, 2
    ),
    marg as (
      select cell.*,
             sum(s) over (partition by lang) as s_lang,
             sum(n) over (partition by lang) as n_lang,
             sum(s) over (partition by source) as s_src,
             sum(n) over (partition by source) as n_src,
             sum(s) over () as s_all,
             sum(n) over () as n_all
      from cell
    ),
    eff as (
      select lang, source, n,
             cast(s as double) / n as cell_mean,
             cast(s_all as double) / n_all as grand,
             cast(s_lang as double) / n_lang
               - cast(s_all as double) / n_all as lang_effect,
             cast(s_src as double) / n_src
               - cast(s_all as double) / n_all as src_effect
      from marg
    )
    select lang, source, n as n_docs,
           round(cell_mean, 4) as cell_mean,
           round(lang_effect, 4) as lang_effect,
           round(src_effect, 4) as source_effect,
           round(cell_mean - grand - lang_effect - src_effect, 4)
             as interaction_resid
    from eff
    order by abs(cell_mean - grand - lang_effect - src_effect) desc,
             lang, source
    limit 15
    """,
)
def text_anova_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: two-way effects decomposition of document length over
    lang × source — the additive-model read: cell mean = grand mean
    + language effect + source effect + interaction residual. A large
    residual is the interesting finding ('THIS source's German docs
    are unusually long — its de-scraper differs'), invisible to
    one-way groupBys. All sums are exact ints (n_chars is integral);
    marginal and grand means are exact-int ratios; effects and
    residuals are fixed-order double arithmetic rounded at 4. One
    cell rollup + windows over the |langs|×|sources| table — 100-cell
    working set at any fact scale."""
    d = load(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    )
    marg = cell.select(
        "lang",
        "source",
        "n",
        "s",
        F.sum("s").over(W.partitionBy("lang")).alias("s_lang"),
        F.sum("n").over(W.partitionBy("lang")).alias("n_lang"),
        F.sum("s").over(W.partitionBy("source")).alias("s_src"),
        F.sum("n").over(W.partitionBy("source")).alias("n_src"),
        F.sum("s").over(W.partitionBy()).alias("s_all"),
        F.sum("n").over(W.partitionBy()).alias("n_all"),
    )
    cell_mean = F.col("s").cast("double") / F.col("n")
    grand = F.col("s_all").cast("double") / F.col("n_all")
    le = F.col("s_lang").cast("double") / F.col("n_lang") - grand
    se = F.col("s_src").cast("double") / F.col("n_src") - grand
    resid = cell_mean - grand - le - se
    return (
        marg.select(
            "lang",
            "source",
            F.col("n").alias("n_docs"),
            F.round(cell_mean, 4).alias("cell_mean"),
            F.round(le, 4).alias("lang_effect"),
            F.round(se, 4).alias("source_effect"),
            F.round(resid, 4).alias("interaction_resid"),
        )
        .orderBy(F.abs(resid).desc(), "lang", "source")
        .limit(15)
    )


@register(
    "events_absorption_prob",
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
             cast(count(*) as bigint) as n
      from seq where prev_type is not null group by 1, 2
    ),
    p as (
      select prev_type, next_type,
             cast(n as double)
               / sum(cast(n as bigint)) over (partition by prev_type)
               as prob
      from trans
    ),
    a1 as (
      select prev_type as s,
             round(coalesce(max(case when next_type = 'purchase'
                   then prob end), 0), 9) as a
      from p group by 1
    ),
    a2 as (
      select p.prev_type as s,
             round(sum(case when p.next_type = 'purchase' then p.prob
                       else p.prob * a1.a end), 9) as a
      from p join a1 on a1.s = p.next_type
      group by 1
    ),
    a3 as (
      select p.prev_type as s,
             round(sum(case when p.next_type = 'purchase' then p.prob
                       else p.prob * a2.a end), 9) as a
      from p join a2 on a2.s = p.next_type
      group by 1
    )
    select s as state, round(a, 6) as p_purchase_within_3
    from a3 order by s
    """,
)
def events_absorption_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: absorption probability — from each behavioral state, the
    probability the user's NEXT ≤3 transitions reach 'purchase'
    (treating purchase as absorbing: a(s) = P(s→purchase) +
    Σ_{s'≠purchase} P(s→s')·a_{k−1}(s'), unrolled 3 steps from
    a₀ = 0). This converts the descriptive transition matrix
    (events_transition_matrix) into the decision-relevant 'how close
    is each state to conversion' score — the Markov-chain framing of
    funnel position that events_funnel_maxgap measures empirically.
    Same bounded-unroll engine pattern as graph_pagerank: each step
    is a join of the state vector (|states| rows, broadcast) with
    P; probabilities re-quantized at 9 dp per step so both engines
    iterate on identical vectors."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = trans.select(
        "prev_type",
        "next_type",
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("prev_type"))
        ).alias("prob"),
    )
    a = (
        p.groupBy(F.col("prev_type").alias("s"))
        .agg(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("next_type") == "purchase",
                            F.col("prob"),
                        )
                    ),
                    F.lit(0.0),
                ),
                9,
            ).alias("a")
        )
    )
    for _ in range(2):
        joined = p.join(
            F.broadcast(a.withColumnRenamed("s", "nt")),
            F.col("next_type") == F.col("nt"),
        )
        a = joined.groupBy(F.col("prev_type").alias("s")).agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("next_type") == "purchase", F.col("prob")
                    ).otherwise(F.col("prob") * F.col("a"))
                ),
                9,
            ).alias("a")
        )
    return a.select(
        F.col("s").alias("state"),
        F.round("a", 6).alias("p_purchase_within_3"),
    ).orderBy("state")


@register(
    "ts_pattern_vshape",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(count(*) as bigint) as c
      from orders group by 1
    ),
    ctx as (
      select day, c,
             lag(c, 2) over (order by day) as m2,
             lag(c, 1) over (order by day) as m1,
             lead(c, 1) over (order by day) as p1,
             lead(c, 2) over (order by day) as p2
      from daily
    )
    select day as trough_day, c as trough_count,
           m2 as minus2, m1 as minus1, p1 as plus1, p2 as plus2,
           round((cast(m2 as double) + p2) / (2 * c), 6) as depth_ratio
    from ctx
    where m2 is not null and m1 is not null
      and p1 is not null and p2 is not null
      and m2 > m1 and m1 > c and c < p1 and p1 < p2
    order by depth_ratio desc, day limit 10
    """,
)
def ts_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: V-shape pattern matching — strict
    down-down-trough-up-up sequences in the daily order-count
    series, ranked by depth (shoulder average / trough): the
    dip-and-recovery signature of outages and stock-outs
    (ts_peak_detection's mirror; together they cover the
    MATCH_RECOGNIZE-style row-pattern surface with plain lag/lead
    chains, which is how Spark — lacking MATCH_RECOGNIZE — expresses
    fixed-length patterns; variable-length patterns escalate to
    events_sequence_chains' stateful scan). Pure integer
    comparisons on an ordered calendar-sized window; the one ratio
    is fixed-order, round 6."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    wd = W.orderBy("day")
    ctx = daily.select(
        "day",
        "c",
        F.lag("c", 2).over(wd).alias("m2"),
        F.lag("c", 1).over(wd).alias("m1"),
        F.lead("c", 1).over(wd).alias("p1"),
        F.lead("c", 2).over(wd).alias("p2"),
    )
    return (
        ctx.filter(
            F.col("m2").isNotNull()
            & F.col("m1").isNotNull()
            & F.col("p1").isNotNull()
            & F.col("p2").isNotNull()
            & (F.col("m2") > F.col("m1"))
            & (F.col("m1") > F.col("c"))
            & (F.col("c") < F.col("p1"))
            & (F.col("p1") < F.col("p2"))
        )
        .select(
            F.col("day").alias("trough_day"),
            F.col("c").alias("trough_count"),
            F.col("m2").alias("minus2"),
            F.col("m1").alias("minus1"),
            F.col("p1").alias("plus1"),
            F.col("p2").alias("plus2"),
            F.round(
                (F.col("m2").cast("double") + F.col("p2"))
                / (2 * F.col("c")),
                6,
            ).alias("depth_ratio"),
        )
        .orderBy(F.col("depth_ratio").desc(), "trough_day")
        .limit(10)
    )


@register(
    "events_error_rate_wilson",
    group="J",
    oracle="""
    with hourly as (
      select date_trunc('hour', ts) as hour,
             cast(count(*) as bigint) as n,
             cast(count(*) filter (where event_type = 'error')
                  as bigint) as errs
      from events group by 1
    ),
    w as (
      select hour, n, errs,
             cast(errs as double) / n as p
      from hourly where n >= 30
    )
    select hour, n, errs,
           round(p, 6) as error_rate,
           round((p + 1.959964 * 1.959964 / (2 * n)
                  - 1.959964 * sqrt(p * (1 - p) / n
                    + 1.959964 * 1.959964 / (4.0 * n * n)))
                 / (1 + 1.959964 * 1.959964 / n), 6) as wilson_low,
           round((p + 1.959964 * 1.959964 / (2 * n)
                  + 1.959964 * sqrt(p * (1 - p) / n
                    + 1.959964 * 1.959964 / (4.0 * n * n)))
                 / (1 + 1.959964 * 1.959964 / n), 6) as wilson_high
    from w
    order by wilson_low desc, hour limit 15
    """,
)
def events_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: hourly error rate with Wilson 95% score intervals —
    the monitoring primitive done right: a raw rate of 2/40 and
    200/4000 both read '5%', but their Wilson lower bounds differ
    hugely, and ALERTING ON THE LOWER BOUND is what stops
    small-sample hours from paging on-call (the same reason Reddit/
    Wilson ranking beats naive proportion sorting). Top-15 hours by
    lower bound = the hours where elevated error rate is
    statistically real. Closed-form score interval from exact
    (n, errors) counts; z = 1.959964 as an exact literal; ≥30-event
    floor. One hourly rollup — counts merge map-side, and the same
    two counters stream (stream_tumbling_count's shape)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias(
            "errs"
        ),
    )
    z = 1.959964
    w = hourly.filter(F.col("n") >= 30).select(
        "hour",
        "n",
        "errs",
        (F.col("errs").cast("double") / F.col("n")).alias("p"),
    )
    nd = F.col("n")
    p = F.col("p")
    half = z * F.sqrt(
        p * (1 - p) / nd + z * z / (4.0 * nd * nd)
    )
    center = p + z * z / (2 * nd)
    denom = 1 + z * z / nd
    return (
        w.select(
            "hour",
            "n",
            "errs",
            F.round(p, 6).alias("error_rate"),
            F.round((center - half) / denom, 6).alias("wilson_low"),
            F.round((center + half) / denom, 6).alias("wilson_high"),
        )
        .orderBy(F.col("wilson_low").desc(), "hour")
        .limit(15)
    )


@register(
    "agg_trimmed_mean",
    group="E",
    oracle="""
    with r as (
      select o_totalprice as x,
             row_number() over (order by o_totalprice, o_orderkey)
               as rn,
             count(*) over () as n
      from orders
    ),
    trimmed as (
      select x, n from r
      where rn > n / 20 and rn <= n - n / 20
    )
    select max(n) as n_total,
           count(*) as n_kept,
           round(cast(sum(cast(floor(x * 1e6 + 0.5) as bigint))
                 as double) / count(*) / 1e6, 6) as trimmed_mean_5pct
    from trimmed
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext: 5% two-sided trimmed mean — DROP the tails entirely
    (feature_winsorize CLIPS them; the trimmed mean is the more
    aggressive robust-location estimator, the one Olympic scoring
    uses). Trim boundaries are exact integer ranks (n/20 integer
    division — no percentile interpolation at the cut), membership
    is a rank-range predicate, and the kept-set mean is
    micro-unit-exact. The total-order rank IS range-partitioned since
    r4 (distrank.with_global_row_number — per-partition row_number +
    offsets, bit-identical to the global window it replaced, which
    funneled every order row through one task; the global n rides
    along free as the last offset instead of a count() over an empty
    window). One range shuffle + one reduction; the KLL-sketch variant
    replaces the sort with quantile cuts when n makes even the
    range-sort the bottleneck."""
    from datalakecrawler_spark.distrank import with_global_row_number

    o = load(spark, sf_dir, "orders")
    r = with_global_row_number(
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey"),
        spark,
        ["x", "o_orderkey"],
        out="rn",
        with_total="n",
    )
    trimmed = r.filter(
        (F.col("rn") > F.expr("n div 20"))
        & (F.col("rn") <= F.col("n") - F.expr("n div 20"))
    )
    return trimmed.agg(
        F.max("n").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum(F.floor(F.col("x") * 1e6 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("trimmed_mean_5pct"),
    )


@register(
    "stats_multi_segment_ztest",
    group="J",
    oracle="""
    with u as (
      select e.user_id, c.c_mktsegment as segment,
             max(case when e.event_type = 'purchase' then 1 else 0 end)
               as conv
      from events e join customer c on c.c_custkey = e.user_id
      group by 1, 2
    ),
    seg as (
      select segment, cast(count(*) as bigint) as n,
             cast(sum(conv) as bigint) as x
      from u group by 1
    ),
    g as (
      select cast(sum(n) as bigint) as tn, cast(sum(x) as bigint) as tx,
             cast(count(*) as bigint) as k
      from seg
    ),
    z as (
      select s.segment, s.n, s.x, g.k,
             (cast(s.x as double) / s.n - cast(g.tx as double) / g.tn)
             / sqrt((cast(g.tx as double) / g.tn)
                    * (1 - cast(g.tx as double) / g.tn) / s.n) as zs
      from seg s cross join g
    )
    select segment, n as n_users, x as n_converted,
           round(zs, 6) as z_vs_global,
           abs(zs) > 2.807034 as significant_bonferroni_5pct
    from z
    order by segment
    """,
)
def stats_multi_segment_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: simultaneous segment-vs-global conversion tests with
    Bonferroni control — each market segment's conversion rate
    z-scored against the pooled rate, flagged significant only past
    the α/k-corrected threshold (k = 5 segments → two-sided
    z* = 2.807034, the exact literal both engines compare against).
    Testing every segment at raw α = 0.05 false-alarms ~1 segment in
    4 dashboards by chance — the multiplicity correction is the part
    naive segment drilldowns skip (events_ab_ztest tests ONE
    comparison; this is the many-comparison discipline). Counts
    exact; z fixed-order; the flag is a comparison of identical
    doubles."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    u = (
        e.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            e.user_id == F.col("c_custkey"),
        )
        .groupBy("user_id", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    seg = u.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    g = seg.agg(
        F.sum("n").alias("tn"),
        F.sum("x").alias("tx"),
        F.count(F.lit(1)).alias("k"),
    )
    p0 = F.col("tx").cast("double") / F.col("tn")
    zs = (F.col("x").cast("double") / F.col("n") - p0) / F.sqrt(
        p0 * (1 - p0) / F.col("n")
    )
    return (
        seg.crossJoin(F.broadcast(g))
        .select(
            "segment",
            F.col("n").alias("n_users"),
            F.col("x").alias("n_converted"),
            F.round(zs, 6).alias("z_vs_global"),
            (F.abs(zs) > 2.807034).alias(
                "significant_bonferroni_5pct"
            ),
        )
        .orderBy("segment")
    )


@register(
    "ts_ccf_view_purchase",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', ts) as date) as day,
             cast(count(*) filter (where event_type = 'view')
                  as bigint) as v,
             cast(count(*) filter (where event_type = 'purchase')
                  as bigint) as p
      from events group by 1
    ),
    r as (
      select v, p, row_number() over (order by day) as i from daily
    ),
    lags as (select * from (values (0), (1), (2), (3)) l(lag)),
    pairs as (
      select l.lag, a.v as x, b.p as y
      from lags l
      join r a on true
      join r b on b.i = a.i + l.lag
    ),
    m as (
      select lag, cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx,
             cast(sum(y * y) as bigint) as syy
      from pairs group by 1
    )
    select lag, n as n_pairs,
           round((cast(n as double) * sxy - cast(sx as double) * sy)
                 / sqrt((cast(n as double) * sxx
                         - cast(sx as double) * sx)
                        * (cast(n as double) * syy
                           - cast(sy as double) * sy)), 6) as ccf
    from m order by lag
    """,
)
def ts_ccf_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: cross-correlation function — daily view counts vs
    purchase counts lagged 0–3 days: does today's browsing predict
    purchases tomorrow, and with what lead time? (ts_acf correlates
    a series WITH ITSELF; the CCF across two series is the demand-
    sensing primitive that calibrates marketing lead-lag models.)
    Both daily series are exact integer counts, so all per-lag
    moment sums are exact bigints and the Pearson is the shared
    fixed-order form. The series table is calendar-sized; the
    per-lag self-join is over ~30 rows × 4 lags."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("v"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "p"
        ),
    )
    r = daily.select(
        "v", "p", F.row_number().over(W.orderBy("day")).alias("i")
    )
    lags = spark.range(0, 4).select(F.col("id").alias("lag"))
    a = r.alias("a")
    b = r.alias("b")
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .select(
            "lag", F.col("a.v").alias("x"), F.col("b.p").alias("y")
        )
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        "lag", F.col("n").alias("n_pairs"), F.round(num / den, 6).alias("ccf")
    ).orderBy("lag")


@register(
    "events_ab_srm_check",
    group="J",
    oracle="""
    with arms as (
      select user_id % 2 as arm, count(*) as n_users
      from (select distinct user_id from events) u
      group by 1
    ),
    w as (
      select cast(max(case when arm = 0 then n_users end) as bigint)
               as n0,
             cast(max(case when arm = 1 then n_users end) as bigint)
               as n1
      from arms
    )
    select n0, n1,
           round(cast(floor(
             ((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
              + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0))
             / ((n0 + n1) / 2.0) * 1e6 + 0.5) as double) / 1e6, 6)
             as srm_chi2,
           ((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
            + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0))
           / ((n0 + n1) / 2.0) > 3.841459 as srm_alarm
    from w
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Sample Ratio Mismatch — the experiment-validity gate
    that runs BEFORE any effect readout (events_ab_ztest /
    stats_permutation_null are meaningless if assignment itself is
    broken): chi-square goodness-of-fit of observed arm sizes
    against the designed 50/50, alarm past the df=1 95% critical
    value 3.841459 (exact literal). An SRM fires on redirect bugs,
    bot filtering applied to one arm, logging loss — the silent
    killers of A/B programs (Kohavi's checklist item #1). One
    distinct-user rollup; the statistic is a fixed-order expression
    on two exact integers, micro-quantized."""
    e = load(spark, sf_dir, "events")
    arms = (
        e.select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
    )
    exp = (F.col("n0") + F.col("n1")) / 2.0
    chi2 = (
        (F.col("n0") - exp) * (F.col("n0") - exp)
        + (F.col("n1") - exp) * (F.col("n1") - exp)
    ) / exp
    return w.select(
        "n0",
        "n1",
        F.round(
            F.floor(chi2 * 1e6 + 0.5).cast("double") / 1e6, 6
        ).alias("srm_chi2"),
        (chi2 > 3.841459).alias("srm_alarm"),
    )


@register(
    "stats_mde_power",
    group="J",
    oracle="""
    with assign as (
      select user_id, user_id % 2 as variant,
             max(case when event_type = 'purchase' then 1 else 0 end)
               as converted
      from events group by 1, 2
    ),
    arms as (
      select cast(sum(n_arm) as bigint) as n_total,
             cast(min(n_arm) as bigint) as n_min,
             cast(sum(conv) as bigint) as conv_total
      from (
        select variant, count(*) as n_arm,
               sum(converted) as conv
        from assign group by 1) a
    )
    select n_total, n_min,
           round(cast(conv_total as double) / n_total, 6) as base_rate,
           round((1.959964 + 0.841621)
                 * sqrt(2 * (cast(conv_total as double) / n_total)
                        * (1 - cast(conv_total as double) / n_total)
                        / n_min), 6) as mde_abs_80pct_power,
           round((1.959964 + 0.841621)
                 * sqrt(2 * (cast(conv_total as double) / n_total)
                        * (1 - cast(conv_total as double) / n_total)
                        / n_min)
                 / (cast(conv_total as double) / n_total), 6)
             as mde_relative
    from arms
    """,
)
def stats_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: minimum detectable effect at 80% power — given the
    experiment's ACTUAL arm sizes and base conversion rate, the
    smallest absolute (and relative) lift a two-proportion test can
    reliably detect: MDE = (z_{α/2} + z_β)·√(2p(1−p)/n_min) with
    the exact literals 1.959964 (α = 5%, two-sided) and 0.841621
    (β = 20%). This is the pre-readout sanity every experiment
    review demands — events_ab_ztest says what WAS seen;
    this says what COULD have been seen, and a 40% relative MDE
    means the 'flat' result is uninformative, not null. Same
    per-user collapse as the z-test; the statistic is one
    fixed-order expression over three exact integers."""
    e = load(spark, sf_dir, "events")
    assign = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    per_arm = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("converted").alias("conv"),
    )
    arms = per_arm.agg(
        F.sum("n_arm").alias("n_total"),
        F.min("n_arm").alias("n_min"),
        F.sum("conv").alias("conv_total"),
    )
    p = F.col("conv_total").cast("double") / F.col("n_total")
    mde = (1.959964 + 0.841621) * F.sqrt(
        2 * p * (1 - p) / F.col("n_min")
    )
    return arms.select(
        "n_total",
        "n_min",
        F.round(p, 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs_80pct_power"),
        F.round(mde / p, 6).alias("mde_relative"),
    )


@register(
    "stats_jarque_bera",
    group="J",
    oracle="""
    with k as (
      select l_returnflag,
             cast(floor(l_extendedprice + 0.5) as bigint) as x
      from lineitem
    ),
    m as (
      select l_returnflag,
             cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as s1,
             cast(sum(x * x) as bigint) as s2,
             sum(cast(x as double) * x * x) as s3,
             sum(cast(x as double) * x * x * x) as s4
      from k group by 1
    ),
    mom as (
      select l_returnflag, n,
             cast(s1 as double) / n as mu,
             cast(s2 as double) / n as r2,
             s3 / n as r3, s4 / n as r4
      from m
    ),
    sk as (
      select l_returnflag, n,
             (r3 - 3 * mu * r2 + 2 * mu * mu * mu)
               / pow(r2 - mu * mu, 1.5) as s,
             (r4 - 4 * mu * r3 + 6 * mu * mu * r2
              - 3 * mu * mu * mu * mu)
               / ((r2 - mu * mu) * (r2 - mu * mu)) - 3 as ek
      from mom
    )
    select l_returnflag, n,
           round(s, 6) as skewness,
           round(ek, 6) as excess_kurtosis,
           round(n / 6.0 * (s * s + ek * ek / 4), 4) as jarque_bera,
           n / 6.0 * (s * s + ek * ek / 4) > 5.991465 as reject_normal
    from sk order by l_returnflag
    """,
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Jarque-Bera normality test per group — JB =
    n/6·(S² + K²/4) from the same one-pass raw moments as
    agg_skewness_kurtosis, against the χ²(2) 95% critical value
    5.991465 (exact literal). The test that formalizes 'is mean±σ
    reporting valid for this column' — at large n it rejects for
    any real revenue column (heavy tails), which is itself the
    point: the profiler should steer consumers to quantiles
    (agg_percentile_disc) instead. Same moment-envelope argument as
    the skew/kurt operator; JB adds only fixed-order arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    k = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") + 0.5).alias("x"),
    )
    xd = F.col("x").cast("double")
    m = k.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(xd * F.col("x") * F.col("x")).alias("s3"),
        F.sum(xd * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3") / F.col("n")
    r4 = F.col("s4") / F.col("n")
    var = r2 - mu * mu
    sk = (r3 - 3 * mu * r2 + 2 * mu * mu * mu) / F.pow(var, 1.5)
    ek = (
        r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    ) / (var * var) - 3
    jb = F.col("n") / 6.0 * (sk * sk + ek * ek / 4)
    return m.select(
        "l_returnflag",
        "n",
        F.round(sk, 6).alias("skewness"),
        F.round(ek, 6).alias("excess_kurtosis"),
        F.round(jb, 4).alias("jarque_bera"),
        (jb > 5.991465).alias("reject_normal"),
    ).orderBy("l_returnflag")


@register(
    "events_arrival_dispersion",
    group="J",
    oracle="""
    with days as (
      select distinct cast(date_trunc('day', ts) as date) as day
      from events
    ),
    types as (select distinct event_type from events),
    counts as (
      select cast(date_trunc('day', ts) as date) as day, event_type,
             cast(count(*) as bigint) as c
      from events group by 1, 2
    ),
    grid as (
      select t.event_type, d.day, coalesce(c.c, 0) as c
      from types t cross join days d
      left join counts c
        on c.day = d.day and c.event_type = t.event_type
    ),
    m as (
      select event_type,
             cast(count(*) as bigint) as n_days,
             cast(sum(c) as bigint) as total,
             cast(sum(c * c) as bigint) as sq
      from grid group by 1
    )
    select event_type, n_days, total,
           round((cast(sq as double) / n_days
                  - (cast(total as double) / n_days)
                    * (cast(total as double) / n_days))
                 / (cast(total as double) / n_days), 6)
             as dispersion_index,
           (cast(sq as double) / n_days
            - (cast(total as double) / n_days)
              * (cast(total as double) / n_days))
           / (cast(total as double) / n_days)
           > 1 + 2 * sqrt(2.0 / n_days) as overdispersed
    from m order by event_type
    """,
)
def events_arrival_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: arrival overdispersion per event type — the index of
    dispersion (variance/mean of DAILY counts, zero days included
    via the full day×type grid) with a 2σ Poisson gate: index ≈ 1 is
    Poisson-like steady arrival (alerting can use Poisson bands),
    index ≫ 1 is bursty/campaign-driven (Poisson alert thresholds
    will false-fire; use events_anomaly_seasonal_zscore instead).
    The word-level twin is text_burstiness — same statistic, columns
    vs arrivals — but HERE zero cells matter, hence the explicit
    calendar grid (calendar-sized, broadcast). Exact int sums; the
    gate compares identical doubles."""
    e = load(spark, sf_dir, "events")
    days = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    types = e.select("event_type").distinct()
    counts = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(counts, ["day", "event_type"], "left")
        .na.fill({"c": 0})
    )
    m = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    mean = F.col("total").cast("double") / F.col("n_days")
    vmr = (F.col("sq").cast("double") / F.col("n_days") - mean * mean) / mean
    return m.select(
        "event_type",
        "n_days",
        "total",
        F.round(vmr, 6).alias("dispersion_index"),
        (vmr > 1 + 2 * F.sqrt(2.0 / F.col("n_days"))).alias(
            "overdispersed"
        ),
    ).orderBy("event_type")


@register(
    "stats_ks_orders_periods",
    group="J",
    oracle="""
    with tagged as (
      select cast(floor(o_totalprice * 100 + 0.5) as bigint) as v,
             case when o_orderdate < timestamp '1999-01-01'
                  then 1 else 0 end as in_a
      from orders
    ),
    counts as (
      select v,
             cast(sum(in_a) as bigint) as ca,
             cast(sum(1 - in_a) as bigint) as cb
      from tagged group by 1
    ),
    tot as (
      select cast(sum(ca) as bigint) as na,
             cast(sum(cb) as bigint) as nb
      from counts
    ),
    ecdf as (
      select v,
             sum(ca) over (order by v
               rows between unbounded preceding and current row)
               as cum_a,
             sum(cb) over (order by v
               rows between unbounded preceding and current row)
               as cum_b
      from counts
    ),
    d as (
      select max(abs(cast(cum_a as double) / na
                     - cast(cum_b as double) / nb)) as ks
      from ecdf, tot
    )
    select na as n_before, nb as n_after,
           round(ks, 6) as ks_statistic,
           ks > 1.358102 * sqrt((na + cast(nb as double)) / (na * cast(nb as double)))
             as reject_same_dist_5pct
    from d, tot
    """,
)
def stats_ks_orders_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: two-sample Kolmogorov-Smirnov between the order-value
    distributions of two periods — the distribution-level drift
    question ('did the SHAPE of spending change', where
    orders_aov_decomposition explains only the MEAN) with the
    α = 5% decision line D > c(α)·√((n₁+n₂)/(n₁n₂)), c = 1.358102
    exact literal. The ECDF-difference maximum runs on exact integer
    cumulative counts over cent-quantized distinct values (the
    catalog_drift_ks machinery pointed at a time split); the only
    sort is over DISTINCT values. Exact ints until the final
    divisions."""
    o = load(spark, sf_dir, "orders")
    tagged = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("v"),
        F.when(
            F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"),
            1,
        )
        .otherwise(0)
        .alias("in_a"),
    )
    counts = tagged.groupBy("v").agg(
        F.sum("in_a").alias("ca"),
        F.sum(1 - F.col("in_a")).alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    from datalakecrawler_spark.distrank import with_global_cumsum

    # both ECDFs ride one distributed prefix-sum layout (the distinct
    # cent-quantized value frame is data-proportional until saturation)
    ecdf = with_global_cumsum(
        counts,
        spark,
        ["v"],
        "ca",
        out="cum_a",
        inclusive=True,
        extra=[("cb", "cum_b")],
    ).select("cum_a", "cum_b")
    d = ecdf.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.col("cum_a").cast("double") / F.col("na")
                - F.col("cum_b").cast("double") / F.col("nb")
            )
        ).alias("ks")
    )
    j = d.crossJoin(F.broadcast(tot))
    crit = 1.358102 * F.sqrt(
        (F.col("na") + F.col("nb").cast("double"))
        / (F.col("na") * F.col("nb").cast("double"))
    )
    return j.select(
        F.col("na").alias("n_before"),
        F.col("nb").alias("n_after"),
        F.round("ks", 6).alias("ks_statistic"),
        (F.col("ks") > crit).alias("reject_same_dist_5pct"),
    )


@register(
    "ts_yoy_growth",
    group="F",
    oracle="""
    with monthly as (
      select cast(date_trunc('month', o_orderdate) as date) as mth,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as rev_micro,
             cast(count(*) as bigint) as n_orders
      from orders group by 1
    ),
    j as (
      select mth, rev_micro, n_orders,
             lag(rev_micro, 12) over (order by mth) as prev_rev,
             lag(n_orders, 12) over (order by mth) as prev_n
      from monthly
    )
    select mth,
           round(cast(rev_micro as double) / 1e6, 2) as revenue,
           round(100.0 * (cast(rev_micro as double) - prev_rev)
                 / prev_rev, 6) as yoy_revenue_pct,
           round(100.0 * (cast(n_orders as double) - prev_n)
                 / prev_n, 6) as yoy_orders_pct
    from j
    where prev_rev is not null
    order by mth
    """,
)
def ts_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: year-over-year growth — each month against the SAME
    month last year (lag 12 on the monthly series), for both revenue
    and order count: the seasonality-free growth read
    (win_period_growth's MoM is dominated by the seasonal cycle
    ts_seasonal_strength quantifies; YoY differences it away —
    which is also why YoY is 12 months SLOWER to see trend breaks,
    the ts_seasonal_naive_error trade-off). Monthly inputs
    micro-exact; growth ratios on exact operands; lag-12 runs on
    the calendar-sized series."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mth")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias(
            "rev_micro"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wd = W.orderBy("mth")
    j = monthly.select(
        "mth",
        "rev_micro",
        "n_orders",
        F.lag("rev_micro", 12).over(wd).alias("prev_rev"),
        F.lag("n_orders", 12).over(wd).alias("prev_n"),
    ).filter(F.col("prev_rev").isNotNull())
    return j.select(
        "mth",
        F.round(F.col("rev_micro").cast("double") / 1e6, 2).alias(
            "revenue"
        ),
        F.round(
            100.0
            * (F.col("rev_micro").cast("double") - F.col("prev_rev"))
            / F.col("prev_rev"),
            6,
        ).alias("yoy_revenue_pct"),
        F.round(
            100.0
            * (F.col("n_orders").cast("double") - F.col("prev_n"))
            / F.col("prev_n"),
            6,
        ).alias("yoy_orders_pct"),
    ).orderBy("mth")


@register(
    "ts_rolling_slope",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(floor(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5)
                  as bigint)) as double) / 1e9 + 0.5) as bigint) as yk
      from orders group by 1
    ),
    r as (
      select day, yk,
             cast(row_number() over (order by day) as bigint) as i
      from daily
    ),
    wins as (
      select day,
             cast(count(*) over w as bigint) as n,
             cast(sum(i) over w as bigint) as sx,
             cast(sum(yk) over w as bigint) as sy,
             cast(sum(i * yk) over w as bigint) as sxy,
             cast(sum(i * i) over w as bigint) as sxx
      from r
      window w as (order by day
        rows between 29 preceding and current row)
    )
    select day,
           n as window_days,
           round((cast(n as double) * sxy - cast(sx as double) * sy)
                 / (cast(n as double) * sxx
                    - cast(sx as double) * sx), 6)
             as slope_kusd_per_day
    from wins
    where n = 30
    order by day desc limit 20
    """,
)
def ts_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: rolling 30-day regression slope of daily revenue — the
    trailing trend estimate a monitor plots as 'momentum'
    (ts_theil_sen_trend fits ONE global line; the rolling OLS slope
    is its windowed form, reacting within the window length and
    smoother than day-over-day deltas). The trick: ALL five OLS
    moment sums are plain windowed integer sums (x = row index,
    y = kilodollar-quantized revenue — the ts_acf scaling), so the
    closed-form slope per window needs no per-window refit and the
    whole series costs one ordered window pass. Complete 30-day
    windows only; latest 20 shown."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast(
                "double"
            )
            / 1e9
            + 0.5
        ).alias("yk")
    )
    r = daily.select(
        "day",
        "yk",
        F.row_number().over(W.orderBy("day")).cast("long").alias("i"),
    )
    wv = W.orderBy("day").rowsBetween(-29, W.currentRow)
    wins = r.select(
        "day",
        F.count(F.lit(1)).over(wv).alias("n"),
        F.sum("i").over(wv).alias("sx"),
        F.sum("yk").over(wv).alias("sy"),
        F.sum(F.col("i") * F.col("yk")).over(wv).alias("sxy"),
        F.sum(F.col("i") * F.col("i")).over(wv).alias("sxx"),
    ).filter(F.col("n") == 30)
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return (
        wins.select(
            "day",
            F.col("n").alias("window_days"),
            F.round(slope, 6).alias("slope_kusd_per_day"),
        )
        .orderBy(F.col("day").desc())
        .limit(20)
    )


@register(
    "stats_simpsons_paradox_check",
    group="J",
    oracle="""
    with q as (
      select l_returnflag,
             cast(floor(l_quantity * 1e2 + 0.5) as bigint) as x2,
             cast(floor(l_extendedprice * 1e1 + 0.5) as bigint) as y1
      from lineitem
    ),
    g as (
      select l_returnflag,
             cast(count(*) as bigint) as n,
             cast(sum(x2) as bigint) as sx,
             cast(sum(y1) as bigint) as sy,
             cast(sum(x2 * y1) as bigint) as sxy,
             cast(sum(x2 * x2) as bigint) as sxx
      from q group by 1
    ),
    overall as (
      select cast(sum(n) as bigint) as n,
             cast(sum(sx) as bigint) as sx,
             cast(sum(sy) as bigint) as sy,
             cast(sum(sxy) as bigint) as sxy,
             cast(sum(sxx) as bigint) as sxx
      from g
    ),
    slopes as (
      select (cast(overall.n as double) * overall.sxy
              - cast(overall.sx as double) * overall.sy)
             / (cast(overall.n as double) * overall.sxx
                - cast(overall.sx as double) * overall.sx)
               * 10 as overall_slope,
             (select sum(cast(floor(
                ((cast(n as double) * sxy - cast(sx as double) * sy)
                 / (cast(n as double) * sxx
                    - cast(sx as double) * sx)) * 10
                * n * 1e9 + 0.5) as bigint)) from g) as wsum9,
             (select cast(sum(n) as bigint) from g) as tn
      from overall
    )
    select round(overall_slope, 6) as overall_slope,
           round(cast(wsum9 as double) / 1e9 / tn, 6)
             as pooled_within_slope,
           sign(overall_slope)
             <> sign(cast(wsum9 as double) / 1e9 / tn)
             as paradox_flag
    from slopes
    """,
)
def stats_simpsons_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Simpson's-paradox detector — the OLS slope of price on
    quantity computed OVERALL vs the size-weighted mean of
    WITHIN-GROUP slopes (by returnflag): when the signs disagree,
    aggregation direction reverses under conditioning — the classic
    trap that turns dashboard conclusions wrong, and the reason
    segment-level drill-downs (events_conversion_by_segment et al.)
    must accompany totals. Both slopes derive from the SAME
    fixed-point moment sums (quantity 1e2 / price 1e1 — the
    stats_covariance_matrix scales): group sums roll up exactly to
    the overall sums, so the comparison is internally consistent by
    construction. Per-group slopes are nano-quantized before the
    weighted pooling."""
    li = load(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 1e2 + 0.5).alias("x2"),
        F.floor(F.col("l_extendedprice") * 1e1 + 0.5).alias("y1"),
    )
    g = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x2").alias("sx"),
        F.sum("y1").alias("sy"),
        F.sum(F.col("x2") * F.col("y1")).alias("sxy"),
        F.sum(F.col("x2") * F.col("x2")).alias("sxx"),
    )

    def slope():
        nd = F.col("n").cast("double")
        return (
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ) * 10

    overall = g.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxx").alias("sxx"),
    ).select(slope().alias("overall_slope"))
    within = g.select(
        F.floor(slope() * F.col("n") * 1e9 + 0.5).alias("w9"),
        "n",
    ).agg(
        F.sum("w9").alias("wsum9"), F.sum("n").alias("tn")
    )
    j = overall.crossJoin(F.broadcast(within))
    pooled = F.col("wsum9").cast("double") / 1e9 / F.col("tn")
    return j.select(
        F.round("overall_slope", 6).alias("overall_slope"),
        F.round(pooled, 6).alias("pooled_within_slope"),
        (
            F.signum(F.col("overall_slope")) != F.signum(pooled)
        ).alias("paradox_flag"),
    )


@register(
    "events_hourly_eta2",
    group="F",
    oracle="""
    with hourly as (
      select date_trunc('hour', ts) as hr,
             date_part('hour', ts) as hod,
             cast(count(*) as bigint) as c
      from events group by 1, 2
    ),
    m as (
      select hod,
             cast(count(*) as bigint) as n,
             cast(sum(c) as bigint) as s,
             cast(sum(c * c) as bigint) as sq
      from hourly group by 1
    ),
    tot as (
      select cast(sum(n) as bigint) as tn,
             cast(sum(s) as bigint) as ts,
             cast(sum(sq) as bigint) as tsq,
             sum(cast(s as double) * s / n) as ssb_part
      from m
    )
    select tn as n_hours,
           round((ssb_part - cast(ts as double) * ts / tn)
                 / (cast(tsq as double)
                    - cast(ts as double) * ts / tn), 6)
             as hour_of_day_eta2
    from tot
    """,
)
def events_hourly_eta2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: intraday seasonality strength — η² of hour-of-day on
    hourly event counts (ts_seasonal_strength's method at the
    intraday grain): near 1 means the daily load curve is the
    dominant signal (autoscale on the clock), near 0 means arrivals
    ignore the clock (scale on raw rate instead) — the single
    number behind choosing events_hourly_heatmap vs a flat
    threshold for capacity. Hourly counts exact; the same
    between/total sum-of-squares decomposition with exact-int group
    moments."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hr"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("c"))
    m = hourly.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    tot = m.agg(
        F.sum("n").alias("tn"),
        F.sum("s").alias("ts"),
        F.sum("sq").alias("tsq"),
        F.sum(
            F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("ssb_part"),
    )
    grand = F.col("ts").cast("double") * F.col("ts") / F.col("tn")
    return tot.select(
        F.col("tn").alias("n_hours"),
        F.round(
            (F.col("ssb_part") - grand)
            / (F.col("tsq").cast("double") - grand),
            6,
        ).alias("hour_of_day_eta2"),
    )


@register(
    "events_ab_cuped",
    group="J",
    oracle="""
    with split as (
      select user_id,
             cast(count(*) filter (where ts < timestamp '2024-01-11')
                  as bigint) as x,
             cast(count(*) filter (where ts >= timestamp '2024-01-11')
                  as bigint) as y
      from events group by 1
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as sx,
             cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx,
             cast(sum(y * y) as bigint) as syy
      from split
    ),
    t as (
      select n, sx, sy, syy,
             (cast(sxy as double) - cast(sx as double) * sy / n)
             / (cast(sxx as double) - cast(sx as double) * sx / n)
               as theta,
             (cast(sxy as double) - cast(sx as double) * sy / n)
             * ((cast(sxy as double) - cast(sx as double) * sy / n)
                / ((cast(sxx as double) - cast(sx as double) * sx / n)
                   * (cast(syy as double)
                      - cast(sy as double) * sy / n))) as rho2_num
      from m
    )
    select t.n as n_users,
           round(cast(t.sy as double) / t.n, 6) as post_mean_activity,
           round(t.theta, 6) as theta,
           round(t.rho2_num
                 / (cast(m.sxy as double)
                    - cast(m.sx as double) * m.sy / m.n),
                 6) as corr_xy_squared,
           round(1 - t.rho2_num
                 / (cast(m.sxy as double)
                    - cast(m.sx as double) * m.sy / m.n),
                 6) as variance_ratio_after_cuped
    from t, m
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: CUPED variance reduction — θ = cov(X,Y)/var(X) for
    pre-period activity X (events before the fixture's day-10
    split, the stream_drift_psi baseline boundary) against
    post-period activity Y, with ρ²(X,Y) and the resulting
    variance ratio 1−ρ²: the technique that makes experiments read
    out FASTER for free (a ρ² of 0.3 cuts required sample size by
    30% — Microsoft's CUPED, now every platform's default;
    stats_mde_power says what the raw design detects, CUPED is how
    to beat it). All from six exact integer moment sums in one
    per-user collapse; θ and ρ² are fixed-order expressions
    (ρ² written as (covXY/varX)·(covXY/varY) via the covariance
    numerators to keep both engines in the same operation order)."""
    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-11").cast("timestamp")
    split = e.groupBy("user_id").agg(
        F.count(F.when(F.col("ts") < cut, 1)).alias("x"),
        F.count(F.when(F.col("ts") >= cut, 1)).alias("y"),
    )
    m = split.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n")
    covxy = F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy") / nd
    varx = F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx") / nd
    vary = F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy") / nd
    theta = covxy / varx
    rho2_num = covxy * (covxy / (varx * vary))
    rho2 = rho2_num / covxy
    return m.select(
        F.col("n").alias("n_users"),
        F.round(F.col("sy").cast("double") / nd, 6).alias(
            "post_mean_activity"
        ),
        F.round(theta, 6).alias("theta"),
        F.round(rho2, 6).alias("corr_xy_squared"),
        F.round(1 - rho2, 6).alias("variance_ratio_after_cuped"),
    )


@register(
    "ts_dominant_period",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(floor(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5)
                  as bigint)) as double) / 1e9 + 0.5) as bigint) as xk
      from orders group by 1
    ),
    r as (
      select xk, row_number() over (order by day) as i from daily
    ),
    lags as (select unnest(range(2, 15)) as lag),
    pairs as (
      select l.lag, a.xk as x, b.xk as y
      from lags l
      join r a on true
      join r b on b.i = a.i + l.lag
    ),
    m as (
      select lag, cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx,
             cast(sum(y * y) as bigint) as syy
      from pairs group by 1
    ),
    acf as (
      select lag,
             (cast(n as double) * sxy - cast(sx as double) * sy)
             / sqrt((cast(n as double) * sxx
                     - cast(sx as double) * sx)
                    * (cast(n as double) * syy
                       - cast(sy as double) * sy)) as a
      from m
    ),
    best as (
      select lag, a,
             row_number() over (order by a desc, lag) as rk
      from acf
    )
    select lag as dominant_period_days,
           round(a, 6) as acf_at_peak,
           a > 0.2 as periodicity_detected
    from best where rk = 1
    """,
)
def ts_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: dominant-period detection — the lag (2..14 days)
    maximizing the autocorrelation of daily revenue, with a 0.2
    significance gate: the poor-man's spectral peak (a full FFT
    needs complex arithmetic; for calendar periodicities the argmax
    over a bounded ACF window finds the same answer — 7 for weekly
    rhythm — and composes entirely from ts_acf's machinery). The
    argmax is a deterministic rank over ≤13 identical-IEEE values;
    everything below it is the exact-int moment pipeline."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast(
                "double"
            )
            / 1e9
            + 0.5
        ).alias("xk")
    )
    r = daily.select(
        "xk", F.row_number().over(W.orderBy("day")).alias("i")
    )
    lags = spark.range(2, 15).select(F.col("id").alias("lag"))
    a = r.alias("a")
    b = r.alias("b")
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .select("lag", F.col("a.xk").alias("x"), F.col("b.xk").alias("y"))
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    acf = m.select(
        "lag",
        (
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx")
                 - F.col("sx").cast("double") * F.col("sx"))
                * (nd * F.col("syy")
                   - F.col("sy").cast("double") * F.col("sy"))
            )
        ).alias("a"),
    )
    # argmax aggregate ≡ the former global row_number window + rk=1
    # (r9, guide §2.3): min(struct(-a, lag)) — also drops the
    # single-partition global window node entirely. ADVICE r9: a NULL
    # acf (zero-variance lag) sorts FIRST in struct-min order whereas
    # the old desc window put NULLs last, and a global agg over an
    # empty frame emits one all-NULL row where the window emitted
    # none — filter NULLs before and after to keep the window (and
    # oracle NULLS-LAST/empty) semantics exactly.
    best = (
        acf.where(F.col("a").isNotNull())
        .agg(
            F.min(
                F.struct((-F.col("a")).alias("na"), F.col("lag").alias("lag"))
            ).alias("m")
        )
        .select(F.col("m.lag").alias("lag"), (-F.col("m.na")).alias("a"))
        .where(F.col("lag").isNotNull())
    )
    return best.select(
        F.col("lag").alias("dominant_period_days"),
        F.round("a", 6).alias("acf_at_peak"),
        (F.col("a") > 0.2).alias("periodicity_detected"),
    )


@register(
    "ts_record_days",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as rev_micro
      from orders group by 1
    ),
    runs as (
      select day, rev_micro,
             max(rev_micro) over (order by day
               rows between unbounded preceding and 1 preceding)
               as prev_best
      from daily
    )
    select day as record_day,
           round(cast(rev_micro as double) / 1e6, 2) as revenue,
           round(cast(rev_micro - coalesce(prev_best, 0) as double)
                 / 1e6, 2) as margin_over_prior_best
    from runs
    where prev_best is null or rev_micro > prev_best
    order by day desc limit 15
    """,
)
def ts_record_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: record-setting days — days whose revenue beat every
    prior day, with the margin over the previous best (the
    'all-time high' ticker; the cadence of records is itself a
    statistic — under a stationary series the k-th record waits
    e^k days, so records clustering late = genuine growth, the
    record-counting test from extreme-value theory). Running max of
    exact micro-ints over the calendar-sized daily series; strict
    integer comparisons; latest 15 records."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias(
            "rev_micro"
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    runs = daily.select(
        "day",
        "rev_micro",
        F.max("rev_micro").over(w).alias("prev_best"),
    )
    return (
        runs.filter(
            F.col("prev_best").isNull()
            | (F.col("rev_micro") > F.col("prev_best"))
        )
        .select(
            F.col("day").alias("record_day"),
            F.round(F.col("rev_micro").cast("double") / 1e6, 2).alias(
                "revenue"
            ),
            F.round(
                (
                    F.col("rev_micro")
                    - F.coalesce(F.col("prev_best"), F.lit(0))
                ).cast("double")
                / 1e6,
                2,
            ).alias("margin_over_prior_best"),
        )
        .orderBy(F.col("record_day").desc())
        .limit(15)
    )


@register(
    "stats_ratio_metric_se",
    group="J",
    oracle="""
    with per_user as (
      select user_id,
             cast(sum(cast(floor(coalesce(value, 0) * 1e6 + 0.5)
                  as bigint)) as bigint) as x_micro,
             cast(count(*) as bigint) as y
      from events group by 1
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(x_micro) as bigint) as sx,
             cast(sum(y) as bigint) as sy,
             sum(cast(x_micro as double) * y) as sxy,
             sum(cast(x_micro as double) * x_micro) as sxx,
             cast(sum(y * y) as bigint) as syy
      from per_user
    ),
    t as (
      select n, sx, sy,
             cast(sx as double) / sy as r_micro,
             (sxx - cast(sx as double) * sx / n) / (n - 1) as vx,
             (cast(syy as double) - cast(sy as double) * sy / n)
               / (n - 1) as vy,
             (sxy - cast(sx as double) * sy / n) / (n - 1) as cxy,
             cast(sy as double) / n as ybar
      from m
    )
    select n as n_users,
           round(r_micro / 1e6, 6) as value_per_event,
           round(sqrt((vx - 2 * r_micro * cxy
                       + r_micro * r_micro * vy)
                      / (ybar * ybar * n)) / 1e6, 6)
             as se_delta_method
    from t
    """,
)
def stats_ratio_metric_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: delta-method standard error for a RATIO metric —
    value-per-event = Σvalue/Σevents is a ratio of two random
    per-user sums, and its naive 'treat events as independent' SE
    is wrong because users cluster; the delta method
    Var(x̄/ȳ) ≈ (σ²x − 2Rσxy + R²σ²y)/(ȳ²n) with USER-level
    moments is how experimentation platforms report ratio-metric
    uncertainty (the companion to events_ab_cuped — both
    corrections operate at the randomization-unit grain). Six
    moment sums in one per-user collapse; Σx² accumulates as
    double (micro² exceeds int64 — same-sign reorder-stable, the
    agg_skewness_kurtosis envelope); the SE is one fixed-order
    expression."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1e6 + 0.5)
        ).alias("x_micro"),
        F.count(F.lit(1)).alias("y"),
    )
    xd = F.col("x_micro").cast("double")
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_micro").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x_micro")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n")
    r = F.col("sx").cast("double") / F.col("sy")
    vx = (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / nd) / (
        nd - 1
    )
    vy = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / nd
    ) / (nd - 1)
    cxy = (
        F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / nd
    ) / (nd - 1)
    ybar = F.col("sy").cast("double") / nd
    se = F.sqrt(
        (vx - 2 * r * cxy + r * r * vy) / (ybar * ybar * nd)
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.round(r / 1e6, 6).alias("value_per_event"),
        F.round(se / 1e6, 6).alias("se_delta_method"),
    )


@register(
    "events_ab_value_ttest",
    group="J",
    oracle="""
    with per_user as (
      select user_id, user_id % 2 as variant,
             cast(sum(cast(floor(coalesce(value, 0) * 1e4 + 0.5)
                  as bigint)) as bigint) as v4
      from events group by 1, 2
    ),
    g as (
      select variant,
             cast(count(*) as bigint) as n,
             cast(sum(v4) as bigint) as s,
             sum(cast(v4 as double) * v4) as sq
      from per_user group by 1
    ),
    w as (
      select max(case when variant = 1 then n end) as n1,
             max(case when variant = 1 then s end) as s1,
             max(case when variant = 1 then sq end) as q1,
             max(case when variant = 0 then n end) as n0,
             max(case when variant = 0 then s end) as s0,
             max(case when variant = 0 then sq end) as q0
      from g
    ),
    m as (
      select n1, n0,
             cast(s1 as double) / n1 as m1,
             cast(s0 as double) / n0 as m0,
             (q1 - n1 * (cast(s1 as double) / n1)
                   * (cast(s1 as double) / n1)) / (n1 - 1) as v1,
             (q0 - n0 * (cast(s0 as double) / n0)
                   * (cast(s0 as double) / n0)) / (n0 - 1) as v0
      from w
    )
    select n1 as n_treatment, n0 as n_control,
           round(m1 / 1e4, 4) as mean_value_treatment,
           round(m0 / 1e4, 4) as mean_value_control,
           round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6) as t_stat
    from m
    """,
)
def events_ab_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the continuous-metric experiment readout — Welch's t on
    PER-USER total value by arm (events_ab_ztest answers 'did more
    users convert'; this answers 'did users generate more VALUE' —
    the revenue metric most experiments actually optimize, and
    per-user aggregation first is the non-negotiable step: testing
    at event grain violates independence, the
    stats_ratio_metric_se lesson). Per-user values quantized at
    1e-4; per-arm (n, Σ, Σ²) with Σ² as same-sign double
    accumulation (micro² range); the t statistic is the
    stats_ttest_welch fixed-order expression."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.sum(
            F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1e4 + 0.5)
        ).alias("v4")
    )
    vd = F.col("v4").cast("double")
    g = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v4").alias("s"),
        F.sum(vd * F.col("v4")).alias("sq"),
    )
    w = g.agg(
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("variant") == 1, F.col("sq"))).alias("q1"),
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("variant") == 0, F.col("sq"))).alias("q0"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m0 = F.col("s0").cast("double") / F.col("n0")
    v1 = (F.col("q1") - F.col("n1") * m1 * m1) / (F.col("n1") - 1)
    v0 = (F.col("q0") - F.col("n0") * m0 * m0) / (F.col("n0") - 1)
    return w.select(
        F.col("n1").alias("n_treatment"),
        F.col("n0").alias("n_control"),
        F.round(m1 / 1e4, 4).alias("mean_value_treatment"),
        F.round(m0 / 1e4, 4).alias("mean_value_control"),
        F.round(
            (m1 - m0) / F.sqrt(v1 / F.col("n1") + v0 / F.col("n0")), 6
        ).alias("t_stat"),
    )


@register(
    "events_ab_funnel_compare",
    group="J",
    oracle="""
    with v as (
      select user_id, user_id % 2 as variant, min(ts) as t_view
      from events where event_type = 'view' group by 1, 2
    ),
    c as (
      select e.user_id, min(e.ts) as t_click
      from events e join v on v.user_id = e.user_id
      where e.event_type = 'click' and e.ts >= v.t_view
      group by 1
    ),
    p as (
      select e.user_id, min(e.ts) as t_purchase
      from events e join c on c.user_id = e.user_id
      where e.event_type = 'purchase' and e.ts >= c.t_click
      group by 1
    ),
    stages as (
      select v.variant,
             cast(count(*) as bigint) as n_view,
             cast(count(c.user_id) as bigint) as n_click,
             cast(count(p.user_id) as bigint) as n_purchase
      from v
      left join c on c.user_id = v.user_id
      left join p on p.user_id = v.user_id
      group by 1
    )
    select variant, n_view, n_click, n_purchase,
           round(cast(n_click as double) / n_view, 6) as view_to_click,
           round(cast(n_purchase as double)
                 / nullif(n_click, 0), 6) as click_to_purchase
    from stages order by variant
    """,
)
def events_ab_funnel_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the funnel split by experiment arm — ordered
    view→click→purchase stage counts and step rates per variant:
    WHERE a treatment moves the funnel (a lift concentrated in
    view→click is an awareness effect; in click→purchase a
    checkout effect — the topline z-test (events_ab_ztest) can't
    localize this). Same shrinking-stage per-user min-timestamp
    machinery as funnel_conversion with the arm key carried
    through; left joins preserve stage drop-out. Exact counts,
    fixed-order step rates."""
    e = load(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", (F.col("user_id") % 2).alias("variant"))
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(F.broadcast(v.select("user_id", "t_view")), "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stages = (
        v.join(
            c.select("user_id", F.lit(1).alias("clicked")),
            "user_id",
            "left",
        )
        .join(
            p.select("user_id", F.lit(1).alias("purchased")),
            "user_id",
            "left",
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_view"),
            F.count("clicked").alias("n_click"),
            F.count("purchased").alias("n_purchase"),
        )
    )
    return stages.select(
        "variant",
        "n_view",
        "n_click",
        "n_purchase",
        F.round(
            F.col("n_click").cast("double") / F.col("n_view"), 6
        ).alias("view_to_click"),
        F.round(
            F.col("n_purchase").cast("double")
            / F.nullif(F.col("n_click"), F.lit(0)),
            6,
        ).alias("click_to_purchase"),
    ).orderBy("variant")


@register(
    "events_ab_guardrails",
    group="J",
    oracle="""
    with per_user as (
      select user_id, user_id % 2 as variant,
             cast(count(*) as bigint) as n_events,
             cast(count(*) filter (where event_type = 'error')
                  as bigint) as n_errors
      from events group by 1, 2
    ),
    arms as (
      select variant,
             cast(count(*) as bigint) as n_users,
             cast(sum(n_events) as bigint) as events,
             cast(sum(n_errors) as bigint) as errors
      from per_user group by 1
    ),
    w as (
      select max(case when variant = 1 then n_users end) as nu1,
             max(case when variant = 1 then events end) as e1,
             max(case when variant = 1 then errors end) as x1,
             max(case when variant = 0 then n_users end) as nu0,
             max(case when variant = 0 then events end) as e0,
             max(case when variant = 0 then errors end) as x0
      from arms
    )
    select nu1 as n_treatment_users, nu0 as n_control_users,
           round(cast(x1 as double) / e1, 6) as error_rate_treatment,
           round(cast(x0 as double) / e0, 6) as error_rate_control,
           cast(x1 as double) * e0 * 10 > cast(x0 as double) * e1 * 11
             as guardrail_error_breach,
           round(cast(e1 as double) / nu1, 6) as events_per_user_t,
           round(cast(e0 as double) / nu0, 6) as events_per_user_c,
           cast(e1 as double) * nu0 * 10 < cast(e0 as double) * nu1 * 9
             as guardrail_engagement_breach
    from w
    """,
)
def events_ab_guardrails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: experiment guardrails — the DO-NO-HARM metrics every
    launch review checks alongside the success metric: error rate
    must not exceed control by >10% and engagement (events/user)
    must not drop >10% (breaching either vetoes a 'winning'
    treatment — the asymmetry between optimizing one metric and
    protecting the rest). Both breach tests are integer
    cross-multiplications (x1·e0·10 > x0·e1·11 ⟺ rate ratio > 1.1)
    — no float at the decision boundary. One per-user collapse +
    per-arm rollup shared with the readout family."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias(
            "n_errors"
        ),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("events"),
        F.sum("n_errors").alias("errors"),
    )
    w = arms.agg(
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias(
            "nu1"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("events"))).alias(
            "e1"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("errors"))).alias(
            "x1"
        ),
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias(
            "nu0"
        ),
        F.max(F.when(F.col("variant") == 0, F.col("events"))).alias(
            "e0"
        ),
        F.max(F.when(F.col("variant") == 0, F.col("errors"))).alias(
            "x0"
        ),
    )
    return w.select(
        F.col("nu1").alias("n_treatment_users"),
        F.col("nu0").alias("n_control_users"),
        F.round(
            F.col("x1").cast("double") / F.col("e1"), 6
        ).alias("error_rate_treatment"),
        F.round(
            F.col("x0").cast("double") / F.col("e0"), 6
        ).alias("error_rate_control"),
        (
            F.col("x1").cast("double") * F.col("e0") * 10
            > F.col("x0").cast("double") * F.col("e1") * 11
        ).alias("guardrail_error_breach"),
        F.round(
            F.col("e1").cast("double") / F.col("nu1"), 6
        ).alias("events_per_user_t"),
        F.round(
            F.col("e0").cast("double") / F.col("nu0"), 6
        ).alias("events_per_user_c"),
        (
            F.col("e1").cast("double") * F.col("nu0") * 10
            < F.col("e0").cast("double") * F.col("nu1") * 9
        ).alias("guardrail_engagement_breach"),
    )


@register(
    "events_ab_z_timeline",
    group="J",
    oracle="""
    with users as (
      select user_id, user_id % 2 as variant,
             cast(date_trunc('day', min(ts)) as date) as enter_day,
             cast(date_trunc('day', min(case when event_type =
               'purchase' then ts end)) as date) as conv_day
      from events group by 1, 2
    ),
    days as (
      select distinct cast(date_trunc('day', ts) as date) as d
      from events
    ),
    cum as (
      select d.d,
             cast(count(*) filter (where u.variant = 0
               and u.enter_day <= d.d) as bigint) as n0,
             cast(count(*) filter (where u.variant = 0
               and u.conv_day <= d.d) as bigint) as c0,
             cast(count(*) filter (where u.variant = 1
               and u.enter_day <= d.d) as bigint) as n1,
             cast(count(*) filter (where u.variant = 1
               and u.conv_day <= d.d) as bigint) as c1
      from days d cross join users u
      group by 1
    )
    select d as day, n0 + n1 as users_entered,
           round((cast(c1 as double) / n1 - cast(c0 as double) / n0)
                 / sqrt((cast(c0 + c1 as double) / (n0 + n1))
                        * (1 - cast(c0 + c1 as double) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) as z_to_date,
           abs((cast(c1 as double) / n1 - cast(c0 as double) / n0)
               / sqrt((cast(c0 + c1 as double) / (n0 + n1))
                      * (1 - cast(c0 + c1 as double) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))) > 1.959964
             as significant_to_date
    from cum
    where n0 > 0 and n1 > 0
      and c0 + c1 > 0 and c0 + c1 < n0 + n1
    order by d desc limit 15
    """,
)
def events_ab_z_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the experiment z-score TIMELINE — the two-proportion z
    recomputed on the data available through each day (users who had
    entered, conversions that had happened): the peeking curve. Its
    whole point is cautionary — the day the curve first crosses
    ±1.96 is NOT a valid stopping time (repeated looks inflate α;
    the fix is sequential boundaries or the permutation/CUPED
    machinery) — but every experimenter looks, so the platform must
    render the look honestly. Per-user entry/conversion days from
    one collapse; the day grid × users cross join is entity-sized
    per day; all counts exact and the z expression is the shared
    fixed-order form. Degenerate days (no users in an arm, zero or
    saturated conversions) are excluded."""
    e = load(spark, sf_dir, "events")
    users = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias(
            "enter_day"
        ),
        F.date_trunc(
            "day",
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.col("ts")
                )
            ),
        )
        .cast("date")
        .alias("conv_day"),
    )
    days = e.select(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    cum = (
        days.crossJoin(users)
        .groupBy("d")
        .agg(
            F.count(
                F.when(
                    (F.col("variant") == 0)
                    & (F.col("enter_day") <= F.col("d")),
                    1,
                )
            ).alias("n0"),
            F.count(
                F.when(
                    (F.col("variant") == 0)
                    & (F.col("conv_day") <= F.col("d")),
                    1,
                )
            ).alias("c0"),
            F.count(
                F.when(
                    (F.col("variant") == 1)
                    & (F.col("enter_day") <= F.col("d")),
                    1,
                )
            ).alias("n1"),
            F.count(
                F.when(
                    (F.col("variant") == 1)
                    & (F.col("conv_day") <= F.col("d")),
                    1,
                )
            ).alias("c1"),
        )
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    c0 = F.col("c0").cast("double")
    c1 = F.col("c1").cast("double")
    pooled = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / n0 + 1.0 / n1)
    )
    return (
        cum.where(
            (F.col("n0") > 0)
            & (F.col("n1") > 0)
            & (F.col("c0") + F.col("c1") > 0)
            & (F.col("c0") + F.col("c1") < F.col("n0") + F.col("n1"))
        )
        .select(
            F.col("d").alias("day"),
            (F.col("n0") + F.col("n1")).alias("users_entered"),
            F.round(z, 6).alias("z_to_date"),
            (F.abs(z) > 1.959964).alias("significant_to_date"),
        )
        .orderBy(F.col("day").desc())
        .limit(15)
    )


@register(
    "events_ab_lift_ci",
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
    t as (
      select n0, n1,
             cast(x1 as double) / n1 - cast(x0 as double) / n0 as diff,
             sqrt((cast(x0 as double) / n0)
                  * (1 - cast(x0 as double) / n0) / n0
                  + (cast(x1 as double) / n1)
                    * (1 - cast(x1 as double) / n1) / n1) as se
      from w
    )
    select n0 as n_control, n1 as n_treatment,
           round(diff, 6) as lift_abs,
           round(diff - 1.959964 * se, 6) as ci_low,
           round(diff + 1.959964 * se, 6) as ci_high,
           (diff - 1.959964 * se) > 0 or (diff + 1.959964 * se) < 0
             as ci_excludes_zero
    from t
    """,
)
def events_ab_lift_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the Wald 95% confidence interval on the conversion-rate
    difference — the readout decision-makers actually consume
    (a z-score says 'significant'; the interval says HOW MUCH and
    with what uncertainty, and a CI spanning zero but mostly
    positive reads very differently from one centered on zero —
    exactly the nuance a binary verdict destroys). Unpooled SE per
    the interval convention (the z-test pools under H₀ — the two
    deliberately differ); exact counters, fixed-order arithmetic,
    the exclusion flag compares identical doubles. Completes the
    readout family: z (verdict), CI (magnitude), MDE (capability),
    CUPED (precision), SRM/guardrails (validity), timeline
    (honesty)."""
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
    p0 = F.col("x0").cast("double") / F.col("n0")
    p1 = F.col("x1").cast("double") / F.col("n1")
    diff = p1 - p0
    se = F.sqrt(
        p0 * (1 - p0) / F.col("n0") + p1 * (1 - p1) / F.col("n1")
    )
    lo = diff - 1.959964 * se
    hi = diff + 1.959964 * se
    return w.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round(diff, 6).alias("lift_abs"),
        F.round(lo, 6).alias("ci_low"),
        F.round(hi, 6).alias("ci_high"),
        ((lo > 0) | (hi < 0)).alias("ci_excludes_zero"),
    )


@register(
    "orders_interarrival_cv_trend",
    group="F",
    oracle="""
    with gaps as (
      select cast(date_trunc('quarter', o_orderdate) as date) as qtr,
             date_diff('day',
               lag(o_orderdate) over (partition by o_custkey
                 order by o_orderdate, o_orderkey),
               o_orderdate) as g
      from orders
    ),
    q as (
      select qtr,
             cast(count(*) as bigint) as n,
             cast(sum(g) as bigint) as s,
             cast(sum(g * g) as bigint) as sq
      from gaps where g is not null and g > 0
      group by 1 having count(*) >= 30
    )
    select qtr, n as n_gaps,
           round(cast(s as double) / n, 4) as mean_gap_days,
           round(sqrt((cast(sq as double)
                       - n * (cast(s as double) / n)
                         * (cast(s as double) / n)) / (n - 1))
                 / (cast(s as double) / n), 6) as cv
    from q order by qtr
    """,
)
def orders_interarrival_cv_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: demand-regularity trend — the coefficient of variation
    of inter-order gaps per QUARTER (customer_order_gap_regularity
    is the per-customer cross-section; this is the time series:
    a rising CV means demand is getting lumpier, which drives
    safety-stock and staffing models — the operations read of the
    same statistic). Per-quarter (n, Σ, Σ²) exact-int moments over
    lag-window gaps on the custkey shuffle; ≥30-gap floor for
    stable variances; fixed-order CV."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qtr"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("g"),
    ).filter(F.col("g").isNotNull() & (F.col("g") > 0))
    q = (
        gaps.groupBy("qtr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("s"),
            F.sum(F.col("g") * F.col("g")).alias("sq"),
        )
        .filter(F.col("n") >= 30)
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("sq").cast("double") - F.col("n") * mean * mean)
        / (F.col("n") - 1)
    )
    return q.select(
        "qtr",
        F.col("n").alias("n_gaps"),
        F.round(mean, 4).alias("mean_gap_days"),
        F.round(sd / mean, 6).alias("cv"),
    ).orderBy("qtr")


@register(
    "stats_kendall_tau",
    group="J",
    oracle="""
    with cells as (
      select cast(floor(l_quantity + 0.5) as bigint) as q,
             cast(floor(l_discount * 100 + 0.5) as bigint) as d,
             cast(count(*) as bigint) as n
      from lineitem group by 1, 2
    ),
    pairs as (
      select cast(sum(case when a.q < b.q and a.d < b.d
                           then a.n * b.n else 0 end) as bigint) as nc,
             cast(sum(case when a.q < b.q and a.d > b.d
                           then a.n * b.n else 0 end) as bigint) as nd
      from cells a cross join cells b
    ),
    tot as (select cast(sum(n) as bigint) as n from cells),
    tx as (
      select cast(sum(nq * (nq - 1)) as bigint) as t1x2
      from (select q, cast(sum(n) as bigint) as nq from cells group by 1)
    ),
    ty as (
      select cast(sum(nd2 * (nd2 - 1)) as bigint) as t2x2
      from (select d, cast(sum(n) as bigint) as nd2 from cells group by 1)
    )
    select n as n_rows, nc as concordant, nd as discordant,
           round((cast(nc as double) - cast(nd as double))
                 / sqrt((cast(n as double) * (n - 1) / 2
                         - cast(t1x2 as double) / 2)
                        * (cast(n as double) * (n - 1) / 2
                           - cast(t2x2 as double) / 2)), 6) as tau_b
    from pairs, tot, tx, ty
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Kendall's tau-b rank correlation between l_quantity and
    l_discount — the ordinal-association companion to
    stats_spearman_corr (tau is preferred when the marginals are
    heavily tied, exactly this pair: 50 x 11 distinct values). The
    O(n^2) pair count collapses to the CONTINGENCY TABLE: one
    data-sized groupBy to ~550 cells, then a 550x550 broadcast cross
    join counts concordant/discordant mass as exact products of cell
    counts — at 100 TB the cell table is still bounded by the value
    domains, not the row count. Tie corrections from the cell
    margins; everything integer until the single closed-form tau-b
    expression (products ~1e13 are exactly representable doubles)."""
    li = load(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.floor(F.col("l_quantity") + 0.5).alias("q"),
            F.floor(F.col("l_discount") * 100 + 0.5).alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("a.q") < F.col("b.q")) & (F.col("a.d") < F.col("b.d")),
                F.col("a.n") * F.col("b.n"),
            ).otherwise(F.lit(0))
        ).alias("nc"),
        F.sum(
            F.when(
                (F.col("a.q") < F.col("b.q")) & (F.col("a.d") > F.col("b.d")),
                F.col("a.n") * F.col("b.n"),
            ).otherwise(F.lit(0))
        ).alias("nd"),
    )
    tot = cells.agg(F.sum("n").alias("n"))
    tx = (
        cells.groupBy("q")
        .agg(F.sum("n").alias("nq"))
        .agg(F.sum(F.col("nq") * (F.col("nq") - 1)).alias("t1x2"))
    )
    ty = (
        cells.groupBy("d")
        .agg(F.sum("n").alias("nd2"))
        .agg(F.sum(F.col("nd2") * (F.col("nd2") - 1)).alias("t2x2"))
    )
    j = pairs.crossJoin(tot).crossJoin(tx).crossJoin(ty)
    n0 = F.col("n").cast("double") * (F.col("n") - 1) / 2
    denom = F.sqrt(
        (n0 - F.col("t1x2").cast("double") / 2)
        * (n0 - F.col("t2x2").cast("double") / 2)
    )
    return j.select(
        F.col("n").alias("n_rows"),
        F.col("nc").alias("concordant"),
        F.col("nd").alias("discordant"),
        F.round(
            (F.col("nc").cast("double") - F.col("nd").cast("double")) / denom, 6
        ).alias("tau_b"),
    )


@register(
    "stats_levene_bf",
    group="J",
    oracle="""
    with x as (
      select o_orderpriority as grp,
             cast(floor(o_totalprice + 0.5) as bigint) as xi
      from orders
    ),
    med as (
      select grp,
             cast(floor(2 * quantile_cont(xi, 0.5) + 0.5) as bigint) as med2
      from x group by 1
    ),
    z as (
      select x.grp, abs(2 * xi - med2) as z
      from x join med on x.grp = med.grp
    ),
    g as (
      select grp, cast(count(*) as bigint) as nj,
             cast(sum(z) as bigint) as sz,
             cast(sum(z * z) as bigint) as szz
      from z group by 1
    ),
    t as (
      select cast(sum(nj) as bigint) as n,
             cast(count(*) as bigint) as k,
             cast(sum(sz) as bigint) as szt
      from g
    ),
    terms as (
      select cast(sum(cast(floor(nj
                 * (cast(sz as double) / nj - cast(szt as double) / n)
                 * (cast(sz as double) / nj - cast(szt as double) / n)
                 * 1e4 + 0.5) as bigint)) as bigint) as ssb4,
             cast(sum(cast(floor((szz
                 - cast(sz as double) * sz / nj) + 0.5)
                 as bigint)) as bigint) as ssw0,
             any_value(n) as n, any_value(k) as k
      from g, t
    )
    select n as n_rows, k as n_groups,
           round((cast(ssb4 as double) / 1e4 / (k - 1))
                 / (cast(ssw0 as double) / (n - k)), 6) as f_bf
    from terms
    """,
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Brown-Forsythe (median-centered Levene) test of variance
    homogeneity of o_totalprice across the five order priorities —
    the gate before any pooled-variance comparison
    (stats_ttest_welch's diagnostic sibling). Prices quantized to
    integer dollars so group medians interpolate to exact halves
    (carried as 2*median bigint) and the absolute deviations z are
    EXACT integers; per-group moment sums are exact bigints; the two
    sums of squares collapse to per-group closed-form doubles that
    are deci-milli/unit-quantized and integer-summed across the 5
    groups (group iteration order never touches a float
    accumulation). One data-sized pass for medians (5-row broadcast
    back), one for moments."""
    o = load(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") + 0.5).alias("xi"),
    )
    med = x.groupBy("grp").agg(
        F.floor(2 * F.percentile("xi", F.lit(0.5)) + 0.5).alias("med2")
    )
    z = x.join(F.broadcast(med), "grp").select(
        "grp", F.abs(2 * F.col("xi") - F.col("med2")).alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    t = g.agg(
        F.sum("nj").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sz").alias("szt"),
    )
    gt = g.crossJoin(F.broadcast(t))
    dev = (
        F.col("sz").cast("double") / F.col("nj")
        - F.col("szt").cast("double") / F.col("n")
    )
    terms = gt.agg(
        F.sum(F.floor(F.col("nj") * dev * dev * 1e4 + 0.5)).alias("ssb4"),
        F.sum(
            F.floor(
                (
                    F.col("szz")
                    - F.col("sz").cast("double") * F.col("sz") / F.col("nj")
                )
                + 0.5
            )
        ).alias("ssw0"),
        F.first("n").alias("n"),
        F.first("k").alias("k"),
    )
    return terms.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.round(
            (F.col("ssb4").cast("double") / 1e4 / (F.col("k") - 1))
            / (F.col("ssw0").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_bf"),
    )


@register(
    "ts_ljung_box",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(floor(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5)
                  as bigint)) as double) / 1e9 + 0.5) as bigint) as xk
      from orders group by 1
    ),
    r as (
      select xk, row_number() over (order by day) as i from daily
    ),
    nn as (select cast(count(*) as bigint) as n from r),
    lags as (select * from (values (1), (2), (3), (4), (5), (6), (7)) l(lag)),
    pairs as (
      select l.lag, a.xk as x, b.xk as y
      from lags l
      join r a on true
      join r b on b.i = a.i + l.lag
    ),
    m as (
      select lag, cast(count(*) as bigint) as np,
             cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx,
             cast(sum(y * y) as bigint) as syy
      from pairs group by 1
    ),
    rho as (
      select lag,
             (cast(np as double) * sxy - cast(sx as double) * sy)
             / sqrt((cast(np as double) * sxx - cast(sx as double) * sx)
                    * (cast(np as double) * syy - cast(sy as double) * sy))
               as acf
      from m
    ),
    q as (
      select cast(sum(cast(floor(acf * acf
                 / ((select n from nn) - lag) * 1e12 + 0.5) as bigint))
             as bigint) as s12
      from rho
    )
    select (select n from nn) as n_days, 7 as dof,
           round((select n from nn) * ((select n from nn) + 2)
                 * cast(s12 as double) / 1e12, 6) as q_stat
    from q
    """,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: Ljung-Box portmanteau statistic Q = n(n+2) * sum_k
    rho_k^2/(n-k) over lags 1..7 of the daily-revenue series — the
    standard 'is there ANY autocorrelation' white-noise gate that
    turns ts_acf's per-lag correlogram into one decision number
    (compare against chi-square(7)). Reuses ts_acf's construction
    exactly: calendar-sized series, kilodollar-int values, exact
    per-lag moment bigints; each rho_k is a fixed-order IEEE
    expression whose squared/(n-k) term is pico-quantized and
    integer-summed across the 7 lags, so the lag-combination order
    never sums floats."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double")
            / 1e9
            + 0.5
        ).alias("xk")
    )
    r = daily.select(
        "xk", F.row_number().over(W.orderBy("day")).alias("i")
    ).localCheckpoint()
    n_days = r.count()
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a, b = r.alias("a"), r.alias("b")
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .select("lag", F.col("a.xk").alias("x"), F.col("b.xk").alias("y"))
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    npd = F.col("np").cast("double")
    acf = (npd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (npd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (npd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    q = m.select("lag", acf.alias("acf")).agg(
        F.sum(
            F.floor(
                F.col("acf") * F.col("acf") / (F.lit(n_days) - F.col("lag")) * 1e12
                + 0.5
            )
        ).alias("s12")
    )
    return q.select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.lit(7).cast("int").alias("dof"),
        F.round(
            F.lit(n_days) * (F.lit(n_days) + 2) * F.col("s12").cast("double") / 1e12,
            6,
        ).alias("q_stat"),
    )


@register(
    "events_poisson_rate_test",
    group="J",
    oracle="""
    with c as (
      select cast(sum(case when ts < timestamp '2024-01-16'
                           then 1 else 0 end) as bigint) as c1,
             cast(sum(case when ts >= timestamp '2024-01-16'
                           then 1 else 0 end) as bigint) as c2
      from events where event_type = 'purchase'
    )
    select c1 as first_half, c2 as second_half,
           round(cast(c1 as double) / c2, 6) as rate_ratio,
           round((cast(c1 as double) - c2)
                 / sqrt(cast(c1 as double) + c2), 6) as z
    from c
    """,
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: two-sample Poisson rate test on purchase events across
    the two equal 15-day halves of the fixture month — 'did the
    purchase rate change?' as a single score-test z = (c1-c2)/
    sqrt(c1+c2) (the conditional-binomial approximation with equal
    exposure). The counts are one filtered map-combinable aggregation;
    the statistic is a closed-form expression of two exact integers,
    so parity is unconditional. The weekly/monthly re-run of this op
    is the canonical pipeline-health alarm (ingestion rate drop)."""
    e = load(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "purchase").agg(
        F.sum(
            F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1).otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"), 1).otherwise(
                0
            )
        ).alias("c2"),
    )
    c1d = F.col("c1").cast("double")
    c2d = F.col("c2").cast("double")
    return c.select(
        F.col("c1").alias("first_half"),
        F.col("c2").alias("second_half"),
        F.round(c1d / F.col("c2"), 6).alias("rate_ratio"),
        F.round((c1d - F.col("c2")) / F.sqrt(c1d + F.col("c2")), 6).alias("z"),
    )


@register(
    "stats_fdr_bh",
    group="J",
    oracle="""
    with hourly as (
      select cast(date_part('hour', ts) as int) as hour,
             cast(count(*) as bigint) as n,
             cast(sum(case when event_type = 'error' then 1 else 0 end)
                  as bigint) as e
      from events group by 1
    ),
    g0 as (
      select cast(sum(e) as double) / sum(n) as p0 from hourly
    ),
    zt as (
      select hour, n, e,
             (cast(e as double) / n - p0)
               / sqrt(p0 * (1 - p0) / n) as z
      from hourly, g0
    ),
    pv as (
      select hour, n, e, z,
             2 * (exp(-abs(z) * abs(z) / 2) / 2.5066282746310002)
               * ((1 / (1 + 0.2316419 * abs(z)))
                  * (0.319381530 + (1 / (1 + 0.2316419 * abs(z)))
                     * (-0.356563782 + (1 / (1 + 0.2316419 * abs(z)))
                        * (1.781477937 + (1 / (1 + 0.2316419 * abs(z)))
                           * (-1.821255978 + (1 / (1 + 0.2316419 * abs(z)))
                              * 1.330274429))))) as p
      from zt
    ),
    ranked as (
      select hour, n, e, z, p,
             row_number() over (order by p, hour) as rk,
             count(*) over () as m
      from pv
    ),
    cut as (
      select *,
             max(case when p <= rk * 0.05 / m then rk else 0 end)
               over () as rk_max
      from ranked
    )
    select hour, n as n_events, e as n_errors,
           round(z, 6) as z, round(p, 6) as p_value,
           rk <= rk_max as rejected
    from cut order by hour
    """,
)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Benjamini-Hochberg FDR control over a 24-hypothesis
    family — per-hour-of-day error-rate z-tests against the global
    rate, step-up rejection at q=0.05. This is the multiple-testing
    discipline every segment-scan operator in this repo feeds
    (scanning 24 segments at alpha=.05 yields ~1 false alarm per run
    by construction; BH caps the false-discovery RATE instead).
    Counts are exact ints; z is fixed-order IEEE; the normal tail
    probability uses the Abramowitz-Stegun 26.2.17 polynomial written
    in identical Horner order in both engines (exp is the one
    transcendental — a last-ulp divergence would need p within 5e-13
    of a rounding boundary to surface). The step-up cut is a window
    max over rank*indicator — no iteration."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("e"),
    )
    glob = hourly.agg(
        (F.sum("e").cast("double") / F.sum("n")).alias("p0")
    )
    zt = hourly.crossJoin(F.broadcast(glob)).select(
        "hour",
        "n",
        "e",
        (
            (F.col("e").cast("double") / F.col("n") - F.col("p0"))
            / F.sqrt(F.col("p0") * (1 - F.col("p0")) / F.col("n"))
        ).alias("z"),
    )
    az = F.abs(F.col("z"))
    t = 1 / (1 + 0.2316419 * az)
    poly = t * (
        0.319381530
        + t
        * (
            -0.356563782
            + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
        )
    )
    p = 2 * (F.exp(-az * az / 2) / 2.5066282746310002) * poly
    pv = zt.select("hour", "n", "e", "z", p.alias("p"))
    wr = W.orderBy("p", "hour")
    ranked = pv.select(
        "hour",
        "n",
        "e",
        "z",
        "p",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    cut = ranked.withColumn(
        "rk_max",
        F.max(
            F.when(F.col("p") <= F.col("rk") * 0.05 / F.col("m"), F.col("rk")).otherwise(
                0
            )
        ).over(W.partitionBy()),
    )
    return cut.select(
        "hour",
        F.col("n").alias("n_events"),
        F.col("e").alias("n_errors"),
        F.round("z", 6).alias("z"),
        F.round("p", 6).alias("p_value"),
        (F.col("rk") <= F.col("rk_max")).alias("rejected"),
    ).orderBy("hour")


@register(
    "orders_xmr_control_chart",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(floor(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5)
                  as bigint)) as double) / 1e9 + 0.5) as bigint) as xk
      from orders group by 1
    ),
    mr as (
      select day, xk,
             abs(xk - lag(xk) over (order by day)) as r
      from daily
    ),
    lims as (
      select cast(count(*) as bigint) as n_days,
             cast(sum(xk) as bigint) as sx,
             cast(sum(r) as bigint) as sr,
             cast(count(r) as bigint) as nr
      from mr
    ),
    z as (
      select n_days,
             cast(sx as double) / n_days as xbar,
             cast(sr as double) / nr as mrbar
      from lims
    )
    select n_days,
           round(xbar, 6) as mean_k,
           round(mrbar, 6) as mr_mean_k,
           round(xbar + 2.66 * mrbar, 6) as ucl_k,
           round(xbar - 2.66 * mrbar, 6) as lcl_k,
           (select cast(count(*) as bigint) from mr, z
             where xk > xbar + 2.66 * mrbar) as n_above_ucl,
           (select cast(count(*) as bigint) from mr, z
             where xk < xbar - 2.66 * mrbar) as n_below_lcl
    from z
    """,
)
def orders_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: XmR (individuals / moving-range) control chart over the
    daily-revenue series — Shewhart limits xbar ± 2.66*MRbar (the
    2.66 = 3/d2 constant for n=2 subgroups), with counts of
    out-of-control days. This is the SPC monitor a pipeline puts on
    every daily metric: unlike z-score anomaly detection it derives
    its dispersion from CONSECUTIVE differences, so slow drifts don't
    inflate the limits that are supposed to catch them. The series is
    calendar-sized (kilodollar-int, same construction as ts_acf);
    moving ranges are exact ints via one lag window; limits are two
    single-division doubles and the flag counts compare exact ints
    against one deterministic double."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double")
            / 1e9
            + 0.5
        ).alias("xk")
    )
    mr = daily.select(
        "day",
        "xk",
        F.abs(F.col("xk") - F.lag("xk").over(W.orderBy("day"))).alias("r"),
    ).localCheckpoint()
    lims = mr.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("xk").alias("sx"),
        F.sum("r").alias("sr"),
        F.count("r").alias("nr"),
    )
    xbar = F.col("sx").cast("double") / F.col("n_days")
    mrbar = F.col("sr").cast("double") / F.col("nr")
    z = lims.select(
        "n_days", xbar.alias("xbar"), mrbar.alias("mrbar")
    )
    flags = mr.crossJoin(F.broadcast(z)).agg(
        F.sum(
            F.when(F.col("xk") > F.col("xbar") + 2.66 * F.col("mrbar"), 1).otherwise(0)
        ).alias("n_above_ucl"),
        F.sum(
            F.when(F.col("xk") < F.col("xbar") - 2.66 * F.col("mrbar"), 1).otherwise(0)
        ).alias("n_below_lcl"),
    )
    return z.crossJoin(flags).select(
        "n_days",
        F.round(F.col("xbar"), 6).alias("mean_k"),
        F.round(F.col("mrbar"), 6).alias("mr_mean_k"),
        F.round(F.col("xbar") + 2.66 * F.col("mrbar"), 6).alias("ucl_k"),
        F.round(F.col("xbar") - 2.66 * F.col("mrbar"), 6).alias("lcl_k"),
        "n_above_ucl",
        "n_below_lcl",
    )


@register(
    "stats_ols_two_factor",
    group="J",
    oracle="""
    with q as (
      select cast(floor(l_quantity + 0.5) as bigint) as x1,
             cast(floor(l_discount * 100 + 0.5) as bigint) as x2,
             cast(floor(l_extendedprice * 10 + 0.5) as bigint) as y1
      from lineitem
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(x1) as bigint) as s1,
             cast(sum(x2) as bigint) as s2,
             cast(sum(y1) as bigint) as sy,
             cast(sum(x1 * x1) as bigint) as s11,
             cast(sum(x1 * x2) as bigint) as s12,
             cast(sum(x2 * x2) as bigint) as s22,
             cast(sum(x1 * y1) as bigint) as s1y,
             cast(sum(x2 * y1) as bigint) as s2y
      from q
    ),
    c as (
      select n,
             cast(n as double) * s11 - cast(s1 as double) * s1 as a11,
             cast(n as double) * s12 - cast(s1 as double) * s2 as a12,
             cast(n as double) * s22 - cast(s2 as double) * s2 as a22,
             cast(n as double) * s1y - cast(s1 as double) * sy as b1,
             cast(n as double) * s2y - cast(s2 as double) * sy as b2,
             cast(s1 as double) / n as m1,
             cast(s2 as double) / n as m2,
             cast(sy as double) / n as my
      from m
    ),
    sol as (
      select n, m1, m2, my,
             (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) as beta1,
             (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) as beta2
      from c
    )
    select n as n_rows,
           round((my - beta1 * m1 - beta2 * m2) / 10, 6) as intercept,
           round(beta1 / 10, 6) as beta_quantity,
           round(beta2 / 10, 6) as beta_discount_pct
    from sol
    """,
)
def stats_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: two-regressor OLS via the normal equations —
    l_extendedprice ~ quantity + discount, solved in closed form with
    Cramer's rule on the centered 2x2 system (the multi-feature
    sibling of agg_groupwise_ols). One map-combinable moment pass
    (9 exact integer sums — inputs quantized to unit/centi/deci ints
    so every moment is an exact bigint at sf1), then a fixed-order
    IEEE solve; coefficients are de-scaled back to dollars at the
    end. At 100 TB this is THE way to fit small linear models in a
    warehouse: no iteration, no driver data, one shuffle of 9
    numbers."""
    li = load(spark, sf_dir, "lineitem")
    q = li.select(
        F.floor(F.col("l_quantity") + 0.5).alias("x1"),
        F.floor(F.col("l_discount") * 100 + 0.5).alias("x2"),
        F.floor(F.col("l_extendedprice") * 10 + 0.5).alias("y1"),
    )
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y1").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y1")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y1")).alias("s2y"),
    )
    nd = F.col("n").cast("double")
    a11 = nd * F.col("s11") - F.col("s1").cast("double") * F.col("s1")
    a12 = nd * F.col("s12") - F.col("s1").cast("double") * F.col("s2")
    a22 = nd * F.col("s22") - F.col("s2").cast("double") * F.col("s2")
    b1 = nd * F.col("s1y") - F.col("s1").cast("double") * F.col("sy")
    b2 = nd * F.col("s2y") - F.col("s2").cast("double") * F.col("sy")
    det = a11 * a22 - a12 * a12
    beta1 = (b1 * a22 - b2 * a12) / det
    beta2 = (b2 * a11 - b1 * a12) / det
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    return m.select(
        F.col("n").alias("n_rows"),
        F.round((my - beta1 * m1 - beta2 * m2) / 10, 6).alias("intercept"),
        F.round(beta1 / 10, 6).alias("beta_quantity"),
        F.round(beta2 / 10, 6).alias("beta_discount_pct"),
    )


@register(
    "ts_rolling_median_band",
    group="F",
    oracle="""
    with daily as (
      select cast(date_trunc('day', o_orderdate) as date) as day,
             cast(floor(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5)
                  as bigint)) as double) / 1e9 + 0.5) as bigint) as xk
      from orders group by 1
    ),
    med as (
      select day, xk,
             quantile_cont(xk, 0.5) over (order by day
               rows between 6 preceding and current row) as m
      from daily
    )
    select day, xk,
           round(m, 6) as rolling_median_k,
           round((xk - m) / m, 6) as deviation,
           abs(xk - m) > 0.25 * m as is_outlier
    from med order by day
    """,
)
def ts_rolling_median_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-ext: 7-day ROLLING-MEDIAN band over daily revenue with a
    ±25% deviation flag — the robust-filter sibling of
    events_anomaly_zscore (a single spike inflates a rolling mean and
    masks itself; the median band doesn't). Spark has no median
    window function, so the frame's values (integers, ≤7 of them)
    are collect_list'ed, sorted, and midpoint-interpolated — exact
    arithmetic on kilodollar ints that reproduces quantile_cont(0.5)
    bit-for-bit. The series is calendar-sized; the global-order
    window is bounded by the calendar, not the fact table (same
    argument as ts_acf)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double")
            / 1e9
            + 0.5
        ).alias("xk")
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("xk").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    med = daily.select(
        "day", "xk", ((lo + hi) / 2.0).alias("m")
    )
    return med.select(
        "day",
        "xk",
        F.round("m", 6).alias("rolling_median_k"),
        F.round((F.col("xk") - F.col("m")) / F.col("m"), 6).alias("deviation"),
        (F.abs(F.col("xk") - F.col("m")) > 0.25 * F.col("m")).alias(
            "is_outlier"
        ),
    ).orderBy("day")


@register(
    "stats_cohens_d",
    group="E",
    oracle="""
    with j as (
      select c_mktsegment as seg, o_totalprice as x
      from orders join customer on c_custkey = o_custkey
      where c_mktsegment in ('BUILDING', 'MACHINERY')
    ),
    g as (
      select seg, count(*) as n, avg(x) as m, var_samp(x) as v
      from j group by seg
    )
    select a.n as n_building, b.n as n_machinery,
           round(a.m, 2) as mean_building,
           round(b.m, 2) as mean_machinery,
           round((a.m - b.m)
                 / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
                        / (a.n + b.n - 2)), 6) as cohens_d
    from (select * from g where seg = 'BUILDING') a,
         (select * from g where seg = 'MACHINERY') b
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between two customer
    segments' order values — the magnitude companion to the
    significance tests in this family (stats_ttest_welch gives p, this
    gives "does it matter"). Pooled-SD formula with sample variances;
    one broadcast-joined grouped pass over the fact table, two rows of
    state. Variances stay raw doubles (numerically-stable single-pass
    moments in both engines agree to ~1e-10 relative); only the final
    standardized ratio is rounded."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    j = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("x"))
    g = j.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("m"),
        F.var_samp("x").alias("v"),
    )
    a = g.where(F.col("seg") == "BUILDING").alias("a")
    b = g.where(F.col("seg") == "MACHINERY").alias("b")
    pooled = F.sqrt(
        ((F.col("a.n") - 1) * F.col("a.v") + (F.col("b.n") - 1) * F.col("b.v"))
        / (F.col("a.n") + F.col("b.n") - 2)
    )
    # broadcast the 1-row side: an unhinted crossJoin of two scalar
    # frames plans as CartesianProduct, which the plan linter treats
    # as a scale hazard — the hint makes the intent (scalar combine)
    # explicit in the physical plan
    return a.crossJoin(F.broadcast(b)).select(
        F.col("a.n").alias("n_building"),
        F.col("b.n").alias("n_machinery"),
        F.round(F.col("a.m"), 2).alias("mean_building"),
        F.round(F.col("b.m"), 2).alias("mean_machinery"),
        F.round((F.col("a.m") - F.col("b.m")) / pooled, 6).alias("cohens_d"),
    )


@register(
    "stats_iv_wald",
    group="E",
    oracle="""
    with j as (
      select cast(p_size as double) as z,
             l_extendedprice / l_quantity as x,
             l_quantity as y
      from lineitem join part on p_partkey = l_partkey
    )
    select count(*) as n,
           round(covar_samp(z, y) / covar_samp(z, x), 6) as iv_wald_slope,
           round(covar_samp(x, y) / var_samp(x), 6) as ols_slope,
           round(corr(z, x), 6) as instrument_strength
    from j
    """,
)
def stats_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable estimation, Wald form (textbook
    econometrics, public): when price and quantity are simultaneously
    determined, the OLS slope is biased; an instrument z that shifts
    price but not demand directly identifies the causal slope as
    cov(z,y)/cov(z,x). Here z = part size (a cost shifter), x = unit
    price, y = quantity. Emits the IV slope, the naive OLS slope for
    contrast, and the first-stage correlation (instrument strength —
    the weak-instrument diagnostic). One joined pass of second-moment
    aggregates — all map-side combinable; the broadcast side is the
    part dim. Covariances are numerically-stable one-pass moments in
    both engines (~1e-10 relative agreement), rounded at 6."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_size").cast("double").alias("z"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
        F.col("l_quantity").alias("y"),
    )
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.covar_samp("z", "y") / F.covar_samp("z", "x"), 6).alias(
            "iv_wald_slope"
        ),
        F.round(F.covar_samp("x", "y") / F.var_samp("x"), 6).alias("ols_slope"),
        F.round(F.corr("z", "x"), 6).alias("instrument_strength"),
    )


@register(
    "stats_did_estimate",
    group="E",
    oracle="""
    with j as (
      select cast(c_mktsegment = 'BUILDING' as integer) as treated,
             cast(o_orderdate >= timestamp '1996-01-01' as integer) as post,
             o_totalprice as y
      from orders join customer on c_custkey = o_custkey
      where c_mktsegment in ('BUILDING', 'MACHINERY')
    ),
    cells as (
      select treated, post, count(*) as n,
             round(cast(sum(cast(floor(y * 1e6 + 0.5) as bigint)) as double)
                   / count(y) / 1e6, 6) as m
      from j group by treated, post
    )
    select round(t1.m - t0.m - (c1.m - c0.m), 4) as did_estimate,
           round(t1.m - t0.m, 4) as treated_delta,
           round(c1.m - c0.m, 4) as control_delta,
           t0.n as n_treat_pre, t1.n as n_treat_post,
           c0.n as n_ctrl_pre, c1.n as n_ctrl_post
    from (select * from cells where treated = 1 and post = 0) t0,
         (select * from cells where treated = 1 and post = 1) t1,
         (select * from cells where treated = 0 and post = 0) c0,
         (select * from cells where treated = 0 and post = 1) c1
    """,
)
def stats_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (canonical 2×2 design, public
    econometrics): treated = BUILDING-segment customers, control =
    MACHINERY, pre/post split at 1996-01-01; the DiD estimate
    (ΔT − ΔC) removes both the level difference between groups and the
    common time trend. One grouped pass produces the four cell means
    (exact micro-unit sums → identical doubles), then scalar algebra.
    The parallel-trends assumption is the analyst's to defend; the
    per-cell Ns are emitted for the power check."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("treated"),
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .cast("int")
        .alias("post"),
        F.col("o_totalprice").alias("y"),
    )
    cells = j.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), davg("y").alias("m")
    )

    def cell(tr, po, alias):
        return (
            cells.where((F.col("treated") == tr) & (F.col("post") == po))
            .select(F.col("n").alias(f"n_{alias}"), F.col("m").alias(f"m_{alias}"))
        )

    # broadcast-hint the scalar cells: unhinted crossJoins of 1-row
    # frames plan as CartesianProduct (see stats_cohens_d)
    wide = (
        cell(1, 0, "t0")
        .crossJoin(F.broadcast(cell(1, 1, "t1")))
        .crossJoin(F.broadcast(cell(0, 0, "c0")))
        .crossJoin(F.broadcast(cell(0, 1, "c1")))
    )
    return wide.select(
        F.round(
            F.col("m_t1") - F.col("m_t0") - (F.col("m_c1") - F.col("m_c0")), 4
        ).alias("did_estimate"),
        F.round(F.col("m_t1") - F.col("m_t0"), 4).alias("treated_delta"),
        F.round(F.col("m_c1") - F.col("m_c0"), 4).alias("control_delta"),
        F.col("n_t0").alias("n_treat_pre"),
        F.col("n_t1").alias("n_treat_post"),
        F.col("n_c0").alias("n_ctrl_pre"),
        F.col("n_c1").alias("n_ctrl_post"),
    )


@register(
    "stats_negbin_moments",
    group="E",
    oracle="""
    with per_cust as (
      select c_mktsegment as seg, c_custkey, count(o_orderkey) as k
      from customer left join orders on o_custkey = c_custkey
      group by c_mktsegment, c_custkey
    ),
    mom as (
      select seg, count(*) as n_customers,
             avg(k) as m, var_samp(k) as v
      from per_cust group by seg
    )
    select seg, n_customers,
           round(m, 6) as mean_orders,
           round(v, 6) as var_orders,
           round(case when v > m then m * m / (v - m) end, 4) as nb_r,
           round(case when v > m then m / v end, 6) as nb_p,
           cast(v > m as integer) as overdispersed
    from mom
    """,
)
def stats_negbin_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit by method of moments (textbook count-data
    modeling, public): per-customer order counts per segment give mean
    m and variance v; overdispersion (v > m) rejects Poisson and
    identifies NB parameters r = m²/(v−m), p = m/v — the distribution
    a demand model samples from. The left join keeps zero-order
    customers (the zeros ARE the dispersion signal). Two grouped
    passes, both map-combinable; counts are integers so the moments
    agree across engines to ~1e-12, rounded past it."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(F.count("o_orderkey").alias("k"))
    )
    mom = per_cust.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.avg("k").alias("m"),
        F.var_samp("k").alias("v"),
    )
    over = F.col("v") > F.col("m")
    return mom.select(
        "seg",
        "n_customers",
        F.round("m", 6).alias("mean_orders"),
        F.round("v", 6).alias("var_orders"),
        F.round(
            F.when(over, F.col("m") * F.col("m") / (F.col("v") - F.col("m"))), 4
        ).alias("nb_r"),
        F.round(F.when(over, F.col("m") / F.col("v")), 6).alias("nb_p"),
        over.cast("int").alias("overdispersed"),
    )


@register(
    "events_anomaly_mad",
    group="J",
    oracle="""
    with med as (
      select event_type, round(quantile_cont(value, 0.5), 6) as med
      from events group by 1
    ),
    mad as (
      select e.event_type, m.med,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) as mad
      from events e join med m using (event_type)
      group by 1, 2
    )
    select e.event_type,
           cast(count(*) as bigint) as n_events,
           m.med, m.mad,
           cast(count(*) filter (
             where m.mad > 0
               and round(abs(e.value - m.med) / (1.4826 * m.mad), 4) > 3.5)
             as bigint) as n_outliers,
           round(count(*) filter (
             where m.mad > 0
               and round(abs(e.value - m.med) / (1.4826 * m.mad), 4) > 3.5)
             * 1.0 / count(*), 6) as outlier_rate
    from events e join mad m using (event_type)
    group by 1, 3, 4
    order by 1
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: robust outlier detection via the MAD rule — per event
    type, flag values whose MODIFIED Z-SCORE |x − median| / (1.4826 ·
    MAD) exceeds 3.5 (Iglewicz & Hoaglin's classic cutoff). Unlike the
    3σ rule, median/MAD have a 50% breakdown point, so the anomalies
    themselves cannot drag the threshold — the property that matters
    when profiling a 100 TB event stream whose tail is exactly what
    you're hunting.

    Cross-engine hardening: the two location estimates are exact
    interpolated percentiles ROUNDED to 6 decimals before the z
    arithmetic (both engines derive z from the identical shared
    values), and the cutoff compares round(z, 4) so a last-ulp
    interpolation difference cannot flip boundary membership. Plan:
    two aggregation passes with the 5-row estimate frames broadcast
    back — the standard fit-then-transform shape, no sort of the fact
    table."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type", "med").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    z = F.round(
        F.abs(F.col("value") - F.col("med")) / (1.4826 * F.col("mad")), 4
    )
    # mad = 0 guard (ADVICE r2): a degenerate group whose values all
    # equal the median would otherwise divide by zero and lean on
    # cross-engine Inf/NaN comparison semantics; gate the cutoff on
    # mad > 0 in BOTH engines so such groups deterministically report
    # 0 outliers.
    is_out = (F.col("mad") > 0) & (z > 3.5)
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.round(
                F.sum(is_out.cast("long")) * 1.0 / F.count(F.lit(1)), 6
            ).alias("outlier_rate"),
        )
        .select(
            "event_type", "n_events", "med", "mad", "n_outliers", "outlier_rate"
        )
        .orderBy("event_type")
    )
