"""Group K — the UDF/UDAF/UDTF surface (SURVEY.md §2.K).

These exist to prove the Python extension points, NOT as the preferred
path: every K operator has a pure-SQL oracle twin, and the engine's own
operators use built-in expressions wherever possible (UDFs block
predicate pushdown and whole-stage codegen; pandas UDFs amortize the
boundary via Arrow but still cost a serialization round trip).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import SUM_D, register


@register(
    "udf_python_scalar",
    group="K",
    oracle="""
    select doc_id,
           trim(lower(regexp_replace(text, ' +', ' ', 'g'))) as norm_text
    from documents where doc_id < 100
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: row-at-a-time Python UDF (text normalizer) — the slow path,
    bounded to 100 rows on purpose; K2 shows the vectorized form."""

    @F.udf(T.StringType())
    def normalize(s: str) -> str:
        return " ".join(s.lower().split())

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select("doc_id", normalize("text").alias("norm_text"))


@register(
    "udf_pandas_scalar",
    group="K",
    oracle="""
    with q as (select embedding as e from embeddings where vec_id = 0)
    select vec_id,
           round(list_aggregate(list_transform(
                 list_zip(embedding, (select e from q)),
                 p -> cast(p[1] as double) * cast(p[2] as double)), 'sum'), 6)
               as sim
    from embeddings
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: vectorized Series→Series pandas UDF (Arrow batches) computing
    the dot product against a broadcast query vector with numpy."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    q_vec = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q = spark.sparkContext.broadcast(np.asarray(q_vec, dtype=np.float64))

    @F.pandas_udf(T.DoubleType())
    def dot_q(col: pd.Series) -> pd.Series:
        m = np.stack(col.map(lambda v: np.asarray(v, dtype=np.float64)))
        return pd.Series(np.round(m @ q.value, 6))

    return e.select("vec_id", dot_q("embedding").alias("sim"))


@register(
    "udaf_pandas_grouped_agg",
    group="K",
    oracle="""
    select l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
               as weighted_avg_price
    from lineitem group by l_returnflag
    """,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: grouped-agg pandas UDF — quantity-weighted mean price. The
    double ratio is ~1e4 with ~1e-10 accumulated error → round(6) is
    far outside the noise."""

    @F.pandas_udf(T.DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 6).alias(
            "weighted_avg_price"
        )
    )


@register(
    "udtf_grouped_map",
    group="K",
    oracle="""
    select c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) over (partition by c_mktsegment))
                 / stddev_samp(c_acctbal) over (partition by c_mktsegment),
                 6) as zscore
    from customer
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: grouped-map applyInPandas — per-segment z-score normalization
    (whole group as one pandas frame in, frame out)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        pdf = pdf[["c_custkey", "c_mktsegment"]].copy()
        pdf["zscore"] = ((bal - bal.mean()) / bal.std(ddof=1)).round(6)
        return pdf

    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, c_mktsegment string, zscore double"
    )


@register(
    "udtf_arrow_table",
    group="K",
    oracle="""
    select distinct r_regionkey, substring(r_name, i, 1) as ch
    from (select r_regionkey, r_name,
                 unnest(range(1, length(r_name) + 1)) as i
          from region)
    """,
)
def udtf_arrow_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: mapInArrow — zero-copy RecordBatch in/out (row-expanding:
    each region emits one row per distinct name char). Rows-only:
    exercises the raw Arrow extension point."""
    import pyarrow as pa

    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")

    out_schema = pa.schema(
        [("r_regionkey", pa.int32()), ("ch", pa.string())]
    )

    def expand(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            keys, chars = [], []
            for key, name in zip(
                batch.column("r_regionkey").to_pylist(),
                batch.column("r_name").to_pylist(),
            ):
                for ch in sorted(set(name)):
                    keys.append(key)
                    chars.append(ch)
            yield pa.RecordBatch.from_pydict(
                {"r_regionkey": keys, "ch": chars}, schema=out_schema
            )

    return r.mapInArrow(expand, schema="r_regionkey int, ch string").orderBy(
        "r_regionkey", "ch"
    )


@register(
    "udtf_python_lateral",
    group="K",
    oracle="""
    select doc_id,
           tok || ' ' || lead(tok) over (partition by doc_id order by pos) as bigram,
           pos
    from (select doc_id,
                 unnest(range(len(string_split(text, ' ')))) as pos,
                 unnest(string_split(text, ' ')) as tok
          from documents where doc_id < 20) flat
    qualify bigram is not null
    """,
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: a real Spark 4 Python UDTF (`@F.udtf`) applied laterally —
    one input row expands to a variable number of output rows (here:
    bigrams with positions), the table-function analogue of explode but
    with arbitrary Python per row. Registered + invoked through
    `spark.sql` with a LATERAL join, which is the UDTF's native call
    syntax. Deterministic output → full DuckDB oracle via
    generate_series lateral. The 20-doc slice keeps the Python-boundary
    cost honest in bench terms; the scale path for this exact job is
    the pure-SQL transform/sequence formulation in text_ngrams — UDTFs
    are for logic SQL lambdas cannot express."""

    @F.udtf(returnType="bigram string, pos bigint")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1], i)

    spark.udtf.register("bigrams_udtf", Bigrams)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        select d.doc_id, g.bigram, g.pos
        from documents_v d, lateral bigrams_udtf(d.text) g
        where d.doc_id < 20
        """
    )


@register(
    "udf_arrow_python_scalar",
    group="K",
    oracle="""
    select doc_id, upper(trim(lang)) || ':' || cast(n_chars as varchar) as tag
    from documents where doc_id < 100
    """,
)
def udf_arrow_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: Spark 4 Arrow-optimized Python UDF (`useArrow=True`) — the
    row-at-a-time UDF API with pandas-UDF transport underneath: batches
    cross the JVM↔Python boundary as Arrow instead of pickled rows
    (~an order of magnitude less serialization cost) while keeping the
    simple per-value function signature. The middle rung of the ladder
    row-UDF → arrow-UDF → pandas-UDF; same oracle expression as the
    equivalent built-in composition."""

    @F.udf(returnType="string", useArrow=True)
    def tag(lang: str, n_chars: int) -> str:
        return f"{lang.strip().upper()}:{n_chars}"

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select("doc_id", tag("lang", "n_chars").alias("tag"))


@register(
    "udtf_dynamic_schema",
    group="K",
    oracle="""
    select doc_id,
           string_split(text, ' ')[1] as tok0,
           string_split(text, ' ')[2] as tok1,
           string_split(text, ' ')[3] as tok2
    from documents where doc_id < 30
    """,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: Spark 4 UDTF with a static analyze() method — the output
    SCHEMA is computed at plan time from the (constant) argument: here
    first_tokens(text, 3) analyzes to three string columns tok0..tok2.
    This is the polymorphic-table-function feature (SQL:2016 PTF) that
    fixed-signature UDTFs can't express; with the width constant at the
    call site the result is deterministic and fully oracle-checkable."""
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @F.udtf
    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [StructField(f"tok{i}", StringType()) for i in range(n.value)]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("first_tokens", FirstTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_dyn")
    return spark.sql(
        """
        select d.doc_id, f.tok0, f.tok1, f.tok2
        from documents_dyn d, lateral first_tokens(d.text, 3) f
        where d.doc_id < 30
        """
    )


@register(
    "sql_udf_scalar",
    group="K",
    oracle=f"""
    select l_returnflag,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} as net_revenue,
           count(*) as n_lines
    from lineitem
    where l_quantity >= 25
    group by l_returnflag
    """,
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: SQL-defined scalar function (CREATE FUNCTION ... RETURN
    expr, new in Spark 4) — the declarative cousin of the Python UDF
    surface: the body is a SQL expression, so Catalyst INLINES it into
    the calling plan (no Python worker, no codegen boundary, full
    pushdown through it), which is why the micro-unit revenue sum
    below still plans as a plain columnar aggregate. The same
    definition is what a warehouse migrates instead of a UDF jar."""
    spark.sql(
        """
        create or replace temporary function dlc_net_price(p double, d double)
        returns double return p * (1 - d)
        """
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        select l_returnflag,
               cast(sum(floor(dlc_net_price(l_extendedprice, l_discount)
                              * 1e6 + 0.5)) as bigint) as rev_micro,
               count(*) as n_lines
        from lineitem_v
        where l_quantity >= 25
        group by l_returnflag
        """
    ).selectExpr(
        "l_returnflag",
        "cast(rev_micro as double) / 1e6 as net_revenue",
        "n_lines",
    )


@register(
    "udaf_arrow_grouped",
    group="K",
    oracle="""
    select l_returnflag,
           count(*) as n_rows,
           round(cast(sum(cast(floor(l_extendedprice * 1e6 + 0.5) as bigint))
                      as double) / 1e6 / count(*), 6) as mean_price,
           round(max(l_extendedprice) - min(l_extendedprice), 6)
             as price_range
    from lineitem group by l_returnflag
    """,
)
def udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: grouped Arrow UDF (``applyInArrow``, Spark 4) — the
    zero-copy sibling of applyInPandas: each group arrives as a
    pyarrow.Table (no pandas conversion, no per-row Python), and the
    function returns a Table. Inside, the aggregation uses pyarrow's
    vectorized compute kernels; the micro-unit mean reproduces the
    engine's exact-sum policy in Arrow (floor(x·1e6+0.5) summed as
    int64) so the result hash-matches the SQL oracle. This is the
    boundary to pick when a custom per-group algorithm needs columnar
    speed but can't be expressed in Spark SQL — state-of-the-art for
    the K-group's "custom code at scale" promise; groups stream
    through workers one Arrow batch at a time, so memory is bounded
    by the largest group, not the partition."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(table: pa.Table) -> pa.Table:
        price = table.column("l_extendedprice")
        micro = pc.floor(pc.add(pc.multiply(price, pa.scalar(1e6)), pa.scalar(0.5)))
        total = pc.sum(pc.cast(micro, pa.int64())).as_py()
        n = table.num_rows
        mean = round(total / 1e6 / n, 6)
        rng = round(
            pc.max(price).as_py() - pc.min(price).as_py(), 6
        )
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n_rows": pa.array([n], pa.int64()),
                "mean_price": pa.array([mean], pa.float64()),
                "price_range": pa.array([rng], pa.float64()),
            }
        )

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInArrow(
        summarize,
        schema="l_returnflag string, n_rows bigint, mean_price double, "
        "price_range double",
    )


@register(
    "udf_pandas_struct_metrics",
    group="K",
    oracle="""
    select doc_id,
           cast(length(text) as bigint) as n_chars,
           cast(len(string_split(text, ' ')) as bigint) as n_tokens,
           round(cast(length(text) as double)
                 / len(string_split(text, ' ')), 6) as avg_token_len,
           cast(length(text) - length(replace(text, 'e', '')) as bigint)
             as n_e
    from documents where doc_id < 100
    """,
)
def udf_pandas_struct_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: struct-RETURNING vectorized pandas UDF — one Arrow
    round-trip computes four text metrics and ships them back as a
    single StructType column that is then flattened. This is the
    pattern for feature-extraction UDFs at 100 TB: N metrics per
    document must not mean N Python round-trips; batch once, return a
    struct, let Spark project fields. Metrics chosen to be
    SQL-checkable (char count, token count, mean token length,
    letter-frequency count) so the Arrow path itself is what's under
    test; integer metrics are exact, the one ratio is round-6."""
    import numpy as np

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)

    out_t = T.StructType(
        [
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("avg_token_len", T.DoubleType()),
            T.StructField("n_e", T.LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def metrics(text: pd.Series) -> pd.DataFrame:
        n_chars = text.str.len().astype("int64")
        n_tokens = text.str.split(" ").str.len().astype("int64")
        avg = np.round(n_chars.to_numpy() / n_tokens.to_numpy(), 6)
        n_e = text.str.count("e").astype("int64")
        return pd.DataFrame(
            {
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "avg_token_len": avg,
                "n_e": n_e,
            }
        )

    return d.select("doc_id", metrics("text").alias("m")).select(
        "doc_id", "m.n_chars", "m.n_tokens", "m.avg_token_len", "m.n_e"
    )


@register(
    "ts_holt_forecast",
    group="F",
    oracle="""
    with recursive wk as (
      select row_number() over (order by w) as i, w as wk, revenue from (
        select cast(date_trunc('week', o_orderdate) as date) as w,
               cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))
                    as double) / 100 as revenue
        from orders group by 1)
    ),
    rec as (
      select 1 as i, wk, revenue as actual,
             cast(null as double) as fitted,
             revenue as level,
             (select revenue from wk where i = 2) - revenue as trend
      from wk where i = 1
      union all
      select w.i, w.wk, w.revenue,
             r.level + r.trend,
             0.3 * w.revenue + 0.7 * (r.level + r.trend),
             0.1 * ((0.3 * w.revenue + 0.7 * (r.level + r.trend)) - r.level)
               + 0.9 * r.trend
      from rec r join wk w on w.i = r.i + 1
    )
    select wk,
           floor(actual * 1e4 + 0.5) / 1e4 as actual,
           floor(fitted * 1e4 + 0.5) / 1e4 as fitted,
           floor(level * 1e4 + 0.5) / 1e4 as level,
           floor(trend * 1e4 + 0.5) / 1e4 as trend
    from rec
    """,
)
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (public textbook
    method; α=0.3, β=0.1) over the weekly revenue series — the
    two-state recurrence lₜ = αxₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁ is inherently sequential, so it runs
    as a grouped-map applyInPandas over the (tiny, pre-aggregated)
    series — the distributed shape is one group per series key: a
    fleet of independent recurrences, each over at most a few thousand
    points, parallel across millions of series at 100 TB while the
    data-sized work (the weekly rollup) stays in codegen'd SQL.
    Rows-only: the recurrence is not ANSI-SQL-expressible without
    recursive CTEs; tests/test_pipeline_semantics.py re-runs the
    recurrence in plain Python against this output."""
    o = load(spark, sf_dir, "orders")
    # exact integer-cent sum -> identical double in both engines (the
    # recurrence then runs the SAME IEEE expression tree on both sides,
    # so even a sequential algorithm is hash-checkable)
    weekly = (
        o.groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("wk"))
        .agg(
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("double") / 100)
            .alias("revenue")
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("wk", T.DateType()),
            T.StructField("actual", T.DoubleType()),
            T.StructField("fitted", T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
        ]
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("wk").reset_index(drop=True)
        x = pdf["revenue"].to_numpy()
        n = len(x)
        alpha, beta = 0.3, 0.1
        level = [0.0] * n
        trend = [0.0] * n
        fitted = [float("nan")] * n
        if n:
            level[0] = x[0]
            trend[0] = x[1] - x[0] if n > 1 else 0.0
        for t in range(1, n):
            prev = level[t - 1] + trend[t - 1]
            fitted[t] = prev
            level[t] = alpha * x[t] + (1 - alpha) * prev
            trend[t] = beta * (level[t] - level[t - 1]) + (1 - beta) * trend[t - 1]
        def r4(v):  # half-up via the same floor(x*1e4+0.5)/1e4 as the oracle
            import math as _m

            return (
                float("nan")
                if _m.isnan(v)
                else _m.floor(v * 1e4 + 0.5) / 1e4
            )

        return pd.DataFrame(
            {
                "wk": pdf["wk"],
                "actual": [r4(float(v)) for v in x],
                "fitted": [r4(float(v)) for v in fitted],
                "level": [r4(float(v)) for v in level],
                "trend": [r4(float(v)) for v in trend],
            }
        )

    return (
        weekly.withColumn("series", F.lit(1))
        .groupBy("series")
        .applyInPandas(holt, out_schema)
    )


@register(
    "ts_holt_winters_seasonal",
    group="F",
    oracle="""
    with recursive mth as (
      select row_number() over (order by m) as i, m as mth,
             cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))
                  as double) as cents
      from (select cast(date_trunc('month', o_orderdate) as date) as m,
                   o_totalprice from orders)
      group by m
    ),
    init as (
      select (select sum(cents) from mth where i <= 12) / 12 as base,
             ((select sum(cents) from mth where i between 13 and 24) / 12
              - (select sum(cents) from mth where i <= 12) / 12) / 12 as trend0
    ),
    seas0 as (
      select list(cents - (select base from init) order by i) as seas
      from mth where i <= 12
    ),
    rec as (
      select 0 as i, cast(null as date) as mth,
             cast(null as double) as cents,
             cast(null as double) as fitted,
             (select base from init) as level,
             (select trend0 from init) as trend,
             (select seas from seas0) as seas
      union all
      select w.i, w.mth, w.cents,
             r.level + r.trend + r.seas[(r.i % 12) + 1],
             (0.3 * (w.cents - r.seas[(r.i % 12) + 1]) + 0.7 * (r.level + r.trend)),
             0.05 * ((0.3 * (w.cents - r.seas[(r.i % 12) + 1]) + 0.7 * (r.level + r.trend)) - r.level) + 0.95 * r.trend,
             list_transform(range(1, 13), j ->
               case when j = (r.i % 12) + 1
                 then 0.2 * (w.cents - (0.3 * (w.cents - r.seas[(r.i % 12) + 1]) + 0.7 * (r.level + r.trend)))
                      + 0.8 * r.seas[(r.i % 12) + 1]
                 else r.seas[j] end)
      from rec r join mth w on w.i = r.i + 1
    )
    select mth,
           floor((cents / 100) * 1e4 + 0.5) / 1e4 as actual,
           floor((fitted / 100) * 1e4 + 0.5) / 1e4 as fitted,
           floor((level / 100) * 1e4 + 0.5) / 1e4 as level,
           floor((trend / 100) * 1e4 + 0.5) / 1e4 as trend,
           floor((seas[((i - 1) % 12) + 1] / 100) * 1e4 + 0.5) / 1e4 as seasonal
    from rec where i >= 1
    """,
)
def ts_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + seasonal, public textbook
    method; α=0.3, β=0.05, γ=0.2, period m=12) over the monthly revenue
    series. Seasonal indices are initialized from the first year's
    deviations-from-mean; the three-state recurrence then runs
    sequentially inside one grouped-map applyInPandas — same
    distributed shape as ts_holt_forecast: the heavy rollup is
    codegen'd SQL, the recurrence is O(#months) per series, parallel
    across series keys at scale. Rows-only (recursive — not
    ANSI-expressible); tests/test_pipeline_semantics.py replays the
    recurrence in plain Python."""
    o = load(spark, sf_dir, "orders")
    # integer-cent monthly sums: exact in both engines, so the whole
    # three-state recurrence runs the same IEEE expression tree on both
    # sides and hash-matches (same discipline as ts_holt_forecast)
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("mth"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("cents")
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("mth", T.DateType()),
            T.StructField("actual", T.DoubleType()),
            T.StructField("fitted", T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("seasonal", T.DoubleType()),
        ]
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        import math as _m

        def r4d(v):  # cents -> dollars, half-up at 4 decimals (oracle-identical)
            return _m.floor((v / 100) * 1e4 + 0.5) / 1e4

        pdf = pdf.sort_values("mth").reset_index(drop=True)
        x = pdf["cents"].to_numpy()
        n, m = len(x), 12
        alpha, beta, gamma = 0.3, 0.05, 0.2
        if n < 2 * m:  # not enough history: emit empty frame, stable schema
            return pd.DataFrame(
                {c: pd.Series(dtype="float64") for c in
                 ["actual", "fitted", "level", "trend", "seasonal"]}
            ).assign(mth=pd.Series(dtype="datetime64[ns]"))[
                ["mth", "actual", "fitted", "level", "trend", "seasonal"]
            ]
        base = float(x[:m].sum()) / m
        seas = [float(v) - base for v in x[:m]]
        level = base
        trend = (float(x[m:2 * m].sum()) / m - base) / m
        rows = []
        for t in range(n):
            s = seas[t % m]
            fitted = level + trend + s
            new_level = alpha * (x[t] - s) + (1 - alpha) * (level + trend)
            new_trend = beta * (new_level - level) + (1 - beta) * trend
            seas[t % m] = gamma * (x[t] - new_level) + (1 - gamma) * s
            rows.append(
                (pdf["mth"][t], r4d(float(x[t])), r4d(fitted),
                 r4d(new_level), r4d(new_trend), r4d(seas[t % m]))
            )
            level, trend = new_level, new_trend
        return pd.DataFrame(
            rows, columns=["mth", "actual", "fitted", "level", "trend", "seasonal"]
        )

    return (
        monthly.withColumn("series", F.lit(1))
        .groupBy("series")
        .applyInPandas(hw, out_schema)
    )


@register(
    "udf_pandas_iterator",
    group="K",
    oracle="""
    select o_orderkey,
           round((o_totalprice - 150000.0) / 75000.0, 6) as price_z
    from orders where o_orderkey < 2000
    """,
)
def udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: ITERATOR-of-Series pandas UDF (SCALAR_ITER) — the Arrow
    variant for UDFs with expensive one-time state: the generator
    body runs ONCE per Python worker, so model loading / dictionary
    building happens once per partition stream instead of once per
    batch (the plain Series→Series form re-enters the function every
    ~10k rows). Here the 'state' is just the standardization
    constants, kept deliberately deterministic so the DuckDB oracle
    is a closed-form expression — the point under test is the
    iterator protocol: batches must stream through one at a time
    (constant memory) and preserve order/length exactly."""

    @F.pandas_udf(T.DoubleType())
    def z(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mu, sigma = 150000.0, 75000.0  # once-per-worker init point
        for s in batches:
            yield ((s - mu) / sigma).round(6)

    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select("o_orderkey", z("o_totalprice").alias("price_z"))


def _lev(a: str, b: str) -> int:
    """One-row-DP Levenshtein, O(|a|·|b|) ints — bit-exact vs any
    correct implementation (pinned against DuckDB's native
    levenshtein on an adversarial corpus in
    test_python_levenshtein_matches_duckdb)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _lev_batch(a_list, b_list) -> "np.ndarray":
    """Levenshtein over MANY pairs at once: the same one-row DP as
    _lev, but the innermost min() runs element-wise across the whole
    Arrow batch (numpy int32 lanes) instead of once per pair in
    Python bytecode — the DP loop is max_len² iterations of O(batch)
    vector ops, not Σ|a|·|b| interpreted steps (~50× on 18-char TPC-H
    names). Identical answers by construction: per-pair garbage lanes
    past a string's own length never flow leftward in the row DP, and
    each pair's final row is snapshotted at i == len(a). Pinned
    against _lev (itself pinned against DuckDB's native levenshtein)
    in test_lev_batch_matches_scalar."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(x) for x in a_list), dtype=np.int32, count=n)
    lb = np.fromiter((len(y) for y in b_list), dtype=np.int32, count=n)
    ml_a, ml_b = max(int(la.max()), 1), max(int(lb.max()), 1)
    # numpy's fixed-width unicode dtype IS a padded code-point matrix:
    # view as uint32 lanes, zero-padded past each string's end.
    A = (
        np.array(a_list, dtype=f"U{ml_a}")
        .view(np.uint32)
        .reshape(n, ml_a)
        .astype(np.int32)
    )
    B = (
        np.array(b_list, dtype=f"U{ml_b}")
        .view(np.uint32)
        .reshape(n, ml_b)
        .astype(np.int32)
    )
    prev = np.broadcast_to(
        np.arange(ml_b + 1, dtype=np.int32), (n, ml_b + 1)
    ).copy()
    final = prev.copy()  # pairs with len(a) == 0 end on row 0
    cur = np.empty_like(prev)
    for i in range(1, ml_a + 1):
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, ml_b + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            np.minimum(sub, prev[:, j] + 1, out=sub)
            np.minimum(sub, cur[:, j - 1] + 1, out=sub)
            cur[:, j] = sub
        done = la == i
        if done.any():
            final[done] = cur[done]
        prev, cur = cur, prev
    return final[np.arange(n), lb].astype(np.int64)


@register(
    "udf_edit_similarity_linkage",
    group="K",
    oracle="""
    with best as (
      select c.c_custkey, c.c_name, s.s_name,
             1.0 - cast(levenshtein(c.c_name, s.s_name) as double)
                   / greatest(len(c.c_name), len(s.s_name)) as sim,
             row_number() over (
               partition by c.c_custkey
               order by 1.0 - cast(levenshtein(c.c_name, s.s_name) as double)
                              / greatest(len(c.c_name), len(s.s_name)) desc,
                        s.s_suppkey
             ) as rn
      from customer c
      join supplier s on s.s_nationkey = c.c_nationkey
    )
    select c_custkey, c_name, s_name as best_s_name,
           round(sim, 6) as sim_best
    from best where rn = 1
    """,
)
def udf_edit_similarity_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ext: fuzzy record linkage scored by a PYTHON-IMPLEMENTED
    Levenshtein DP inside an Arrow-batched pandas UDF, verified
    value-for-value against DuckDB's NATIVE levenshtein — an
    independent C++ implementation of the same exact integer metric,
    so the oracle checks the UDF's string algorithm, not an SQL
    restatement of it. (This op replaced a Jaro-Winkler-scored
    variant: JW's greedy match alignment tie-breaks differently
    across implementations on repeated characters — VERDICT r2
    What's-wrong §3 — so the two engines were provably NOT twins;
    edit distance is alignment-free and has one exact answer.)
    Similarity = 1 − lev/max(|a|,|b|): a rational with denominator
    ≤ max name length (~25), so distinct scores differ by ≫ 1 ulp
    and exact ties fall to the integer suppkey tie-break — ranking
    is cross-engine stable. Shape is the standard blocked-linkage
    plan: equi-join on the blocking key (nation), score candidates
    in the UDF, keep each customer's best match via row_number.
    Scale: candidate count = block fan-out, never |C|×|S|; the UDF
    sees Arrow batches and runs the DP vectorized across the batch
    (_lev_batch — numpy lanes, no per-row Python bytecode), and at
    100 TB the block key shifts to phonetic/sorted-neighborhood
    keys — same plan."""

    @F.pandas_udf(T.DoubleType())
    def sim(a: pd.Series, b: pd.Series) -> pd.Series:
        av, bv = a.tolist(), b.tolist()
        lev = _lev_batch(av, bv)
        mx = np.maximum(
            np.fromiter((len(x) for x in av), dtype=np.int64, count=len(av)),
            np.fromiter((len(y) for y in bv), dtype=np.int64, count=len(bv)),
        )
        out = 1.0 - lev / np.maximum(mx, 1)  # both-empty → lev 0 → sim 1.0
        return pd.Series(out, dtype="float64")

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_name"
    )
    from pyspark.sql import Window

    # customer is one small parquet split — without this the whole
    # candidate block lands on ONE Python worker; hashing on c_custkey
    # here is the window's own required distribution, so the window
    # adds no second shuffle (r9: partition count follows the session's
    # shuffle-partition conf — a fixed 32 only matched the window's
    # required distribution on a 32-core session; at any other core
    # count it forced a second exchange).
    # ADVICE r9: the conf may hold a non-numeric value on AQE platforms
    # ("auto") — fall back to defaultParallelism rather than raising;
    # any keyed hashpartitioning satisfies the window's distribution.
    try:
        _nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", ""))
    except (TypeError, ValueError):
        _nshuf = spark.sparkContext.defaultParallelism
    cand = (
        c.repartition(_nshuf, "c_custkey")
        .join(F.broadcast(s), s.s_nationkey == c.c_nationkey)
        .withColumn("sim", sim("c_name", "s_name"))
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("sim").desc(), F.col("s_suppkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            "c_name",
            F.col("s_name").alias("best_s_name"),
            F.round("sim", 6).alias("sim_best"),
        )
    )
