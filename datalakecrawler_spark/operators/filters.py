"""Group C — projections, filters, predicates (SURVEY.md §2.C).

All predicates are plain Column expressions → Catalyst pushes them into
the Parquet scan (PushedFilters) and prunes columns (ReadSchema). At
100 TB this is the difference between scanning a full table and reading
a few row-groups of two columns; never wrap these in Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import register


@register(
    "project_select",
    group="C",
    oracle="""
    select p_partkey, p_name, p_brand,
           round(p_retailprice * 1.1, 6) as price_with_tax,
           p_size * 2 as double_size
    from part
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: projection + computed columns + aliases (column pruning)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.round(F.col("p_retailprice") * 1.1, 6).alias("price_with_tax"),
        (F.col("p_size") * 2).alias("double_size"),
    )


@register(
    "filter_comparison",
    group="C",
    oracle="""
    select l_orderkey, l_linenumber, l_quantity, l_shipdate
    from lineitem
    where l_shipdate <= timestamp '1996-06-30'
      and l_quantity > 45.0
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: <,<= on timestamp and > on numeric — parquet-pushed filters."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") <= F.lit("1996-06-30").cast("timestamp"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "filter_compound",
    group="C",
    oracle="""
    select o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    from orders
    where (o_orderstatus = 'F' and o_totalprice > 150000)
       or (o_orderstatus <> 'F' and not (o_orderpriority = '5-LOW'))
          and o_totalprice < 50000
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: AND/OR/NOT with SQL precedence (AND binds tighter than OR)."""
    o = load(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)) | (
        (F.col("o_orderstatus") != "F")
        & (~(F.col("o_orderpriority") == "5-LOW"))
        & (F.col("o_totalprice") < 50000)
    )
    return o.where(cond).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@register(
    "filter_in_between_like",
    group="C",
    oracle="""
    select c_custkey, c_name, c_mktsegment, c_acctbal
    from customer
    where c_mktsegment in ('BUILDING', 'MACHINERY')
      and c_acctbal between 0 and 5000
      and c_name like '%1%'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: isin + between + like."""
    c = load(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(0, 5000)
        & F.col("c_name").like("%1%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "filter_null_handling",
    group="C",
    oracle="""
    select o_orderpriority, o_orderstatus, cnt from (
        select o_orderpriority, o_orderstatus, count(*) as cnt
        from orders group by rollup(o_orderpriority, o_orderstatus)
    ) t
    where o_orderstatus is null and o_orderpriority is not null
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: isNull/isNotNull over ROLLUP output (fixtures have no nulls,
    so the rollup subtotal rows provide them)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("o_orderstatus").isNull() & F.col("o_orderpriority").isNotNull())
    )


@register(
    "case_when",
    group="C",
    oracle="""
    select case when l_quantity < 10 then 'small'
                when l_quantity < 30 then 'medium'
                when l_quantity < 45 then 'large'
                else 'huge' end as qty_band,
           count(*) as cnt
    from lineitem group by 1
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: 3-branch CASE WHEN + ELSE, grouped."""
    li = load(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .when(F.col("l_quantity") < 45, "large")
        .otherwise("huge")
    )
    return (
        li.select(band.alias("qty_band"))
        .groupBy("qty_band")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "filter_rlike_patterns",
    group="C",
    oracle="""
    select
      cast(count(*) filter (where regexp_matches(c_name,
           'Customer#0*1[0-9]{2}$')) as bigint) as name_100_199,
      cast(count(*) filter (where regexp_matches(c_mktsegment,
           '^(AUTO|BUIL)')) as bigint) as seg_auto_buil,
      cast(count(*) filter (where not regexp_matches(c_name,
           '^Customer#[0-9]+$')) as bigint) as name_malformed,
      cast(count(*) as bigint) as n_total
    from customer
    """,
)
def filter_rlike_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-ext: regex predicate filtering (rlike) — anchored match,
    alternation-prefix match, and the NEGATED full-format check
    (the validation predicate: rows NOT matching the expected
    format — must be 0 for a contract-clean column; the predicate
    form of catalog_string_pattern_profile's discovery). Regex
    evaluation is JVM-side (codegen'd) and the java.util.regex /
    RE2-style subset used here ({m,n}, classes, anchors,
    alternation) behaves identically in DuckDB's RE2. Conditional
    counts collapse all three predicates into ONE scan."""
    c = load(spark, sf_dir, "customer")
    return c.agg(
        F.count(
            F.when(F.col("c_name").rlike("Customer#0*1[0-9]{2}$"), 1)
        ).alias("name_100_199"),
        F.count(
            F.when(F.col("c_mktsegment").rlike("^(AUTO|BUIL)"), 1)
        ).alias("seg_auto_buil"),
        F.count(
            F.when(
                ~F.col("c_name").rlike("^Customer#[0-9]+$"), 1
            )
        ).alias("name_malformed"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "filter_exists_subquery",
    group="C",
    oracle="""
    select c_custkey, c_name, c_acctbal
    from customer c
    where exists (select 1 from orders o
                  where o.o_custkey = c.c_custkey
                    and o.o_orderpriority = '1-URGENT')
      and not exists (select 1 from orders o
                      where o.o_custkey = c.c_custkey
                        and o.o_totalprice > 300000)
    """,
)
def filter_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-ext: correlated EXISTS / NOT EXISTS predicates — customers
    with at least one urgent order but no jumbo order. Catalyst
    rewrites the pair into a LEFT SEMI + LEFT ANTI join
    (RewritePredicateSubquery), so the 'subquery per row' a naive
    engine would execute becomes two hash joins on o_custkey — both
    broadcastable when the filtered order sets are small, both
    shuffle-partitioned on the same key otherwise (one exchange of
    customer feeds both). That rewrite is the entire 100 TB story:
    EXISTS never re-scans orders per customer."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_x")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_x")
    return spark.sql(
        """
        select c_custkey, c_name, c_acctbal
        from customer_x c
        where exists (select 1 from orders_x o
                      where o.o_custkey = c.c_custkey
                        and o.o_orderpriority = '1-URGENT')
          and not exists (select 1 from orders_x o
                          where o.o_custkey = c.c_custkey
                            and o.o_totalprice > 300000)
        """
    )


@register(
    "filter_deterministic_sample",
    group="C",
    oracle="""
    select o_orderkey, o_custkey, o_totalprice
    from orders
    where cast(('0x' || substr(md5(cast(o_orderkey as varchar)), 1, 8))
               as bigint) % 16 = 0
    """,
)
def filter_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-ext: DETERMINISTIC hash sampling — keep rows whose
    md5(key) mod 16 == 0 (a ~1/16 sample). TABLESAMPLE and
    df.sample() draw from an RNG: different rows per run, per
    partition layout, per engine — useless for reproducible
    pipeline-debug slices, A/B-stable eval sets, or cross-engine
    verification. Hashing the KEY makes the sample a pure function
    of the data: stable across reruns, engines (md5 is portable —
    same trick as the dedup family's portable MinHash), cluster
    sizes, and file layouts, and it composes (the same predicate at
    sf0.01 and 100 TB selects the 'same' logical population). The
    predicate is a scalar expression, so it pipelines inside the
    scan with zero shuffle; selecting on a UNIFORM hash also never
    biases toward any value range, unlike `key % 16` on skewed
    keys."""
    o = load(spark, sf_dir, "orders")
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 16
    return o.where(bucket == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
