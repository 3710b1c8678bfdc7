"""Group E — aggregations (SURVEY.md §2.E), plus the flagship
``q1_pricing_summary`` benchmark query (BASELINE.md row 1).

All double aggregates follow the registry float-parity policy
(decimal-routed sums, round-to-6 outputs) so results hash-match the
DuckDB oracle regardless of partition/summation order.

Scale notes (100 TB): every query here is a single groupBy → Catalyst
plans partial (map-side) aggregation before the shuffle, so shuffle
volume is #groups × #partitions, not #rows. No driver-side
materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import AVG_D, SUM_D, davg, dsum, register

_Q1_CUTOFF = "1998-09-02"


@register(
    "q1_pricing_summary",
    group="E",
    oracle=f"""
    select l_returnflag, l_linestatus,
           {SUM_D.format('l_quantity')} as sum_qty,
           {SUM_D.format('l_extendedprice')} as sum_base,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} as sum_disc,
           {AVG_D.format('l_quantity')} as avg_qty,
           {AVG_D.format('l_discount')} as avg_disc,
           count(*) as cnt
    from lineitem
    where l_shipdate <= timestamp '{_Q1_CUTOFF}'
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter + groupBy(2) + 6 aggregates + sort.

    The filter is a plain Column comparison → pushed to the Parquet
    scan; the aggregation is hash-based with map-side partials.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base"),
            dsum(disc_price).alias("sum_disc"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
