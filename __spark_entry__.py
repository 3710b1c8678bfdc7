"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``datalakecrawler_spark.registry`` — the single
source of truth mapping operator names (SURVEY.md §2 inventory) to
(Spark callable, DuckDB oracle SQL). The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import datalakecrawler_spark as dlc

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return dlc.registry.queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dlc.registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin per query; omitted keys → rows-only check."""
    return dlc.registry.oracles()
