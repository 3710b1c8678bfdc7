"""Fixture table loaders.

The driver fixtures (TESTDATA.md) are one Parquet file per table at
three scale factors. All operators load through here so the read path
(and any future caching / bucketing decision) is in one place.

Scale note (100 TB): each ``load`` is a plain ``spark.read.parquet`` —
on a real lake this is a multi-file/partitioned path and Catalyst's
DataSource V2 handles split planning, predicate pushdown and column
pruning; nothing in this module materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_CACHE_ON = os.environ.get("DLC_CACHE", "1") == "1"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table, memoized + Spark-cached per (session,
    sf_dir, table). BASELINE.md's 2× criterion explicitly amortizes over
    a warm session with cached fixture frames; at fixture scale every
    table fits in memory many times over. Disable with DLC_CACHE=0
    (e.g. to measure raw scan paths)."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if not _CACHE_ON:
        return _read(spark, sf_dir, name)
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    if key not in _CACHE:
        _CACHE[key] = _read(spark, sf_dir, name).cache()
    return _CACHE[key]


def row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Memoized fixture-table row count (catalog statistic).

    Query builders that bake N into the plan (TF-IDF's idf denominator,
    burstiness' Fano normalizer) would otherwise launch one count job
    per plan *construction*; a catalog serves this from statistics. The
    fixtures are immutable, so per-application memoization is exact."""
    from datalakecrawler_spark.memo import memoized_scalar

    return memoized_scalar(
        spark,
        ("io.row_count", sf_dir.rstrip("/"), name),
        lambda: load(spark, sf_dir, name).count(),
    )


def multi_count(*dfs: DataFrame) -> list[int]:
    """Count several DataFrames in ONE Spark action (r10, guide §1.2:
    collapse per-op assertion counts into a single multi-aggregate
    job). Each frame reduces to a 1-row count aggregate; the
    cross-join of 1-row frames is scalar-subquery-shaped (bounded, no
    data-proportional cartesian). One ``first()`` drives the whole
    tree: AQE materializes the independent aggregates as concurrent
    stages, so the wall cost is ~max of the counts instead of their
    sum across separate driver actions."""
    agg = None
    for i, df in enumerate(dfs):
        c = df.agg(F.count(F.lit(1)).alias(f"__c{i}"))
        agg = c if agg is None else agg.crossJoin(c)
    row = agg.first()
    return [row[f"__c{i}"] for i in range(len(dfs))]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.parquet has shipped ``ts`` in two physical layouts across
    fixture generations: TIMESTAMP(NANOS) (which Spark's Parquet reader
    rejects, [PARQUET_TYPE_ILLEGAL] — readable only via the
    nanos-as-long escape hatch) and plain TIMESTAMP(MICROS). Normalize
    whatever arrived to session-zone TimestampType: a raw int64 of
    nanoseconds is rebuilt with exact integer math (all fixture values
    are µs-aligned — measured 0 rows with sub-µs remainder; ``div``
    avoids the double-precision loss ``/`` would add above 2^53 ns),
    and TIMESTAMP_NTZ is cast (UTC session → identical instants), so
    downstream operators see one stable schema either way."""
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_events_ts(spark.read.parquet(table_path(sf_dir, "events")))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
