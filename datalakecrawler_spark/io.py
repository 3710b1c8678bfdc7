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

from pyspark.sql import DataFrame, SparkSession

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))
