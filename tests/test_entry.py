"""Driver-contract smoke: entry() returns rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base",
        "sum_disc",
        "avg_qty",
        "avg_disc",
        "cnt",
    ]


def test_queries_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_hostile_session_autocorrected(spark):
    """A driver-built session with non-parity confs (non-UTC timezone,
    200 shuffle partitions) must be corrected by the registry wrapper
    on the first query call — oracle semantics cannot depend on who
    built the session."""
    from datalakecrawler_spark import registry
    from tests.conftest import SF_DIR

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        registry.all_queries()["q1_pricing_summary"].fn(spark, SF_DIR).collect()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= 64
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
