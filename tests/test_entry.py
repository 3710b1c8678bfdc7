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
