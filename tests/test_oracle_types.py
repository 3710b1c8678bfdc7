"""Bind-only oracle dtype lint (VERDICT r2 "What's wrong" §1-2).

The external driver materializes oracle results via ``fetchdf()``:
DuckDB HUGEINT/UHUGEINT and DECIMAL columns land in pandas as float64
/ object while the Spark twin emits int64/double — the canonical hash
then diverges even though values are numerically identical (the one
red driver row of round 2, ``catalog_null_fraction``, was exactly
this). DuckDB widens ``sum(bigint)`` to HUGEINT and numeric literals
like ``0.5`` to DECIMAL, so the hazard re-enters silently with every
new oracle.

This lint *binds* (not executes) every registered oracle and asserts
the output relation carries no HUGEINT/UHUGEINT/DECIMAL column. Bind
is milliseconds per query, so the whole registry lints in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

from datalakecrawler_spark.io import TABLES, table_path

# FLOAT (float32) is in the list for the same reason as the wide ints:
# fetchdf() lands it as float32 while the Spark twin emits float64, and
# repr-level canonicalization then diverges on values like 0.1.
_HAZARDS = ("HUGEINT", "UHUGEINT", "DECIMAL", "FLOAT")


def _bind_types():
    from datalakecrawler_spark import registry
    import __spark_entry__  # noqa: F401  (imports register everything)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{table_path(SF_DIR, t)}')"
        )
    out = {}
    for q in registry.all_queries().values():
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)  # binds + plans, does not execute
        out[q.name] = list(zip(rel.columns, (str(t) for t in rel.types)))
    con.close()
    return out


def test_no_hugeint_or_decimal_oracle_columns():
    offenders = {
        name: [(c, t) for c, t in cols if any(h in t for h in _HAZARDS)]
        for name, cols in _bind_types().items()
    }
    offenders = {n: v for n, v in offenders.items() if v}
    assert not offenders, (
        "oracle output columns that fetchdf() degrades to float64/object "
        f"(cast them to BIGINT/DOUBLE in the oracle SQL): {offenders}"
    )
