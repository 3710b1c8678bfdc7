"""Self-verification: run registered operators on Spark AND their
oracle SQL on DuckDB over the same parquet, compare results the way the
driver's t2 gate does (row count + column names + order-insensitive
canonical values). This is a product surface (`python -m
datalakecrawler_spark verify`), not just a test helper — an engine that
ships with its own referee loop can be re-validated after any config or
version change in one command.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

from datalakecrawler_spark import registry
from datalakecrawler_spark.io import TABLES, table_path


@dataclass
class VerifyResult:
    name: str
    status: str  # "match" | "mismatch" | "rows-only" | "error"
    detail: str = ""
    n_rows: int = 0


def _canon_value(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Column-name-sorted, value-canonicalized, row-sorted result —
    the driver's order-insensitive comparison form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


def verify_queries(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
) -> list[VerifyResult]:
    """Run each named operator (default: all) against its DuckDB oracle
    at `sf_dir`; rows-only operators are executed for no-crash."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    qs = registry.all_queries()
    out: list[VerifyResult] = []
    for name in names or sorted(qs):
        q = qs[name]
        try:
            df = q.fn(spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            if q.oracle is None:
                out.append(VerifyResult(name, "rows-only", n_rows=len(srows)))
                continue
            cur = con.execute(q.oracle)
            dcols = [c[0] for c in cur.description]
            drows = cur.fetchall()
            s, d = canon(df.columns, srows), canon(dcols, drows)
            if sorted(df.columns) != sorted(dcols):
                out.append(
                    VerifyResult(
                        name, "mismatch",
                        f"columns spark={sorted(df.columns)} duck={sorted(dcols)}",
                        len(srows),
                    )
                )
            elif s != d:
                bad = sum(1 for a, b in zip(s, d) if a != b) + abs(len(s) - len(d))
                out.append(
                    VerifyResult(name, "mismatch", f"{bad} differing rows", len(srows))
                )
            else:
                out.append(VerifyResult(name, "match", n_rows=len(srows)))
        except Exception as ex:  # surface, don't abort the sweep
            out.append(VerifyResult(name, "error", f"{type(ex).__name__}: {ex}"))
    con.close()
    return out
