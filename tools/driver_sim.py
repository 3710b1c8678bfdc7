"""Simulate the external driver's t2 correctness gate locally.

Replicates the driver's observed behavior from CORRECTNESS_r01.json:
for each entry in ``__spark_entry__.queries()`` (in registration
order), run the Spark callable at sf0.01, run the DuckDB oracle from
``oracle_sql()`` on the same parquet views, then canonicalize BOTH
results the way the driver does — pandas DataFrame, columns sorted by
name, rows sorted by all columns (this is the step that threw
``TypeError: unhashable type: 'numpy.ndarray'`` on nested outputs in
round 1) — and compare row count, schema width, and an
order-insensitive value hash.

Also times each query (spark wall / duckdb wall) so the per-query
driver cost can be audited (VERDICT r1 "Next round" §3: a time-boxed
driver window clears more entries when the median check is fast).

Usage:
    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] \
        [--limit N] [--names a,b,c]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    """Engine-neutral value form: numpy scalars → python, temporal →
    ISO strings, Decimal → float, integral floats → int (pandas
    promotes nullable int columns to float64 on exactly one side),
    NaN/None/NaT → NULL. The real driver evidently normalizes
    similarly — round-1 rows with NULL-bearing int pivots and DATE
    columns all hash-matched."""
    import datetime as dt
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        v = pd.Timestamp(v).to_pydatetime()
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat() + " 00:00:00"  # date vs midnight-ts neutral
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f != f:
            return "NULL"
        return repr(int(f)) if f.is_integer() and abs(f) < 2**53 else repr(round(f, 12))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(int(bool(v)))  # duckdb bool vs spark int parity
    return repr(v)


def _canon(pdf):
    """Driver-style canonicalization: sort columns by name, sort rows by
    all columns, stringify values to a stable hash. Intentionally uses
    pandas sort_values like the round-1 driver traceback shows, so any
    nested (ndarray) cell crashes here too."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    rows = sorted("|".join(_norm(v) for v in row) for row in pdf.itertuples(index=False))
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return len(pdf), list(pdf.columns), h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--names", default="")
    ap.add_argument("--out", default="/tmp/driver_sim.json")
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="build the session the way an uncooperative external driver "
        "might (non-UTC timezone, 200 shuffle partitions, Arrow off) — "
        "the registry wrapper must auto-correct; a parity diff under "
        "this flag is a real bug in configure_session coverage",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from datalakecrawler_spark.io import TABLES, table_path
    from datalakecrawler_spark.session import get_spark

    if args.hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("driver-sim-hostile")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.shuffle.partitions", "200")
            .config("spark.sql.execution.arrow.pyspark.enabled", "false")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{table_path(args.sf_dir, t)}')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)
    if args.names:
        names = [n for n in args.names.split(",") if n]
    if args.limit:
        names = names[: args.limit]

    results, n_pass, n_fail, n_rows_only = {}, 0, 0, 0
    t_start = time.perf_counter()
    for name in names:
        rec = {"spark_sec": None, "duckdb_sec": None, "status": None}
        try:
            t0 = time.perf_counter()
            sdf = qs[name](spark, args.sf_dir)
            pdf = sdf.toPandas()
            rec["spark_sec"] = round(time.perf_counter() - t0, 3)
            s_n, s_cols, s_hash = _canon(pdf)
            rec["spark_rows"] = s_n
            if name not in oracles:
                rec["status"] = "rows_only"
                n_rows_only += 1
            else:
                t0 = time.perf_counter()
                odf = con.execute(oracles[name]).fetchdf()
                rec["duckdb_sec"] = round(time.perf_counter() - t0, 3)
                o_n, o_cols, o_hash = _canon(odf)
                # The real driver does NOT coerce integral floats back to
                # int (CORRECTNESS_r02 catalog_null_fraction: DuckDB
                # HUGEINT → pandas float64 `302.0` hash-diverged from
                # Spark int64 `302` even though _norm above matches them).
                # Model that: a column whose pandas dtype *kind* is
                # integer on one side and float on the other is a FAIL
                # here even when the coerced hash matches.
                asym = sorted(
                    c
                    for c in set(pdf.columns) & set(odf.columns)
                    if {pdf[c].dtype.kind, odf[c].dtype.kind} == {"i", "f"}
                )
                ok = (
                    (s_n == o_n)
                    and (s_cols == o_cols)
                    and (s_hash == o_hash)
                    and not asym
                )
                if asym:
                    rec["dtype_asym"] = asym
                rec["status"] = "pass" if ok else "FAIL"
                if not ok:
                    rec["detail"] = {
                        "rows": [s_n, o_n],
                        "cols": [s_cols, o_cols],
                        "hash_match": s_hash == o_hash,
                    }
                    n_fail += 1
                else:
                    n_pass += 1
        except Exception as exc:  # driver records the error string
            rec["status"] = "ERROR"
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
            n_fail += 1
        results[name] = rec
        print(
            f"{rec['status']:>9}  {name:<44} spark={rec['spark_sec']}s"
            f" duck={rec['duckdb_sec']}s",
            flush=True,
        )
    total = round(time.perf_counter() - t_start, 1)
    print(
        f"\n== {n_pass} pass, {n_fail} fail/error, {n_rows_only} rows-only"
        f" of {len(names)} in {total}s"
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"written: {args.out}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
