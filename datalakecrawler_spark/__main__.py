"""CLI entry point — `python -m datalakecrawler_spark <command>`.

Commands:
  crawl <lake_dir> [--out DIR]   run the crawler over a directory of
                                 datasets, print (and optionally
                                 persist) the catalog tables
  query <name> [--sf-dir DIR]    run one registered operator and print
                                 its result (default sf0.01 fixtures)
  list [--group G]               list registered operators
  explain <name>                 physical-plan audit of one operator
  verify [names...]              compare operators against the DuckDB
                                 oracle (exit 1 on any mismatch/error)
  lint [names...] [--strict]     plan lints (Cartesian products, Python
                                 eval, excess shuffles, and the r5
                                 structural gates: data-proportional
                                 single-partition windows per the
                                 distrank rule) over the headline
                                 suite or named operators
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datalakecrawler_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ap_crawl = sub.add_parser("crawl", help="crawl a lake directory")
    ap_crawl.add_argument("lake_dir")
    ap_crawl.add_argument("--out", default=None, help="persist catalog here")

    ap_query = sub.add_parser("query", help="run a registered operator")
    ap_query.add_argument("name")
    ap_query.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap_query.add_argument("--limit", type=int, default=20)

    ap_list = sub.add_parser("list", help="list registered operators")
    ap_list.add_argument("--group", default=None)

    ap_explain = sub.add_parser("explain", help="show an operator's physical plan")
    ap_explain.add_argument("name")
    ap_explain.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    ap_verify = sub.add_parser(
        "verify", help="compare operators against the DuckDB oracle"
    )
    ap_verify.add_argument("names", nargs="*", help="default: every operator")
    ap_verify.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    ap_lint = sub.add_parser("lint", help="plan lints over operators")
    ap_lint.add_argument("names", nargs="*", help="default: headline suite")
    ap_lint.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap_lint.add_argument("--strict", action="store_true", help="exit 1 on findings")

    args = ap.parse_args(argv)

    import datalakecrawler_spark as dlc

    if args.cmd == "list":
        for name in sorted(dlc.registry.all_queries()):
            q = dlc.registry.all_queries()[name]
            if args.group and q.group != args.group:
                continue
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{q.group}  {name}  [{kind}]")
        return 0

    from datalakecrawler_spark.session import get_spark

    spark = get_spark("dlc-cli")
    if args.cmd == "crawl":
        from datalakecrawler_spark import crawler

        if args.out:
            crawler.crawl_and_write(spark, args.lake_dir, args.out)
            print(f"catalog written to {args.out}")
        for name, df in crawler.crawl(spark, args.lake_dir).items():
            print(f"== {name} ==")
            df.show(50, truncate=False)
        return 0

    if args.cmd == "explain":
        import re

        from datalakecrawler_spark.plans.explain import audit

        qs = dlc.registry.all_queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r} — try `list`", file=sys.stderr)
            return 2
        df = qs[args.name].fn(spark, args.sf_dir)
        df.collect()
        a = audit(df)
        keys = sorted(
            {m.split("#")[0] for m in re.findall(r"hashpartitioning\((\w+)", a.text)}
        )
        print(f"joins: {sorted(set(a.joins)) or 'none'}")
        print(f"shuffle keys: {keys or 'none'}")
        print(f"codegen stages: {a.n_codegen_stages}  python: {a.has_python_eval}")
        pushed = [x for x in a.pushed_filters if x]
        if pushed:
            print("pushed filters:", "; ".join(sorted(set(pushed))[:5]))
        print(a.text.split("\n\n")[0])
        return 0

    if args.cmd == "verify":
        from datalakecrawler_spark.verify import verify_queries

        qs = dlc.registry.all_queries()
        unknown = [n for n in args.names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown} — try `list`", file=sys.stderr)
            return 2
        results = verify_queries(spark, args.sf_dir, args.names or None)
        counts: dict[str, int] = {}
        for r in results:
            counts[r.status] = counts.get(r.status, 0) + 1
            if r.status in ("mismatch", "error"):
                print(f"{r.status.upper():8s} {r.name}  {r.detail}")
        summary = "  ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        print(f"verified {len(results)} operators: {summary}")
        return 0 if counts.get("mismatch", 0) + counts.get("error", 0) == 0 else 1

    if args.cmd == "lint":
        from bench import HEADLINE
        from datalakecrawler_spark.plans.explain import (
            audit,
            global_window_findings,
            lint,
        )

        qs = dlc.registry.all_queries()
        names = args.names or [n for n in HEADLINE if n in qs]
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown} — try `list`", file=sys.stderr)
            return 2
        try:  # same reasoned exemptions the test gate uses
            from tests.test_plan_lint import ALLOWED_GLOBAL_WINDOWS
        except Exception:
            ALLOWED_GLOBAL_WINDOWS = {}
        n_findings = 0
        for name in names:
            q = qs[name]
            df = q.fn(spark, args.sf_dir)
            df.collect()
            a = audit(df)
            issues = lint(a, name, q.group)
            # r5 structural gates (tests/test_plan_lint.py): global
            # windows over unbounded input + CartesianProduct
            for g in global_window_findings(df, flag_cartesian=True):
                if g.startswith("CartesianProductExec") or (
                    name not in ALLOWED_GLOBAL_WINDOWS
                ):
                    issues.append(g)
            n_findings += len(issues)
            flag = "CLEAN" if not issues else "LINT "
            print(
                f"{flag} {name}: joins={sorted(set(a.joins)) or '-'} "
                f"exchanges={a.n_exchanges} codegen={a.n_codegen_stages} "
                f"python={a.has_python_eval}"
            )
            for i in issues:
                print(f"      - {i}")
        print(f"linted {len(names)} plans: {n_findings} finding(s)")
        return 1 if (args.strict and n_findings) else 0

    if args.cmd == "query":
        qs = dlc.registry.all_queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r} — try `list`", file=sys.stderr)
            return 2
        qs[args.name].fn(spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
