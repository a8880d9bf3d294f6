"""Command-line entry points — parity with the reference's runnable
modules (`pipeline/run_pipeline.py`, `pipeline/run_analytics.py`,
`kaggle_amazon_sales_loader.py` main), so a reference user can drive the
same jobs with `python -m data_engineering_etl_demo_spark <cmd>`:

  pipeline   EP1: raw JSONL/CSV -> quarantine -> warehouse -> preview +
             quality report        (reference run_pipeline.py:29-119)
  analytics  EP2: the 5 analytics queries over an existing warehouse,
             CSV exports           (reference run_analytics.py:14-34)
  loader     EP3: Kaggle CSV directory -> canonical JSONL + stats report
                                   (reference loader main:251-303)
  query      run any registered engine query by name against an sf_dir
             (the surface the reference's run_queries.py points at)
  list       print every registered query name

Every command builds the same local session defaults as the test suite;
pass --cpus to bound parallelism.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_engineering_etl_demo_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="EP1 end-to-end ETL")
    pp.add_argument("--events", required=True)
    pp.add_argument("--users", required=True)
    pp.add_argument("--intl", default=None)
    pp.add_argument("--warehouse", required=True)
    pp.add_argument("--output", required=True)

    pa = sub.add_parser("analytics", help="EP2 analytics over a warehouse")
    pa.add_argument("--warehouse", required=True)
    pa.add_argument("--output", required=True)

    pl = sub.add_parser("loader", help="EP3 Kaggle CSV loader")
    pl.add_argument("--csv-dir", required=True)
    pl.add_argument("--output", required=True)

    pq = sub.add_parser("query", help="run one registered query")
    pq.add_argument("name")
    # no machine-specific hardcoded default: honor the same env var the
    # bench uses, and fail with a clear message when neither is given
    pq.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR"),
        help="table directory (default: $SPARK_GRAFT_SF_DIR)",
    )
    pq.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")

    for s in (pp, pa, pl, pq):
        s.add_argument("--cpus", type=int, default=None)
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    if args.cmd == "list":
        from data_engineering_etl_demo_spark.plans import all_specs

        for name in sorted(all_specs()):
            print(name)
        return 0

    if spark is None:
        import os

        from data_engineering_etl_demo_spark.session import get_spark

        if getattr(args, "cpus", None):
            os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
        spark = get_spark(app_name=f"cli-{args.cmd}")

    if args.cmd == "pipeline":
        from data_engineering_etl_demo_spark.etl import run_pipeline

        res = run_pipeline(
            spark,
            events_path=args.events,
            users_path=args.users,
            warehouse_dir=args.warehouse,
            output_dir=args.output,
            intl_path=args.intl,
        )
        import json
        from dataclasses import asdict

        print(json.dumps(asdict(res.report), indent=1, sort_keys=True))
        return 0

    if args.cmd == "analytics":
        from data_engineering_etl_demo_spark.operators.warehouse import Warehouse
        from data_engineering_etl_demo_spark.plans.warehouse_analytics import (
            run_all,
        )

        wh = Warehouse(spark, args.warehouse)
        out = run_all(spark, wh, export_dir=args.output)
        for name, r in out.items():
            print(f"{name}: {r.csv_path}")
        return 0

    if args.cmd == "loader":
        from data_engineering_etl_demo_spark.sources.ecommerce_loader import (
            run_loader,
        )

        report = run_loader(spark, args.csv_dir, args.output)
        print(report)
        return 0

    if args.cmd == "query":
        from data_engineering_etl_demo_spark.plans import all_specs

        specs = all_specs()
        if args.name not in specs:
            print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
            return 2
        if not args.sf_dir:
            print(
                "no table directory: pass --sf-dir or set SPARK_GRAFT_SF_DIR",
                file=sys.stderr,
            )
            return 2
        df = specs[args.name].spark_fn(spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
