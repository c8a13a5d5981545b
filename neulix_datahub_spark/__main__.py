"""Command-line surface: run any registered query from a shell.

    python -m neulix_datahub_spark list [substring]
    python -m neulix_datahub_spark run <query> [sf_dir] [--json] [--limit N]

The reference drives everything through Airflow PythonOperators; this
is the standalone equivalent for ad-hoc runs and smoke checks — the
same registry the driver contract (__spark_entry__.py) exposes.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="neulix_datahub_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("substring", nargs="?", default="", help="name filter")

    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("query")

    run = sub.add_parser("run", help="run one registered query")
    run.add_argument("query")
    run.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    run.add_argument("--json", action="store_true", help="JSON lines output")
    run.add_argument("--limit", type=int, default=50, help="max rows printed")

    args = ap.parse_args(argv)

    from neulix_datahub_spark.plans.queries import QUERIES

    if args.cmd == "list":
        for name, spec in QUERIES.items():
            if args.substring in name:
                print(f"{name}\t{spec.doc}")
        return 0

    if args.cmd == "oracle":
        spec = QUERIES.get(args.query)
        if spec is None:
            print(f"unknown query {args.query!r}", file=sys.stderr)
            return 2
        if spec.oracle is None:  # rows-only entries existed in rounds 1-4
            print(f"{args.query} has no oracle (rows-only)", file=sys.stderr)
            return 1
        print(spec.oracle.strip())
        return 0

    if args.query not in QUERIES:
        near = [n for n in QUERIES if args.query in n]
        hint = f" (did you mean: {', '.join(near[:5])}?)" if near else ""
        print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    from neulix_datahub_spark import get_session

    spark = get_session(f"cli_{args.query}")
    try:
        df = QUERIES[args.query].fn(spark, args.sf_dir)
        if args.json:
            for row in df.limit(args.limit).toJSON().collect():
                print(row)
        else:
            df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
