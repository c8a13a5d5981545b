"""Zero-tolerance driver simulator: run each registry query on Spark AND
its DuckDB oracle at a given SF, canonicalize (columns sorted by name,
rows sorted by all columns, dtypes normalized), and compare VALUES
EXACTLY — stricter than the driver's value-hash, so a pass here implies
a driver-green row.

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [names...]
With no names, checks every oracle-backed query in the registry.
``--window N`` restricts to the FIRST N registry names (the driver's
rotation window; rows-only entries in the window print SKIP).
``--entry`` smoke-runs ``__spark_entry__.entry(spark)`` first, the way
the driver does. The verify skill's driver_sim is a thin wrapper over
this file — this is the single comparison implementation.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=None,
                    help="check only the first N registry names")
    ap.add_argument("--entry", action="store_true",
                    help="smoke-run __spark_entry__.entry(spark) first")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from neulix_datahub_spark import get_session
    from neulix_datahub_spark.plans.queries import QUERIES
    from tests.compare import canon

    spark = get_session(
        "driver_sim", shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "16g"},
    )
    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.entry:
        import __spark_entry__ as entry_mod

        n = len(entry_mod.entry(spark).take(1))
        print(f"entry(): ok rows>={n}", flush=True)

    if args.names:
        names = args.names
    elif args.window:
        names = list(QUERIES)[: args.window]
    else:
        names = [n for n, s in QUERIES.items() if s.oracle is not None]
    failures = []
    for name in names:
        spec = QUERIES[name]
        if spec.oracle is None:
            print(f"{name}: SKIP (rows-only)")
            continue
        t0 = time.time()
        try:
            a = canon(spec.fn(spark, args.sf).toPandas())
            e = canon(ddb.execute(spec.oracle).df())
            problems = []
            if list(a.columns) != list(e.columns):
                problems.append(f"columns {list(a.columns)} != {list(e.columns)}")
            elif len(a) != len(e):
                problems.append(f"rows {len(a)} != {len(e)}")
            else:
                for c in a.columns:
                    av, ev = a[c].astype(str), e[c].astype(str)
                    bad = ~((av == ev) | (a[c].isna() & e[c].isna()))
                    if bad.any():
                        i = bad.idxmax()
                        problems.append(
                            f"col {c}: {int(bad.sum())} diffs, "
                            f"e.g. row {i}: {av[i]!r} vs {ev[i]!r}"
                        )
            status = "EXACT" if not problems else "DIFF " + "; ".join(problems)
        except Exception as ex:  # noqa: BLE001 — report and continue
            status = f"ERROR {type(ex).__name__}: {ex}"
            problems = [status]
        dt = time.time() - t0
        print(f"{name}: {status} ({dt:.1f}s)", flush=True)
        if problems:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} exact-match", flush=True)
    if failures:
        print("FAILED:", " ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
