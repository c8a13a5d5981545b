"""Per-query driver-side profiler (optimization round): warm a registry
query twice, then run it once under cProfile and print the top
call sites by cumulative time, filtered to repo modules plus the py4j
boundary. Because every Spark action blocks the driver in py4j,
cumulative time per operator function is a faithful breakdown of where
the query's wall-clock goes (build vs ingest vs probe vs oracle-side
assembly), even though the work itself runs in the JVM.

Usage:
    python tools/profile_query.py <query_name> [--sf DIR] [--warm N]
"""

from __future__ import annotations

import argparse
import cProfile
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from neulix_datahub_spark import get_session
    from neulix_datahub_spark.plans.queries import QUERIES

    spark = get_session("profile_query")
    fn = QUERIES[args.name].fn

    def run() -> None:
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    for _ in range(args.warm):
        run()
    start = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    run()
    prof.disable()
    wall = time.perf_counter() - start
    print(f"\n=== {args.name}: timed run {wall:.2f}s ===")
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative")
    print("--- repo call sites by cumulative time ---")
    stats.print_stats("neulix_datahub_spark|plans/queries", args.top)
    print("--- py4j / actions ---")
    stats.print_stats("py4j|readwriter|dataframe", 15)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
