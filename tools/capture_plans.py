"""Capture ``.explain('formatted')`` for registry queries into text
files (optimization-round evidence: plans/r13/<query>_{before,after}.txt).

The lifecycle queries run eager index builds inside the query fn; the
captured plan is the FINAL returned DataFrame's physical plan — the
job the bench times last — which is where join strategies, exchanges,
scan pruning and Python-boundary nodes show up.

Usage:
    python tools/capture_plans.py --out plans/r13 --suffix _before q1 q2 ...
    python tools/capture_plans.py --out plans/r13 --suffix _before --bench
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--bench", action="store_true",
                    help="capture every bench.py HEADLINE anchor")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from neulix_datahub_spark import get_session
    from neulix_datahub_spark.plans.queries import QUERIES

    names = list(args.names)
    if args.bench:
        import bench

        names.extend(n for n in bench.HEADLINE if n not in names)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_session("capture_plans")
    for name in names:
        try:
            df = QUERIES[name].fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR capturing plan: {e!r}"
        (out / f"{name}{args.suffix}.txt").write_text(
            plan, encoding="utf-8"
        )
        print(f"captured {name} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
