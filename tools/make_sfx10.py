"""Synthesize a 10x-scale variant of sf0.1 for the builder-side scaling
protocol (optimization r14, VERDICT item 8): the local bench at sf0.1 is
driver/job-overhead bound (every 8c/32c ratio ~1), so shuffle-class
claims need a bigger input to show a bench delta at all. This writes
/tmp/sfx10 with documents and embeddings replicated 10x under disjoint
id ranges, each copy PERTURBED so copies are not near-duplicates of
each other (replicating verbatim would make every row a 10-way
near-dup cluster and quadratically explode the candidate stage into a
different workload, not a scaled one):

- documents: copy k appends a per-copy token to the text, so cross-copy
  shingle sets differ while the within-copy near-dup structure is
  preserved 10x.
- embeddings: copy k multiplies every vector elementwise by a
  copy-specific seeded ±1 sign pattern. Sign-flipping a dimension for
  BOTH sides of a pair leaves cosine unchanged, so each copy's
  internal near-dup structure is exactly sf0.1's; across copies the
  sign products are random ±1, so cross-copy cosines concentrate near
  0 and cross-copy pairs neither band-collide nor pass the precision
  threshold — a clean ×10, not a ×100 pair explosion. (The first cut
  of this tool translated every dim by +0.37k instead; that aligned
  all vectors with the all-ones direction and left 162 M pairs above
  cos 0.30 — a degenerate workload that exhausted host memory in the
  verify join. Recorded in OPTIMIZATION_r14.md.)

Only the tables the five shuffle-bound anchors read are scaled; the
rest symlink to sf0.1. NOT part of the driver bench contract — a
builder measurement fixture only.

Usage: python tools/make_sfx10.py [dest]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
COPIES = 10
# id offsets far above any real id range in sf0.1
DOC_OFF = 10_000_000
VEC_OFF = 10_000_000


def main() -> int:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    from pyspark.sql import functions as F

    from neulix_datahub_spark import get_session
    from neulix_datahub_spark.sources.tables import load_table

    spark = get_session("make_sfx10")
    os.makedirs(dest, exist_ok=True)

    docs = load_table(spark, SRC, "documents")
    parts = []
    for k in range(COPIES):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * DOC_OFF)).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        if k > 0:
            c = c.withColumn(
                "text",
                F.when(
                    F.col("text").isNotNull(),
                    F.concat(F.col("text"), F.lit(f" copytoken{k}")),
                ),
            )
        parts.append(c)
    from functools import reduce

    from pyspark.sql import DataFrame

    reduce(DataFrame.unionByName, parts).repartition(16).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "documents.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    import random

    parts = []
    for k in range(COPIES):
        rng = random.Random(1000 + k)
        signs = (
            [1.0] * dim
            if k == 0
            else [float(rng.choice((-1, 1))) for _ in range(dim)]
        )
        c = emb.select(
            (F.col("vec_id") + F.lit(k * VEC_OFF)).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ).alias("embedding"),
        )
        parts.append(c)
    reduce(DataFrame.unionByName, parts).repartition(16).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "embeddings.parquet"))

    for t in (
        "customer", "events", "lineitem", "nation", "orders", "part",
        "region", "supplier",
    ):
        link = os.path.join(dest, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    print(f"wrote {dest}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
