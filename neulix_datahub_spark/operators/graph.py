"""Iterative graph algorithms on DataFrames (SURVEY §2.11 extension
tier, beside k-means in ``operators/clustering.py``).

Not in the reference (no graph surface); provided because training-data
pipelines routinely rank aggregated entity graphs (domain link graphs
for quality priors, user-session transition graphs for behavioral
features). Connected components for dedup clusters live in
``operators/components.py``; this module adds weighted PageRank as the
canonical fixed-point iteration expressed with joins + aggregations —
no driver-side loops over DATA, only over iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "weight",
) -> DataFrame:
    """Weighted PageRank by power iteration: ``r_{t+1}(v) = (1-d)/N +
    d * Σ_{u→v} r_t(u) · w(u,v)/outdeg(u)``, ``r_0 = 1/N``.

    Each iteration is one join (ranks ⋈ edges on ``src``) plus one
    aggregation (contributions per ``dst``) — the textbook distributed
    shape; with a billion-node graph both sides stay shuffled on the
    node key and AQE picks the strategy per iteration. The edge list
    (with out-degree totals) is the iteration invariant and is
    localCheckpoint'ed once, so the unrolled lineage doesn't recompute
    the edge derivation ``iterations`` times.

    Dangling nodes (no out-edges) leak their mass — ranks then sum to
    < 1, the common simplification; add a dangling-mass redistribution
    aggregate per iteration if exact stochasticity matters. Returns
    ``(node, rank)``.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"), w.alias("__w")
    )
    e = e.groupBy("__src", "__dst").agg(F.sum("__w").alias("__w"))
    outdeg = e.groupBy("__src").agg(F.sum("__w").alias("__od"))
    # normalized transition weights: the per-iteration invariant
    trans = e.join(outdeg, "__src").select(
        "__src", "__dst", (F.col("__w") / F.col("__od")).alias("__p")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast("double"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            ranks.join(trans, ranks["node"] == trans["__src"])
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks
