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


def triangle_stats(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Triangle count + global clustering coefficient over an
    UNDIRECTED graph given as oriented edges (``src < dst``, one row
    per edge). Each triangle {a<b<c} is counted exactly once by the
    two-hop join (a,b)⋈(b,c) semi-probed against the closing edge
    (a,c) — the standard distributed recipe. Degrees (and the open-
    triad denominator) come from one aggregation over both endpoints.

    Orientation bounds the join fan-out: at scale orient by DEGREE
    (low-degree endpoint first, ties by id) so every key's fan-out is
    O(sqrt(|E|)) — pass edges already re-oriented that way; the
    counting logic is orientation-agnostic as long as each undirected
    edge appears exactly once.

    Returns one row: ``n_nodes, n_edges, n_triangles,
    clustering_coeff`` (null when the graph has no open triads).

    The edge list is referenced six times (two hop sides, the closing
    probe, both degree projections, the edge count); localCheckpoint
    materializes it ONCE so the plan doesn't re-derive the upstream
    edge computation per reference — without it a derived edge list
    (e.g. the co-purchase join) re-scans its fact table six times
    (measured: 48 scans / 73 shuffles at sf0.1 collapses to one
    derivation). Cost: one O(|E|) materialization, the same trade
    connected_components makes for its iteration invariant.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    tri = (
        x.join(y, F.col("x.b") == F.col("y.a"))
        .join(
            z,
            (F.col("z.a") == F.col("x.a")) & (F.col("z.b") == F.col("y.b")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("__d") * (F.col("__d") - 1)) / 2).alias("__triads"),
    ).crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
    return summary.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.round(F.try_divide(3.0 * F.col("n_triangles"), F.col("__triads")), 6).alias(
            "clustering_coeff"
        ),
    )
