"""Connected components over a candidate-pair edge list (SURVEY §2.11
L2: "approxSimilarityJoin + connected-component pick") — the step that
turns near-duplicate PAIRS into dedup GROUPS so one canonical doc per
cluster survives.

Algorithm: iterative minimum-label propagation. Each node starts
labeled with itself; every round, each node adopts the smallest label in
its neighborhood (its own + its neighbors'); converged when no label
changes. Rounds = graph diameter, and near-dup clusters are
small-diameter (cliques-ish from LSH buckets), so 3–5 rounds typically
suffice. Each round is one join + one aggregation — all shuffles on the
node id. For web-scale graphs swap in large-star/small-star
(alternating rounds halve long chains); for the dedup use case plain
propagation with a bounded iteration count is the right cost.

The driver-side loop only checks a scalar convergence count per round —
no data ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(id, component)`` where ``component`` is the minimum node
    id reachable from ``id``. Raises if not converged in ``max_iter``
    rounds (diameter larger than expected — for near-dup clusters that
    signals a pathological bucket, not a bigger budget).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )

    for _ in range(max_iter):
        # each node's candidate label: min over neighbors' current labels
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "v"), on="v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("u", "id")
        )
        updated = (
            labels.join(neighbor_labels, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component"))
                .cast("int")
                .alias("__changed"),
            )
        )
        # localCheckpoint truncates the growing iterative lineage — without
        # it every round re-executes all prior rounds and the plan
        # explodes exponentially.
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.agg(F.sum("__changed")).first()[0] or 0
        labels = updated.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the near-dup expectation"
    )


def dedup_by_components(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """L2 end-to-end pick: keep one row per near-dup cluster (the minimum
    id — each cluster's component label) plus every row that appears in
    no candidate pair."""
    comps = connected_components(candidate_pairs, src, dst)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
