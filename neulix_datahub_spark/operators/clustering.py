"""Distributed k-means (Lloyd) over an embedding column (SURVEY §2.11
L3 extension): the coarse-quantizer trainer for IVF indexes and the
generic embedding-space clusterer.

Not in the reference (no vector data there). The shape is the textbook
distributed Lloyd iteration: assignment is a pure Column expression over
the corpus scan (argmin of k squared distances against broadcast-literal
centroids — no UDF, no shuffle), the update is one posexplode
two-phase aggregate whose output is k × dim scalars. Only those k × dim
numbers cross to the driver per iteration — bounded and tiny — which is
exactly the driver-traffic profile a 1000-executor run needs.
``pyspark.ml.clustering.KMeans`` is the batteries-included alternative;
this version keeps the whole loop in DataFrame expressions so the plan
is inspectable and the init/tie-breaks are fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist_to(vec_col: str, centroid: list[float]) -> Column:
    """Squared Euclidean distance from an array column to a constant
    centroid, as a codegen'd fold."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            lit,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``cluster`` — index of the nearest centroid (first wins on
    exact ties: deterministic). Centroids ride into the plan as array
    literals, so assignment is one narrow projection."""
    dists = F.array(*[_sq_dist_to(vec_col, c) for c in centroids])
    best = F.array_position(dists, F.array_min(dists)) - 1
    return df.withColumn("cluster", best.cast("int"))


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's algorithm: returns (assigned DataFrame, final centroids).

    Init is deterministic AND engine-portable: the ``k`` vectors with the
    smallest ``md5(cast(id as string))`` (a content-independent
    pseudo-random draw every re-run reproduces; md5 rather than xxhash64
    so the DuckDB oracle can replay the identical seed choice — the same
    portability trick the bloom/CMS sketch oracles use). Each iteration
    runs one distributed assignment + one (cluster, dim) two-phase
    aggregate; empty clusters keep their previous centroid. The driver
    only ever holds k × dim floats — never data rows.
    """
    seeds = (
        df.select(
            F.col(vec_col),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__id"),
        )
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in seeds]

    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col)
        rows = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "__v")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("__v").cast("double")).alias("c"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["c"]
        for ci, dims in by_cluster.items():
            new[ci] = [dims[d] for d in sorted(dims)]
        centroids = new

    return assign_clusters(df, centroids, vec_col), centroids


def kmeans_inertia(
    assigned: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Per-cluster size and inertia (sum of squared distances to the
    cluster centroid) — the convergence/quality metric, computed
    distributed with the centroids as literals."""
    dists = F.array(*[_sq_dist_to(vec_col, c) for c in centroids])
    return (
        assigned.select(
            "cluster",
            F.element_at(dists, F.col("cluster") + 1).alias("__d2"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("__d2"), 4).alias("inertia"),
        )
    )
