"""Distributed PCA over an embedding column (SURVEY §2.11 L3 adjunct:
the dimensionality-reduction step training-data pipelines run before
clustering / IVF bucketing / visualization).

Design (the RowMatrix/computeGramianMatrix shape, re-expressed on the
DataFrame API):

1. **Gram pass** — ``mapInPandas`` emits per-partition partial sums:
   the upper triangle of Xᵀ X (dim·(dim+1)/2 doubles), the column sums
   (dim doubles) and the row count — a FIXED-SIZE partial per partition
   regardless of row count, exactly like a sketch. One ``groupBy(i, j)``
   over ≤ 2 145 keys (dim = 64) merges them; the driver collects that
   bounded triangle (k×dim-scale traffic, same policy as the k-means
   centroid collect in clustering.py).
2. **Eigendecomposition on the driver** — covariance assembled from
   Gram/mean via cov = (G − n·μμᵀ)/(n−1), then ``numpy.linalg.eigh``
   on the 64×64 symmetric matrix. Driver work is O(dim³), independent
   of corpus size.
3. **Verification pass (optional)** — project the corpus onto the top-k
   eigenvectors with codegen'd ``zip_with``/``aggregate`` dot products
   (components enter the plan as array literals, the same broadcast-
   by-literal trick clustering.py uses) and compute per-component
   sample variances in one aggregation. For exact PCA those variances
   ARE the eigenvalues — an independent end-to-end check of the Gram
   assembly, the eigensolve, and the projection.

At 100 TB: two scans, no shuffle wider than 2 145 keys, nothing on the
driver bigger than dim². The eigensolve is exact, not iterative — at
dim ≤ a few thousand this beats power-iteration variants outright.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    """Driver-side result of :func:`fit_pca`."""

    n: int
    dim: int
    mean: np.ndarray          # (dim,)
    eigenvalues: np.ndarray   # (dim,) descending
    components: np.ndarray    # (dim, dim); column k = k-th eigenvector
    total_variance: float     # trace of the covariance matrix


def _gram_partials(dim: int):
    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.float64)
        colsum = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf.iloc[:, 0].to_numpy()).astype(np.float64)
            gram += x.T @ x
            colsum += x.sum(axis=0)
            n += len(x)
        if n:
            iu, ju = np.triu_indices(dim)
            yield pd.concat(
                [
                    pd.DataFrame({"i": iu, "j": ju, "s": gram[iu, ju]}),
                    pd.DataFrame(
                        {"i": np.arange(dim), "j": np.full(dim, -1), "s": colsum}
                    ),
                    pd.DataFrame({"i": [-1], "j": [-1], "s": [float(n)]}),
                ]
            )

    return emit


def collect_gram_partial(
    df: DataFrame, embedding_col: str, dim: int
) -> tuple[int, "np.ndarray", "np.ndarray"]:
    """One shard's (n, column sums, Gram matrix) — the fixed-size,
    ADDITIVELY MERGEABLE partial the whole design rests on: shards
    (days, sources, backfills) each produce one, and the global model
    is fit from their plain sums — exactly the HLL/CMS mergeability
    story, but the merge is exact because the partials are sums."""
    merged = (
        df.select(embedding_col)
        .mapInPandas(_gram_partials(dim), schema="i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()  # bounded: dim*(dim+1)/2 + dim + 1 rows, corpus-independent
    )
    gram = np.zeros((dim, dim), dtype=np.float64)
    colsum = np.zeros(dim, dtype=np.float64)
    n = 0
    for row in merged:
        if row.i == -1:
            n = int(row.s)
        elif row.j == -1:
            colsum[row.i] = row.s
        else:
            gram[row.i, row.j] = row.s
            gram[row.j, row.i] = row.s
    return n, colsum, gram


def model_from_partials(
    partials: list[tuple[int, "np.ndarray", "np.ndarray"]], dim: int
) -> PCAModel:
    """Fit the exact PCA from any number of shard partials (merge =
    elementwise sum, associative and commutative)."""
    n = sum(p[0] for p in partials)
    if n < 2:
        raise ValueError(f"fit_pca needs >= 2 rows, got {n}")
    colsum = np.sum([p[1] for p in partials], axis=0)
    gram = np.sum([p[2] for p in partials], axis=0)
    mean = colsum / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    order = np.argsort(eigenvalues)[::-1]
    return PCAModel(
        n=n,
        dim=dim,
        mean=mean,
        eigenvalues=eigenvalues[order],
        components=eigenvectors[:, order],
        total_variance=float(np.trace(cov)),
    )


def fit_pca(df: DataFrame, embedding_col: str, dim: int) -> PCAModel:
    """Exact PCA of ``df[embedding_col]`` (array<float|double>, fixed
    length ``dim``). Two distributed stages (partial Grams → 2 145-key
    merge) and one bounded collect; see the module docstring for the
    scale argument."""
    return model_from_partials(
        [collect_gram_partial(df, embedding_col, dim)], dim
    )


def project_expr(embedding_col: str, component: np.ndarray) -> Column:
    """Codegen'd dot product of the embedding column with one component
    (entered as a literal array — broadcast-by-literal, no join)."""
    from neulix_datahub_spark.operators.similarity import (
        const_double_array,
    )

    lit_vec = const_double_array(component)
    return F.aggregate(
        F.zip_with(F.col(embedding_col), lit_vec, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def projected_variances(
    df: DataFrame, embedding_col: str, model: PCAModel, k: int
) -> list[float]:
    """Sample variance of the corpus projected onto each of the top-k
    components — one aggregation job; for exact PCA these equal the
    top-k eigenvalues."""
    aggs = [
        F.var_samp(project_expr(embedding_col, model.components[:, i])).alias(f"v{i}")
        for i in range(k)
    ]
    row = df.agg(*aggs).collect()[0]
    return [float(row[f"v{i}"]) for i in range(k)]
