"""In-engine quality-classifier TRAINING (SURVEY §2.11 L4+, round 11):
distributed full-batch logistic regression by gradient descent.

``operators/text.py::linear_quality_score`` applies a fixed linear
model; real pipelines (CCNet, GPT-3's WebText classifier, RefinedWeb)
TRAIN that model on weak labels. This module closes the loop without
leaving the engine: each GD iteration is ONE distributed aggregate
(map-side combined; the driver holds d+1 numbers per iteration — the
kmeans_lloyd driver-traffic discipline), so training cost is
iterations × one corpus scan, and the scan is a narrow projection of
integer features.

Cross-engine exactness — the FIXED-POINT GRADIENT trick (the
plan_token_budget_waterfall discipline applied to iterative ML): the
per-row residual ``sigmoid(w·x) − y`` is quantized to
``floor(quant · residual)`` BEFORE summation, so every gradient
component is an exact INTEGER sum — immune to the float-summation-
order divergence that makes naive cross-engine GD unreproducible
(Spark and DuckDB sum doubles in different orders; integer sums are
associative). The weight update is then two correctly-rounded double
ops (one int/int division — both engines produce the correctly
rounded true quotient for < 2^53 operands — and one fused
multiply-subtract chain in fixed order). ``exp`` is only faithfully
rounded across libms, but a 1-ulp sigmoid difference moves
``quant·residual`` by ~1e-10 at the default quant — the probability
any row's floor flips is ~1e-10 per row-iteration, negligible at
fixture scale and ORACLE-VISIBLE if it ever happens (a red driver row,
not silent drift).

Feature discipline: callers supply INTEGER feature columns of small
magnitude (centered, |x| ≲ 16 — see ``trained_classifier_stats`` for
the construction); plain GD needs comparable feature scales, and
integer features keep the gradient products exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_logistic_classifier", "logistic_score"]


def logistic_score(weights: list[float], feature_cols: list[str]) -> Column:
    """``sigmoid(b + Σ w_j·x_j)`` as a Column — the learned model as a
    codegen'd expression (scoring costs the same as any column math;
    the ``linear_quality_score`` stance). ``weights[0]`` is the bias;
    the sum folds left-to-right so the oracle can replay the identical
    operation order."""
    z: Column = F.lit(weights[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j + 1]) * F.col(c).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logistic_classifier(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 10,
    lr: float = 0.1,
    quant: int = 1_000_000,
) -> list[float]:
    """Full-batch GD from zero weights; returns
    ``[bias, w_1, …, w_d]``.

    Per iteration: one aggregate producing ``d+1`` exact integer
    gradient sums (see module docstring), one driver-side update of
    ``d+1`` floats. Nothing but those scalars ever leaves the
    executors."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    n = df.count()
    if n == 0:
        raise ValueError("cannot train on an empty relation")
    w = [0.0] * (len(feature_cols) + 1)
    qn = quant * n
    for _ in range(iters):
        z: Column = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j + 1]) * F.col(c).cast("double")
        s = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        rq = F.floor(
            F.lit(float(quant)) * (s - F.col(label_col).cast("double"))
        ).cast("long")
        aggs = [F.sum(rq).alias("g0")] + [
            F.sum(rq * F.col(c).cast("long")).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = df.agg(*aggs).first()
        w = [w[j] - lr * (row[f"g{j}"] / qn) for j in range(len(w))]
    return w
