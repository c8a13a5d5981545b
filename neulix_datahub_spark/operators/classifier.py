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

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_logistic_classifier",
    "train_logistic_classifier_minibatch",
    "logistic_score",
    "save_classifier",
    "load_classifier",
    "refresh_classifier",
]


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
    initial_weights: list[float] | None = None,
) -> list[float]:
    """Full-batch GD; returns ``[bias, w_1, …, w_d]``.

    Starts from zero weights, or from ``initial_weights`` (warm
    start — the incremental-refresh path: yesterday's persisted
    weights resume today's training; because the ONLY training state
    is the weight vector, ``train(iters=a+b)`` on a fixed relation is
    bit-identical to ``train(iters=a)`` followed by a warm start with
    ``iters=b`` — pinned by test).

    Rows with a NULL in any feature or the label are EXCLUDED up
    front (they contribute nothing to the integer gradient sums, so
    counting them in ``n`` would silently dilute the learning rate);
    training on a relation with no complete rows raises.

    Per iteration: one aggregate producing ``d+1`` exact integer
    gradient sums (see module docstring), one driver-side update of
    ``d+1`` floats. Nothing but those scalars ever leaves the
    executors."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    needed = [*feature_cols, label_col]
    cond = F.lit(True)
    for c in needed:
        cond = cond & F.col(c).isNotNull()
    df = df.filter(cond)
    n = df.count()
    if n == 0:
        raise ValueError(
            "cannot train: no rows with non-NULL values in every "
            f"feature/label column {needed}"
        )
    if initial_weights is None:
        w = [0.0] * (len(feature_cols) + 1)
    else:
        if len(initial_weights) != len(feature_cols) + 1:
            raise ValueError(
                f"initial_weights must have {len(feature_cols) + 1} "
                f"entries (bias + one per feature), got "
                f"{len(initial_weights)}"
            )
        w = [float(x) for x in initial_weights]
    for _ in range(iters):
        w = _gd_step(df, w, feature_cols, label_col, lr, quant, n)
    return w


def _gd_step(
    df: DataFrame,
    w: list[float],
    feature_cols: list[str],
    label_col: str,
    lr: float,
    quant: int,
    n: int,
) -> list[float]:
    """ONE GD iteration over ``df`` (already null-filtered) with the
    given row count in the update — the exact-integer-gradient step
    shared by full-batch and mini-batch training, so the two are
    bit-identical wherever their schedules coincide."""
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
    qn = quant * n
    return [w[j] - lr * (row[f"g{j}"] / qn) for j in range(len(w))]


def train_logistic_classifier_minibatch(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    batch_col: str,
    epochs: int = 1,
    lr: float = 0.1,
    quant: int = 1_000_000,
    initial_weights: list[float] | None = None,
) -> list[float]:
    """Mini-batch SGD (SURVEY §2.11 L4+, round 13): full-batch GD scans
    the WHOLE slice every iteration — iters × corpus scans; mini-batch
    takes one step per batch, so an epoch touches each row once while
    taking ``n_batches`` weight updates. At equal update count the
    per-epoch scan cost drops ``n_batches``-fold.

    The schedule is DETERMINISTIC and content-addressed (the
    epoch-shuffle discipline, not partition order): batches are the
    distinct values of ``batch_col`` in ascending order — callers
    derive the column from a content hash (md5 salt, the hash_split
    recipe) so both engines and every rerun walk the identical
    sequence. Each step's update divides by the BATCH's own row count
    (the per-phase ``n`` the warm-start oracle already models), so the
    whole trajectory unrolls as one-iteration phases in the DuckDB
    oracle. With a single batch value the schedule degenerates to
    full-batch GD — bit-identical to ``train_logistic_classifier``
    (unit-pinned), because both paths share :func:`_gd_step`.

    Per step: one 4-integer aggregate over the batch slice + a
    driver-side update of d+1 floats. Callers should pin the feature
    projection (``localCheckpoint``) so per-step filters re-scan a
    narrow cached relation, not the text pipeline; at warehouse scale
    the projection would be WRITTEN partitioned by ``batch_col`` so
    each step's filter is partition pruning."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    needed = [*feature_cols, label_col, batch_col]
    cond = F.lit(True)
    for c in needed:
        cond = cond & F.col(c).isNotNull()
    df = df.filter(cond)
    counts = sorted(
        (r[batch_col], r["n"])
        for r in df.groupBy(batch_col).agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not counts:
        raise ValueError(
            "cannot train: no rows with non-NULL values in every "
            f"feature/label/batch column {needed}"
        )
    if len(counts) > 4096:
        raise ValueError(
            f"{len(counts)} distinct {batch_col!r} values — the batch "
            "schedule is driver-held; hash into <= 4096 batches"
        )
    if initial_weights is None:
        w = [0.0] * (len(feature_cols) + 1)
    else:
        if len(initial_weights) != len(feature_cols) + 1:
            raise ValueError(
                f"initial_weights must have {len(feature_cols) + 1} "
                f"entries (bias + one per feature), got "
                f"{len(initial_weights)}"
            )
        w = [float(x) for x in initial_weights]
    for _ in range(epochs):
        for val, n in counts:
            w = _gd_step(
                df.filter(F.col(batch_col) == F.lit(val)),
                w, feature_cols, label_col, lr, quant, n,
            )
    return w


_CLASSIFIER_META = "_CLASSIFIER_META.json"


def save_classifier(
    path: str,
    weights: list[float],
    feature_cols: list[str],
    label_col: str,
    lr: float,
    quant: int,
    iters_done: int,
    extra: dict | None = None,
) -> None:
    """Persist a trained model as a weights sidecar under ``path``
    (created if absent). Write-then-rename: the pointer flip is the
    commit point (the passage-index / bpe-resume discipline), so a
    crashed save never leaves a half-written sidecar. JSON doubles
    round-trip exactly (repr-based), so ``load → refresh`` continues
    GD from bit-identical weights."""
    os.makedirs(path, exist_ok=True)
    meta = dict(extra or {})
    meta.update({
        "weights": [float(x) for x in weights],
        "feature_cols": list(feature_cols),
        "label_col": label_col,
        "lr": float(lr),
        "quant": int(quant),
        "iters_done": int(iters_done),
    })
    tmp = os.path.join(path, _CLASSIFIER_META + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(path, _CLASSIFIER_META))


def load_classifier(path: str) -> dict:
    """The persisted model: ``{weights, feature_cols, label_col, lr,
    quant, iters_done}``."""
    with open(os.path.join(path, _CLASSIFIER_META), encoding="utf-8") as f:
        return json.load(f)


def refresh_classifier(
    df: DataFrame,
    path: str,
    iters: int = 10,
    extra_update: dict | None = None,
) -> dict:
    """Incremental refresh (SURVEY §2.11 L4+, round 12): warm-start GD
    from the persisted weights against (today's) ``df``, then commit
    the advanced weights back to the sidecar.

    ``extra_update`` entries are merged into the sidecar's extra keys
    IN THE SAME atomic rename as the advanced weights — this is how
    the streaming sink records its ``last_batch_id`` ledger entry
    transactionally (a two-write commit would leave a window where
    advanced weights carry the stale ledger, so checkpoint-recovery
    redelivery would double-apply the batch).

    The reference's operating model is a daily DAG
    (neulix_dataflow/dags/wikipedia_dag.py:20-23: the same pipeline
    re-runs per day); a classifier that retrains from zero every day
    wastes every prior epoch. Because GD's only state is the weight
    vector, ``refresh`` on an UNCHANGED relation is bit-identical to
    having trained ``iters_done + iters`` rounds from zero in one
    session (pinned by test + the ``classifier_refresh_stats`` driver
    oracle); on a grown relation it is plain warm-started training.

    Hyperparameters (``lr``, ``quant``, feature/label columns) are
    frozen in the sidecar at first save — a refresh under different
    ones would silently change the optimization problem, so they are
    not parameters here.
    """
    meta = load_classifier(path)
    w = train_logistic_classifier(
        df,
        meta["feature_cols"],
        meta["label_col"],
        iters=iters,
        lr=meta["lr"],
        quant=meta["quant"],
        initial_weights=meta["weights"],
    )
    core = {"weights", "feature_cols", "label_col", "lr", "quant",
            "iters_done"}
    save_classifier(
        path,
        w,
        meta["feature_cols"],
        meta["label_col"],
        meta["lr"],
        meta["quant"],
        meta["iters_done"] + iters,
        extra={
            **{k: v for k, v in meta.items() if k not in core},
            **(extra_update or {}),
        },
    )
    return load_classifier(path)
