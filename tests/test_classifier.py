"""In-engine logistic-regression training (operators/classifier.py):
the fixed-point-gradient GD must replay EXACTLY in pure Python, loss
must decrease, and the refusals must hold."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.classifier import (
    logistic_score,
    train_logistic_classifier,
)


def _toy(spark):
    # y correlates with f1; f2 is noise-ish
    rows = [
        (i, (i % 7) - 3, (i * 5) % 4 - 2, 1 if (i % 7) >= 4 else 0)
        for i in range(60)
    ]
    return rows, spark.createDataFrame(
        rows, "id long, f1 long, f2 long, y int"
    )


def _ref_train(rows, iters, lr, quant):
    w = [0.0, 0.0, 0.0]
    n = len(rows)
    for _ in range(iters):
        g = [0, 0, 0]
        for _, f1, f2, y in rows:
            z = w[0] + w[1] * f1 + w[2] * f2
            s = 1.0 / (1.0 + math.exp(-z))
            rq = math.floor(quant * (s - y))
            g[0] += rq
            g[1] += rq * f1
            g[2] += rq * f2
        w = [w[j] - lr * (g[j] / (quant * n)) for j in range(3)]
    return w


def test_training_matches_pure_python_exactly(spark):
    rows, df = _toy(spark)
    got = train_logistic_classifier(df, ["f1", "f2"], "y", iters=6, lr=0.2)
    want = _ref_train(rows, 6, 0.2, 1_000_000)
    # bit-exact: every gradient is an integer sum, every update the
    # same two correctly-rounded double ops
    assert got == want


def test_loss_decreases_with_iterations(spark):
    rows, df = _toy(spark)

    def loss(w):
        tot = 0.0
        for _, f1, f2, y in rows:
            s = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * f1 + w[2] * f2)))
            s = min(max(s, 1e-12), 1 - 1e-12)
            tot += -(y * math.log(s) + (1 - y) * math.log(1 - s))
        return tot / len(rows)

    w2 = train_logistic_classifier(df, ["f1", "f2"], "y", iters=2, lr=0.2)
    w10 = train_logistic_classifier(df, ["f1", "f2"], "y", iters=10, lr=0.2)
    assert loss(w10) < loss(w2) < loss([0.0, 0.0, 0.0])


def test_scoring_column_matches_weights(spark):
    rows, df = _toy(spark)
    w = train_logistic_classifier(df, ["f1", "f2"], "y", iters=4, lr=0.2)
    got = {
        r["id"]: r["s"]
        for r in df.select("id", logistic_score(w, ["f1", "f2"]).alias("s"))
        .collect()
    }
    for i, f1, f2, _ in rows:
        want = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * f1 + w[2] * f2)))
        assert abs(got[i] - want) < 1e-12


def test_refusals(spark):
    _, df = _toy(spark)
    with pytest.raises(ValueError, match="iters"):
        train_logistic_classifier(df, ["f1"], "y", iters=0)
    with pytest.raises(ValueError, match="empty"):
        train_logistic_classifier(
            df.filter(F.lit(False)), ["f1"], "y", iters=1
        )
