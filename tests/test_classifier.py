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
    with pytest.raises(ValueError, match="non-NULL"):
        train_logistic_classifier(
            df.filter(F.lit(False)), ["f1"], "y", iters=1
        )
    # an all-NULL slice is refused with the same clear message (it used
    # to surface as an opaque TypeError from a NULL aggregate)
    with pytest.raises(ValueError, match="non-NULL"):
        train_logistic_classifier(
            df.select("y", F.lit(None).cast("int").alias("f1")),
            ["f1"],
            "y",
            iters=1,
        )
    with pytest.raises(ValueError, match="initial_weights"):
        train_logistic_classifier(
            df, ["f1"], "y", iters=1, initial_weights=[0.0, 0.0, 0.0]
        )


def test_warm_start_equals_continued_gd(spark):
    # the only training state is the weight vector, so
    # train(iters=a+b) == train(iters=a) then warm-start train(iters=b)
    # — BIT-identical, not approximately
    _, df = _toy(spark)
    full = train_logistic_classifier(df, ["f1", "f2"], "y", iters=8, lr=0.2)
    head = train_logistic_classifier(df, ["f1", "f2"], "y", iters=5, lr=0.2)
    resumed = train_logistic_classifier(
        df, ["f1", "f2"], "y", iters=3, lr=0.2, initial_weights=head
    )
    assert resumed == full


def test_null_rows_excluded_from_n(spark):
    # rows with a NULL feature or label contribute nothing to the
    # gradient sums AND are excluded from n (they used to dilute the
    # effective learning rate silently)
    rows, df = _toy(spark)
    nulls = spark.createDataFrame(
        [(1000, None, 1, 0), (1001, 2, None, 1), (1002, 1, 1, None)],
        "id long, f1 long, f2 long, y int",
    )
    got = train_logistic_classifier(
        df.unionByName(nulls), ["f1", "f2"], "y", iters=4, lr=0.2
    )
    want = train_logistic_classifier(df, ["f1", "f2"], "y", iters=4, lr=0.2)
    assert got == want


def test_sidecar_refresh_lifecycle(spark, tmp_path):
    # save → refresh twice on an unchanged relation == one 9-iter run
    # from zero; the sidecar pointer advances iters_done each commit
    from neulix_datahub_spark.operators.classifier import (
        load_classifier,
        refresh_classifier,
        save_classifier,
    )

    _, df = _toy(spark)
    path = str(tmp_path / "clf")
    w3 = train_logistic_classifier(df, ["f1", "f2"], "y", iters=3, lr=0.2)
    save_classifier(path, w3, ["f1", "f2"], "y", lr=0.2, quant=1_000_000,
                    iters_done=3)
    refresh_classifier(df, path, iters=3)
    meta = refresh_classifier(df, path, iters=3)
    assert meta["iters_done"] == 9
    assert meta["feature_cols"] == ["f1", "f2"]
    full = train_logistic_classifier(df, ["f1", "f2"], "y", iters=9, lr=0.2)
    assert meta["weights"] == full
    # JSON round-trip is exact (repr-based doubles)
    assert load_classifier(path)["weights"] == full


def test_stream_refresh_redelivery_guard(spark, tmp_path):
    # GD is not idempotent, so the streaming sink keeps a transactional
    # batch-id ledger: re-running the same bounded stream (fresh
    # checkpoint, so batch ids 0..n repeat) must NOT advance the weights
    import os
    import shutil

    from neulix_datahub_spark.operators.classifier import (
        load_classifier,
        save_classifier,
    )
    from neulix_datahub_spark.streaming.sinks import stream_classifier_refresh

    rows, df = _toy(spark)
    path = str(tmp_path / "model")
    w0 = train_logistic_classifier(df, ["f1", "f2"], "y", iters=2, lr=0.2)
    save_classifier(path, w0, ["f1", "f2"], "y", lr=0.2, quant=1_000_000,
                    iters_done=2)

    src = str(tmp_path / "src")
    os.makedirs(src)
    for name, flt, mtime in (("a", 0, 1_000_000), ("b", 1, 2_000_000)):
        stage = str(tmp_path / f"stage_{name}")
        df.filter(F.col("id") % 2 == flt).select("f1", "f2", "y").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        pf = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (mtime, mtime))

    def run(ckpt):
        stream = (
            spark.readStream.schema("f1 bigint, f2 bigint, y int")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_classifier_refresh(
            stream, path, iters_per_batch=2,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination()

    run("ckpt1")
    meta1 = load_classifier(path)
    assert meta1["iters_done"] == 6 and meta1["last_batch_id"] == 1
    # full redelivery under a fresh checkpoint: every batch id repeats,
    # every batch is skipped, state is untouched
    run("ckpt2")
    assert load_classifier(path) == meta1


def test_minibatch_single_batch_equals_full_batch(spark):
    # one batch value degenerates the schedule to full-batch GD —
    # bit-identical, because both paths share _gd_step
    from neulix_datahub_spark.operators.classifier import (
        train_logistic_classifier_minibatch,
    )

    _, df = _toy(spark)
    df1 = df.withColumn("mb", F.lit(0))
    got = train_logistic_classifier_minibatch(
        df1, ["f1", "f2"], "y", "mb", epochs=5, lr=0.2
    )
    want = train_logistic_classifier(df, ["f1", "f2"], "y", iters=5, lr=0.2)
    assert got == want


def test_minibatch_matches_pure_python_schedule(spark):
    # the deterministic schedule: ascending batch ids, each step's
    # update divided by the BATCH's own n — replayed in pure Python
    from neulix_datahub_spark.operators.classifier import (
        train_logistic_classifier_minibatch,
    )

    rows, df = _toy(spark)
    dfb = df.withColumn("mb", (F.col("id") % 3).cast("long"))
    got = train_logistic_classifier_minibatch(
        dfb, ["f1", "f2"], "y", "mb", epochs=2, lr=0.2
    )
    quant = 1_000_000
    batches = {}
    for i, f1, f2, y in rows:
        batches.setdefault(i % 3, []).append((f1, f2, y))
    w = [0.0, 0.0, 0.0]
    for _ in range(2):
        for b in sorted(batches):
            sl = batches[b]
            g = [0, 0, 0]
            for f1, f2, y in sl:
                z = w[0] + w[1] * f1 + w[2] * f2
                s = 1.0 / (1.0 + math.exp(-z))
                rq = math.floor(quant * (s - y))
                g[0] += rq
                g[1] += rq * f1
                g[2] += rq * f2
            w = [w[j] - 0.2 * (g[j] / (quant * len(sl))) for j in range(3)]
    assert got == w


def test_minibatch_refusals(spark):
    from neulix_datahub_spark.operators.classifier import (
        train_logistic_classifier_minibatch,
    )

    _, df = _toy(spark)
    dfb = df.withColumn("mb", F.lit(0))
    with pytest.raises(ValueError, match="epochs"):
        train_logistic_classifier_minibatch(
            dfb, ["f1", "f2"], "y", "mb", epochs=0
        )
    with pytest.raises(ValueError, match="initial_weights"):
        train_logistic_classifier_minibatch(
            dfb, ["f1", "f2"], "y", "mb", initial_weights=[0.0]
        )
    empty = dfb.filter(F.lit(False))
    with pytest.raises(ValueError, match="no rows"):
        train_logistic_classifier_minibatch(empty, ["f1", "f2"], "y", "mb")
