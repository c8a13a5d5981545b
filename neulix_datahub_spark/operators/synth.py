"""Synthetic data generation (SURVEY §2.10 U1).

Reference: ``generate_synthetic_data`` (``core/utils/data_core.py:110-176``)
fits an SDV/CTGAN model on an input CSV, samples N rows, freezes the
non-mutable columns by copying them positionally from the original
(``data_core.py:163-166``), and re-sequences the id column from
``max(id)+1`` (``data_core.py:169-171``).

Spark-first decomposition:
- **fit** happens driver-side on a bounded sample (``limit(n).toPandas()``)
  — model fitting is a library call, not a distributed op;
- **sample** is distributed: each partition generates its shard inside
  ``mapInPandas`` (the model broadcast to executors);
- **freeze + re-sequence** are the J3 positional join + W1 sequence
  operators, pure DataFrame code.

SDV/CTGAN is not installed in this environment, so the model step is
pluggable: a deterministic bootstrap-resampling fallback (sampling rows
column-independently with a seeded hash) keeps the whole pipeline real
and testable; a CTGAN-backed sampler drops in behind the same interface
when the library is present.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

try:  # pragma: no cover - optional dependency, absent in this environment
    from sdv.metadata import SingleTableMetadata  # type: ignore # noqa: F401
    from sdv.single_table import CTGANSynthesizer  # type: ignore

    HAS_SDV = True
except Exception:  # pragma: no cover
    HAS_SDV = False


def _bootstrap_sampler(train: pd.DataFrame, seed: int) -> Callable[[int, int], pd.DataFrame]:
    """Fallback 'model': per-column independent bootstrap resampling —
    preserves marginal distributions, deterministic per (seed, shard)."""

    def sample(n: int, shard: int) -> pd.DataFrame:
        rng = __import__("numpy").random.default_rng(seed + shard)
        out = {}
        for c in train.columns:
            out[c] = train[c].sample(n=n, replace=True, random_state=int(rng.integers(2**31))).reset_index(drop=True)
        return pd.DataFrame(out)

    return sample


def _ctgan_sampler(train: pd.DataFrame, seed: int) -> Callable[[int, int], pd.DataFrame]:  # pragma: no cover
    meta = SingleTableMetadata()
    meta.detect_from_dataframe(train)  # schema inference, data_core.py:136-140
    model = CTGANSynthesizer(meta)
    model.fit(train)

    def sample(n: int, shard: int) -> pd.DataFrame:
        return model.sample(num_rows=n)

    return sample


def generate_synthetic_data(
    df: DataFrame,
    num_rows: int,
    mutable_columns: list[str],
    id_column: str,
    fit_sample_rows: int = 50_000,
    seed: int = 42,
) -> DataFrame:
    """U1: distributed synthetic-row generation.

    Mutable columns come from the (fitted) sampler; immutable columns are
    frozen positionally from the original rows (J3 — original row i donates
    its immutable values to synthetic row i, wrapping); the id column is
    re-sequenced from ``max(id)+1`` (W1). Generation fans out over
    ``mapInPandas`` shards so ``num_rows`` scales with the cluster, not
    the driver.
    """
    spark = df.sparkSession
    train = df.select(*mutable_columns).limit(fit_sample_rows).toPandas()
    sampler = (_ctgan_sampler if HAS_SDV else _bootstrap_sampler)(train, seed)

    n_shards = max(1, min(spark.sparkContext.defaultParallelism, num_rows))
    per_shard = [num_rows // n_shards + (1 if i < num_rows % n_shards else 0) for i in range(n_shards)]
    shards = spark.createDataFrame([(i, per_shard[i]) for i in range(n_shards)], "shard int, n int")

    mutable_schema = df.select(*mutable_columns).schema

    def gen(batches):
        for pdf in batches:
            # column zip, not iterrows: the shard frame is tiny (one
            # (shard, n) row per task) but iterrows materializes a
            # Series per row — zip reads the two columns directly
            for n, shard in zip(pdf["n"], pdf["shard"]):
                yield sampler(int(n), int(shard))

    synth = shards.repartition(n_shards, "shard").mapInPandas(gen, schema=mutable_schema)

    # J3 positional alignment: zip synthetic rows with original immutable
    # column values by row number (data_core.py:163-166). Both sides get
    # their ordinal from the TWO-PHASE partition-offset numbering
    # (sequence.with_sequential_id, order_by=None): per-partition local
    # ranks plus a broadcast prefix-sum of partition counts — no
    # unpartitioned window, so neither full table ever serializes
    # through a single task (the naive row_number-over-nothing plan
    # would, and at 100 TB that one task IS the job).
    from neulix_datahub_spark.operators.sequence import with_sequential_id

    immutable = [c for c in df.columns if c not in mutable_columns and c != id_column]
    synth_rn = with_sequential_id(synth, "__rn", start=1)
    if immutable:
        n_orig = df.count()
        orig_rn = with_sequential_id(df.select(*immutable), "__rn0", start=0)
        synth_rn = synth_rn.withColumn("__rn0", (F.col("__rn") - 1) % F.lit(n_orig)).join(
            orig_rn, "__rn0"
        ).drop("__rn0")

    # W1: id continuation from max(id)+1 (data_core.py:169-171).
    max_id = df.agg(F.max(id_column)).first()[0]
    start = (max_id if max_id is not None else -1) + 1
    out = synth_rn.withColumn(id_column, F.col("__rn") - 1 + F.lit(start)).drop("__rn")
    return out.select(id_column, *[c for c in df.columns if c != id_column])
