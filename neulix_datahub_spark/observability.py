"""Operation metrics (parity with the reference's structured logging).

The reference logs every operation's counts/paths/sizes to Cloud Logging
(``core/configs/logs.py:24-107``; call sites like ``storage.py:138-140``)
— as separate eager passes over the data. The Spark-first form is
``df.observe``: named accumulator metrics collected DURING the action
(zero extra passes, zero extra shuffles), retrieved from the
``Observation`` handle afterwards and handed to whatever log sink the
deployment uses.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation


def with_metrics(
    df: DataFrame,
    metrics: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach named metrics to ``df``; they are computed as a side effect
    of the NEXT action on the returned frame (no extra job, unlike the
    reference's separate count/size calls).

    Default metrics mirror what the reference logs: row count and, for
    each numeric column, a null count.
    """
    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
        for f in df.schema.fields:
            metrics[f"nulls_{f.name}"] = F.count(F.lit(1)) - F.count(f.name)
    obs = Observation()
    first, *rest = [expr.alias(name) for name, expr in metrics.items()]
    return df.observe(obs, first, *rest), obs


def observed_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
    logger: Any | None = None,
) -> dict[str, Any]:
    """Write ``df`` and return the op-log record the reference would emit
    (rows written, per-column null counts, destination) — collected from
    the write itself, not a second pass. Pass a ``logs.StructuredLogger``
    to also emit the record as a severity-leveled log line (the
    reference's per-operation Cloud Logging call, ``storage.py:138-140``)."""
    observed, obs = with_metrics(df)
    observed.write.mode(mode).format(fmt).save(path)
    record = dict(obs.get)
    record["path"] = path
    record["format"] = fmt
    if logger is not None:
        logger.inf(f"wrote {record.get('n_rows', '?')} rows to {path}", **record)
    return record
