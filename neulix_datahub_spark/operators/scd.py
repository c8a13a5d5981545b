"""Slowly-changing-dimension maintenance (J2's history-keeping sibling).

The reference's upsert (``core/utils/db_core.py:304-331``) is SCD Type 1
— overwrite, history lost. This module adds the Type 2 form every
warehouse eventually needs: closing the previous version of a changed
row (``valid_to`` stamped, ``is_current`` dropped) and inserting the new
version, so joins can be made as-of any point in time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Apply one batch of ``updates`` (``key`` + ``attr_cols`` +
    ``ts_col``) to an SCD2 dimension with columns ``key + attr_cols +
    (valid_from, valid_to, is_current)``.

    Semantics per key (latest update in the batch wins; earlier ones in
    the same batch are superseded before any comparison):

    - attributes UNCHANGED vs the current row → no-op (no empty
      versions);
    - changed → the current row closes (``valid_to`` = update ts,
      ``is_current`` = false) and a new current version opens
      (``valid_from`` = update ts, open-ended);
    - new key → first version opens.

    Historical (already closed) rows pass through untouched. Plan: one
    window to pick the batch winner, one full join current-rows ⋈
    updates on the key (AQE broadcasts the update batch when small),
    struct equality for change detection — same shuffle shape as the
    Type 1 upsert, plus nothing.
    """
    val_struct = lambda side: F.struct(  # noqa: E731
        *[F.col(f"{side}.{c}") for c in attr_cols]
    )
    w = Window.partitionBy(key).orderBy(F.desc(ts_col))
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    current = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    j = current.alias("c").join(latest.alias("u"), on=key, how="full_outer")
    changed = F.col(f"u.{ts_col}").isNotNull() & (
        F.col("c.valid_from").isNull()  # new key
        | ~val_struct("c").eqNullSafe(val_struct("u"))
    )
    # surviving current rows: untouched keys + unchanged-attribute keys
    keep_current = j.filter(
        F.col("c.valid_from").isNotNull() & ~changed
    ).select(
        key, *[F.col(f"c.{c}") for c in attr_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.col("c.valid_to").alias("valid_to"),
        F.col("c.is_current").alias("is_current"),
    )
    closed = j.filter(F.col("c.valid_from").isNotNull() & changed).select(
        key, *[F.col(f"c.{c}") for c in attr_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.col(f"u.{ts_col}").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(changed).select(
        key, *[F.col(f"u.{c}") for c in attr_cols],
        F.col(f"u.{ts_col}").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.select(keep_current.columns).unionByName(keep_current).unionByName(
        closed
    ).unionByName(opened)


def scd2_init(
    df: DataFrame, key: str, attr_cols: list[str], valid_from: str
) -> DataFrame:
    """Bootstrap an SCD2 dimension: every row becomes the open first
    version effective at the ``valid_from`` date literal
    (``"YYYY-MM-DD"``; validity columns are DATE-typed — swap the casts
    for timestamps if sub-day grain is needed)."""
    return df.select(
        key, *attr_cols,
        F.lit(valid_from).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
) -> DataFrame:
    """Point-in-time (as-of) join: each fact row picks the dimension
    VERSION that was valid at its own timestamp — the query pattern SCD2
    exists for. Join on the key plus the validity interval
    (``valid_from <= ts < valid_to``, open-ended current rows match
    everything after their ``valid_from``).

    Plan shape: the interval predicate rides as a residual on the KEY
    hash join — never a cartesian range join — because versions of one
    key are few; per fact row at most one version matches (intervals
    are disjoint by construction of :func:`scd2_apply`). Facts earlier
    than a key's first version drop out (inner semantics); left-join
    via ``how``-style needs would wrap this."""
    ts = F.col(f"__f.{fact_ts}").cast("date")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__d.{key}"))
        & (ts >= F.col("__d.valid_from"))
        & (F.col("__d.valid_to").isNull() | (ts < F.col("__d.valid_to")))
    )
    return facts.alias("__f").join(dim.alias("__d"), cond).drop(
        F.col(f"__d.{key}")
    )
