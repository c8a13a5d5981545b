"""Skew-mitigation utilities for the 100 TB design point.

AQE's skew-join splitting (on in session.py) handles most sort-merge
skew automatically, and partial aggregation handles skewed group keys.
These helpers are the *manual* tools for the cases AQE can't fix:
broadcast-ineligible dimension joins against pathologically hot keys,
and high-cardinality aggregations where one key dominates a partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with hot-key salting: the large/skewed ``left`` gets a
    random salt in [0, salt); the replicable ``right`` is exploded
    ``salt``× so every (key, salt) bucket finds its match. A key that
    would land on one reducer now spreads over ``salt`` of them, at the
    cost of shuffling ``right`` ``salt`` times — use when ``right`` is
    too big to broadcast but small enough to replicate.

    The salt only routes rows; join results are identical to a plain
    join (asserted in tests).
    """
    salted_left = left.withColumn(
        "__salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return salted_left.join(salted_right, on=[*on, "__salt"], how=how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation with explicit salting for re-aggregatable
    measures: phase 1 aggregates on (keys, salt) so a hot key spreads
    over ``salt`` reducers; phase 2 merges the partials.

    ``aggs`` maps output name → (phase-1 aggregate expression, merge)
    where merge is ``"sum"`` (for sum/count partials), ``"min"`` or
    ``"max"``. Not valid for non-decomposable aggregates (avg must be
    expressed as sum+count and divided afterwards).
    """
    mergers = {"sum": F.sum, "min": F.min, "max": F.max}
    phase1 = (
        df.withColumn("__salt", F.floor(F.rand(seed) * salt).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[merge](name).alias(name) for name, (_, merge) in aggs.items()]
    )
