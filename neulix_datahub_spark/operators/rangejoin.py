"""Bucketed range join: points matched to (possibly overlapping)
intervals as an EQUI-join, not a theta join.

The reference's delegated-SQL surface (``core/utils/db_core.py:119-135``)
lets users write ``ON p.x BETWEEN i.lo AND i.hi`` and have the warehouse
execute it; Spark's only native physical strategy for that predicate is
BroadcastNestedLoopJoin (fine when one side is tiny, quadratic disaster
otherwise). This operator is the standard scale decomposition — the same
idea behind Databricks' range-join bin hints and PostGIS grid joins:

1. pick a bucket width ``W`` on the join dimension;
2. every interval ``[lo, hi]`` is expanded to the bucket ids it covers
   (``floor(lo/W) .. floor(hi/W)`` via ``sequence`` + ``explode``);
3. every point lands in exactly ONE bucket (``floor(x/W)``);
4. equi-join on the bucket id, then re-check the exact predicate.

Correctness: a point in bucket b can only match intervals covering b,
and every such interval emitted exactly one row for b — so the result is
row-for-row identical to the theta join, with NO dedup step needed (the
point side is never expanded). Proven against a literal theta join by
unit property tests and against a DuckDB theta-join oracle by the
``promo_window_revenue`` driver query.

Scale: shuffle is hash-partitioned on the bucket id — both sides
partition-parallel at any size. The expansion factor is
``avg_interval_len / W + 1`` rows per interval, so W tunes shuffle
volume against per-bucket fan-in; skew appears only if many intervals
cover one bucket AND many points land in it, which AQE's skew-join
split handles because it is an ordinary shuffled equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def _bucket_of(col: Column, width: int | float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int | float,
    how: str = "inner",
    point_key: str | None = None,
) -> DataFrame:
    """Join ``points`` to every interval with ``lo <= point <= hi``
    (inclusive bounds, the SQL BETWEEN contract) via bucketed equi-join.

    ``how`` supports ``inner`` and ``left``. A left join keeps unmatched
    points with null interval columns; it requires ``point_key`` (a
    UNIQUE key column in ``points``) because unmatched rows are
    recovered with an anti-join on that key — the bucket equi-join's own
    left rows would otherwise survive once per candidate bucket, and
    anti-joining on every point column would mis-handle nulls and
    duplicate rows.

    The join dimension must be numeric (cast dates to epoch days first);
    ``bucket_width`` must be > 0. Output columns: all point columns then
    all interval columns (names must not collide — callers alias
    beforehand, as with any join).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names collide across sides: {sorted(overlap)}")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    if how == "left" and point_key is None:
        raise ValueError("how='left' requires point_key (unique key in points)")

    expanded = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                _bucket_of(F.col(lo_col), bucket_width),
                _bucket_of(F.col(hi_col), bucket_width),
            )
        ),
    )
    pts = points.withColumn(_BUCKET, _bucket_of(F.col(point_col), bucket_width))
    matched = (
        pts.join(expanded, on=_BUCKET, how="inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop(_BUCKET)
    )
    if how == "inner":
        return matched
    # left: recover points with no matching interval at all via their key
    unmatched = points.join(
        matched.select(point_key).distinct(), on=point_key, how="left_anti"
    )
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(unmatched)


def suggest_bucket_width(
    intervals: DataFrame, lo_col: str, hi_col: str
) -> float:
    """Pick a bucket width from the interval-length distribution: the
    median length (floored at 1). Rationale: expansion factor per
    interval is len/W + 1, so W = median caps the typical interval at
    ~2 bucket rows while keeping per-bucket fan-in low; long-tail
    intervals expand proportionally more, which AQE's skew split
    absorbs because the join stays a plain shuffled equi-join. One tiny
    aggregation on the interval side (driver fetch of a single number —
    the interval table is the small side by construction; if it isn't,
    range_join is the wrong tool and you want the sweep-line form).
    """
    med = intervals.select(
        F.median(F.col(hi_col) - F.col(lo_col)).alias("m")
    ).first()["m"]
    if med is None:
        raise ValueError("empty interval table")
    return max(1.0, float(med))
