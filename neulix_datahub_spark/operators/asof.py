"""As-of (time-series) join — a custom operator Spark lacks natively
(SURVEY §2.3 notes range/as-of joins absent from the reference; this is
the training-/event-data extension, the semantics of pandas
``merge_asof`` and DuckDB/kdb ASOF JOIN).

For each left row, attach the latest right row whose timestamp is <= the
left timestamp, per key. The naive formulation is a range join
(quadratic blow-up); the scalable form used here is union + window:

1. tag both sides and union them (same shuffle key: the join key),
2. one window pass ordered by (ts, tag) carries the most recent right
   payload forward (``last(..., ignorenulls=True)``),
3. keep left rows and unpack the carried payload.

One shuffle on the key, one sort within partitions — the plan a
1000-executor cluster wants: no per-row probing, no interval cross
product, skew bounded by events-per-key like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``right.on <= left.on``
    within each ``by`` group. Right columns (except ``by``/``on``) are
    appended, suffixed on collision; left rows with no earlier right row
    keep nulls (left-outer semantics).

    Ties (equal ``on``): the right row sorts before the left probe (tag
    0 < 1), so an exactly-simultaneous right row IS visible to the left
    row — matching DuckDB ASOF (>=) semantics.
    """
    r_payload_cols = [c for c in right.columns if c not in (by, on)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in r_payload_cols
    }

    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in r_payload_cols
            ) + ">"
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__tag"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns
            ) + ">"
        ).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("__r"),
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__r_carried", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return carried.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__r_carried")[c].alias(out_names[c]) for c in r_payload_cols],
    )
