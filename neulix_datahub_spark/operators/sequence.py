"""Sequential contiguous ID assignment (SURVEY §2.5 W1).

Reference: synthetic rows get ids ``range(max_id+1, max_id+1+len(df))``
(``core/utils/data_core.py:169-171``) — a global, gap-free sequence
continuing from an existing maximum.

A naive ``row_number()`` over a global window funnels every row through
one partition. The scalable spelling is the classic two-phase offset
(zipWithIndex reborn in DataFrame terms):

1. number rows *within* each partition (cheap, parallel, no shuffle),
2. compute per-partition row counts (tiny driver-side array),
3. add the exclusive prefix-sum offset of the row's partition.

Only step 2 touches the driver, with #partitions integers — this holds at
100 TB. The trade: ids follow partition order, not a sort order. When a
caller needs sort-defined ids, ``order_by`` switches to the global-window
form (documented as the serial fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sequential_id(
    df: DataFrame,
    id_col: str = "id",
    start: int = 0,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Add ``id_col`` with values ``start, start+1, ...`` gap-free.

    ``order_by=None`` → scalable two-phase partition-offset numbering.
    ``order_by=[cols]`` → deterministic global ordering (single-partition
    window for the final numbering; use for bounded or test data).
    """
    if order_by:
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn(id_col, F.row_number().over(w) - 1 + F.lit(start))

    pid = F.spark_partition_id()
    w_part = Window.partitionBy(pid).orderBy(F.monotonically_increasing_id())
    numbered = df.withColumn("__pid", pid).withColumn(
        "__local", F.row_number().over(w_part) - 1
    )
    counts = numbered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(id_col, F.col("__local") + F.col("__off") + F.lit(start))
        .drop("__pid", "__local", "__off")
    )


def continue_sequence(df: DataFrame, existing: DataFrame, id_col: str,
                      order_by: list[str] | None = None) -> DataFrame:
    """W1 exactly as the reference composes it: new rows continue from
    ``max(existing[id_col]) + 1`` (``data_core.py:169-171``)."""
    max_id = existing.agg(F.max(id_col)).first()[0]
    start = (max_id if max_id is not None else -1) + 1
    return with_sequential_id(df, id_col=id_col, start=start, order_by=order_by)
