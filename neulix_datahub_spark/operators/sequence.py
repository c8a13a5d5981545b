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

Only step 2 touches the driver, with #partitions integers — this holds
at 100 TB. Partition-order ids need no shuffle at all; SORT-defined ids
(``order_by``) range-repartition first so each partition holds a
contiguous slice of the sort order, then apply the same offset trick —
``with_sorted_rank`` below, which since round 8 also powers sort-defined
cumulative sums (``with_running_total``) and exact quantile assignment
(``with_ntile``). No path funnels data through a single-partition
window anymore.
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

    ``order_by=None`` → two-phase partition-offset numbering in
    partition order (no shuffle of the data).
    ``order_by=[cols]`` → SORT-defined ids via :func:`with_sorted_rank`
    (range-repartition + local numbering + broadcast offsets) — since
    round 8 this path is scalable too; the single-partition window
    fallback it used to be is retired.
    """
    if order_by:
        ranked = with_sorted_rank(df, [F.col(c) for c in order_by], "__rk")
        return ranked.withColumn(
            id_col, F.col("__rk") - 1 + F.lit(start)
        ).drop("__rk")

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


def _range_numbered(df, order_by, num_partitions):
    """Shared phase 1 of the sort-defined two-phase operators: range-
    repartition on the sort key (ascending partition ids carry
    ascending key ranges) and label every row with its partition id.
    Each partition then holds a contiguous slice of the global sort
    order, so global ranks/cumulative sums decompose into a local
    window per partition plus one broadcast offset per partition.

    The ranged frame is localCheckpoint'ed (lazy): the caller
    references it TWICE (rows + per-partition counts), and
    ``repartitionByRange`` SAMPLES its boundaries — two independent
    plan evaluations may bucket rows into different ``__pid``s,
    silently corrupting the offsets. The checkpoint collapses both
    branches onto ONE physical RDD graph: its range-exchange (and so
    the boundary-sampling job) exists once, the shuffle map stage runs
    once per job, and any re-computation of a post-shuffle partition
    re-reads the same shuffle output — identical rows, identical
    ``__pid``s — so ``eager=False`` carries the same determinism as an
    eager materialization without running a job at operator-
    CONSTRUCTION time (registry enumeration and plan audits build
    these frames without ever executing them). ``persist()`` would pin
    the plan too, but a cache entry lives in the CacheManager until an
    explicit ``unpersist`` that no caller of a lazy operator can ever
    place — each call would leak a full-table cache for the session
    lifetime; checkpoint blocks are instead freed by the
    ContextCleaner when the frame is dropped. Trade (documented):
    lineage is truncated, so an executor loss mid-query re-runs the
    query instead of recomputing the partition — the standard
    localCheckpoint bargain this repo already takes in
    ``operators/graph.py``."""
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    return ranged, cols


def with_sorted_rank(
    df: DataFrame,
    order_by: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sort-defined, gap-free global ``row_number`` WITHOUT the
    single-partition window (`Window.orderBy` with no `partitionBy`
    funnels the whole table through one task — Spark itself warns).
    Two-phase: range-repartition on the sort key, ``row_number`` within
    each range partition, add the exclusive prefix-sum of partition
    COUNTS (a #partitions-row broadcast). Scales to any row count; the
    only single-task step is the prefix sum over #partitions integers.

    ``order_by`` must be a TOTAL order (include a tiebreak column) —
    exactly the requirement ``row_number`` itself has for a
    deterministic result.
    """
    ranked, _ = _ranked_with_counts(df, order_by, rank_col, num_partitions)
    return ranked


def _ranked_with_counts(df, order_by, rank_col, num_partitions):
    """with_sorted_rank plus the per-partition count relation it
    derived — callers needing the GRAND total (ntile's N) sum the
    counts instead of re-evaluating the input lineage."""
    ranged, cols = _range_numbered(df, order_by, num_partitions)
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    numbered = ranged.withColumn("__local", F.row_number().over(w_local))
    counts = numbered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    )
    ranked = (
        numbered.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(rank_col, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )
    return ranked, counts


def with_running_total(
    df: DataFrame,
    order_by: list,
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sort-defined INCLUSIVE cumulative sum of ``value_col`` without
    the single-partition window — the scalable spelling of
    ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``: local
    cumulative sum within each range partition plus the broadcast
    exclusive prefix-sum of partition TOTALS. Same contract as
    :func:`with_sorted_rank`: ``order_by`` must be a total order (ROWS
    framing over ties is order-dependent in every engine)."""
    ranged, cols = _range_numbered(df, order_by, num_partitions)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__lcum", F.sum(value_col).over(w_local))
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__t"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    )
    return (
        local.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(out_col, F.col("__lcum") + F.col("__off"))
        .drop("__pid", "__lcum", "__off")
    )


def with_ntile(
    df: DataFrame,
    order_by: list,
    n: int,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY ...)`` without the single-partition
    window: two-phase global ranks (:func:`with_sorted_rank`) plus the
    SQL-standard ntile formula computed from (rank, N) — the first
    ``N mod n`` tiles carry ``⌈N/n⌉`` rows, the rest ``⌊N/n⌋``, which
    is exactly how Spark's and every ANSI engine's ``ntile`` splits the
    remainder, so results are bit-identical to the window form. ``N``
    rides in as a broadcast single-row total, summed from the
    per-partition counts the rank already derived (reading the cached
    ranged frame — NOT re-evaluating the input lineage). Same
    total-order requirement as ``ntile`` itself."""
    ranked, counts = _ranked_with_counts(df, order_by, "__rk", num_partitions)
    tot = counts.agg(F.sum("__n").alias("__N"))
    big = F.col("__N") % n                 # tiles that get the extra row
    size_big = F.floor(F.col("__N") / n) + 1
    size_small = F.floor(F.col("__N") / n)
    in_big = F.col("__rk") <= big * size_big
    tile = F.when(
        in_big, F.floor((F.col("__rk") - 1) / size_big) + 1
    ).otherwise(
        big + F.floor((F.col("__rk") - big * size_big - 1) / size_small) + 1
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(out_col, tile.cast("int"))
        .drop("__rk", "__N")
    )


def continue_sequence(df: DataFrame, existing: DataFrame, id_col: str,
                      order_by: list[str] | None = None) -> DataFrame:
    """W1 exactly as the reference composes it: new rows continue from
    ``max(existing[id_col]) + 1`` (``data_core.py:169-171``)."""
    max_id = existing.agg(F.max(id_col)).first()[0]
    start = (max_id if max_id is not None else -1) + 1
    return with_sequential_id(df, id_col=id_col, start=start, order_by=order_by)
