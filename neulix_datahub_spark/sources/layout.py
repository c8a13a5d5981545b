"""Partitioned table layout (SCALE.md; SURVEY §4.2 "date-partitioned
Parquet for events/orders at scale").

Hive-style partition directories give partition *pruning*: a filter on
the partition column eliminates whole directories before any file is
opened — the difference between scanning 100 TB and scanning one day.
The helpers derive the partition column (e.g. event date from a
timestamp), write the layout, and a compaction pass fixes the
small-files problem partitioned streaming sinks accrue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> str:
    """Write ``df`` partitioned by the date of ``ts_col``. Readers filter
    on ``partition_col`` (not the raw timestamp) to get pruning."""
    out = df.withColumn(partition_col, F.to_date(F.col(ts_col)))
    out.write.mode(mode).partitionBy(partition_col).parquet(path)
    return path


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> str:
    """General Hive-layout writer (choose low-cardinality, always-filtered
    columns; a high-cardinality partition key creates a directory per
    value and kills the metastore before it helps any query)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def read_partitioned(
    spark: SparkSession, path: str, prune: Column | None = None
) -> DataFrame:
    """Scan a partitioned layout; with ``prune`` on partition columns the
    plan shows PartitionFilters and skips the other directories."""
    df = spark.read.parquet(path)
    return df.filter(prune) if prune is not None else df


def compact_partitions(
    spark: SparkSession, path: str, target_files_per_partition: int = 1
) -> str:
    """Rewrite a partitioned layout with ``repartition`` inside each
    partition directory — the periodic maintenance job that undoes
    streaming's many-small-files. Uses a staging-dir swap like IO9."""
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    part_cols = [
        f.name for f in df.schema.fields
        if f.name in _partition_dirs(path)
    ]
    staging = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    if part_cols:
        # hash-repartition on (partition cols [+ salt]) puts each partition
        # value's rows into target_files tasks → that many files per dir
        salt = (F.floor(F.rand(42) * target_files_per_partition)).cast("int")
        writer = df.withColumn("__salt", salt).repartition(
            *[F.col(c) for c in part_cols], F.col("__salt")
        ).drop("__salt")
    else:
        writer = df.coalesce(target_files_per_partition)
    writer.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return path


def _partition_dirs(path: str) -> set[str]:
    """Partition column names present as hive-style dirs under ``path``."""
    import os

    names: set[str] = set()
    for entry in os.listdir(path):
        if "=" in entry and os.path.isdir(os.path.join(path, entry)):
            names.add(entry.split("=", 1)[0])
    return names


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> str:
    """Idempotent BACKFILL: rewrite only the partitions present in
    ``df``, leaving every other partition untouched — Spark's dynamic
    partition-overwrite mode, the semantics a daily re-run needs
    (re-processing 2024-01-07 must replace exactly that directory, not
    truncate the table the way static overwrite does).

    Scoped conf: the session's ``partitionOverwriteMode`` is set to
    ``dynamic`` for this write and restored after, so callers relying
    on the static default elsewhere are unaffected. Re-running the same
    backfill is a no-op state-wise (same rows land again) — the
    idempotence a retrying orchestrator (IO24 / Airflow) requires.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)
    return path


def zorder_key(
    bounds: dict[str, tuple[float, float]], bits: int = 16
) -> Column:
    """Morton (Z-order) interleave key over N numeric columns — the
    multi-column data-skipping complement to single-column clustering
    (Delta's OPTIMIZE ZORDER BY analogue). Each column is min/max-scaled
    to a ``bits``-bit integer rank, then the ranks' bits are interleaved
    round-robin; sorting by the key gives every listed column LOCALLY
    narrow parquet row-group min/max ranges, where a plain lexicographic
    sort only narrows its first column.

    Pure expression tree (shifts/ORs — ANSI-safe, no multiplication
    overflow; N·bits must fit 63 bits). Bounds are caller-supplied:
    at scale take them from table statistics or a cheap agg; values
    outside clamp to the edge rank, so stale bounds degrade locality,
    never correctness.
    """
    n = len(bounds)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    ranks = []
    for col, (lo, hi) in bounds.items():
        if not hi > lo:
            raise ValueError(f"bounds for {col} must satisfy lo < hi")
        span = float(hi) - float(lo)
        scaled = F.floor(
            (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(span)
            * F.lit(float((1 << bits) - 1))
        ).cast("long")
        ranks.append(
            F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled))
        )
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for j, r in enumerate(ranks):
            key = key.bitwiseOR(
                r.bitwiseAND(F.lit(1 << bit)).cast("long")
                * F.lit(1 << (bit * (n - 1) + j))
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` clustered by the Morton key of :func:`zorder_key` —
    Delta's ``OPTIMIZE ZORDER BY`` as a plain-parquet write. Range
    partitioning on the key splits the z-curve into contiguous spans
    (one per output file), and the within-partition sort tightens
    per-row-group min/max stats, so every listed column prunes files
    AND row groups; the key itself is dropped before writing (it is a
    layout artifact, not data).

    ``n_files=None`` lets range partitioning use the session's shuffle
    parallelism; at scale pass an explicit target (total_bytes /
    desired_file_size)."""
    key = zorder_key(bounds, bits)
    tagged = df.withColumn("__zorder", key)
    parted = (
        tagged.repartitionByRange(n_files, "__zorder")
        if n_files
        else tagged.repartitionByRange("__zorder")
    )
    (
        parted.sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode(mode)
        .parquet(path)
    )
    return path


def file_pruning_report(
    path: str, predicates: dict[str, tuple[float, float]]
) -> dict:
    """Measure what a layout actually buys: fraction of parquet FILES a
    conjunctive range predicate can skip using only footer min/max
    statistics — the same decision Spark's parquet reader makes, read
    directly from the footers so a layout change (write_zordered vs a
    lexicographic sort vs no clustering) can be scored without running
    a query. Driver-side metadata walk: O(files), no data scan.

    ``predicates`` maps column -> (lo, hi) inclusive probe range; a file
    survives only if EVERY probed column's [min, max] intersects its
    range. Returns {"n_files", "n_scanned", "skipped_frac"}.
    """
    import pathlib

    import pyarrow.parquet as pq

    files = sorted(pathlib.Path(path).glob("**/part-*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet part-files under {path}")
    scanned = 0
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        hit = False
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            stats = {
                row.column(i).path_in_schema: row.column(i).statistics
                for i in range(row.num_columns)
            }
            ok = True
            for col, (lo, hi) in predicates.items():
                st = stats.get(col)
                if st is None or st.min is None:
                    ok = True  # no stats -> cannot prune this column
                    continue
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            if ok:
                hit = True
                break
        scanned += 1 if hit else 0
    return {
        "n_files": len(files),
        "n_scanned": scanned,
        "skipped_frac": round(1.0 - scanned / len(files), 6),
    }
