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
    streaming's many-small-files.

    The rewrite preserves the FULL partitioning, at every nesting level
    (``_partition_cols`` walks the directory chain — a top-level-only
    scan would silently demote inner partition columns to data columns,
    losing their pruning). The swap is rename-aside: the old layout is
    renamed away only AFTER the replacement exists, and removed only
    after the replacement is installed — a crash mid-swap leaves either
    the old layout live or a ``.__old_*`` residue next to the new one,
    never a window with no table at the published path. (Concurrent
    READERS racing a maintenance rewrite still need the snapshot layer;
    this is a quiesced-maintenance job like Delta OPTIMIZE.)"""
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    part_cols = _partition_cols(path)
    token = uuid.uuid4().hex[:8]
    staging = f"{path.rstrip('/')}.__compact_{token}"
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
    old = f"{path.rstrip('/')}.__old_{token}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return path


def _partition_cols(path: str) -> list[str]:
    """Hive partition column names under ``path``, OUTERMOST FIRST, by
    walking one directory chain — the writer lays every level as a
    ``key=value`` dir, so one branch names them all in order."""
    import os

    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            e for e in os.listdir(cur)
            if "=" in e and os.path.isdir(os.path.join(cur, e))
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = os.path.join(cur, subdirs[0])


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


# ---------------------------------------------------------------------------
# File-level Bloom index: data skipping for point lookups where min/max
# footers are useless
# ---------------------------------------------------------------------------


def build_file_bloom_index(
    spark,
    path: str,
    key_col: str,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> "DataFrame":
    """One Bloom bitmap PER PARQUET PART-FILE over ``key_col`` —
    ``(file, bitmap map<int,long>)`` — the data-skipping structure for
    high-cardinality POINT lookups, where footer min/max stats prune
    nothing (uniformly distributed keys span every file's range; this
    is exactly the gap Delta's bloom filter index and Iceberg's
    bloom-filtered positional indexes fill). Pays off on layouts that
    CLUSTER the key (``repartition(n, key)`` / bucketing): the key's
    rows live in few files, so a probe skips the rest.

    Plan: one scan with ``input_file_name()``, k bit positions per row,
    a partial-aggregated ``bit_or`` per (file, word) — shuffle carries
    at most files × num_bits/64 words. The index is itself a DataFrame:
    persist it next to the table and it is one more parquet table, time
    travel and all.
    """
    from neulix_datahub_spark.operators.sketches import _bloom_positions

    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), F.col(key_col).alias("__k")
    )
    pos = F.explode(F.array(*_bloom_positions(F.col("__k"), num_bits, num_hashes)))
    return (
        df.select("file", pos.alias("pos"))
        .select(
            "file",
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, pos & 63)").alias("bit"),
        )
        .groupBy("file", "word")
        .agg(F.bit_or("bit").alias("bits"))
        .groupBy("file")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(
                "bitmap"
            )
        )
    )


def read_with_file_bloom(
    spark,
    index: "DataFrame",
    key_col: str,
    values: list,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
    key_type: str = "bigint",
) -> "tuple[DataFrame, int, int]":
    """Point-lookup read through the file Bloom index: keep only files
    whose bitmap might contain AT LEAST ONE probe value, read just
    those, and re-apply the exact predicate (false positives read a
    file for nothing; false negatives are impossible — Bloom negatives
    are exact, so the result EQUALS the full-scan filter, which is what
    the driver query hashes). Returns (df, n_files_total, n_files_read).

    ``key_type`` must match the indexed column's Spark type exactly:
    xxhash64 hashes an int literal and a bigint column DIFFERENTLY, so
    an uncast probe silently misses every bitmap.

    The collect here is FILE PATHS ONLY — bounded by the index size,
    the same driver-state class as a manifest listing; row data never
    moves until the pruned read.
    """
    from functools import reduce

    from neulix_datahub_spark.operators.sketches import bloom_might_contain

    # an empty probe list reads nothing — same documented empty result
    # as "no file survived the bitmaps", not a reduce() TypeError
    keep = reduce(
        lambda a, b: a | b,
        [
            bloom_might_contain(
                F.lit(v).cast(key_type),
                F.col("bitmap"),
                num_bits=num_bits,
                num_hashes=num_hashes,
            )
            for v in values
        ],
        F.lit(False),
    )
    n_total = index.count()
    files = [r.file for r in index.filter(keep).select("file").collect()]
    if not files:
        empty = spark.read.parquet(*[r.file for r in index.select("file").collect()])
        return empty.filter(F.col(key_col).isin(values)).limit(0), n_total, 0
    df = spark.read.parquet(*files).filter(F.col(key_col).isin(values))
    return df, n_total, len(files)


# ---------------------------------------------------------------------------
# Gap-driven backfill: fill only the partitions that are missing
# ---------------------------------------------------------------------------


def existing_partition_values(path: str, partition_col: str) -> set[str]:
    """Partition VALUES present on disk for one hive-style partition
    column (``col=value`` directories) — the physical truth a backfill
    planner diffs against, read without any Spark job."""
    import os

    if not os.path.isdir(path):
        return set()
    prefix = f"{partition_col}="
    return {
        e[len(prefix):]
        for e in os.listdir(path)
        if e.startswith(prefix) and os.path.isdir(os.path.join(path, e))
    }


def backfill_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    expected_values: list[str],
    producer,
) -> dict:
    """Idempotent gap-driven backfill — the orchestration pattern the
    reference delegates to Airflow schedule catch-up, as an engine
    operator: diff the EXPECTED partition values against what exists on
    disk, call ``producer(spark, value) -> DataFrame`` only for the
    missing ones, and land each via dynamic partition overwrite
    (``overwrite_partitions``) so a crashed/retried fill replaces
    exactly its own directory. A re-run with no gaps does zero work —
    the no-op idempotence a retrying scheduler requires (IO24).

    Returns {"filled": [...], "already_present": [...]} (sorted).
    """
    have = existing_partition_values(path, partition_col)
    missing = [v for v in expected_values if v not in have]
    for v in missing:
        part = producer(spark, v)
        if partition_col not in part.columns:
            part = part.withColumn(partition_col, F.lit(v))
        overwrite_partitions(part, path, [partition_col])
    return {
        "filled": sorted(missing),
        "already_present": sorted(v for v in expected_values if v in have),
    }


def partition_freshness(path: str, ts_col: str) -> list[dict]:
    """Per-partition data freshness from parquet FOOTERS alone — the
    SLA monitor a 100 TB table needs to answer "which days are stale /
    missing / short" without scanning a byte of data: for every
    hive-style partition directory, the max of ``ts_col``'s row-group
    max statistics and the footer row counts. Driver-side O(files)
    metadata walk, same cost class as file_pruning_report.

    Returns [{partition, max_ts, n_rows, n_files}, ...] sorted by
    partition value.
    """
    import pathlib

    import pyarrow.parquet as pq

    root = pathlib.Path(path)
    out = []
    for part_dir in sorted(p for p in root.iterdir() if p.is_dir() and "=" in p.name):
        max_ts = None
        n_rows = 0
        files = list(part_dir.glob("*.parquet"))
        for f in files:
            md = pq.ParquetFile(str(f)).metadata
            n_rows += md.num_rows
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for i in range(row.num_columns):
                    col = row.column(i)
                    if col.path_in_schema == ts_col and col.statistics is not None:
                        mx = col.statistics.max
                        if mx is not None and (max_ts is None or mx > max_ts):
                            max_ts = mx
        out.append(
            {
                "partition": part_dir.name.split("=", 1)[1],
                "max_ts": max_ts,
                "n_rows": n_rows,
                "n_files": len(files),
            }
        )
    return out
