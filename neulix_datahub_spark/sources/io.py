"""File IO operators (SURVEY §2.1 IO1–IO7, IO5 sniffing, IO10/IO11 behaviors).

Reference semantics being re-expressed (citations into /root/reference/):

- Parquet scan/sink: ``core/utils/data_core.py:49-55,73-79`` (snappy default).
- CSV scan/sink with delimiter: ``core/utils/data_core.py:57-71``.
- Delimiter sniffing with bad-line tolerance: ``core/utils/db_core.py:85-95``
  (try ``,``/``;``/``\\t``; first that yields >1 column wins).
- JSON sink, UTF-8: ``core/utils/data_core.py:81-87``.
- Text read/write: ``core/utils/data_core.py:89-105``.
- Load behaviors ``fail|replace|append``: ``core/utils/db_core.py:74-117,339-367``.

Scale notes: the sniffing probe reads ONE line (``limit(1)`` on a text
scan — Spark stops the scan at the first row; no full pass), never the
file body. All writes go through Spark's committers, so they parallelize
and are atomic per-directory at cluster scale.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_CANDIDATE_DELIMITERS = (",", ";", "\t")

# Reference loading_behavior → Spark save mode (db_core.py:96-98,104-113).
LOAD_BEHAVIORS = {
    "fail": "errorifexists",
    "replace": "overwrite",
    "append": "append",
}


def warehouse_scratch(
    spark: SparkSession, prefix: str, stale_seconds: float = 3600.0
) -> str:
    """Create a scratch directory under ``spark.sql.warehouse.dir`` — the
    root every deployment shares between driver and executors, so
    executor-side writes and driver read-backs resolve to the same
    place (tempfile.mkdtemp only works in local mode). Each call also
    opportunistically sweeps same-prefix siblings whose mtime is older
    than ``stale_seconds``, so repeated demo/bench runs don't grow the
    warehouse without bound (the grace window protects concurrent
    runs, same policy as ``snapshots.vacuum_snapshots``)."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file://").removeprefix("file:")
    cutoff = time.time() - stale_seconds
    if os.path.isdir(wh):
        for d in os.listdir(wh):
            p = os.path.join(wh, d)
            try:
                if d.startswith(prefix) and os.path.getmtime(p) <= cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except FileNotFoundError:
                continue
    path = os.path.join(wh, f"{prefix}{uuid.uuid4().hex}")
    os.makedirs(path, exist_ok=True)
    return path


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """IO1: parquet scan (reference ``data_core.py:73-79``)."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> str:
    """IO2/IO16: parquet sink, snappy default (``data_core.py:49-55``,
    ``storage.py:99-127``). Returns the path like the reference does."""
    df.write.mode(mode).option("compression", compression).parquet(path)
    return path


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | tuple[str, ...],
    mode: str = "overwrite",
    compression: str = "snappy",
    cluster_cols: list[str] | tuple[str, ...] | None = None,
    bloom_filter_cols: list[str] | tuple[str, ...] | None = None,
) -> str:
    """IO2 at the 100 TB layout tier: Hive-style partitioned parquet
    (``path/col=value/part-*.parquet``) — the date-partitioned layout
    SURVEY §6 names for events/orders at scale. A filter on a partition
    column prunes whole directories at PLANNING time (``PartitionFilters``
    on the scan, no file of a non-matching partition is even listed), and
    joins against a partition-column filter prune dynamically at runtime
    (DPP). The reference's flat per-table objects
    (``core/utils/storage.py:99-127``) have no equivalent — every scan
    reads the full table.

    Choose LOW-cardinality columns (a date: ~365 dirs/year); a
    high-cardinality partition column explodes into millions of tiny
    files and kills the listing phase.

    Two optional DATA-SKIPPING knobs for filters on non-partition
    columns (directory pruning can't help those):

    - ``cluster_cols``: sort rows by these columns within each output
      task. Parquet stores min/max per row group; clustering makes
      those ranges narrow and disjoint, so a selective filter on a
      clustered column skips whole row groups at scan time (the poor
      man's Z-order — exact for one column, still effective for a
      short prefix list).
    - ``bloom_filter_cols``: write a parquet bloom filter per listed
      column — point-lookup (`=`/IN) skipping for high-cardinality
      columns where min/max ranges are too wide to help.
    """
    w = df
    if cluster_cols:
        # The dynamic-partition writer requires rows ordered by the
        # partition columns and inserts its own (non-stable) sort when
        # they aren't — which would destroy the clustering. Sorting by
        # (partition cols, cluster cols) satisfies that requirement, so
        # the writer skips its sort and the cluster order survives into
        # the files.
        w = w.sortWithinPartitions(*partition_cols, *cluster_cols)
    writer = w.write.mode(mode).option("compression", compression)
    for c in bloom_filter_cols or ():
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.partitionBy(*partition_cols).parquet(path)
    return path


def compact_partitioned_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_cols: list[str] | tuple[str, ...],
    files_per_partition: int = 1,
) -> dict[str, int]:
    """Small-file compaction for the Hive-partitioned layout: rewrite
    ``src`` into ``dst`` with exactly ``files_per_partition`` parquet
    files per partition value. Every incremental writer (streaming
    micro-batches, per-task commits) fragments a partition into
    task-count files; at 100 TB the listing + footer overhead of
    millions of small files dominates scan setup, and compaction is the
    standard maintenance job (Delta OPTIMIZE / Iceberg rewrite_data_files
    do exactly this rewrite).

    One shuffle: rows repartition on (partition cols + a deterministic
    hash-salt in [0, files_per_partition)), so each output task holds
    complete output files — no post-hoc merge. Raise
    ``files_per_partition`` when single partitions exceed a healthy
    file size (~1 GB). Returns {"files_before", "files_after",
    "rows"} for the maintenance log. ``dst`` must differ from ``src``
    (immutable rewrite; swap via rename or snapshot pointer publish)."""
    import glob as _glob

    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("compaction rewrites immutably: dst must differ from src")
    if files_per_partition < 1:
        raise ValueError(
            f"files_per_partition must be >= 1, got {files_per_partition} "
            "(pmod by 0 would NULL the salt instead of failing)"
        )
    df = spark.read.parquet(src)
    data_cols = [c for c in df.columns if c not in partition_cols]
    if not data_cols:
        # Spark itself refuses to WRITE an all-partition-column layout
        # (ALL_PARTITION_COLUMNS_NOT_ALLOWED); failing here names the
        # real problem instead of a zero-arg F.hash() AnalysisException
        raise ValueError(
            "every column is a partition column — such a layout cannot "
            "be written by Spark, nothing to compact"
        )
    salt = F.pmod(
        F.hash(*[F.col(c) for c in data_cols]), F.lit(files_per_partition)
    )
    (
        df.repartition(*[F.col(c) for c in partition_cols], salt)
        .write.mode("errorifexists")
        .partitionBy(*partition_cols)
        .parquet(dst)
    )
    count_files = lambda p: len(  # noqa: E731
        [f for f in _glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)]
    )
    return {
        "files_before": count_files(src),
        "files_after": count_files(dst),
        "rows": spark.read.parquet(dst).count(),
    }


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """IO1 sibling: ORC scan — the second columnar format Spark ships
    natively (vectorized reader, predicate pushdown via ORC
    min/max/bloom indexes). No reference analogue (its storage tier is
    parquet/CSV objects, ``storage.py:99-127``); provided so a
    warehouse standardized on ORC (Hive estates, typically) can land on
    this engine without a format migration."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> str:
    """IO2 sibling: ORC sink (see :func:`read_orc`). Same committer
    semantics as the parquet sink — parallel, atomic per directory."""
    df.write.mode(mode).option("compression", compression).orc(path)
    return path


def read_parquet_or_empty(spark: SparkSession, path: str) -> DataFrame:
    """IO17: parquet scan that yields an EMPTY (zero-column) DataFrame on a
    missing path instead of raising — the reference's GCS-read guard
    (``storage.py:153-194``, returns ``pd.DataFrame()`` when absent)."""
    if not os.path.exists(path):
        return spark.createDataFrame([], "struct<>")
    return spark.read.parquet(path)


def bulk_load(
    spark: SparkSession,
    manifest: dict[str, str],
    loading_behavior: str = "replace",
) -> dict[str, str]:
    """IO12: multi-file load driven by a {source_path: destination_table}
    manifest (the reference hardcodes entities/instances/invoices/... in
    ``upload_raw_files_to_bq``, ``db_core.py:137-185``). Pure driver
    loop over IO10; per-entry failures are recorded, not raised, matching
    the reference's warn-and-continue."""
    results: dict[str, str] = {}
    for src, dest in manifest.items():
        try:
            df = (
                read_csv_sniffed(spark, src)
                if src.endswith(".csv")
                else spark.read.parquet(src)
            )
            write_table(df, dest, loading_behavior)
            results[src] = "ok"
        except Exception as e:  # noqa: BLE001 - reference warns and continues
            results[src] = f"error: {type(e).__name__}"
    return results


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    infer_schema: bool = True,
    schema=None,
) -> DataFrame:
    """IO3: CSV scan (``data_core.py:65-71``). PERMISSIVE mode mirrors the
    reference's ``on_bad_lines='warn'`` tolerance (``db_core.py:92``)."""
    reader = spark.read.option("header", header).option("sep", delimiter).option(
        "mode", "PERMISSIVE"
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, delimiter: str = ",", mode: str = "overwrite"
) -> str:
    """IO4: CSV sink (``data_core.py:57-63``)."""
    df.write.mode(mode).option("header", True).option("sep", delimiter).csv(path)
    return path


def sniff_delimiter(
    spark: SparkSession,
    path: str,
    candidates: tuple[str, ...] = DEFAULT_CANDIDATE_DELIMITERS,
) -> str:
    """IO5 probe: pick the first candidate delimiter that splits the header
    into >1 column (``db_core.py:85-95``).

    Reads exactly one line via ``limit(1)`` — at 100 TB this stays a
    single-split, single-row scan; no full pass happens before the real
    read.

    The probe splits with the stdlib csv reader, which honors QUOTING —
    a raw str.split would see the comma inside '"last,first";age' and
    pick ',' before ';' is ever tried, garbling the whole parse. No
    candidate producing >1 column raises (the reference's posture: a
    file none of the candidates can split is a malformed input, not a
    silent comma-delimited guess).
    """
    import csv as _csv

    first = spark.read.text(path).limit(1).collect()
    header = first[0][0] if first else ""
    for sep in candidates:
        try:
            cells = next(_csv.reader([header], delimiter=sep), [])
        except _csv.Error:
            continue
        if len(cells) > 1:
            return sep
    raise ValueError(
        f"no candidate delimiter {candidates!r} splits the header of "
        f"{path!r} into more than one column"
    )


def read_csv_sniffed(
    spark: SparkSession,
    path: str,
    candidates: tuple[str, ...] = DEFAULT_CANDIDATE_DELIMITERS,
    **kwargs,
) -> DataFrame:
    """IO5: CSV scan with delimiter sniffing + bad-line tolerance."""
    return read_csv(spark, path, delimiter=sniff_delimiter(spark, path, candidates), **kwargs)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON scan (companion of IO6)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """IO6: JSON sink; Spark writes UTF-8 natively (reference needed
    ``force_ascii=False``, ``data_core.py:86``)."""
    df.write.mode(mode).json(path)
    return path


def read_json_permissive(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON scan with the reference's warn-don't-fail posture
    (``on_bad_lines='warn'``, db_core.py:90) mapped to Spark's
    PERMISSIVE mode: malformed lines land whole in ``corrupt_col``
    (their typed columns null) instead of killing the 100 TB job;
    callers split good/bad with ``corrupt_col IS NULL``. The corrupt
    column must be declared in the schema — with an inferred schema
    Spark silently drops unparseable rows under ANSI, which is exactly
    the silent data loss this helper exists to prevent."""
    full = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """IO7: text scan → one ``value`` string column (``data_core.py:89-97``)."""
    return spark.read.text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """IO7: text sink (``data_core.py:99-105``); df must be single string col."""
    df.write.mode(mode).text(path)
    return path


def update_parquet_table(
    spark: SparkSession,
    path: str,
    set_exprs: dict[str, Column],
    where: Column | None = None,
) -> int:
    """IO9: SQL-UPDATE semantics on a plain parquet table — the reference
    pushes ``UPDATE ...`` strings to BigQuery (``db_core.py:187-200``); on
    a lakehouse table this is Delta's ``UPDATE``; on plain parquet it is
    the rewrite below: read → conditionally replace columns → write to a
    staging dir → swap.

    The staging dir + swap is required because Spark cannot overwrite a
    path it is still reading; the swap makes the update atomic-enough
    locally (a real deployment uses Delta/Iceberg for transactional
    updates — this is the engine-neutral fallback). Returns the number of
    rows matched by ``where``.
    """
    df = spark.read.parquet(path)
    unknown = set(set_exprs) - set(df.columns)
    if unknown:
        raise ValueError(
            f"set_exprs name columns the table lacks: {sorted(unknown)} — "
            "a typo'd column must fail loudly, not publish an unchanged "
            "table (same policy as snapshots.update_snapshot)"
        )
    cond = where if where is not None else F.lit(True)
    matched = df.filter(cond).count()
    updated = df.select(
        *[
            F.when(cond, set_exprs[c]).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in df.columns
        ]
    )
    token = uuid.uuid4().hex[:8]
    staging = f"{path.rstrip('/')}.__staging_{token}"
    updated.write.mode("overwrite").parquet(staging)
    # rename-aside: the table is never missing from its published path —
    # a crash leaves either the old data live or a .__old_* residue
    # next to the new one (the previous rmtree-then-rename spelling had
    # a window where the table was simply GONE)
    old_dir = f"{path.rstrip('/')}.__old_{token}"
    os.rename(path, old_dir)
    os.rename(staging, path)
    shutil.rmtree(old_dir)
    return matched


def write_table(df: DataFrame, path: str, loading_behavior: str = "append") -> str:
    """IO10/IO11: load with behavior ``fail|replace|append``
    (``db_core.py:74-117,339-367``), parquet-backed.

    Mirrors the reference's empty-input guard (``db_core.py:99-101,351-353``):
    an empty DataFrame is skipped rather than clobbering the target.
    """
    if loading_behavior not in LOAD_BEHAVIORS:
        raise ValueError(
            f"loading_behavior must be one of {sorted(LOAD_BEHAVIORS)}, got {loading_behavior!r}"
        )
    if df.isEmpty():
        return path
    df.write.mode(LOAD_BEHAVIORS[loading_behavior]).parquet(path)
    return path
