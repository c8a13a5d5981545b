"""Merge-on-read row-level deletes ("deletion vectors") over a parquet
table — delete without rewriting data files.

The copy-on-write path (``io.update_parquet_table``, ``snapshots``
upserts) rewrites every file containing a matched row; at 100 TB a
point delete that touches one row per file rewrites the table. The
merge-on-read pattern instead appends the deleted KEYS to a small
side table (the "deletion vector") and applies them as an anti-join at
read time — O(deleted keys) write cost, unchanged data files — then a
periodic COMPACTION folds the vector into a physical rewrite and
clears it (the Delta deletion-vectors / Iceberg positional-delete
lifecycle, expressed relationally).

Read cost honesty: every read pays the anti-join until compaction; the
vector side is broadcast-sized by construction (it only grows until
the next compaction), so the plan is scan + broadcast anti-join — the
right trade until deletes accumulate, which is exactly what
``compact_deletes`` is for.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VECTOR = "_deletes"


def delete_where(
    spark: SparkSession, root: str, key_col: str, condition
) -> int:
    """Logically delete rows matching ``condition``: append their keys
    to the deletion vector. Data files untouched. Returns the number of
    newly deleted (previously live) rows."""
    base = spark.read.parquet(os.path.join(root, "data"))
    live = apply_deletes(spark, root, key_col, base)
    doomed = live.filter(condition).select(F.col(key_col))
    n = doomed.count()
    if n:
        doomed.write.mode("append").parquet(os.path.join(root, _VECTOR))
    return n


def apply_deletes(
    spark: SparkSession, root: str, key_col: str, base: DataFrame | None = None
) -> DataFrame:
    """Read the table with deletes applied: base scan + broadcast
    anti-join against the vector (absent vector = plain scan)."""
    if base is None:
        base = spark.read.parquet(os.path.join(root, "data"))
    vec_path = os.path.join(root, _VECTOR)
    if not os.path.isdir(vec_path):
        return base
    vec = spark.read.parquet(vec_path).select(F.col(key_col)).distinct()
    return base.join(F.broadcast(vec), key_col, "left_anti")


def write_table(df: DataFrame, root: str) -> None:
    """Seed the merge-on-read table layout: data files + empty vector."""
    df.write.mode("overwrite").parquet(os.path.join(root, "data"))


def compact_deletes(spark: SparkSession, root: str, key_col: str) -> int:
    """Fold the deletion vector into a physical rewrite (copy-on-write
    moment): rewrite data minus deleted keys via a staging swap, then
    clear the vector. Returns rows physically removed. After this, reads
    are plain scans again."""
    import shutil

    vec_path = os.path.join(root, _VECTOR)
    if not os.path.isdir(vec_path):
        return 0
    base = spark.read.parquet(os.path.join(root, "data"))
    n_before = base.count()
    live = apply_deletes(spark, root, key_col, base)
    staging = os.path.join(root, "_staging_data")
    live.write.mode("overwrite").parquet(staging)
    n_after = spark.read.parquet(staging).count()
    old = os.path.join(root, "data")
    backup = os.path.join(root, "_old_data")
    os.rename(old, backup)
    os.rename(staging, old)
    shutil.rmtree(backup)
    shutil.rmtree(vec_path)
    return n_before - n_after
