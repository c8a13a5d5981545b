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

Granularity honesty: the vector stores KEYS, not row positions, so a
delete removes every live row sharing a matched key. With a unique
``key_col`` that is exactly row-level; with a non-unique one it is
intentionally key-level (and ``delete_where`` counts the rows that
actually disappear, not the rows that matched the condition).

Read cost honesty: every read pays the anti-join until compaction; the
vector side is broadcast-sized by construction (it only grows until
the next compaction), so the plan is scan + broadcast anti-join — the
right trade until deletes accumulate, which is exactly what
``compact_deletes`` is for.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VECTOR = "_deletes"
_BACKUP = "_old_data"


def _vector_files(vec_path: str) -> list[str]:
    """The vector's data files (markers excluded), or [] if none."""
    if not os.path.isdir(vec_path):
        return []
    return [
        os.path.join(vec_path, f)
        for f in os.listdir(vec_path)
        if not f.startswith(("_", "."))
    ]


def _recover_swap(root: str) -> None:
    """Finish a compaction whose process died mid-swap. Two residues are
    possible and both are repaired here (and at read time), so a crash
    can neither lose the table nor block future compactions:

    - died between the two renames: ``data/`` is missing and the old
      data sits at the backup name → restore it (the staged rewrite is
      re-derivable; the old data is not).
    - died before backup cleanup: the new data is already live → the
      backup is disposable.
    """
    data = os.path.join(root, "data")
    backup = os.path.join(root, _BACKUP)
    if os.path.isdir(backup):
        if not os.path.isdir(data):
            os.rename(backup, data)
        else:
            shutil.rmtree(backup)


def delete_where(
    spark: SparkSession, root: str, key_col: str, condition
) -> int:
    """Logically delete rows matching ``condition``: append their keys
    to the deletion vector. Data files untouched. Returns the number of
    rows that actually stop being visible — with a non-unique
    ``key_col`` that INCLUDES live rows sharing a key with a matched
    row (key-granular deletes; see module docstring), so the count and
    the read-side behavior can never disagree."""
    _recover_swap(root)
    base = spark.read.parquet(os.path.join(root, "data"))
    live = apply_deletes(spark, root, key_col, base)
    # pin the matched keys once (tiny frame): the write and the count
    # below both reuse it instead of re-running the filter scan
    doomed = (
        live.filter(condition)
        .select(F.col(key_col))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if doomed.isEmpty():
        return 0
    n = live.join(F.broadcast(doomed), key_col, "left_semi").count()
    doomed.write.mode("append").parquet(os.path.join(root, _VECTOR))
    return n


def apply_deletes(
    spark: SparkSession, root: str, key_col: str, base: DataFrame | None = None
) -> DataFrame:
    """Read the table with deletes applied: base scan + broadcast
    anti-join against the vector (absent or drained vector = plain
    scan — compaction unlinks folded vector files individually, so the
    directory may exist with only markers inside)."""
    _recover_swap(root)
    if base is None:
        base = spark.read.parquet(os.path.join(root, "data"))
    files = _vector_files(os.path.join(root, _VECTOR))
    if not files:
        return base
    vec = spark.read.parquet(*files).select(F.col(key_col)).distinct()
    return base.join(F.broadcast(vec), key_col, "left_anti")


def write_table(df: DataFrame, root: str) -> None:
    """Seed (or RE-seed) the merge-on-read table layout. The deletion
    vector is cleared FIRST: a vector surviving a re-seed would replay
    old tombstones against the new data, silently deleting fresh rows
    that happen to share keys with historically deleted ones."""
    shutil.rmtree(os.path.join(root, _VECTOR), ignore_errors=True)
    df.write.mode("overwrite").parquet(os.path.join(root, "data"))


def compact_deletes(spark: SparkSession, root: str, key_col: str) -> int:
    """Fold the deletion vector into a physical rewrite (copy-on-write
    moment): rewrite data minus deleted keys via a staging swap, then
    clear the folded vector files. Returns rows physically removed.
    After this, reads are plain scans again.

    Concurrency + crash posture:

    - The vector's file list is SNAPSHOTTED up front and only those
      files are read and later unlinked — a ``delete_where`` that
      appends mid-compaction keeps its tombstone (it was not folded
      into the rewrite, so clearing it would resurrect the rows).
    - The swap is rename-aside (old data is renamed away, never
      rmtree'd before the replacement is in place) and every call
      starts with ``_recover_swap``, so a crash at any point leaves a
      state the next call (or read) repairs automatically.
    - A crash after the swap but before the vector-file unlinks leaves
      folded tombstones in place: reads anti-join keys that are
      already physically gone — harmless — and the next compaction
      folds them again (idempotent).
    """
    _recover_swap(root)
    data = os.path.join(root, "data")
    vec_path = os.path.join(root, _VECTOR)
    vec_files = _vector_files(vec_path)
    if not vec_files:
        return 0
    vec = spark.read.parquet(*vec_files).select(F.col(key_col)).distinct()
    base = spark.read.parquet(data)
    n_before = base.count()
    live = base.join(F.broadcast(vec), key_col, "left_anti")
    staging = os.path.join(root, "_staging_data")
    live.write.mode("overwrite").parquet(staging)
    n_after = spark.read.parquet(staging).count()
    backup = os.path.join(root, _BACKUP)
    os.rename(data, backup)
    os.rename(staging, data)
    for f in vec_files:
        try:
            os.unlink(f)
        except FileNotFoundError:
            pass
    shutil.rmtree(backup)
    return n_before - n_after
