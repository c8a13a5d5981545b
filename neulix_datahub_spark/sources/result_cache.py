"""Materialized result cache keyed by the CANONICALIZED logical plan —
cross-session, cross-process memoization for expensive deterministic
queries (`df.cache()` only lives inside one session and one JVM).

The reference's dashboards re-run the same delegated SQL on every poll
(``core/utils/db_core.py:119-135``); at 100 TB the cheapest query is
the one that doesn't run. The cache key is a sha-256 over Catalyst's
*canonicalized* optimized plan, so it is insensitive to expression-id
renumbering and alias noise but sensitive to everything that matters:
source paths, pushed filters, literals, operator shapes. Two
structurally identical queries built independently hit the same entry;
changing one literal misses.

Storage is a versioned snapshot table per fingerprint (atomic publish,
readers never see partial writes, concurrent writers CAS — all the
sources/snapshots.py guarantees), so the cache is safe to share across
jobs on one filesystem.

HONEST LIMIT (documented, inherent): the key hashes the PLAN, not the
data. If files under an input path are rewritten in place, the entry is
stale. Pair the cache with immutable inputs — snapshot-table versions
or write-once partitions — and it is sound; `refresh=True` force-
recomputes when a caller knows better. This is the same contract
Databricks' disk cache and dbt's table materializations live with.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame


def plan_fingerprint(df: DataFrame) -> str:
    """sha-256 hex of the canonicalized optimized logical plan. Classic
    (py4j) sessions only — Spark Connect exposes no canonicalized plan,
    and falling back to explain() text would make semantically equal
    plans miss on exprId noise, so we refuse loudly instead of caching
    unreliably."""
    try:
        qe = df._jdf.queryExecution()
    except Exception as exc:  # pragma: no cover - connect-only path
        raise NotImplementedError(
            "plan_fingerprint needs a classic session (queryExecution via "
            "py4j); Spark Connect does not expose the canonicalized plan"
        ) from exc
    canon = qe.optimizedPlan().canonicalized().toString()
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def _cached(df: DataFrame, cache_root: str, fingerprint: str, refresh: bool) -> DataFrame:
    """Shared serve-or-publish body for both cache flavors — one place
    to evolve the protocol (the two public entry points differ ONLY in
    how the key is derived)."""
    from neulix_datahub_spark.sources.snapshots import (
        current_version,
        read_snapshot_table,
        write_snapshot,
    )

    spark = df.sparkSession
    path = os.path.join(cache_root, fingerprint)
    if not refresh and current_version(path) is not None:
        return read_snapshot_table(spark, path)
    write_snapshot(df, path)
    return read_snapshot_table(spark, path)


def cached_result(
    df: DataFrame, cache_root: str, refresh: bool = False
) -> DataFrame:
    """Return ``df``'s result from the cache, computing and publishing
    it only on a miss (or ``refresh=True``). The returned frame reads
    the published snapshot — downstream plans see a plain parquet scan
    (column pruning / pushdown apply), not the original query tree."""
    return _cached(df, cache_root, plan_fingerprint(df), refresh)


def cache_entries(cache_root: str) -> list[dict]:
    """Inventory of the cache: one dict per fingerprint with its
    published version and version count (for retention tooling —
    vacuum_snapshots applies per entry)."""
    from neulix_datahub_spark.sources.snapshots import (
        current_version,
        snapshot_versions,
    )

    if not os.path.isdir(cache_root):
        return []
    out = []
    for d in sorted(os.listdir(cache_root)):
        p = os.path.join(cache_root, d)
        if os.path.isdir(p) and current_version(p) is not None:
            out.append(
                {
                    "fingerprint": d,
                    "version": current_version(p),
                    "n_versions": len(snapshot_versions(p)),
                }
            )
    return out


def data_fingerprint(df: DataFrame) -> str:
    """Plan fingerprint EXTENDED with the input files' identity: sha-256
    over (canonicalized plan, sorted [path, size, mtime_ns] of every
    file the plan reads). This lifts the documented plan-only limit —
    rewriting files under an input path now changes the key, so the
    stale entry is simply never hit again (dead entries age out via
    retention, cache_entries + vacuum_snapshots).

    Cost: ``df.inputFiles()`` + one file-status call per file — an
    O(files) driver metadata walk, the same class as a manifest
    listing; for snapshot-table inputs prefer the plain
    plan_fingerprint (the path already encodes the version, which is
    the cheaper invariant).

    File identity comes from the HADOOP FileSystem API for the file's
    own URI, so it works for every scheme the plan can read (file://,
    hdfs://, s3a://, percent-encoded paths included) — an os.stat on
    the raw URI would fail for all of those, and silently hashing a
    constant in its place would quietly restore the exact plan-only
    staleness this function exists to lift. A file whose status cannot
    be read raises instead (loud beats a silently weaker key); a
    vanished file usually means a concurrent rewrite — retry or use
    plan_fingerprint over immutable inputs."""
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sig = hashlib.sha256(plan_fingerprint(df).encode("ascii"))
    for f in sorted(df.inputFiles()):
        try:
            p = jvm.org.apache.hadoop.fs.Path(f)
            st = p.getFileSystem(conf).getFileStatus(p)
            sig.update(
                f"{f}|{st.getLen()}|{st.getModificationTime()}\n".encode("utf-8")
            )
        except Exception as exc:
            raise ValueError(
                f"cannot stat input file {f!r} for the data fingerprint — "
                "the key would silently degrade to plan-only; retry, or use "
                "plan_fingerprint/cached_result over immutable inputs"
            ) from exc
    return sig.hexdigest()


def cached_result_data_aware(
    df: DataFrame, cache_root: str, refresh: bool = False
) -> DataFrame:
    """:func:`cached_result` keyed by :func:`data_fingerprint` — safe
    over MUTABLE input paths at the cost of the per-call file walk."""
    return _cached(df, cache_root, data_fingerprint(df), refresh)
