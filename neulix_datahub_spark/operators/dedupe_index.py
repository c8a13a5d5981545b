"""Incremental near-duplicate dedup against a persisted signature index
(SURVEY §2.11 L2, incremental form — round 11).

The reference's operating model is DAILY incremental ingest
(``reference/core/airflow/dags/data_capture/wikipedia_dag.py:20-23``,
``schedule_interval=timedelta(days=1)``): each run lands a delta, not a
re-crawl. Re-running MinHash signatures + banding over the FULL corpus
per ingest is the near-dup pipeline's largest avoidable cost at 100 TB
— the same already-materialized-state argument
``operators/incremental.py`` makes for aggregates. This module keeps
the LSH working state AT REST so each delta pays only for itself:

- ``bands_v{N}/``  ``(id, band, band_hash)`` parquet, partitioned by
  ``band`` (the IVF-index write discipline from
  ``operators/similarity.py`` — AQE-rebalanced so no small-file spray,
  bounded directory fan-out). New docs hash into the SAME buckets the
  prior corpus occupies, so the candidate join is delta-bands ⋈
  persisted-bands — an equi-join whose small (delta) side AQE
  broadcasts; the 100 TB side is scanned once and never shuffled.
- ``shingles_v{N}/``  ``(__vid, __vsh, __vsz)`` — the hashed-shingle
  sets the exact-Jaccard verify needs, so verification of delta↔prior
  candidate pairs never re-reads prior TEXT. Ingests APPEND to the
  current generation of both feature relations; daily appends
  fragment them into per-ingest files, and
  :func:`compact_dedup_index` is the maintenance job that rewrites
  each into the next generation (immutable rewrite + the same pointer
  flip as labels — Delta OPTIMIZE's shape).
- ``labels_v{N}/`` ``(id, component)`` — the dedup state (component =
  min reachable id; singletons label themselves). Updated by POINTER
  FLIP: each ingest writes ``labels_v{N+1}`` and then atomically
  rewrites the sidecar; a crash mid-ingest leaves the old pointer
  valid, and partially-appended feature rows are tolerated by
  construction (candidates are ``distinct``-ed and components dedupe
  edges), costing only work, never correctness.
- ``_DEDUP_META.json`` — parameters + the labels pointer.

Equivalence contract (driver-checked at sf0.01 by
``incremental_dedup_stats``, unit- and property-proven):
``build(prior); ingest(d1); ...; ingest(dk)`` ≡ ``build(prior ∪ d1 ∪
… ∪ dk)`` EXACTLY, not approximately — band collision is a
deterministic pure function of the text (shared expression tree:
:func:`~neulix_datahub_spark.operators.dedupe.banded_signatures`), the
exact-Jaccard verify is threshold-shared
(:func:`~neulix_datahub_spark.operators.dedupe.verify_pairs_with_shingles`),
and components compose because prior labels are a
connectivity-preserving star form of the prior verified-edge set, so
CC(prior labels ∪ new edges) = CC(all edges).

Idempotence: ingest filters the delta to ids the index has never seen
(anti-join against the labels relation), so re-ingesting the same
delta — the retried-Airflow-task case — adds nothing and leaves every
index file untouched.

Incremental components: only components TOUCHED by a new edge can
change. Each verified edge's prior endpoints are mapped to their prior
component labels, yielding a REDUCED graph over {prior component
labels} ∪ {new ids} whose size is delta-proportional; min-label CC
over it emits the merge map, prior labels remap through it with a
left join (untouched components pass through), and new ids label
themselves when unmatched. The full corpus is never re-clustered.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.components import connected_components
from neulix_datahub_spark.operators.dedupe import (
    _validate_grid_threshold,
    banded_signatures,
    shingle_projection,
    verify_pairs_with_shingles,
)

_DEDUP_META = "_DEDUP_META.json"


def read_dedup_meta(path: str) -> dict:
    with open(os.path.join(path, _DEDUP_META), encoding="utf-8") as f:
        return json.load(f)


def _write_meta(path: str, meta: dict, filename: str = _DEDUP_META) -> None:
    # write-then-rename: the pointer flip is the ingest's commit point,
    # and rename is atomic on posix — the same local/posix-fs assumption
    # as the snapshot pointer machinery (documented repo-wide)
    tmp = os.path.join(path, filename + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(path, filename))


def read_dedup_labels(spark: SparkSession, path: str) -> DataFrame:
    """The current dedup state: ``(id, component)`` for every indexed
    document; survivors are the rows with ``id == component``."""
    meta = read_dedup_meta(path)
    return spark.read.parquet(
        os.path.join(path, f"labels_v{meta['labels_version']}")
    )


def _bands_dir(path: str, meta: dict) -> str:
    return os.path.join(path, f"bands_v{meta.get('bands_version', 0)}")


def _shingles_dir(path: str, meta: dict) -> str:
    return os.path.join(path, f"shingles_v{meta.get('shingles_version', 0)}")


def _features(
    df: DataFrame, text_col: str, id_col: str, meta: dict
) -> tuple[DataFrame, DataFrame]:
    """(bands, shingles) of a document batch under the index's OWN
    stored parameters — the single construction both build and ingest
    use, which is what makes incremental == batch provable."""
    bands = banded_signatures(
        df, text_col, id_col,
        num_hashes=meta["num_hashes"], bands=meta["bands"],
        shingle_n=meta["shingle_n"], seed=meta["seed"],
    ).select(F.col("__id").alias("id"), "band", "band_hash")
    sh = shingle_projection(df, text_col, id_col, n=meta["shingle_n"])
    return bands, sh


def _assert_unique_ids(df: DataFrame, id_col: str, where: str) -> None:
    """Id uniqueness is the index's identity contract — the anti-join
    idempotence, the labels grain and ``n_docs`` all assume one row per
    id. A duplicate-id batch would persist duplicate label rows and
    silently break incremental == batch, so it is REFUSED here (one
    cheap aggregate over the batch — delta-sized on ingest) instead of
    tolerated."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("d"),
        F.count(F.when(F.col(id_col).isNull(), 1)).alias("nulls"),
    ).first()
    if row["nulls"]:
        raise ValueError(
            f"{where}: {row['nulls']} row(s) have NULL {id_col!r} — ids "
            "are the index identity and must be non-null"
        )
    if row["n"] != row["d"]:
        raise ValueError(
            f"{where}: {row['n'] - row['d']} duplicate {id_col!r} row(s) "
            "in the batch — deduplicate upstream (e.g. exact_dedup or "
            "dropDuplicates) before indexing; admitting them would "
            "corrupt the one-row-per-id labels grain"
        )


def _sweep_stale_generations(path: str, meta: dict) -> None:
    """Remove generation directories BELOW the committed pointers — the
    debris a crash between a pointer flip and its cleanup rmtree leaves
    behind (at scale the feature relations dominate storage, so the
    orphans are the expensive kind). Anything at or above a pointer is
    never touched: uncommitted higher generations are cleared by the
    writer that owns them."""
    # every "<name>_version" pointer in the sidecar guards a
    # "<name>_v{N}" directory family — derived, so the semantic index's
    # vectors_v generations sweep through the same helper
    current = {
        k[: -len("version")] + "v": v
        for k, v in meta.items()
        if k.endswith("_version")
    }
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return
    for d in entries:
        for prefix, cur in current.items():
            if d.startswith(prefix) and d[len(prefix):].isdigit():
                if int(d[len(prefix):]) < cur:
                    shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _n_parquet_files(d: str) -> int:
    """Parquet fragment count under a directory tree — the compaction
    jobs' before/after log metric (shared by the text and semantic
    indexes)."""
    return sum(
        1 for _, _, fs in os.walk(d) for f in fs if f.endswith(".parquet")
    )


def _self_pairs(bands: DataFrame) -> DataFrame:
    """Distinct within-batch band collisions as ``(id_a < id_b)`` —
    the same pair set minhash_near_duplicates emits (its n_bands count
    is irrelevant here; collision in ≥1 band is the candidate rule)."""
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def _write_bands(bands: DataFrame, dest: str, mode: str) -> None:
    from neulix_datahub_spark.operators.skew import rebalance_for_write

    # rebalance before the partitioned write (the build_ivf_index
    # discipline): without it every input partition opens a writer per
    # touched band — #partitions × #bands small files
    rebalance_for_write(bands, "band").write.mode(mode).partitionBy(
        "band"
    ).parquet(dest)


def build_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    threshold: float = 0.8,
    max_iter: int = 10,
) -> dict:
    """One-shot batch build: run the canonical candidates → verify → CC
    pipeline over ``df`` and persist the signature index + dedup state.
    Returns the metadata dict. Parameters are frozen into the sidecar;
    every later :func:`ingest_dedup_delta` reuses them, so the index
    can never mix incompatible signatures."""
    _validate_grid_threshold(threshold)
    _assert_unique_ids(df, id_col, "build_dedup_index")
    meta = {
        "num_hashes": num_hashes, "bands": bands, "shingle_n": shingle_n,
        "seed": seed, "threshold": threshold,
        "text_col": text_col, "id_col": id_col,
        "labels_version": 0, "bands_version": 0, "shingles_version": 0,
    }
    spark = df.sparkSession
    b, sh = _features(df, text_col, id_col, meta)
    _write_bands(b, _bands_dir(path, meta), "overwrite")
    sh.write.mode("overwrite").parquet(_shingles_dir(path, meta))
    # candidates/verify off the LANDED features: the parquet read-back
    # doubles as the materialization barrier, and guarantees the state
    # future ingests join against is the exact state this build deduped
    b = spark.read.parquet(_bands_dir(path, meta))
    sh = spark.read.parquet(_shingles_dir(path, meta))
    edges = verify_pairs_with_shingles(_self_pairs(b), sh, threshold)
    comps = connected_components(edges, max_iter=max_iter)
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    labels = (
        all_ids.join(comps, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    # n_docs rides the labels write as an Observation (the
    # _write_codes_counted discipline): one saved re-read per build
    from pyspark.sql import Observation

    obs = Observation()
    labels.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "labels_v0"))
    meta["n_docs"] = int(obs.get["n"])
    _write_meta(path, meta)
    return meta


def extend_labels(
    labels: DataFrame,
    edges: DataFrame,
    new_ids: DataFrame,
    n_edges: int,
    max_iter: int = 10,
) -> DataFrame:
    """Incremental component extension, shared by every persisted dedup
    index (MinHash text, embedding-cosine): fold verified
    ``(id_a, id_b)`` edges into an existing ``(id, component)`` state
    plus a batch of never-seen ``new_ids``.

    Reduced graph: prior endpoints collapse to their prior component
    label (the quotient preserves connectivity; labels are minima, so
    min-label CC over the quotient emits true global minima). Nodes are
    {touched prior labels} ∪ {new ids} — delta-proportional, the full
    corpus is never re-clustered."""
    lab_a = labels.select(
        F.col("id").alias("id_a"), F.col("component").alias("__ca")
    )
    lab_b = labels.select(
        F.col("id").alias("id_b"), F.col("component").alias("__cb")
    )
    reduced = (
        edges.join(lab_a, "id_a", "left")
        .join(lab_b, "id_b", "left")
        .select(
            F.coalesce("__ca", F.col("id_a")).alias("u"),
            F.coalesce("__cb", F.col("id_b")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    from neulix_datahub_spark.operators.components import (
        _driver_max_sym_rows,
        union_find_components,
    )

    spark = labels.sparkSession
    if n_edges == 0:
        # empty map with the LABELS' own types (ids need not be long)
        merge_map = labels.select(
            F.col("id").alias("__node"), F.col("component").alias("__final")
        ).limit(0)
    elif 2 * n_edges <= _driver_max_sym_rows(spark):
        # Driver fast path (r14): the reduced graph is bounded by
        # n_edges rows — ALREADY a known Python int here, so the size
        # gate costs no job at all (connected_components' generic gate
        # pays a count; this one does not, and it also subsumes the old
        # reduced.isEmpty() probe job). One evaluation of the reduced
        # plan feeds one union-find; the merge map comes back as a
        # local relation every downstream join broadcasts.
        from neulix_datahub_spark.functions.ranking import local_relation
        from pyspark.sql.types import StructField, StructType

        labels_map = union_find_components(
            (r[0], r[1]) for r in reduced.collect()
        )
        u_type = reduced.schema["u"].dataType
        merge_map = local_relation(
            spark,
            sorted(labels_map.items()),
            StructType(
                [
                    StructField("__node", u_type, True),
                    StructField("__final", u_type, True),
                ]
            ),
        )
    elif not reduced.isEmpty():
        merge_map = connected_components(
            reduced, src="u", dst="v", max_iter=max_iter
        ).select(
            F.col("id").alias("__node"), F.col("component").alias("__final")
        )
    else:
        merge_map = labels.select(
            F.col("id").alias("__node"), F.col("component").alias("__final")
        ).limit(0)

    prior_updated = (
        labels.join(merge_map, labels["component"] == merge_map["__node"], "left")
        .select(
            "id", F.coalesce("__final", F.col("component")).alias("component")
        )
    )
    new_labels = (
        new_ids.join(merge_map, new_ids["id"] == merge_map["__node"], "left")
        .select("id", F.coalesce("__final", F.col("id")).alias("component"))
    )
    return prior_updated.unionByName(new_labels)


def ingest_dedup_delta(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    max_iter: int = 10,
) -> dict:
    """Incremental ingest: signature ONLY the never-seen delta rows,
    candidate-join them against the persisted bands (plus intra-delta),
    verify with exact Jaccard off the persisted shingle sets, extend
    the component labels through the delta-proportional reduced graph,
    and commit by pointer flip. Returns stats
    ``{n_new, n_candidates, n_edges, labels_version}``.

    Scale shape: the prior corpus is touched exactly twice, both as
    column-pruned parquet scans that never shuffle — the bands table
    (the delta side broadcasts under AQE) and the shingle table (semi-
    joined down to candidate ids before the arrays load). Everything
    that shuffles is delta-sized.
    """
    meta = read_dedup_meta(path)
    id_col, text_col = meta["id_col"], meta["text_col"]
    labels = read_dedup_labels(spark, path)

    # never-seen rows only: re-ingesting a delta (the retried-ingest
    # case) must add nothing — this anti-join IS the idempotence
    known = labels.select(F.col("id").alias(id_col))
    new = delta.join(known, id_col, "left_anti")
    if new.isEmpty():
        return {
            "n_new": 0, "n_candidates": 0, "n_edges": 0,
            "labels_version": meta["labels_version"],
        }
    # pin the filtered delta: features, the id projection and the count
    # would each re-run the anti-join otherwise (lazy — the uniqueness
    # aggregate right below is the materializing pass)
    new = new.localCheckpoint(eager=False)
    _assert_unique_ids(new, id_col, "ingest_dedup_delta")
    # opportunistic debris sweep: generations orphaned by a crash
    # between a prior run's pointer flip and its cleanup
    _sweep_stale_generations(path, meta)
    nb, nsh = _features(new, text_col, id_col, meta)
    # pin the delta features: each is consumed 2-3 times (candidate
    # joins, verify, the append) and re-shingling per consumer is the
    # exact waste this operator exists to avoid (lazy — the first
    # consuming job materializes them; no dedicated pass per pin)
    nb = nb.localCheckpoint(eager=False)
    nsh = nsh.localCheckpoint(eager=False)

    prior_bands = spark.read.parquet(_bands_dir(path, meta))
    cross = (
        nb.alias("d")
        .join(prior_bands.alias("p"), ["band", "band_hash"])
        .select(
            F.least(F.col("d.id"), F.col("p.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("p.id")).alias("id_b"),
        )
        .distinct()
    )
    # pin the candidate list: it feeds the verify AND the stats count —
    # without the checkpoint the count would re-execute the whole
    # bands-table join (a second full scan of the at-rest relation per
    # ingest, violating the touched-exactly-twice contract above)
    cands = (
        cross.unionByName(_self_pairs(nb)).distinct()
        .localCheckpoint(eager=False)
    )
    sh_all = spark.read.parquet(_shingles_dir(path, meta)).unionByName(nsh)
    # lazy checkpoints: the n_edges count below is the ONE materializing
    # pass that pins cands and edges together (the eager forms each paid
    # a dedicated pass first — three evaluations where one suffices)
    edges = verify_pairs_with_shingles(
        cands, sh_all, meta["threshold"]
    ).localCheckpoint(eager=False)

    n_edges = edges.count()
    new_ids = new.select(F.col(id_col).alias("id"))
    final = extend_labels(labels, edges, new_ids, n_edges, max_iter)

    # commit order: feature appends first (tolerated if re-run), then
    # the new labels generation, then the POINTER FLIP (the atomic
    # commit), then old-generation cleanup
    _write_bands(nb, _bands_dir(path, meta), "append")
    nsh.write.mode("append").parquet(_shingles_dir(path, meta))
    new_version = meta["labels_version"] + 1
    final.write.mode("overwrite").parquet(
        os.path.join(path, f"labels_v{new_version}")
    )
    stats = {
        "n_new": new.count(),
        "n_candidates": cands.count(),
        "n_edges": n_edges,
        "labels_version": new_version,
    }
    old_version = meta["labels_version"]
    meta["labels_version"] = new_version
    meta["n_docs"] = meta["n_docs"] + stats["n_new"]
    _write_meta(path, meta)
    shutil.rmtree(
        os.path.join(path, f"labels_v{old_version}"), ignore_errors=True
    )
    return stats


def compact_dedup_index(
    spark: SparkSession,
    path: str,
    files_per_band: int = 1,
    shingle_files: int = 8,
) -> dict:
    """Maintenance: rewrite the appended-to feature relations into the
    next generation with right-sized files — the Delta-OPTIMIZE-shaped
    job a daily ingest cadence needs (each ingest appends per-task
    files; after a year of dailies the band directories hold hundreds
    of fragments and listing+footer overhead starts to dominate probe
    setup). Bands compact through
    :func:`~neulix_datahub_spark.sources.io.compact_partitioned_parquet`
    (``files_per_band`` per band directory); shingles rebalance into
    ``shingle_files`` files. Both land as IMMUTABLE new generations and
    commit together with ONE sidecar pointer flip — readers never see a
    half-compacted index, and a crash before the flip leaves the old
    generations live (a retry clears the provably-orphaned new dirs —
    the pointer still references the old generation — and rewrites).
    Pure rewrite: row sets unchanged, proven by the invariance unit
    test. Returns the file-count log."""
    from neulix_datahub_spark.sources.io import compact_partitioned_parquet

    meta = read_dedup_meta(path)
    _sweep_stale_generations(path, meta)
    old_b, old_sh = _bands_dir(path, meta), _shingles_dir(path, meta)
    new_meta = dict(
        meta,
        bands_version=meta.get("bands_version", 0) + 1,
        shingles_version=meta.get("shingles_version", 0) + 1,
    )
    new_b, new_sh = _bands_dir(path, new_meta), _shingles_dir(path, new_meta)
    # a crashed prior compaction can leave orphaned target generations
    # (the pointer proves they were never committed) — clear, then write
    shutil.rmtree(new_b, ignore_errors=True)
    shutil.rmtree(new_sh, ignore_errors=True)
    band_log = compact_partitioned_parquet(
        spark, old_b, new_b, ["band"], files_per_band
    )
    sh = spark.read.parquet(old_sh)
    sh.repartition(shingle_files).write.mode("overwrite").parquet(new_sh)
    log = {
        "band_files_before": band_log["files_before"],
        "band_files_after": band_log["files_after"],
        "shingle_files_before": _n_parquet_files(old_sh),
        "shingle_files_after": _n_parquet_files(new_sh),
    }
    _write_meta(path, new_meta)  # the atomic commit for BOTH rewrites
    shutil.rmtree(old_b, ignore_errors=True)
    shutil.rmtree(old_sh, ignore_errors=True)
    return log


def dedup_survivors(
    spark: SparkSession, path: str, df: DataFrame, id_col: str
) -> DataFrame:
    """Filter ``df`` to the rows the index's current state keeps: one
    survivor (the component minimum) per near-dup cluster, plus every
    unpaired document — the incremental twin of
    ``components.dedup_by_components``."""
    losers = (
        read_dedup_labels(spark, path)
        .filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def canonical_index_survivors(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    id_col: str,
    score,
) -> DataFrame:
    """Quality-aware survivor pick over the PERSISTED labels — the
    incremental twin of ``components.canonical_by_components``: per
    near-dup cluster keep the member with the highest ``score`` (min-id
    tie-break), plus every unclustered row. ``score`` is any Column
    computable from ``df``; the labels relation restricts the window to
    CLUSTERED rows only (clusters are near-dup families, bounded), and
    the corpus is touched by a single left_anti join — the
    ``dedup_survivors`` shape with the argmax pick swapped in."""
    from pyspark.sql.window import Window

    score_col = F.col(score) if isinstance(score, str) else score
    labels = read_dedup_labels(spark, path)
    clustered = labels.join(
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("__sz"))
        .filter(F.col("__sz") > 1)
        .select("component"),
        "component",
    )
    scored = (
        df.select(F.col(id_col).alias("id"), score_col.alias("__score"))
        .join(clustered, "id")
    )
    w = Window.partitionBy("component").orderBy(F.desc("__score"), F.asc("id"))
    losers = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, on=id_col, how="left_anti")
