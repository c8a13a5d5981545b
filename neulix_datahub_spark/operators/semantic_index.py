"""Incremental SEMANTIC near-dup dedup against a persisted vector
index (SURVEY §2.11 L2/L3 composition, incremental form — round 11).

The embedding-side sibling of ``operators/dedupe_index.py``: the batch
recipe (``semantic_dedup_pairs``) is cosine candidates verified by
exact word-bigram Jaccard; at a daily ingest cadence re-running the
all-pairs cosine over the full corpus per day is the same avoidable
cost the MinHash index eliminates for text. This module persists

- ``vectors_v{N}/``  ``(id, vec)`` — embeddings cast to double (the
  deterministic arithmetic the oracles' ``::DOUBLE[]`` uses),
- ``shingles_v{N}/`` the hashed word-bigram sets the Jaccard verify
  reads instead of re-shingling prior text,
- ``labels_v{N}/``   ``(id, component)`` — the dedup state,

under the same sidecar-pointer-flip commit protocol, id-anti-join
idempotence, stale-generation sweeping and reduced-graph label
extension (:func:`~neulix_datahub_spark.operators.dedupe_index
.extend_labels`) as the text index — one protocol, two feature
families.

Candidate generation REUSES
:func:`~neulix_datahub_spark.operators.similarity
.embedding_near_duplicates` on the union of (persisted ∪ delta)
vectors with the delta as the probe side: the delta broadcasts, the
persisted corpus scan never shuffles, prior↔prior pairs (already
resolved at build) are never re-emitted, and delta↔prior pairs are
found regardless of id order. Exactness: cosine (6-dp rounded) and
Jaccard are deterministic functions of the stored features, so
``build(prior); ingest(d1); …`` ≡ ``build(full)`` EXACTLY — same
theorem, same proof shape as the MinHash index.

Scale note: ``candidates="exact"`` (default) is brute-force delta ×
corpus dot products — the honest baseline, exhaustive recall.
``candidates="banded"`` is the 100 TB path: sign-LSH banding
(:func:`~neulix_datahub_spark.operators.similarity
.vector_banded_signatures` — data-independent seeded hyperplanes, so
the candidate set stays a pure function of the vector and the
incremental == batch theorem survives) persists a ``bands_v{N}``
relation exactly like the text index's, and the per-delta candidate
join becomes delta-bands ⋈ at-rest-bands — an equi-join whose small
side AQE broadcasts, replacing the delta × corpus cross entirely.
Banded candidates then pass an exact-cosine precision stage (read
from the at-rest vectors) before the shared Jaccard verify, so the
only semantic difference from exact mode is banding recall — the
documented SimHash/banding trade, parameter-controlled.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import (
    _validate_grid_threshold,
    shingle_projection,
    verify_pairs_with_shingles,
)
from neulix_datahub_spark.operators.dedupe_index import (
    _assert_unique_ids,
    _self_pairs,
    _sweep_stale_generations,
    _write_bands,
    _write_meta,
    extend_labels,
)
from neulix_datahub_spark.operators.similarity import (
    _dot,
    _norm,
    embedding_near_duplicates,
    vector_banded_signatures,
)

_SEM_META = "_SEMANTIC_META.json"

# ``candidates="auto"`` crossover: below this many corpus rows the
# all-pairs exact mode wins (O(n²) on a small n beats the banding
# projection + band-join overhead, and it is the recall-1.0 baseline);
# at or above it the banded equi-join is the only shape that survives
# growth — the delta×corpus cross scales as corpus size, the band join
# as collision count. Conservative: 50k rows × 50k ≈ 2.5e9 candidate
# pairs is already far past where banding wins, but below 50k either
# mode finishes in seconds, so auto only leaves the exact baseline
# when the cross join is clearly the wrong plan.
_AUTO_BANDED_MIN_ROWS = 50_000


def read_semantic_meta(path: str) -> dict:
    import json

    with open(os.path.join(path, _SEM_META), encoding="utf-8") as f:
        return json.load(f)


def _write_sem_meta(path: str, meta: dict) -> None:
    _write_meta(path, meta, filename=_SEM_META)


def read_semantic_labels(spark: SparkSession, path: str) -> DataFrame:
    meta = read_semantic_meta(path)
    return spark.read.parquet(
        os.path.join(path, f"labels_v{meta['labels_version']}")
    )


def _dirs(path: str, meta: dict) -> tuple[str, str]:
    return (
        os.path.join(path, f"vectors_v{meta.get('vectors_version', 0)}"),
        os.path.join(path, f"shingles_v{meta.get('shingles_version', 0)}"),
    )


#: Size gate for the Arrow precision stage (r14): when the index's
#: vector relation is at or below this many rows (200k × 64-dim double
#: ≈ 100 MB — a bounded-driver-traffic contract, the components.py
#: driverMaxEdges precedent), the candidate cosines are computed by a
#: ``mapInArrow`` stage that ships ONLY the (id_a, id_b) pairs across
#: the Python boundary (16 B/pair) against a task-resident copy of the
#: vectors — the two vector equi-joins (each attaching a ~dim×8 B array
#: per pair side, ~1 KB/pair of join traffic at dim 64) and the
#: interpreted per-pair HOF dot fold both disappear. Above the gate the
#: join + HOF form is unchanged — the 100 TB shape. Override per
#: session with ``spark.conf.set("spark.neulix.semantic.driverMaxVectors",
#: n)``; 0 disables the Arrow tier everywhere.
_DRIVER_MAX_VECTORS = 200_000


def _driver_max_vectors(spark) -> int:
    try:
        return int(
            spark.conf.get(
                "spark.neulix.semantic.driverMaxVectors",
                str(_DRIVER_MAX_VECTORS),
            )
        )
    except ValueError:
        return _DRIVER_MAX_VECTORS


def _cosine_pairs_arrow(
    pairs: DataFrame, vectors: DataFrame, threshold: float, dim: int
) -> DataFrame:
    """Arrow-tier precision stage (guide §4.2/§8: decide with small
    rows — ship 16 B of ids per pair, keep the heavy vectors resident):
    one ``mapInArrow`` pass computes each candidate pair's dot product
    and the norm product against a collected copy of the (bounded —
    see :data:`_DRIVER_MAX_VECTORS`) vector relation. Bit-exactness by
    construction: the dot is accumulated dimension-by-dimension over
    the whole batch (``acc = acc + a_k*b_k``), the exact left-to-right
    double association of ``_dot``'s fold, and the norm replicates
    ``_norm`` the same way; every elementwise numpy float64 op is the
    IEEE-754 operation Spark's interpreter performs. The stage emits
    ``(ids, dot, norm-product)`` and leaves division, 6-dp rounding and
    the threshold filter IN Spark — the same expression tail the join
    form produces, including ANSI divide-by-zero on a zero-norm vector.
    Unknown ids are dropped, mirroring the join form's inner joins
    (by construction candidates reference indexed vectors only)."""
    import numpy as np

    rows = [
        r for r in vectors.select("id", "vec").collect() if r[1] is not None
    ]
    V = np.array([r[1] for r in rows], dtype=np.float64).reshape(-1, dim)
    acc = np.zeros(len(rows), dtype=np.float64)
    for k in range(dim):
        acc = acc + V[:, k] * V[:, k]
    nrm = np.sqrt(acc)
    index = {r[0]: j for j, r in enumerate(rows)}

    out_fields = [
        pairs.schema["id_a"], pairs.schema["id_b"],
    ]
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        out_fields
        + [
            StructField("__dot", DoubleType(), True),
            StructField("__np", DoubleType(), True),
        ]
    )

    def gen(batches):
        import pyarrow as pa

        for b in batches:
            ia = np.fromiter(
                (index.get(x, -1) for x in b.column(0).to_pylist()),
                dtype=np.int64, count=b.num_rows,
            )
            ib = np.fromiter(
                (index.get(x, -1) for x in b.column(1).to_pylist()),
                dtype=np.int64, count=b.num_rows,
            )
            ok = (ia >= 0) & (ib >= 0)
            ia, ib = ia[ok], ib[ok]
            A, B = V[ia], V[ib]
            acc = np.zeros(len(ia), dtype=np.float64)
            for k in range(dim):
                acc = acc + A[:, k] * B[:, k]
            okarr = pa.array(ok)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0).filter(okarr),
                    b.column(1).filter(okarr),
                    pa.array(acc, type=pa.float64()),
                    pa.array(nrm[ia] * nrm[ib], type=pa.float64()),
                ],
                names=["id_a", "id_b", "__dot", "__np"],
            )

    return (
        pairs.select("id_a", "id_b")
        .mapInArrow(gen, out_schema)
        .select(
            "id_a", "id_b",
            F.round(F.col("__dot") / F.col("__np"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _cosine_pairs(
    pairs: DataFrame, vectors: DataFrame, threshold: float
) -> DataFrame:
    """Exact rounded cosine for ``(id_a, id_b)`` candidates, read from
    the index's ``(id, vec)`` relation — the banded path's precision
    stage (the exact path's candidate generator computes it inline).
    Same 6-dp rounding as :func:`embedding_near_duplicates`, so the two
    candidate modes share one arithmetic.

    Tiered (r14): a bounded uniform-dim vector relation takes the
    ``mapInArrow`` stage (:func:`_cosine_pairs_arrow` — pairs-only
    boundary traffic, no vector joins, no interpreted per-pair fold);
    anything larger, ragged or null-bearing keeps the join + HOF form
    below, whose per-pair expression the Arrow tier reproduces
    bit-for-bit (parity unit-pinned)."""
    spark = pairs.sparkSession
    gate = _driver_max_vectors(spark)
    if gate:
        # one sizing aggregate (count + dim uniformity + nulls) — the
        # same job the count-only gate would pay
        s = vectors.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("vec").isNull(), 1)).alias("nulls"),
            F.min(F.size("vec")).alias("dmin"),
            F.max(F.size("vec")).alias("dmax"),
        ).first()
        if (
            0 < int(s["n"]) <= gate
            and not int(s["nulls"])
            and s["dmin"] is not None
            and int(s["dmin"]) == int(s["dmax"])
        ):
            return _cosine_pairs_arrow(
                pairs, vectors, threshold, int(s["dmin"])
            )
    a = vectors.select(
        F.col("id").alias("id_a"), F.col("vec").alias("__va"),
        _norm(F.col("vec")).alias("__na"),
    )
    b = vectors.select(
        F.col("id").alias("id_b"), F.col("vec").alias("__vb"),
        _norm(F.col("vec")).alias("__nb"),
    )
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                _dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")), 6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _bands_of(vectors: DataFrame, meta: dict) -> DataFrame:
    """Band rows of a ``(id, vec)`` batch under the index's OWN stored
    banding parameters — the single construction build and every
    ingest share (the ``_features`` discipline of the text index)."""
    return vector_banded_signatures(
        vectors, vec_col="vec", id_col="id",
        num_planes=meta["num_planes"], bands=meta["bands"],
        seed=meta["seed"],
    )


def _vectors(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec) with the embedding cast to double — fixing the
    arithmetic once at the boundary keeps every later cosine (build,
    any ingest, any oracle replay) on identical numerics regardless of
    the source column's float width."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )


def _shingles_for(docs: DataFrame, ids: DataFrame, meta: dict) -> DataFrame:
    """Hashed bigram sets for exactly the given ids (semi-join first:
    a redelivered docs batch may carry already-indexed rows whose
    shingles must not duplicate in the store).

    Unlike the text index, whose features all derive from ONE input
    relation, the semantic index joins two (embeddings + documents) —
    so their correspondence is ENFORCED here, not assumed: a duplicate
    docs row would append duplicate shingle rows to the store, and an
    embedding with no docs row at all would be permanently inert (its
    cosine candidates exist but can never Jaccard-verify — a silent
    hole in the dedup state). Both are refused, same convention as
    ``_assert_unique_ids``. NULL-text rows are fine: they carry no
    shingles by the shared ``shingle_projection`` contract, in both
    the batch and incremental paths alike."""
    scoped = docs.join(
        ids.withColumnRenamed("id", meta["doc_id_col"]),
        meta["doc_id_col"], "left_semi",
    )
    stats = scoped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(meta["doc_id_col"])).alias("n_ids"),
    ).first()
    n_expected = ids.count()
    if int(stats["n_rows"]) != int(stats["n_ids"]):
        raise ValueError(
            "semantic index: docs batch carries duplicate rows for "
            f"{int(stats['n_rows']) - int(stats['n_ids'])} id(s) — refuse "
            "the batch rather than append duplicate shingle rows"
        )
    if int(stats["n_ids"]) != n_expected:
        raise ValueError(
            f"semantic index: {n_expected - int(stats['n_ids'])} embedding "
            "id(s) have no docs row — their candidates could never "
            "Jaccard-verify, leaving permanent holes in the dedup state"
        )
    return shingle_projection(
        scoped, meta["text_col"], meta["doc_id_col"], n=meta["shingle_n"]
    )


def build_semantic_index(
    emb: DataFrame,
    docs: DataFrame,
    path: str,
    cos_threshold: float = 0.30,
    jaccard_threshold: float = 0.02,
    shingle_n: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 10,
    candidates: str = "auto",
    num_planes: int = 128,
    bands: int = 16,
    seed: int = 42,
) -> dict:
    """One-shot batch build: cosine candidates (``candidates="exact"``
    all-pairs, or ``"banded"`` sign-LSH band collisions + exact-cosine
    precision stage with a persisted ``bands_v0`` relation) → exact
    bigram-Jaccard verify → connected components, persisted with the
    parameters frozen into the sidecar.

    ``candidates="auto"`` (the default — the bpe ``rewrite="auto"``
    precedent) counts the corpus once at build time and picks
    ``exact`` below :data:`_AUTO_BANDED_MIN_ROWS` rows (all-pairs is
    cheaper than banding overhead on a small corpus and is the honest
    recall baseline), ``banded`` at or above it (the delta×corpus
    cross join is the non-scale shape — band equi-joins replace it).
    The RESOLVED mode is what freezes into the sidecar, so every
    subsequent ingest follows it. Auto never changes the plan's
    PRECISION (both modes feed the same exact-cosine + exact-Jaccard
    verify stages), but banded candidate generation CAN reduce recall:
    sign-LSH banding misses a true near-dup pair when no band's
    hyperplane signs agree end-to-end (probability shrinks with
    ``bands``/``num_planes`` but is never zero), and the frozen
    sidecar locks that mode for all subsequent ingests. Pass
    ``candidates="exact"`` explicitly when exhaustive recall matters
    more than the all-pairs cost; a WARNING is logged when auto
    resolves to banded."""
    _validate_grid_threshold(cos_threshold)
    _validate_grid_threshold(jaccard_threshold)
    if candidates not in ("exact", "banded", "auto"):
        raise ValueError(f"unknown candidates mode {candidates!r}")
    _assert_unique_ids(emb, id_col, "build_semantic_index")
    if candidates == "auto":
        import logging

        n_build = emb.count()
        candidates = (
            "exact" if n_build < _AUTO_BANDED_MIN_ROWS else "banded"
        )
        if candidates == "banded":
            logging.getLogger(__name__).warning(
                "semantic index auto candidate mode resolved to "
                "'banded' (%d rows >= crossover %d): sign-LSH banding "
                "can miss true near-dup pairs (recall < 1.0), and the "
                "mode freezes into the sidecar for all future ingests; "
                "pass candidates='exact' to force exhaustive recall",
                n_build, _AUTO_BANDED_MIN_ROWS,
            )
        else:
            logging.getLogger(__name__).info(
                "semantic index auto candidate mode: exact "
                "(%d rows, crossover %d)",
                n_build, _AUTO_BANDED_MIN_ROWS,
            )
    meta = {
        "cos_threshold": cos_threshold,
        "jaccard_threshold": jaccard_threshold,
        "shingle_n": shingle_n,
        "id_col": id_col, "vec_col": vec_col,
        "doc_id_col": doc_id_col, "text_col": text_col,
        "candidates": candidates,
        "labels_version": 0, "vectors_version": 0, "shingles_version": 0,
    }
    if candidates == "banded":
        meta.update(
            {"num_planes": num_planes, "bands": bands, "seed": seed,
             "bands_version": 0}
        )
    spark = emb.sparkSession
    vec_dir, sh_dir = _dirs(path, meta)
    _vectors(emb, id_col, vec_col).write.mode("overwrite").parquet(vec_dir)
    vectors = spark.read.parquet(vec_dir)
    _shingles_for(docs, vectors.select("id"), meta).write.mode(
        "overwrite"
    ).parquet(sh_dir)
    sh = spark.read.parquet(sh_dir)
    if candidates == "banded":
        _write_bands(
            _bands_of(vectors, meta), os.path.join(path, "bands_v0"),
            "overwrite",
        )
        band_rows = spark.read.parquet(os.path.join(path, "bands_v0"))
        cand = _cosine_pairs(_self_pairs(band_rows), vectors, cos_threshold)
    else:
        cand = embedding_near_duplicates(
            vectors, threshold=cos_threshold, vec_col="vec", id_col="id"
        )
    edges = verify_pairs_with_shingles(cand, sh, jaccard_threshold)
    from neulix_datahub_spark.operators.components import connected_components

    comps = connected_components(edges, max_iter=max_iter)
    labels = (
        vectors.select("id").join(comps, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    # n_docs rides the labels write as an Observation (the
    # _write_codes_counted discipline): one saved re-read of the
    # freshly written labels per build
    from pyspark.sql import Observation

    obs = Observation()
    labels.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "labels_v0"))
    meta["n_docs"] = int(obs.get["n"])
    _write_sem_meta(path, meta)
    return meta


def ingest_semantic_delta(
    spark: SparkSession,
    emb_delta: DataFrame,
    docs_delta: DataFrame,
    path: str,
    max_iter: int = 10,
) -> dict:
    """Incremental ingest: only never-seen vectors compute anything.
    Candidates follow the sidecar's frozen mode — ``exact``: ONE
    ``embedding_near_duplicates`` call over (persisted ∪ delta) with
    the delta as the broadcast probe side; ``banded``: delta-bands ⋈
    at-rest-bands equi-join (AQE broadcasts the delta side; the band
    scan never shuffles) plus intra-delta self-pairs, then the
    exact-cosine precision stage over the at-rest vectors. Either way
    delta↔prior and delta↔delta pairs surface exactly once each and
    prior↔prior pairs (resolved at build) are never re-emitted; the
    Jaccard verify reads persisted shingles; labels extend through the
    shared reduced graph; commit is the pointer flip. Idempotent by
    the id anti-join."""
    meta = read_semantic_meta(path)
    id_col = meta["id_col"]
    labels = read_semantic_labels(spark, path)

    known = labels.select(F.col("id").alias(id_col))
    new = emb_delta.join(known, id_col, "left_anti")
    if new.isEmpty():
        return {
            "n_new": 0, "n_candidates": 0, "n_edges": 0,
            "labels_version": meta["labels_version"],
        }
    # lazy pin: the uniqueness aggregate is the materializing pass
    new = new.localCheckpoint(eager=False)
    _assert_unique_ids(new, id_col, "ingest_semantic_delta")
    _sweep_stale_generations(path, meta)

    vec_dir, sh_dir = _dirs(path, meta)
    # lazy pins: the shingle-correspondence aggregate inside
    # _shingles_for materializes nvec; the n_edges count materializes
    # nsh/nbands — no dedicated pass per pin
    nvec = _vectors(new, id_col, meta["vec_col"]).localCheckpoint(
        eager=False
    )
    nsh = _shingles_for(docs_delta, nvec.select("id"), meta).localCheckpoint(
        eager=False
    )
    prior_vec = spark.read.parquet(vec_dir)
    nbands: DataFrame | None = None
    if meta.get("candidates") == "banded":
        # the 100 TB shape: delta-bands ⋈ at-rest-bands equi-join (the
        # delta side AQE-broadcasts; the corpus scan never shuffles)
        # plus intra-delta self-pairs, then the exact-cosine precision
        # stage reads only the candidate ids' vectors
        nbands = _bands_of(nvec, meta).localCheckpoint(eager=False)
        bands_dir = os.path.join(
            path, f"bands_v{meta.get('bands_version', 0)}"
        )
        prior_bands = spark.read.parquet(bands_dir)
        cross = (
            nbands.alias("d")
            .join(prior_bands.alias("p"), ["band", "band_hash"])
            .select(
                F.least(F.col("d.id"), F.col("p.id")).alias("id_a"),
                F.greatest(F.col("d.id"), F.col("p.id")).alias("id_b"),
            )
        )
        pairs = cross.unionByName(_self_pairs(nbands)).distinct()
        cand = _cosine_pairs(
            pairs, prior_vec.unionByName(nvec), meta["cos_threshold"]
        ).drop("cos_sim").localCheckpoint(eager=False)
    else:
        both = prior_vec.withColumn("__new", F.lit(False)).unionByName(
            nvec.withColumn("__new", F.lit(True))
        )
        cand = embedding_near_duplicates(
            both, threshold=meta["cos_threshold"], vec_col="vec", id_col="id",
            probe_filter=F.col("__new"),
        ).drop("cos_sim").localCheckpoint(eager=False)
    sh_all = spark.read.parquet(sh_dir).unionByName(nsh)
    # lazy checkpoints throughout: the n_edges count is the single
    # materializing pass that pins cand AND edges (eager checkpoints
    # paid one dedicated pass each on top of it)
    edges = verify_pairs_with_shingles(
        cand, sh_all, meta["jaccard_threshold"]
    ).localCheckpoint(eager=False)

    n_edges = edges.count()
    final = extend_labels(
        labels, edges, nvec.select("id"), n_edges, max_iter
    )

    nvec.write.mode("append").parquet(vec_dir)
    nsh.write.mode("append").parquet(sh_dir)
    if nbands is not None:
        _write_bands(
            nbands,
            os.path.join(path, f"bands_v{meta.get('bands_version', 0)}"),
            "append",
        )
    new_version = meta["labels_version"] + 1
    final.write.mode("overwrite").parquet(
        os.path.join(path, f"labels_v{new_version}")
    )
    stats = {
        "n_new": nvec.count(),
        "n_candidates": cand.count(),
        "n_edges": n_edges,
        "labels_version": new_version,
    }
    old_version = meta["labels_version"]
    meta["labels_version"] = new_version
    meta["n_docs"] = meta["n_docs"] + stats["n_new"]
    _write_sem_meta(path, meta)
    shutil.rmtree(
        os.path.join(path, f"labels_v{old_version}"), ignore_errors=True
    )
    return stats


def compact_semantic_index(
    spark: SparkSession,
    path: str,
    vector_files: int = 8,
    shingle_files: int = 8,
    files_per_band: int = 1,
) -> dict:
    """Maintenance twin of :func:`~neulix_datahub_spark.operators
    .dedupe_index.compact_dedup_index`: rewrite the appended-to feature
    relations (vectors, shingles, and — in banded mode — the
    band-partitioned bands) into IMMUTABLE next generations with
    right-sized files, committed together by ONE sidecar pointer flip.
    A crash before the flip leaves the old generations live; a retry
    clears the provably-orphaned targets (the pointer still references
    the old generations) and rewrites. Pure rewrite — row sets
    unchanged, proven by the invariance unit test. Returns the
    file-count log."""
    from neulix_datahub_spark.operators.dedupe_index import _n_parquet_files
    from neulix_datahub_spark.sources.io import compact_partitioned_parquet

    meta = read_semantic_meta(path)
    _sweep_stale_generations(path, meta)
    old_v, old_sh = _dirs(path, meta)
    banded = meta.get("candidates") == "banded"
    new_meta = dict(
        meta,
        vectors_version=meta.get("vectors_version", 0) + 1,
        shingles_version=meta.get("shingles_version", 0) + 1,
    )
    if banded:
        new_meta["bands_version"] = meta.get("bands_version", 0) + 1
    new_v, new_sh = _dirs(path, new_meta)
    shutil.rmtree(new_v, ignore_errors=True)
    shutil.rmtree(new_sh, ignore_errors=True)
    log = {"vector_files_before": _n_parquet_files(old_v),
           "shingle_files_before": _n_parquet_files(old_sh)}
    spark.read.parquet(old_v).repartition(vector_files).write.mode(
        "overwrite"
    ).parquet(new_v)
    spark.read.parquet(old_sh).repartition(shingle_files).write.mode(
        "overwrite"
    ).parquet(new_sh)
    log["vector_files_after"] = _n_parquet_files(new_v)
    log["shingle_files_after"] = _n_parquet_files(new_sh)
    old_b = new_b = None
    if banded:
        old_b = os.path.join(path, f"bands_v{meta.get('bands_version', 0)}")
        new_b = os.path.join(path, f"bands_v{new_meta['bands_version']}")
        shutil.rmtree(new_b, ignore_errors=True)
        band_log = compact_partitioned_parquet(
            spark, old_b, new_b, ["band"], files_per_band
        )
        log["band_files_before"] = band_log["files_before"]
        log["band_files_after"] = band_log["files_after"]
    _write_sem_meta(path, new_meta)  # the atomic commit for ALL rewrites
    shutil.rmtree(old_v, ignore_errors=True)
    shutil.rmtree(old_sh, ignore_errors=True)
    if old_b is not None:
        shutil.rmtree(old_b, ignore_errors=True)
    return log


def semantic_survivors(
    spark: SparkSession, path: str, df: DataFrame, id_col: str
) -> DataFrame:
    """Filter ``df`` to the index's current survivors (component
    minima plus unpaired rows)."""
    losers = (
        read_semantic_labels(spark, path)
        .filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
