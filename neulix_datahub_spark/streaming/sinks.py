"""Streaming upsert sink (SURVEY §2.3 J2 streaming path, §2.1 IO14):
``foreachBatch`` + keyed MERGE published onto a versioned snapshot
table (``sources/snapshots.py`` — immutable snapshot dirs + atomic
pointer publish).

The reference upserts row-by-row into Firestore with 500-op batches
(``core/utils/db_core.py:272-337``); the streaming engine replaces that
with per-micro-batch set-based MERGE. Each batch merges into the
current snapshot and publishes the next one with an atomic pointer
move, so readers never see a half-written table, concurrent readers of
the previous version keep working, and a checkpoint-replayed batch
re-publishes idempotently (the keyed MERGE is idempotent, so the extra
version carries identical content). With Delta available the same
``foreachBatch`` body becomes ``MERGE INTO`` and the snapshot
bookkeeping disappears.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from neulix_datahub_spark.operators.upsert import upsert
from neulix_datahub_spark.sources.snapshots import (
    current_version,
    read_snapshot_table,
    vacuum_snapshots,
    write_snapshot,
)


def read_upsert_table(spark: SparkSession, path: str) -> DataFrame | None:
    """Current contents of a snapshot-versioned upsert table (None while
    nothing has been published)."""
    if current_version(path) is None:
        return None
    return read_snapshot_table(spark, path)


def stream_upsert_to_parquet(
    stream_df: DataFrame,
    path: str,
    key: str,
    tiebreak: str | None = None,
    checkpoint_dir: str | None = None,
    retain_versions: int | None = 8,
    output_mode: str | None = None,
) -> StreamingQuery:
    """Drive ``stream_df`` into a keyed snapshot table with MERGE
    semantics: within and across micro-batches, the last/greatest-
    ``tiebreak`` row per ``key`` wins. Runs with ``Trigger.AvailableNow``
    (bounded drain); long-lived deployments drop that trigger and keep
    the checkpoint.

    ``retain_versions`` vacuums all but the N newest snapshot versions
    after each publish — a long-lived stream publishes one version per
    micro-batch, so without retention the table grows without bound.
    The default keeps 8 (long-running readers of recent versions stay
    valid through ~8 further batches); ``None`` disables vacuuming.
    """
    spark = stream_df.sparkSession

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        existing = read_upsert_table(spark, path)
        merged = upsert(existing, batch_df, key, tiebreak) if existing is not None \
            else upsert(batch_df.limit(0), batch_df, key, tiebreak)
        write_snapshot(merged, path)
        if retain_versions is not None:
            vacuum_snapshots(path, keep=retain_versions)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).trigger(availableNow=True)
    if output_mode:
        # "update" turns an AGGREGATED stream into a continuous rollup:
        # each micro-batch hands the changed (key, latest-total) rows to
        # the MERGE, materializing the aggregate incrementally (append
        # mode would hold rows back until the watermark finalizes them).
        writer = writer.outputMode(output_mode)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _batch_fingerprint(batch_df: DataFrame) -> tuple[int, int]:
    """Order-independent content fingerprint of a micro-batch:
    (row count, bit-XOR of per-row xxhash64 over all columns). XOR is
    commutative and overflow-free, so the pair is a pure function of the
    batch's multiset of rows (up to XOR-cancelling duplicates) at the
    cost of one aggregate.

    Used by the exactly-once sinks to tell a checkpoint REPLAY of an
    already-committed batch id (same content → safe to skip) from a
    fresh run whose batch ids restarted at 0 over an ADVANCED source
    (different content under the same id → refusing loudly beats
    silently dropping data). A monotonic batch id alone cannot make
    that distinction — ids are only comparable within one continuous
    checkpoint lineage."""
    row = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in batch_df.columns])),
            F.lit(0),
        ).alias("x"),
    ).first()
    return int(row["n"]), int(row["x"])


def stream_agg_maintain_to_parquet(
    stream_df: DataFrame,
    path: str,
    group_cols: list[str],
    count_col: str,
    sum_map: dict[str, str],
    checkpoint_dir: str | None = None,
    retain_versions: int | None = 8,
) -> StreamingQuery:
    """Continuously maintain a count/sum MATERIALIZED AGGREGATE from an
    append-only stream — the streaming face of
    ``operators/incremental.py``: each micro-batch is treated as a pure
    insert feed, collapsed map-side to one delta row per touched group,
    and merged into the aggregate snapshot table. Unlike the
    ``output_mode="update"`` + MERGE rollup (stream_upsert_to_parquet),
    NO Spark aggregation state is held: the accumulated truth lives in
    the snapshot table, so the aggregate survives checkpoint loss and
    is readable (atomically, any version) by any outside consumer
    mid-stream.

    Exactly-once on top of foreachBatch's at-least-once, in BOTH replay
    regimes (batch ids are only comparable within one continuous
    checkpoint lineage, so the id alone cannot carry the guarantee):

    - continuous checkpoint, in-flight batch re-delivered after a
      crash: its id equals the committed ``_last_batch_id`` and its
      content fingerprint matches the stamped one → skip.
    - checkpoint lost/reset (ids restart at 0, the whole source is
      re-delivered): the sink accumulates the re-run's cumulative
      content fingerprint and skips until it EQUALS the committed
      cumulative stamp — the already-folded prefix — then folds every
      batch after it. A source that grew past the old checkpoint is
      therefore drained without loss OR double count; a re-run whose
      prefix content diverges from what was committed raises instead
      of guessing.

    Fingerprints are order-independent (count + XOR of row hashes,
    ``_batch_fingerprint``) and ride on the snapshot rows, so they
    commit atomically with the data they describe.
    """
    from neulix_datahub_spark.operators.incremental import apply_agg_delta

    spark = stream_df.sparkSession

    def _empty_agg(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.limit(0)
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias(count_col),
                *[F.sum(src).cast("double").alias(out) for out, src in sum_map.items()],
            )
        )

    _STAMPS = ("_last_batch_id", "_last_batch_fp_n", "_last_batch_fp_x",
               "_content_fp_n", "_content_fp_x")
    # per-run replay tracker (foreachBatch calls arrive sequentially)
    run = {"mode": "normal", "cum_n": 0, "cum_x": 0}

    def _maintain(batch_df: DataFrame, batch_id: int) -> None:
        existing = read_upsert_table(spark, path)
        meta = None
        if existing is not None:
            meta = existing.agg(
                F.max("_last_batch_id").alias("id"),
                F.max("_last_batch_fp_n").alias("n"),
                F.max("_last_batch_fp_x").alias("x"),
                F.max("_content_fp_n").alias("cn"),
                F.max("_content_fp_x").alias("cx"),
            ).first()
            existing = existing.drop(*_STAMPS)
        done = meta["id"] if meta is not None else None
        fp_n, fp_x = _batch_fingerprint(batch_df)
        if done is not None and batch_id <= done and run["mode"] == "normal":
            if batch_id == done and (fp_n, fp_x) == (meta["n"], meta["x"]):
                return  # continuous-checkpoint replay of the in-flight batch
            run["mode"] = "replay"  # ids restarted: full re-delivery
        if run["mode"] == "replay":
            run["cum_n"] += fp_n
            run["cum_x"] ^= fp_x
            if run["cum_n"] < meta["cn"]:
                return  # still inside the already-committed prefix
            if run["cum_n"] == meta["cn"] and run["cum_x"] == meta["cx"]:
                run["mode"] = "normal"  # prefix fully re-delivered
                return  # batches after this one are genuinely new
            raise RuntimeError(
                "checkpoint lineage restarted but the re-delivered content "
                f"diverges from the committed prefix at batch {batch_id} "
                f"(seen {run['cum_n']} rows vs committed {meta['cn']}). "
                "Refusing to skip (data loss) or fold (double count) — "
                "restart with a fresh table + checkpoint."
            )
        if existing is None:
            existing = _empty_agg(batch_df)
        feed = batch_df.withColumn("_change_type", F.lit("insert"))
        updated = apply_agg_delta(existing, feed, group_cols, count_col, sum_map)
        prev_cn = meta["cn"] if meta is not None and meta["cn"] is not None else 0
        prev_cx = meta["cx"] if meta is not None and meta["cx"] is not None else 0
        stamped = (
            updated.withColumn("_last_batch_id", F.lit(batch_id))
            .withColumn("_last_batch_fp_n", F.lit(fp_n))
            .withColumn("_last_batch_fp_x", F.lit(fp_x))
            .withColumn("_content_fp_n", F.lit(prev_cn + fp_n))
            .withColumn("_content_fp_x", F.lit(prev_cx ^ fp_x))
        )
        write_snapshot(stamped, path)
        if retain_versions is not None:
            vacuum_snapshots(path, keep=retain_versions)

    writer = stream_df.writeStream.foreachBatch(_maintain).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


#: Reserved member name carrying the last committed batch id inside a
#: stream-maintained catalog (exactly-once bookkeeping, committed in the
#: SAME atomic manifest as the data members).
STREAM_META_TABLE = "commit_meta"


def stream_commit_tables(
    stream_df: DataFrame,
    catalog_root: str,
    members: "dict[str, object]",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """TRANSACTIONAL multi-table streaming sink: every micro-batch
    derives new versions of several tables and publishes them in ONE
    atomic catalog commit (sources/snapshots.py commit_tables) — a
    reader can never observe member A updated without member B, at any
    point, under any interleaving. This is the cross-table guarantee
    foreachBatch sinks normally give up (two separate writes = a window
    where the tables disagree).

    ``members`` maps table name -> ``fn(batch_df, existing_df_or_None)
    -> full new DataFrame`` (existing is the member at the catalog's
    current commit; None before the first). Exactly-once rides the same
    commit: the reserved ``commit_meta`` member records the batch id
    AND content fingerprints ATOMICALLY WITH the data, so there is no
    state in which the data committed but the bookkeeping didn't. Both
    replay regimes are covered (see stream_agg_maintain_to_parquet):
    an in-flight batch re-delivered under a continuous checkpoint skips
    by (id, fingerprint); a fresh checkpoint over a possibly-advanced
    source skips the re-delivered prefix by cumulative fingerprint,
    folds the new tail, and raises on divergent content.

    Works with incremental member functions (e.g. an
    operators/incremental.py delta fold) so per-batch cost tracks batch
    size, not table size. Trigger is AvailableNow (bounded drain);
    long-lived deployments drop it.
    """
    from neulix_datahub_spark.sources.snapshots import (
        commit_tables,
        read_catalog_manifest,
    )

    if STREAM_META_TABLE in members:
        raise ValueError(f"{STREAM_META_TABLE!r} is reserved")
    spark = stream_df.sparkSession
    run = {"mode": "normal", "cum_n": 0, "cum_x": 0}

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        try:
            manifest = read_catalog_manifest(catalog_root)
        except FileNotFoundError:
            manifest = {}
        meta = None
        if STREAM_META_TABLE in manifest:
            meta = read_snapshot_table(
                spark,
                os.path.join(catalog_root, STREAM_META_TABLE),
                manifest[STREAM_META_TABLE],
            ).first().asDict()
        fp_n, fp_x = _batch_fingerprint(batch_df)
        if meta is not None and batch_id <= meta["last_batch_id"] and run["mode"] == "normal":
            if batch_id == meta["last_batch_id"] and (fp_n, fp_x) == (
                meta.get("last_fp_n"), meta.get("last_fp_x")
            ):
                return  # continuous-checkpoint replay of the in-flight batch
            run["mode"] = "replay"  # ids restarted: full re-delivery
        if run["mode"] == "replay":
            run["cum_n"] += fp_n
            run["cum_x"] ^= fp_x
            cn, cx = meta.get("content_n"), meta.get("content_x")
            if cn is not None and run["cum_n"] < cn:
                return  # still inside the already-committed prefix
            if run["cum_n"] == cn and run["cum_x"] == cx:
                run["mode"] = "normal"  # prefix fully re-delivered
                return
            raise RuntimeError(
                "checkpoint lineage restarted but the re-delivered content "
                f"diverges from the committed prefix at batch {batch_id}. "
                "Refusing to skip (data loss) or fold (double count) — "
                "start a fresh catalog with the fresh checkpoint."
            )
        updates = {}
        for name, fn in members.items():
            existing = (
                read_snapshot_table(
                    spark, os.path.join(catalog_root, name), manifest[name]
                )
                if name in manifest
                else None
            )
            updates[name] = fn(batch_df, existing)
        prev_cn = meta.get("content_n") if meta else 0
        prev_cx = meta.get("content_x") if meta else 0
        updates[STREAM_META_TABLE] = spark.createDataFrame(
            [(batch_id, fp_n, fp_x, (prev_cn or 0) + fp_n, (prev_cx or 0) ^ fp_x)],
            "last_batch_id bigint, last_fp_n bigint, last_fp_x bigint, "
            "content_n bigint, content_x bigint",
        )
        commit_tables(updates, catalog_root)

    writer = stream_df.writeStream.foreachBatch(_commit).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_dedup_to_parquet(
    stream_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    retain_versions: int | None = 8,
) -> StreamingQuery:
    """Incremental corpus dedup: drain a document stream into an
    append-only parquet corpus that never admits a content duplicate —
    the continuously-ingesting form of :func:`~neulix_datahub_spark.
    operators.dedupe.exact_dedup`.

    Per micro-batch: (1) within-batch exact dedup (min-``id_col``
    survivor per content fingerprint); (2) LEFT ANTI join against the
    persistent fingerprint store, so content seen in *any* earlier batch
    is dropped — arrival order wins across batches, the streaming-native
    precedence; (3) append the admitted docs to ``data/`` and write the
    union of fingerprints as the next ``_fingerprints`` snapshot
    version (atomic pointer publish).
    Readers always see a committed snapshot (same protocol as
    :func:`stream_upsert_to_parquet`).

    Scale: the store holds one 64-char fingerprint per distinct doc —
    at 10^10 docs ~0.6 TB, a fine anti-join build side partitioned the
    same way as the batch. Rewriting the full store each batch is the
    no-Delta concession; with Delta/Iceberg the snapshot becomes a
    MERGE-on-read append and nothing is rewritten.
    """
    from neulix_datahub_spark.operators.dedupe import (
        content_fingerprint,
        exact_dedup,
    )

    spark = stream_df.sparkSession
    fp_dir = os.path.join(path, "_fingerprints")
    data_dir = os.path.join(path, "data")

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = exact_dedup(batch_df, text_col, id_col).withColumn(
            "__fp", content_fingerprint(text_col)
        )
        seen = read_upsert_table(spark, fp_dir)
        if seen is not None:
            batch = batch.join(
                seen, batch["__fp"] == seen["fingerprint"], "left_anti"
            )
        # one evaluation feeds two writes (corpus append + store snapshot)
        batch = batch.localCheckpoint()
        batch.drop("__fp").write.mode("append").parquet(data_dir)
        new_fps = batch.select(F.col("__fp").alias("fingerprint"))
        all_fps = new_fps if seen is None else seen.unionByName(new_fps)
        write_snapshot(all_fps, fp_dir)
        if retain_versions is not None:
            vacuum_snapshots(fp_dir, keep=retain_versions)

    writer = stream_df.writeStream.foreachBatch(_dedup_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    path: str,
    partition_cols: list[str] | tuple[str, ...],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Native exactly-once streaming landing into the Hive-partitioned
    layout (``sources/io.py::write_partitioned_parquet``'s streaming
    sibling): the built-in parquet streaming sink commits every
    micro-batch through its ``_spark_metadata`` transaction log, so a
    checkpoint-replayed batch re-commits the same entry and Spark
    readers (which consult the log) never see duplicates — the
    exactly-once guarantee the foreachBatch sinks above have to
    reimplement via snapshot publishes.

    ``partitionBy`` yields the same directory-pruned date layout as the
    batch writer. Each micro-batch appends one file per touched
    partition, so a long-lived stream fragments the layout — schedule
    ``compact_partitioned_parquet`` as the maintenance job (reading
    through Spark keeps consistency while compacting into a NEW root).

    ``checkpoint_dir`` is mandatory: the sink's exactly-once story IS
    the checkpoint + metadata log pair.
    """
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*partition_cols)
        .trigger(availableNow=True)
        .start()
    )


def _quarantine_split(
    batch_df: DataFrame,
    batch_id: int,
    json_col: str,
    schema: str,
    good_path: str,
    quarantine_path: str,
) -> None:
    """One micro-batch of the quarantine sink, REPLAY-IDEMPOTENT: both
    sinks write into a ``batch_id=N`` subdirectory with overwrite, so a
    checkpoint-replayed batch rewrites its own directory instead of
    appending duplicates (foreachBatch is at-least-once; idempotent
    per-batch output is the sink's job — same rule the dedup sink in
    this module documents). The batch is localCheckpoint'ed once so the
    two writes share one evaluation instead of re-parsing the source
    twice."""
    full = f"{schema}, _corrupt_record string"
    opts = {"columnNameOfCorruptRecord": "_corrupt_record", "mode": "PERMISSIVE"}
    parsed = batch_df.withColumn(
        "__p", F.from_json(F.col(json_col), full, opts)
    ).localCheckpoint(eager=True)
    corrupt = F.col("__p._corrupt_record").isNotNull()
    bad = parsed.filter(corrupt).select(F.col(json_col).alias("raw_payload"))
    good = (
        parsed.filter(~corrupt | F.col(json_col).isNull())
        .select("*", F.col("__p.*"))
        .drop("__p", "_corrupt_record")
    )
    bad.write.mode("overwrite").parquet(f"{quarantine_path}/batch_id={batch_id}")
    good.write.mode("overwrite").parquet(f"{good_path}/batch_id={batch_id}")


def stream_json_quarantine(
    stream_df: DataFrame,
    json_col: str,
    schema: str,
    good_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Streaming SC7 with the warn-don't-fail posture: parse
    ``json_col`` against ``schema`` per micro-batch; rows that parse
    land under ``good_path`` with typed columns, rows that DON'T
    (detected via an explicit ``_corrupt_record`` column — from_json's
    PERMISSIVE mode returns a struct of null FIELDS for garbage, which
    a null-struct check would wave through) land WHOLE under
    ``quarantine_path`` — the streaming counterpart of
    sources.io.read_json_permissive, so one poison message can neither
    kill a 24/7 pipeline nor vanish silently. Null payloads count as
    good (nothing to parse).

    Effectively-once per sink: outputs land in hive-style
    ``batch_id=N`` directories written with overwrite, so an
    at-least-once foreachBatch replay rewrites its own directory
    rather than duplicating rows (see _quarantine_split). Readers scan
    the root path; ``batch_id`` arrives as a partition column."""

    def split(batch_df: DataFrame, batch_id: int) -> None:
        _quarantine_split(
            batch_df, batch_id, json_col, schema, good_path, quarantine_path
        )

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(split)
        .trigger(availableNow=True)
        .start()
    )


def stream_neardup_dedup_to_parquet(
    stream_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 16,
    checkpoint_dir: str | None = None,
    retain_versions: int | None = 8,
) -> StreamingQuery:
    """Incremental NEAR-duplicate corpus dedup — the streaming form of
    the MinHash-LSH pipeline (operators/dedupe.py): a document is
    admitted only if no already-admitted document is a verified near-dup
    (exact shingle Jaccard ≥ ``threshold`` among its LSH candidates).
    Arrival order wins: the first member of a near-dup cluster to arrive
    survives, later members drop — the precedence a continuously-
    ingesting corpus needs (re-running batch dedup from scratch per
    ingest would be O(corpus) per batch; this is O(batch·candidates)).

    Per micro-batch: (1) signature + banded keys for the batch; (2)
    equi-join on (band, band-hash) against the persistent BAND INDEX of
    admitted docs → candidate pairs only (never all-pairs); (3) verify
    candidates by exact Jaccard over stored normalized shingle sets —
    LSH proposes, verification disposes, so false LSH collisions cannot
    drop a unique document; (4) within-batch: same verify over
    banded within-batch candidates, min-id survivor per cluster edge;
    (5) append admitted docs, publish the grown band index + shingle
    store as the next snapshot version (atomic pointer).

    Scale: the index holds bands·1 rows + one shingle array per
    admitted doc. The shingle store is the honest cost of EXACT
    verification (same trade as dedupe.verify_candidate_pairs); beyond
    memory, store minhash signatures instead and verify by signature
    agreement (estimate, not exact) — one knob, same shape.
    """
    from neulix_datahub_spark.operators.dedupe import (
        _shingles,
        jaccard_expr,
        minhash_signature,
    )

    spark = stream_df.sparkSession
    idx_dir = os.path.join(path, "_neardup_index")
    data_dir = os.path.join(path, "data")

    def _banded(df: DataFrame) -> DataFrame:
        rows = num_hashes // bands
        sig = minhash_signature(F.col(text_col), num_hashes=num_hashes)
        return df.withColumn("__sig", sig).withColumn(
            "__band",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.hash(F.slice("__sig", b * rows + 1, rows)).alias("bh"),
                        )
                        for b in range(bands)
                    ]
                )
            ),
        ).select(
            F.col(id_col), F.col(text_col),
            F.col("__band.band").alias("band"), F.col("__band.bh").alias("bh"),
            _shingles(F.col(text_col), 3).alias("__sh"),
        )

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = _banded(batch_df).localCheckpoint()
        index = read_upsert_table(spark, idx_dir)

        # (a) cross-batch: candidates vs the admitted index, verified
        doomed_vs_index = None
        if index is not None:
            cand = batch.join(
                index.select(
                    F.col("band"), F.col("bh"),
                    F.col("shingles").alias("__sh_old"),
                ),
                ["band", "bh"],
            )
            doomed_vs_index = (
                cand.filter(
                    jaccard_expr(F.col("__sh"), F.col("__sh_old")) >= threshold
                )
                .select(id_col)
                .distinct()
            )

        # (b) within-batch: banded candidate pairs, min-id survivor
        a = batch.select(
            F.col(id_col).alias("__ida"), "band", "bh",
            F.col("__sh").alias("__sha"),
        )
        b = batch.select(
            F.col(id_col).alias("__idb"), "band", "bh",
            F.col("__sh").alias("__shb"),
        )
        doomed_within = (
            a.join(b, ["band", "bh"])
            .filter(F.col("__ida") < F.col("__idb"))
            .filter(jaccard_expr(F.col("__sha"), F.col("__shb")) >= threshold)
            .select(F.col("__idb").alias(id_col))
            .distinct()
        )
        doomed = (
            doomed_within
            if doomed_vs_index is None
            else doomed_within.unionByName(doomed_vs_index).distinct()
        )
        admitted = (
            batch.join(doomed, id_col, "left_anti")
            .groupBy(id_col, text_col, "__sh")
            .agg(F.count(F.lit(1)).alias("__nb"))
            .drop("__nb")
            .localCheckpoint()
        )
        admitted.select(id_col, text_col).write.mode("append").parquet(data_dir)
        # reuse the checkpointed banded rows — re-shingling the admitted
        # docs would redo the expensive signature work per batch
        new_index = batch.join(
            admitted.select(id_col), id_col, "left_semi"
        ).select(id_col, "band", "bh", F.col("__sh").alias("shingles"))
        all_index = (
            new_index if index is None else index.unionByName(new_index)
        )
        write_snapshot(all_index, idx_dir)
        if retain_versions is not None:
            vacuum_snapshots(idx_dir, keep=retain_versions)

    writer = stream_df.writeStream.foreachBatch(_dedup_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
