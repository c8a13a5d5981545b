"""Keyed upsert / merge (SURVEY §2.3 J2).

Reference semantics: ``upsert_dataframe_firestore``
(``core/utils/db_core.py:272-337``) — every update row overwrites the
whole document with the same id (last write wins), new ids are inserted.

Spark-first expression: an anti-join + union —
``target ⟕̸ updates  ∪  updates`` — which Catalyst plans as one shuffle
(or a broadcast anti-join when updates are small, the common CDC case).
With a Delta/Iceberg catalog this becomes ``MERGE INTO``; the anti-join
form is the engine-neutral fallback and is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    tiebreak: str | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Return ``target`` with ``updates`` applied (insert-or-overwrite by
    ``key``).

    If ``updates`` contains duplicate keys, ``tiebreak`` names a column
    whose maximum picks the winning row (the reference's behavior is
    arrival-order last-write-wins, ``db_core.py:304-331``, which is
    nondeterministic distributed — a tiebreak column makes it defined
    PROVIDED the tiebreak is unique within each key; rows that also tie
    on the tiebreak still get an arbitrary single winner, same as
    ``dropDuplicates``). ``broadcast_updates=True`` hints the planner
    when updates are a small CDC batch against a huge target: the
    anti-join then runs map-side with no shuffle of the target.

    NULL keys upsert as one key (``groupBy``/``dropDuplicates``
    semantics): an update row with a NULL key REPLACES the target's
    NULL-key row instead of piling a duplicate next to it on every
    application — a null-unsafe join can never match NULL=NULL and
    silently breaks both the overwrite contract and idempotence.

    Plan note (measured on the sf0.1 bench upsert): the ``eqNullSafe``
    anti-join rewrites to ``(coalesce(k,0), isnull(k))`` hash keys,
    costing one extra exchange of the (small) updates side vs the
    null-unsafe spelling — ~0.1s here, the price of a correct NULL-key
    contract. Two alternatives were measured and REJECTED: a separate
    ≤1-row null-marker anti-join re-evaluated the whole updates lineage
    a third time (+55%), and pinning the keys with a localCheckpoint
    paid a materialization job per call that exceeded the exchange it
    saved.
    """
    if tiebreak is not None:
        w = Window.partitionBy(key).orderBy(F.desc(tiebreak))
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        updates = updates.dropDuplicates([key])
    keys = updates.select(F.col(key).alias("__upsert_key"))
    join_side = F.broadcast(keys) if broadcast_updates else keys
    kept = target.join(
        join_side, target[key].eqNullSafe(F.col("__upsert_key")), "left_anti"
    )
    return kept.unionByName(updates.select(*target.columns))


def upsert_evolving(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """:func:`upsert` under ADDITIVE schema evolution: updates may carry
    columns the target lacks (and vice versa) — the union happens over
    the merged column set with nulls where a side has no value, the
    same additive-only evolution contract as the mergeSchema read path
    (sources/snapshots.align_schemas refuses TYPE changes upstream;
    this handles the legal case). A kept target row reads null for a
    newly added column — exactly what a Delta ``MERGE`` with
    ``mergeSchema`` produces.

    Shared columns changing TYPE raise loudly (delegated to
    ``align_schemas`` — one widening implementation for the merge and
    the snapshot paths, so the additive-evolution rules cannot drift);
    plan shape is unchanged from :func:`upsert` — one anti-join + one
    union, no extra pass.
    """
    # lazy import: snapshots imports this module's upsert at call time
    from neulix_datahub_spark.sources.snapshots import align_schemas

    target, updates = align_schemas(target, updates)
    return upsert(target, updates, key, tiebreak)
