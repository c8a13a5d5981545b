"""Concat-and-chunk document packing (training-data extension, SURVEY
§2.11 tier).

LLM pretraining pipelines concatenate documents head-to-tail and slice
the resulting token tape into fixed-length sequences; the useful batch
precomputation is "which pack does each document start in", so
same-pack documents can be routed to the same writer task. That
assignment is a pure exclusive-cumsum over a deterministic document
order — no sequential state, unlike first-fit bin packing — so it
runs as one window over one shuffle per partition key.

Scale: ALWAYS pass ``part_col`` (e.g. language or source shard) on a
large corpus — the window then shuffles once on that key and each
partition's cumsum runs independently. Without it the window is global
(single-task ordering) and only acceptable for bounded inputs; the
operator keeps that form because the oracle checks it directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str | Column,
    budget: int,
    part_col: str | None = None,
) -> DataFrame:
    """Assign each row to the pack where its text starts on the token
    tape: ``pack_id = floor(exclusive_running_sum(tokens) / budget)``,
    running in ``id_col`` order within ``part_col``. Adds ``pack_id``
    (bigint) and ``pack_offset`` (the row's start position on the tape).
    Documents longer than ``budget`` simply span packs — matching
    concat-and-chunk semantics, where slicing happens downstream."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    base = Window.partitionBy(part_col) if part_col else Window.partitionBy()
    w = base.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    offset = F.coalesce(F.sum(tok).over(w), F.lit(0)).alias("pack_offset")
    out = df.withColumn("pack_offset", offset)
    return out.withColumn("pack_id", F.floor(F.col("pack_offset") / budget))
