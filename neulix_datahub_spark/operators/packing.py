"""Concat-and-chunk document packing (training-data extension, SURVEY
§2.11 tier).

LLM pretraining pipelines concatenate documents head-to-tail and slice
the resulting token tape into fixed-length sequences; the useful batch
precomputation is "which pack does each document start in", so
same-pack documents can be routed to the same writer task. That
assignment is a pure exclusive-cumsum over a deterministic document
order — no sequential state, unlike first-fit bin packing — so it
runs as one window over one shuffle per partition key.

Scale: with ``part_col`` (e.g. language or source shard) the window
shuffles once on that key and each partition's cumsum runs
independently. WITHOUT it the global tape position comes from the
two-phase running total (``operators/sequence.with_running_total``:
range-repartition on the document order + local cumsum + broadcast
prefix offsets) — no single-partition window, so a whole-corpus pack
assignment holds at any size. Results are identical to the global
window form (an exclusive cumsum is the inclusive one minus the row's
own tokens).
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
    if budget < 1:
        # floor(offset / 0) degenerates to NaN/Inf doubles deep in the
        # plan (ANSI doubles don't throw on /0) — name the bad argument
        raise ValueError(f"budget must be >= 1, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    if part_col:
        w = (
            Window.partitionBy(part_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offset = F.coalesce(F.sum(tok).over(w), F.lit(0)).alias("pack_offset")
        out = df.withColumn("pack_offset", offset)
    else:
        # whole-corpus tape: two-phase inclusive cumsum, then subtract
        # the row's own tokens for the exclusive start position — no
        # single-partition global window at any corpus size. NULL token
        # counts coalesce to 0 (the row occupies no tape) so the
        # subtraction can't null out pack_offset/pack_id — matching the
        # part_col branch, where sum() skips the null and the row still
        # lands at the previous rows' offset.
        from neulix_datahub_spark.operators.sequence import with_running_total

        out = (
            with_running_total(
                df.withColumn("__tok", F.coalesce(tok, F.lit(0))),
                [id_col], "__tok", "__incl"
            )
            .withColumn("pack_offset", F.col("__incl") - F.col("__tok"))
            .drop("__tok", "__incl")
        )
    return out.withColumn("pack_id", F.floor(F.col("pack_offset") / budget))


def chunk_by_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int,
    overlap: int = 0,
) -> DataFrame:
    """Per-document sliding-window chunking: split each document's
    whitespace token sequence into fixed-``chunk_size`` windows where
    consecutive chunks share ``overlap`` tokens — the RAG/eval-context
    prep that complements :func:`pack_by_token_budget`'s cross-document
    tape packing.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``; a document of ``n`` tokens yields
    ``1 + ceil((n - chunk_size) / stride)`` chunks (always ≥ 1 — an
    empty document keeps one empty chunk so no doc silently disappears).
    Tokenization matches ``text.token_count`` (trim, collapse
    whitespace, split on space).

    Output: one row per chunk — the input columns plus ``chunk_id``
    (0-based), ``chunk_text``, ``n_chunk_tokens`` (< chunk_size only on
    a document's last chunk). ``id_col`` names the document-identity
    column that keys the output — ``(id_col, chunk_id)`` is the unique
    chunk key downstream reassembly relies on; its presence is
    validated here so a typo fails at plan time, not at join time.

    Plan shape: pure narrow expressions — split, an exploded
    ``sequence`` of ×(n/stride) fan-out, and a per-chunk ``slice`` — no
    shuffle, no UDF; scales embarrassingly like every per-document map.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    if id_col not in df.columns:
        raise ValueError(
            f"id_col {id_col!r} not in input columns {df.columns} — it must "
            "name the document-identity column keying (id, chunk_id)"
        )
    stride = chunk_size - overlap
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    n = F.size("__toks")
    # 1 base chunk + ceil((n - size)/stride) continuation chunks, with
    # ceil spelled floor((n - size + stride - 1)/stride) in int math.
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.floor((n - chunk_size + stride - 1) / stride).cast("int") + 1
    )
    out = (
        df.withColumn("__toks", toks)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            "__chunk_toks",
            F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_size),
        )
        .withColumn("chunk_text", F.array_join("__chunk_toks", " "))
        .withColumn("n_chunk_tokens", F.size("__chunk_toks"))
        .drop("__toks", "__chunk_toks")
    )
    return out
