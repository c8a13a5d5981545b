"""Stream-stream joins (S-extension; no reference analogue — the
reference is daily Airflow batch).

Structured Streaming's interval join: two unbounded streams joined on an
equality key plus a time-range predicate. Both sides carry watermarks,
and the range bound (``lower``/``upper``) is what lets the engine expire
join state — without it a stream-stream join would buffer both streams
forever. State per key is bounded by ``watermark + (upper - lower)``.

Batch parity: over a bounded input the drained join equals the same
join run as a batch query, which is how the registered query is
oracle-checked (plans/queries_stream.py::stream_interval_join_counts).

At 100 TB-scale streaming this runs against Kafka sources with
shuffle-partitioned state stores; locally the parquet fixture drives it
via ``readStream`` exactly like the window operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lower: str = "0 seconds",
    upper: str = "12 hours",
    watermark: str = "24 hours",
    how: str = "inner",
) -> DataFrame:
    """Interval join: for each left row, right rows with the same
    ``key`` whose ``ts_col`` falls in ``[left.ts + lower, left.ts + upper]``.

    ``how="left_outer"`` adds the null-extension semantics: a left row
    with NO in-window partner emits once with null right columns — but
    only after the watermark passes ``left.ts + upper`` (the engine
    must be sure no partner can still arrive), so outer results trail
    the inner ones by up to the watermark delay, and rows whose windows
    are still open when a bounded drain ends are NOT emitted. That
    emission timing is inherent to the model (matched rows stream out
    immediately; absence is only provable at expiry) and is exactly
    what the unit pins.

    Output columns: ``key``, ``left_ts``, ``right_ts`` plus the right
    side's non-key/non-ts columns (prefixed ``right_``) — explicit
    projection, so the ambiguous-column trap of self-joining the same
    source never reaches the caller.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & F.expr(
        f"r.{ts_col} BETWEEN l.{ts_col} + INTERVAL {lower} "
        f"AND l.{ts_col} + INTERVAL {upper}"
    )
    right_extra = [
        c for c in right.columns if c not in (key, ts_col)
    ]
    return l.join(r, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        *[F.col(f"r.{c}").alias(f"right_{c}") for c in right_extra],
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-static dimension join — the standard streaming enrichment
    pattern: each micro-batch of ``stream`` joins against the batch-side
    ``dim`` (re-planned per batch, so a refreshed dimension table is
    picked up between batches without restarting the query).

    No forced broadcast: the per-batch planner broadcasts a dim that is
    actually small, and a dim that scales (customer at the 100 TB design
    point) shuffle-joins — the same invariant the batch registries
    enforce via the plan-shape test. Stateless (no watermark needed):
    only the stream side is unbounded."""
    cond = stream[stream_key] == dim[dim_key]
    return stream.join(dim, cond, how).drop(dim[dim_key])
