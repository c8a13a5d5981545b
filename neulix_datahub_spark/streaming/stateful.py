"""Custom stateful streaming operator (SURVEY §2.10 U3 reserve +
§2.9 extension): arbitrary per-key state machines via
``applyInPandasWithState`` — the Structured Streaming escape hatch for
semantics the built-in windowed aggregates can't express.

The demonstrator keeps running per-user totals (count, sum, max) and
emits the updated totals every micro-batch. State is an Arrow-encoded
tuple per user; the shuffle partitions by user_id, so state size scales
with distinct keys per executor, not with event volume — the standard
keyed-state budget at 100 TB/day event rates. Late data is bounded by
the upstream watermark.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, max_value double"
_STATE_SCHEMA = "n bigint, s double, m double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold the micro-batch into (count, sum, max) state and emit the
    running totals for this user."""
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0.0, float("-inf")
    for pdf in pdf_iter:
        vals = pdf["value"].astype(float)
        n += len(pdf)
        s += float(vals.sum())
        if len(vals):
            m = max(m, float(vals.max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(s, 4)],
            "max_value": [m],
        }
    )


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful running (count, sum, max) of ``value`` per user.

    Emits one row per user per micro-batch in ``update`` mode; the last
    emission per user equals the batch groupBy over the same bounded
    input (asserted in tests — the weak-oracle parity check for this
    non-SQL operator).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Stateful streaming funnel (the batch event_funnel_stats semantics as a
# per-user state machine)
# ---------------------------------------------------------------------------

_FUNNEL_OUT_SCHEMA = (
    "user_id bigint, n_seen bigint, t1 double, t2 double, t3 double"
)
_FUNNEL_STATE_SCHEMA = (
    "views array<double>, clicks array<double>, purchases array<double>"
)
# Single source of truth for the funnel step deadline — the batch query
# (plans/queries_analytics.py) imports this so the stream==batch parity
# oracle can never silently desynchronize. (The dependency points this
# way because plans already imports streaming; the reverse would cycle.)
FUNNEL_DEADLINE_HOURS = 72
_FUNNEL_DEADLINE_US = FUNNEL_DEADLINE_HOURS * 3600 * 1_000_000.0


def _first_after(cands: list[float], lo: float) -> float | None:
    """First candidate strictly after ``lo`` within the step deadline."""
    hits = [t for t in cands if lo < t <= lo + _FUNNEL_DEADLINE_US]
    return min(hits) if hits else None


def _update_funnel(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Buffer this user's funnel-relevant event times and recompute the
    view→click→purchase chain from the buffer each batch.

    Recompute-from-buffer (not incremental min-tracking) makes the
    operator ARRIVAL-ORDER-PROOF: a late-arriving earlier view shifts
    t1 and correctly invalidates/revises t2/t3, which monotone trackers
    get wrong. State is bounded by the user's relevant-event count
    inside the retention horizon (at 100 TB you bound the buffer by the
    funnel window: anything older than first_view + 2×deadline can be
    dropped at watermark time)."""
    if state.exists:
        views, clicks, purchases = (list(x) for x in state.get)
    else:
        views, clicks, purchases = [], [], []
    for pdf in pdf_iter:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").astype(float)
        for t, et in zip(ts_us, pdf["event_type"]):
            if et == "view":
                views.append(t)
            elif et == "click":
                clicks.append(t)
            elif et == "purchase":
                purchases.append(t)
    state.update((views, clicks, purchases))

    t1 = min(views) if views else None
    t2 = _first_after(clicks, t1) if t1 is not None else None
    t3 = _first_after(purchases, t2) if t2 is not None else None
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [len(views) + len(clicks) + len(purchases)],
            "t1": [t1],
            "t2": [t2],
            "t3": [t3],
        }
    )


def streaming_funnel(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user view→click→purchase funnel times as a stateful stream
    (72 h step deadlines, identical semantics to the batch
    event_funnel_stats query). Emits the user's current (t1, t2, t3)
    each micro-batch in ``update`` mode with a monotone ``n_seen``
    counter so a bounded drain can pick each user's final state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
