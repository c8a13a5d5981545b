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
_STATE_SCHEMA = "n bigint, nn bigint, s double, m double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold the micro-batch into (count, non-null count, sum, max) state
    and emit the running totals for this user. NULL values follow SQL
    aggregate semantics: they count toward ``n_events`` (count(*)), are
    skipped by sum/max, and a user with NO non-null values emits NULL
    sum/max — the previous spelling emitted 0.0 and the -inf init
    sentinel for that user, diverging from any batch groupBy."""
    if state.exists:
        n, nn, s, m = state.get
    else:
        n, nn, s, m = 0, 0, 0.0, float("-inf")
    for pdf in pdf_iter:
        n += len(pdf)
        vals = pdf["value"].astype(float).dropna()
        nn += len(vals)
        if len(vals):
            s += float(vals.sum())
            m = max(m, float(vals.max()))
    state.update((n, nn, s, m))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(s, 4) if nn else None],
            "max_value": [m if nn else None],
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
# n_seen rides in state because the event buffers are PRUNED (see
# _update_funnel) — the monotone counter the drain's final-state pick
# relies on can't be derived from buffer lengths anymore
_FUNNEL_STATE_SCHEMA = (
    "n_seen bigint, views array<double>, clicks array<double>, "
    "purchases array<double>"
)
# Single source of truth for the funnel step deadline lives in the
# dependency-free params module (batch plans import it from there
# without pulling pandas/state machinery in); re-exported here for
# compatibility with older imports.
from neulix_datahub_spark.params import FUNNEL_DEADLINE_HOURS  # noqa: E402,F401

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
    get wrong. NULL event times are dropped up front (NaT→int64 raises
    in pandas 2.x, and the batch oracle's NULL comparisons ignore such
    rows anyway).

    The buffers are BOUNDED, not append-forever (an active user's state
    would otherwise grow linearly with their lifetime event count —
    every post-purchase event of a converted user used to pile up):

    - views collapse to their minimum — t1 is monotone decreasing and
      nothing else about a view matters;
    - clicks later than ``t1 + deadline`` can never become admissible
      (their window's upper bound only moves DOWN as late views lower
      t1), so they drop; purchases likewise at ``t1 + 2·deadline``.

    Events BEFORE t1 are kept: a later-arriving even-earlier view can
    lower t1 and make them admissible, and ``applyInPandasWithState``
    does not portably filter sub-watermark rows into the function, so
    a watermark-based lower prune silently loses revisions (measured:
    the checkpoint-restart parity test catches it). The buffer is thus
    bounded by the pre-first-view prefix plus the funnel window — the
    unbounded tail AFTER the window, which is what actually grows with
    a user's lifetime, is gone. ``n_seen`` (the drain's monotone
    final-state tiebreak) is carried in state since buffer lengths no
    longer count every event."""
    if state.exists:
        n_seen, views, clicks, purchases = state.get
        views, clicks, purchases = list(views), list(clicks), list(purchases)
    else:
        n_seen, views, clicks, purchases = 0, [], [], []
    for pdf in pdf_iter:
        pdf = pdf.dropna(subset=["ts"])
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").astype(float)
        for t, et in zip(ts_us, pdf["event_type"]):
            if et == "view":
                views.append(t)
                n_seen += 1
            elif et == "click":
                clicks.append(t)
                n_seen += 1
            elif et == "purchase":
                purchases.append(t)
                n_seen += 1

    t1 = min(views) if views else None
    t2 = _first_after(clicks, t1) if t1 is not None else None
    t3 = _first_after(purchases, t2) if t2 is not None else None

    # prune AFTER computing this batch's answer (see docstring for why
    # only the upper bounds are provably safe here)
    if t1 is not None:
        views = [t1]
        clicks = [t for t in clicks if t <= t1 + _FUNNEL_DEADLINE_US]
        purchases = [
            t for t in purchases if t <= t1 + 2 * _FUNNEL_DEADLINE_US
        ]
    state.update((n_seen, views, clicks, purchases))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [n_seen],
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
    counter so a bounded drain can pick each user's final state.

    Only funnel-relevant event types enter the stateful shuffle: other
    events would otherwise be hashed to the state operator, allocate
    empty state for users who never touch the funnel, and emit useless
    all-NULL rows into the sink every micro-batch (the batch funnel
    filters per step for the same reason). Consumers counting funnel
    users are unaffected — non-funnel users contributed nothing but a
    NULL row."""
    from pyspark.sql import functions as F

    return (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
