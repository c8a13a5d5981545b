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
