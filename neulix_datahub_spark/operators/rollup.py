"""Summary-table (continuous-aggregate) ROUTING: answer coarse-grain
time aggregates from a materialized fine-grain rollup instead of the
raw fact table — the consumption side of the incrementally-maintained
hourly rollup (`stream_hourly_rollup` proves the maintenance side).

At 100 TB this is the difference between scanning a year of raw events
and scanning 8 760 hourly rows: any query whose time grain is a
multiple of the rollup grain and whose aggregates are DECOMPOSABLE
(count/sum/min/max re-aggregate losslessly; avg must be derived as
sum/count, never averaged-over-averages) can be routed. The router
enforces both rules loudly instead of silently answering wrong.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# date_trunc grains ordered fine → coarse. "week" is deliberately OUT of
# this chain: ISO weeks straddle month boundaries, so month/quarter/year
# buckets are NOT unions of whole week buckets — routing week→month would
# silently misattribute the straddling days. Week participates only via
# the explicit rules in _routable below.
_GRAIN_ORDER = ("minute", "hour", "day", "month", "quarter", "year")
_SUB_DAY = ("minute", "hour", "day")


def _routable(rollup_grain: str, query_grain: str) -> bool:
    """Every query bucket must be a union of whole rollup buckets."""
    if rollup_grain == "week":
        return query_grain == "week"  # nothing coarser aligns with weeks
    if query_grain == "week":
        return rollup_grain in _SUB_DAY  # weeks are unions of whole days
    try:
        return _GRAIN_ORDER.index(query_grain) >= _GRAIN_ORDER.index(rollup_grain)
    except ValueError as exc:
        raise ValueError(f"unknown grain: {exc}") from exc

_MERGEABLE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def answer_from_rollup(
    rollup: DataFrame,
    *,
    rollup_grain: str,
    query_grain: str,
    window_col: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Re-aggregate a materialized ``rollup_grain`` rollup to
    ``query_grain``. ``measures`` maps output column → (merge_fn,
    rollup_column) with merge_fn in count/sum/min/max (count partials
    merge by SUM — re-counting rows would count buckets, the classic
    routing bug). Raises when the query grain is finer than the rollup
    (unanswerable) or a merge fn is non-decomposable."""
    for g in (rollup_grain, query_grain):
        if g != "week" and g not in _GRAIN_ORDER:
            raise ValueError(f"unknown grain: {g!r}")
    if not _routable(rollup_grain, query_grain):
        raise ValueError(
            f"cannot answer {query_grain}-grain from a {rollup_grain} rollup "
            "(finer than the rollup, or buckets don't align — e.g. weeks "
            "straddle months) — route to the raw table instead"
        )
    aggs: list[Column] = []
    for out_name, (fn, src_col) in measures.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{fn} is not decomposable over rollup partials "
                f"(supported: {sorted(_MERGEABLE)}); derive it from "
                "sum/count instead (e.g. avg = sum/count)"
            )
        merge = F.sum if fn == "count" else _MERGEABLE[fn]
        aggs.append(merge(F.col(src_col)).alias(out_name))
    return rollup.groupBy(
        F.date_trunc(query_grain, F.col(window_col)).alias(window_col), *group_cols
    ).agg(*aggs)
