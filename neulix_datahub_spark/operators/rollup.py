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

# date_trunc grains ordered fine → coarse; a query grain is routable iff
# it is the rollup grain or coarser (every coarser bucket is a union of
# whole finer buckets for this chain).
_GRAIN_ORDER = ("minute", "hour", "day", "week", "month", "quarter", "year")

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
    try:
        fine, coarse = _GRAIN_ORDER.index(rollup_grain), _GRAIN_ORDER.index(
            query_grain
        )
    except ValueError as exc:
        raise ValueError(f"unknown grain: {exc}") from exc
    if coarse < fine:
        raise ValueError(
            f"cannot answer {query_grain}-grain from a {rollup_grain} rollup — "
            "route to the raw table instead"
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
