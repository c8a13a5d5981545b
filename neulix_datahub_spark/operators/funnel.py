"""N-step funnel analysis as a reusable operator (the batch side of
streaming/stateful.py::streaming_funnel, generalized beyond the 3-step
query in plans/queries_analytics.py).

Semantics: step i is a user's FIRST event of the step's type strictly
after their step-(i-1) time and within ``deadline_hours`` of it; step 0
is the first event of the entry type. Every join and aggregation keys
on the user column — one exchange layout end-to-end; per-user state
after the first aggregation is one row per reached step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_funnel(
    events: DataFrame,
    steps: list[str],
    *,
    deadline_hours: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Wide per-user funnel frame: one row per user who completed step 0,
    with nullable columns ``t0 .. t{n-1}`` holding each step's first
    completion time (null once the chain breaks)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.select(user_col, type_col, ts_col)
    wide = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    prev = wide
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col(type_col) == step)
            .join(prev.select(user_col, f"t{i-1}"), user_col)
            .where(
                (F.col(ts_col) > F.col(f"t{i-1}"))
                & (
                    F.col(ts_col)
                    <= F.col(f"t{i-1}") + F.expr(f"INTERVAL {deadline_hours} HOURS")
                )
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        wide = wide.join(nxt, user_col, "left")
        prev = nxt
    return wide


def funnel_summary(wide: DataFrame, steps: list[str]) -> DataFrame:
    """One row per step: users reached + percent of the previous step
    and of step 0 — the conversion table a dashboard renders. Built as
    a single 1-row aggregate exploded to long form (no second scan)."""
    aggs = [F.count(f"t{i}").alias(f"__n{i}") for i in range(len(steps))]
    one = wide.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(steps[i]).alias("step"),
                F.col(f"__n{i}").alias("users"),
                # try_divide: an empty step (or empty funnel) yields null
                # percentages instead of ANSI's DIVIDE_BY_ZERO abort
                F.round(
                    F.try_divide(
                        F.col(f"__n{i}") * 100.0, F.col(f"__n{max(i - 1, 0)}")
                    ),
                    4,
                ).alias("pct_of_prev"),
                F.round(
                    F.try_divide(F.col(f"__n{i}") * 100.0, F.col("__n0")), 4
                ).alias("pct_of_entry"),
            )
            for i in range(len(steps))
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")
