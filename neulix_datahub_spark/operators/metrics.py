"""A minimal SEMANTIC LAYER: metrics declared once, evaluated correctly
at any grouping.

The failure this prevents is the oldest one in BI: a rate metric
(margin %, conversion, avg order value) stored as a per-row or
per-fine-grain number and then AVERAGED to a coarser grain — avg-of-
ratios ≠ ratio-of-sums whenever group sizes differ (Simpson's
arithmetic). Declaring the metric as (numerator expr, denominator
expr) lets the evaluator re-derive it from SUMS at whatever dims the
caller asks for, which is always correct and always one aggregation
pass.

The reference's dashboards hand-write this per query
(``core/utils/db_core.py`` delegated SQL); declaring it once is the
semantic-layer contract (the metrics-store idea à la dbt metrics /
LookML measures), expressed as plain Column algebra — no DSL, no YAML,
fully Catalyst-visible.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Metric:
    """A named measure. ``kind``:

    - ``"sum"``: additive — ``sum(expr)`` at any grain.
    - ``"count"``: additive — ``count(expr non-null)`` (expr=None → *).
    - ``"ratio"``: NON-additive — re-derived as sum(num)/sum(den) at
      every grain; never averaged.
    """

    name: str
    kind: str
    expr: Column | None = None
    num: Column | None = None
    den: Column | None = None

    def __post_init__(self) -> None:
        if self.kind not in ("sum", "count", "ratio"):
            raise ValueError(f"unknown metric kind {self.kind!r}")
        if self.kind == "ratio" and (self.num is None or self.den is None):
            raise ValueError(f"ratio metric {self.name!r} needs num and den")
        if self.kind == "sum" and self.expr is None:
            raise ValueError(f"sum metric {self.name!r} needs expr")


def evaluate_metrics(
    df: DataFrame, metrics: list[Metric], dims: list[str]
) -> DataFrame:
    """One aggregation pass computing every metric at ``dims`` grain.
    Ratio metrics aggregate their parts and divide once at the end
    (``try_divide`` — an empty denominator group reads null, not an
    ANSI abort). Re-grouping to coarser dims means calling this again
    on the base frame (sums re-aggregate; ratios re-derive) — never
    aggregating this function's own output."""
    aggs: list[Column] = []
    finals: list[Column] = [F.col(d) for d in dims]
    for m in metrics:
        if m.kind == "sum":
            aggs.append(F.sum(m.expr).alias(m.name))
            finals.append(F.col(m.name))
        elif m.kind == "count":
            aggs.append(
                (F.count(m.expr) if m.expr is not None else F.count(F.lit(1))).alias(
                    m.name
                )
            )
            finals.append(F.col(m.name))
        else:
            aggs.append(F.sum(m.num).alias(f"__{m.name}_num"))
            aggs.append(F.sum(m.den).alias(f"__{m.name}_den"))
            finals.append(
                F.try_divide(
                    F.col(f"__{m.name}_num").cast("double"),
                    F.col(f"__{m.name}_den").cast("double"),
                ).alias(m.name)
            )
    return df.groupBy(*dims).agg(*aggs).select(*finals)
