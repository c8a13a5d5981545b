"""Grouped time-series diagnostics via the batch grouped-map surface
(``groupBy().applyInPandas`` — SURVEY §2.10 U3's batch form; the
streaming form lives in streaming/stateful.py).

The grouped-map pattern is the right escape hatch when per-group logic
wants a real ndarray: each group arrives as ONE pandas frame (so the
group must fit an executor — fine for per-entity daily series, wrong
for raw events; aggregate first), and the output schema is declared up
front so Catalyst can keep planning around the black box.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def grouped_autocorr(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    lag: int = 7,
) -> DataFrame:
    """Per-group Pearson autocorrelation of a daily series at ``lag``
    days — the weekly-seasonality diagnostic (lag 7 high = strong
    weekly pattern). Input is one row per (group, day); each group's
    frame is sorted and self-aligned at the lag inside the grouped map
    (numpy corrcoef), pairing day t with day t-lag ONLY where both
    exist (calendar join, not positional shift — gaps stay honest).

    Scale: the shuffle key is the group; per-group state is O(days),
    bounded by calendar, regardless of raw event volume (callers
    aggregate to daily grain first).
    """
    import numpy as np

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_days bigint, n_pairs bigint, autocorr double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        s = pdf.sort_values(day_col)
        days = pd.to_datetime(s[day_col])
        if days.duplicated().any():
            # the contract is one row per (group, day); a dict build
            # would silently keep the LAST duplicate and correlate a
            # wrong series — refuse instead (callers aggregate first)
            raise ValueError(
                f"duplicate {day_col} rows for group {key!r}: "
                "aggregate to daily grain before grouped_autocorr"
            )
        by_day = dict(zip(days, s[value_col].astype(float)))
        pairs = [
            (by_day[d - pd.Timedelta(days=lag)], v)
            for d, v in by_day.items()
            if d - pd.Timedelta(days=lag) in by_day
        ]
        if len(pairs) >= 3:
            a = np.array([p[0] for p in pairs])
            b = np.array([p[1] for p in pairs])
            r = float(np.corrcoef(a, b)[0, 1]) if a.std() > 0 and b.std() > 0 else None
        else:
            r = None
        return pd.DataFrame(
            {
                key_col: [key],
                "n_days": [len(by_day)],
                "n_pairs": [len(pairs)],
                "autocorr": [None if r is None else round(r, 6)],
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, schema=out_schema)


def grouped_cov(
    df: DataFrame,
    key_col: str,
    value_cols: list[str],
    fixed_point_scale: int | None = None,
) -> DataFrame:
    """Per-group population covariance matrix (long form: one row per
    ordered pair incl. the diagonal variances) via the ARROW-native
    grouped map (``applyInArrow`` — Spark 4's zero-pandas-conversion
    sibling of the grouped_autocorr path above): each group arrives as
    one pyarrow Table, numpy computes the matrix on a zero-copy column
    stack, and the result goes back as a pyarrow Table. For wide
    matrices this skips the pandas block-manager round-trip entirely,
    which is the point of the API; the per-group memory bound and
    scale guidance are the same as every grouped map here (aggregate
    first; the group must fit an executor).

    ``bias=True`` covariance matches SQL ``covar_pop`` — the driver
    query hashes the full matrix against DuckDB's.

    ``fixed_point_scale`` makes the result DECIMAL-EXACT for inputs
    that are fixed-point decimals stored as doubles (money, discounts):
    each value is scaled to the nearest integer (``round(x*scale)``),
    the sums ``n, Σa, Σb, Σa·b`` are accumulated as exact arbitrary-
    precision integers, and the 6-dp-rounded covariance is derived by
    PURE INTEGER half-up division — ``q = ⌊(2·|num|·10⁶ + den) /
    (2·den)⌋`` with ``num = n·Σab − Σa·Σb`` and ``den = n²·scale²`` —
    then emitted as the double ``±q / 10⁶``. ``q`` stays below 2⁵³ for
    any money-scale variance, so the division of two exactly-
    represented values is correctly rounded and BIT-IDENTICAL in every
    engine that evaluates the same integer formula (the driver oracle
    does, on HUGEINTs). Float summation-association error and cross-
    engine ``round()`` asymmetry are both gone, not just reduced.
    Accumulation is chunked int64 dot products folded into Python ints
    (overflow-free at any group size).
    """
    import numpy as np
    import pyarrow as pa

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, var_x string, var_y string, "
        "n bigint, cov double"
    )

    def _exact_cov(cols: "list[np.ndarray]", n: int) -> "dict[tuple[int, int], float]":
        # Scale to exact integers; values are k/scale so x*scale is
        # within 1 ulp of integer k — never near the .5 boundary, so
        # rint (half-even) and SQL round (half-up) agree.
        scaled = [
            np.rint(c * fixed_point_scale).astype(np.int64) for c in cols
        ]
        sums = [int(s.sum()) for s in scaled]
        # |a*b| <= (max_scaled)^2; chunk so an int64 partial dot cannot
        # overflow, then fold chunks into a Python int (exact).
        peak = max(int(np.abs(s).max()) for s in scaled) if n else 0
        chunk = max(1, min(n, (2**62) // max(1, peak * peak)))
        den = n * n * fixed_point_scale * fixed_point_scale
        out: dict[tuple[int, int], float] = {}
        for i in range(len(cols)):
            for j in range(i, len(cols)):
                sab = 0
                a, b = scaled[i], scaled[j]
                for lo in range(0, n, chunk):
                    sab += int(np.dot(a[lo : lo + chunk], b[lo : lo + chunk]))
                num = n * sab - sums[i] * sums[j]
                q = (2 * abs(num) * 1_000_000 + den) // (2 * den)
                out[(i, j)] = (q if num >= 0 else -q) / 1_000_000.0
        return out

    def stats(table: pa.Table) -> pa.Table:
        key = table.column(key_col)[0].as_py()
        cols = [
            table.column(c).to_numpy(zero_copy_only=False).astype(float)
            for c in value_cols
        ]
        n = len(cols[0])
        if fixed_point_scale is not None and n >= 1:
            vals = _exact_cov(cols, n)  # already 6-dp exact — no re-round
        else:
            x = np.column_stack(cols)
            cov = np.cov(x, rowvar=False, bias=True) if n > 1 else np.zeros(
                (len(value_cols), len(value_cols))
            )
            cov = np.atleast_2d(cov)
            vals = {
                (i, j): round(float(cov[i, j]), 6)
                for i in range(len(value_cols))
                for j in range(i, len(value_cols))
            }
        keys, xs, ys, ns, vs = [], [], [], [], []
        for i, a in enumerate(value_cols):
            for j, b in enumerate(value_cols):
                if j < i:
                    continue  # upper triangle + diagonal
                keys.append(key)
                xs.append(a)
                ys.append(b)
                ns.append(n)
                vs.append(vals[(i, j)])
        return pa.table(
            {key_col: keys, "var_x": xs, "var_y": ys, "n": ns, "cov": vs}
        )

    return df.groupBy(key_col).applyInArrow(stats, schema=out_schema)


def grouped_holt(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Per-group Holt double-exponential smoothing (level + trend) via
    the batch grouped map — the sequential recurrence no window
    function expresses:

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}

    initialized l_1 = x_1, b_1 = 0. Emits every step plus the one-step
    forecast ``l_t + b_t`` — the trend-aware anomaly baseline EWMA
    (level-only) cannot give.

    Cross-engine exactness (the driver hashes this): the recurrence is
    evaluated in scalar IEEE doubles in EXACTLY the spelled order, so
    any engine replaying the same expressions on the same inputs (a
    recursive CTE in the oracle) lands on bit-identical doubles at
    every step — no rounding tolerance anywhere. The default
    α = β = 0.5 makes the coefficient literals trivially identical too
    (0.5 and 1-0.5 are the same double; 0.3 and 1-0.3=0.7 are NOT).

    Scale: shuffle key is the group; per-group state is O(steps) and
    callers pre-aggregate to a bounded grain (daily), so group size is
    calendar-bounded regardless of raw volume — same contract as
    grouped_autocorr above.
    """
    key_type = df.schema[key_col].dataType.simpleString()
    ord_type = df.schema[ord_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ord_col} {ord_type}, "
        "level double, trend double, forecast double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(ord_col).reset_index(drop=True)
        xs = [float(v) for v in s[value_col]]
        levels, trends = [], []
        l = xs[0]
        b = 0.0
        levels.append(l)
        trends.append(b)
        for x in xs[1:]:
            l_new = alpha * x + (1.0 - alpha) * (l + b)
            b_new = beta * (l_new - l) + (1.0 - beta) * b
            l, b = l_new, b_new
            levels.append(l)
            trends.append(b)
        return pd.DataFrame(
            {
                key_col: s[key_col],
                ord_col: s[ord_col],
                "level": levels,
                "trend": trends,
                "forecast": [lv + tr for lv, tr in zip(levels, trends)],
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, schema=out_schema)


def grouped_cusum(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    target: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """Per-group CUSUM change detection over an INTEGER-valued series
    (pass money as cents): the classic one-sided pair of accumulators

        hi_t = max(0, hi_{t-1} + x_t - (target + slack))
        lo_t = max(0, lo_{t-1} + (target - slack) - x_t)

    with an alarm when either crosses ``threshold``. All state is
    integer arithmetic, so every step — and therefore the alarm
    positions — is EXACTLY reproducible in any engine (the driver
    oracle replays the recurrence in a recursive CTE with zero
    tolerance; contrast grouped_holt, which needs IEEE-identical float
    spelling to achieve the same).

    Emits every step: (key, ord, x, cusum_hi, cusum_lo, alarm).
    Same grouped-map scale contract as the others in this module:
    group state is O(steps), callers pre-aggregate to a bounded grain.
    """
    key_type = df.schema[key_col].dataType.simpleString()
    ord_type = df.schema[ord_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ord_col} {ord_type}, x bigint, "
        "cusum_hi bigint, cusum_lo bigint, alarm boolean"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(ord_col).reset_index(drop=True)
        xs = [int(v) for v in s[value_col]]
        hi = lo = 0
        his, los, alarms = [], [], []
        for x in xs:
            hi = max(0, hi + x - (target + slack))
            lo = max(0, lo + (target - slack) - x)
            his.append(hi)
            los.append(lo)
            alarms.append(hi > threshold or lo > threshold)
        return pd.DataFrame(
            {
                key_col: s[key_col],
                ord_col: s[ord_col],
                "x": xs,
                "cusum_hi": his,
                "cusum_lo": los,
                "alarm": alarms,
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, schema=out_schema)
