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
