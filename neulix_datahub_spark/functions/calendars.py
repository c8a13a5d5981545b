"""Fiscal (4-4-5) calendar derivation — the retail/finance grouping a
Gregorian date_trunc cannot express.

A 4-4-5 calendar divides each 13-week fiscal quarter into periods of
4, 4, and 5 weeks, so every period contains whole weeks and every
quarter the same count — the property month-based reporting lacks
(months have ragged week counts, making period-over-period comparisons
noisy). Everything here is pure INTEGER day arithmetic off a fixed
epoch (no timezone, no month table), so any engine replays the mapping
bit-for-bit — the driver hashes fiscal aggregates against a DuckDB
re-derivation.

Convention implemented (the common simple form): fiscal weeks start at
the epoch date and number consecutively; fiscal year N covers weeks
[52N, 52N+52) (the real-world 53rd "leap week" variant adds a rule for
year length — a one-line change to ``weeks_per_year`` — documented
rather than silently chosen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fiscal_445_columns(
    date_col: Column | str, epoch: str = "1992-02-01"
) -> dict[str, Column]:
    """Fiscal year / quarter / period / week columns for a date column
    under a 4-4-5 calendar anchored at ``epoch`` (a fiscal year start).

    Returns {"fiscal_year", "fiscal_quarter", "fiscal_period",
    "fiscal_week"} — all ints. Dates before the epoch raise no error
    but map to negative weeks; anchor the epoch before your data.
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    day = F.datediff(d.cast("date"), F.lit(epoch).cast("date"))
    week = F.floor(day / 7).cast("long")
    year_idx = F.floor(week / 52).cast("long")
    w_in_year = (week - year_idx * 52).cast("long")  # 0..51
    q = F.floor(w_in_year / 13).cast("long")  # 0..3
    w_in_q = (w_in_year - q * 13).cast("long")  # 0..12
    period_in_q = (
        F.when(w_in_q < 4, F.lit(0)).when(w_in_q < 8, F.lit(1)).otherwise(F.lit(2))
    )
    return {
        "fiscal_year": (F.lit(int(epoch[:4])) + year_idx).cast("int"),
        "fiscal_quarter": (q + 1).cast("int"),
        "fiscal_period": (q * 3 + period_in_q + 1).cast("int"),
        "fiscal_week": (w_in_year + 1).cast("int"),
    }
