"""Decimal-exact checksum expressions for money-scale aggregates.

A driver-hashed column must produce the IDENTICAL value in Spark and
the DuckDB oracle. ``round(sum(double), dp)`` over money magnitudes
(~1e6+) cannot guarantee that: partial-agg association error and
.5-tie rounding asymmetry both flip the last digit. The idiom here
makes the checksum exact instead of tolerated:

- money columns are exact 2-dp decimals stored as doubles (all TPC-H
  money columns and events.value are — verified per fixture), so
  ``CAST(x AS DECIMAL(18,2))`` recovers the exact value;
- decimal sums are associative and order-independent;
- the final ``CAST(sum AS DOUBLE)`` of a ≤15-significant-digit decimal
  is correctly rounded in both engines → bit-identical.

Every Spark expression here has a ``*_sql`` twin producing the DuckDB
mirror, so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONEY = "decimal(18,2)"
_FRAC = "decimal(4,2)"  # discounts/taxes: 0.00-0.99, 2-dp


def money_sum(col: str | Column) -> Column:
    """Exact sum of a 2-dp money column, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_MONEY)).cast("double")


def money_sum_sql(col: str) -> str:
    return f"CAST(sum(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def revenue_sum(price: str, discount: str) -> Column:
    """Exact sum of price*(1-discount) — the TPC-H revenue kernel.
    price is 2-dp money, discount a 2-dp fraction, so the product is an
    exact 4-dp decimal and the sum is exact."""
    one = F.lit("1.00").cast(_FRAC)
    return F.sum(
        F.col(price).cast(_MONEY) * (one - F.col(discount).cast(_FRAC))
    ).cast("double")


def revenue_sum_sql(price: str, discount: str) -> str:
    return (
        f"CAST(sum(CAST({price} AS DECIMAL(18,2)) * "
        f"(CAST('1.00' AS DECIMAL(4,2)) - CAST({discount} AS DECIMAL(4,2)))) "
        "AS DOUBLE)"
    )


def discount_revenue_sum(price: str, discount: str) -> Column:
    """Exact sum of price*discount (TPC-H Q6's forecast-revenue kernel)."""
    return F.sum(
        F.col(price).cast(_MONEY) * F.col(discount).cast(_FRAC)
    ).cast("double")


def discount_revenue_sum_sql(price: str, discount: str) -> str:
    return (
        f"CAST(sum(CAST({price} AS DECIMAL(18,2)) * "
        f"CAST({discount} AS DECIMAL(4,2))) AS DOUBLE)"
    )
