"""Cleaning / normalization functions (SURVEY §2.2 F1–F8, §2.8 SC1–SC10).

Reference semantics re-expressed as Column expressions (citations into
/root/reference/):

- Identifier sanitization (5 steps): ``core/utils/db_core.py:55-72``.
- Case-insensitive + substring column resolution (``find_col``):
  ``core/utils/sheets_core.py:47-59``.
- Messy-boolean parsing (``parse_flag``): ``core/utils/sheets_core.py:61-78``
  — truthy tokens ``1 true t sim s yes y`` (case/space-insensitive) or a
  comma-decimal numeric equal to 1.0.
- Null replacement by type class: ``core/utils/db_core.py:41-53``
  (numeric→0, string→'', datetime→coerce-to-null).
- ISO-8601 timestamp formatting: ``core/utils/sheets_core.py:81-84``.
- Comma-decimal numeric parse: ``core/utils/sheets_core.py:74-75``.
- Universal stringify with null sentinel: ``core/utils/data_core.py:250,257``.

Everything is a composition of built-in ``pyspark.sql.functions`` — these
stay inside whole-stage codegen; no Python UDFs in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Identifier sanitization (F3) — driver-side, names only.
# ---------------------------------------------------------------------------

_NON_IDENT = re.compile(r"[^0-9a-zA-Z_]")
_UNDERSCORES = re.compile(r"_+")


def sanitize_column_name(name: str) -> str:
    """The reference's 5-step name sanitizer (``db_core.py:55-72``):
    strip → non-[a-zA-Z0-9_]→_ → collapse _+ → strip _ → ``col_`` prefix
    if the result starts with a digit (or is empty)."""
    out = name.strip()
    out = _NON_IDENT.sub("_", out)
    out = _UNDERSCORES.sub("_", out)
    out = out.strip("_")
    if not out:
        return "col"
    if out[0].isdigit():
        out = f"col_{out}"
    return out


def sanitize_columns(df: DataFrame) -> DataFrame:
    """F3 applied to a DataFrame — a pure rename (``toDF``), zero data
    movement; Catalyst treats it as a projection."""
    return df.toDF(*[sanitize_column_name(c) for c in df.columns])


def find_col(df: DataFrame, target: str) -> str | None:
    """F2: case-insensitive exact match first, then substring fallback
    (``sheets_core.py:47-59``). Resolution over ``df.columns`` is
    driver-side metadata — free at any scale."""
    want = target.strip().lower()
    for c in df.columns:
        if c.strip().lower() == want:
            return c
    for c in df.columns:
        if want in c.lower():
            return c
    return None


# ---------------------------------------------------------------------------
# Value expressions (F6/F7, SC1–SC6) — pure Column compositions.
# ---------------------------------------------------------------------------

TRUTHY_TOKENS = ("1", "true", "t", "sim", "s", "yes", "y")


def parse_flag(col: Column | str) -> Column:
    """F7: messy-boolean parse (``sheets_core.py:61-78``).

    True iff the lowercased, trimmed value is a truthy token, or parses as
    a (comma-decimal-tolerant) number equal to 1.0. Anything else —
    including '2', '0.0', '' and NULL — is False.
    """
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    as_num = F.replace(c, F.lit(","), F.lit(".")).try_cast(T.DoubleType())
    return F.coalesce(c.isin(*TRUTHY_TOKENS) | (as_num == F.lit(1.0)), F.lit(False))


def comma_decimal(col: Column | str) -> Column:
    """SC5: ``'1,5'`` → 1.5; invalid → NULL (``sheets_core.py:74-75``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(F.trim(c), F.lit(","), F.lit(".")).try_cast(T.DoubleType())


def iso_timestamp(col: Column | str) -> Column:
    """SC3: timestamp → ``%Y-%m-%dT%H:%M:%S`` string (``sheets_core.py:81-84``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def try_timestamp(col: Column | str) -> Column:
    """SC4: string → timestamp, invalid → NULL — the Spark spelling of
    ``pd.to_datetime(errors='coerce')`` (``db_core.py:52``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(T.TimestampType())


def stringify(col: Column | str, null_sentinel: str = "__NULL__") -> Column:
    """SC6: universal stringify with a null sentinel
    (``data_core.py:250,257``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(null_sentinel))


def fill_nulls_by_type(df: DataFrame) -> DataFrame:
    """F6: the reference's dtype-kind sanitizer (``db_core.py:41-53``) —
    numeric nulls→0, string nulls→'', timestamps stay nullable (invalid
    values already coerced to NULL at parse time)."""
    numeric = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                                   T.FloatType, T.DoubleType, T.DecimalType))
    ]
    strings = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    out = df
    if numeric:
        out = out.na.fill(0, numeric)
    if strings:
        out = out.na.fill("", strings)
    return out


def project_to_header(df: DataFrame, header: list[str]) -> DataFrame:
    """F1: project to an exact header list; missing columns become '' and
    nulls become '' (``sheets_core.py:194-209``, the Sheets append shape)."""
    cols = []
    for name in header:
        if name in df.columns:
            cols.append(F.coalesce(F.col(name).cast("string"), F.lit("")).alias(name))
        else:
            cols.append(F.lit("").alias(name))
    return df.select(*cols)
