from neulix_datahub_spark.functions.cleaning import (
    comma_decimal,
    fill_nulls_by_type,
    find_col,
    iso_timestamp,
    parse_flag,
    sanitize_column_name,
    sanitize_columns,
    stringify,
    try_timestamp,
)

__all__ = [
    "sanitize_column_name",
    "sanitize_columns",
    "find_col",
    "parse_flag",
    "comma_decimal",
    "iso_timestamp",
    "try_timestamp",
    "stringify",
    "fill_nulls_by_type",
]
