from neulix_datahub_spark.sources.io import (
    read_csv,
    read_csv_sniffed,
    read_json,
    read_parquet,
    read_text,
    sniff_delimiter,
    write_csv,
    write_json,
    write_parquet,
    write_table,
    write_text,
)
from neulix_datahub_spark.sources.tables import TABLES, load_table, register_tables

__all__ = [
    "TABLES",
    "load_table",
    "register_tables",
    "read_parquet",
    "write_parquet",
    "read_csv",
    "write_csv",
    "read_csv_sniffed",
    "sniff_delimiter",
    "read_json",
    "write_json",
    "read_text",
    "write_text",
    "write_table",
]
