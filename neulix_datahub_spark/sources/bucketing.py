"""Bucketed-table layout for co-located joins (SCALE.md: "co-locate
joins via bucketing").

At 100 TB the orders⋈lineitem shuffle dominates every fact-fact query.
Writing both tables bucketed by the join key (same bucket count) makes
the join map-side: each task reads matching buckets from both sides and
no Exchange appears in the plan — the shuffle is paid ONCE at layout
time instead of per query. This is plain Spark bucketing
(``bucketBy().sortBy().saveAsTable``); tests assert the Exchange-free
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed parquet table. Both sides of a co-located join must use the
    same ``num_buckets`` and bucket columns."""
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching layouts Catalyst
    plans this without any Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
