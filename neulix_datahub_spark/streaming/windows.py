"""Structured Streaming operators (SURVEY §2.9 S1–S5).

The reference has no streaming at all (daily Airflow batch,
``wikipedia_dag.py:20-23``); this is the new-capability layer over the
``events`` surface, built entirely on Structured Streaming primitives:

- S1 tumbling/sliding windowed aggregates (``window``),
- S2 session windows (``session_window``),
- S3 watermarks for late data (``withWatermark``),
- S4 stream dedup (``dropDuplicatesWithinWatermark``),
- S5 batch parity: the same groupBys run as batch queries in
  plans/queries.py (events_hourly / user_sessions / distinct_events)
  and are hash-checked against the DuckDB oracle; the streaming paths
  are asserted equal to the batch results in tests.

At scale these run against a Kafka/files source with
``Trigger.AvailableNow`` or continuous micro-batches; locally the same
parquet fixture drives them via ``readStream.format("parquet")``.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Serializes run_stream_to_memory's session-conf mutate+drain+restore —
# see its docstring.
_DRAIN_LOCK = threading.Lock()

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# Any epoch long above this is nanoseconds: 1e17 µs is year 5138, while
# 1e17 ns is 1973 — the two unit regimes never overlap for real data.
_NANOS_MAGNITUDE = 100_000_000_000_000_000


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-source: the events fixture as an unbounded stream.

    The parquet file stores ``ts`` as TIMESTAMP(NANOS); reading it through
    an explicit ``LongType`` schema yields epoch **micro**second longs
    (the streaming reader converts, unlike the batch ``nanosAsLong`` path
    which yields raw nanos). Rather than hard-code either unit — round 2
    shipped an unconditional ``DIV 1000`` that put every streamed event in
    1970 — convert by observed magnitude, so batch and stream agree under
    both reader behaviors. An absolute-value unit test (min(ts) lands in
    2024) pins this; batch==stream parity alone cannot catch a symmetric
    unit error.
    """
    # File-stream sources take a directory; select just the events table.
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    micros = F.when(F.col("ts") > F.lit(_NANOS_MAGNITUDE), F.expr("ts DIV 1000")).otherwise(
        F.col("ts")
    )
    return raw.withColumn("ts", F.timestamp_micros(micros))


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """S1 (+S3): tumbling (or sliding when ``slide`` is set) windowed
    count/sum per event_type with a late-data watermark."""
    win = F.window("ts", window_size, slide) if slide else F.window("ts", window_size)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """S2 (+S3): session windows per user — state-backed in streaming."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events", "sum_value")
    )


def dynamic_sessionized(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S2 depth, streaming form: session windows whose gap is a PER-EVENT
    expression (error events hold the session open 2 h, everything else
    8 h) — the same interval-union semantics as the batch
    dynamic_gap_sessions query, state-backed under micro-batching. The
    gap expression must be CalendarIntervalType (string literals cast;
    DayTimeInterval is rejected by session_window)."""
    from neulix_datahub_spark.params import SESSION_GAP_DEFAULT, SESSION_GAP_ERROR

    gap = F.when(
        F.col("event_type") == "error", F.lit(SESSION_GAP_ERROR)
    ).otherwise(F.lit(SESSION_GAP_DEFAULT))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S4: drop duplicate event_ids within the watermark horizon — the
    bounded-state form of exact dedup for unbounded input."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
) -> None:
    """Drive a streaming query over the (bounded) fixture to completion and
    land the result in an in-memory table ``name`` — the local test sink.
    Real deployments swap this for kafka/parquet sinks + checkpointing.

    ``shuffle_partitions`` sets the STATE partition count for this query
    (fixed at first checkpoint): per-instance store maintenance dominates
    small bounded runs — measured 8.5s -> 2.3s on the sf0.1 interval
    join moving 32 -> 8 — while a production deployment sizes it to key
    cardinality/throughput, not to this fixture.

    There is no per-query spelling of this conf, so the override
    mutates the session-global value for the drain's duration. That
    mutate+drain+restore critical section is therefore ENFORCED
    serialized under a module lock: concurrent drains from a parallel
    harness queue instead of racing the save/restore (a memory-sink
    clash on ``name`` stays the caller's responsibility — pick distinct
    table names). Batch queries planned concurrently in the same
    session during a drain would still observe the override; a harness
    mixing those with drains should give drains their own session."""
    spark = df.sparkSession
    with _DRAIN_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            q = (
                df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            if shuffle_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
