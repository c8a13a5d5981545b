"""S1–S5: streaming queries over the bounded events fixture must equal
their batch counterparts (SURVEY §5.2 item 6)."""

from __future__ import annotations

from neulix_datahub_spark.plans.queries import QUERIES
from neulix_datahub_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sessionized,
    stream_dedup,
    tumbling_counts,
)
from tests.compare import assert_frames_match
from tests.conftest import SF_DIR


def test_tumbling_stream_matches_batch(spark):
    stream = tumbling_counts(read_events_stream(spark, SF_DIR))
    run_stream_to_memory(stream, "tumbling_out", output_mode="complete")
    got = spark.sql("SELECT * FROM tumbling_out").toPandas()
    batch = QUERIES["events_hourly"].fn(spark, SF_DIR).toPandas()
    assert_frames_match(got, batch)


def test_session_stream_matches_batch(spark):
    stream = sessionized(read_events_stream(spark, SF_DIR))
    run_stream_to_memory(stream, "sessions_out", output_mode="complete")
    got = spark.sql("SELECT * FROM sessions_out").toPandas()
    batch = QUERIES["user_sessions"].fn(spark, SF_DIR).toPandas()
    assert_frames_match(got, batch)


def test_stream_dedup_keeps_unique_ids(spark):
    stream = stream_dedup(read_events_stream(spark, SF_DIR))
    run_stream_to_memory(stream, "dedup_out", output_mode="append")
    got = spark.sql("SELECT event_id FROM dedup_out").toPandas()
    assert got.event_id.is_unique
    assert len(got) == 1000  # fixture has unique event ids at sf0.001


def test_sliding_window_runs(spark):
    stream = tumbling_counts(read_events_stream(spark, SF_DIR), "1 hour", slide="30 minutes")
    run_stream_to_memory(stream, "sliding_out", output_mode="complete")
    n = spark.sql("SELECT count(*) AS n FROM sliding_out").first().n
    # every event lands in exactly 2 sliding windows
    total = spark.sql("SELECT sum(n_events) AS s FROM sliding_out").first().s
    assert n > 0 and total == 2000
