from neulix_datahub_spark.streaming.sinks import (
    read_upsert_table,
    stream_upsert_to_parquet,
)
from neulix_datahub_spark.streaming.stateful import running_user_totals
from neulix_datahub_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    sessionized,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sessionized",
    "stream_dedup",
    "run_stream_to_memory",
    "running_user_totals",
    "stream_upsert_to_parquet",
    "read_upsert_table",
]
