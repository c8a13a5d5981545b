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
]
