from map_reduce_project_spark.streaming.windows import (
    run_stream_to_memory,
    stream_events,
    stream_session_counts,
    stream_tumbling_counts,
)

__all__ = [
    "run_stream_to_memory",
    "stream_events",
    "stream_session_counts",
    "stream_tumbling_counts",
]
