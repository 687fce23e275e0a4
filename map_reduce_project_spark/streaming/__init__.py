from map_reduce_project_spark.streaming.sinks import (
    foreach_batch_parquet,
    kafka_source,
    parse_kafka_json,
    purchase_attribution,
    purchase_attribution_stream,
    purchase_attribution_stream_outer,
)
from map_reduce_project_spark.streaming.windows import (
    run_stream_to_memory,
    stream_dedup_events,
    stream_events,
    stream_session_counts,
    stream_tumbling_counts,
)

__all__ = [
    "foreach_batch_parquet",
    "kafka_source",
    "parse_kafka_json",
    "purchase_attribution",
    "purchase_attribution_stream",
    "purchase_attribution_stream_outer",
    "run_stream_to_memory",
    "stream_dedup_events",
    "stream_events",
    "stream_session_counts",
    "stream_tumbling_counts",
]
