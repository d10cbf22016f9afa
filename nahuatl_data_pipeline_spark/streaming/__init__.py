from nahuatl_data_pipeline_spark.streaming.incremental import (
    incremental_batch,
    read_event_stream,
    streaming_dedup,
    streaming_url_dedup,
    windowed_event_counts,
)

__all__ = [
    "incremental_batch",
    "read_event_stream",
    "streaming_dedup",
    "streaming_url_dedup",
    "windowed_event_counts",
]
