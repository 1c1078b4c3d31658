from bigdata_cookbook_spark.streaming.events import (
    stream_events,
    streaming_dedup,
    windowed_counts,
)

__all__ = ["stream_events", "streaming_dedup", "windowed_counts"]
