from cdk_datalake_ingest_spark.streaming.events import (
    stream_events,
    windowed_event_counts,
)

__all__ = ["stream_events", "windowed_event_counts"]
