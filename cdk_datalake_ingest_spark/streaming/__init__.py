from cdk_datalake_ingest_spark.streaming.events import (
    stream_events,
    windowed_event_counts,
)
from cdk_datalake_ingest_spark.streaming.sessionize import (
    sessionize,
    sessionize_stream,
    sessionize_stream_native,
)

__all__ = [
    "stream_events",
    "windowed_event_counts",
    "sessionize",
    "sessionize_stream",
    "sessionize_stream_native",
]
