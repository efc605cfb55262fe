from kafka_go_streamer_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)
from kafka_go_streamer_spark.streaming.metrics import RouterMetricsListener
from kafka_go_streamer_spark.streaming.router import (
    build_streaming_router,
    route_microbatch,
    start_checkpointed_file_router,
    start_file_stream_router,
)

__all__ = [
    "RouterMetricsListener",
    "build_streaming_router",
    "route_microbatch",
    "start_checkpointed_file_router",
    "start_file_stream_router",
    "stream_static_enrich",
    "stream_stream_interval_join",
]
