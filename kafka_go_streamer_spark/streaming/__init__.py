from kafka_go_streamer_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)
from kafka_go_streamer_spark.streaming.router import (
    build_streaming_router,
    route_microbatch,
    start_file_stream_router,
)

__all__ = [
    "build_streaming_router",
    "route_microbatch",
    "start_file_stream_router",
    "stream_static_enrich",
    "stream_stream_interval_join",
]
