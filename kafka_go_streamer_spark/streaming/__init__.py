from kafka_go_streamer_spark.streaming.router import (
    build_streaming_router,
    route_microbatch,
    start_file_stream_router,
)

__all__ = [
    "build_streaming_router",
    "route_microbatch",
    "start_file_stream_router",
]
