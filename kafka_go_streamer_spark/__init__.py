"""kafka_go_streamer_spark — a PySpark-native content-based router and
analytics engine with the capabilities of the reference Go service
(p53/kafka-go-streamer) plus a Spark-first large-scale data-pipeline
operator surface (dedup, similarity search, text analysis).

Design: everything is a declarative DataFrame transform so Catalyst and
Tungsten pick the physical plan. The routing core is a pure
``DataFrame -> DataFrame`` function usable identically in batch and under
``foreachBatch`` in Structured Streaming.
"""

from kafka_go_streamer_spark.config import (
    Extractor,
    Split,
    Spliter,
    SpliterCollection,
    load_split_conf,
    load_split_conf_b64,
)
from kafka_go_streamer_spark.routing import route, route_and_filter

__all__ = [
    "Extractor",
    "Split",
    "Spliter",
    "SpliterCollection",
    "load_split_conf",
    "load_split_conf_b64",
    "route",
    "route_and_filter",
]

__version__ = "0.1.0"
