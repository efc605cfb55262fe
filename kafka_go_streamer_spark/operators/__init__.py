from kafka_go_streamer_spark.operators import dedup, similarity

__all__ = ["dedup", "similarity"]
