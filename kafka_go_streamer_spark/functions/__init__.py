from kafka_go_streamer_spark.functions import text, vectors

__all__ = ["text", "vectors"]
