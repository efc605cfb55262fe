"""Multimodal pipeline queries: binary-column plumbing with a REAL
header decode (see ``multimodal.py``): payloads are structurally-valid
PNG/JPEG/GIF containers synthesized from document text, and the Spark
side parses them back — magic bytes, chunk/segment walk, CRC check,
endian-correct dimension unpack — through mapInPandas/Arrow. The oracle
predicts what the parse MUST find from the generator's arithmetic, so a
pass certifies the parser + the UDF plumbing end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.multimodal import (
    CONTAINER_OVERHEAD,
    decode_images,
    synthetic_image_blobs,
)
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

_FMT_SQL = (
    "CASE ('0x' || substr(sha256(text), 1, 2))::INT % 3 "
    "WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END"
)
_OVERHEAD_SQL = (
    f"CASE {_FMT_SQL} WHEN 'png' THEN {CONTAINER_OVERHEAD['png']} "
    f"WHEN 'jpeg' THEN {CONTAINER_OVERHEAD['jpeg']} "
    f"ELSE {CONTAINER_OVERHEAD['gif']} END"
)


@query(
    "multimodal_decode_meta",
    oracle=f"""
    SELECT doc_id AS key,
           (octet_length(encode(text)) + {_OVERHEAD_SQL})::INTEGER AS byte_len,
           {_FMT_SQL} AS format,
           (64 + ('0x' || substr(sha256(text), 3, 2))::INT * 8)::INTEGER AS width,
           (64 + ('0x' || substr(sha256(text), 5, 2))::INT * 8)::INTEGER AS height,
           3 AS channels,
           sha256(text) AS content_hash
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata through the real
    mapInPandas/Arrow decode path with a REAL structural parser (the
    container headers are genuinely walked; dimensions come out of the
    binary, not out of a formula shared with the generator).

    Scale: decode is a narrow per-batch pandas transform — linear in
    input splits, no shuffle; a pixel-level decoder drops into the same
    batch loop without changing the plan."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_image_blobs(docs, "doc_id", "text")
    meta = decode_images(blobs, "key", "blob")
    return meta.withColumn("channels", F.col("channels").cast("int"))


@query(
    "multimodal_binary_stats",
    oracle=f"""
    SELECT
      {_FMT_SQL} AS format,
      count(*) AS n,
      sum(octet_length(encode(text)) + {_OVERHEAD_SQL})::BIGINT AS total_bytes,
      max(octet_length(encode(text)) + {_OVERHEAD_SQL})::INTEGER AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over decoded metadata: the decode -> shuffle-light
    rollup shape of a real media-ingest pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    meta = decode_images(
        synthetic_image_blobs(docs, "doc_id", "text"), "key", "blob"
    )
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("byte_len").cast("bigint").alias("total_bytes"),
        F.max("byte_len").alias("max_bytes"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id AS key, text,
             octet_length(encode(text)) // 16 AS n_frames
      FROM documents
    )
    SELECT key,
           unnest(range(0, n_frames, 4))::INTEGER AS frame_idx,
           sha256(substr(text, unnest(range(0, n_frames, 4)) * 16 + 1, 16))
             AS frame_sha
    FROM f
    WHERE n_frames > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling from a binary "video" payload through
    the real mapInPandas 1→N fan-out path (frame slicing stubbed as
    fixed 16-byte frames; payloads are ASCII so the oracle's substr
    slicing is byte-exact).

    Scale: decode+sample is a narrow per-batch pandas generator — the
    output fan-out happens inside the Arrow batch, no shuffle, and a
    real ffmpeg keyframe extractor drops into the same generator."""
    from kafka_go_streamer_spark.multimodal import sample_frames, synthetic_blobs

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synthetic_blobs(docs, "doc_id", "text"), "key", "blob")


@query(
    "multimodal_audio_meta",
    oracle="""
    SELECT doc_id AS key,
           (octet_length(encode(text)) + 44)::INTEGER AS byte_len,
           CASE ('0x' || substr(sha256(text), 7, 2))::INT % 4
             WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
           (1 + ('0x' || substr(sha256(text), 9, 2))::INT % 2)::INTEGER
             AS channels,
           16 AS bits_per_sample,
           (octet_length(encode(text))
              // ((1 + ('0x' || substr(sha256(text), 9, 2))::INT % 2) * 2)
           )::INTEGER AS n_samples,
           (octet_length(encode(text))
              // ((1 + ('0x' || substr(sha256(text), 9, 2))::INT % 2) * 2))
             * 1000.0
             / CASE ('0x' || substr(sha256(text), 7, 2))::INT % 4
                 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END AS duration_ms,
           sha256(text) AS content_hash
    FROM documents
    """,
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary WAV payload -> typed audio metadata (sample rate,
    channels, sample count, duration) through the same mapInPandas
    decode path as images — the parser genuinely walks the RIFF chunk
    list and unpacks the little-endian fmt fields; the oracle predicts
    the result from the generator's arithmetic.

    Scale: narrow per-batch transform, no shuffle; a real resampler or
    feature extractor (MFCC/fbank) slots into the same batch loop."""
    from kafka_go_streamer_spark.multimodal import (
        decode_audio,
        synthetic_wav_blobs,
    )

    docs = load_table(spark, sf_dir, "documents")
    meta = decode_audio(synthetic_wav_blobs(docs, "doc_id", "text"), "key", "blob")
    return (
        meta.withColumn("byte_len", F.col("byte_len").cast("int"))
        .withColumn("sample_rate", F.col("sample_rate").cast("int"))
        .withColumn("channels", F.col("channels").cast("int"))
        .withColumn("bits_per_sample", F.col("bits_per_sample").cast("int"))
        .withColumn("n_samples", F.col("n_samples").cast("int"))
    )
