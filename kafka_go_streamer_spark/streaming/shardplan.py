"""Streaming shard-plan monitor: the output-layout worksheet of
``storage_shard_plan`` (plans/pipeline_econ.py) maintained
incrementally over arriving micro-batches — the shard plan is exactly
the table an ingest pipeline wants to keep CURRENT (a source whose
byte volume doubles mid-crawl needs its `repartitionByRange` argument
doubled at the next write, not at the next full corpus scan).

Shape: per micro-batch, documents collapse to per-source PARTIAL
counters (n_docs, total_bytes) — one row per source per batch,
written to a tiny partial store. The published plan merges the
partials (integer sums, associative) and applies the batch query's
own shard arithmetic, so streamed == batch EXACTLY for any batching.
Only the partials persist; the merge frame is bounded by source
cardinality × epochs.

Exactly-once requirement: foreachBatch is at-least-once under
task/epoch retry, so partials MUST be written with the idempotent
epoch-partition overwrite in
``streaming/partials.write_epoch_partials`` — a plain append would
double-count replayed batches.

tests/test_streaming_shardplan.py pins streamed == batch against the
registered query's own output for 1- and 2-batch arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.pipeline_econ import SHARD_TARGET_BYTES


def shard_partials(bdf: DataFrame) -> DataFrame:
    """Per-source partial counters for one micro-batch of documents
    (needs source, n_chars): (source, n_docs, total_bytes)."""
    return bdf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_bytes"),
    )


def merged_shard_plan(partials: DataFrame) -> DataFrame:
    """The published shard plan from accumulated partials — same
    columns, target size, and rounding as ``storage_shard_plan``."""
    per_source = partials.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_bytes").cast("long").alias("total_bytes"),
    )
    n_shards = F.greatest(
        F.ceil(F.col("total_bytes") * 1.0 / SHARD_TARGET_BYTES), F.lit(1)
    )
    return per_source.select(
        "source",
        "n_docs",
        "total_bytes",
        n_shards.cast("long").alias("n_shards"),
        stable_round(F.col("total_bytes") * 1.0 / n_shards, 2).alias(
            "mean_shard_bytes"
        ),
        stable_round(F.col("n_docs") * 1.0 / n_shards, 2).alias(
            "docs_per_shard"
        ),
        stable_round(
            F.col("total_bytes")
            * 1.0
            / F.sum("total_bytes").over(Window.partitionBy()),
            6,
        ).alias("corpus_share"),
    )
