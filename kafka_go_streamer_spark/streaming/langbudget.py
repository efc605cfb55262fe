"""Streaming language-budget monitor: the multilingual token
allocation of ``sample_language_budget`` (plans/audit_ops.py)
maintained incrementally over arriving micro-batches — the mixture
worksheet is exactly the table an ingest pipeline wants CURRENT (a
crawl slice that doubles one language's tokens changes every
language's allocation at the next sampling decision, not at the next
full corpus scan).

Shape: per micro-batch, documents collapse to per-language PARTIAL
token counters (lang, avail) — one row per language per batch,
written to a tiny partial store. The published worksheet merges the
partials (integer token sums, associative) and applies the batch
query's own closed-form allocation (``allocation_from_per_lang`` —
shared, so stream and batch can never silently allocate
differently): streamed == batch EXACTLY for any batching. The merge
frame is bounded by language cardinality x epochs.

Exactly-once requirement: foreachBatch is at-least-once under
task/epoch retry, so partials MUST be written with the idempotent
epoch-partition overwrite in
``streaming/partials.write_epoch_partials`` — a plain append would
double-count replayed batches.

tests/test_streaming_langbudget.py pins streamed == batch against
the registered query's own output for 1- and 2-batch arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions import text as X
from kafka_go_streamer_spark.plans.audit_ops import allocation_from_per_lang


def lang_partials(bdf: DataFrame) -> DataFrame:
    """Per-language partial token counters for one micro-batch of
    documents (needs lang, text): (lang, avail)."""
    return bdf.groupBy("lang").agg(
        F.sum(X.token_count(F.col("text"))).cast("long").alias("avail")
    )


def merged_language_budget(partials: DataFrame) -> DataFrame:
    """The published allocation worksheet from accumulated partials —
    same columns, budget share, and rounding as
    ``sample_language_budget``."""
    per_lang = partials.groupBy("lang").agg(
        F.sum("avail").cast("long").alias("avail")
    )
    return allocation_from_per_lang(per_lang)
