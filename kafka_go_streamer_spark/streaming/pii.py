"""Streaming PII-density monitor: the per-source PII triage table of
``pii_density_by_source`` (plans/semdedup.py) maintained incrementally
over arriving micro-batches — PII density is an ingest-time gate (one
new feed can silently flood the corpus with unredacted contact data),
so the fleet dashboard must be maintainable without rescanning the
corpus.

Shape: per micro-batch, documents run the SAME audited per-document
projection the batch query uses (``pii_per_doc`` — shared, so stream
and batch can never silently count differently) and collapse to
per-source PARTIAL counters (n, docs_with_pii, ne, np, chars) — one
row per source per batch, written to a tiny partial store. The
published table merges the partials: all five counters are INTEGER
sums (associative), and the single density ratio divides the merged
long totals, so streamed == batch EXACTLY for any batching.

Exactly-once requirement: foreachBatch is at-least-once under
task/epoch retry, so partials MUST be written with the idempotent
epoch-partition overwrite in
``streaming/partials.write_epoch_partials`` — a plain append would
double-count replayed batches.

tests/test_streaming_pii.py pins streamed == batch against the
registered query's own output for 1- and 2-batch arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.semdedup import pii_per_doc


def pii_partials(bdf: DataFrame) -> DataFrame:
    """Per-source partial PII counters for one micro-batch of
    documents (needs doc_id, source, text)."""
    per = pii_per_doc(bdf.select("doc_id", "source", "text"))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("ne") + F.col("np") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_pii"),
        F.sum("ne").cast("long").alias("ne"),
        F.sum("np").cast("long").alias("np"),
        F.sum("chars").cast("long").alias("chars"),
    )


def merged_pii_density(partials: DataFrame) -> DataFrame:
    """The published PII triage table from accumulated partials —
    same columns and rounding as ``pii_density_by_source``."""
    g = partials.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("docs_with_pii").cast("long").alias("docs_with_pii"),
        F.sum("ne").cast("long").alias("n_emails"),
        F.sum("np").cast("long").alias("n_phones"),
        F.sum("chars").cast("long").alias("_chars"),
    )
    return g.select(
        "source",
        "n_docs",
        "docs_with_pii",
        "n_emails",
        "n_phones",
        stable_round(
            (F.col("n_emails") + F.col("n_phones"))
            * 10000.0
            / F.col("_chars"),
            6,
        ).alias("pii_per_10kchars"),
    )
