"""Streaming k-anonymity monitor: the privacy profile of
``privacy_k_anonymity`` (plans/audit_ops.py) maintained incrementally
over arriving micro-batches — re-identification risk is another
ingest-time gate (one small feed can silently mint hundreds of
singleton quasi-identifier classes), so the class-size table must be
maintainable without rescanning the corpus.

Shape: per micro-batch, documents collapse to PARTIAL class counters
on the SAME quasi-identifier the batch query uses (lang, source,
QI_LEN_BIN-char length bin) — bounded rows per batch, written to a
tiny partial store. The published profile merges the partials (sums
are associative) and applies the batch query's own k-grid
arithmetic, so streamed == batch EXACTLY for any batching (integer
counters — no float-association caveat here). The only cross-batch
state is the partials; the class frame they merge into is bounded by
QI cardinality, never documents.

Exactly-once requirement: foreachBatch is at-least-once under
task/epoch retry, so partials MUST be written with the idempotent
epoch-partition overwrite in
``streaming/partials.write_epoch_partials`` — a plain append would
double-count replayed batches.

tests/test_streaming_privacy.py pins streamed == batch against the
registered query's own output for 1- and 2-batch arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.audit_ops import K_ANON_GRID, QI_LEN_BIN


def qi_class_partials(bdf: DataFrame) -> DataFrame:
    """Partial quasi-identifier class counters for one micro-batch of
    documents (needs lang, source, n_chars): (lang, source, len_bin,
    c). Associative — summing partials over any batching reproduces
    the batch class sizes exactly."""
    return bdf.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars div {QI_LEN_BIN}").alias("len_bin"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


def merged_k_anonymity(partials: DataFrame) -> DataFrame:
    """The published k-anonymity profile from accumulated partials —
    same columns, k grid, and rounding as ``privacy_k_anonymity``."""
    classes = partials.groupBy("lang", "source", "len_bin").agg(
        F.sum("c").alias("c")
    )
    fanned = classes.select(
        "c",
        F.explode(F.array(*[F.lit(k) for k in K_ANON_GRID])).alias("k"),
    )
    return (
        fanned.groupBy(F.col("k").cast("int").alias("k"))
        .agg(
            F.sum(F.when(F.col("c") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_classes_below"),
            F.sum(F.when(F.col("c") < F.col("k"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_docs_below"),
            F.sum("c").alias("_n_total"),
        )
        .select(
            "k",
            "n_classes_below",
            "n_docs_below",
            stable_round(
                F.col("n_docs_below") * 1.0 / F.col("_n_total"), 6
            ).alias("doc_share"),
        )
    )
