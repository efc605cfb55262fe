"""Streaming classifier-calibration monitor: the reliability table of
``quality_calibration_bins`` (plans/audit_ops.py) maintained
incrementally over arriving micro-batches — calibration drift is an
INGEST-time signal (a new crawl slice whose score-0.8 bin stops being
80% positive is the first sign the frozen filter no longer fits the
distribution), so the table must be maintainable without rescanning
the corpus.

Shape: per micro-batch, documents run the SAME audited scoring stage
the batch queries use (``scored_gold`` — shared, so stream and batch
can never silently score differently) and collapse to per-bin PARTIAL
counters (n, sum_score, sum_gold) — a few rows per batch, written to
a tiny partial store. The published table is one merge aggregate over
the partials: sums are associative, so streamed == batch for any
batching (contrast streaming/neardup.py, whose growing signature
store makes its cap boundary conservative). No cross-batch state
beyond the partial rows; a monitoring window is a plain filter on the
partials' epoch column.

Exactly-once requirement: the guarantee assumes each micro-batch's
partials commit exactly once. foreachBatch is at-least-once under
task/epoch retry, so the partial store MUST be written with the
idempotent epoch-partition overwrite in
``streaming/partials.write_epoch_partials`` (a replayed epoch
replaces its own rows); a plain ``mode("append")`` write would
double-count replayed batches.

Scale: per batch one narrow codegen projection + one 10-key map-side
combined aggregate; the merge reads bins × epochs rows (never
documents). tests/test_streaming_calibration.py pins streamed ==
batch against the registered query's own output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.audit_ops import scored_gold


def calibration_partials(bdf: DataFrame) -> DataFrame:
    """Per-bin partial counters (bin, n, sum_score, sum_gold) for one
    micro-batch of documents (needs ``text``). Associative — merging
    any partition of the corpus into these partials and summing
    reproduces the batch table after the 4 dp ``stable_round`` (the
    means divide summed doubles either way; double addition is not
    associative, so equality is exact only once the stable rounding
    absorbs association-order ulps — the same mechanism that pins
    Spark == DuckDB across engines)."""
    scored = scored_gold(bdf.select("text"))
    return scored.groupBy(
        F.least(F.floor(F.col("score") * 10), F.lit(9))
        .cast("int")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("score").alias("sum_score"),
        F.sum(F.col("gold").cast("double")).alias("sum_gold"),
    )


def merged_calibration(partials: DataFrame) -> DataFrame:
    """The published reliability table from accumulated partials —
    same columns and rounding as ``quality_calibration_bins``."""
    g = partials.groupBy("bin").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("sum_score").alias("_ss"),
        F.sum("sum_gold").alias("_sg"),
    )
    return g.select(
        "bin",
        "n_docs",
        stable_round(F.col("_ss") / F.col("n_docs"), 4).alias("mean_score"),
        stable_round(F.col("_sg") / F.col("n_docs"), 4).alias("pos_rate"),
        stable_round(
            (F.col("_sg") - F.col("_ss")) / F.col("n_docs"), 4
        ).alias("gap"),
    )
