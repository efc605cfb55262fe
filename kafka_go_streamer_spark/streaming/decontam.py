"""Streaming decontamination: the eval-overlap gate of
``text_contamination_ngrams`` (plans/curation.py) applied per
micro-batch — closing the last batch-only curation family (VERDICT
r11 task 5).

Shape: the benchmark gram set is built ONCE from the held-out eval
panel (offline, exactly the batch query's bench side — a DISTINCT
hashed-13-gram table, ~1/BENCH_MOD of the corpus and broadcastable at
any realistic benchmark size) and then treated as STATIC state. Each
arriving training micro-batch explodes to the same hashed grams and
equi-joins the broadcast benchmark set; hits are quarantined with
their shared-gram counts, clean documents commit to the training
sink. This is a stream-static join in foreachBatch — the production
ingest-time decontamination pattern (new crawl slices screened
against the fixed eval suite before they ever reach training
storage).

Streamed == batch EXACTLY, regardless of batching: a document's
verdict depends only on its own text and the fixed benchmark set —
there is no cross-batch state at all (contrast streaming/neardup.py,
whose signature store grows and makes the cap boundary
conservative). tests/test_streaming_decontam.py pins the equality
against the registered batch query's own hit set.

Scale: per batch the work is one narrow gram explode (in-row
tokenization + md5, the audited ``_grams`` stage) plus one broadcast
equi-join — no shuffle of the batch beyond the per-doc rollup, no
state store growth, benchmark refreshes are a plain re-broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans.curation import (
    BENCH_MOD,
    CONTAM_N,
    _grams,
)


def benchmark_gram_set(docs: DataFrame) -> DataFrame:
    """DISTINCT hashed {CONTAM_N}-gram set of the benchmark panel
    (every BENCH_MOD-th document — the fixture's stand-in for an eval
    suite). Built offline once; the streaming gate broadcasts it."""
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    return _grams(bench, CONTAM_N).select("gram").distinct()


def contaminated_in_batch(
    bdf: DataFrame, bench_grams: DataFrame
) -> DataFrame:
    """(doc_id, shared) for every document of one micro-batch sharing
    at least one {CONTAM_N}-gram with the benchmark set. ``shared``
    counts DISTINCT shared grams, matching the batch query's hit
    accounting."""
    g = _grams(bdf, CONTAM_N).distinct()
    return (
        g.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
