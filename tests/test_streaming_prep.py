"""Streaming training-data ingest: the composed prep pipeline (quality
gate -> lang gate -> fingerprint dedup) running per micro-batch under
foreachBatch, with CROSS-batch dedup via an anti-join against the
already-committed sink — the incremental form of
``pipeline_training_prep``. The final sink must equal the batch
pipeline over the full corpus (arrival order = doc_id order, so the
first-arrival winner is the batch query's lowest-doc_id winner)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans.text import prep_survivors
from kafka_go_streamer_spark.sources.tables import load_table


pytestmark = pytest.mark.slow


@pytest.mark.timeout(300)
def test_streaming_prep_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]

    src = tmp_path / "docs_stream"
    src.mkdir()
    sink = str(tmp_path / "prep_sink")
    # two arrival waves, lower doc_ids first (file order = trigger order)
    docs.filter(F.col("doc_id") <= median).coalesce(1).write.parquet(
        str(src / "b1")
    )
    docs.filter(F.col("doc_id") > median).coalesce(1).write.parquet(
        str(src / "b2")
    )

    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )

    def ingest(bdf, epoch_id):
        surv = prep_survivors(bdf)
        sess = bdf.sparkSession
        try:
            committed = sess.read.parquet(sink).select("bag_fp").distinct()
            surv = surv.join(committed, "bag_fp", "left_anti")
        except Exception:
            pass  # first batch: no sink yet
        surv.write.mode("append").parquet(sink)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not terminate within 240s"

    got = {
        r["doc_id"]: (r["source"], r["n_words"], r["n_tokens"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        r["doc_id"]: (r["source"], r["n_words"], r["n_tokens"])
        for r in prep_survivors(docs)
        .select("doc_id", "source", "n_words", "n_tokens")
        .collect()
    }
    assert got == want
