"""Streaming k-anonymity monitor (streaming/privacy.py): documents
arrive across micro-batches; quasi-identifier class counters
accumulate and the merged profile must equal the registered batch
query ``privacy_k_anonymity`` EXACTLY for any batching (integer
counters, associative sums, shared QI definition). Pinned for
1-batch and 2-batch arrivals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.sources.tables import load_table
from kafka_go_streamer_spark.streaming.partials import write_epoch_partials
from kafka_go_streamer_spark.streaming.privacy import (
    merged_k_anonymity,
    qi_class_partials,
)

pytestmark = pytest.mark.slow


@pytest.mark.timeout(300)
@pytest.mark.parametrize("n_batches", [1, 2])
def test_streaming_privacy_matches_batch(spark, sf_dir, tmp_path, n_batches):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]

    src = tmp_path / "doc_stream"
    src.mkdir()
    partials_dir = str(tmp_path / "partials")
    if n_batches == 1:
        docs.coalesce(1).write.parquet(str(src / "b1"))
    else:
        docs.filter(F.col("doc_id") <= median).coalesce(1).write.parquet(
            str(src / "b1")
        )
        docs.filter(F.col("doc_id") > median).coalesce(1).write.parquet(
            str(src / "b2")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )

    def monitor(bdf, epoch_id):
        # idempotent epoch-partition overwrite (replay-safe)
        write_epoch_partials(qi_class_partials(bdf), epoch_id, partials_dir)

    q = (
        stream.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not terminate within 240s"

    partials = spark.read.parquet(partials_dir)
    assert partials.select("epoch").distinct().count() == n_batches

    streamed = {
        r["k"]: (r["n_classes_below"], r["n_docs_below"], r["doc_share"])
        for r in merged_k_anonymity(partials).collect()
    }
    batch = {
        r["k"]: (r["n_classes_below"], r["n_docs_below"], r["doc_share"])
        for r in QUERIES["privacy_k_anonymity"](spark, sf_dir).collect()
    }
    assert streamed == batch
    # risk provably present on this fixture (small classes exist)
    assert any(v[1] > 0 for v in batch.values())
