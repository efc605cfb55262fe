"""Streaming MinHash near-dup dedup (streaming/neardup.py): documents
arrive in doc_id order across micro-batches; each batch band-joins its
signatures against the committed signature store, verifies candidates
by exact shingle intersection, and commits survivors. The survivor set
must equal the batch drop rule (ids never the larger side of a
verified pair) — the monotone rule makes the answer independent of how
arrivals are batched, which the 1-batch/2-batch parametrization pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.dedup import minhash_lsh_pairs
from kafka_go_streamer_spark.sources.tables import load_table
from kafka_go_streamer_spark.streaming.neardup import (
    batch_drop_rule,
    dropped_in_batch,
    sign_batch,
)


@pytest.mark.timeout(300)
@pytest.mark.parametrize("n_batches", [1, 2])
def test_streaming_neardup_matches_batch(spark, sf_dir, tmp_path, n_batches):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]

    src = tmp_path / "docs_stream"
    src.mkdir()
    sig_store = str(tmp_path / "sig_store")
    out_sink = str(tmp_path / "survivors")
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

    def ingest(bdf, epoch_id):
        sess = bdf.sparkSession
        sigs = sign_batch(bdf)
        try:
            store = sess.read.parquet(sig_store)
        except Exception:
            store = None  # first batch: no store yet
        dropped = dropped_in_batch(sigs, store)
        survivors = bdf.join(
            dropped.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        )
        survivors.select("doc_id").write.mode("append").parquet(out_sink)
        sigs.write.mode("append").parquet(sig_store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {r["doc_id"] for r in spark.read.parquet(out_sink).collect()}
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=2)
    want = {
        r["doc_id"]
        for r in batch_drop_rule(docs.select("doc_id"), pairs).collect()
    }
    assert got == want
    assert len(got) < docs.count()  # the corpus does contain near-dups
