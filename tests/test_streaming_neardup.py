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


pytestmark = pytest.mark.slow


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
    # awaitTermination(timeout) returns False on timeout — assert it so
    # a slow machine fails with a clear timeout, not a confusing
    # partial-sink set mismatch below
    assert q.awaitTermination(240), "stream did not finish within 240s"

    got = {r["doc_id"] for r in spark.read.parquet(out_sink).collect()}
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=2)
    want = {
        r["doc_id"]
        for r in batch_drop_rule(docs.select("doc_id"), pairs).collect()
    }
    assert got == want
    assert len(got) < docs.count()  # the corpus does contain near-dups


@pytest.mark.timeout(300)
def test_hot_bucket_cap_applies_incrementally(spark, tmp_path):
    """A band key shared by > MAX_BUCKET documents (boilerplate) must
    generate NO candidates when the stream sees the final bucket size
    (single batch == batch semantics), and dropping may only be
    CONSERVATIVE (a superset of batch drops) when the bucket crosses
    the cap mid-stream — the documented incremental-cap boundary."""
    from kafka_go_streamer_spark.operators.dedup import MAX_BUCKET

    n = MAX_BUCKET + 8  # one shared text -> every band bucket is hot
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(n)],
        "doc_id bigint, text string",
    )
    # batch twin: the cap drops the hot band key entirely -> no pairs,
    # nobody drops
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=2)
    assert pairs.count() == 0
    survivors_batch = {
        r["doc_id"]
        for r in batch_drop_rule(docs.select("doc_id"), pairs).collect()
    }
    assert survivors_batch == set(range(n))

    # single streaming batch sees the same final bucket sizes -> equal
    sigs = sign_batch(docs)
    dropped = {r["id"] for r in dropped_in_batch(sigs, None).collect()}
    assert dropped == set()

    # two batches where the bucket is under the cap in batch 1 and hot
    # only in total: batch-1 internal pairs still fire (the cap cannot
    # see the future) -> drops are a SUPERSET of the batch twin's
    half = docs.filter(F.col("doc_id") < n // 2)
    sigs1 = sign_batch(half)
    dropped1 = {r["id"] for r in dropped_in_batch(sigs1, None).collect()}
    assert dropped1 == set(range(1, n // 2))  # all near-dup doc 0
