"""Streaming decontamination (streaming/decontam.py): training
documents arrive across micro-batches and are screened against the
FIXED benchmark gram set per batch. Because the verdict is per-document
against static state, streamed == batch must hold EXACTLY for any
batching — pinned here for 1-batch and 2-batch arrivals against the
registered batch query's own hit set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans.curation import BENCH_MOD, CONTAM_N, _grams
from kafka_go_streamer_spark.sources.tables import load_table
from kafka_go_streamer_spark.streaming.decontam import (
    benchmark_gram_set,
    contaminated_in_batch,
)

pytestmark = pytest.mark.slow


@pytest.mark.timeout(300)
@pytest.mark.parametrize("n_batches", [1, 2])
def test_streaming_decontam_matches_batch(spark, sf_dir, tmp_path, n_batches):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench_grams = benchmark_gram_set(docs).localCheckpoint()
    train = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    median = train.approxQuantile("doc_id", [0.5], 0.0)[0]

    src = tmp_path / "train_stream"
    src.mkdir()
    flags_dir = str(tmp_path / "flags")
    clean_dir = str(tmp_path / "clean")
    if n_batches == 1:
        train.coalesce(1).write.parquet(str(src / "b1"))
    else:
        train.filter(F.col("doc_id") <= median).coalesce(1).write.parquet(
            str(src / "b1")
        )
        train.filter(F.col("doc_id") > median).coalesce(1).write.parquet(
            str(src / "b2")
        )

    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )

    def gate(bdf, epoch_id):
        hits = contaminated_in_batch(bdf, bench_grams)
        hits.write.mode("append").parquet(flags_dir)
        (
            bdf.join(hits.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id")
            .write.mode("append")
            .parquet(clean_dir)
        )

    q = (
        stream.writeStream.foreachBatch(gate)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not terminate within 240s"

    streamed_flags = {
        (r["doc_id"], r["shared"])
        for r in spark.read.parquet(flags_dir).collect()
    }
    streamed_clean = {
        r["doc_id"] for r in spark.read.parquet(clean_dir).collect()
    }

    # batch reference: the registered query's own hit construction
    grams = _grams(docs, CONTAM_N)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    batch_flags = {
        (r["doc_id"], r["shared"])
        for r in grams.filter(~is_bench)
        .distinct()
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .collect()
    }

    assert streamed_flags == batch_flags
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert streamed_clean == train_ids - {d for d, _ in batch_flags}
    # the gate provably fires on this fixture
    assert batch_flags
