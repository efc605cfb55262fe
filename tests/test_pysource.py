"""Custom Python data source (Spark 4 DataSource API): registration,
parallel partitioned reads, determinism, and downstream composability
with the corpus operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_go_streamer_spark.sources.pysource import SyntheticDocsDataSource


def _load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_reads_n_rows_across_partitions(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    df = _load(spark, n=1000, partitions=7, seed=1)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1000
    assert df.select("doc_id").distinct().count() == 1000
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,"
        "source:string,n_chars:int>"
    )


def test_source_is_deterministic_and_layout_independent(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    a = _load(spark, n=300, partitions=3, seed=7).collect()
    b = _load(spark, n=300, partitions=11, seed=7).collect()  # different layout
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = _load(spark, n=300, partitions=3, seed=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))  # seed matters


def test_source_composes_with_corpus_operators(spark):
    """The generated frame is documents-shaped: the text operators
    consume it directly (here: words + n_chars consistency and a
    dedup-style fingerprint groupBy)."""
    from kafka_go_streamer_spark.functions.text import fingerprint

    spark.dataSource.register(SyntheticDocsDataSource)
    df = _load(spark, n=500, partitions=4, seed=3)
    assert df.filter(F.length("text") != F.col("n_chars")).count() == 0
    groups = (
        df.select(fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .count()
    )
    assert groups.count() > 0


def test_python_stream_source_matches_batch(spark, tmp_path):
    """The Python data source's STREAMING face: reading the synthetic
    source as a stream (4 micro-batches of 250) must produce exactly
    the batch read of the same options — same ids, same text, same
    derived columns — proving offset-cursor determinism and the
    readBetweenOffsets replay contract."""
    from kafka_go_streamer_spark.sources.pysource import (
        SyntheticDocsDataSource,
    )

    spark.dataSource.register(SyntheticDocsDataSource)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("n", 1000)
        .option("batch_rows", 250)
        .option("seed", 7)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysrc_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    import time

    try:
        # the unbounded source keeps emitting empty batches once
        # exhausted; poll until the row count stabilizes at n
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) c FROM pysrc_stream").collect()[0][
                "c"
            ]
            if n >= 1000:
                break
    finally:
        q.stop()

    got = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in spark.sql("SELECT * FROM pysrc_stream").collect()
    }
    batch = (
        spark.read.format("synthetic_docs")
        .option("n", 1000)
        .option("partitions", 4)
        .option("seed", 7)
        .load()
    )
    want = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in batch.collect()
    }
    assert got == want
