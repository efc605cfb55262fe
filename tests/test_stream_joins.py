"""Streaming join semantics checked against their batch twins: the
same join logic over the same rows must produce identical results in
the micro-batch runtime (file sources, availableNow trigger) and in
plain batch execution."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.sources.tables import _fix_nanos, load_table
from kafka_go_streamer_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _events_stream(spark, sf_dir, src_dir):
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return _fix_nanos(spark.readStream.schema(raw_schema).parquet(src_dir))


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_stream_dir):
    dim = spark.createDataFrame(
        [(t, f"tier_{i % 3}") for i, t in enumerate(
            ["click", "view", "purchase", "signup", "error"]
        )],
        "event_type string, tier string",
    )
    stream = _events_stream(spark, sf_dir, events_stream_dir)
    q = (
        stream_static_enrich(stream, dim, on="event_type")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT tier, count(*) AS n FROM enriched GROUP BY tier"
    ).collect()
    want = (
        load_table(spark, sf_dir, "events")
        .join(F.broadcast(dim), "event_type")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["tier"]: r["n"] for r in got} == {r["tier"]: r["n"] for r in want}
    # no rows were dropped by the enrichment (left join, full dim)
    assert sum(r["n"] for r in got) == load_table(spark, sf_dir, "events").count()


def test_stream_stream_interval_join_matches_batch(
    spark, sf_dir, events_stream_dir
):
    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("l_ts"),
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("purchase_value"),
        )
        return clicks, purchases

    stream = _events_stream(spark, sf_dir, events_stream_dir)
    s_clicks, s_purch = split(stream)
    joined = stream_stream_interval_join(
        s_clicks, s_purch, key="user_id",
        watermark="1 hour", max_delay="INTERVAL 1 HOUR",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT click_id, purchase_id FROM attributed").collect()
    }

    b_clicks, b_purch = split(load_table(spark, sf_dir, "events"))
    want_df = b_clicks.join(
        b_purch,
        (b_clicks.user_id == b_purch.user_id)
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in want_df.select("click_id", "purchase_id").collect()
    }
    assert want, "calibration: batch twin must produce pairs"
    assert got == want
