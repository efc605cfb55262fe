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
    stream_stream_asof_join,
    stream_stream_interval_join,
)


pytestmark = pytest.mark.slow


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


def test_stream_stream_asof_join_matches_batch(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """The watermarked streaming as-of (interval join +
    last-within-tolerance aggregation) must produce exactly the batch
    answer: for every purchase, the latest click by the same user
    within the hour before it. A far-future sentinel row on each side
    pushes the final watermark past every real window so append mode
    emits the complete result under availableNow."""

    def split(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("l_ts"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("r_ts"),
        )
        return purchases, clicks

    # watermark-advancing sentinel: one purchase + one click far past
    # the fixture's time range, on a user id no real event uses —
    # derived from the fixture itself so the parquet schema (incl. the
    # NTZ timestamp type) matches the stream's declared schema exactly
    batch_events = load_table(spark, sf_dir, "events")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    top = (
        raw.orderBy(F.col("ts").desc())
        .limit(1)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
        .withColumn("user_id", F.lit(10**9).cast("bigint"))
    )
    sentinel = top.withColumn("event_type", F.lit("purchase")).union(
        top.withColumn("event_type", F.lit("click"))
    )
    sentinel.write.mode("append").parquet(events_stream_dir)

    stream = _events_stream(spark, sf_dir, events_stream_dir)
    s_purch, s_clicks = split(stream)
    joined = stream_stream_asof_join(
        s_purch,
        s_clicks,
        key="user_id",
        left_ts="l_ts",
        right_ts="r_ts",
        watermark="1 hour",
        tolerance="INTERVAL 1 HOUR",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("asof_attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got_rows = spark.sql(
        "SELECT purchase_id, click_id_asof, matched_time"
        " FROM asof_attributed WHERE user_id < 1000000000"
    ).collect()

    # batch twin: identical predicates, last-by-(r_ts, click_id)
    b_purch, b_clicks = split(batch_events)
    pairs = b_purch.join(
        b_clicks,
        (b_purch.user_id == b_clicks.user_id)
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR")),
    ).drop(b_clicks.user_id)
    want_rows = (
        pairs.groupBy("user_id", "purchase_id", "l_ts")
        .agg(F.max(F.struct(F.col("r_ts"), F.col("click_id"))).alias("m"))
        .select(
            "purchase_id",
            F.col("m.click_id").alias("click_id_asof"),
            F.col("m.r_ts").alias("matched_time"),
        )
        .collect()
    )
    want = {
        (r["purchase_id"], r["click_id_asof"], r["matched_time"])
        for r in want_rows
    }
    got = {
        (r["purchase_id"], r["click_id_asof"], r["matched_time"])
        for r in got_rows
    }
    assert want, "calibration: batch twin must produce matches"
    assert got == want


def test_stream_stream_outer_interval_join_matches_batch(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """The left-outer watermarked interval join must emit BOTH the
    matched pairs and the unmatched-left rows (NULL right columns),
    equaling the batch left-outer twin exactly. The far-future
    sentinel pushes the right watermark past every real left window so
    the no-match verdicts become final under availableNow."""

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
        )
        return clicks, purchases

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    top = (
        raw.orderBy(F.col("ts").desc())
        .limit(1)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
        .withColumn("user_id", F.lit(10**9).cast("bigint"))
    )
    sentinel = top.withColumn("event_type", F.lit("click")).union(
        top.withColumn("event_type", F.lit("purchase"))
    )

    stream = _events_stream(spark, sf_dir, events_stream_dir)
    s_clicks, s_purch = split(stream)
    from kafka_go_streamer_spark.streaming.joins import (
        stream_stream_interval_join_outer,
    )

    joined = stream_stream_interval_join_outer(
        s_clicks, s_purch, key="user_id",
        watermark="1 hour", max_delay="INTERVAL 1 HOUR",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("outer_attributed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .start()
    )
    try:
        # batch 1: the real events; outer verdicts not yet final
        q.processAllAvailable()
        # batch 2: the far-future sentinel advances both watermarks past
        # every real left window + delay...
        sentinel.write.mode("append").parquet(events_stream_dir)
        q.processAllAvailable()
        # ...and the unmatched left rows are evicted + emitted by the
        # NO-DATA micro-batch Spark runs after the watermark advance.
        # That batch is asynchronous (processAllAvailable returns when
        # no new INPUT remains, not when state has flushed), so poll
        # for the NULL rows instead of stopping immediately.
        import time

        for _ in range(150):
            n_nulls = spark.sql(
                "SELECT count(*) FROM outer_attributed"
                " WHERE purchase_id IS NULL"
            ).collect()[0][0]
            if n_nulls > 0:
                break
            time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql(
            "SELECT click_id, purchase_id FROM outer_attributed"
            " WHERE user_id < 1000000000"
        ).collect()
    }

    b_clicks, b_purch = split(load_table(spark, sf_dir, "events"))
    want_df = b_clicks.join(
        b_purch,
        (b_clicks.user_id == b_purch.user_id)
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).drop(b_purch.user_id)
    want = {
        (r["click_id"], r["purchase_id"])
        for r in want_df.select("click_id", "purchase_id").collect()
    }
    # calibration: the outer join must carry BOTH matches and NULLs
    assert any(p is not None for _, p in want)
    assert any(p is None for _, p in want)
    assert got == want


def test_streaming_zscore_flags_match_batch(spark, sf_dir, tmp_path):
    """The z-score anomaly screen under streaming: per-type stats are a
    STATIC frame broadcast into the stream (stream_static_enrich), so
    flagging an unbounded stream needs no state — and the union of
    per-batch flags must equal the batch query's flags regardless of
    batching. (Production recomputes the stats frame on its own
    cadence; each micro-batch picks up the current table.)"""
    import shutil

    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.plans.timeseries import ZSCORE_THRESHOLD
    from kafka_go_streamer_spark.sources.tables import load_table
    from kafka_go_streamer_spark.streaming.joins import stream_static_enrich
    from kafka_go_streamer_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("sumsq"),
    )

    cut = ev.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    src_dir = tmp_path / "z_src"
    ev.filter(F.col("event_id") <= cut).coalesce(1).write.parquet(
        str(src_dir / "b1")
    )
    ev.filter(F.col("event_id") > cut).coalesce(1).write.parquet(
        str(src_dir / "b2")
    )
    feed = tmp_path / "z_feed"
    feed.mkdir()

    def promote(stage):
        shutil.copy(
            next((src_dir / stage).glob("*.parquet")),
            feed / f"{stage}.parquet",
        )

    promote("b1")
    raw = spark.read.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(raw.schema).parquet(str(feed))
    z = stable_round(
        (F.col("value") - F.col("s") / F.col("n"))
        / F.sqrt(F.expr("((sumsq - s * s / n) / (n - 1))")),
        3,
    )
    flagged = (
        stream_static_enrich(stream, stats, on="event_type")
        .select("event_id", z.alias("z"))
        .filter(
            (F.col("z") >= ZSCORE_THRESHOLD)
            | (F.col("z") <= -ZSCORE_THRESHOLD)
        )
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("z_smoke")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        promote("b2")
        q.processAllAvailable()
        got = {
            (r["event_id"], r["z"])
            for r in spark.sql("SELECT * FROM z_smoke").collect()
        }
    finally:
        q.stop()

    want = {
        (r["event_id"], r["z"])
        for r in QUERIES["events_zscore_anomaly"](spark, sf_dir).collect()
    }
    assert got == want
    assert len(want) > 5  # non-vacuous
