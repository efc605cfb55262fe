"""Streaming smoke: the same routing core under the micro-batch runtime
with a file source (no Kafka in this environment), mirroring the
reference's compose-test topology (docker-compose-test.yml) without
infrastructure. Assertions reuse the batch golden oracle — identical
routing semantics in both runtimes."""

from __future__ import annotations

import pytest

from tests.test_routing import GOLDEN_OPENSTACK, SPLITER_OPENSTACK

from kafka_go_streamer_spark.streaming import start_file_stream_router


pytestmark = pytest.mark.slow


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    (d / "batch1.txt").write_text(
        "\n".join(v for _, v, _ in GOLDEN_OPENSTACK[:3]) + "\n"
    )
    (d / "batch2.txt").write_text(
        "\n".join(v for _, v, _ in GOLDEN_OPENSTACK[3:]) + "\n"
    )
    return str(d)


def test_file_stream_routing_matches_batch_golden(spark, input_dir):
    q = start_file_stream_router(
        spark, SPLITER_OPENSTACK, input_dir, query_name="routed_smoke"
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT value, topic FROM routed_smoke").collect()
    got = {r["value"]: r["topic"] for r in out}
    # every golden message routed to its expected topic...
    expected = {v: t for _, v, t in GOLDEN_OPENSTACK}
    assert got == expected
    # ...including exactly-one-route (no message appears twice)
    assert len(out) == len(GOLDEN_OPENSTACK)


def test_streaming_windowed_agg_with_watermark(spark, sf_dir, tmp_path):
    """Tumbling window + watermark on a parquet file stream: the
    streaming-native form of window_tumbling_hourly."""
    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.sources.tables import load_table

    import shutil

    from kafka_go_streamer_spark.sources.tables import _fix_nanos

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    # raw schema (ts as LONG nanos), converted by the same helper batch uses
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _fix_nanos(spark.readStream.schema(raw_schema).parquet(str(src_dir)))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) AS total FROM win_smoke").collect()[0]["total"]
    want = load_table(spark, sf_dir, "events").count()
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """``dropDuplicatesWithinWatermark`` on a file stream: duplicate
    event ids arriving across micro-batches inside the watermark window
    collapse to one row — the streaming form of exact dedup, with state
    EVICTED once the watermark passes (the property that keeps dedup
    state bounded on an unbounded 100 TB/day stream; plain streaming
    dropDuplicates would grow state forever)."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    src = tmp_path / "dedup_stream"
    src.mkdir()
    rows1 = [
        {"event_id": "a", "ts": "2024-01-01T10:00:00"},
        {"event_id": "b", "ts": "2024-01-01T10:00:10"},
        {"event_id": "a", "ts": "2024-01-01T10:00:20"},  # dup in-batch
    ]
    rows2 = [
        {"event_id": "a", "ts": "2024-01-01T10:01:00"},  # dup across batches
        {"event_id": "c", "ts": "2024-01-01T10:01:30"},
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))
    schema = StructType(
        [
            StructField("event_id", StringType()),
            StructField("ts", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(src))
        .select("event_id", F.col("ts").cast(TimestampType()).alias("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["event_id"]
        for r in spark.sql("SELECT event_id FROM dedup_smoke").collect()
    )
    assert got == ["a", "b", "c"]


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    """session_window (the MERGING window operator) under the
    micro-batch runtime: per-user sessions from a two-batch file
    stream must equal the batch twin exactly — including sessions
    whose events arrive in DIFFERENT micro-batches (the state-merge
    path that batch execution never exercises)."""
    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.plans.windows import SESSION_GAP_MIN
    from kafka_go_streamer_spark.sources.tables import _fix_nanos, load_table

    src_dir = tmp_path / "sess_stream"
    src_dir.mkdir()
    ev = load_table(spark, sf_dir, "events")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # split mid-timeline so many sessions straddle the batch boundary
    cut = ev.agg(
        F.percentile_approx("ts", 0.5).alias("c")
    ).collect()[0]["c"]
    raw.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src_dir / "b1")
    )
    raw.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src_dir / "b2")
    )
    import shutil

    feed = tmp_path / "sess_feed"
    feed.mkdir()

    def promote(stage):
        src = next((src_dir / stage).glob("*.parquet"))
        shutil.copy(src, feed / f"{stage}.parquet")

    promote("b1")
    stream = _fix_nanos(
        spark.readStream.schema(raw.schema).parquet(str(feed))
    )

    def sessionize(df):
        return df.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )

    q = (
        sessionize(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("sess_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        promote("b2")
        q.processAllAvailable()
        got = {
            (r["user_id"], r["sw"]["start"], r["sw"]["end"]): (
                r["n"],
                round(r["total"], 4),
            )
            for r in spark.sql("SELECT * FROM sess_smoke").collect()
        }
    finally:
        q.stop()

    want = {
        (r["user_id"], r["sw"]["start"], r["sw"]["end"]): (
            r["n"],
            round(r["total"], 4),
        )
        for r in sessionize(ev).collect()
    }
    assert got == want
    # calibration: the batch split must actually straddle sessions
    ids_b1 = {r["user_id"] for r in ev.filter(F.col("ts") < F.lit(cut)).collect()}
    ids_b2 = {r["user_id"] for r in ev.filter(F.col("ts") >= F.lit(cut)).collect()}
    assert ids_b1 & ids_b2


def test_streaming_hll_registers_match_batch(spark, sf_dir, tmp_path):
    """The streaming HLL register table after two micro-batches must
    equal the batch build over the same rows — the sketch's
    mergeability proven across TIME (the batch query proves it across
    partitions). State is types x 64 rows regardless of volume."""
    import shutil

    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.sources.tables import load_table
    from kafka_go_streamer_spark.streaming.stateful import (
        hll_registers_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    # split by USER, not by time: batch 2 must introduce users batch 1
    # never saw, or every register is already final after batch 1 and
    # the cross-batch merge is vacuous
    cut = ev.agg(F.expr("percentile(user_id, 0.5)")).collect()[0][0]
    src_dir = tmp_path / "hll_src"
    ev.filter(F.col("user_id") <= cut).coalesce(1).write.parquet(
        str(src_dir / "b1")
    )
    ev.filter(F.col("user_id") > cut).coalesce(1).write.parquet(
        str(src_dir / "b2")
    )
    feed = tmp_path / "hll_feed"
    feed.mkdir()

    def promote(stage):
        src = next((src_dir / stage).glob("*.parquet"))
        shutil.copy(src, feed / f"{stage}.parquet")

    promote("b1")
    raw = spark.read.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(raw.schema).parquet(str(feed))
    q = (
        hll_registers_stream(stream)
        .writeStream.format("memory")
        .queryName("hll_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {
            (r["event_type"], r["idx"]): r["reg"]
            for r in spark.sql("SELECT * FROM hll_smoke").collect()
        }
        promote("b2")
        q.processAllAvailable()
        got = {
            (r["event_type"], r["idx"]): r["reg"]
            for r in spark.sql("SELECT * FROM hll_smoke").collect()
        }
    finally:
        q.stop()

    want = {
        (r["event_type"], r["idx"]): r["reg"]
        for r in hll_registers_stream(ev).collect()
    }
    assert got == want
    # calibration: the second batch genuinely advanced some register
    # (otherwise the cross-batch max-merge was vacuous)
    assert mid != got
    # and registers only ever grow batch-over-batch
    assert all(mid[k] <= got[k] for k in mid)


def test_streaming_histogram_matches_batch_and_serves_quantiles(
    spark, sf_dir, tmp_path
):
    """The streaming band-count table after two micro-batches must
    equal the batch histogram over the same rows (count mergeability
    across TIME), and the quantile read off the streamed bands must
    equal the batch sketch_quantile_bands estimates."""
    import shutil

    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.plans.sketches import QB_BINS, QB_QUANTILES
    from kafka_go_streamer_spark.sources.tables import load_table
    from kafka_go_streamer_spark.streaming.stateful import (
        histogram_bands_stream,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    lo, hi, n = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"), F.count("*")
    ).collect()[0]
    cut = li.agg(F.expr("percentile(l_orderkey, 0.5)")).collect()[0][0]
    src_dir = tmp_path / "hist_src"
    li.filter(F.col("l_orderkey") <= cut).coalesce(1).write.parquet(
        str(src_dir / "b1")
    )
    li.filter(F.col("l_orderkey") > cut).coalesce(1).write.parquet(
        str(src_dir / "b2")
    )
    feed = tmp_path / "hist_feed"
    feed.mkdir()

    def promote(stage):
        src = next((src_dir / stage).glob("*.parquet"))
        shutil.copy(src, feed / f"{stage}.parquet")

    promote("b1")
    raw = spark.read.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(raw.schema).parquet(str(feed))
    q = (
        histogram_bands_stream(
            stream, float(lo), float(hi), value_col="l_extendedprice"
        )
        .writeStream.format("memory")
        .queryName("hist_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        promote("b2")
        q.processAllAvailable()
        streamed = {
            r["bin"]: r["cnt"]
            for r in spark.sql("SELECT * FROM hist_smoke").collect()
        }
    finally:
        q.stop()

    width = (float(hi) - float(lo)) / QB_BINS
    batch = {
        r["bin"]: r["cnt"]
        for r in li.select(
            F.least(
                F.floor((F.col("l_extendedprice") - float(lo)) / width)
                .cast("long"),
                F.lit(QB_BINS - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert streamed == batch
    assert sum(streamed.values()) == n

    # quantiles read off the STREAMED bands == the batch sketch query
    cum, cum_map = 0, {}
    for b in sorted(streamed):
        before = cum
        cum += streamed[b]
        cum_map[b] = (before, cum)
    want = {
        round(r["q"], 2): r["est"]
        for r in QUERIES["sketch_quantile_bands"](spark, sf_dir).collect()
    }
    for qq in QB_QUANTILES:
        t = qq * n
        b = next(
            b for b in sorted(streamed) if cum_map[b][1] >= t > cum_map[b][0]
        )
        est = float(lo) + width * (b + (t - cum_map[b][0]) / streamed[b])
        assert abs(est - want[round(qq, 2)]) <= 1e-4 + 1e-9


def test_state_store_reader_exposes_aggregation_state(
    spark, sf_dir, tmp_path
):
    """Spark 4 state data source: after a checkpointed streaming
    aggregation runs, `spark.read.format("statestore")` over the
    checkpoint must expose the operator's keyed state — the ops
    surface for debugging a live pipeline's state without stopping it
    (reference has no state at all; this pins the Spark-native
    replacement's observability)."""
    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    src = tmp_path / "st_src"
    ev.coalesce(1).write.parquet(str(src))
    ckpt = str(tmp_path / "st_ckpt")
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("state_reader_smoke")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.read.format("statestore").load(ckpt)
    # the value struct carries the operator's aggregate BUFFER fields
    # (here: the count buffer), not the output aliases
    got = {
        r["key"]["user_id"]: r["value"]["count"] for r in state.collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_cms_grid_matches_batch_and_estimates(
    spark, sf_dir, tmp_path
):
    """The streaming CMS grid after two micro-batches must equal the
    batch grid over the same rows, and key estimates read off the
    streamed grid must match the batch query's estimates (min over the
    key's D cells, >= truth)."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.plans.sketches import CMS_D, CMS_W
    from kafka_go_streamer_spark.sources.tables import load_table
    from kafka_go_streamer_spark.streaming.stateful import cms_grid_stream

    ev = load_table(spark, sf_dir, "events").select("user_id")
    cut = ev.agg(F.expr("percentile(user_id, 0.5)")).collect()[0][0]
    src_dir = tmp_path / "cms_src"
    ev.filter(F.col("user_id") <= cut).coalesce(1).write.parquet(
        str(src_dir / "b1")
    )
    ev.filter(F.col("user_id") > cut).coalesce(1).write.parquet(
        str(src_dir / "b2")
    )
    feed = tmp_path / "cms_feed"
    feed.mkdir()

    def promote(stage):
        src = next((src_dir / stage).glob("*.parquet"))
        shutil.copy(src, feed / f"{stage}.parquet")

    promote("b1")
    raw = spark.read.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(raw.schema).parquet(str(feed))
    q = (
        cms_grid_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        promote("b2")
        q.processAllAvailable()
        streamed = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in spark.sql("SELECT * FROM cms_smoke").collect()
        }
    finally:
        q.stop()

    batch = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_grid_stream(ev).collect()
    }
    assert streamed == batch

    # estimates off the STREAMED grid == the batch query's estimates
    def buckets(uid):
        hx = hashlib.md5(str(uid).encode()).hexdigest()
        return [
            (d, int(hx[8 * d : 8 * d + 8], 16) % CMS_W)
            for d in range(CMS_D)
        ]

    for r in QUERIES["sketch_countmin_heavy_users"](spark, sf_dir).collect():
        est = min(streamed[cell] for cell in buckets(r["user_id"]))
        assert est == r["cms_estimate"]
        assert est >= r["true_count"]


def test_streaming_kll_weight_exact_and_rank_bounded(
    spark, sf_dir, tmp_path
):
    """Streaming KLL after two micro-batches (with per-key state
    carried across them): total_weight must equal the TRUE per-type
    row count exactly (weight conservation across micro-batches), and
    every reported quantile's true rank must sit inside the certified
    KLL_EPS bound. (Bit-equality with the batch sketch is NOT the
    contract — compaction is order-sensitive; the bound is.)"""
    import shutil

    import duckdb
    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.plans.sketches import KLL_EPS
    from kafka_go_streamer_spark.sources.tables import load_table
    from kafka_go_streamer_spark.streaming.stateful import (
        kll_quantiles_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    )
    cut = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).collect()[
        0
    ][0]
    src_dir = tmp_path / "kll_src"
    ev.filter(F.unix_timestamp("ts") <= cut).drop("ts").coalesce(
        1
    ).write.parquet(str(src_dir / "b1"))
    ev.filter(F.unix_timestamp("ts") > cut).drop("ts").coalesce(
        1
    ).write.parquet(str(src_dir / "b2"))
    feed = tmp_path / "kll_feed"
    feed.mkdir()

    def promote(stage):
        src = next((src_dir / stage).glob("*.parquet"))
        shutil.copy(src, feed / f"{stage}.parquet")

    promote("b1")
    raw = spark.read.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(raw.schema).parquet(str(feed))
    q = (
        kll_quantiles_stream(stream)
        .writeStream.format("memory")
        .queryName("kll_smoke")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        promote("b2")
        q.processAllAvailable()
        rows = spark.sql(
            """
            SELECT * FROM kll_smoke
            WHERE (event_type, total_weight) IN (
              SELECT event_type, max(total_weight) FROM kll_smoke
              GROUP BY event_type
            )
            """
        ).collect()
    finally:
        q.stop()

    con = duckdb.connect()
    truth = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            SELECT event_type, count(*),
                   list_sort(list(value))
            FROM '{sf_dir}/events.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    assert len(rows) == len(truth)
    import bisect

    for r in rows:
        n, srt = truth[r["event_type"]]
        assert r["total_weight"] == n  # exact across micro-batches
        for qq, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank = bisect.bisect_right(srt, r[col])
            assert abs(rank / n - qq) <= KLL_EPS, (
                r["event_type"],
                col,
                rank / n,
            )


def test_streaming_mg_topk_bounds_and_containment(
    spark, sf_dir, tmp_path
):
    """Streaming Misra-Gries after two micro-batches (state carried
    across them): n_total must equal the TRUE per-type row count,
    every estimate must undercount its true count by at most the
    reported max_err, and every item whose true count exceeds
    n/(k+1) must be retained. (Bit-equality with a batch pass is NOT
    the contract — the decrement step is order-sensitive; the bounds
    are.) A pure-Python replay of the same rows checks the error
    bound is not vacuous."""
    import shutil

    import duckdb
    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.operators.topk import MisraGries
    from kafka_go_streamer_spark.sources.tables import load_table
    from kafka_go_streamer_spark.streaming.stateful import (
        MG_K,
        mg_topk_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    )
    cut = ev.agg(
        F.expr("percentile(unix_timestamp(ts), 0.5)")
    ).collect()[0][0]
    src_dir = tmp_path / "mg_src"
    ev.filter(F.unix_timestamp("ts") <= cut).drop("ts").coalesce(
        1
    ).write.parquet(str(src_dir / "b1"))
    ev.filter(F.unix_timestamp("ts") > cut).drop("ts").coalesce(
        1
    ).write.parquet(str(src_dir / "b2"))
    feed = tmp_path / "mg_feed"
    feed.mkdir()

    def promote(stage):
        src = next((src_dir / stage).glob("*.parquet"))
        shutil.copy(src, feed / f"{stage}.parquet")

    promote("b1")
    raw = spark.read.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(raw.schema).parquet(str(feed))
    q = (
        mg_topk_stream(stream)
        .writeStream.format("memory")
        .queryName("mg_smoke")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        promote("b2")
        q.processAllAvailable()
        rows = spark.sql(
            """
            SELECT * FROM mg_smoke
            WHERE (event_type, n_total) IN (
              SELECT event_type, max(n_total) FROM mg_smoke
              GROUP BY event_type
            )
            """
        ).collect()
    finally:
        q.stop()

    con = duckdb.connect()
    true_n = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT event_type, count(*) FROM"
            f" '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    true_cnt = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"SELECT event_type, user_id, count(*) FROM"
            f" '{sf_dir}/events.parquet' GROUP BY 1, 2"
        ).fetchall()
    }
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(true_n)
    for et, rs in by_type.items():
        n = true_n[et]
        assert all(r["n_total"] == n for r in rs)  # (a) exact count
        assert len(rs) <= MG_K
        err = rs[0]["max_err"]
        retained = set()
        for r in rs:
            t = true_cnt[(et, r["user_id"])]
            retained.add(r["user_id"])
            assert r["est"] <= t, (et, r["user_id"])  # undercount only
            assert t - r["est"] <= err, (et, r["user_id"])  # (b)
        for (tet, uid), t in true_cnt.items():  # (c) containment
            if tet == et and t > n / (MG_K + 1):
                assert uid in retained, (et, uid, t)

    # non-vacuity: a skewed pure-Python replay has a nonzero-but-
    # bounded error and retains the planted heavy hitter
    mg = MisraGries(3)
    planted = [1] * 50 + list(range(100, 160))
    mg.update_many(planted)
    assert 1 in mg.counters
    assert mg.counters[1] <= 50
    assert 50 - mg.counters[1] <= mg.max_error()
    assert mg.max_error() > 0


def test_streaming_ohlc_daily_matches_batch(spark, sf_dir, tmp_path):
    """Streaming twin of ts_ohlc_daily: tumbling 1-day window +
    watermark over a parquet file stream, with open/close selected by
    min_by/max_by over the unique (ts, event_id) order — the
    declarative streaming form of the batch query's dual row_number
    window (same deterministic tiebreak, so stream == batch exactly).
    At 100 TB/day this is the shape that actually ships: per-key
    windowed state with watermark eviction instead of a batch sort."""
    import shutil

    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.sources.tables import _fix_nanos

    src_dir = tmp_path / "ohlc_stream"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _fix_nanos(
        spark.readStream.schema(raw_schema).parquet(str(src_dir))
    )
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ohlc_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], int(r["w"]["start"].timestamp() // 86400)): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["n_events"],
        )
        for r in spark.sql("SELECT * FROM ohlc_smoke").collect()
    }
    want = {
        (r["event_type"], r["day_idx"]): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["n_events"],
        )
        for r in QUERIES["ts_ohlc_daily"](spark, sf_dir).collect()
    }
    assert got == want
